"""Exact-fidelity aggregate expressions for the reference's aggregate set.

Every reference aggregate is a single-pass streaming fold
(/root/reference/uts.ts:386-396) — exactly the shape of a Spark
partial-aggregation buffer — so each maps to built-in aggregate functions
plus a thin wrapper encoding the reference's QUIRKS (verified empirically,
SURVEY.md §2.4):

- ``mean(col)``  uts.ts:436-456  — skips points missing the column
  (pt.has guard); empty / none-have-col bin → 0, not NULL.
- ``sum(col)``   uts.ts:618-624  — fold from 0; a point MISSING the column
  poisons the result to NaN (0 + undefined); empty → 0.
- ``max(col)``   uts.ts:589-594  — fold Math.max from 0 → clamped ≥ 0;
  missing column → NaN; empty → 0.
- ``min(col)``   uts.ts:596-601  — fold Math.min from 0 → clamped ≤ 0.
- ``count()``    uts.ts:626-641  — '*' counts all; count(col) counts points
  whose value is not undefined (NULL-skipping, = SQL count).
- ``last(col)``  uts.ts:611-617  — last point in PUSH (insertion) order,
  not time order → ``max_by(v, ingest_id)``.
- ``map(col)``   uts.ts:398-414  — ordered per-point projection preserving
  holes (missing col → NULL element) → sorted collect_list of structs.
- ``reduce(fn)`` uts.ts:416-434  — arbitrary user fold in push order; the
  primitive the built-ins are defined through. Native path: SQL
  ``aggregate()`` HOF over the ordered collected array.

All are ordinary Column expressions — no UDFs — so they run inside
whole-stage codegen and get map-side partial aggregation for free, which is
what makes the same plan viable at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

NAN = float("nan")


@dataclass(frozen=True)
class Metric:
    """A named aggregate over one column (or '*'), mirroring the factory
    statics on the reference's TSDB (uts.ts:556-648)."""

    kind: str
    col: str | None = None
    # for reduce(fn, initial) / map(fn): python callables (pandas fallback)
    fn: Callable[..., Any] | None = None
    initial: Any = None
    # for derivative(col, interval)
    interval: int | None = None
    params: dict = field(default_factory=dict)

    def needs_order(self) -> bool:
        return self.kind in ("last", "map", "reduce")


# ---------------------------------------------------------------------------
# factories (the public API surface, mirroring readme.md:16-24)

def mean(col: str) -> Metric:
    return Metric("mean", col)


def sum_(col: str) -> Metric:
    return Metric("sum", col)


def max_(col: str) -> Metric:
    return Metric("max", col)


def min_(col: str) -> Metric:
    return Metric("min", col)


def count(col: str = "*") -> Metric:
    return Metric("count", col)


def last(col: str) -> Metric:
    return Metric("last", col)


def map_(col_or_fn) -> Metric:
    if callable(col_or_fn):
        return Metric("map", None, fn=col_or_fn)
    return Metric("map", col_or_fn)


def reduce_(fn: Callable[[Any, Any], Any], initial: Any = None) -> Metric:
    return Metric("reduce", None, fn=fn, initial=initial)


def derivative(col: str, interval: int) -> Metric:
    return Metric("derivative", col, interval=interval)


# ---------------------------------------------------------------------------
# expression builders

def _poisoned(v: Column, inner: Column) -> Column:
    """NaN-poisoning: any row in the bin missing the column → NaN
    (uts.ts:593,623 — ``0 + undefined`` / ``Math.max(undefined, …)``)."""
    return F.when(F.count(F.lit(1)) > F.count(v), F.lit(NAN)).otherwise(inner)


# Floating-point sums depend on accumulation order, which differs between
# Spark's partial aggregation and a serial oracle. "Stable" mode routes the
# sum through DECIMAL(38,6): each double rounds deterministically to 6dp,
# the sum is then exact and associative → bit-identical to any oracle using
# the same cast. Costs one decimal codepath in codegen; negligible.
def stable_sum(v: Column) -> Column:
    return F.sum(v.cast("decimal(38,6)")).cast("double")


def lane_sum(v: Column | str) -> Column:
    """Order-independent exact sum with LONG accumulators — bit-identical
    to :func:`stable_sum` but ~1.5× faster in the aggregation hot loop
    (measured at sf0.1: 0.37 s vs 0.55 s per sum over 600k rows; decimal
    partial aggregation is the cost, not the per-row cast).

    Each value is snapped to 6 dp exactly like ``stable_sum`` (the same
    ``CAST(v AS DECIMAL(38,6))`` per row), then split into two integer
    lanes: ``hi`` = whole units (decimal→long cast truncates toward
    zero, which IS ``micro div 1e6``), ``lo`` = leftover micro-units.
    Both lanes sum as plain longs (codegen-friendly, single-word
    accumulators); the exact total ``Σhi + Σlo/1e6`` is reassembled in
    decimal once per GROUP and cast to double — the identical
    decimal→double conversion as stable_sum, so results are
    bit-identical to the DuckDB ``DSUM`` oracle (verified cell-exact on
    tpch_q1's five sums at sf0.01 and sf0.1).

    Overflow envelope (per group): the hi lane requires Σ|v| < 9.2e18
    value units; the lo lane requires < 9.2e12 rows. A 100 TB lineitem
    (~4e11 rows, money columns ≤ 1e5) sits 3-6 orders of magnitude
    inside both bounds. NOT safe for sums of squared money-scale values
    (Σv² can pass 9.2e18) — use stable_sum there."""
    # Built as ONE SQL string when the caller passes the value as SQL
    # text (optimization r11): the per-Column form costs ~30 py4j round
    # trips per sum on every plan build. The parsed tree — including
    # the dec subtree, which the plan printer expands into copies
    # either way and codegen CSE dedupes at runtime — is identical
    # (verified plan- and result-equal on the q1 shape). Column inputs
    # keep the original construction (Spark 4 classic has no
    # Column→SQL serialization).
    if isinstance(v, str):
        dec = f"CAST(({v}) AS DECIMAL(38,6))"
        return F.expr(
            f"CAST((CAST(sum(CAST({dec} AS BIGINT)) AS DECIMAL(38,6))"
            f" + CAST(sum(CAST(({dec} * 1000000) AS BIGINT)"
            f" - CAST({dec} AS BIGINT) * 1000000) AS DECIMAL(38,6))"
            f" / 1000000) AS DOUBLE)"
        )
    dec = v.cast("decimal(38,6)")
    micro = (dec * 1000000).cast("long")
    hi = dec.cast("long")  # truncation toward zero == micro div 1e6
    lo = micro - hi * F.lit(1000000)
    return (
        F.sum(hi).cast("decimal(38,6)")
        + F.sum(lo).cast("decimal(38,6)") / F.lit(1000000)
    ).cast("double")


def agg_expr(
    metric: Metric,
    resolve=F.col,
    order_col: str = "ingest_id",
    point_struct: Column | None = None,
) -> Column:
    """Build the aggregate Column for one metric.

    ``resolve`` maps column name → Column (override for MapType payloads).
    ``order_col`` provides insertion order for last/map/reduce fidelity.
    ``point_struct`` is a struct of the full point row — required only by
    the python-callable ``map(fn)``/``reduce(fn)`` forms (uts.ts:562-580),
    which receive the point as a dict like the reference's ``pt``.
    Pass ``Metric(..., params={"stable": True})`` for order-independent
    float sums (oracle-comparable)."""
    k = metric.kind
    stable = metric.params.get("stable", False)
    if k == "mean":
        v = resolve(metric.col)
        if stable:
            return F.coalesce(stable_sum(v) / F.count(v), F.lit(0.0))
        return F.coalesce(F.avg(v), F.lit(0.0))
    if k == "sum":
        v = resolve(metric.col)
        s = stable_sum(v) if stable else F.sum(v)
        return _poisoned(v, F.coalesce(s, F.lit(0.0)))
    if k == "max":
        v = resolve(metric.col)
        return _poisoned(v, F.greatest(F.coalesce(F.max(v), F.lit(0.0)), F.lit(0.0)))
    if k == "min":
        v = resolve(metric.col)
        return _poisoned(v, F.least(F.coalesce(F.min(v), F.lit(0.0)), F.lit(0.0)))
    if k == "count":
        if metric.col in (None, "*"):
            return F.count(F.lit(1))
        return F.count(resolve(metric.col))
    if k == "last":
        # insertion-order last — max_by on the ingest id (uts.ts:611-617:
        # array order, not time order)
        return F.max_by(resolve(metric.col), F.col(order_col))
    if k == "map":
        if metric.fn is not None:
            return _python_fold_expr(metric, point_struct, order_col)
        return ordered_values_array(resolve(metric.col), F.col(order_col))
    if k == "reduce":
        if metric.fn is not None:
            return _python_fold_expr(metric, point_struct, order_col)
        raise ValueError(
            "reduce requires a python fn; for folds expressible as SQL "
            "lambdas use uts_spark.operators.aggregates.reduce_hof directly"
        )
    raise ValueError(f"unknown metric kind {k!r}")


def _python_fold_expr(
    metric: Metric, point_struct: Column | None, order_col: str
) -> Column:
    """``map(fn)`` / ``reduce(fn, initial)`` with an arbitrary python
    callable (uts.ts:398-434). The ordered point array is assembled
    JVM-side (collect_list + array_sort inside codegen); Python is entered
    ONCE PER BIN with the whole array — not once per row — so the udf cost
    is O(bins) calls, and the scan/shuffle stay on the fast path. The fn
    receives each point as a plain dict, mirroring the reference's
    ``pt.get`` surface."""
    if point_struct is None:
        raise ValueError("map(fn)/reduce(fn) need point_struct (full row)")
    fn, init, kind = metric.fn, metric.initial, metric.kind
    rt = metric.params.get("returns", "double")
    arr = F.array_sort(
        F.collect_list(
            F.struct(F.col(order_col).alias("o"), point_struct.alias("p"))
        )
    )
    if kind == "map":
        @F.udf(f"array<{rt}>")
        def fold(xs):
            return [fn(x["p"].asDict()) for x in (xs or [])]
    else:
        @F.udf(rt)
        def fold(xs):
            acc = init
            for x in (xs or []):
                acc = fn(acc, x["p"].asDict())
            return acc
    return fold(arr)


def ordered_values_array(v: Column, order: Column) -> Column:
    """collect_list drops NULLs and has nondeterministic order; wrapping in a
    struct (order first → array_sort sorts by it) defeats both, preserving
    holes exactly like the reference's Mapper (uts.ts:398-414)."""
    return F.transform(
        F.array_sort(F.collect_list(F.struct(order.alias("o"), v.alias("v")))),
        lambda s: s["v"],
    )


def reduce_hof(v: Column, order: Column, initial: Column, merge) -> Column:
    """Reference ``reduce(fn, initial)`` (uts.ts:416-434) for folds
    expressible as SQL lambdas: fold the ordered value array through
    ``aggregate()``. ``merge`` is a python fn (acc: Column, x: Column) ->
    Column built from F.* expressions."""
    return F.aggregate(ordered_values_array(v, order), initial, merge)


def initial_value_expr(metric: Metric, value_type: str = "double") -> Column:
    """The serialized initial an EMPTY bin reports when fill=true
    (uts.ts:141-143 + each aggregate's initial; verified: mean/sum/count/
    max/min → 0, last → null, map → [])."""
    k = metric.kind
    if k in ("mean", "sum", "max", "min"):
        return F.lit(0.0)
    if k == "count":
        return F.lit(0).cast("long")
    if k == "last":
        return F.lit(None).cast(value_type)
    if k == "map":
        return F.array().cast(f"array<{value_type}>")
    if k == "reduce":
        return F.lit(metric.initial)
    raise ValueError(f"no fill initial for metric kind {k!r}")
