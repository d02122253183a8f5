"""``derivative(col, interval)`` — the reference's stateful per-interval
change resampler (/root/reference/uts.ts:458-507), as a closed-form
DataFrame plan.

Verified closed form (SURVEY.md §2.4 A9, re-derived from uts.ts): with
``first`` = first pushed point's time and ``tlast`` = last pushed point's
time (push order), the emission times are

    E = {first + k·w : k ≥ 1, first + k·w < tlast} ∪ {tlast}

each point's delta ``v − v_prev`` accrues to the smallest ``e ∈ E`` with
``e ≥ t``; gap intervals emit zero-change points; a single-point series
emits ``[(t, 0)]`` (serialize's final flush, uts.ts:500-506); an empty
series emits ``[]``.

Plan shape (no UDFs, scales to arbitrary group counts):
1. window ``lag`` per group in push order → per-point deltas
2. map each delta to its emission time (integer ceil arithmetic)
3. groupBy (group, e) → sum(delta)        [shuffle on group+e]
4. per-group emission spine via ``sequence`` + ``explode`` (zero-fill)
5. left join spine ↔ sums, collect into a time-sorted array per group

The spine is derived from a per-group min/max aggregate — tiny — and the
join is on the already-aggregated side, so the raw data is scanned once.
Time column must be numeric (epoch ms); callers convert timestamps first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def derivative_points_array(
    df: DataFrame,
    col: str,
    interval: int,
    time_col: str = "time",
    order_col: str = "ingest_id",
    group_cols: list[str] | None = None,
    stable: bool = False,
) -> DataFrame:
    """Return one row per group with ``points: array<struct<time,value>>``
    sorted by time ascending. With ``group_cols=None`` → single global row
    (one row even for empty input, matching global-bin serialization)."""
    if interval <= 0:
        raise ValueError("derivative interval must be > 0")
    gcols = list(group_cols or [])
    w = int(interval)

    t = F.col(time_col).cast("long")
    v = F.col(col).cast("double")
    base = df.select(*gcols, t.alias("__t"), F.col(order_col).alias("__o"), v.alias("__v"))

    win = Window.partitionBy(*[F.col(c) for c in gcols] or [F.lit(0)]).orderBy("__o")
    full = win.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    rows = base.select(
        *gcols,
        "__t",
        (F.col("__v") - F.lag("__v").over(win)).alias("__delta"),
        F.first("__t").over(win).alias("__first"),
        F.last("__t").over(full).alias("__tlast"),
    )
    # smallest anchor >= t: first + w * max(1, ceil((t - first)/w)). The
    # k >= 1 clamp matters for t == first (duplicate leading timestamps):
    # the reference's while-loop never flushes at `first` itself, so a
    # delta accrued at t == first belongs to the FIRST emission, not to a
    # phantom anchor at `first` (uts.ts:476-488; fuzzer-caught).
    c = (
        F.col("__first")
        + F.greatest(
            F.floor((F.col("__t") - F.col("__first") + F.lit(w - 1)) / F.lit(w)),
            F.lit(1),
        )
        * F.lit(w)
    )
    e = F.least(c, F.col("__tlast")).alias("__e")
    # stable: deltas round to 6dp then sum exactly in decimal —
    # order-independent, bit-identical to a serial oracle
    dsum = (
        F.sum(F.col("__delta").cast("decimal(38,6)")).cast("double")
        if stable
        else F.sum("__delta")
    )
    contrib = (
        rows.filter(F.col("__delta").isNotNull())
        .select(*gcols, e, "__delta")
        .groupBy(*gcols, "__e")
        .agg(dsum.alias("__change"))
    )

    # per-group emission spine (zero-gap points, uts.ts:481-483 while loop)
    bounds_aggs = [
        F.min_by("__t", "__o").alias("__first"),
        F.max_by("__t", "__o").alias("__tlast"),
    ]
    if gcols:
        bounds = base.groupBy(*gcols).agg(*bounds_aggs)
    else:
        bounds = base.agg(*bounds_aggs).filter(F.col("__first").isNotNull())
    seq = F.when(
        F.col("__tlast") - F.col("__first") > F.lit(w),
        F.sequence(F.col("__first") + F.lit(w), F.col("__tlast") - F.lit(1), F.lit(w)),
    ).otherwise(F.array().cast("array<long>"))
    spine = bounds.select(
        *gcols,
        F.explode(F.array_union(seq, F.array(F.col("__tlast")))).alias("__e"),
    )

    filled = spine.join(contrib, gcols + ["__e"], "left").select(
        *gcols,
        F.col("__e"),
        F.coalesce(F.col("__change"), F.lit(0.0)).alias("__change"),
    )
    pts = F.array_sort(
        F.collect_list(F.struct(F.col("__e").alias("time"), F.col("__change").alias("value")))
    ).alias("points")
    if gcols:
        return filled.groupBy(*gcols).agg(pts)
    return filled.agg(pts)  # global agg: exactly one row, [] on empty input


def derivative_rows(
    df: DataFrame,
    col: str,
    interval: int,
    time_col: str = "time",
    order_col: str = "ingest_id",
    group_cols: list[str] | None = None,
    stable: bool = False,
) -> DataFrame:
    """Exploded form: one output row per emission (group cols + time +
    value). SQL-oracle-friendly and the natural shape for downstream
    DataFrame work."""
    arr = derivative_points_array(
        df, col, interval, time_col, order_col, group_cols, stable
    )
    gcols = list(group_cols or [])
    return arr.select(
        *gcols, F.explode("points").alias("__p")
    ).select(*gcols, F.col("__p.time").alias("time"), F.col("__p.value").alias("value"))
