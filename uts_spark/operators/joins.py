"""Join operators beyond Spark's built-ins: as-of join and scalable range
join. The reference has NO joins (SURVEY §2.7); these are north-star
extensions designed Spark-first.

As-of join (time-series enrichment: "for each left row, the most recent
right row at-or-before its timestamp, per key"):

The classic implementations are a per-key sorted merge (pandas
``merge_asof``) or a correlated subquery — both driver-hostile at scale.
The Spark-native plan used here is the UNION-WINDOW strategy:

    union(left ∪ right) → window last_value(right_payload IGNORE NULLS)
    partitioned by key, ordered by (ts, side)

One shuffle on the key, one sort, zero UDFs, arbitrary key cardinality,
and skew handled by AQE. Right payload travels as a struct column so any
number of columns rides one ``last()``.

Range join ("left rows matched to right rows with ts in [lo, hi]"):
a naive theta-join is a broadcast-nested-loop — O(n·m). ``binned_range_join``
buckets both sides by a coarse interval and equi-joins on (key, bucket),
exploding each left row to the buckets its window overlaps; the exact
predicate filters inside the hash join. Turns BNLJ into a shuffled hash
join whose cost scales with actual overlap, which is what survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    right_payload: list[str] | None = None,
    suffix: str = "_right",
    inclusive: bool = True,
    order_col: str | None = None,
    direction: str = "backward",
    tolerance: int | float | None = None,
) -> DataFrame:
    """As-of join: enrich each left row with the nearest right row at or
    before (``direction="backward"``, default) / at or after
    (``"forward"``) its timestamp, matching on ``on`` keys. Right payload
    columns arrive as ``<name><suffix>`` (NULL when no match exists).

    ``inclusive=False`` makes equal timestamps non-matching (strict
    before/after). ``tolerance`` bounds the allowed time gap — a match
    further than ``tolerance`` resolves to NULL (pandas ``merge_asof``
    semantics). ``order_col``: a unique-id column present on BOTH sides,
    used as the final tie-break so equal-timestamp right rows resolve
    deterministically.

    Forward direction reuses the backward plan on negated time, so both
    cost exactly one shuffle + one sort on the key; numeric time columns
    required for ``"forward"``/``"nearest"``/``tolerance``.

    ``direction="nearest"`` picks whichever of the backward/forward
    candidates is closer in time (ties → backward, pandas
    ``merge_asof`` semantics). Both candidates come out of the SAME
    union + sort — a running ``last`` and a following-frame ``first``
    share one shuffle, so nearest costs the same single exchange as the
    one-sided joins.
    """
    assert direction in ("backward", "forward", "nearest")
    keys = [on] if isinstance(on, str) else list(on)
    payload = right_payload or [
        c for c in right.columns if c not in keys and c != right_time
    ]

    def ts(col: str) -> Column:
        c = F.col(col)
        return (-c) if direction == "forward" else c

    # side ordering inside equal timestamps decides inclusivity:
    # right rows sort before left rows (0 < 1) → an equal-ts right row is
    # visible to the left row; __side=2 puts it after → strict before
    r_cols = [
        *keys,
        ts(right_time).alias("__ts"),
        F.lit(0 if inclusive else 2).alias("__side"),
        F.struct(
            F.col(right_time).alias("__rt"), *[F.col(c) for c in payload]
        ).alias("__payload"),
    ]
    if order_col:
        r_cols.append(F.col(order_col))
    r = right.select(*r_cols)
    l = left.select(
        "*",
        ts(left_time).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    order = ["__ts", "__side"] + ([order_col] if order_col else [])
    base_w = Window.partitionBy(*keys).orderBy(*order)
    w = base_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    if direction == "nearest":
        wf = base_w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        bm = F.last("__payload", ignorenulls=True).over(w)
        fm = F.first("__payload", ignorenulls=True).over(wf)
        enriched = unioned.withColumn("__bm", bm).withColumn("__fm", fm)
        bgap = F.col(left_time) - F.col("__bm.__rt")
        fgap = F.col("__fm.__rt") - F.col(left_time)
        valid_b = F.col("__bm").isNotNull()
        # strict mode puts equal-ts right rows AFTER the left row, where
        # the following frame would see them at gap 0 — reject those
        valid_f = F.col("__fm").isNotNull() & (
            F.lit(inclusive) | (fgap > 0)
        )
        if tolerance is not None:
            valid_b = valid_b & (bgap <= F.lit(tolerance))
            valid_f = valid_f & (fgap <= F.lit(tolerance))
        enriched = enriched.withColumn(
            "__match",
            F.when(valid_b & (~valid_f | (bgap <= fgap)), F.col("__bm"))
            .when(valid_f, F.col("__fm")),
        ).drop("__bm", "__fm")
    else:
        enriched = unioned.withColumn(
            "__match", F.last("__payload", ignorenulls=True).over(w)
        )
        if tolerance is not None:
            gap = F.abs(F.col(left_time) - F.col("__match.__rt"))
            enriched = enriched.withColumn(
                "__match",
                F.when(gap <= F.lit(tolerance), F.col("__match")),
            )
    out = enriched.filter(F.col("__side") == 1)
    for c in payload:
        out = out.withColumn(c + suffix, F.col(f"__match.{c}"))
    return out.drop("__ts", "__side", "__payload", "__match")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-mitigating equi-join: when one join key carries a large share
    of the rows, a plain shuffle join lands that key on ONE reducer. Here
    each left row gets a deterministic salt in [0, salt) (hash of the
    whole row — uniform even inside a hot key) and the right side is
    replicated ``salt`` times, so a hot key spreads over ``salt``
    reducers at the cost of replicating the (smaller) right side.

    AQE's skew-join split handles post-shuffle partition skew
    automatically; this is the manual fallback for the pathological case
    AQE can't fix — a single key too hot for any unsplit partition —
    and for non-AQE contexts. Result is identical to ``left.join(right,
    keys, how)`` (asserted in tests). Supports inner/left joins.

    Measured A/B (SCALE.md "Round 6: skew-join A/B"; tools/skew_bench.py,
    20M rows, 40/80/95% hot key): AQE skew-split wins at every hot share
    (1.4-1.7 s vs salted's 3.5-4.5 s vs plain's 6.5-11.3 s), and salting
    UNDER AQE is strictly worse than plain AQE — the salt hides the skew
    from the runtime split while keeping its own replication cost. So:
    prefer plain joins with AQE on; reach for this operator only where
    AQE is unavailable or a single key exceeds one task's capacity."""
    assert how in ("inner", "left"), "salting right rows breaks right/full"
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l.join(r, keys + ["__salt"], how).drop("__salt")


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: Column,
    left_hi: Column,
    right_ts: Column,
    bin_width: int,
    extra_cond: Column | None = None,
    keys: list[str] | None = None,
) -> DataFrame:
    """Join right rows whose ``right_ts`` falls in [left_lo, left_hi]
    (plus optional equi-``keys``), via coarse-bucket equi-join.

    ``bin_width`` should be ≈ the typical window size: each left row
    explodes to (hi-lo)/bin_width + 1 bucket rows.
    """
    keys = keys or []
    lo_b = F.floor(left_lo / F.lit(bin_width)).cast("long")
    hi_b = F.floor(left_hi / F.lit(bin_width)).cast("long")
    l = left.withColumn("__lo", left_lo).withColumn("__hi", left_hi).withColumn(
        "__bucket", F.explode(F.sequence(lo_b, hi_b))
    )
    r = right.withColumn("__rts", right_ts).withColumn(
        "__bucket", F.floor(right_ts / F.lit(bin_width)).cast("long")
    )
    cond = (
        (F.col("__rts") >= F.col("__lo"))
        & (F.col("__rts") <= F.col("__hi"))
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    joined = l.join(r, keys + ["__bucket"], "inner").filter(cond)
    return joined.drop("__bucket", "__lo", "__hi", "__rts")


def binned_first_after(
    left: DataFrame,
    right: DataFrame,
    left_ts: Column,
    right_ts: Column,
    window_ms: int,
    keys: list[str],
    right_payload: list[str] | None = None,
    ts_name: str = "__t",
) -> DataFrame:
    """For each left row, the FIRST right row with
    ``left_ts < right_ts <= left_ts + window_ms`` on the same ``keys``
    — the window-funnel step — with join width bounded by BUCKETS
    instead of right events.

    The naive shape (binned_range_join + min_by) emits one row per
    qualifying (left, right) pair before aggregating, which explodes
    when many right events crowd one key-window (measured: super-linear
    on dense synthetic streams, tools/scale_smoke.py). Here the right
    side pre-aggregates to ONE sorted (ts, payload) array per
    (keys, bucket); each left row joins <= 2 array rows, filters the
    array to its window, and takes the array head — identical
    first-match semantics (ties impossible when the sort key embeds a
    unique id in payload order), join output ∝ left × 2.

    Memory: one array holds one key's events for one bucket —
    events-per-key-per-window-width, the same row set the naive join
    would emit for that bucket, just materialized once instead of per
    left row. Skewed keys bound at window grain, not corpus grain.

    Returns the left rows (original columns) plus ``__first`` — a
    struct of (ts, *right_payload) or NULL when no right row qualifies.
    One output row per left INPUT row: left rows are tagged with a
    unique id before the bucket explode, so fully duplicate left rows
    do not collapse in the re-group (they would if the group key were
    only the left columns).
    """
    right_payload = right_payload or []
    bucket = F.floor(right_ts / F.lit(window_ms)).cast("long")
    arr = (
        right.select(
            *keys,
            bucket.alias("__bucket"),
            F.struct(right_ts.alias(ts_name), *right_payload).alias("__e"),
        )
        .groupBy(*keys, "__bucket")
        .agg(F.array_sort(F.collect_list("__e")).alias("__arr"))
    )
    lo_b = F.floor((left_ts + 1) / F.lit(window_ms)).cast("long")
    hi_b = F.floor((left_ts + window_ms) / F.lit(window_ms)).cast("long")
    l = (
        left.withColumn("__rid", F.monotonically_increasing_id())
        .withColumn("__lts", left_ts)
        .withColumn("__bucket", F.explode(F.sequence(lo_b, hi_b)))
    )
    lts = F.col("__lts")
    cand = l.join(arr, [*keys, "__bucket"], "left").withColumn(
        "__hit",
        F.try_element_at(
            F.filter(
                F.col("__arr"),
                lambda e: (e[ts_name] > lts)
                & (e[ts_name] <= lts + F.lit(window_ms)),
            ),
            F.lit(1),
        ),
    )
    group_cols = [c for c in left.columns]
    return (
        cand.groupBy("__rid", *group_cols, "__lts")
        .agg(F.min("__hit").alias("__first"))
        .drop("__lts", "__rid")
    )
