"""Time-series operators beyond the reference's surface: counter rate,
epoch-aligned resampling, linear gap-fill interpolation, EWMA.

The reference (uts.ts) stops at interval-bucketed streaming folds plus
``derivative`` (/root/reference/uts.ts:458-507); these are the classic
TSDB ops a production engine adds next. All but EWMA are pure window /
groupBy expressions (one shuffle on the series key, whole-stage
codegen); EWMA is inherently sequential per series, so it runs as a
shard-parallel applyInPandas with the same double arithmetic an oracle
can replay row-by-row.

Scale: every operator partitions by the series key — at 100 TB the
shuffle is one exchange on (key), skew-safe as long as no single series
exceeds an executor (the same contract every TSDB rollup has).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from uts_spark.operators.aggregates import stable_sum


def counter_rate(
    df: DataFrame,
    key: str,
    ts_ms: str,
    value: str,
) -> DataFrame:
    """Per-second rate of a monotone counter with reset handling
    (Prometheus ``rate``-style): delta = v - lag(v); a negative delta
    means the counter reset, in which case the new value IS the increase.
    First point per key has no predecessor and is dropped. One window,
    one shuffle on the key."""
    w = Window.partitionBy(key).orderBy(ts_ms)
    prev_v = F.lag(value).over(w)
    prev_t = F.lag(ts_ms).over(w)
    delta = F.when(F.col(value) >= prev_v, F.col(value) - prev_v).otherwise(
        F.col(value)
    )
    dt_s = (F.col(ts_ms) - prev_t) / F.lit(1000.0)
    return (
        df.withColumn("__pv", prev_v)
        .withColumn("rate_per_s", delta / dt_s)
        .filter(F.col("__pv").isNotNull())
        .drop("__pv")
    )


def resample(
    df: DataFrame,
    key: str,
    ts_ms: str,
    value: str,
    step_ms: int,
    order_col: str,
) -> DataFrame:
    """Epoch-aligned downsample: tumbling ``step_ms`` buckets (left-
    inclusive ``[k·step, (k+1)·step)`` — the SQL convention, unlike the
    reference's now-anchored right-inclusive bins, which live in
    plans/groupers.py), emitting mean/min/max/count plus ``last`` by
    insertion order. One hash aggregation."""
    bucket = (F.floor(F.col(ts_ms) / F.lit(step_ms)) * F.lit(step_ms)).alias(
        "bucket_ms"
    )
    # decimal-stable mean: partial-aggregation order can't flip low bits
    mean_v = F.sum(F.col(value).cast("decimal(38,6)")).cast("double") / F.count(value)
    return df.groupBy(F.col(key), bucket).agg(
        mean_v.alias("mean_v"),
        F.min(value).alias("min_v"),
        F.max(value).alias("max_v"),
        F.count(value).alias("n"),
        F.max_by(F.col(value), F.col(order_col)).alias("last_v"),
    )


def interpolate_linear(
    df: DataFrame,
    key: str,
    ts_ms: str,
    value: str,
    step_ms: int,
) -> DataFrame:
    """Values at regular grid timestamps per series, linearly
    interpolated between the bracketing observations (gap-fill for
    charting / alignment before cross-series joins).

    Grid = every multiple of ``step_ms`` inside the series' observed
    span. Implementation: union grid rows with observations, then one
    ascending window carries the previous observation forward
    (``last(..., ignorenulls)``) and one descending-frame window pulls
    the next observation backward; the interpolation weight is
    (g - prev_ts)/(next_ts - prev_ts). A grid point landing exactly on
    an observation gets that observation's value (weight 0 against the
    preceding row). Two window passes over one shuffle on the key."""
    span = df.groupBy(key).agg(
        F.min(ts_ms).alias("__t0"), F.max(ts_ms).alias("__t1")
    )
    g0 = F.ceil(F.col("__t0") / F.lit(step_ms)).cast("long") * F.lit(step_ms)
    g1 = F.floor(F.col("__t1") / F.lit(step_ms)).cast("long") * F.lit(step_ms)
    # a span shorter than one step contains no grid point: sequence()
    # throws on start > end, so emit an empty array instead
    grid = span.select(
        key,
        F.explode(
            F.when(g0 <= g1, F.sequence(g0, g1, F.lit(step_ms))).otherwise(
                F.array().cast("array<long>")
            )
        ).alias("grid_ms"),
    )
    obs = df.select(
        F.col(key),
        F.col(ts_ms).alias("__t"),
        F.col(value).alias("__v"),
        F.lit(0).alias("__is_grid"),
    )
    g = grid.select(
        F.col(key),
        F.col("grid_ms").alias("__t"),
        F.lit(None).cast("double").alias("__v"),
        F.lit(1).alias("__is_grid"),
    )
    u = obs.unionByName(g)
    # observation sorts BEFORE the grid row at the same timestamp, so the
    # carried-forward neighbor at an exact hit is the observation itself
    wb = (
        Window.partitionBy(key)
        .orderBy("__t", "__is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy("__t", "__is_grid")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last(F.col("__v"), ignorenulls=True).over(wb)
    prev_t = F.last(
        F.when(F.col("__v").isNotNull(), F.col("__t")), ignorenulls=True
    ).over(wb)
    next_v = F.first(F.col("__v"), ignorenulls=True).over(wf)
    next_t = F.first(
        F.when(F.col("__v").isNotNull(), F.col("__t")), ignorenulls=True
    ).over(wf)
    frac = (F.col("__t") - F.col("__pt")) / (F.col("__nt") - F.col("__pt"))
    interp = F.when(F.col("__pt") == F.col("__t"), F.col("__pv")).otherwise(
        F.col("__pv") + (F.col("__nv") - F.col("__pv")) * frac
    )
    return (
        u.withColumn("__pv", prev_v)
        .withColumn("__pt", prev_t)
        .withColumn("__nv", next_v)
        .withColumn("__nt", next_t)
        .filter(
            (F.col("__is_grid") == 1)
            & F.col("__pt").isNotNull()
            # an exact hit on the last observation has no NEXT neighbor
            # but needs none — its value is the observation's
            & (F.col("__nt").isNotNull() | (F.col("__pt") == F.col("__t")))
        )
        .select(
            F.col(key),
            F.col("__t").alias("grid_ms"),
            interp.alias("value"),
        )
    )


def ewma(
    df: DataFrame,
    key: str,
    ts_ms: str,
    value: str,
    alpha: float,
    order_col: str,
) -> DataFrame:
    """Exponentially weighted moving average per series:
    y_1 = x_1; y_n = alpha·x_n + (1-alpha)·y_{n-1}, rows in
    (ts, order_col) order.

    The recurrence is sequential per series — the closed-form window
    rewrite (cumsum of x_k·(1-alpha)^{-k}) overflows for long series, so
    the honest distributed shape is applyInPandas: one shuffle on the
    key, each series folded in one Arrow batch with plain double
    arithmetic (alpha·x + (1-alpha)·y, one multiply-add order, so an
    external engine replays it bit-for-bit)."""
    import pandas as pd

    base = df.select(
        F.col(key), F.col(ts_ms).alias("__t"), F.col(value).alias("__x"),
        F.col(order_col).alias("__o"),
    )
    a = float(alpha)
    b = 1.0 - a

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__t", "__o"], kind="mergesort").reset_index(drop=True)
        out = []
        y = None
        for x in pdf["__x"]:
            x = float(x)
            y = x if y is None else a * x + b * y
            out.append(y)
        pdf["ewma"] = out
        return pdf

    schema = (
        f"`{key}` {base.schema[key].dataType.simpleString()}, "
        "__t long, __x double, __o long, ewma double"
    )
    out = base.groupBy(key).applyInPandas(fold, schema)
    return out.select(
        F.col(key), F.col("__t").alias("ts_ms"), F.col("__x").alias("value"),
        F.col("ewma"),
    )


def duck_ewma(
    inner_sql: str, key: str, ts_expr: str, value_expr: str, alpha: float,
    order_expr: str,
) -> str:
    """DuckDB oracle for :func:`ewma`: the identical recurrence as a
    recursive CTE stepping row-by-row per series (same multiply-add
    order ⇒ bit-identical doubles; ``order_expr`` breaks timestamp
    ties exactly like the Spark side's order column)."""
    a = float(alpha)
    b = 1.0 - a
    return f"""
    WITH RECURSIVE seq AS (
      SELECT {key} AS k, {ts_expr} AS t, CAST({value_expr} AS DOUBLE) AS x,
             row_number() OVER (
               PARTITION BY {key} ORDER BY {ts_expr}, {order_expr}
             ) AS rn
      FROM ({inner_sql})
    ),
    folded AS (
      SELECT k, t, x, rn, x AS y FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.k, s.t, s.x, s.rn, {a!r} * s.x + {b!r} * f.y
      FROM seq s JOIN folded f ON s.k = f.k AND s.rn = f.rn + 1
    )
    SELECT k AS {key}, t AS ts_ms, x AS value, y AS ewma FROM folded
    """


def anomaly_zscore(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    window_ms: int,
    min_points: int = 10,
    threshold: float = 3.0,
) -> DataFrame:
    """Trailing-window z-score outliers: each point scored against the
    mean/stddev of its own series' preceding ``window_ms`` (RANGE frame,
    current row included), flagged when |z| exceeds ``threshold``.

    The moments are decimal-exact window sums (s1, s2) — identical
    regardless of partial-aggregation order, so the derived z is
    bit-reproducible (same property as the grouped stats operator).
    Population variance; windows with fewer than ``min_points`` points
    or zero variance never flag. ONE shuffle on the series key; the
    RANGE frame is a single ordered pass per partition.
    """
    from pyspark.sql.window import Window

    v = F.col(value_col)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).cast("long"))
        .rangeBetween(-int(window_ms), 0)
    )
    n = F.count(value_col).over(w)
    s1 = F.sum(v.cast("decimal(38,6)")).over(w).cast("double")
    s2 = F.sum((v * v).cast("decimal(38,6)")).over(w).cast("double")
    var = (s2 - s1 * s1 / n) / n
    z = (v - s1 / n) / F.sqrt(var)
    return (
        df.withColumn("__n", n)
        .withColumn("__var", var)
        .withColumn("z", z)
        .filter(
            (F.col("__n") >= min_points)
            & (F.col("__var") > 0)
            & (F.abs(F.col("z")) > threshold)
        )
        .drop("__n", "__var")
    )


def packed_order_key(time_col: str, order_col: str, interval_ms: int) -> Column:
    """The (in-bucket-offset, order) ordering key PACKED into one long:
    ``pmod(time, interval) * (2^62 // interval) + order`` — primitive, so
    min_by/max_by stay in HashAggregate (a struct key demotes them to
    SortAggregate; see :func:`ohlc` for the measurement).

    ENFORCED envelope (round-4 hardening): the packing is lexicographic
    only while ``0 <= order < 2^62 // interval_ms``; beyond it the key
    silently inverts open/close order (or overflows long under ANSI).
    Snowflake-style / hash-derived ids (~2^60+) with hour buckets WOULD
    have corrupted OHLC/M4 output with no error — so out-of-envelope
    order values now raise at execution time (``raise_error`` fires only
    on a violating row; the guard is one branch per row, still
    codegen'd). Callers with wider id spaces should order by a struct
    key instead and accept the SortAggregate."""
    id_space = (1 << 62) // int(interval_ms)
    o = F.col(order_col)
    packed = F.pmod(F.col(time_col), F.lit(int(interval_ms))) * F.lit(
        id_space
    ) + o
    return F.when((o >= 0) & (o < F.lit(id_space)), packed).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"packed_order_key: {order_col}="
                ),
                o.cast("string"),
                F.lit(
                    f" outside [0, {id_space}) for interval_ms="
                    f"{int(interval_ms)} — use a struct ordering key"
                ),
            )
        ).cast("long")
    )


def ohlc(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    interval_ms: int,
    order_col: str,
) -> DataFrame:
    """OHLC bars: per (key, epoch-aligned bucket) the first (open),
    max (high), min (low), and last (close) value — the canonical
    financial/TSDB downsample. ONE aggregation, no window pass, no
    second shuffle; ties at equal timestamps resolve by the unique
    ``order_col``.

    The (time, order) ordering key is PACKED into one long —
    ``in-bucket-offset · id_space + order`` — because a STRUCT ordering
    key demotes min_by/max_by from HashAggregate to SortAggregate
    (non-primitive buffer): measured 0.36 → 0.26 s/run at sf0.1, and at
    cluster scale it's the difference between an O(n) hash fold and a
    per-partition sort. Envelope: ``order_col`` values must stay below
    ``2^62 / interval_ms`` (hour buckets: 1.2e12 ids; the lexicographic
    equivalence is exact below that bound — same discipline as
    aggregates.lane_sum) — ENFORCED at execution by
    :func:`packed_order_key` since round 4; wider buckets or bigger id
    spaces should pass a struct key instead."""
    bucket = (
        F.floor(F.col(time_col) / F.lit(int(interval_ms))).cast("long")
        * F.lit(int(interval_ms))
    ).alias("bucket_ms")
    # pmod, not %: Spark's % follows the sign, so a pre-epoch timestamp
    # would get a NEGATIVE in-bucket offset and invert open/close order
    ordk = packed_order_key(time_col, order_col, interval_ms)
    v = F.col(value_col)
    return df.groupBy(F.col(key_col), bucket).agg(
        F.min_by(v, ordk).alias("open"),
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.max_by(v, ordk).alias("close"),
        F.count(v).alias("n"),
    )


def twap(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    order_col: str,
) -> DataFrame:
    """Time-weighted average price/value per key: each point's value
    holds until the next point, so the mean weights each value by its
    holding duration — the standard fix for irregularly-sampled series
    where the arithmetic mean over-counts burst periods.

    One lag/lead window + one aggregation, both on the same key
    partitioning (single shuffle). Exactness: each weighted product is
    snapped to an integer via ROUND(v*dt*2^20) — a power-of-TWO scale
    only shifts the exponent (no new rounding error), and both engines
    round half AWAY FROM ZERO, so every summand is the identical
    integer; the DECIMAL(38,0) sum is then order-independent. (A
    double→DECIMAL(38,6) cast here is NOT portable: the engines round
    that cast differently on tie digits — caught by the sf0.001 oracle
    sweep.) Keys with zero time span (single point / all-equal
    timestamps) yield NULL."""
    scale = 1 << 20
    w = Window.partitionBy(key_col).orderBy(time_col, order_col)
    nxt = F.lead(time_col).over(w)
    seg = df.select(
        F.col(key_col),
        F.col(time_col).alias("__t"),
        F.col(value_col).alias("__v"),
        nxt.alias("__nt"),
    )
    wsum = F.sum(
        F.round(F.col("__v") * (F.col("__nt") - F.col("__t")) * scale)
        .cast("decimal(38,0)")
    ).cast("double")
    span = F.max("__t") - F.min("__t")
    return seg.groupBy(key_col).agg(
        (wsum / scale / F.nullif(span.cast("double"), F.lit(0.0))).alias("twap"),
        F.count(F.lit(1)).alias("n"),
    )


def cusum_changepoint(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_col: str,
    k: float,
    h: float,
) -> DataFrame:
    """Two-sided CUSUM change detection per series (Page 1954): the
    classic sequential drift detector every production TSDB pairs with
    z-score outlier flags (z-score catches spikes; CUSUM catches slow
    level shifts).

    The textbook recursion ``S+_t = max(0, S+_{t-1} + (x_t - mu) - k)``
    looks inherently sequential, but distributes exactly: with
    ``P_t = prefix_sum(x - mu - k)``, the max-recursion unrolls to
    ``S+_t = P_t - min(0, min_{j<=t} P_j)`` — a prefix sum and a prefix
    min, i.e. two stacked window expressions over ONE shuffle on the
    series key (Spark reuses the sort between same-spec windows). Same
    for the negative side with ``-(x - mu)``.

    Exactness contract (the TWAP lesson): every summand is snapped to an
    integer via ``ROUND(d * 2^20)`` — a power-of-two scale adds no
    rounding error and both engines round half away from zero — so the
    DECIMAL(38,0) prefix sums/mins are exact integers and the emitted
    doubles are bit-identical to the oracle's. ``mu`` is the per-series
    mean (decimal-stable sum / count, same on both engines).

    Scale: one exchange on ``key_col``; the per-series grouped means are
    tiny and broadcast back. No iteration, no Python.
    """
    scale = 1 << 20
    # per-series mean as a whole-partition window over the SAME key the
    # ordered cusum windows shuffle on (optimization r11, guide §2.4):
    # the old groupBy + broadcast-join planned the input scan twice and
    # paid a broadcast exchange; the window computes mu inside the one
    # exchange every other window here already needs. Same decimal-
    # stable sum / count arithmetic — bit-identical mu.
    wp = Window.partitionBy(key_col)
    mu_col = (
        F.sum(F.col(value_col).cast("decimal(38,6)")).over(wp).cast("double")
        / F.count(value_col).over(wp)
    )
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = F.col(value_col) - F.col("__mu")
    pos_step = F.round((d - F.lit(k)) * scale).cast("decimal(38,0)")
    neg_step = F.round((-d - F.lit(k)) * scale).cast("decimal(38,0)")
    out = (
        df.withColumn("__mu", mu_col)
        .withColumn("__pp", F.sum(pos_step).over(run))
        .withColumn("__pn", F.sum(neg_step).over(run))
        .withColumn("__mp", F.min(F.col("__pp")).over(run))
        .withColumn("__mn", F.min(F.col("__pn")).over(run))
    )
    zero = F.lit(0).cast("decimal(38,0)")
    s_pos = F.col("__pp") - F.least(zero, F.col("__mp"))
    s_neg = F.col("__pn") - F.least(zero, F.col("__mn"))
    lim = F.lit(int(round(h * scale))).cast("decimal(38,0)")
    return out.select(
        F.col(key_col),
        F.col(ts_col),
        (s_pos.cast("double") / scale).alias("s_pos"),
        (s_neg.cast("double") / scale).alias("s_neg"),
        ((s_pos > lim) | (s_neg > lim)).alias("changepoint"),
    )


def rolling_autocorr(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_col: str,
    window_rows: int = 20,
) -> DataFrame:
    """Rolling lag-1 Pearson autocorrelation per series over a trailing
    ``window_rows``-row frame — the windowed sibling of the global
    autocorrelation operator: a local trend/momentum signal (near +1 =
    locally smooth drift, near 0 = noise, negative = mean-reverting).

    Exactness: x and its lag are snapped to integers (``ROUND(v*100)``
    — the generator emits 2-dp values; both engines round identically),
    so the five moment sums (n, Σx, Σy, Σx², Σy², Σxy) over the frame
    are exact DECIMAL integers no matter how either engine associates
    the in-frame additions (DuckDB's segment-tree frames reassociate —
    doubles would drift). The final correlation is one double formula
    over identical integers. Rows whose frame holds fewer than
    ``window_rows`` lagged pairs, or with zero variance on either side,
    emit NULL.

    One shuffle on the series key; lag + five frame sums share the same
    window spec, so a single sort feeds everything.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    frame = w.rowsBetween(-(window_rows - 1), 0)
    xi = F.round(F.col(value_col) * 100).cast("long")
    df = df.withColumn("__x", xi).withColumn("__y", F.lag("__x").over(w))
    dec = lambda c: F.sum(c.cast("decimal(38,0)")).over(frame).cast("double")
    has = F.col("__y").isNotNull()
    n = F.sum(F.when(has, 1).otherwise(0)).over(frame)
    sx = dec(F.when(has, F.col("__x")))
    sy = dec(F.when(has, F.col("__y")))
    sxx = dec(F.when(has, F.col("__x") * F.col("__x")))
    syy = dec(F.when(has, F.col("__y") * F.col("__y")))
    sxy = dec(F.when(has, F.col("__x") * F.col("__y")))
    nd = n.cast("double")
    cov = nd * sxy - sx * sy
    vx = nd * sxx - sx * sx
    vy = nd * syy - sy * sy
    corr = F.when(
        (n >= window_rows) & (vx > 0) & (vy > 0),
        cov / F.sqrt(vx * vy),
    )
    return df.select(
        F.col(key_col), F.col(ts_col), F.col(order_col),
        corr.alias("autocorr"), n.alias("n_pairs"),
    )


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Union-of-intervals coverage per key (gaps-and-islands): merge
    overlapping/adjacent [start, end) intervals and report how many
    merged islands remain, total covered time, and the longest island —
    the standard "actual active time" rollup for overlapping sessions,
    maintenance windows, or sensor validity ranges.

    Distribution: an interval starts a new island iff its start exceeds
    the running max of all previous ends (one window pass, frame
    exclusive of the current row); the island id is then a running sum
    of those flags over the SAME sort — both windows share one shuffle +
    one sort on the key. Two small hash aggregations finish per-island
    then per-key. All arithmetic is integer (epoch ms), so the DuckDB
    oracle matches bit-for-bit.
    """
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    flagged = df.withColumn("__new", new_island).withColumn(
        "__island",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = flagged.groupBy(key_col, "__island").agg(
        F.min(start_col).alias("__s"), F.max(end_col).alias("__e")
    )
    return islands.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("__e") - F.col("__s")).alias("covered_ms"),
        F.max(F.col("__e") - F.col("__s")).alias("longest_ms"),
    )


def lttb_downsample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_col: str,
    bucket_ms: int,
) -> DataFrame:
    """LTTB downsampling (Largest-Triangle-Three-Buckets, Steinarsson
    2013) — the standard perceptual decimation for plotting huge series:
    keep, per time bucket, the point forming the largest triangle with
    its neighbor buckets, plus both endpoints of each series.

    This is the bucket-anchor PARALLEL variant: the classic algorithm
    anchors each triangle on the previously SELECTED point (a sequential
    chain); anchoring on the neighbor buckets' centroids instead makes
    every bucket independent — one grouped centroid pass, a lag/lead
    over the (tiny) bucket table, one join back, one per-bucket argmax —
    while choosing near-identical points in practice.

    Determinism: the area formula is one fixed IEEE expression over
    identical inputs (centroids are decimal-stable means), and the
    argmax tie-breaks on the unique ``order_col``, so an external engine
    replays the exact selection. Edge buckets without both neighbors
    contribute no interior pick; the series endpoints (min/max time,
    tie-broken) are always emitted with ``is_endpoint`` = true.
    """
    b = F.floor(F.col(ts_col) / F.lit(int(bucket_ms))).cast("long")
    pts = df.select(
        F.col(key_col).alias("__k"), b.alias("__b"),
        F.col(ts_col).alias("__t"), F.col(value_col).alias("__v"),
        F.col(order_col).alias("__o"),
    )
    cent = pts.groupBy("__k", "__b").agg(
        (stable_sum(F.col("__t")) / F.count("__t")).alias("cx"),
        (stable_sum(F.col("__v")) / F.count("__v")).alias("cy"),
    )
    wb = Window.partitionBy("__k").orderBy("__b")
    anchors = cent.select(
        "__k", "__b",
        F.lag("cx").over(wb).alias("ax"), F.lag("cy").over(wb).alias("ay"),
        F.lead("cx").over(wb).alias("nx"), F.lead("cy").over(wb).alias("ny"),
    ).filter(F.col("ax").isNotNull() & F.col("nx").isNotNull())
    area2 = F.abs(
        (F.col("ax") - F.col("nx")) * (F.col("__v") - F.col("ay"))
        - (F.col("ax") - F.col("__t")) * (F.col("ny") - F.col("ay"))
    )
    wa = Window.partitionBy("__k", "__b").orderBy(
        F.col("__area").desc(), F.col("__o")
    )
    interior = (
        pts.join(F.broadcast(anchors), ["__k", "__b"])
        .withColumn("__area", area2)
        .withColumn("__rn", F.row_number().over(wa))
        .filter(F.col("__rn") == 1)
        .select("__k", "__t", "__v", F.lit(False).alias("is_endpoint"))
    )
    wf = Window.partitionBy("__k").orderBy("__t", "__o")
    wl = Window.partitionBy("__k").orderBy(
        F.col("__t").desc(), F.col("__o").desc()
    )
    ends = (
        pts.withColumn("__rf", F.row_number().over(wf))
        .withColumn("__rl", F.row_number().over(wl))
        .filter((F.col("__rf") == 1) | (F.col("__rl") == 1))
        .select("__k", "__t", "__v", F.lit(True).alias("is_endpoint"))
    )
    return interior.unionByName(ends).select(
        F.col("__k").alias(key_col), F.col("__t").alias(ts_col),
        F.col("__v").alias(value_col), "is_endpoint",
    )


def holt_smoothing(
    df: DataFrame,
    key: str,
    ts_ms: str,
    value: str,
    alpha: float,
    gamma: float,
    order_col: str,
) -> DataFrame:
    """Holt double-exponential smoothing per series (level + trend):
    l_1 = x_1, b_1 = 0;
    l_n = alpha·x_n + (1−alpha)·(l_{n−1} + b_{n−1});
    b_n = gamma·(l_n − l_{n−1}) + (1−gamma)·b_{n−1};
    fitted one-step forecast = l_n + b_n. The trend-aware extension of
    :func:`ewma` — EWMA lags any drifting series, Holt tracks it.

    Same distributed shape and exactness argument as EWMA: the
    recurrence is inherently sequential per series, so applyInPandas
    folds each series in one Arrow batch after a single shuffle on the
    key, with a FIXED multiply-add order that the oracle's recursive
    CTE replays bit-for-bit."""
    import pandas as pd

    base = df.select(
        F.col(key), F.col(ts_ms).alias("__t"), F.col(value).alias("__x"),
        F.col(order_col).alias("__o"),
    )
    a = float(alpha)
    ac = 1.0 - a
    g = float(gamma)
    gc = 1.0 - g

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__t", "__o"], kind="mergesort").reset_index(
            drop=True
        )
        levels, trends = [], []
        l = t = None
        for x in pdf["__x"]:
            x = float(x)
            if l is None:
                l, t = x, 0.0
            else:
                l_new = a * x + ac * (l + t)
                t = g * (l_new - l) + gc * t
                l = l_new
            levels.append(l)
            trends.append(t)
        pdf["level"] = levels
        pdf["trend"] = trends
        return pdf

    schema = (
        f"`{key}` {base.schema[key].dataType.simpleString()}, "
        "__t long, __x double, __o long, level double, trend double"
    )
    out = base.groupBy(key).applyInPandas(fold, schema)
    return out.select(
        F.col(key),
        F.col("__t").alias("ts_ms"),
        F.col("__x").alias("value"),
        "level",
        "trend",
        (F.col("level") + F.col("trend")).alias("fitted"),
    )


def duck_holt(
    inner_sql: str, key: str, ts_expr: str, value_expr: str,
    alpha: float, gamma: float, order_expr: str, out_key: str = "k",
) -> str:
    """DuckDB oracle for :func:`holt_smoothing`: the identical
    recurrence as a recursive CTE. ``l_n`` is recomputed inside the
    ``b_n`` expression with the same operation order — deterministic
    IEEE doubles make the recomputation bit-identical to the fold's
    stored value."""
    a = float(alpha)
    ac = 1.0 - a
    g = float(gamma)
    gc = 1.0 - g
    # every literal cast to DOUBLE: DuckDB otherwise types 0.5 as
    # DECIMAL and infers the recursive columns from the base case
    A, AC = f"CAST({a!r} AS DOUBLE)", f"CAST({ac!r} AS DOUBLE)"
    G, GC = f"CAST({g!r} AS DOUBLE)", f"CAST({gc!r} AS DOUBLE)"
    ln = f"({A} * s.x + {AC} * (r.l + r.b))"
    return f"""
    WITH RECURSIVE seq AS (
      SELECT {key} AS k, {ts_expr} AS t,
             CAST({value_expr} AS DOUBLE) AS x,
             ROW_NUMBER() OVER (PARTITION BY {key}
                                ORDER BY {ts_expr}, {order_expr}) AS rn
      FROM ({inner_sql})
    ),
    rec AS (
      SELECT k, rn, t, x, x AS l, CAST(0.0 AS DOUBLE) AS b
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.k, s.rn, s.t, s.x,
             {ln} AS l,
             {G} * ({ln} - r.l) + {GC} * r.b AS b
      FROM rec r JOIN seq s ON s.k = r.k AND s.rn = r.rn + 1
    )
    SELECT k AS {out_key}, t AS ts_ms, x AS value, l AS level,
           b AS trend, l + b AS fitted
    FROM rec
    """


def capped_sessions(
    df: DataFrame,
    key: str,
    ts_ms: str,
    gap_ms: int,
    cap_ms: int,
    order_col: str,
) -> DataFrame:
    """Capped-duration sessionization: a new session starts when the
    inactivity gap is reached — like native ``session_window`` — OR when
    the running session would exceed ``cap_ms`` total duration (the
    policy bound analytics stacks impose so one endless clickstream
    can't form an unbounded session). The cap makes the split
    DATA-DEPENDENTLY SEQUENTIAL (whether event n starts a session
    depends on where the previous session started, which depends on
    every earlier split), so no window expression computes it; the
    honest distributed shape is one shuffle on the key + an
    applyInPandas fold per series, and the oracle replays the identical
    recurrence as a recursive CTE.

    Returns every event with its (session_seq, session_start)."""
    import pandas as pd

    base = df.select(
        F.col(key), F.col(ts_ms).alias("__t"), F.col(order_col).alias("__o")
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__t", "__o"], kind="mergesort").reset_index(
            drop=True
        )
        seqs, starts = [], []
        seq = 0
        start = prev = None
        for t in pdf["__t"].astype("int64"):
            t = int(t)
            if start is None or t - prev >= gap_ms or t - start > cap_ms:
                seq += 1
                start = t
            prev = t
            seqs.append(seq)
            starts.append(start)
        pdf["session_seq"] = seqs
        pdf["session_start"] = starts
        return pdf

    schema = (
        f"`{key}` {base.schema[key].dataType.simpleString()}, "
        "__t long, __o long, session_seq long, session_start long"
    )
    out = base.groupBy(key).applyInPandas(fold, schema)
    return out.select(
        F.col(key),
        F.col("__t").alias("ts_ms"),
        F.col("__o").alias("order_id"),
        "session_seq",
        "session_start",
    )


def duck_capped_sessions(
    inner_sql: str, key: str, ts_expr: str, gap_ms: int, cap_ms: int,
    order_expr: str, out_key: str = "k",
) -> str:
    """DuckDB oracle for :func:`capped_sessions`: the identical
    sequential split as a recursive CTE over ranked rows."""
    return f"""
    WITH RECURSIVE seq AS (
      SELECT {key} AS k, {ts_expr} AS t, {order_expr} AS o,
             ROW_NUMBER() OVER (PARTITION BY {key}
                                ORDER BY {ts_expr}, {order_expr}) AS rn
      FROM ({inner_sql})
    ),
    rec AS (
      SELECT k, rn, t, o, CAST(1 AS BIGINT) AS session_seq, t AS session_start
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.k, s.rn, s.t, s.o,
             CASE WHEN s.t - r.t >= {gap_ms}
                    OR s.t - r.session_start > {cap_ms}
                  THEN r.session_seq + 1 ELSE r.session_seq END,
             CASE WHEN s.t - r.t >= {gap_ms}
                    OR s.t - r.session_start > {cap_ms}
                  THEN s.t ELSE r.session_start END
      FROM rec r JOIN seq s ON s.k = r.k AND s.rn = r.rn + 1
    )
    SELECT k AS {out_key}, t AS ts_ms, o AS order_id,
           session_seq, session_start
    FROM rec
    """


def holt_winters(
    df: DataFrame,
    key: str,
    step_col: str,
    value_col: str,
    season_len: int,
    alpha: float,
    beta: float,
    delta: float,
) -> DataFrame:
    """Holt-Winters additive TRIPLE smoothing (level + trend + seasonal)
    per series over a REGULAR step grid (resample/spine first — the
    seasonal index s_{t−m} presumes equal spacing):
    l_1 = y_1, b_1 = 0, seasonals start at 0;
    l_t = α·(y_t − s_{t−m}) + (1−α)·(l + b);
    b_t = β·(l_t − l_prev) + (1−β)·b;
    s_t = δ·(y_t − l_t) + (1−δ)·s_{t−m}.
    The recurrence carries a LENGTH-m SEASONAL RING in state — the
    oracle replays it as a recursive CTE whose state column is a
    shifting list, so even triple smoothing stays bit-exact across
    engines (fixed multiply-add order, dyadic coefficients).

    Distribution: one shuffle on the series key; each series folds in
    one Arrow batch (state is m+2 doubles, independent of length)."""
    import pandas as pd

    base = df.select(
        F.col(key), F.col(step_col).alias("__h"), F.col(value_col).alias("__y")
    )
    a, ac = float(alpha), 1.0 - float(alpha)
    g, gc = float(beta), 1.0 - float(beta)
    d, dc = float(delta), 1.0 - float(delta)
    m = int(season_len)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__h").reset_index(drop=True)
        ring = [0.0] * m
        levels, trends, seasonals = [], [], []
        l = b = None
        for y in pdf["__y"]:
            y = float(y)
            sm = ring[0]
            if l is None:
                l, b = y, 0.0
                sn = d * (y - l) + dc * sm
            else:
                l_new = a * (y - sm) + ac * (l + b)
                b = g * (l_new - l) + gc * b
                sn = d * (y - l_new) + dc * sm
                l = l_new
            ring = ring[1:] + [sn]
            levels.append(l)
            trends.append(b)
            seasonals.append(sn)
        pdf["level"] = levels
        pdf["trend"] = trends
        pdf["seasonal"] = seasonals
        return pdf

    schema = (
        f"`{key}` {base.schema[key].dataType.simpleString()}, "
        "__h long, __y double, level double, trend double, seasonal double"
    )
    out = base.groupBy(key).applyInPandas(fold, schema)
    return out.select(
        F.col(key),
        F.col("__h").alias("step"),
        F.col("__y").alias("value"),
        "level",
        "trend",
        "seasonal",
    )


def duck_holt_winters(
    inner_sql: str, key: str, step_expr: str, value_expr: str,
    season_len: int, alpha: float, beta: float, delta: float,
    out_key: str = "k",
) -> str:
    """DuckDB oracle for :func:`holt_winters`: recursive CTE whose state
    carries the m-slot seasonal ring as a shifting DOUBLE list."""
    a, ac = float(alpha), 1.0 - float(alpha)
    g, gc = float(beta), 1.0 - float(beta)
    d, dc = float(delta), 1.0 - float(delta)
    m = int(season_len)
    A, AC = f"CAST({a!r} AS DOUBLE)", f"CAST({ac!r} AS DOUBLE)"
    G, GC = f"CAST({g!r} AS DOUBLE)", f"CAST({gc!r} AS DOUBLE)"
    D, DC = f"CAST({d!r} AS DOUBLE)", f"CAST({dc!r} AS DOUBLE)"
    zeros = "[" + ", ".join("CAST(0.0 AS DOUBLE)" for _ in range(m)) + "]"
    ln = f"({A} * (s.y - r.sl[1]) + {AC} * (r.l + r.b))"
    sn = f"({D} * (s.y - {ln}) + {DC} * r.sl[1])"
    return f"""
    WITH RECURSIVE seq AS (
      SELECT {key} AS k, {step_expr} AS h,
             CAST({value_expr} AS DOUBLE) AS y,
             ROW_NUMBER() OVER (PARTITION BY {key}
                                ORDER BY {step_expr}) AS rn
      FROM ({inner_sql})
    ),
    rec AS (
      SELECT k, rn, h, y, y AS l, CAST(0.0 AS DOUBLE) AS b,
             CAST(0.0 AS DOUBLE) AS seasonal, {zeros} AS sl
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.k, s.rn, s.h, s.y,
             {ln} AS l,
             {G} * ({ln} - r.l) + {GC} * r.b AS b,
             {sn} AS seasonal,
             list_append(r.sl[2:], {sn}) AS sl
      FROM rec r JOIN seq s ON s.k = r.k AND s.rn = r.rn + 1
    )
    SELECT k AS {out_key}, h AS step, y AS value, l AS level,
           b AS trend, seasonal
    FROM rec
    """


def clamped_running_balance(
    df: DataFrame,
    key: str,
    ts_ms: str,
    delta_col: str,
    order_col: str,
    floor_value: float = 0.0,
) -> DataFrame:
    """Running balance with a floor clamp: balance_t = max(floor,
    balance_{t−1} + delta_t) — inventory that cannot go negative,
    prepaid credit that cannot overdraw, battery charge. The clamp
    makes the recurrence DATA-DEPENDENT (a window cumsum cannot know
    where past clamps absorbed deficit), so like the capped-session
    split it runs as one applyInPandas fold per key against a
    recursive-CTE oracle with pinned arithmetic order."""
    import pandas as pd

    base = df.select(
        F.col(key), F.col(ts_ms).alias("__t"), F.col(delta_col).alias("__d"),
        F.col(order_col).alias("__o"),
    )
    fv = float(floor_value)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__t", "__o"], kind="mergesort").reset_index(
            drop=True
        )
        bal = fv
        out = []
        for d in pdf["__d"]:
            bal = bal + float(d)
            if bal < fv:
                bal = fv
            out.append(bal)
        pdf["balance"] = out
        return pdf

    schema = (
        f"`{key}` {base.schema[key].dataType.simpleString()}, "
        "__t long, __d double, __o long, balance double"
    )
    out = base.groupBy(key).applyInPandas(fold, schema)
    return out.select(
        F.col(key),
        F.col("__t").alias("ts_ms"),
        F.col("__d").alias("delta"),
        F.col("__o").alias("order_id"),
        "balance",
    )


def duck_clamped_balance(
    inner_sql: str, key: str, ts_expr: str, delta_expr: str,
    order_expr: str, floor_value: float = 0.0, out_key: str = "k",
) -> str:
    fv = f"CAST({float(floor_value)!r} AS DOUBLE)"
    return f"""
    WITH RECURSIVE seq AS (
      SELECT {key} AS k, {ts_expr} AS t,
             CAST({delta_expr} AS DOUBLE) AS d, {order_expr} AS o,
             ROW_NUMBER() OVER (PARTITION BY {key}
                                ORDER BY {ts_expr}, {order_expr}) AS rn
      FROM ({inner_sql})
    ),
    rec AS (
      SELECT k, rn, t, d, o,
             GREATEST({fv} + d, {fv}) AS balance
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.k, s.rn, s.t, s.d, s.o,
             GREATEST(r.balance + s.d, {fv})
      FROM rec r JOIN seq s ON s.k = r.k AND s.rn = r.rn + 1
    )
    SELECT k AS {out_key}, t AS ts_ms, d AS delta, o AS order_id, balance
    FROM rec
    """
