"""Extended time-series queries over the events table: counter rate,
epoch-aligned resample, linear gap-fill interpolation, EWMA
(operators/timeseries.py) — the classic TSDB surface one layer above the
reference's interval-bucketed folds.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from uts_spark.operators.timeseries import (
    anomaly_zscore,
    counter_rate,
    duck_ewma,
    ewma,
    interpolate_linear,
    packed_order_key,
    resample,
)
from uts_spark.registry import DAY, FDIV, HOUR, MS, query, table

_W = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
_WF = "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"


@query(
    "ts_counter_rate",
    f"""
    WITH e AS (
      SELECT user_id, {MS} AS ts_ms, value FROM events
      WHERE event_type = 'click'
    ),
    w AS (
      SELECT *,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts_ms) AS pv,
             lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) AS pt
      FROM e
    )
    SELECT user_id, ts_ms, value,
           (CASE WHEN value >= pv THEN value - pv ELSE value END)
             / ((ts_ms - pt) / 1000.0) AS rate_per_s
    FROM w WHERE pv IS NOT NULL
    """,
)
def ts_counter_rate(spark, sf_dir):
    """Prometheus-style per-second rate with counter-reset handling
    (negative delta ⇒ the new value is the increase): one lag window,
    one shuffle on the series key."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    out = counter_rate(ev, "user_id", "ts_ms", "value")
    return out.select("user_id", "ts_ms", "value", "rate_per_s")


@query(
    "ts_resample_hourly",
    f"""
    SELECT user_id,
           ({FDIV(MS, HOUR)}) * {HOUR} AS bucket_ms,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value)
             AS mean_v,
           MIN(value) AS min_v,
           MAX(value) AS max_v,
           COUNT(value) AS n,
           max_by(value, event_id) AS last_v
    FROM events
    GROUP BY user_id, ({FDIV(MS, HOUR)}) * {HOUR}
    """,
)
def ts_resample_hourly(spark, sf_dir):
    """Epoch-aligned hourly downsample per series: mean/min/max/count +
    insertion-order last, one hash aggregation (decimal-stable mean so
    partial-agg order can't flip low bits)."""
    ev = table(spark, sf_dir, "events")
    return resample(ev, "user_id", "ts_ms", "value", HOUR, "ingest_id")


@query(
    "ts_interpolate_1h",
    f"""
    WITH e AS (
      SELECT user_id, {MS} AS t, value FROM events WHERE event_type = 'view'
    ),
    span AS (SELECT user_id, min(t) AS t0, max(t) AS t1 FROM e GROUP BY user_id),
    grid AS (
      SELECT user_id,
             unnest(generate_series(
               CAST(ceil(t0 / {float(HOUR)!r}) AS BIGINT) * {HOUR},
               CAST(floor(t1 / {float(HOUR)!r}) AS BIGINT) * {HOUR},
               {HOUR})) AS t
      FROM span
    ),
    u AS (
      SELECT user_id, t, value AS v, 0 AS is_grid FROM e
      UNION ALL
      SELECT user_id, t, NULL AS v, 1 AS is_grid FROM grid
    ),
    w AS (
      SELECT *,
        last_value(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY t, is_grid {_W}) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY t, is_grid {_W}) AS pt,
        first_value(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY t, is_grid {_WF}) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY t, is_grid {_WF}) AS nt
      FROM u
    )
    SELECT user_id, t AS grid_ms,
           CASE WHEN pt = t THEN pv
                ELSE pv + (nv - pv) * ((t - pt) / (nt - pt)) END AS value
    FROM w
    WHERE is_grid = 1 AND pt IS NOT NULL AND (nt IS NOT NULL OR pt = t)
    """,
)
def ts_interpolate_1h(spark, sf_dir):
    """Linear gap-fill onto an hourly grid per series (alignment before
    cross-series joins): grid rows unioned with observations, previous
    neighbor carried forward and next neighbor pulled backward by two
    frame windows over ONE shuffle on the key."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    return interpolate_linear(ev, "user_id", "ts_ms", "value", HOUR)


@query(
    "ts_ewma",
    duck_ewma(
        f"SELECT user_id, {MS} AS ts_ms, value, event_id FROM events "
        "WHERE event_type = 'purchase'",
        "user_id",
        "ts_ms",
        "value",
        0.3,
        "event_id",
    ),
)
def ts_ewma(spark, sf_dir):
    """EWMA (alpha=0.3) per series: the sequential recurrence runs
    shard-parallel via applyInPandas (one Arrow batch per series, one
    shuffle); the oracle replays the identical multiply-add chain with a
    recursive CTE — bit-exact doubles on both engines."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ewma(ev, "user_id", "ts_ms", "value", 0.3, "ingest_id")


@query(
    "ts_anomaly_zscore",
    f"""
    WITH e AS (
      SELECT event_id, event_type, {MS} AS ts_ms, value FROM events
    ),
    w AS (
      SELECT event_id, event_type, ts_ms, value,
             COUNT(value) OVER win AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER win AS DOUBLE) AS s1,
             CAST(SUM(CAST(value * value AS DECIMAL(38,6))) OVER win AS DOUBLE)
               AS s2
      FROM e
      WINDOW win AS (PARTITION BY event_type ORDER BY ts_ms
                     RANGE BETWEEN {DAY} PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, event_type, ts_ms, value,
           (value - s1 / n) / sqrt((s2 - s1 * s1 / n) / n) AS z
    FROM w
    WHERE n >= 10 AND (s2 - s1 * s1 / n) / n > 0
      AND abs((value - s1 / n) / sqrt((s2 - s1 * s1 / n) / n)) > 3
    """,
)
def ts_anomaly_zscore(spark, sf_dir):
    """Streaming-style anomaly detection on a batch table: every event
    scored against its event type's trailing 24 h mean/stddev, |z| > 3
    flagged. Decimal-exact window moments make the float z
    bit-identical across engines and partitionings
    (operators/timeseries.anomaly_zscore)."""
    ev = table(spark, sf_dir, "events")
    out = anomaly_zscore(
        ev, "event_type", "ts_ms", "value", window_ms=DAY,
        min_points=10, threshold=3.0,
    )
    return out.select("event_id", "event_type", "ts_ms", "value", "z")


from uts_spark.operators.timeseries import ohlc, twap  # noqa: E402


@query(
    "ts_ohlc_hourly",
    f"""
    WITH b AS (
      SELECT event_type, ({FDIV(MS, HOUR)}) * {HOUR} AS bucket_ms,
             {MS} AS t, event_id, value
      FROM events
    ),
    w AS (
      SELECT *,
        row_number() OVER (PARTITION BY event_type, bucket_ms
                           ORDER BY t, event_id) AS ra,
        row_number() OVER (PARTITION BY event_type, bucket_ms
                           ORDER BY t DESC, event_id DESC) AS rd
      FROM b
    )
    SELECT event_type, bucket_ms,
           MAX(CASE WHEN ra = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rd = 1 THEN value END) AS close,
           COUNT(value) AS n
    FROM w GROUP BY event_type, bucket_ms
    """,
)
def ts_ohlc_hourly(spark, sf_dir):
    """Hourly OHLC bars per event_type: ONE hash aggregation — open and
    close are min_by/max_by on a packed (time, event_id) long key (see
    operators/timeseries.ohlc: a struct key would fall back to
    SortAggregate), so there is no window pass at all (the oracle's
    row_number formulation is the semantics spec, not the plan)."""
    ev = table(spark, sf_dir, "events")
    return ohlc(ev, "event_type", "ts_ms", "value", HOUR, "event_id")


@query(
    "ts_twap_by_type",
    f"""
    WITH e AS (
      SELECT event_type, {MS} AS t, event_id, value FROM events
    ),
    w AS (
      SELECT *, lead(t) OVER (PARTITION BY event_type
                              ORDER BY t, event_id) AS nt
      FROM e
    )
    SELECT event_type,
           CAST(SUM(CAST(ROUND(value * (nt - t) * 1048576) AS DECIMAL(38,0)))
                AS DOUBLE) / 1048576
             / NULLIF(CAST(MAX(t) - MIN(t) AS DOUBLE), 0.0) AS twap,
           COUNT(*) AS n
    FROM w GROUP BY event_type
    """,
)
def ts_twap_by_type(spark, sf_dir):
    """Time-weighted average value per event_type: each value weighted
    by its holding duration (lead − t); decimal-stable weighted sum so
    shuffle order can't flip low bits. One shuffle on the key for both
    the window and the aggregation."""
    ev = table(spark, sf_dir, "events")
    return twap(ev, "event_type", "ts_ms", "value", "event_id")


@query(
    "ts_hopping_2d_1d",
    f"""
    WITH e AS (SELECT event_type, {MS} AS t, value FROM events),
    x AS (
      SELECT event_type, value,
             unnest([(({FDIV("t", DAY)}) - 1) * {DAY}, ({FDIV("t", DAY)}) * {DAY}]) AS start
      FROM e
    )
    SELECT start, event_type,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value)
             AS mean_value,
           COUNT(*) AS n
    FROM x GROUP BY start, event_type
    """,
)
def ts_hopping_2d_1d(spark, sf_dir):
    """HOPPING (sliding) window aggregation: 2-day windows every 1 day,
    so each event lands in exactly two windows — Spark's native
    ``F.window(ts, width, slide)`` (an internal explode, then the same
    hash aggregation as tumbling; no self-join). The reference has only
    back-to-back tumbling bins (uts.ts:100-147); overlapping windows are
    a north-star extension."""
    ev = table(spark, sf_dir, "events")
    w = F.window(F.col("ts"), "2 days", "1 day")
    return (
        ev.groupBy(w.alias("__w"), "event_type")
        .agg(
            (
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
                / F.count("value")
            ).alias("mean_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.unix_millis(F.col("__w.start")).alias("start"),
            "event_type", "mean_value", "n",
        )
    )


from uts_spark.operators.timeseries import (  # noqa: E402
    cusum_changepoint,
    interval_coverage,
    rolling_autocorr,
)

_CUSUM_K = 25.0   # allowance ≈ 0.5σ of the generator's value noise
_CUSUM_H = 250.0  # decision limit ≈ 5σ
_SC = 1 << 20


@query(
    "ts_cusum_changepoint",
    f"""
    WITH e AS (
      SELECT user_id, {MS} AS ts_ms, event_id, value FROM events
    ),
    m AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value)
               AS mu
      FROM e GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, ts_ms, event_id,
             SUM(CAST(ROUND((value - mu - {_CUSUM_K}) * {_SC})
                 AS DECIMAL(38,0))) OVER w AS pp,
             SUM(CAST(ROUND((-(value - mu) - {_CUSUM_K}) * {_SC})
                 AS DECIMAL(38,0))) OVER w AS pn
      FROM e JOIN m USING (user_id)
      WINDOW w AS (PARTITION BY e.user_id ORDER BY ts_ms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    q AS (
      SELECT user_id, ts_ms, pp, pn,
             MIN(pp) OVER w2 AS mp, MIN(pn) OVER w2 AS mn
      FROM p
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_ms, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, ts_ms,
           CAST(pp - LEAST(CAST(0 AS DECIMAL(38,0)), mp) AS DOUBLE) / {_SC}
             AS s_pos,
           CAST(pn - LEAST(CAST(0 AS DECIMAL(38,0)), mn) AS DOUBLE) / {_SC}
             AS s_neg,
           (pp - LEAST(CAST(0 AS DECIMAL(38,0)), mp)
              > CAST({int(_CUSUM_H * _SC)} AS DECIMAL(38,0)))
           OR (pn - LEAST(CAST(0 AS DECIMAL(38,0)), mn)
              > CAST({int(_CUSUM_H * _SC)} AS DECIMAL(38,0)))
             AS changepoint
    FROM q
    """,
)
def ts_cusum_changepoint(spark, sf_dir):
    """Two-sided CUSUM level-shift detection per user series: the
    max-recursion unrolled to prefix-sum minus prefix-min (two stacked
    window exprs, ONE shuffle), integer-snapped steps so both engines
    fold bit-identically. See operators/timeseries.cusum_changepoint."""
    ev = table(spark, sf_dir, "events")
    return cusum_changepoint(
        ev, "user_id", "ts_ms", "value", "event_id",
        k=_CUSUM_K, h=_CUSUM_H,
    )


@query(
    "ts_rolling_autocorr",
    f"""
    WITH e AS (
      SELECT user_id, {MS} AS ts_ms, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS x
      FROM events
    ),
    l AS (
      SELECT *, lag(x) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
               AS y
      FROM e
    ),
    m AS (
      SELECT user_id, ts_ms, event_id,
        CAST(SUM(CASE WHEN y IS NULL THEN 0 ELSE 1 END) OVER w AS BIGINT)
          AS n,
        CAST(SUM(CASE WHEN y IS NOT NULL
                 THEN CAST(x AS DECIMAL(38,0)) END) OVER w AS DOUBLE) AS sx,
        CAST(SUM(CASE WHEN y IS NOT NULL
                 THEN CAST(y AS DECIMAL(38,0)) END) OVER w AS DOUBLE) AS sy,
        CAST(SUM(CASE WHEN y IS NOT NULL
                 THEN CAST(x * x AS DECIMAL(38,0)) END) OVER w AS DOUBLE)
          AS sxx,
        CAST(SUM(CASE WHEN y IS NOT NULL
                 THEN CAST(y * y AS DECIMAL(38,0)) END) OVER w AS DOUBLE)
          AS syy,
        CAST(SUM(CASE WHEN y IS NOT NULL
                 THEN CAST(x * y AS DECIMAL(38,0)) END) OVER w AS DOUBLE)
          AS sxy
      FROM l
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, ts_ms, event_id,
           CASE WHEN n >= 20
                 AND (CAST(n AS DOUBLE) * sxx - sx * sx) > 0
                 AND (CAST(n AS DOUBLE) * syy - sy * sy) > 0
                THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
                     / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                            * (CAST(n AS DOUBLE) * syy - sy * sy))
           END AS autocorr,
           n AS n_pairs
    FROM m
    """,
)
def ts_rolling_autocorr(spark, sf_dir):
    """Rolling lag-1 autocorrelation over a trailing 20-row frame per
    series — integer-snapped moment sums so DuckDB's segment-tree frame
    reassociation can't drift a bit. One shuffle; lag and the five frame
    sums share one sort. See operators/timeseries.rolling_autocorr."""
    ev = table(spark, sf_dir, "events")
    return rolling_autocorr(
        ev, "user_id", "ts_ms", "value", "event_id", window_rows=20
    )


@query(
    "ts_seasonal_hod",
    f"""
    WITH e AS (
      SELECT event_type, ((({MS} % {DAY}) + {DAY}) % {DAY}) // {HOUR} AS hod, value FROM events
    ),
    s AS (
      SELECT event_type, hod,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value)
               AS seasonal_mean,
             COUNT(*) AS n
      FROM e GROUP BY event_type, hod
    ),
    t AS (
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value)
               AS type_mean
      FROM e GROUP BY event_type
    )
    SELECT e.event_type, e.hod, s.n,
           s.seasonal_mean,
           s.seasonal_mean - t.type_mean AS amplitude,
           MAX(ABS(e.value - s.seasonal_mean)) AS max_abs_resid
    FROM e
    JOIN s ON s.event_type = e.event_type AND s.hod = e.hod
    JOIN t ON t.event_type = e.event_type
    GROUP BY e.event_type, e.hod, s.n, s.seasonal_mean, t.type_mean
    """,
)
def ts_seasonal_hod(spark, sf_dir):
    """Hour-of-day seasonal decomposition per event type: the seasonal
    component (per-(type, hour) mean), its amplitude vs the type-level
    mean, and the worst residual once the seasonal component is removed
    — the first stage of every seasonal-anomaly pipeline (subtract the
    profile, then threshold residuals).

    Plan: two tiny grouped-mean aggregations (≤ 5×24 rows) broadcast
    back onto the fact scan, then one final hash aggregation — the fact
    table is scanned twice but never shuffled on a fat key; at 100 TB
    the broadcasts are what keep this from being three wide exchanges.
    Exactness: means are decimal-stable; residual |v − seasonal| is one
    IEEE subtract of identical doubles, and MAX is order-free."""
    ev = table(spark, sf_dir, "events")
    # floor (not div): Spark `div` truncates toward zero while the oracle's
    # `//` floors — they diverge on pre-epoch (negative) timestamps
    hod = F.floor(F.pmod(F.col("ts_ms"), F.lit(DAY)) / F.lit(HOUR)).cast("long").alias("hod")
    e = ev.select("event_type", hod, "value")
    dmean = (
        lambda: (
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
            / F.count("value")
        )
    )
    s = e.groupBy("event_type", "hod").agg(
        dmean().alias("seasonal_mean"), F.count(F.lit(1)).alias("n")
    )
    t = e.groupBy("event_type").agg(dmean().alias("type_mean"))
    return (
        e.join(F.broadcast(s), ["event_type", "hod"])
        .join(F.broadcast(t), "event_type")
        .groupBy("event_type", "hod", "n", "seasonal_mean", "type_mean")
        .agg(
            F.max(F.abs(F.col("value") - F.col("seasonal_mean")))
            .alias("max_abs_resid")
        )
        .select(
            "event_type", "hod", "n", "seasonal_mean",
            (F.col("seasonal_mean") - F.col("type_mean")).alias("amplitude"),
            "max_abs_resid",
        )
    )


_COV_W = 30 * 60 * 1000  # each event opens a 30-min activity window


@query(
    "ts_interval_coverage",
    f"""
    WITH iv AS (
      SELECT user_id, {MS} AS s, {MS} + {_COV_W} AS e FROM events
    ),
    fl AS (
      SELECT user_id, s, e,
             CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) IS NULL
                    OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS nw
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             SUM(nw) OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM fl
    ),
    m AS (
      SELECT user_id, island, MIN(s) AS ms, MAX(e) AS me
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           COUNT(*) AS n_islands,
           SUM(me - ms) AS covered_ms,
           MAX(me - ms) AS longest_ms
    FROM m GROUP BY user_id
    """,
)
def ts_interval_coverage(spark, sf_dir):
    """Union-of-intervals activity coverage per user (gaps-and-islands):
    every event opens a 30-minute window; overlapping windows merge into
    islands; output counts islands, total covered time, longest streak.
    Two stacked windows sharing one sort + two hash aggs, one shuffle.
    See operators/timeseries.interval_coverage."""
    ev = table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts_ms").alias("s"),
        (F.col("ts_ms") + F.lit(_COV_W)).alias("e"),
    )
    return interval_coverage(iv, "user_id", "s", "e")


from uts_spark.operators.timeseries import lttb_downsample  # noqa: E402

_LTTB_W = 6 * HOUR


@query(
    "ts_lttb_downsample",
    f"""
    WITH p AS (
      SELECT user_id AS k, {MS} AS t, value AS v, event_id AS o,
             {FDIV(MS, _LTTB_W)} AS b
      FROM events
    ),
    cent AS (
      SELECT k, b,
             CAST(SUM(CAST(t AS DECIMAL(38,6))) AS DOUBLE) / COUNT(t) AS cx,
             CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) / COUNT(v) AS cy
      FROM p GROUP BY k, b
    ),
    anch AS (
      SELECT k, b,
             lag(cx)  OVER w AS ax, lag(cy)  OVER w AS ay,
             lead(cx) OVER w AS nx, lead(cy) OVER w AS ny
      FROM cent WINDOW w AS (PARTITION BY k ORDER BY b)
    ),
    scored AS (
      SELECT p.k, p.t, p.v, p.o, p.b,
             abs((ax - nx) * (p.v - ay) - (ax - p.t) * (ny - ay)) AS area
      FROM p JOIN anch ON anch.k = p.k AND anch.b = p.b
      WHERE ax IS NOT NULL AND nx IS NOT NULL
    ),
    picked AS (
      SELECT k, t, v, FALSE AS is_endpoint,
             row_number() OVER (PARTITION BY k, b
                                ORDER BY area DESC, o) AS rn
      FROM scored
    ),
    ends AS (
      SELECT k, t, v, TRUE AS is_endpoint FROM (
        SELECT k, t, v,
               row_number() OVER (PARTITION BY k ORDER BY t, o) AS rf,
               row_number() OVER (PARTITION BY k ORDER BY t DESC, o DESC)
                 AS rl
        FROM p
      ) WHERE rf = 1 OR rl = 1
    )
    SELECT k AS user_id, t AS ts_ms, v AS value, is_endpoint
    FROM picked WHERE rn = 1
    UNION ALL
    SELECT k, t, v, is_endpoint FROM ends
    """,
)
def ts_lttb_downsample(spark, sf_dir):
    """LTTB perceptual downsampling per user series, 6-hour buckets:
    parallel bucket-anchor variant (centroid anchors instead of the
    sequential selected-point chain), endpoints always kept. One grouped
    centroid pass + tiny broadcast anchors + per-bucket argmax. See
    operators/timeseries.lttb_downsample."""
    ev = table(spark, sf_dir, "events")
    return lttb_downsample(
        ev, "user_id", "ts_ms", "value", "event_id", bucket_ms=_LTTB_W
    )


_M4_W = 6 * HOUR  # pixel-bucket width


@query(
    "ts_m4_downsample",
    f"""
    WITH p AS (
      SELECT user_id AS k, {MS} AS t, value AS v, event_id,
             ({FDIV(MS, _M4_W)}) * {_M4_W} AS bucket
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY k, bucket
                                ORDER BY t, event_id) AS rf,
             ROW_NUMBER() OVER (PARTITION BY k, bucket
                                ORDER BY t DESC, event_id DESC) AS rl
      FROM p
    )
    SELECT k, bucket,
           MIN(v)                            AS v_min,
           MAX(v)                            AS v_max,
           MIN(CASE WHEN rf = 1 THEN v END)  AS v_first,
           MIN(CASE WHEN rl = 1 THEN v END)  AS v_last,
           COUNT(*)                          AS n
    FROM r GROUP BY k, bucket
    """,
)
def ts_m4_downsample(spark, sf_dir):
    """M4 downsampling (Jugel et al., VLDB'14): per pixel-bucket keep
    min, max, first, and last — the four points that make a line chart
    of the bucket pixel-identical to the full-resolution rendering,
    unlike averaging which flattens spikes. The visualization-lossless
    companion to the perceptual LTTB operator (ts_lttb_downsample).

    Scale: a single HASH aggregation on (series, bucket) — min/max are
    plain partial aggs and first/last are min_by/max_by on a PACKED long
    ordering key (a struct key would demote the whole thing to
    SortAggregate; see operators/timeseries.ohlc for the measurement and
    the id-space envelope). 100 TB of points reduce map-side to 4 values
    per series-bucket with no window sort and no second pass."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # shared guarded builder: pmod offset + enforced id-space envelope
    ordk = packed_order_key("ts_ms", "event_id", _M4_W)
    return (
        ev.groupBy(
            F.col("user_id").alias("k"),
            (F.floor(F.col("ts_ms") / F.lit(_M4_W)).cast("long") * _M4_W).alias("bucket"),
        )
        .agg(
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.min_by("value", ordk).alias("v_first"),
            F.max_by("value", ordk).alias("v_last"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "ts_locf_fill",
    f"""
    WITH e AS (
      SELECT user_id, {MS} AS t, value FROM events WHERE event_type = 'view'
    ),
    span AS (SELECT user_id, min(t) AS t0, max(t) AS t1 FROM e GROUP BY user_id),
    grid AS (
      SELECT user_id,
             unnest(generate_series(
               CAST(ceil(t0 / {float(HOUR)!r}) AS BIGINT) * {HOUR},
               CAST(floor(t1 / {float(HOUR)!r}) AS BIGINT) * {HOUR},
               {HOUR})) AS t
      FROM span
    ),
    u AS (
      SELECT user_id, t, value, 1 AS is_obs FROM e
      UNION ALL
      SELECT user_id, t, NULL, 0 FROM grid
    ),
    f AS (
      SELECT user_id, t, is_obs,
             LAST_VALUE(value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t, is_obs
               ROWS UNBOUNDED PRECEDING) AS filled
      FROM u
    )
    SELECT user_id, t, filled AS value
    FROM f WHERE is_obs = 0
    """,
)
def ts_locf_fill(spark, sf_dir):
    """LOCF (last observation carried forward) onto an hourly grid: the
    step-function gap-fill for state-like series (linear interpolation
    — ts_interpolate_1h — is the trend-like counterpart). Grid points
    union with observations; one IGNORE-NULLS running last per series
    carries the preceding observation onto every grid instant.
    Observations sort before co-timestamped grid rows so a grid point
    AT an observation's own time takes that observation.

    Scale: one shuffle on the series key; the fill is a single running
    window (no self-join, no per-gap explode). Grid rows are O(span/
    step) per series — generated, never materialized driver-side."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select("user_id", F.col("ts_ms").alias("t"), "value")
    )
    span = ev.groupBy("user_id").agg(
        F.min("t").alias("t0"), F.max("t").alias("t1")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence(
                (F.ceil(F.col("t0") / HOUR) * HOUR).cast("long"),
                (F.floor(F.col("t1") / HOUR) * HOUR).cast("long"),
                F.lit(HOUR).cast("long"),
            )
        ).alias("t"),
    )
    from pyspark.sql.window import Window

    u = ev.withColumn("is_obs", F.lit(1)).unionByName(
        grid.select(
            "user_id", "t", F.lit(None).cast("double").alias("value"),
            F.lit(0).alias("is_obs"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_obs")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    f = u.withColumn("filled", F.last("value", ignorenulls=True).over(w))
    return f.filter(F.col("is_obs") == 0).select(
        "user_id", "t", F.col("filled").alias("value")
    )


@query(
    "ts_seasonal_residual_outliers",
    f"""
    WITH e AS (
      SELECT event_id, event_type, ((({MS} % {DAY}) + {DAY}) % {DAY}) // {HOUR} AS hod, value
      FROM events WHERE value IS NOT NULL
    ),
    s AS (
      SELECT event_type, hod,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value)
               AS mu,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS s2
      FROM e GROUP BY event_type, hod
    ),
    sd AS (
      SELECT event_type, hod, mu,
             sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sigma
      FROM s WHERE n >= 2
    )
    SELECT e.event_id, e.event_type, e.hod, e.value, sd.mu, sd.sigma,
           abs(e.value - sd.mu) > 3.0 * sd.sigma AS is_outlier
    FROM e JOIN sd ON sd.event_type = e.event_type AND sd.hod = e.hod
    """,
)
def ts_seasonal_residual_outliers(spark, sf_dir):
    """Seasonal-adjusted anomaly detection: the hour-of-day profile
    (per (type, hour) mean and stddev from decimal-exact moments) is
    broadcast back onto the stream and every event is flagged when its
    residual against ITS OWN hour's profile exceeds 3 sigma — the
    composition of ts_seasonal_hod (profile) with the z-score detector
    that a raw global threshold can't replicate (a value normal at 3 pm
    is anomalous at 3 am).

    Scale: one tiny (<= 5x24-row) profile aggregation broadcast onto
    the fact scan; the fact table is never shuffled at all."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.floor(F.pmod(F.col("ts_ms"), F.lit(DAY)) / F.lit(HOUR)).cast("long").alias("hod"),
            "value",
        )
    )
    v = F.col("value")
    prof = (
        ev.groupBy("event_type", "hod")
        .agg(
            F.count("value").alias("n"),
            F.sum(v.cast("decimal(38,6)")).cast("double").alias("s1"),
            F.sum((v * v).cast("decimal(38,6)")).cast("double").alias("s2"),
        )
        .filter(F.col("n") >= 2)
        .select(
            "event_type",
            "hod",
            (F.col("s1") / F.col("n")).alias("mu"),
            F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                / (F.col("n") - 1)
            ).alias("sigma"),
        )
    )
    return ev.join(F.broadcast(prof), ["event_type", "hod"]).select(
        "event_id",
        "event_type",
        "hod",
        "value",
        "mu",
        "sigma",
        (F.abs(F.col("value") - F.col("mu")) > 3.0 * F.col("sigma")).alias(
            "is_outlier"
        ),
    )


from uts_spark.operators.timeseries import duck_holt, holt_smoothing  # noqa: E402

_HOLT_A, _HOLT_G = 0.5, 0.25  # dyadic: exact binary literals both engines


@query(
    "ts_holt_smoothing",
    duck_holt(
        f"SELECT user_id, {MS} AS ms, value, event_id FROM events",
        "user_id",
        "ms",
        "value",
        _HOLT_A,
        _HOLT_G,
        "event_id",
        out_key="user_id",
    ),
)
def ts_holt_smoothing(spark, sf_dir):
    """Holt double-exponential smoothing (level + trend) per user
    series — the forecasting-grade smoother EWMA can't be on drifting
    data. Dyadic alpha/gamma (0.5, 0.25) are exact binary literals, the
    multiply-add order is pinned, and the oracle replays the recurrence
    as a recursive CTE — an inherently sequential algorithm, still
    bit-exact across engines. One shuffle on the series key;
    applyInPandas folds each series in a single Arrow batch
    (operators/timeseries.holt_smoothing)."""
    ev = table(spark, sf_dir, "events")
    return holt_smoothing(
        ev, "user_id", "ts_ms", "value", _HOLT_A, _HOLT_G, "event_id"
    )


from uts_spark.operators.timeseries import (  # noqa: E402
    capped_sessions,
    duck_capped_sessions,
)

_SESS_GAP = 30 * 60 * 1000   # 30-minute inactivity gap
_SESS_CAP = 4 * HOUR         # 4-hour max session duration


@query(
    "ts_capped_sessions",
    duck_capped_sessions(
        f"SELECT user_id, {MS} AS ms, event_id FROM events",
        "user_id",
        "ms",
        _SESS_GAP,
        _SESS_CAP,
        "event_id",
        out_key="user_id",
    ),
)
def ts_capped_sessions(spark, sf_dir):
    """Capped-duration sessionization: 30-minute inactivity gap AND a
    4-hour hard cap — the split native session_window cannot express
    (whether an event opens a session depends on every earlier split,
    a data-dependent recursion). One shuffle on user_id +
    applyInPandas fold, recursive-CTE oracle
    (operators/timeseries.capped_sessions); integer epoch-ms
    arithmetic, hash-exact."""
    ev = table(spark, sf_dir, "events")
    return capped_sessions(
        ev, "user_id", "ts_ms", _SESS_GAP, _SESS_CAP, "event_id"
    )


from uts_spark.operators.timeseries import (  # noqa: E402
    duck_holt_winters,
    holt_winters,
)

_HW_M = 24  # hour-of-day season


def _duck_hw() -> str:
    series = f"""
      WITH b AS (SELECT {FDIV(f"MIN({MS})", HOUR)} AS h0, {FDIV(f"MAX({MS})", HOUR)} AS h1
                 FROM events),
      spine AS (
        SELECT t.event_type, unnest(generate_series(b.h0, b.h1, 1)) AS h
        FROM b, (SELECT DISTINCT event_type FROM events) t
      ),
      cnt AS (
        SELECT event_type, {FDIV(MS, HOUR)} AS h, COUNT(*) AS n
        FROM events GROUP BY event_type, {FDIV(MS, HOUR)}
      )
      SELECT spine.event_type, spine.h * {HOUR} AS hr_ms,
             CAST(COALESCE(cnt.n, 0) AS DOUBLE) AS y
      FROM spine LEFT JOIN cnt
        ON cnt.event_type = spine.event_type AND cnt.h = spine.h
    """
    inner = duck_holt_winters(
        series, "event_type", "hr_ms", "y", _HW_M, 0.5, 0.25, 0.25,
        out_key="event_type",
    )
    return (
        "SELECT event_type, step AS hr_ms, value, level, trend, seasonal "
        f"FROM ({inner})"
    )


@query("ts_holt_winters_hourly", _duck_hw())
def ts_holt_winters_hourly(spark, sf_dir):
    """Holt-Winters triple smoothing over the regularized hourly event
    count per type (zero-filled spine makes the grid contiguous — the
    precondition for the s_{t−m} seasonal index), season = 24 hours.
    Level, trend, and the hour-of-day seasonal component, bit-exact
    against a recursive-CTE oracle whose state carries the 24-slot
    seasonal ring as a shifting list — the strongest instance of the
    'inherently sequential yet hash-exact' family (EWMA → Holt →
    Holt-Winters). See operators/timeseries.holt_winters."""
    ev = table(spark, sf_dir, "events")
    h = F.floor(F.col("ts_ms") / F.lit(HOUR)).cast("long")
    cnt = ev.groupBy("event_type", h.alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    bounds = ev.agg(
        F.floor(F.min("ts_ms") / F.lit(HOUR)).cast("long").alias("h0"),
        F.floor(F.max("ts_ms") / F.lit(HOUR)).cast("long").alias("h1"),
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence(F.col("h0"), F.col("h1"), F.lit(1))).alias("h"),
    )
    series = spine.join(cnt, ["event_type", "h"], "left").select(
        "event_type",
        (F.col("h") * HOUR).alias("hr_ms"),
        F.coalesce(F.col("n"), F.lit(0)).cast("double").alias("y"),
    )
    return holt_winters(
        series, "event_type", "hr_ms", "y", _HW_M, 0.5, 0.25, 0.25
    ).withColumnRenamed("step", "hr_ms")


from uts_spark.operators.timeseries import (  # noqa: E402
    clamped_running_balance,
    duck_clamped_balance,
)


@query(
    "ts_clamped_balance",
    duck_clamped_balance(
        f"SELECT user_id, {MS} AS ms, value - 55.0 AS d, event_id FROM events "
        "WHERE value IS NOT NULL",
        "user_id",
        "ms",
        "d",
        "event_id",
        out_key="user_id",
    ),
)
def ts_clamped_balance(spark, sf_dir):
    """Floor-clamped running balance per user (deltas = value − 55, so
    the stream drains and refills around the clamp): balance can never
    go below zero, and a window cumsum CANNOT express that — every
    clamp absorbs deficit that changes all later balances. One
    applyInPandas fold per key, recursive-CTE oracle with identical
    add-then-clamp order (operators/timeseries.clamped_running_balance)
    — the inventory/credit/battery member of the sequential-exact
    family."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id", "ts_ms", (F.col("value") - 55.0).alias("d"), "event_id"
        )
    )
    return clamped_running_balance(ev, "user_id", "ts_ms", "d", "event_id")


@query(
    "ts_gorilla_compression_estimate",
    f"""
    WITH e AS (
      SELECT user_id, {MS} AS t, event_id FROM events
    ),
    d1 AS (
      SELECT user_id,
             t - lag(t) OVER w AS dt,
             ROW_NUMBER() OVER w AS rn
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    d2 AS (
      SELECT user_id,
             dt - lag(dt) OVER (PARTITION BY user_id ORDER BY rn) AS dod
      FROM d1 WHERE dt IS NOT NULL
    ),
    bits AS (
      SELECT user_id,
             CASE WHEN dod = 0 THEN 1
                  WHEN dod BETWEEN -63 AND 64 THEN 9
                  WHEN dod BETWEEN -255 AND 256 THEN 12
                  WHEN dod BETWEEN -2047 AND 2048 THEN 16
                  ELSE 36 END AS nbits
      FROM d2 WHERE dod IS NOT NULL
    )
    SELECT user_id, COUNT(*) AS n_points,
           SUM(nbits) AS total_bits,
           CAST(SUM(nbits) AS DOUBLE) / COUNT(*) AS bits_per_point,
           64.0 * COUNT(*) / SUM(nbits) AS compression_ratio
    FROM bits GROUP BY user_id
    """,
)
def ts_gorilla_compression_estimate(spark, sf_dir):
    """Gorilla-style (Facebook TSDB, VLDB'15) timestamp-compression
    estimate per series: delta-of-delta bucketed into the paper's
    variable-width classes (1 bit for perfectly regular spacing, then
    9/12/16/36) — the storage-planning number that tells you whether a
    series is cheap (regular cadence) or expensive (jittery) BEFORE
    building the codec. Integer buckets and counts → hash-exact.

    Scale: two stacked lag windows on one (series, time) sort + a
    per-series rollup — one shuffle total."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    d1 = ev.select(
        "user_id",
        (F.col("ts_ms") - F.lag("ts_ms").over(w)).alias("dt"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("dt").isNotNull())
    w2 = Window.partitionBy("user_id").orderBy("rn")
    d2 = d1.select(
        "user_id", (F.col("dt") - F.lag("dt").over(w2)).alias("dod")
    ).filter(F.col("dod").isNotNull())
    nbits = (
        F.when(F.col("dod") == 0, 1)
        .when(F.col("dod").between(-63, 64), 9)
        .when(F.col("dod").between(-255, 256), 12)
        .when(F.col("dod").between(-2047, 2048), 16)
        .otherwise(36)
    )
    return (
        d2.select("user_id", nbits.alias("nbits"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("nbits").alias("total_bits"),
            (F.sum("nbits").cast("double") / F.count(F.lit(1))).alias(
                "bits_per_point"
            ),
            (64.0 * F.count(F.lit(1)) / F.sum("nbits")).alias(
                "compression_ratio"
            ),
        )
    )


@query(
    "events_run_lengths",
    f"""
    WITH e AS (
      SELECT user_id, event_type, {MS} AS t, event_id FROM events
    ),
    flagged AS (
      SELECT user_id, event_type, t, event_id,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR event_type <> lag(event_type) OVER w
                  THEN 1 ELSE 0 END AS new_run
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    runs AS (
      SELECT user_id, event_type,
             SUM(new_run) OVER (PARTITION BY user_id ORDER BY t, event_id
                                ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged
    ),
    sized AS (
      SELECT user_id, run_id, MIN(event_type) AS run_type,
             COUNT(*) AS run_len
      FROM runs GROUP BY user_id, run_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY run_len DESC, run_id) AS rnk
      FROM sized
    )
    SELECT r.user_id,
           CAST((SELECT COUNT(*) FROM sized s
                 WHERE s.user_id = r.user_id) AS BIGINT) AS n_runs,
           r.run_type AS longest_run_type,
           CAST(r.run_len AS BIGINT) AS longest_run_len
    FROM ranked r WHERE r.rnk = 1
    """,
)
def events_run_lengths(spark, sf_dir):
    """Run-length profile of each user's event stream: consecutive
    same-type islands (gaps-and-islands on the TYPE column), reporting
    the run count and the longest streak with its type — the
    behavioral-monotony signal (rage clicks, error storms, crawler
    loops) that transition probabilities alone smear out. Tie-break on
    earliest run keeps the argmax deterministic.

    Scale: the flag and the run-id cumsum share one (user, time) sort;
    two small hash aggregations finish per run then per user."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    flagged = ev.select(
        "user_id",
        "event_type",
        "ts_ms",
        "event_id",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.col("event_type") != F.lag("event_type").over(w)),
            1,
        ).otherwise(0).alias("new_run"),
    )
    runs = flagged.select(
        "user_id",
        "event_type",
        F.sum("new_run")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("run_id"),
    )
    sized = runs.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("run_type"),
        F.count(F.lit(1)).alias("run_len"),
    )
    per_user = sized.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_runs"))
    wr = Window.partitionBy("user_id").orderBy(F.desc("run_len"), F.asc("run_id"))
    best = (
        sized.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") == 1)
        .select(
            "user_id",
            F.col("run_type").alias("longest_run_type"),
            F.col("run_len").cast("long").alias("longest_run_len"),
        )
    )
    return per_user.join(best, "user_id").select(
        "user_id", "n_runs", "longest_run_type", "longest_run_len"
    )


# ===========================================================================
# Multi-lag autocorrelation function (ACF) over hourly series
# ===========================================================================

_ACF_LAGS = (1, 2, 3)


@query(
    "ts_acf_pack",
    f"""
    WITH hr AS (
      SELECT event_type, {FDIV(MS, HOUR)} AS h,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2) * 100 AS BIGINT)
               AS x
      FROM events GROUP BY event_type, {FDIV(MS, HOUR)}
    ),
    lags(lag) AS (SELECT UNNEST([{', '.join(map(str, _ACF_LAGS))}])),
    p AS (
      SELECT a.event_type, l.lag, a.x AS x, b.x AS y
      FROM hr a
      JOIN lags l ON TRUE
      JOIN hr b ON b.event_type = a.event_type AND b.h = a.h + l.lag
    ),
    m AS (
      SELECT event_type, lag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy
      FROM p GROUP BY event_type, lag
    )
    SELECT event_type, CAST(lag AS BIGINT) AS lag, n AS n_pairs,
           CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) > 0
                 AND (CAST(n AS DOUBLE) * syy - sy * sy) > 0
                THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
                     / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                            * (CAST(n AS DOUBLE) * syy - sy * sy))
           END AS acf
    FROM m
    """,
)
def ts_acf_pack(spark, sf_dir):
    """Autocorrelation function at lags 1-3 of each event type's HOURLY
    total — the seasonality probe run before choosing smoothing/forecast
    models (high acf@24 would mean daily cycles; here lags 1-3 of the
    hourly totals). The hourly sums are DECIMAL-exact then centi-snapped
    to integers, so every moment sum is an exact BIGINT on both engines
    and the Pearson assembly is identical-order double math — the same
    discipline as ts_rolling_autocorr. Lag alignment is a self-join on
    (event_type, h + lag): gap hours simply pair with nothing, exactly
    like the textbook definition over the observed index set.

    Scale: the hourly rollup is the only data-sized aggregation; the ACF
    itself runs on the tiny (type, hour) table — one broadcast-joinable
    self-join per lag batch, no windows over the raw events."""
    ev = table(spark, sf_dir, "events")
    hr = (
        ev.select(
            "event_type",
            # ADVICE r3: floor division (the ohlc bucket idiom), not `div` —
            # `div` truncates, DuckDB `//` floors; negative ts would diverge
            F.floor(F.col("ts_ms") / F.lit(HOUR)).cast("long").alias("h"),
            F.col("value"),
        )
        .groupBy("event_type", "h")
        .agg(
            (F.round(F.sum(F.col("value").cast("decimal(38,6)")), 2) * 100)
            .cast("long")
            .alias("x")
        )
    )
    lags = spark.createDataFrame([(l,) for l in _ACF_LAGS], "lag int")
    a = hr.select("event_type", "h", F.col("x"))
    b = hr.select(
        F.col("event_type").alias("et_b"), F.col("h").alias("h_b"),
        F.col("x").alias("y"),
    )
    p = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("et_b") == F.col("event_type"))
            & (F.col("h_b") == F.col("h") + F.col("lag")),
        )
    )
    nd = F.count(F.lit(1)).cast("long")
    m = p.groupBy("event_type", "lag").agg(
        nd.alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    nD = F.col("n").cast("double")
    vx = nD * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = nD * F.col("syy") - F.col("sy") * F.col("sy")
    cov = nD * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.select(
        "event_type",
        F.col("lag").cast("long").alias("lag"),
        F.col("n").alias("n_pairs"),
        F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)).alias("acf"),
    )


# ===========================================================================
# Maximum drawdown per series
# ===========================================================================

@query(
    "ts_max_drawdown",
    f"""
    WITH e AS (
      SELECT user_id, {MS} AS t, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS x
      FROM events
    ),
    r AS (
      SELECT user_id, t, event_id, x,
             MAX(x) OVER (PARTITION BY user_id ORDER BY t, event_id
                          ROWS UNBOUNDED PRECEDING) AS peak
      FROM e
    ),
    d AS (
      SELECT user_id, t, x, peak,
             1 - CAST(x AS DOUBLE) / peak AS dd,
             ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY 1 - CAST(x AS DOUBLE) / peak DESC, t, event_id
             ) AS rn
      FROM r WHERE peak > 0
    )
    SELECT user_id, dd AS max_drawdown,
           t AS trough_ms, CAST(peak AS BIGINT) AS peak_x
    FROM d WHERE rn = 1
    """,
)
def ts_max_drawdown(spark, sf_dir):
    """Maximum drawdown per series: the largest peak-to-trough decline
    ``1 - v / running_max(v)`` in time order — the risk metric every
    monitoring/finance stack computes next to OHLC/TWAP. Values are
    centi-snapped to integers, so the running max is exact and the
    ratio is one identical double division on both engines; the trough
    row wins a (dd DESC, time, id) deterministic tie-break. Rows whose
    running peak is <= 0 are excluded on BOTH engines (ADVICE r3): a
    zero peak divides to NULL in Spark but inf in DuckDB, and a
    negative peak makes 'drawdown' meaningless — the guard makes the
    query data-independent instead of incidentally green on all-positive
    testdata (a series with no positive peak yields no row).

    Scale: one exchange on the series key carries the running-max
    window AND the argmax ranking — prefix max is the O(1)-per-row
    accumulator path (UNBOUNDED frame, see SCALE.md), never a sliding
    re-aggregation."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    x = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    r = ev.select(
        "user_id", F.col("ts_ms").alias("t"), "event_id", x.alias("x")
    ).withColumn(
        "peak",
        F.max("x").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).filter(F.col("peak") > 0)
    dd = F.lit(1) - F.col("x").cast("double") / F.col("peak")
    ranked = r.withColumn("dd", dd).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(
                F.desc("dd"), F.asc("t"), F.asc("event_id")
            )
        ),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "user_id",
        F.col("dd").alias("max_drawdown"),
        F.col("t").alias("trough_ms"),
        F.col("peak").alias("peak_x"),
    )


# ===========================================================================
# SMA crossover signals (golden/death crosses)
# ===========================================================================

@query(
    "ts_sma_crossover",
    f"""
    WITH e AS (
      SELECT user_id, {MS} AS t, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS x
      FROM events
    ),
    s AS (
      SELECT user_id, t, event_id,
             SUM(x) OVER (PARTITION BY user_id ORDER BY t, event_id
                          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS s5,
             SUM(x) OVER (PARTITION BY user_id ORDER BY t, event_id
                          ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS s20,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY t, event_id) AS rn
      FROM e
    ),
    g AS (
      SELECT user_id, t,
             CASE WHEN 4 * s5 > s20 THEN 1 ELSE 0 END AS above,
             lag(CASE WHEN 4 * s5 > s20 THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY t, event_id) AS prev_above,
             4 * s5 - s20 AS margin
      FROM s WHERE rn >= 20
    )
    SELECT user_id, t AS cross_ms,
           CASE WHEN above = 1 THEN 'golden' ELSE 'death' END AS direction,
           CAST(margin AS BIGINT) AS margin
    FROM g WHERE prev_above IS NOT NULL AND above != prev_above
    """,
)
def ts_sma_crossover(spark, sf_dir):
    """Moving-average crossover signals per series: a GOLDEN cross when
    the 5-point SMA rises above the 20-point SMA, a DEATH cross when it
    falls back — the classic trend-change detector. The comparison is
    scaled to INTEGERS (fast > slow ⟺ 4·Σ₅ > Σ₂₀ on centi-snapped
    values), so there is no float anywhere: window sums are exact, the
    flip test is an integer compare, bit-identical on any engine.

    Scale: both trailing sums, the row counter, and the lag ride ONE
    exchange + one sort on the series key; the small constant frames
    (5/20 rows) are the legitimate sliding-window case (cf. the
    UNBOUNDED rule in SCALE.md — these are genuinely sliding)."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    x = F.round(F.col("value") * 100).cast("long")
    base = Window.partitionBy("user_id").orderBy("t", "event_id")
    s = ev.select(
        "user_id", F.col("ts_ms").alias("t"), "event_id", x.alias("x")
    ).select(
        "user_id", "t", "event_id",
        F.sum("x").over(base.rowsBetween(-4, 0)).alias("s5"),
        F.sum("x").over(base.rowsBetween(-19, 0)).alias("s20"),
        F.row_number().over(base).alias("rn"),
    )
    above = F.when(4 * F.col("s5") > F.col("s20"), 1).otherwise(0)
    g = (
        s.filter(F.col("rn") >= 20)
        .withColumn("above", above)
        .withColumn("prev_above", F.lag("above").over(base))
        .withColumn("margin", (4 * F.col("s5") - F.col("s20")).cast("long"))
    )
    return g.filter(
        F.col("prev_above").isNotNull() & (F.col("above") != F.col("prev_above"))
    ).select(
        "user_id",
        F.col("t").alias("cross_ms"),
        F.when(F.col("above") == 1, "golden").otherwise("death").alias("direction"),
        "margin",
    )
