"""μts core-surface queries (SURVEY §2.3-§2.5) over the events table."""

from __future__ import annotations

from pyspark.sql import functions as F

from uts_spark.operators.aggregates import Metric
from uts_spark.operators.derivative import derivative_rows
from uts_spark.plans.groupers import interval
from uts_spark.registry import (
    DAY,
    DSUM,
    HOUR,
    MS,
    NOW_MS,
    events_series,
    query,
)

# ===========================================================================
# μts core surface (SURVEY §2.3-§2.5) over the events table
# ===========================================================================

@query(
    "uts_global_agg",
    f"""
    SELECT
      COALESCE({DSUM('value')}/COUNT(value), 0.0)          AS mean_value,
      COALESCE({DSUM('value')}, 0.0)                        AS sum_value,
      GREATEST(COALESCE(MAX(value), 0.0), 0.0)              AS max_value,
      LEAST(COALESCE(MIN(value), 0.0), 0.0)                 AS min_value,
      COUNT(*)                                              AS n_all,
      COUNT(value)                                          AS n_value
    FROM events WHERE value > 100.0
    """,
)
def uts_global_agg(spark, sf_dir):
    """AnyGrouper global bin, full aggregate set with reference quirks:
    zero-default mean/sum, ZERO-CLAMPED max/min (uts.ts:589-601 fold from
    0 — min of all-positive data is 0, encoded in the oracle's LEAST)."""
    s = events_series(spark, sf_dir)
    st = {"stable": True}
    return s.query(
        {
            "mean_value": Metric("mean", "value", params=st),
            "sum_value": Metric("sum", "value", params=st),
            "max_value": Metric("max", "value"),
            "min_value": Metric("min", "value"),
            "n_all": Metric("count"),
            "n_value": Metric("count", "value"),
        },
        where={"value": {"is": ">", "than": 100.0}},
    )


@query(
    "uts_where_range",
    f"""
    SELECT event_id, {MS} AS ts_ms, value
    FROM events
    WHERE value > 50.0 AND value < 150.0 AND event_type = 'purchase'
    """,
)
def uts_where_range(spark, sf_dir):
    """Comparator conjunction (uts.ts:285-320): strict >/< range + string
    equality, AND-ed across columns. The predicate lands in the parquet
    scan (PushedFilters) — the reference's eager pre-filter (uts.ts:370)
    done declaratively."""
    s = events_series(spark, sf_dir)
    df = s.df.filter(
        # compile_where over the raw df: reuse the same atoms the facade uses
        (F.col("value") > 50.0)
        & (F.col("value") < 150.0)
        & (F.col("event_type") == "purchase")
    )
    return df.select("event_id", "ts_ms", "value")


@query(
    "uts_interval_mean_fill",
    f"""
    WITH pts AS (
      SELECT {MS} AS t, value FROM events
      WHERE {MS} > {NOW_MS - 31 * DAY} AND {MS} <= {NOW_MS}
    ),
    b AS (
      SELECT ({NOW_MS} - t)//{DAY} AS bin,
             {DSUM('value')}/COUNT(value) AS mean_value,
             COUNT(*) AS n
      FROM pts GROUP BY 1
    ),
    -- bin count = floor((now - bound)/w) + 1 (uts.ts:113-124): 32 bins,
    -- the oldest covering (now-32d, now-31d] — empty under the strict bound
    spine AS (SELECT CAST(range AS BIGINT) AS bin FROM range(0, 32))
    SELECT {NOW_MS} - (spine.bin + 1) * {DAY} AS start,
           CAST({DAY} AS BIGINT) AS width,
           COALESCE(mean_value, 0.0) AS mean_value,
           COALESCE(n, 0) AS n
    FROM spine LEFT JOIN b ON spine.bin = b.bin
    """,
)
def uts_interval_mean_fill(spark, sf_dir):
    """The readme's flagship shape (readme.md:31-39): mean per tumbling
    bin, now-anchored right-inclusive edges (uts.ts:138), zero-filled
    empty bins, newest-first. Spine size comes from the ``time >`` bound
    (uts.ts:113-119)."""
    s = events_series(spark, sf_dir)
    return s.query(
        {
            "mean_value": Metric("mean", "value", params={"stable": True}),
            "n": Metric("count"),
        },
        where={"ts_ms": {"is": ">", "than": NOW_MS - 31 * DAY}},
        group=interval(DAY, fill=True, now=NOW_MS),
    )


@query(
    "uts_interval_last_nofill",
    f"""
    WITH pts AS (
      SELECT {MS} AS t, event_id, value FROM events WHERE {MS} <= {NOW_MS}
    )
    SELECT {NOW_MS} - (({NOW_MS} - t)//{7 * DAY} + 1) * {7 * DAY} AS start,
           CAST({7 * DAY} AS BIGINT) AS width,
           arg_max(value, event_id) AS last_value,
           COUNT(*) AS n
    FROM pts GROUP BY 1
    """,
)
def uts_interval_last_nofill(spark, sf_dir):
    """last() = value of the last point in PUSH order (uts.ts:611-617),
    per 7-day bin, fill=false (empty bins dropped, uts.ts:141-143)."""
    s = events_series(spark, sf_dir)
    return s.query(
        {"last_value": Metric("last", "value"), "n": Metric("count")},
        group=interval(7 * DAY, fill=False, now=NOW_MS),
    )


@query(
    "uts_map_exploded",
    f"""
    WITH pts AS (
      SELECT {MS} AS t, event_id, value FROM events WHERE {MS} <= {NOW_MS}
    )
    SELECT {NOW_MS} - (({NOW_MS} - t)//{7 * DAY} + 1) * {7 * DAY} AS start,
           ROW_NUMBER() OVER (
             PARTITION BY ({NOW_MS} - t)//{7 * DAY} ORDER BY event_id
           ) - 1 AS pos,
           value
    FROM pts
    """,
)
def uts_map_exploded(spark, sf_dir):
    """map(col) (uts.ts:398-414): ordered, hole-preserving per-bin
    projection — exploded to (start, pos, value) rows so the driver's
    order-insensitive hash still proves the ORDER (pos is part of the
    row)."""
    s = events_series(spark, sf_dir)
    df = s.query(
        {"m": Metric("map", "value")},
        group=interval(7 * DAY, fill=False, now=NOW_MS),
    )
    return df.select(
        "start", F.posexplode("m").alias("pos", "value")
    ).select("start", F.col("pos").cast("long").alias("pos"), "value")


@query(
    "uts_derivative",
    f"""
    WITH pts AS (
      SELECT event_id AS o, {MS} AS t, value AS v
      FROM events WHERE event_type = 'purchase'
    ),
    d AS (
      SELECT t,
             v - lag(v) OVER w AS delta,
             first_value(t) OVER w AS tfirst,
             last_value(t) OVER (ORDER BY o ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND UNBOUNDED FOLLOWING) AS tlast
      FROM pts WINDOW w AS (ORDER BY o)
    ),
    contrib AS (
      SELECT LEAST(tfirst + ((t - tfirst + {6*HOUR} - 1)//{6*HOUR}) * {6*HOUR},
                   tlast) AS e,
             {DSUM('delta')} AS change
      FROM d WHERE delta IS NOT NULL GROUP BY 1
    ),
    bounds AS (SELECT arg_min(t, o) AS tfirst, arg_max(t, o) AS tlast FROM pts),
    spine AS (
      SELECT unnest(generate_series(tfirst + {6*HOUR}, tlast - 1, {6*HOUR})) AS e
      FROM bounds WHERE tfirst IS NOT NULL
      UNION
      SELECT tlast FROM bounds WHERE tlast IS NOT NULL
    )
    SELECT e AS time, COALESCE(change, 0.0) AS d_value
    FROM spine LEFT JOIN contrib USING (e)
    """,
)
def uts_derivative(spark, sf_dir):
    """derivative(col, 6h) (uts.ts:458-507) over the purchase stream:
    per-interval change with zero-change gap emissions and a final flush
    at the last point's time — the verified closed form (SURVEY §2.4 A9),
    expressed as lag + integer-ceil bucketing + sequence spine."""
    s = events_series(spark, sf_dir)
    df = s.df.filter(F.col("event_type") == "purchase")
    out = derivative_rows(
        df, "value", 6 * HOUR, time_col="ts_ms", order_col="ingest_id",
        stable=True,
    )
    return out.withColumnRenamed("value", "d_value")


@query(
    "uts_reduce_fold",
    f"""
    WITH pts AS (
      SELECT {MS} AS t, value FROM events WHERE {MS} <= {NOW_MS}
    )
    SELECT {NOW_MS} - (({NOW_MS} - t)//{7 * DAY} + 1) * {7 * DAY} AS start,
           CAST({7 * DAY} AS BIGINT) AS width,
           COUNT(*) FILTER (WHERE value > 100.0) AS n_above,
           MAX(ABS(value)) AS max_abs
    FROM pts GROUP BY 1
    """,
)
def uts_reduce_fold(spark, sf_dir):
    """reduce(fn, initial) (uts.ts:416-434) with arbitrary PYTHON folds —
    the reference's UDAF primitive (SURVEY §2.6). Two folds per 7-day bin:
    a threshold counter and a running max-abs, both FP-exact so the SQL
    oracle matches bit-for-bit. The ordered point array is built JVM-side;
    Python runs once per bin."""
    s = events_series(spark, sf_dir)
    return s.query(
        {
            "n_above": Metric(
                "reduce",
                fn=lambda acc, pt: acc + (1 if pt["value"] > 100.0 else 0),
                initial=0,
                params={"returns": "long"},
            ),
            "max_abs": Metric(
                "reduce",
                fn=lambda acc, pt: max(acc, abs(pt["value"])),
                initial=0.0,
                params={"returns": "double"},
            ),
        },
        group=interval(7 * DAY, fill=False, now=NOW_MS),
    )


@query(
    "uts_map_fn",
    f"""
    WITH pts AS (
      SELECT {MS} AS t, event_id, value FROM events WHERE {MS} <= {NOW_MS}
    )
    SELECT {NOW_MS} - (({NOW_MS} - t)//{7 * DAY} + 1) * {7 * DAY} AS start,
           ROW_NUMBER() OVER (
             PARTITION BY ({NOW_MS} - t)//{7 * DAY} ORDER BY event_id
           ) - 1 AS pos,
           value * 2.0 + 1.0 AS mapped
    FROM pts
    """,
)
def uts_map_fn(spark, sf_dir):
    """map(fn) (uts.ts:562-571): arbitrary per-point python projection
    collected in push order, exploded with position so the hash proves
    ordering."""
    s = events_series(spark, sf_dir)
    df = s.query(
        {"m": Metric("map", fn=lambda pt: pt["value"] * 2.0 + 1.0)},
        group=interval(7 * DAY, fill=False, now=NOW_MS),
    )
    return df.select("start", F.posexplode("m").alias("pos", "mapped")).select(
        "start", F.col("pos").cast("long").alias("pos"), "mapped"
    )


@query(
    "uts_remove_where",
    """
    SELECT event_id, value FROM events
    WHERE NOT COALESCE(value > 500.0, FALSE)
    """,
)
def uts_remove_where(spark, sf_dir):
    """remove(where) keeps NON-matching rows; missing-column (NULL
    predicate) rows are KEPT (uts.ts:322-335 + the never-match rule
    uts.ts:297) — hence the COALESCE(pred, FALSE) on both sides."""
    s = events_series(spark, sf_dir)
    s.remove({"value": {"is": ">", "than": 500.0}})
    return s.df.select("event_id", "value")


@query(
    "uts_retention",
    f"""
    SELECT COUNT(*) AS n, MIN({MS}) AS min_ts
    FROM events WHERE {MS} >= {NOW_MS - 7 * DAY}
    """,
)
def uts_retention(spark, sf_dir):
    """Retention ttl=7d as a read-time predicate (uts.ts:245-269: drop
    time < now - ttl). At 100 TB this predicate prunes date partitions
    instead of scanning."""
    s = events_series(spark, sf_dir).set_retention(7 * DAY)
    df = s.query({"n": Metric("count")}, now=NOW_MS)
    kept = s.df.filter(F.col("ts_ms") >= F.lit(NOW_MS - 7 * DAY))
    return df.crossJoin(kept.agg(F.min("ts_ms").alias("min_ts")))


@query(
    "uts_payload_mode_interval",
    f"""
    WITH e AS (
      SELECT {MS} AS t,
             MAP {{'v': value, 'u': CAST(user_id AS DOUBLE)}} AS payload
      FROM events
    ),
    f AS (SELECT t, payload['v'][1] AS v FROM e
          WHERE payload['v'][1] > 0.0),
    b AS (
      SELECT ({NOW_MS} - t) // {DAY} AS idx,
             CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) / COUNT(v)
               AS mean_v,
             COUNT(v) AS n
      FROM f WHERE t <= {NOW_MS} GROUP BY 1
    ),
    -- fill=true: bin count anchored at the FIRST point's time
    -- (no `time >` bound in the where clause; uts.ts:113-124)
    lim AS (
      SELECT ({NOW_MS} - MIN(t)) // {DAY} + 1 AS nbins FROM f
      WHERE t <= {NOW_MS}
    ),
    spine AS (
      SELECT CAST(range AS BIGINT) AS idx FROM range(0, 128)
      WHERE range < (SELECT nbins FROM lim)
    )
    SELECT {NOW_MS} - (idx + 1) * {DAY} AS start,
           CAST({DAY} AS BIGINT) AS width,
           COALESCE(mean_v, 0.0) AS mean_v,
           COALESCE(n, 0) AS n
    FROM spine LEFT JOIN b USING (idx)
    """,
)
def uts_payload_mode_interval(spark, sf_dir):
    """Schemaless MapType payload mode THROUGH the driver gate (until
    now only golden-tested): events re-encoded as MAP<STRING,DOUBLE>
    points, filtered on a missing map key (absent key ≡ NULL ≡ the
    reference's missing-column semantics, SURVEY §1.3), then the
    reference's now-anchored right-inclusive daily bins with the mean
    quirk (empty→0). Map access compiles to the same pushed-down scan +
    hash aggregate as typed columns — schemalessness costs a MapType
    lookup, not a plan shape."""
    from uts_spark.plans.tsdb import TSDB
    from uts_spark.sources.tables import load_events
    from uts_spark.session import configure_session

    configure_session(spark)
    ev = load_events(spark, sf_dir)
    pts = ev.select(
        F.col("ingest_id"),
        F.col("ts_ms").alias("time"),
        F.create_map(
            F.lit("v"), F.col("value"),
            F.lit("u"), F.col("user_id").cast("double"),
        ).alias("payload"),
    )
    db = TSDB(spark)
    s = db.series("pl", df=pts, time_col="time", order_col="ingest_id",
                  payload_col="payload")
    out = s.query(
        metrics={"mean_v": Metric("mean", "v", params={"stable": True}),
                 "n": Metric("count", "v")},
        where={"v": {"is": ">", "than": 0.0}},
        group=interval(DAY, fill=True, now=NOW_MS),
    )
    return out.select("start", "width", "mean_v", "n")


@query(
    "uts_interval_multimetric_fill",
    f"""
    WITH pts AS (
      SELECT {MS} AS t, event_id, value FROM events
      WHERE {MS} > {NOW_MS - 40 * DAY} AND {MS} <= {NOW_MS}
        AND value > 120.0
    ),
    b AS (
      SELECT ({NOW_MS} - t)//{2 * DAY} AS bin,
             {DSUM('value')}/COUNT(value) AS mean_value,
             {DSUM('value')} AS sum_value,
             GREATEST(COALESCE(MAX(value), 0.0), 0.0) AS max_value,
             LEAST(COALESCE(MIN(value), 0.0), 0.0) AS min_value,
             arg_max(value, event_id) AS last_value,
             COUNT(*) AS n
      FROM pts GROUP BY 1
    ),
    spine AS (SELECT CAST(range AS BIGINT) AS bin FROM range(0, 21))
    SELECT {NOW_MS} - (spine.bin + 1) * {2 * DAY} AS start,
           CAST({2 * DAY} AS BIGINT) AS width,
           COALESCE(mean_value, 0.0) AS mean_value,
           COALESCE(sum_value, 0.0) AS sum_value,
           COALESCE(max_value, 0.0) AS max_value,
           COALESCE(min_value, 0.0) AS min_value,
           last_value AS last_value,
           COALESCE(n, 0) AS n
    FROM spine LEFT JOIN b ON spine.bin = b.bin
    """,
)
def uts_interval_multimetric_fill(spark, sf_dir):
    """Every reference aggregate in ONE interval query (the Bin fan-out,
    uts.ts:38-47: one pass feeds all metric buffers): mean, sum,
    zero-clamped max/min, insertion-order last, count — over 2-day
    now-anchored bins with fill=true, so EMPTY bins must synthesize
    each aggregate's own initial (0 for the numerics, NULL for last;
    uts.ts verified quirks A1-A6). The selective value filter
    guarantees empty bins exist, exercising every initial at once —
    the single-scan multi-aggregate shape Spark's partial aggregation
    shares with the reference's Bin.push loop."""
    s = events_series(spark, sf_dir)
    return s.query(
        {
            "mean_value": Metric("mean", "value", params={"stable": True}),
            "sum_value": Metric("sum", "value", params={"stable": True}),
            "max_value": Metric("max", "value"),
            "min_value": Metric("min", "value"),
            "last_value": Metric("last", "value"),
            "n": Metric("count"),
        },
        where={
            "ts_ms": {"is": ">", "than": NOW_MS - 40 * DAY},
            "value": {"is": ">", "than": 120.0},
        },
        group=interval(2 * DAY, fill=True, now=NOW_MS),
    )
