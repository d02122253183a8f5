"""North-star analytics operators absent from the reference (SURVEY §2.7 ➕):
joins (broadcast / multi-way / as-of / range), sorts & top-k, set ops, SQL
window functions, rollup/cube, distinct & approximate aggregates — each as
an oracle-checked query over the driver's TPC-H-ish tables.

Plan-shape notes (the 100 TB story, verified via .explain):
- dimension joins (region/nation/customer/supplier) broadcast — no shuffle
  of the fact table except its own aggregations;
- top-k is TakeOrderedAndProject (per-partition k-heaps), never a full sort;
- as-of join is the union-window strategy: ONE shuffle on the key;
- range join buckets to an equi-join instead of a nested loop;
- running windows use decimal-stable sums so partial-aggregation order
  (and the oracle's segment-tree accumulation) cannot flip low bits.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from uts_spark.operators.aggregates import lane_sum
from uts_spark.operators.distributed_rank import ntile_from_rank, ranked_cumsum
from uts_spark.operators.joins import asof_join, binned_range_join
from uts_spark.operators.topk import percentile_disc, top_k, top_k_per_group
from uts_spark.registry import DAY, DSUM, HOUR, MS, demo, query, table

DEC = "decimal(38,6)"


def _dsum(col):
    return F.sum(col.cast(DEC)).cast("double")


# two-lane long-accumulated variant — bit-identical to _dsum (see
# operators/aggregates.lane_sum for the proof + overflow envelope);
# used for money/quantity-scale sums; _dsum stays for sums of squares
_lsum = lane_sum


# ===========================================================================
# Aggregation pipeline (TPC-H Q1 shape)
# ===========================================================================

@query(
    "tpch_q1_pricing",
    f"""
    SELECT l_returnflag, l_linestatus,
           {DSUM('l_quantity')}                                    AS sum_qty,
           {DSUM('l_extendedprice')}                               AS sum_base_price,
           {DSUM('l_extendedprice * (1 - l_discount)')}            AS sum_disc_price,
           {DSUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {DSUM('l_quantity')} / COUNT(l_quantity)                AS avg_qty,
           {DSUM('l_extendedprice')} / COUNT(l_extendedprice)      AS avg_price,
           {DSUM('l_discount')} / COUNT(l_discount)                AS avg_disc,
           COUNT(*)                                                AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing(spark, sf_dir):
    """Pricing summary: the canonical scan→filter→hash-aggregate pipeline.
    Filter and 7-column projection push into the parquet scan; one shuffle
    for 6 grouped keys; all arithmetic JVM-side in whole-stage codegen."""
    li = table(spark, sf_dir, "lineitem")
    # value expressions as SQL text: lane_sum's str path builds each
    # 30-op exact-sum tree in one py4j round trip (optimization r11)
    disc_price = "l_extendedprice * (1 - l_discount)"
    charge = f"{disc_price} * (1 + l_tax)"
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _lsum("l_quantity").alias("sum_qty"),
            _lsum("l_extendedprice").alias("sum_base_price"),
            _lsum(disc_price).alias("sum_disc_price"),
            _lsum(charge).alias("sum_charge"),
            (_lsum("l_quantity") / F.count("l_quantity")).alias("avg_qty"),
            (_lsum("l_extendedprice") / F.count("l_extendedprice")).alias("avg_price"),
            (_lsum("l_discount") / F.count("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ===========================================================================
# Joins
# ===========================================================================

@query(
    "tpch_q3_topk",
    f"""
    SELECT o.o_orderkey,
           epoch_ms(o.o_orderdate) AS o_orderdate_ms,
           {DSUM('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def tpch_q3_topk(spark, sf_dir):
    """Shipping-priority shape: selective dim filter broadcast into the
    fact join, grouped revenue, global top-10 via TakeOrderedAndProject
    (k-heap merge — no full sort). Deterministic tie-break on orderkey."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(_lsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    out = top_k(joined, [F.desc("revenue"), F.asc("o_orderkey")], 10)
    # o_orderdate arrives as TIMESTAMP_NTZ; cast→LTZ under the UTC session
    # before unix_millis (equal to DuckDB epoch_ms of the naive value)
    return out.select(
        "o_orderkey",
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_ms"),
        "revenue",
    )


@query(
    "tpch_q5_region_revenue",
    f"""
    SELECT n.n_name,
           {DSUM('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM region r JOIN nation n   ON n.n_regionkey = r.r_regionkey
                  JOIN customer c ON c.c_nationkey = n.n_nationkey
                  JOIN orders o   ON o.o_custkey = c.c_custkey
                  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                  JOIN supplier s ON s.s_suppkey = l.l_suppkey
                                 AND s.s_nationkey = n.n_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def tpch_q5_region_revenue(spark, sf_dir):
    """Local-supplier-volume shape: 6-table join where every dimension
    broadcasts; the only big shuffles are lineitem⋈orders and the final
    small aggregation. Join order left to Catalyst + AQE."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    joined = (
        o.join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(s), (s.s_suppkey == l.l_suppkey))
        .join(
            F.broadcast(n),
            (n.n_nationkey == c.c_nationkey) & (n.n_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
    )
    return joined.groupBy("n_name").agg(
        _lsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@query(
    "join_asof_last_error",
    f"""
    WITH u AS (
      SELECT user_id, {MS} AS ts_ms, event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
             CASE WHEN event_type = 'error' THEN value END AS err_v,
             CASE WHEN event_type = 'error' THEN 0 ELSE 1 END AS side
      FROM events WHERE event_type IN ('purchase', 'error')
    ),
    m AS (
      SELECT *, last_value(err_v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts_ms, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_error_value
      FROM u
    )
    SELECT event_id, user_id, ts_ms, last_error_value
    FROM m WHERE is_p = 1
    """,
)
def join_asof_last_error(spark, sf_dir):
    """As-of join: each purchase enriched with the latest at-or-before
    'error' value for the same user — union-window strategy, one shuffle
    on user_id, no UDF (operators/joins.asof_join)."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_ms"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts_ms", "value", "event_id"
    )
    out = asof_join(
        purchases,
        errors,
        on="user_id",
        left_time="ts_ms",
        right_time="ts_ms",
        right_payload=["value"],
        order_col="event_id",
    )
    return out.select(
        "event_id", "user_id", "ts_ms", F.col("value_right").alias("last_error_value")
    )


@query(
    "range_join_clicks_after_signup",
    f"""
    WITH s AS (
      SELECT event_id, user_id, {MS} AS t FROM events WHERE event_type = 'signup'
    ),
    c AS (
      SELECT user_id, {MS} AS t FROM events WHERE event_type = 'click'
    )
    SELECT s.event_id, COUNT(*) AS n_clicks
    FROM s JOIN c ON c.user_id = s.user_id
                 AND c.t >= s.t AND c.t <= s.t + {DAY}
    GROUP BY s.event_id
    """,
)
def range_join_clicks_after_signup(spark, sf_dir):
    """Range join: clicks within 24 h after each signup, same user.
    Bucketed to an equi-join on (user_id, time-bucket) — a hash join that
    scales, instead of the broadcast-nested-loop a raw theta join plans."""
    ev = table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", F.col("ts_ms").alias("s_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts_ms").alias("c_ts")
    )
    joined = binned_range_join(
        signups,
        clicks,
        left_lo=F.col("s_ts"),
        left_hi=F.col("s_ts") + F.lit(DAY).cast("long"),
        right_ts=F.col("c_ts"),
        bin_width=DAY,
        keys=["user_id"],
    )
    return joined.groupBy("event_id").agg(F.count(F.lit(1)).alias("n_clicks"))


# ===========================================================================
# Window functions
# ===========================================================================

@query(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_total
    FROM orders
    """,
)
def window_running_sum(spark, sf_dir):
    """Running total per customer — analytic window with a frame spec.
    Decimal accumulation: identical regardless of how either engine
    associates the additions."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_total"),
    )


@query(
    "window_top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rank
      FROM orders
    ) WHERE rank <= 3
    """,
)
def window_top3_orders_per_customer(spark, sf_dir):
    """Per-group top-k: rank window + early cutoff, deterministic
    tie-break (operators/topk.top_k_per_group)."""
    o = table(spark, sf_dir, "orders")
    out = top_k_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        3,
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


@query(
    "window_lag_value_delta",
    f"""
    SELECT event_id,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY {MS}, event_id)
             AS delta
    FROM events
    """,
)
def window_lag_value_delta(spark, sf_dir):
    """lag/lead analytics (the primitive under derivative §2.4 A9)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    return ev.select(
        "event_id", (F.col("value") - F.lag("value").over(w)).alias("delta")
    )


# ===========================================================================
# Set operations / distinct / grouping sets
# ===========================================================================

@query(
    "setops_year_over_year",
    """
    SELECT 'only_1995' AS tag, c FROM (
      SELECT DISTINCT o_custkey AS c FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    )
    UNION ALL
    SELECT 'both' AS tag, c FROM (
      SELECT DISTINCT o_custkey AS c FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    )
    """,
)
def setops_year_over_year(spark, sf_dir):
    """EXCEPT / INTERSECT / UNION ALL over customer-year cohorts."""
    o = table(spark, sf_dir, "orders")

    def cohort(year):
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{year+1}-01-01").cast("timestamp"))
            )
            .select(F.col("o_custkey").alias("c"))
            .distinct()
        )

    c95, c96 = cohort(1995), cohort(1996)
    only95 = c95.exceptAll(c96).select(F.lit("only_1995").alias("tag"), "c")
    both = c95.intersect(c96).select(F.lit("both").alias("tag"), "c")
    return only95.unionAll(both)


@query(
    "distinct_exact_counts",
    """
    SELECT COUNT(DISTINCT user_id) AS n_users,
           COUNT(DISTINCT event_type) AS n_types,
           COUNT(DISTINCT (user_id, event_type)) AS n_pairs
    FROM events
    """,
)
def distinct_exact_counts(spark, sf_dir):
    """Exact DISTINCT aggregates (expand + two-phase aggregation)."""
    ev = table(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct("user_id", "event_type").alias("n_pairs"),
    )


@query(
    "rollup_order_priorities",
    f"""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n,
           {DSUM('o_totalprice')} AS total,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_stat
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def rollup_order_priorities(spark, sf_dir):
    """ROLLUP grouping sets with GROUPING() disambiguation flags."""
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _lsum(F.col("o_totalprice")).alias("total"),
            F.grouping("o_orderpriority").cast("long").alias("g_pri"),
            F.grouping("o_orderstatus").cast("long").alias("g_stat"),
        )
    )


@query(
    "cube_lineitem_flags",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {DSUM('l_quantity')} AS qty,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_lineitem_flags(spark, sf_dir):
    """CUBE over the lineitem status flags."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        _lsum(F.col("l_quantity")).alias("qty"),
        F.grouping("l_returnflag").cast("long").alias("g_rf"),
        F.grouping("l_linestatus").cast("long").alias("g_ls"),
    )


# ===========================================================================
# Percentiles / sketches
# ===========================================================================

@query(
    "percentile_disc_value",
    """
    WITH ranked AS (
      SELECT value, ROW_NUMBER() OVER (ORDER BY value, event_id) AS rn,
             COUNT(*) OVER () AS n
      FROM events
    ), ps(p) AS (SELECT UNNEST([0.25, 0.5, 0.75, 0.99]))
    SELECT p, value
    FROM ranked JOIN ps ON rn = GREATEST(CAST(CEIL(p * n) AS BIGINT), 1)
    """,
)
def percentile_disc_value(spark, sf_dir):
    """Discrete percentiles (element at ceil(p·n)) — actual data values,
    bit-identical across engines (operators/topk.percentile_disc)."""
    ev = table(spark, sf_dir, "events")
    return percentile_disc(ev, "value", [0.25, 0.5, 0.75, 0.99], tie_break="event_id")


from uts_spark.functions.hashing import duck_hash64 as _dh64, hash64 as _h64  # noqa: E402

_SK_K = 256  # KMV size for the global sketches
_SK_SPACE = float(1 << 60)


@query(
    "approx_sketches",
    f"""
    WITH hu AS (
      SELECT DISTINCT {_dh64("concat('kmvu:', user_id)")} AS hv FROM events
    ),
    ku AS (SELECT hv FROM hu ORDER BY hv LIMIT {_SK_K}),
    eu AS (
      SELECT CAST(CASE WHEN COUNT(*) >= {_SK_K}
                  THEN ({_SK_K} - 1) * {_SK_SPACE!r} / MAX(hv)
                  ELSE COUNT(*) END AS DOUBLE) AS approx_users
      FROM ku
    ),
    he AS (
      SELECT DISTINCT {_dh64("concat('kmve:', event_id)")} AS hv FROM events
    ),
    ke AS (SELECT hv FROM he ORDER BY hv LIMIT {_SK_K}),
    ee AS (
      SELECT CAST(CASE WHEN COUNT(*) >= {_SK_K}
                  THEN ({_SK_K} - 1) * {_SK_SPACE!r} / MAX(hv)
                  ELSE COUNT(*) END AS DOUBLE) AS approx_events
      FROM ke
    ),
    s AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS x FROM events
      WHERE {_dh64("concat('ps:', event_id)")} % 4 = 0
    ),
    p AS (
      SELECT quantile_cont(x, 0.50) / 100 AS approx_p50,
             quantile_cont(x, 0.95) / 100 AS approx_p95,
             quantile_cont(x, 0.99) / 100 AS approx_p99
      FROM s
    )
    SELECT approx_users, approx_events, approx_p50, approx_p95, approx_p99
    FROM eu, ee, p
    """,
)
def approx_sketches(spark, sf_dir):
    """Approximate aggregates with a DETERMINISTIC, oracle-exact
    construction: KMV (k-minimum-values) distinct sketches over the
    portable 60-bit md5 hash family for distinct users/events, and
    percentile estimates over a deterministic 25% hash-sample of the rows
    (integer-snapped centi-units so interpolation is bit-identical).

    Why not HLL++/GK (see approx_sketches_native): their register layouts
    are engine-private, so no external oracle can reproduce them — this
    query keeps the same *sketch semantics* (mergeable summaries, bounded
    error: 1/sqrt(k) for KMV, sample-quantile error for the percentiles)
    while being bit-reproducible in any engine that has md5.

    Scale shape: the KMV k-min set is an associative partial aggregate —
    Spark plans the orderBy+limit as TakeOrdered (per-partition top-k
    heaps, merged on the driver: k·P values, never a full sort); the
    hash-sample predicate pushes to the scan; one row out."""
    ev = table(spark, sf_dir, "events")

    def kmv(salt: str, col: str, alias: str):
        h = ev.select(
            _h64(F.concat(F.lit(salt), F.col(col).cast("string"))).alias("hv")
        ).distinct()
        topk = h.orderBy("hv").limit(_SK_K)
        n = F.count(F.lit(1))
        return topk.agg(
            F.when(n >= _SK_K, F.lit((_SK_K - 1) * _SK_SPACE) / F.max("hv"))
            .otherwise(n.cast("double")).alias(alias)
        )

    samp = ev.filter(
        _h64(F.concat(F.lit("ps:"), F.col("event_id").cast("string"))) % 4 == 0
    ).select(F.round(F.col("value") * 100).cast("long").alias("x"))
    pct = samp.agg(
        (F.percentile("x", F.lit(0.50)) / 100).alias("approx_p50"),
        (F.percentile("x", F.lit(0.95)) / 100).alias("approx_p95"),
        (F.percentile("x", F.lit(0.99)) / 100).alias("approx_p99"),
    )
    return (
        kmv("kmvu:", "user_id", "approx_users")
        .crossJoin(kmv("kmve:", "event_id", "approx_events"))
        .crossJoin(pct)
    )


@demo("approx_sketches_native")  # DEMO, not driver-facing: HLL++/GK
# registers are engine-private, approximate by design — no external
# oracle can reproduce them (deterministic sibling: approx_sketches)
def approx_sketches_native(spark, sf_dir):
    """Native HLL++ distinct count and GK-sketch percentiles — the
    engine-provided 100 TB substitutes for exact distinct/sort, kept to
    exercise Spark's own sketch aggregates (the deterministic oracle-exact
    variant is ``approx_sketches``)."""
    ev = table(spark, sf_dir, "events")
    # scalar columns only: the driver's canonicalizer sorts output cells
    # with pandas, which cannot hash an array cell — so the three
    # percentiles come out as separate doubles, not one ARRAY<DOUBLE>
    pct = F.percentile_approx("value", [0.5, 0.95, 0.99], 10000)
    return ev.agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.approx_count_distinct("event_id").alias("approx_events"),
        pct[0].alias("approx_p50"),
        pct[1].alias("approx_p95"),
        pct[2].alias("approx_p99"),
    )


# ===========================================================================
# Sessionization (session windows — dynamic-gap grouping)
# ===========================================================================

@query(
    "session_windows_per_user",
    f"""
    WITH e AS (SELECT user_id, {MS} AS t, value FROM events),
    m AS (
      SELECT user_id, t, value,
             CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                    OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                       >= 1800000
                  THEN 1 ELSE 0 END AS new_s
      FROM e),
    s AS (
      SELECT user_id, t, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM m)
    SELECT user_id,
           MIN(t)          AS session_start,
           MAX(t)          AS session_end,
           COUNT(*)        AS n_events,
           {DSUM('value')} AS sum_value
    FROM s GROUP BY user_id, sid
    """,
)
def session_windows_per_user(spark, sf_dir):
    """Sessionization via native ``F.session_window`` (30-min inactivity
    gap): events merge while the gap is < 30 min; a gap ≥ 30 min starts a
    new session. The oracle is the classic gaps-and-islands rewrite.

    Scale: session_window is a single shuffle on user_id followed by an
    in-partition merge of overlapping [t, t+gap) intervals — no windowed
    sort-spill like the naive islands plan, and it's the same operator
    Structured Streaming uses for streaming sessions."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min("ts_ms").alias("session_start"),
            F.max("ts_ms").alias("session_end"),
            F.count("*").alias("n_events"),
            _lsum(F.col("value")).alias("sum_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
    )


# ===========================================================================
# Scalar function library (string / date / math / array / json)
# ===========================================================================

@query(
    "scalar_function_pack",
    """
    SELECT event_id,
           upper(event_type)                                   AS type_upper,
           CAST(length(event_type) AS BIGINT)                  AS type_len,
           concat_ws('-', event_type, CAST(user_id AS VARCHAR)) AS tag,
           substr(event_type, 1, 3)                            AS type3,
           regexp_replace(event_type, '[aeiou]', '', 'g')      AS type_novowel,
           CAST(year(ts) AS BIGINT)                            AS y,
           CAST(month(ts) AS BIGINT)                           AS m,
           CAST(day(ts) AS BIGINT)                             AS d,
           CAST(hour(ts) AS BIGINT)                            AS h,
           epoch_ms(date_trunc('day', ts))                     AS day_ms,
           abs(value - 100.0)                                  AS vabs,
           sqrt(value)                                         AS vsqrt,
           CAST(floor(value) AS BIGINT)                        AS vfloor,
           CAST(ceil(value) AS BIGINT)                         AS vceil,
           CAST(sign(value - 100.0) AS DOUBLE)                 AS vsign,
           list_max([value, 100.0])                            AS amax,
           CAST(len(string_split(event_type, 'r')) AS BIGINT)  AS nsplit,
           CAST(json_extract_string(props, '$.k') AS BIGINT)   AS k
    FROM events
    """,
)
def scalar_function_pack(spark, sf_dir):
    """Scalar function library coverage (SURVEY §2.7: absent from the
    reference, provided natively): string (upper/length/concat_ws/substr/
    regexp_replace/split), date (year/month/day/hour/date_trunc), math
    (abs/sqrt/floor/ceil/signum — IEEE-exact picks only, so the oracle
    hash-matches bit-for-bit), array (array_max/size), json
    (get_json_object). Map functions are exercised by the schemaless
    payload mode (tests/test_uts_goldens.py). All JVM-side, one pass,
    no shuffle."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.upper("event_type").alias("type_upper"),
        F.length("event_type").cast("long").alias("type_len"),
        F.concat_ws("-", "event_type", F.col("user_id").cast("string")).alias("tag"),
        F.substring("event_type", 1, 3).alias("type3"),
        F.regexp_replace("event_type", "[aeiou]", "").alias("type_novowel"),
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.unix_millis(F.date_trunc("day", "ts")).alias("day_ms"),
        F.abs(F.col("value") - 100.0).alias("vabs"),
        F.sqrt("value").alias("vsqrt"),
        F.floor("value").cast("long").alias("vfloor"),
        F.ceil("value").cast("long").alias("vceil"),
        F.signum(F.col("value") - 100.0).alias("vsign"),
        F.array_max(F.array(F.col("value"), F.lit(100.0))).alias("amax"),
        F.size(F.split("event_type", "r")).cast("long").alias("nsplit"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


# ===========================================================================
# Grouping sets (explicit, beyond rollup/cube)
# ===========================================================================

@query(
    "grouping_sets_orders",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT)                                 AS gid,
           COUNT(*)                                        AS n,
           {DSUM('o_totalprice')}                          AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_orders(spark, sf_dir):
    """Explicit GROUPING SETS (mixed granularities in one pass) with
    GROUPING() disambiguation of set-NULLs vs data-NULLs. One expand +
    one shuffle — Spark expands rows per set and aggregates once."""
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")
    return spark.sql(f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                    AS BIGINT)                                     AS gid,
               COUNT(*)                                            AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                                                                   AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
    """)


# ===========================================================================
# Semi / anti joins + RANGE-frame windows
# ===========================================================================

@query(
    "join_semi_anti_customers",
    f"""
    WITH w AS (SELECT DISTINCT o_custkey FROM orders),
    s AS (SELECT c_custkey, 'with_orders' AS segment FROM customer
          WHERE c_custkey IN (SELECT o_custkey FROM w)),
    a AS (SELECT c_custkey, 'no_orders' AS segment FROM customer
          WHERE c_custkey NOT IN (SELECT o_custkey FROM w))
    SELECT * FROM s UNION ALL SELECT * FROM a
    """,
)
def join_semi_anti_customers(spark, sf_dir):
    """LEFT SEMI (customers with ≥1 order) + LEFT ANTI (customers with
    none) in one labeled output. Both execute as existence hash joins —
    the orders side reduces to its distinct keys, no row multiplication,
    and the dim side broadcasts when small."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    keys = o.select(F.col("o_custkey").alias("c_custkey"))
    semi = c.join(keys, "c_custkey", "left_semi").select(
        "c_custkey", F.lit("with_orders").alias("segment")
    )
    anti = c.join(keys, "c_custkey", "left_anti").select(
        "c_custkey", F.lit("no_orders").alias("segment")
    )
    return semi.unionAll(anti)


@query(
    "window_range_frame_7d",
    f"""
    SELECT event_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
             PARTITION BY user_id ORDER BY {MS}
             RANGE BETWEEN {7 * DAY} PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_7d_sum,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY {MS}
             RANGE BETWEEN {7 * DAY} PRECEDING AND CURRENT ROW
           ) AS trailing_7d_n
    FROM events
    """,
)
def window_range_frame_7d(spark, sf_dir):
    """RANGE-frame window (value-based bounds, not row counts): per-user
    trailing-7-day sum/count at each event — the moving-aggregate shape
    ROWS frames cannot express under irregular sampling. One shuffle on
    user_id; ties on ts share a frame in both engines by definition."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms")
        .rangeBetween(-7 * DAY, Window.currentRow)
    )
    return ev.select(
        "event_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("trailing_7d_sum"),
        F.count(F.lit(1)).over(w).alias("trailing_7d_n"),
    )


@query(
    "window_ranking_pack",
    """
    SELECT o_custkey, o_orderkey,
           CAST(RANK() OVER w AS BIGINT)         AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT)   AS drnk,
           CAST(NTILE(4) OVER w AS BIGINT)       AS quartile,
           PERCENT_RANK() OVER w                 AS prnk,
           CUME_DIST() OVER w                    AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_ranking_pack(spark, sf_dir):
    """Full ranking-function family over one window spec — rank,
    dense_rank, ntile, percent_rank, cume_dist share a single sort, so
    the plan is one shuffle + one in-partition sort for all five."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "tpch_q6_forecast_revenue",
    f"""
    SELECT {DSUM('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24.0
    """,
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan→filter→agg with every predicate in the
    parquet scan (range + between + comparison) — the query whose 100 TB
    cost is entirely decided by pushdown + row-group skipping."""
    li = table(spark, sf_dir, "lineitem")
    f = (
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.05)
        & (F.col("l_quantity") < 24.0)
    )
    return li.filter(f).agg(
        _lsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "tpch_q14_promo_share",
    f"""
    SELECT
      100.0 * {DSUM("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
            / {DSUM('l_extendedprice * (1 - l_discount)')} AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
    """,
)
def tpch_q14_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: fact×dim join + conditional aggregation. The part
    dim broadcasts; the date filter prunes the fact scan first."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    joined = (
        li.filter(
            (F.col("l_shipdate") >= "1996-06-01")
            & (F.col("l_shipdate") < "1996-07-01")
        )
        .join(F.broadcast(p.select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
    )
    return joined.agg(
        (F.lit(100.0) * _lsum(promo) / _lsum(rev)).alias("promo_share")
    )


# ===========================================================================
# Pivot / unpivot
# ===========================================================================

_ETYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_event_type_counts",
    f"""
    SELECT user_id,
           {", ".join(f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
                      for t in _ETYPES)}
    FROM events GROUP BY user_id
    """,
)
def pivot_event_type_counts(spark, sf_dir):
    """Pivot (long → wide): per-user counts, one column per event type.
    An EXPLICIT value list keeps it one pass — pivot without values adds
    a distinct-collect pre-job, which is a full extra scan at 100 TB."""
    ev = table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", _ETYPES)
        .agg(F.count(F.lit(1)))
    )
    fixed = [
        F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _ETYPES
    ]
    return out.select("user_id", *fixed)


@query(
    "unpivot_event_type_counts",
    f"""
    WITH wide AS (
      SELECT user_id,
             {", ".join(f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
                        for t in _ETYPES)}
      FROM events GROUP BY user_id
    )
    SELECT user_id, event_type, n FROM wide
    UNPIVOT (n FOR event_type IN ({", ".join("n_" + t for t in _ETYPES)}))
    """,
)
def unpivot_event_type_counts(spark, sf_dir):
    """Unpivot/melt (wide → long): inverse of the pivot above. melt is a
    generate (explode) — no shuffle beyond the upstream aggregation."""
    wide = pivot_event_type_counts(spark, sf_dir)
    return wide.melt(
        ids=["user_id"],
        values=[f"n_{t}" for t in _ETYPES],
        variableColumnName="event_type",
        valueColumnName="n",
    )


# ===========================================================================
# Statistical aggregates (exact-moment formulations)
# ===========================================================================

@query(
    "stats_moments_by_type",
    f"""
    WITH m AS (
      SELECT event_type,
             COUNT(value)                                        AS n,
             {DSUM('value')}                                     AS s1,
             {DSUM('value * value')}                             AS s2,
             {DSUM('value * user_id')}                           AS sxy,
             {DSUM('CAST(user_id AS DOUBLE)')}                   AS sy,
             {DSUM('CAST(user_id AS DOUBLE) * user_id')}         AS sy2
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           s1 / n                                                AS mean,
           (s2 - s1 * s1 / n) / (n - 1)                          AS var_samp,
           sqrt((s2 - s1 * s1 / n) / (n - 1))                    AS stddev_samp,
           (sxy - s1 * sy / n)
             / (sqrt(s2 - s1 * s1 / n) * sqrt(sy2 - sy * sy / n)) AS corr_vu
    FROM m
    """,
)
def stats_moments_by_type(spark, sf_dir):
    """Statistical aggregates — variance/stddev/correlation — computed
    from decimal-exact raw moments instead of the native streaming
    estimators: the moment sums are order-independent (decimal), so the
    derived statistics are bit-identical across engines AND across
    partitionings — the native Welford-style partials are neither. Same
    single-shuffle plan as any grouped aggregation."""
    ev = table(spark, sf_dir, "events")
    v, u = F.col("value"), F.col("user_id").cast("double")
    m = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        _lsum(v).alias("s1"),
        _dsum(v * v).alias("s2"),
        _dsum(v * u).alias("sxy"),
        _lsum(u).alias("sy"),
        _dsum(u * u).alias("sy2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    sxy, sy, sy2 = F.col("sxy"), F.col("sy"), F.col("sy2")
    return m.select(
        "event_type",
        "n",
        (s1 / n).alias("mean"),
        ((s2 - s1 * s1 / n) / (n - 1)).alias("var_samp"),
        F.sqrt((s2 - s1 * s1 / n) / (n - 1)).alias("stddev_samp"),
        (
            (sxy - s1 * sy / n)
            / (F.sqrt(s2 - s1 * s1 / n) * F.sqrt(sy2 - sy * sy / n))
        ).alias("corr_vu"),
    )


@query(
    "tpch_q10_returned_revenue",
    f"""
    SELECT c.c_custkey, c.c_name,
           {DSUM('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c JOIN orders o   ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_revenue(spark, sf_dir):
    """Returned-item revenue (Q10 shape): one-quarter order window +
    returnflag filter both land in the scans; customer and nation
    broadcast into the lineitem⋈orders shuffle; global top-20 via the
    TakeOrderedAndProject k-heap, tie-broken on custkey."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    joined = (
        o.join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _lsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )
    out = top_k(joined, [F.desc("revenue"), F.asc("c_custkey")], 20)
    return out.select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")


@query(
    "tpch_q18_large_orders",
    f"""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           epoch_ms(o.o_orderdate) AS o_orderdate_ms,
           o.o_totalprice,
           {DSUM('l.l_quantity')} AS sum_qty
    FROM customer c JOIN orders o   ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_orders(spark, sf_dir):
    """Large-volume orders (Q18 shape): the HAVING subquery becomes a
    pre-aggregation of lineitem reused as a LEFT-SEMI join filter on
    orders — the semi side is the already-aggregated key set, so the big
    fact scans once for the filter and once for the final sum, both
    partial-aggregated map-side. Top-100 via the k-heap."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(_lsum(F.col("l_quantity")).alias("__q"))
        .filter(F.col("__q") > 300.0)
        .select("l_orderkey")
    )
    joined = (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_lsum(F.col("l_quantity")).alias("sum_qty"))
    )
    out = top_k(joined, [F.desc("o_totalprice"), F.asc("o_orderkey")], 100)
    return out.select(
        "c_name",
        "c_custkey",
        "o_orderkey",
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_ms"),
        "o_totalprice",
        "sum_qty",
    )


@query(
    "tpch_q4_priority_exists",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4_priority_exists(spark, sf_dir):
    """Order-priority check (Q4 shape; the reference's commit/receipt
    dates are absent, so 'late' = any line shipped >60 days after the
    order date): the correlated EXISTS compiles to a LEFT-SEMI join with
    a non-equi conjunct — the order window prunes the probe side in the
    scan, lineitem deduplicates inside the semi join (no COUNT
    inflation), one small final aggregation."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    late = (l.l_orderkey == o.o_orderkey) & (
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q7_nation_volume",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {DSUM('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
                    JOIN orders o   ON o.o_orderkey = l.l_orderkey
                    JOIN customer c ON c.c_custkey = o.o_custkey
                    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
                    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def tpch_q7_nation_volume(spark, sf_dir):
    """Bilateral trade volume (Q7 shape): nation dimension joined TWICE
    under different roles (supplier side, customer side) with a
    disjunctive cross-nation predicate — both nation copies and both
    dim tables broadcast; the only wide shuffle is lineitem⋈orders; the
    OR predicate stays a post-join filter Catalyst can't push but the
    broadcast joins make cheap."""
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    joined = (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("n1_key") == s.s_nationkey)
        .join(F.broadcast(n2), F.col("n2_key") == c.c_nationkey)
        .filter(pair)
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            _lsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


@query(
    "tpch_q13_custdist",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13_custdist(spark, sf_dir):
    """Customer order-count distribution (Q13 shape): LEFT OUTER join
    with an extra join-side predicate (kept in the ON clause — moving it
    to WHERE would change outer-join semantics), then two stacked
    aggregations; COUNT(o_orderkey) counts NULL-extension rows as 0, so
    customers with no qualifying orders surface in the c_count=0 bucket."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q22_idle_customers",
    f"""
    WITH thresh AS (
      SELECT {DSUM('c_acctbal')} / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey, COUNT(*) AS numcust,
           {DSUM('c.c_acctbal')} AS totacctbal
    FROM customer c, thresh
    WHERE c.c_acctbal > thresh.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c.c_nationkey
    """,
)
def tpch_q22_idle_customers(spark, sf_dir):
    """Churned wealthy customers (Q22 shape; nationkey stands in for the
    absent phone country code, recency for the absent never-ordered
    population — every synthetic customer has SOME order): scalar AVG
    subquery (decimal-stable so both engines derive the identical
    threshold — a double AVG could flip boundary rows) broadcast as a
    1-row cross join, then LEFT ANTI join against recent orders,
    grouped per nation."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    thresh = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((_lsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal"))
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _lsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


# ===========================================================================
# Histogram / rolling exact median
# ===========================================================================

@query(
    "histogram_event_values",
    f"""
    SELECT event_type,
           CAST(floor(value / 25.0) AS BIGINT)      AS bucket,
           COUNT(*)                                 AS n,
           {DSUM('value')}                          AS sum_v
    FROM events
    GROUP BY event_type, CAST(floor(value / 25.0) AS BIGINT)
    """,
)
def histogram_event_values(spark, sf_dir):
    """Fixed-width histogram (width 25, origin 0) of event values per
    type — the bucket expression is a pure projection, so the whole
    histogram is one hash aggregation with map-side partials."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.floor(F.col("value") / F.lit(25.0)).cast("long").alias("bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        _lsum(F.col("value")).alias("sum_v"),
    )


@query(
    "window_rolling_median",
    f"""
    WITH e AS (
      SELECT event_id, user_id, {MS} AS ts_ms, value FROM events
    ),
    w AS (
      SELECT event_id, user_id, ts_ms,
             list(value) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
               AS vs
      FROM e
    )
    SELECT event_id, user_id, ts_ms,
           list_sort(vs)[CAST(ceil(len(vs) / 2.0) AS BIGINT)] AS med
    FROM w
    """,
)
def window_rolling_median(spark, sf_dir):
    """EXACT rolling median (lower median) over each user's trailing 10
    events: collect_list window + array_sort + middle pick. Exact where
    percentile_approx is not — viable because the frame is bounded (10
    elements per row); the unbounded variant belongs to the approx
    sketches. Deterministic ordering tie-break on event_id."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(-9, 0)
    )
    vs = F.collect_list("value").over(w)
    med = F.element_at(
        F.array_sort(vs), F.ceil(F.size(vs) / F.lit(2.0)).cast("int")
    )
    return ev.select(
        "event_id", "user_id", "ts_ms", med.alias("med")
    )


# ===========================================================================
# Time-hierarchy rollup / latest snapshot / funnel
# ===========================================================================

@query(
    "time_rollup_hierarchy",
    f"""
    SELECT CAST(year(ts) AS BIGINT)         AS y,
           CAST(month(ts) AS BIGINT)        AS m,
           CAST(day(ts) AS BIGINT)          AS d,
           {DSUM('value')}                  AS sum_v,
           COUNT(*)                         AS n,
           CAST(GROUPING(year(ts)) * 4 + GROUPING(month(ts)) * 2
                + GROUPING(day(ts)) AS BIGINT) AS lvl
    FROM events
    GROUP BY ROLLUP (year(ts), month(ts), day(ts))
    """,
)
def time_rollup_hierarchy(spark, sf_dir):
    """Multi-granularity time rollup: day → month → year → grand total in
    ONE pass (ROLLUP expands to four grouping sets inside a single hash
    aggregation — no four-scan union). GROUPING() bits disambiguate
    rolled-up NULLs; decimal sums keep every level bit-identical."""
    ev = table(spark, sf_dir, "events")
    y, m, d = F.year("ts"), F.month("ts"), F.dayofmonth("ts")
    return (
        ev.rollup(y.alias("y"), m.alias("m"), d.alias("d"))
        .agg(
            _lsum(F.col("value")).alias("sum_v"),
            F.count(F.lit(1)).alias("n"),
            F.grouping_id().cast("long").alias("lvl"),
        )
        .select(
            F.col("y").cast("long"),
            F.col("m").cast("long"),
            F.col("d").cast("long"),
            "sum_v",
            "n",
            "lvl",
        )
    )


@query(
    "latest_event_snapshot",
    f"""
    SELECT user_id, event_id, ts_ms, event_type, value FROM (
      SELECT user_id, event_id, {MS} AS ts_ms, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY {MS} DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def latest_event_snapshot(spark, sf_dir):
    """Current-state snapshot: each user's latest event, whole row. ONE
    partial-aggregating max_by on a (ts, id) struct key — merges in the
    combiner like any sum, no per-user window sort (the oracle spells
    the same thing as a window; results identical because (ts_ms,
    event_id) is a total order)."""
    ev = table(spark, sf_dir, "events")
    key = F.struct(F.col("ts_ms"), F.col("event_id"))
    row = F.struct("event_id", "ts_ms", "event_type", "value")
    return (
        ev.groupBy("user_id")
        .agg(F.max_by(row, key).alias("r"))
        .select(
            "user_id",
            F.col("r.event_id").alias("event_id"),
            F.col("r.ts_ms").alias("ts_ms"),
            F.col("r.event_type").alias("event_type"),
            F.col("r.value").alias("value"),
        )
    )


@query(
    "funnel_signup_click_purchase",
    f"""
    WITH s AS (
      SELECT user_id, MIN({MS}) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN({MS}) AS t2
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND {MS} > s.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN({MS}) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND {MS} > c.t2
      GROUP BY e.user_id
    )
    SELECT s.user_id, s.t1, c.t2, p.t3
    FROM s LEFT JOIN c ON s.user_id = c.user_id
           LEFT JOIN p ON s.user_id = p.user_id
    """,
)
def funnel_signup_click_purchase(spark, sf_dir):
    """Funnel analysis: first signup → first later click → first later
    purchase per user, NULL where the user never advanced. Decorrelated
    into three grouped MINs, each joining the (tiny, broadcast) previous
    stage into the fact scan — never a per-user subquery re-scan, and
    the fact shuffles only for its own per-user aggregations."""
    ev = table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(s), "user_id")
        .filter(F.col("ts_ms") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(F.col("ts_ms") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t3"))
    )
    return s.join(c, "user_id", "left").join(p, "user_id", "left").select(
        "user_id", "t1", "t2", "t3"
    )


@query(
    "join_asof_next_purchase",
    f"""
    WITH err AS (
      SELECT event_id, user_id, {MS} AS t FROM events WHERE event_type = 'error'
    ),
    pur AS (
      SELECT event_id, user_id, {MS} AS t, value
      FROM events WHERE event_type = 'purchase'
    ),
    u AS (
      SELECT user_id, -t AS nt, 1 AS side, event_id, t AS lt,
             NULL::DOUBLE AS pv, NULL::BIGINT AS pt FROM err
      UNION ALL
      SELECT user_id, -t, 0, event_id, NULL, value, t FROM pur
    ),
    m AS (
      SELECT *,
             last_value(pv IGNORE NULLS) OVER w AS mv,
             last_value(pt IGNORE NULLS) OVER w AS mt
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY nt, side, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, lt AS ts_ms,
           CASE WHEN abs(lt - mt) <= {2 * HOUR} THEN mv END
             AS next_purchase_value
    FROM m WHERE side = 1
    """,
)
def join_asof_next_purchase(spark, sf_dir):
    """FORWARD as-of join with tolerance: each error enriched with the
    next at-or-after purchase value for the same user, but only within
    2 h (outside → NULL, pandas merge_asof semantics). Same union-window
    plan as the backward join — forward just negates the time axis, so
    the cost stays one shuffle + one sort on user_id; no per-key loop,
    no correlated subquery (operators/joins.asof_join)."""
    ev = table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts_ms"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_ms", "value", "event_id"
    )
    out = asof_join(
        errors,
        purchases,
        on="user_id",
        left_time="ts_ms",
        right_time="ts_ms",
        right_payload=["value"],
        order_col="event_id",
        direction="forward",
        tolerance=2 * HOUR,
    )
    return out.select(
        "event_id", "user_id", "ts_ms",
        F.col("value_right").alias("next_purchase_value"),
    )


@query(
    "histogram_equidepth_deciles",
    f"""
    WITH d AS (
      SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS decile
      FROM events
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           MIN(value) AS lo, MAX(value) AS hi, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
             AS mean_v
    FROM d GROUP BY decile
    """,
)
def histogram_equidepth_deciles(spark, sf_dir):
    """EQUI-DEPTH histogram (decile buckets each holding ~n/10 rows) —
    the complement of the fixed-width `histogram_event_values`. Exact
    ntile needs a total order; since round 4 that order is DISTRIBUTED:
    range-bucket on value (exact-percentile boundaries from a
    deterministic sample), per-bucket row_number, broadcast prefix
    counts, then NTILE recomputed as a closed form over (global rank,
    n) — bit-identical to the ntile(10) oracle with no
    single-partition window anywhere (operators/distributed_rank,
    pinned by tests/test_plan_properties.py)."""
    ev = table(spark, sf_dir, "events")
    r = ranked_cumsum(
        ev.select("value", "event_id"),
        F.col("value"),
        [F.asc("value"), F.asc("event_id")],
        n_buckets=64,
    )
    d = r.select("value", ntile_from_rank(F.col("__rank"), F.col("__n"), 10).alias("decile"))
    return d.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_v"),
    )


@query(
    "cohort_retention_weekly",
    f"""
    WITH act AS (
      SELECT DISTINCT user_id, ({MS} // {7 * DAY}) * {7 * DAY} AS week
      FROM events
    ),
    cohort AS (
      SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY user_id
    )
    SELECT c.cohort_week,
           (a.week - c.cohort_week) // {7 * DAY} AS week_offset,
           COUNT(*) AS n_users
    FROM act a JOIN cohort c USING (user_id)
    GROUP BY c.cohort_week, week_offset
    """,
)
def cohort_retention_weekly(spark, sf_dir):
    """Cohort retention matrix: users bucketed by their first-activity
    week; each later active week counts them at that week offset — the
    classic product-analytics triangle. Shapes: distinct (user, week)
    → per-user min (cohort) → self-join on user → count. Both shuffles
    key on user_id, so at scale this is one repartition reused across
    the min and the join (AQE coalesces the tail)."""
    WEEK = 7 * DAY
    ev = table(spark, sf_dir, "events")
    act = ev.select(
        "user_id",
        ((F.col("ts_ms") / WEEK).cast("long") * WEEK).alias("week"),
    ).distinct()
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        act.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            ((F.col("week") - F.col("cohort_week")) / WEEK)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "map_function_pack",
    """
    SELECT event_id,
           map_keys(map([event_type], [value]))[1]                AS mk,
           CAST(map([event_type], [value])[event_type][1] AS DOUBLE) AS mv,
           CAST(cardinality(map([event_type], [value])) AS BIGINT)   AS msize,
           CAST(cardinality(map_concat(map([event_type], [value]),
                                       map(['x'], [CAST(9.0 AS DOUBLE)]))) AS BIGINT) AS m2size,
           value * 2                                              AS mv2
    FROM events
    """,
)
def map_function_pack(spark, sf_dir):
    """MAP-typed scalar function coverage (complements
    scalar_function_pack and the schemaless payload mode): create_map,
    map_keys, element_at, size, map_concat, and the map HOF
    transform_values — all checked through scalar projections (map CELLS
    never cross the oracle boundary; key order inside a map is
    engine-defined). One narrow pass, no shuffle."""
    ev = table(spark, sf_dir, "events")
    m = F.create_map(F.col("event_type"), F.col("value"))
    return ev.select(
        "event_id",
        F.map_keys(m)[0].alias("mk"),
        F.element_at(m, F.col("event_type")).alias("mv"),
        F.size(m).cast("long").alias("msize"),
        F.size(F.map_concat(m, F.create_map(F.lit("x"), F.lit(9.0))))
        .cast("long")
        .alias("m2size"),
        F.element_at(
            F.transform_values(m, lambda k, v: v * 2), F.col("event_type")
        ).alias("mv2"),
    )


@query(
    "percentile_disc_by_type",
    """
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), ps(p) AS (SELECT UNNEST([0.5, 0.9, 0.99]))
    SELECT event_type, p, value
    FROM ranked JOIN ps ON rn = GREATEST(CAST(CEIL(p * n) AS BIGINT), 1)
    """,
)
def percentile_disc_by_type(spark, sf_dir):
    """GROUPED discrete percentiles: p50/p90/p99 of value per
    event_type — the per-key latency-quantile shape. Same
    ceil(p·n)-rank pick as the global variant, but the window
    partitions by the group key, so the sort shards per key instead of
    going global (operators/topk.percentile_disc with group_cols)."""
    ev = table(spark, sf_dir, "events")
    return percentile_disc(
        ev, "value", [0.5, 0.9, 0.99],
        group_cols=["event_type"], tie_break="event_id",
    )


@query(
    "array_function_pack",
    """
    WITH t AS (
      SELECT event_id, value, [value, value * 2, CAST(100.0 AS DOUBLE)] AS arr
      FROM events
    )
    SELECT event_id,
           list_reduce(list_transform(arr, x -> x + 0.0),
                       (acc, x) -> acc + x)                      AS asum,
           list_transform(arr, x -> x * 2)[2]                    AS atrans,
           CAST(len(list_filter(arr, x -> x > 100.0)) AS BIGINT) AS nbig,
           len(list_filter(arr, x -> x > 100.0)) > 0             AS aexists,
           len(list_filter(arr, x -> x > 0.0)) = len(arr)        AS aforall,
           list_sort(arr)[1]                                     AS asmallest,
           CAST(len(flatten([arr, [CAST(0.0 AS DOUBLE)]])) AS BIGINT) AS nflat,
           CAST(list_position(arr, value) AS BIGINT)             AS apos
    FROM t
    """,
)
def array_function_pack(spark, sf_dir):
    """ARRAY higher-order-function coverage: aggregate (left fold — both
    engines fold 3 elements in the same order, so the double sum is
    bit-exact), transform, filter, exists/forall (expressed through the
    same filter-count both engines share), sort_array, flatten,
    array_position. All JVM-side lambda expressions, one narrow pass,
    no shuffle — the HOF surface that makes UDFs unnecessary for array
    work."""
    ev = table(spark, sf_dir, "events")
    arr = F.array(F.col("value"), F.col("value") * 2, F.lit(100.0))
    t = ev.select("event_id", "value", arr.alias("arr"))
    return t.select(
        "event_id",
        # x + 0.0 normalizes -0.0 → 0.0 on BOTH engines, so Spark's seeded
        # fold ((0.0+v1)+v2)+v3 and DuckDB's unseeded (v1+v2)+v3 agree
        # bit-exactly even if the generator ever emits negative zero
        F.aggregate(
            F.transform("arr", lambda x: x + F.lit(0.0)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("asum"),
        F.transform("arr", lambda x: x * 2)[1].alias("atrans"),
        F.size(F.filter("arr", lambda x: x > 100.0)).cast("long").alias("nbig"),
        F.exists("arr", lambda x: x > 100.0).alias("aexists"),
        F.forall("arr", lambda x: x > 0.0).alias("aforall"),
        F.array_sort("arr")[0].alias("asmallest"),
        F.size(F.flatten(F.array(F.col("arr"), F.array(F.lit(0.0)))))
        .cast("long")
        .alias("nflat"),
        F.array_position("arr", F.col("value")).cast("long").alias("apos"),
    )


def _acf_sql(k: int) -> str:
    """Pearson corr of (value, lag-k value) from decimal-exact sums."""
    return f"""(nx{k} * sxy{k} - sx{k} * sy{k})
             / (sqrt(nx{k} * sxx{k} - sx{k} * sx{k})
                * sqrt(nx{k} * syy{k} - sy{k} * sy{k}))"""


@query(
    "ts_autocorrelation",
    f"""
    WITH o AS (
      SELECT event_type, value,
             {", ".join(f"lag(value, {k}) OVER (PARTITION BY event_type ORDER BY {MS}, event_id) AS l{k}" for k in (1, 2, 3))}
      FROM events
    ),
    m AS (
      SELECT event_type,
             {", ".join(
                f"COUNT(l{k}) AS nx{k}, "
                f"{DSUM(f'CASE WHEN l{k} IS NOT NULL THEN value END')} AS sx{k}, "
                f"{DSUM(f'l{k}')} AS sy{k}, "
                f"{DSUM(f'CASE WHEN l{k} IS NOT NULL THEN value * value END')} AS sxx{k}, "
                f"{DSUM(f'l{k} * l{k}')} AS syy{k}, "
                f"{DSUM(f'value * l{k}')} AS sxy{k}"
                for k in (1, 2, 3))}
      FROM o GROUP BY event_type
    )
    SELECT event_type,
           {", ".join(f"{_acf_sql(k)} AS acf{k}" for k in (1, 2, 3))}
    FROM m
    """,
)
def ts_autocorrelation(spark, sf_dir):
    """Lag-1/2/3 autocorrelation of value per event_type — the classic
    seasonality/persistence diagnostic. One window pass builds the
    three lag columns, one aggregation computes all exact decimal
    moments (restricted per lag to rows WHERE the lag exists, so each
    ACF is the true Pearson corr of the overlapping pairs); the final
    arithmetic runs in identical expression order on both engines."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts_ms", "event_id")
    o = ev.select(
        "event_type",
        "value",
        *[F.lag("value", k).over(w).alias(f"l{k}") for k in (1, 2, 3)],
    )
    def dsum(c):
        return F.sum(c.cast("decimal(38,6)")).cast("double")
    aggs = []
    for k in (1, 2, 3):
        lk = F.col(f"l{k}")
        present = lk.isNotNull()
        aggs += [
            F.count(lk).alias(f"nx{k}"),
            dsum(F.when(present, F.col("value"))).alias(f"sx{k}"),
            dsum(lk).alias(f"sy{k}"),
            dsum(F.when(present, F.col("value") * F.col("value"))).alias(f"sxx{k}"),
            dsum(lk * lk).alias(f"syy{k}"),
            dsum(F.col("value") * lk).alias(f"sxy{k}"),
        ]
    m = o.groupBy("event_type").agg(*aggs)
    def acf(k):
        nx, sx, sy, sxx, syy, sxy = [
            F.col(f"{p}{k}") for p in ("nx", "sx", "sy", "sxx", "syy", "sxy")
        ]
        return (nx * sxy - sx * sy) / (
            F.sqrt(nx * sxx - sx * sx) * F.sqrt(nx * syy - sy * sy)
        )
    return m.select(
        "event_type", *[acf(k).alias(f"acf{k}") for k in (1, 2, 3)]
    )


# ===========================================================================
# JSON function pack (semi-structured columns: events.props)
# ===========================================================================

@query(
    "scalar_json_pack",
    """
    WITH e AS (
      SELECT event_id, props,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
      FROM events
    )
    SELECT event_id,
           k_int,
           CAST(json_extract_string(props, '$.k') AS DOUBLE) / 4.0 AS k_quarter,
           json_extract_string(props, '$.missing')           AS missing_path,
           array_to_string(json_keys(props), ',')            AS keys_csv,
           to_json(struct_pack(k := k_int))                  AS roundtrip,
           json_extract_string(
             to_json(struct_pack(k := k_int, k2 := k_int * 2)), '$.k2')
             AS nested_k2,
           json_extract_string(
             concat('[', k_int, ',', k_int + 1, ']'), '$[1]') AS arr_second,
           CAST(json_array_length(
             concat('[', k_int, ',', k_int + 1, ']')) AS BIGINT) AS arr_len
    FROM e
    """,
)
def scalar_json_pack(spark, sf_dir):
    """JSON / semi-structured function coverage over the ``props`` JSON
    column: path extraction (hit and miss), typed casts, key listing,
    struct→JSON round-trip, nested-path extraction from built JSON, and
    array indexing/length. All JVM-side expressions (get_json_object /
    from_json / to_json / json_object_keys / json_array_length) — one
    narrow projection, no shuffle; at 100 TB this is a pure map stage
    that pipelines into whatever consumes it. The reference stores only
    numeric columns (uts.ts:164-166); JSON columns are a north-star
    extension every event pipeline needs."""
    ev = table(spark, sf_dir, "events")
    k_int = F.get_json_object("props", "$.k").cast("long")
    arr = F.concat(
        F.lit("["), k_int.cast("string"), F.lit(","),
        (k_int + 1).cast("string"), F.lit("]"),
    )
    return ev.select(
        "event_id",
        k_int.alias("k_int"),
        (F.get_json_object("props", "$.k").cast("double") / 4.0)
            .alias("k_quarter"),
        F.get_json_object("props", "$.missing").alias("missing_path"),
        F.concat_ws(",", F.json_object_keys("props")).alias("keys_csv"),
        F.to_json(F.struct(k_int.alias("k"))).alias("roundtrip"),
        F.get_json_object(
            F.to_json(F.struct(k_int.alias("k"), (k_int * 2).alias("k2"))),
            "$.k2",
        ).alias("nested_k2"),
        F.get_json_object(arr, "$[1]").alias("arr_second"),
        F.json_array_length(arr).cast("long").alias("arr_len"),
    )


# ===========================================================================
# Z-order (Morton) curve: multi-dimensional layout clustering
# ===========================================================================

from uts_spark.functions.layout import duck_z_value, z_value  # noqa: E402


@query(
    "zorder_curve",
    f"""
    SELECT event_id,
           CAST(user_id AS BIGINT)            AS x,
           CAST(ROUND(value) AS BIGINT)       AS y,
           {duck_z_value('user_id', 'ROUND(value)')}        AS zval,
           {duck_z_value('user_id', 'ROUND(value)')} >> 16  AS cell
    FROM events
    """,
)
def zorder_curve(spark, sf_dir):
    """Morton z-value assignment over (user_id, value-band) — the
    space-filling-curve layout key that lets ONE sort order serve
    selective predicates on either dimension via file-level min/max
    pruning (Delta/Iceberg ZORDER mechanism). Pure integer bit-math,
    bit-identical to the oracle; the file-locality proof (z-ordered
    files cover far smaller (x, y) rectangles than time-ordered ones)
    is in tests/test_sinks.py. See functions/layout.py."""
    ev = table(spark, sf_dir, "events")
    x = F.col("user_id")
    y = F.round("value").cast("long")
    z = z_value(x, y)
    return ev.select(
        "event_id",
        x.cast("long").alias("x"),
        y.alias("y"),
        z.alias("zval"),
        F.shiftright(z, 16).alias("cell"),
    )


# ===========================================================================
# Continuous (interpolated) percentiles — exact, grouped
# ===========================================================================

@query(
    "percentile_cont_by_type",
    """
    WITH e AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS x FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           quantile_cont(x, 0.25) AS q25,
           quantile_cont(x, 0.50) AS q50,
           quantile_cont(x, 0.75) AS q75,
           quantile_cont(x, 0.90) AS q90,
           quantile_cont(x, 0.99) AS q99
    FROM e GROUP BY event_type
    """,
)
def percentile_cont_by_type(spark, sf_dir):
    """Grouped continuous (linearly interpolated) percentiles — the
    PERCENTILE_CONT surface next to the existing discrete
    percentile_disc queries. Values are integer-snapped (centi-units)
    so lower/upper neighbors are exact; both engines interpolate
    ``lower + (upper - lower) * frac`` at rank ``p*(n-1)``, giving
    bit-identical doubles. Exact percentile = full sort per group —
    fine per-series; the 100 TB unordered path is the GK sketch in
    approx_sketches."""
    ev = table(spark, sf_dir, "events")
    x = F.round(F.col("value") * 100).cast("long")
    e = ev.select("event_type", x.alias("x"))
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("x", F.lit(0.25)).alias("q25"),
        F.percentile("x", F.lit(0.50)).alias("q50"),
        F.percentile("x", F.lit(0.75)).alias("q75"),
        F.percentile("x", F.lit(0.90)).alias("q90"),
        F.percentile("x", F.lit(0.99)).alias("q99"),
    )


# ===========================================================================
# Mode (most frequent value) with deterministic tie-break
# ===========================================================================

@query(
    "mode_value_band",
    """
    WITH b AS (
      SELECT event_type, CAST(ROUND(value) AS BIGINT) AS band,
             COUNT(*) AS cnt
      FROM events GROUP BY event_type, CAST(ROUND(value) AS BIGINT)
    )
    SELECT event_type,
           MAX(cnt * 1000000 + (999999 - band)) // 1000000 AS mode_cnt,
           999999 - (MAX(cnt * 1000000 + (999999 - band)) % 1000000)
             AS mode_band
    FROM b GROUP BY event_type
    """,
)
def mode_value_band(spark, sf_dir):
    """Modal value band per event type with a DETERMINISTIC tie-break
    (highest count, then smallest band — engines' native mode() break
    ties arbitrarily, so it can't be oracle-checked). The argmax is
    packed into one non-negative integer key ``cnt*1e6 + (999999 -
    band)`` (band < 1e6), making it a plain MAX: two hash aggregations,
    no window, no sort — the scalable mode shape (count table is tiny
    after the first agg)."""
    ev = table(spark, sf_dir, "events")
    band = F.round("value").cast("long")
    b = ev.groupBy("event_type", band.alias("band")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    key = F.max(F.col("cnt") * 1000000 + (999999 - F.col("band")))
    return b.groupBy("event_type").agg(
        F.floor(key / 1000000).alias("mode_cnt"),
        (F.lit(999999) - (key % 1000000)).alias("mode_band"),
    )


# ===========================================================================
# Regexp function pack
# ===========================================================================

@query(
    "scalar_regex_pack",
    r"""
    SELECT doc_id,
           regexp_extract(text, '(ta[a-z]*)', 1)                AS first_ta,
           CAST(len(regexp_extract_all(text, '\b[aeiou][a-z]*'))
                AS BIGINT)                                      AS n_vowel_words,
           CAST(len(regexp_extract_all(text, 'ta')) AS BIGINT)  AS n_ta,
           regexp_matches(text, 'spark')                        AS has_spark,
           regexp_matches(text, '^[a-z ]+$')                    AS only_lower,
           regexp_replace(text, '\b(a|the)\b', '_', 'g')        AS articles_blanked,
           CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_ws_tokens
    FROM documents
    """,
)
def scalar_regex_pack(spark, sf_dir):
    """Regexp function coverage over document text: group extraction,
    extract-all counting, boolean match, anchored match, word-boundary
    replacement, and regex splitting. Patterns stay in the Java∩RE2
    dialect (no backrefs/lookarounds) so Spark and DuckDB agree
    symbol-for-symbol. Pure projection — no shuffle, whole-stage
    codegen; regexps compile once per task at scale."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"(ta[a-z]*)", 1).alias("first_ta"),
        F.size(F.regexp_extract_all("text", F.lit(r"\b[aeiou][a-z]*"), 0))
            .cast("long").alias("n_vowel_words"),
        F.size(F.regexp_extract_all("text", F.lit("ta"), 0)).cast("long")
            .alias("n_ta"),
        F.col("text").rlike("spark").alias("has_spark"),
        F.col("text").rlike("^[a-z ]+$").alias("only_lower"),
        F.regexp_replace("text", r"\b(a|the)\b", "_")
            .alias("articles_blanked"),
        F.size(F.split("text", r"\s+")).cast("long").alias("n_ws_tokens"),
    )


# ===========================================================================
# KMV (k-minimum-values) distinct sketch — deterministic, oracle-exact
# ===========================================================================

from uts_spark.functions.hashing import duck_hash64, hash64  # noqa: E402

_KMV_K = 64
_HASH_SPACE = float(1 << 60)  # hash64 yields 60-bit values


@query(
    "sketch_kmv_distinct",
    f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             {duck_hash64("concat('kmv:', user_id)")} AS hv
      FROM events
    ),
    r AS (
      SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS nd
      FROM h
    )
    SELECT event_type,
           CAST(MAX(nd) AS BIGINT) AS n_exact,
           CAST(CASE WHEN MAX(nd) >= {_KMV_K}
                THEN ({_KMV_K} - 1) * {_HASH_SPACE!r}
                     / MAX(CASE WHEN rn = {_KMV_K} THEN hv END)
                ELSE MAX(nd) END AS DOUBLE) AS kmv_est
    FROM r WHERE rn <= {_KMV_K}
    GROUP BY event_type
    """,
)
def sketch_kmv_distinct(spark, sf_dir):
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002):
    estimate distinct users per event type from the {_KMV_K} smallest
    60-bit hashes — est = (k-1)·H/h_(k), exact count when fewer than k
    distinct values exist. Unlike HLL (whose register layout is
    engine-private, so approx_sketches is rows-only), KMV over the
    portable md5 hash family is FULLY DETERMINISTIC: Spark and DuckDB
    produce identical estimates, giving a hash-exact oracle for an
    approximate sketch. Scale shape: the k-min set is an associative,
    mergeable summary — per-partition top-k heaps merge like any
    partial aggregate; here it's a distinct + per-group sort of hash
    values (tiny: distinct hashes, not rows). n_exact rides along to
    show the estimate lands within the expected 1/sqrt(k) band."""
    ev = table(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        hash64(F.concat(F.lit("kmv:"), F.col("user_id").cast("string")))
            .alias("hv"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    r = h.select(
        "event_type", "hv",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy("event_type")
        ).alias("nd"),
    ).filter(F.col("rn") <= _KMV_K)
    kth = F.max(F.when(F.col("rn") == _KMV_K, F.col("hv")))
    nd = F.max("nd")
    return r.groupBy("event_type").agg(
        nd.cast("long").alias("n_exact"),
        F.when(nd >= _KMV_K, F.lit((_KMV_K - 1) * _HASH_SPACE) / kth)
        .otherwise(nd.cast("double")).alias("kmv_est"),
    )


# ===========================================================================
# PageRank (fixed-point, fixed iterations) over the nation trade graph
# ===========================================================================

from uts_spark.functions.clustering import pagerank_weighted  # noqa: E402

_PR_ONE = 1 << 40


def _duck_pagerank(iterations: int = 3, damping: int = 85) -> str:
    prev = "p0"
    its = ""
    for i in range(1, iterations + 1):
        its += f"""
    it{i} AS (
      SELECT b.node,
             (SELECT tele FROM cfg)
             + ({damping} * COALESCE(c.s, 0)) // 100 AS p
      FROM p0 b LEFT JOIN (
        SELECT e.dst AS node, SUM((pk.p * e.w) // ow.W) AS s
        FROM edges e
        JOIN ow ON ow.src = e.src
        JOIN {prev} pk ON pk.node = e.src
        GROUP BY e.dst
      ) c ON c.node = b.node
    ),"""
        prev = f"it{i}"
    return f"""
    WITH edges AS (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY s.s_nationkey, c.c_nationkey
    ),
    ow AS (SELECT src, SUM(w) AS W FROM edges GROUP BY src),
    cfg AS (
      SELECT COUNT(*) AS n,
             ({_PR_ONE} * 15) // (100 * COUNT(*)) AS tele
      FROM nation
    ),
    p0 AS (
      SELECT n_nationkey AS node,
             {_PR_ONE} // (SELECT n FROM cfg) AS p
      FROM nation
    ),{its.rstrip(',')}
    SELECT nn.n_name AS nation,
           CAST(r.p AS BIGINT) AS pr_fixed,
           CAST(r.p AS DOUBLE) / {float(_PR_ONE)!r} AS pr
    FROM {prev} r JOIN nation nn ON nn.n_nationkey = r.node
    """


@query("graph_pagerank_trade", _duck_pagerank())
def graph_pagerank_trade(spark, sf_dir):
    """Weighted PageRank (3 fixed rounds, fixed-point 2^-40 mass) over
    the supplier-nation → customer-nation trade graph: which nations
    concentrate inbound trade influence. The edge build is the Q7-style
    three-join over the fact table; the iterations are tiny broadcast
    joins batched into ONE lazy plan. Integer-only arithmetic keeps an
    iterative numeric algorithm hash-exact vs the unrolled-CTE oracle.
    See functions/clustering.pagerank_weighted."""
    li = table(spark, sf_dir, "lineitem")
    su = table(spark, sf_dir, "supplier")
    od = table(spark, sf_dir, "orders")
    cu = table(spark, sf_dir, "customer")
    na = table(spark, sf_dir, "nation")
    edges = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    nodes = na.select(F.col("n_nationkey").alias("node"))
    pr = pagerank_weighted(nodes, edges, iterations=3)
    return pr.join(F.broadcast(na), pr.node == na.n_nationkey).select(
        F.col("n_name").alias("nation"), "pr_fixed", "pr"
    )


# ===========================================================================
# Window value-function pack (first/last/nth/lead offsets + frames)
# ===========================================================================

@query(
    "window_value_pack",
    f"""
    SELECT event_id, user_id, {MS} AS ts_ms,
           first_value(value) OVER w AS first_seen,
           last_value(value)  OVER (PARTITION BY user_id
                                    ORDER BY {MS}, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND UNBOUNDED FOLLOWING) AS final_value,
           nth_value(value, 3) OVER w AS third_value,
           lag(value, 1, -1.0)  OVER w AS prev_or_neg1,
           lead(value, 2)       OVER w AS next_next,
           last_value(value) OVER (PARTITION BY user_id
                                   ORDER BY {MS}, event_id
                                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS trailing_last
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY {MS}, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_value_pack(spark, sf_dir):
    """Window VALUE-function coverage beside the existing ranking /
    frame / lag packs: first_value, full-partition and bounded-frame
    last_value, nth_value, lag with an explicit default, and multi-step
    lead. Unique (ts, event_id) ordering makes every cell deterministic;
    all six expressions share two window specs over ONE shuffle."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    trail = w.rowsBetween(-2, Window.currentRow)
    return ev.select(
        "event_id", "user_id", "ts_ms",
        F.first("value").over(run).alias("first_seen"),
        F.last("value").over(full).alias("final_value"),
        F.nth_value("value", 3).over(run).alias("third_value"),
        F.lag("value", 1, -1.0).over(w).alias("prev_or_neg1"),
        F.lead("value", 2).over(w).alias("next_next"),
        F.last("value").over(trail).alias("trailing_last"),
    )


# ===========================================================================
# KMV sketch ALGEBRA: union / intersection estimates from mergeable sketches
# ===========================================================================

@query(
    "sketch_kmv_set_algebra",
    f"""
    WITH cf AS (
      SELECT DISTINCT {duck_hash64("concat('kmv:', user_id)")} AS hv
      FROM events WHERE event_type = 'click'
    ),
    pf AS (
      SELECT DISTINCT {duck_hash64("concat('kmv:', user_id)")} AS hv
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (SELECT hv FROM cf ORDER BY hv LIMIT {_KMV_K}),
    p AS (SELECT hv FROM pf ORDER BY hv LIMIT {_KMV_K}),
    u AS (
      SELECT hv,
             row_number() OVER (ORDER BY hv) AS rn,
             (hv IN (SELECT hv FROM c) AND hv IN (SELECT hv FROM p))
               AS in_both
      FROM (SELECT hv FROM c UNION SELECT hv FROM p)
    ),
    k AS (SELECT * FROM u WHERE rn <= {_KMV_K}),
    est AS (
      SELECT COUNT(*) AS nk,
             MAX(CASE WHEN rn = {_KMV_K} THEN hv END) AS kth,
             SUM(CASE WHEN in_both THEN 1 ELSE 0 END) AS nb
      FROM k
    ),
    exact AS (
      SELECT COUNT(*) AS n_inter FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
      )
    )
    SELECT CAST(CASE WHEN nk >= {_KMV_K}
                THEN ({_KMV_K} - 1) * {_HASH_SPACE!r} / kth
                ELSE nk END AS DOUBLE)                     AS est_union,
           CAST(nb AS BIGINT)                              AS k_in_both,
           CAST((CAST(nb AS DOUBLE) / nk)
                * (CASE WHEN nk >= {_KMV_K}
                   THEN ({_KMV_K} - 1) * {_HASH_SPACE!r} / kth
                   ELSE nk END) AS DOUBLE)                 AS est_intersection,
           (SELECT CAST(n_inter AS BIGINT) FROM exact)     AS exact_intersection
    FROM est
    """,
)
def sketch_kmv_set_algebra(spark, sf_dir):
    """KMV sketch ALGEBRA — the property that makes k-min sketches a
    distributed summary: two per-segment sketches merge into a union
    sketch (k smallest of the combined k-min sets), and the Jaccard-style
    both-membership ratio over the union sketch estimates the
    INTERSECTION (distinct users who both click and purchase) without
    ever counting it. Both inputs are k-TRUNCATED sketches (k smallest
    hashes each — what a segment would actually ship), so the merge
    sees at most 2k rows, never the full sets. Deterministic through
    the portable hash family →
    hash-exact oracle, with the exact intersection alongside to expose
    the error. At scale each segment's sketch is a tiny mergeable state
    (k longs) — this query is the merge+estimate step."""
    ev = table(spark, sf_dir, "events")
    hv = hash64(
        F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))
    ).alias("hv")
    c = (
        ev.filter(F.col("event_type") == "click").select(hv).distinct()
        .orderBy("hv").limit(_KMV_K)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase").select(hv).distinct()
        .orderBy("hv").limit(_KMV_K)
    )
    u = (
        c.withColumn("__in_c", F.lit(1))
        .join(
            p.withColumn("__in_p", F.lit(1)),
            "hv",
            "full_outer",
        )
        .select(
            "hv",
            (
                F.coalesce("__in_c", F.lit(0)) * F.coalesce("__in_p", F.lit(0))
                == 1
            ).alias("in_both"),
        )
    )
    # k smallest of the merged sketch: orderBy+limit plans as
    # TakeOrderedAndProject (per-partition k-heaps — never a global
    # row_number window; pinned by tests/test_plan_properties.py).
    # After the truncation count==K implies max(hv) IS the kth value.
    k = u.orderBy("hv").limit(_KMV_K)
    nk = F.count(F.lit(1))
    kth = F.max("hv")
    nb = F.sum(F.when(F.col("in_both"), 1).otherwise(0))
    est_union = F.when(
        nk >= _KMV_K, F.lit((_KMV_K - 1) * _HASH_SPACE) / kth
    ).otherwise(nk.cast("double"))
    exact = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id")
        .intersect(
            ev.filter(F.col("event_type") == "purchase").select("user_id")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersection"))
    )
    return k.agg(
        est_union.alias("est_union"),
        nb.cast("long").alias("k_in_both"),
        ((nb.cast("double") / nk) * est_union).alias("est_intersection"),
    ).crossJoin(F.broadcast(exact))


# ===========================================================================
# As-of join, NEAREST direction (completes backward/forward parity)
# ===========================================================================

from uts_spark.operators.aggregates import lane_sum
from uts_spark.operators.joins import asof_join  # noqa: E402


@query(
    "join_asof_nearest_purchase",
    f"""
    WITH l AS (
      SELECT event_id, user_id, {MS} AS t FROM events
      WHERE event_type = 'click'
    ),
    r AS (
      SELECT event_id, user_id, {MS} AS rt, value AS rv FROM events
      WHERE event_type = 'purchase'
    ),
    u AS (
      SELECT user_id, t, 1 AS side, event_id, event_id AS lid,
             NULL::BIGINT AS rt, NULL::DOUBLE AS rv
      FROM l
      UNION ALL
      SELECT user_id, rt AS t, 0, event_id, NULL, rt, rv FROM r
    ),
    m AS (
      SELECT user_id, t, side, lid,
             last_value(rt IGNORE NULLS)  OVER wb AS brt,
             last_value(rv IGNORE NULLS)  OVER wb AS brv,
             first_value(rt IGNORE NULLS) OVER wf AS frt,
             first_value(rv IGNORE NULLS) OVER wf AS frv
      FROM u
      WINDOW wb AS (PARTITION BY user_id ORDER BY t, side, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY t, side, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, lid AS event_id, t AS ts_ms,
           CASE WHEN brt IS NOT NULL AND (frt IS NULL OR t - brt <= frt - t)
                THEN brt ELSE frt END AS purchase_ts,
           CASE WHEN brt IS NOT NULL AND (frt IS NULL OR t - brt <= frt - t)
                THEN brv ELSE frv END AS purchase_value
    FROM m WHERE side = 1
    """,
)
def join_asof_nearest_purchase(spark, sf_dir):
    """As-of join, NEAREST direction: each click enriched with the
    closest purchase of the same user in either time direction (ties →
    backward, pandas merge_asof semantics). Both candidates come from
    one union + one sort — a running `last` and a following-frame
    `first` over the same shuffle — so nearest costs exactly what the
    one-sided as-of joins cost. Fuzzed against pandas merge_asof in
    tests/test_property_model.py; see operators/joins.asof_join."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_ms"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id",
        F.col("ts_ms").alias("pts"), F.col("value").alias("pv"),
    )
    out = asof_join(
        clicks, purchases, on="user_id",
        left_time="ts_ms", right_time="pts",
        right_payload=["pts", "pv"], direction="nearest", order_col="event_id",
    )
    return out.select(
        "user_id", "event_id", "ts_ms",
        F.col("pts_right").alias("purchase_ts"),
        F.col("pv_right").alias("purchase_value"),
    )


# ===========================================================================
# TPC-H Q16 shape (distinct-supplier counts with NOT IN exclusion)
# ===========================================================================

@query(
    "tpch_q16_supplier_cnt",
    """
    SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'ECONOMY'
      AND p.p_size IN (5, 11, 17, 23, 29, 35, 41, 47)
      AND s.s_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_size
    """,
)
def tpch_q16_supplier_cnt(spark, sf_dir):
    """Q16 shape (parts-supplier relationship counting): filtered part
    dim broadcast into the fact, NOT IN exclusion set as a broadcast
    anti-join (testdata has no s_comment, so the excluded set is
    negative-balance suppliers), then COUNT(DISTINCT supplier) per
    (brand, size) — a two-level aggregation Spark plans as partial
    distinct then merge, no row explosion."""
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(5, 11, 17, 23, 29, 35, 41, 47)
    )
    s = table(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(bad), "s_suppkey", "left_anti")
        .groupBy("p_brand", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("s_suppkey").cast("long").alias("supplier_cnt"))
    )


# ===========================================================================
# Table profiling (ANALYZE-style column statistics, one pass)
# ===========================================================================

@query(
    "profile_lineitem_stats",
    """
    SELECT CAST(COUNT(*) AS BIGINT)                        AS n_rows,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)      AS ndv_orderkey,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT)       AS ndv_partkey,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)       AS ndv_suppkey,
           CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT)    AS nulls_quantity,
           MIN(l_quantity)                                 AS min_qty,
           MAX(l_quantity)                                 AS max_qty,
           MIN(l_extendedprice)                            AS min_price,
           MAX(l_extendedprice)                            AS max_price,
           CAST(MIN(epoch_ns(l_shipdate)//1000000) AS BIGINT) AS min_ship_ms,
           CAST(MAX(epoch_ns(l_shipdate)//1000000) AS BIGINT) AS max_ship_ms,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    """,
)
def profile_lineitem_stats(spark, sf_dir):
    """ANALYZE-style table profile in ONE pass: row count, per-column
    distinct counts, null counts, min/max ranges and a checksum-grade
    decimal sum — the statistics a cost-based planner (or a data-quality
    gate) collects before planning 100 TB scans. Multiple COUNT(DISTINCT)
    in one aggregate: Spark expands to a single multi-distinct plan, no
    extra table scans."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("l_orderkey").cast("long").alias("ndv_orderkey"),
        F.count_distinct("l_partkey").cast("long").alias("ndv_partkey"),
        F.count_distinct("l_suppkey").cast("long").alias("ndv_suppkey"),
        (F.count(F.lit(1)) - F.count("l_quantity")).cast("long")
            .alias("nulls_quantity"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.unix_millis(F.min("l_shipdate").cast("timestamp")).alias("min_ship_ms"),
        F.unix_millis(F.max("l_shipdate").cast("timestamp")).alias("max_ship_ms"),
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
            .alias("sum_qty"),
    )


# ===========================================================================
# Date / calendar function pack
# ===========================================================================

@query(
    "scalar_date_pack",
    """
    SELECT event_id,
           CAST(weekofyear(ts) AS BIGINT)                  AS iso_week,
           CAST(isodow(ts) AS BIGINT)                      AS iso_dow,
           CAST(dayofyear(ts) AS BIGINT)                   AS doy,
           CAST(quarter(ts) AS BIGINT)                     AS q,
           last_day(CAST(ts AS DATE))                      AS month_end,
           epoch_ns(CAST(date_trunc('week', ts) AS TIMESTAMP)) // 1000000
             AS week_start_ms,
           CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2mo,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                AS BIGINT)                                 AS days_since_ny
    FROM events
    """,
)
def scalar_date_pack(spark, sf_dir):
    """Calendar function coverage: ISO week / ISO day-of-week (Spark's
    ``weekday`` is 0-Monday, the oracle's ``isodow`` 1-Monday — one
    +1 normalizes), day-of-year, quarter, month-end, Monday-anchored
    week truncation, month arithmetic, and day differences. Pure
    projection; every function is JVM-side date math on the session's
    UTC zone, so both engines see identical civil dates."""
    ev = table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    return ev.select(
        "event_id",
        F.weekofyear("ts").cast("long").alias("iso_week"),
        (F.weekday("ts") + 1).cast("long").alias("iso_dow"),
        F.dayofyear("ts").cast("long").alias("doy"),
        F.quarter("ts").cast("long").alias("q"),
        F.last_day(d).alias("month_end"),
        F.unix_millis(F.date_trunc("week", "ts")).alias("week_start_ms"),
        F.add_months(d, 2).alias("plus_2mo"),
        F.datediff(d, F.lit("2024-01-01").cast("date")).cast("long")
            .alias("days_since_ny"),
    )


# ===========================================================================
# Per-event session ASSIGNMENT (the row-level sibling of session_window)
# ===========================================================================

_SESS_GAP = 30 * 60 * 1000


@query(
    "session_assign_events",
    f"""
    WITH e AS (
      SELECT event_id, user_id, {MS} AS ts_ms FROM events
    ),
    f AS (
      SELECT *,
             row_number() OVER w AS rn,
             CASE WHEN lag(ts_ms) OVER w IS NULL
                    OR ts_ms - lag(ts_ms) OVER w > {_SESS_GAP}
                  THEN 1 ELSE 0 END AS nw,
             CASE WHEN lag(ts_ms) OVER w IS NULL
                    OR ts_ms - lag(ts_ms) OVER w > {_SESS_GAP}
                  THEN ts_ms END AS st,
             CASE WHEN lag(ts_ms) OVER w IS NULL
                    OR ts_ms - lag(ts_ms) OVER w > {_SESS_GAP}
                  THEN row_number() OVER w END AS srn
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
    ),
    g AS (
      SELECT event_id, user_id, ts_ms, rn,
             SUM(nw) OVER w2 AS session_seq,
             last_value(st IGNORE NULLS) OVER w2 AS session_start_ms,
             last_value(srn IGNORE NULLS) OVER w2 AS start_rn
      FROM f
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_ms, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, ts_ms,
           CAST(session_seq AS BIGINT) AS session_seq,
           session_start_ms,
           CAST(rn - start_rn + 1 AS BIGINT) AS event_index_in_session,
           ts_ms - session_start_ms AS ms_since_session_start
    FROM g
    """,
)
def session_assign_events(spark, sf_dir):
    """Per-EVENT session assignment — native ``session_window`` emits
    per-session aggregates; attribution pipelines need every event
    labeled with its session id, start, and ordinal instead. One window
    spec: the new-session flag's running sum numbers sessions, the
    session start rides a last-ignore-nulls carry, and the in-session
    ordinal is the global row_number MINUS the carried row_number at
    session start — no second shuffle on a derived (user, session) key.
    All integer ms arithmetic, hash-exact."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts_ms").over(w)
    is_new = prev.isNull() | (F.col("ts_ms") - prev > _SESS_GAP)
    rn = F.row_number().over(w)
    f = ev.select("event_id", "user_id", "ts_ms").select(
        "*",
        rn.alias("rn"),
        F.when(is_new, 1).otherwise(0).alias("nw"),
        F.when(is_new, F.col("ts_ms")).alias("st"),
        F.when(is_new, rn).alias("srn"),
    )
    g = f.select(
        "event_id", "user_id", "ts_ms", "rn",
        F.sum("nw").over(run).alias("session_seq"),
        F.last("st", ignorenulls=True).over(run).alias("session_start_ms"),
        F.last("srn", ignorenulls=True).over(run).alias("start_rn"),
    )
    return g.select(
        "event_id", "user_id", "ts_ms",
        F.col("session_seq").cast("long").alias("session_seq"),
        "session_start_ms",
        (F.col("rn") - F.col("start_rn") + 1).cast("long")
            .alias("event_index_in_session"),
        (F.col("ts_ms") - F.col("session_start_ms"))
            .alias("ms_since_session_start"),
    )


# ===========================================================================
# Statistical tests / fits (exact integer-moment formulations)
# ===========================================================================

@query(
    "stats_chisq_type_hod",
    f"""
    WITH e AS (
      SELECT event_type, ({MS} % {DAY}) // {HOUR} AS hod FROM events
    ),
    o AS (SELECT event_type, hod, COUNT(*) AS obs FROM e GROUP BY 1, 2),
    rt AS (SELECT event_type, COUNT(*) AS r FROM e GROUP BY 1),
    ct AS (SELECT hod, COUNT(*) AS c FROM e GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM e),
    terms AS (
      SELECT CAST(ROUND(
               (obs - CAST(r AS DOUBLE) * c / n)
               * (obs - CAST(r AS DOUBLE) * c / n)
               / (CAST(r AS DOUBLE) * c / n) * 1048576) AS DECIMAL(38,0))
               AS t
      FROM o JOIN rt USING (event_type) JOIN ct USING (hod), n
    )
    SELECT CAST(SUM(t) AS DOUBLE) / 1048576 AS chi2,
           CAST((SELECT COUNT(*) FROM rt) - 1 AS BIGINT)
             * ((SELECT COUNT(*) FROM ct) - 1) AS dof
    FROM terms
    """,
)
def stats_chisq_type_hod(spark, sf_dir):
    """Chi-square independence test: is event type independent of
    hour-of-day? Expected counts from broadcast row/column marginals;
    each (o-e)^2/e term is one fixed IEEE formula over identical
    doubles, snapped to 2^-20 integers so the cross-cell SUM is
    order-free — a STATISTICAL TEST that is still hash-exact. Two tiny
    marginal aggregations broadcast into the contingency table; the
    fact shuffles once for the observed counts."""
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "event_type", F.expr(f"(ts_ms % {DAY}) div {HOUR}").alias("hod")
    )
    o = e.groupBy("event_type", "hod").agg(F.count(F.lit(1)).alias("obs"))
    rt = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("r"))
    ct = e.groupBy("hod").agg(F.count(F.lit(1)).alias("c"))
    n = e.count()
    exp = F.col("r").cast("double") * F.col("c") / F.lit(n)
    term = F.round(
        (F.col("obs") - exp) * (F.col("obs") - exp) / exp * (1 << 20)
    ).cast("decimal(38,0)")
    n_types = rt.count()
    n_hods = ct.count()
    return (
        o.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "hod")
        .agg(
            (F.sum(term).cast("double") / (1 << 20)).alias("chi2"),
            F.lit((n_types - 1) * (n_hods - 1)).cast("long").alias("dof"),
        )
    )


@query(
    "ts_linear_trend",
    f"""
    WITH e AS (
      SELECT user_id,
             ({MS} - MIN({MS}) OVER (PARTITION BY user_id)) // 1000 AS x,
             CAST(ROUND(value * 100) AS BIGINT) AS y
      FROM events
    ),
    m AS (
      SELECT user_id,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy
      FROM e GROUP BY user_id
    )
    SELECT user_id,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_cents_per_s,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
             AS intercept_cents,
           CASE WHEN (n * syy - sy * sy) > 0
                THEN (n * sxy - sx * sy) * (n * sxy - sx * sy)
                     / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END AS r2
    FROM m
    """,
)
def ts_linear_trend(spark, sf_dir):
    """Per-series ordinary-least-squares trend line: slope, intercept
    and R^2 from the five moment sums — x is seconds since the series'
    first event (keeps x*x within exact-integer range), y in cents. All
    moments are exact DECIMAL integer sums, so the closed-form OLS
    doubles are bit-identical on both engines. One window (series min)
    + one aggregation, single shuffle."""
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.expr("(ts_ms - min(ts_ms) OVER (PARTITION BY user_id)) div 1000")
            .alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    dec = lambda c: F.sum(c.cast("decimal(38,0)")).cast("double")
    m = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dec(F.col("x")).alias("sx"),
        dec(F.col("y")).alias("sy"),
        dec(F.col("x") * F.col("x")).alias("sxx"),
        dec(F.col("y") * F.col("y")).alias("syy"),
        dec(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = [F.col(c) for c in ("n","sx","sy","sxx","syy","sxy")]
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "user_id",
        slope.alias("slope_cents_per_s"),
        ((sy - slope * sx) / n).alias("intercept_cents"),
        F.when(
            (n * syy - sy * sy) > 0,
            (n * sxy - sx * sy) * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
        ).alias("r2"),
    )


# ===========================================================================
# Ordered string aggregation (LISTAGG / string_agg)
# ===========================================================================

@query(
    "agg_string_concat",
    f"""
    WITH e AS (
      SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY {MS}, event_id) AS rn
      FROM events
    )
    SELECT user_id,
           string_agg(CASE WHEN rn <= 5 THEN substr(event_type, 1, 1) END,
                      '' ORDER BY rn) AS first5_type_initials,
           string_agg(CASE WHEN rn <= 3 THEN CAST(event_id AS VARCHAR) END,
                      ',' ORDER BY rn) AS first3_event_ids
    FROM e GROUP BY user_id
    """,
)
def agg_string_concat(spark, sf_dir):
    """Ordered string aggregation (LISTAGG): each user's first five
    event-type initials and first three event ids, concatenated in
    event order. Spark has no ordered string_agg — the portable
    formulation collects (rank, value) structs, array_sorts (struct
    order = rank order), and joins; the window rank and the aggregation
    share one shuffle."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    e = ev.select(
        "user_id", "event_type", "event_id",
        F.row_number().over(w).alias("rn"),
    )
    def ordered_concat(cond_col, sep):
        return F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(cond_col.isNotNull(),
                               F.struct(F.col("rn"), cond_col.alias("s")))
                    )
                ),
                lambda p: p["s"],
            ),
            sep,
        )
    initials = F.when(F.col("rn") <= 5, F.substring("event_type", 1, 1))
    ids = F.when(F.col("rn") <= 3, F.col("event_id").cast("string"))
    return e.groupBy("user_id").agg(
        ordered_concat(initials, "").alias("first5_type_initials"),
        ordered_concat(ids, ",").alias("first3_event_ids"),
    )


# ===========================================================================
# Exact sliding-window distinct counts (7-day trailing distinct users)
# ===========================================================================

@query(
    "window_7d_distinct_users",
    f"""
    WITH du AS (
      SELECT DISTINCT {MS} // {DAY} AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du),
    x AS (
      SELECT d.day, du.user_id
      FROM days d JOIN du ON du.day BETWEEN d.day - 6 AND d.day
    )
    SELECT day * {DAY} AS day_ms,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_7d
    FROM x GROUP BY day
    """,
)
def window_7d_distinct_users(spark, sf_dir):
    """Trailing 7-day DISTINCT-user counts per day — COUNT(DISTINCT)
    isn't a window function in any engine; the scalable exact shape
    collapses the fact to (day, user) pairs first (the only pass over
    the raw data), then range-joins the tiny per-day pair table to its
    trailing week and re-distincts. Work scales with distinct pairs x 7,
    never events x 7. The approximate path at extreme scale is a
    per-day KMV/HLL sketch union-merged over the window
    (sketch_kmv_set_algebra shows the merge algebra)."""
    ev = table(spark, sf_dir, "events")
    du = ev.select(
        F.expr(f"ts_ms div {DAY}").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    x = days.alias("d").join(
        du.alias("u"),
        (F.col("u.day") >= F.col("d.day") - 6)
        & (F.col("u.day") <= F.col("d.day")),
    )
    return x.groupBy(F.col("d.day").alias("day")).agg(
        F.count_distinct("user_id").cast("long").alias("users_7d")
    ).select((F.col("day") * DAY).alias("day_ms"), "users_7d")


# ===========================================================================
# Nested types: array<struct> assembly / manipulation / serialization
# ===========================================================================

@query(
    "nested_struct_pack",
    f"""
    WITH e AS (
      SELECT user_id, {MS} AS t, CAST(ROUND(value * 100) AS BIGINT) AS vc,
             event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY {MS} DESC, event_id DESC) AS rrn
      FROM events
    ),
    g AS (
      SELECT user_id,
             list_sort(list({{'t': t, 'vc': vc}})) AS recent
      FROM e WHERE rrn <= 3 GROUP BY user_id
    )
    SELECT user_id,
           to_json(recent) AS recent_json,
           CAST(len(recent) AS BIGINT) AS n_recent,
           recent[1].t AS oldest_t,
           CAST(list_sum(list_transform(recent, s -> s.vc)) AS BIGINT)
             AS sum_vc,
           CAST(len(list_filter(recent, s -> s.vc > 5000)) AS BIGINT)
             AS n_over_50
    FROM g
    """,
)
def nested_struct_pack(spark, sf_dir):
    """Nested-type surface: assemble each user's three most recent
    events into a sorted ARRAY<STRUCT>, then element access, lambda
    sum/filter over struct fields, and byte-identical JSON
    serialization (integer fields only — both engines print shortest-
    round-trip doubles, but integers remove the one formatting risk).
    The struct array is the canonical "document assembly" step before
    feeding nested training records to a tokenizer at scale; one window
    + one aggregation, single shuffle."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_ms").desc(), F.col("event_id").desc()
    )
    e = ev.select(
        "user_id",
        F.col("ts_ms").alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
        F.row_number().over(w).alias("rrn"),
    ).filter(F.col("rrn") <= 3)
    g = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("t"), F.col("vc")))
        ).alias("recent")
    )
    return g.select(
        "user_id",
        F.to_json("recent").alias("recent_json"),
        F.size("recent").cast("long").alias("n_recent"),
        F.element_at("recent", 1)["t"].alias("oldest_t"),
        F.aggregate(
            F.transform("recent", lambda s: s["vc"]),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_vc"),
        F.size(F.filter("recent", lambda s: s["vc"] > 5000)).cast("long")
            .alias("n_over_50"),
    )


# ===========================================================================
# Robust anomaly detection (median / MAD) + event-sequence pattern match
# ===========================================================================

_MAD_SCALE = 4.4478  # 3 sigma * 1.4826 (normal-consistency constant)


@query(
    "ts_mad_anomaly",
    f"""
    WITH e AS (
      SELECT event_id, event_type, value FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM e
    ),
    med AS (
      SELECT event_type, value AS med FROM r
      WHERE rn = GREATEST(CAST(ceil(0.5 * n) AS BIGINT), 1)
    ),
    d AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS dev
      FROM e JOIN med m USING (event_type)
    ),
    r2 AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev) AS rn2,
             COUNT(*) OVER (PARTITION BY event_type) AS n2
      FROM d
    ),
    mad AS (
      SELECT event_type, dev AS mad FROM r2
      WHERE rn2 = GREATEST(CAST(ceil(0.5 * n2) AS BIGINT), 1)
    )
    SELECT d.event_id, d.event_type, d.value, d.med, m.mad,
           d.dev > m.mad * {_MAD_SCALE} AS is_anomaly
    FROM d JOIN mad m USING (event_type)
    """,
)
def ts_mad_anomaly(spark, sf_dir):
    """Robust outlier flags via median / MAD (median absolute deviation)
    — the breakdown-resistant alternative to the mean/stddev z-score
    (ts_anomaly_zscore): a few extreme values shift a mean-based
    threshold but leave the median untouched. Flags |v - med| >
    3·1.4826·MAD (the normal-consistency scaling). Medians are DISCRETE
    (the element at ceil(n/2) of the sorted values — an actual datum),
    so every derived number is bit-identical across engines with no
    interpolation rounding.

    Scale (optimization r12, VERDICT r11 #5): the r11 shape computed
    both medians as whole-partition windows over ``event_type`` — a
    handful of keys, so ONE task sorted each event type's entire
    partition twice regardless of cluster size (the §2.5 cliff). The
    exact discrete medians now route through
    :func:`operators.distributed_rank.grouped_discrete_median`, which
    is SIZE-ADAPTIVE: above the smallInputBytes gate it runs per-group
    range buckets → (event_type, bucket)-partitioned local ranks →
    window prefix over the tiny counts table (parallelism = groups x
    n_buckets tasks, no whole-group sort anywhere); at bench/test
    sizes it keeps the single-exchange window shape, which is strictly
    cheaper there (measured r12: the bucketed shape pays 3.5 s / 23
    jobs vs 0.74 s / 2 jobs on sf0.1). Either way the 5-row median
    tables broadcast back onto the events."""
    from uts_spark.operators.distributed_rank import (
        GROUPED_MEDIAN_SMALL_BYTES,
        _GROUPED_MEDIAN_SMALL_DEFAULT,
        _plan_size_bytes,
        grouped_discrete_median,
    )

    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ev = ev.select("event_id", "event_type", "value")

    # gate BOTH median passes on the fact scan's estimate: d below has
    # exactly ev's row count, but Catalyst's post-join size estimate is
    # garbage without column stats (operator docstring), so the verdict
    # is computed once here, where the estimate is scan-rooted
    small = _plan_size_bytes(ev) <= int(
        spark.conf.get(
            GROUPED_MEDIAN_SMALL_BYTES, _GROUPED_MEDIAN_SMALL_DEFAULT
        )
    )
    if small:
        # the r11 fused-window shape, kept verbatim for small inputs —
        # it is strictly cheaper there (ONE events scan, ONE exchange,
        # zero joins: both medians attach via max(CASE rn = target)
        # over the same partition; measured r12 sf0.1: 0.74 s / 2 jobs
        # vs 1.21 s / 5 jobs for the operator's small path and
        # 3.5 s / 23 jobs for the bucketed draft)
        wn = Window.partitionBy("event_type")
        wv = Window.partitionBy("event_type").orderBy("value")
        wd = Window.partitionBy("event_type").orderBy("dev")
        r = ev.select(
            "event_id", "event_type", "value",
            F.row_number().over(wv).alias("__rn"),
            F.count(F.lit(1)).over(wn).alias("__n"),
        )
        target = F.greatest(F.ceil(F.lit(0.5) * F.col("__n")), F.lit(1))
        d = r.withColumn(
            "med",
            F.max(F.when(F.col("__rn") == target, F.col("value"))).over(wn),
        ).withColumn("dev", F.abs(F.col("value") - F.col("med")))
        out = d.withColumn("__rn2", F.row_number().over(wd)).withColumn(
            "mad",
            F.max(F.when(F.col("__rn2") == target, F.col("dev"))).over(wn),
        )
        return out.select(
            "event_id",
            "event_type",
            "value",
            "med",
            "mad",
            (F.col("dev") > F.col("mad") * F.lit(_MAD_SCALE)).alias(
                "is_anomaly"
            ),
        )

    med = grouped_discrete_median(
        ev, ["event_type"], "value", out="med", small=False
    )
    d = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = grouped_discrete_median(
        d, ["event_type"], "dev", out="mad", small=False
    )
    return d.join(F.broadcast(mad), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        "mad",
        (F.col("dev") > F.col("mad") * F.lit(_MAD_SCALE)).alias(
            "is_anomaly"
        ),
    )


@query(
    "events_pattern_match",
    f"""
    WITH s AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY {MS}, event_id)
               AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(seq, 's[cv]*p')) AS BIGINT)
             AS n_conversions,
           len(regexp_extract_all(seq, 's[cv]*p')) > 0 AS converted
    FROM s
    """,
)
def events_pattern_match(spark, sf_dir):
    """Complex-event-processing pattern match (MATCH_RECOGNIZE-style):
    each user's event history becomes a code string (one char per event,
    time-ordered with event_id tie-break) and a regex finds conversion
    motifs — here ``s[cv]*p``: a signup followed by only clicks/views
    and then a purchase, counted non-overlapping left-to-right. The
    reference has no sequence operators at all; this is how event-
    pattern queries (funnels with exclusion constraints, abandonment
    motifs) express declaratively on Spark.

    Scale: one shuffle on user_id; per-user sequences build via
    array_sort(collect_list(struct)) — bounded by per-user event counts
    (sessions, not the corpus). The regex scan is linear per user and
    runs JVM-side."""
    ev = table(spark, sf_dir, "events")
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("ts_ms").alias("t"),
                                F.col("event_id").alias("i"),
                                F.substring("event_type", 1, 1).alias("c"),
                            )
                        )
                    ),
                    lambda s: s["c"],
                ),
                "",
            ).alias("seq")
        )
    )
    n_conv = F.regexp_count(F.col("seq"), F.lit("s[cv]*p"))
    return seq.select(
        "user_id",
        F.length("seq").cast("long").alias("seq_len"),
        n_conv.cast("long").alias("n_conversions"),
        (n_conv > 0).alias("converted"),
    )


@query(
    "weighted_median_price",
    """
    WITH l AS (
      SELECT l_returnflag, l_extendedprice AS v,
             CAST(l_quantity AS DOUBLE) AS w,
             l_orderkey * 10 + l_linenumber AS tb
      FROM lineitem
    ),
    r AS (
      SELECT *,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v, tb
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM l
    ),
    m AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                   ORDER BY v, tb) AS rn
      FROM r WHERE cw * 2 >= tw
    )
    SELECT l_returnflag, v AS weighted_median,
           CAST(tw AS DOUBLE) AS total_weight
    FROM m WHERE rn = 1
    """,
)
def weighted_median_price(spark, sf_dir):
    """Exact weighted median: the smallest value whose cumulative weight
    reaches half the group total (lineitem price weighted by quantity,
    per returnflag). Quantities are integral so the cumulative sums are
    exact doubles; the 2·cw >= tw comparison avoids any division. The
    picked value is an actual datum (discrete), deterministic under the
    (value, line-id) tie-break.

    Scale: one shuffle on the group key, then a single in-partition
    running sum — the same plan as any cumulative window; no second
    pass, no interpolation. The weighted generalization of
    percentile_disc (quantity-weighted medians are how price indices
    and sampling-weight corrections are computed over fact tables)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("double").alias("w"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("tb"),
    )
    word = Window.partitionBy("l_returnflag").orderBy("v", "tb")
    r = li.select(
        "l_returnflag",
        "v",
        F.sum("w").over(word.rowsBetween(Window.unboundedPreceding, 0)).alias("cw"),
        F.sum("w").over(Window.partitionBy("l_returnflag")).alias("tw"),
        "tb",
    )
    m = r.filter(F.col("cw") * 2 >= F.col("tw")).withColumn(
        "rn", F.row_number().over(word)
    )
    return m.filter(F.col("rn") == 1).select(
        "l_returnflag",
        F.col("v").alias("weighted_median"),
        F.col("tw").cast("double").alias("total_weight"),
    )


@query(
    "tpch_q21_like_sole_late",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT l1.l_suppkey AS suppkey, COUNT(DISTINCT l1.l_orderkey) AS numwait
    FROM late l1
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY l1.l_suppkey
    ORDER BY numwait DESC, suppkey
    LIMIT 10
    """,
)
def tpch_q21_like_sole_late(spark, sf_dir):
    """Q21 shape (waiting-orders): suppliers who were the SOLE late
    shipper (> 90 days after order date) on multi-supplier orders. The
    correlated EXISTS + NOT-EXISTS pair decorrelates into one per-order
    aggregation — counting distinct suppliers and distinct LATE
    suppliers per order — replacing two repeated correlated probes of
    the fact table with one grouped pass and a broadcastable per-order
    summary. (The canonical Q21 uses l_receiptdate/l_commitdate, absent
    from this generator; shipdate-vs-orderdate lateness keeps the join
    machinery identical.)

    Scale: lineitem shuffles once on orderkey for the per-order
    summary; the late rows join that summary on the same key (AQE
    reuses the co-partitioning); top-10 via the k-heap."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .select("l_orderkey", "l_suppkey")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supps")
    )
    late_per_order = late.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_late_supps")
    )
    return (
        late.join(per_order, "l_orderkey")
        .join(late_per_order, "l_orderkey")
        .filter((F.col("n_supps") >= 2) & (F.col("n_late_supps") == 1))
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count_distinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("suppkey"))
        .limit(10)
    )


@query(
    "window_share_pack",
    f"""
    WITH rev AS (
      SELECT n.n_name AS nation, r.r_name AS region,
             {DSUM('c.c_acctbal')} AS bal
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name, r.r_name
    )
    SELECT nation, region, bal,
           bal / CAST(SUM(CAST(bal AS DECIMAL(38,6)))
                      OVER (PARTITION BY region) AS DOUBLE) AS share_in_region,
           bal / CAST(SUM(CAST(bal AS DECIMAL(38,6)))
                      OVER () AS DOUBLE)                    AS share_global,
           bal - LAG(bal) OVER (PARTITION BY region
                                ORDER BY bal DESC, nation)  AS gap_to_prev,
           CAST(RANK() OVER (PARTITION BY region
                             ORDER BY bal DESC, nation) AS BIGINT) AS rnk
    FROM rev
    """,
)
def window_share_pack(spark, sf_dir):
    """Ratio-to-report analytics: each nation's customer-balance share
    within its region and globally, the gap to the next-richer nation,
    and the in-region rank — the share/contribution window family
    (RATIO_TO_REPORT in warehouse dialects) over a grouped aggregate.
    The decimal-exact group sums make every derived ratio bit-stable.

    Scale: the grouped aggregate shuffles once; the per-region window
    passes are hash-partitioned. The GLOBAL share divides by a
    broadcast 1-row decimal total (the stats_ks pattern) instead of an
    unpartitioned window — zero single-partition exchanges since
    round 4."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    rev = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(_lsum(F.col("c_acctbal")).alias("bal"))
    )
    gtot = rev.agg(F.sum(F.col("bal").cast(DEC)).alias("__gtot"))
    wreg = Window.partitionBy("region")
    worder = Window.partitionBy("region").orderBy(F.desc("bal"), F.asc("nation"))
    return rev.crossJoin(F.broadcast(gtot)).select(
        "nation",
        "region",
        "bal",
        (F.col("bal") / F.sum(F.col("bal").cast(DEC)).over(wreg).cast("double")).alias("share_in_region"),
        (F.col("bal") / F.col("__gtot").cast("double")).alias("share_global"),
        (F.col("bal") - F.lag("bal").over(worder)).alias("gap_to_prev"),
        F.rank().over(worder).cast("long").alias("rnk"),
    )


_CDC_CUT = 1706140800000  # NOW_MS - 7 days: snapshot/changelog boundary


@query(
    "cdc_merge_upserts",
    f"""
    WITH ev AS (
      SELECT user_id, {MS} AS t, event_id, value,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      FROM events
    ),
    base AS (
      SELECT user_id, value AS base_value
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY t DESC, event_id DESC) AS rn
            FROM ev WHERE t < {_CDC_CUT})
      WHERE rn = 1 AND op = 'U'
    ),
    delta AS (
      SELECT user_id, op AS last_op, value AS delta_value
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY t DESC, event_id DESC) AS rn
            FROM ev WHERE t >= {_CDC_CUT})
      WHERE rn = 1
    )
    SELECT COALESCE(b.user_id, d.user_id) AS user_id,
           CASE WHEN d.user_id IS NOT NULL THEN d.delta_value
                ELSE b.base_value END AS value,
           CASE WHEN d.user_id IS NULL THEN 'base'
                WHEN b.user_id IS NULL THEN 'insert' ELSE 'update' END AS src
    FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id
    WHERE NOT (d.user_id IS NOT NULL AND d.last_op = 'D')
    """,
)
def cdc_merge_upserts(spark, sf_dir):
    """Change-data-capture merge (MERGE INTO semantics in plain
    DataFrame ops): a base snapshot (each user's last upserted value
    before the cutoff) receives a changelog of upserts/deletes (events
    after the cutoff; 'error' events act as deletes). Last-writer-wins
    per key with the (time, event_id) order; a trailing delete removes
    the key entirely; untouched keys pass through — exactly the apply
    step of every warehouse CDC pipeline, labeled with base / update /
    insert provenance.

    Scale: both sides collapse to one row per key via max_by(struct)
    aggregations (no window sort), then a single co-partitioned
    full-outer shuffle join on the key. Deletes never materialize as
    tombstone rows in the result."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts_ms").alias("t"),
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    ordk = F.struct(F.col("t"), F.col("event_id"))
    last = F.struct(F.col("op"), F.col("value"))
    base = (
        ev.filter(F.col("t") < _CDC_CUT)
        .groupBy("user_id")
        .agg(F.max_by(last, ordk).alias("l"))
        .filter(F.col("l.op") == "U")
        .select("user_id", F.col("l.value").alias("base_value"))
    )
    delta = (
        ev.filter(F.col("t") >= _CDC_CUT)
        .groupBy("user_id")
        .agg(F.max_by(last, ordk).alias("l"))
        .select(
            "user_id",
            F.col("l.op").alias("last_op"),
            F.col("l.value").alias("delta_value"),
        )
    )
    b, d = base.alias("b"), delta.alias("d")
    merged = b.join(d, F.col("b.user_id") == F.col("d.user_id"), "full_outer")
    return merged.filter(
        ~(F.col("d.user_id").isNotNull() & (F.col("last_op") == "D"))
    ).select(
        F.coalesce(F.col("b.user_id"), F.col("d.user_id")).alias("user_id"),
        F.when(F.col("d.user_id").isNotNull(), F.col("delta_value"))
        .otherwise(F.col("base_value"))
        .alias("value"),
        F.when(F.col("d.user_id").isNull(), F.lit("base"))
        .when(F.col("b.user_id").isNull(), F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("src"),
    )


# --- Change data feed on the versioned snapshot table (round 9c) ------------
# sources/versioned.table_changes: the Delta-CDF shape. Two lanes, one per
# physical strategy the manifests select — the append-only dir-diff (scan
# of the added dirs, no join) and the key-diff full-outer join across a
# rewrite. State below is deterministic slices of `documents`:
#   base    = doc_id % 10 != 7              (v0)
#   appends = doc_id % 10 == 7              (append lane's v1 / rewrite v1)
#   updates = doc_id % 10 == 2 -> 'U:'+val  (rewrite lane's v1)
#   deletes = doc_id % 10 == 4              (rewrite lane's v2)

def _cdc_vt_ensure(spark, sf_dir, rewrite: bool) -> str:
    """Build (or reuse) the lane's versioned table; returns its path.
    Rebuild-from-scratch when the on-disk chain doesn't match the
    expected (fingerprint, version-count) — same idempotency pattern
    as the index lanes, cheap at gate SFs."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.versioned import (
        append_snapshot,
        delete_rows,
        list_versions,
        merge_upsert,
        write_snapshot,
    )

    docs = table(spark, sf_dir, "documents")
    val = F.substring(F.col("text"), 1, 40).alias("val")
    base = docs.filter(F.col("doc_id") % 10 != 7).select("doc_id", val)
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    kind = "rw" if rewrite else "ap"
    path = os.path.join(_warehouse_dir(), f"cdc_vt_{tag}_{kind}")
    want = 3 if rewrite else 2
    fp = f"cdc_vt_{kind}_v1"

    ms = list_versions(path)
    ok = len(ms) == want and ms[0].get("fingerprint") == fp
    if ok:
        return path
    if os.path.exists(path):
        shutil.rmtree(path)
    write_snapshot(base, path, meta={"fingerprint": fp})
    if rewrite:
        updates = docs.filter(F.col("doc_id") % 10 == 2).select(
            "doc_id", F.concat(F.lit("U:"), F.substring("text", 1, 40)).alias("val")
        )
        inserts = docs.filter(F.col("doc_id") % 10 == 7).select("doc_id", val)
        merge_upsert(spark, path, updates.unionByName(inserts), "doc_id")
        delete_rows(
            spark, path,
            docs.filter(F.col("doc_id") % 10 == 4).select("doc_id"),
            "doc_id",
        )
    else:
        append_snapshot(
            docs.filter(F.col("doc_id") % 10 == 7).select("doc_id", val), path
        )
    return path


@query(
    "cdc_schema_evolution_read",
    """
    SELECT doc_id, substr(text, 1, 40) AS val, NULL AS lang
    FROM documents WHERE doc_id % 10 != 7
    UNION ALL
    SELECT doc_id, substr(text, 1, 40),
           CASE WHEN doc_id % 2 = 0 THEN 'en' ELSE 'de' END
    FROM documents WHERE doc_id % 10 = 7
    """,
)
def cdc_schema_evolution_read(spark, sf_dir):
    """SCHEMA EVOLUTION on the versioned table (round 9c): v1
    fast-appends the rem-7 slice carrying a NEW ``lang`` column; the
    commit records the widened schema + ``evolved`` flag, and reading
    the current version merges parquet footers so v0's rows surface
    ``lang = NULL`` — Iceberg/Delta add-column semantics with ZERO
    rewrite of existing files (the property that matters at 100 TB:
    adding a column to a petabyte table is a manifest edit, not a
    table-sized job). Time travel to v0 keeps the narrow schema, and
    appends that DROP columns or change types are refused loudly
    (tests/test_sinks.py). Oracle = the closed form of both slices
    with NULL back-fill."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.versioned import (
        append_snapshot,
        list_versions,
        read_version,
        write_snapshot,
    )

    docs = table(spark, sf_dir, "documents")
    val = F.substring(F.col("text"), 1, 40).alias("val")
    base = docs.filter(F.col("doc_id") % 10 != 7).select("doc_id", val)
    delta = docs.filter(F.col("doc_id") % 10 == 7).select(
        "doc_id", val,
        F.when(F.col("doc_id") % 2 == 0, F.lit("en"))
        .otherwise(F.lit("de"))
        .alias("lang"),
    )
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    path = os.path.join(_warehouse_dir(), f"cdc_vt_{tag}_evo")
    fp = "cdc_vt_evo_v1"
    ms = list_versions(path)
    if not (len(ms) == 2 and ms[0].get("fingerprint") == fp):
        if os.path.exists(path):
            shutil.rmtree(path)
        write_snapshot(base, path, meta={"fingerprint": fp})
        append_snapshot(delta, path)
    return read_version(spark, path)


@query(
    "cdc_table_changes_appendonly",
    """
    SELECT doc_id, substr(text, 1, 40) AS val, 'insert' AS _change_type
    FROM documents WHERE doc_id % 10 = 7
    """,
)
def cdc_table_changes_appendonly(spark, sf_dir):
    """CHANGE DATA FEED, append-only fast path: v1 fast-appended the
    rem-7 slice, so ``table_changes(v0 -> v1)`` sees v0's dir list as
    a subset of v1's and answers with a PLAIN SCAN of the added delta
    dirs — no join, no key, no read of the unchanged 90%. This is the
    incremental-consumer contract that makes a 100 TB lakehouse
    pipeline cheap: the manifest IS the change log, and a downstream
    job that last saw v0 pays delta-sized cost. The plan is pinned
    join-free in tests/test_sinks.py."""
    from uts_spark.sources.versioned import table_changes

    path = _cdc_vt_ensure(spark, sf_dir, rewrite=False)
    return table_changes(spark, path, 0, 1)


@query(
    "cdc_table_changes_rewrite",
    """
    SELECT doc_id, substr(text, 1, 40) AS val, 'insert' AS _change_type
    FROM documents WHERE doc_id % 10 = 7
    UNION ALL
    SELECT doc_id, substr(text, 1, 40), 'delete'
    FROM documents WHERE doc_id % 10 = 4
    UNION ALL
    SELECT doc_id, substr(text, 1, 40), 'update_preimage'
    FROM documents WHERE doc_id % 10 = 2
    UNION ALL
    SELECT doc_id, 'U:' || substr(text, 1, 40), 'update_postimage'
    FROM documents WHERE doc_id % 10 = 2
    """,
)
def cdc_table_changes_rewrite(spark, sf_dir):
    """CHANGE DATA FEED across rewrites: v1 MERGEd updates (rem-2 →
    'U:'-prefixed) plus inserts (rem-7), v2 deleted rem-4; diffing
    v0 -> v2 spans two copy-on-write commits, so the dir-diff cannot
    apply and ``table_changes`` runs its key-diff: one full-outer join
    of the two pinned versions on ``doc_id`` comparing a NULL-safe
    xxhash64 over the non-key columns — insert / delete /
    update_preimage / update_postimage, the Delta-CDF row convention.
    One shuffle on the key, bounded by the two versions' live rows
    (never the version chain's length). Oracle is the closed form of
    the three slices."""
    from uts_spark.sources.versioned import table_changes

    path = _cdc_vt_ensure(spark, sf_dir, rewrite=True)
    return table_changes(spark, path, 0, 2, key="doc_id")


@query(
    "cdc_pruned_erasure_read",
    """
    WITH o AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rn
      FROM documents
    ),
    n AS (SELECT COUNT(*) AS c FROM documents),
    t AS (SELECT
      (SELECT doc_id FROM o, n WHERE rn = c // 3) AS t1,
      (SELECT doc_id FROM o, n WHERE rn = 2 * (c // 3)) AS t2)
    SELECT d.doc_id, substr(d.text, 1, 40) AS val
    FROM documents d, t
    WHERE NOT (d.doc_id % 10 = 4
               AND d.doc_id >= t.t1 AND d.doc_id < t.t2)
    """,
)
def cdc_pruned_erasure_read(spark, sf_dir):
    """DIR-STATS-PRUNED ERASURE on the versioned DATA table (the
    snapshot indexes' erasure shape, now table-side): the table is
    built as an id-clustered APPEND CHAIN (three dirs, disjoint doc_id
    ranges, per-dir [min,max] + row counts recorded via stats_col);
    the GDPR slice lands entirely inside ONE dir's range, so
    delete_rows rewrites that dir alone and carries the other two into
    the new manifest BY REFERENCE — write amplification is
    (touched/all dirs), the property that makes routine compliance
    ticks affordable when dirs are GBs (measured table in SCALE.md
    round 9c, including the honest sandbox-scale caveat). The lane
    returns the post-erasure read; the oracle is the closed form of
    the survivors, so a leaked row in a carried dir or an over-deleted
    row in the rewritten dir is a hash mismatch. pruned_dirs=2 is
    pinned in tests/test_sinks.py."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.versioned import (
        append_snapshot,
        delete_rows,
        list_versions,
        read_version,
        write_snapshot,
    )

    docs = table(spark, sf_dir, "documents")
    val = F.substring(F.col("text"), 1, 40).alias("val")
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    path = os.path.join(_warehouse_dir(), f"cdc_vt_{tag}_prune")
    fp = "cdc_vt_prune_v1"

    ms = list_versions(path)
    done = len(ms) == 4 and ms[0].get("fingerprint") == fp
    if not done:
        if os.path.exists(path):
            shutil.rmtree(path)
        # range-cluster the chain on doc_id TERCILES (exact split, the
        # oracle computes the same two cut ids) — dirs get disjoint id
        # ranges, which is what makes the dir stats selective. Exact
        # global rank comes from the distributed range-partitioned
        # plan (never an unpartitioned window); a production ingest
        # gets this layout for free from id-ordered appends.
        ranked = ranked_cumsum(
            docs.select("doc_id"),
            bucket_key=F.col("doc_id"),
            order_by=[F.col("doc_id").asc()],
        ).select("doc_id", (F.col("__rank") - 1).alias("rn"))
        n = docs.count()
        cuts = {
            r["rn"]: r["doc_id"]
            for r in ranked.filter(
                F.col("rn").isin(n // 3, 2 * (n // 3))
            ).collect()
        }
        t1, t2 = cuts[n // 3], cuts[2 * (n // 3)]
        sel = docs.select("doc_id", val)
        write_snapshot(
            sel.filter(F.col("doc_id") < t1), path,
            meta={"fingerprint": fp}, stats_col="doc_id",
        )
        append_snapshot(
            sel.filter((F.col("doc_id") >= t1) & (F.col("doc_id") < t2)),
            path,
        )
        append_snapshot(sel.filter(F.col("doc_id") >= t2), path)
        # GDPR slice: rem-4 ids inside the MIDDLE tercile only — the
        # erasure's id range admits exactly one dir
        erase = docs.filter(
            (F.col("doc_id") % 10 == 4)
            & (F.col("doc_id") >= t1)
            & (F.col("doc_id") < t2)
        ).select("doc_id")
        delete_rows(spark, path, erase, "doc_id")
    return read_version(spark, path)


@query(
    "versioned_replicate_converges",
    """
    SELECT doc_id, substr(text, 1, 40) AS val
    FROM documents WHERE doc_id % 10 NOT IN (2, 4, 7)
    UNION ALL
    SELECT doc_id, 'U:' || substr(text, 1, 40)
    FROM documents WHERE doc_id % 10 = 2
    UNION ALL
    SELECT doc_id, substr(text, 1, 40)
    FROM documents WHERE doc_id % 10 = 7
    """,
)
def versioned_replicate_converges(spark, sf_dir):
    """INCREMENTAL REPLICATION (round 10): a replica table is advanced
    through the primary's whole history — seed at v0, then one
    change-feed tick per version (v1 is a MERGE rewrite, v2 an
    erasure; both ride the key-diff apply) — with the replication
    cursor committed on the replica's own manifests (idempotent,
    restart-safe: a replayed tick is a version no-op). The lane
    returns the replica's final read; the oracle is the PRIMARY's
    closed form, so replication converging to anything but the exact
    source state is a hash mismatch. The append fast path (manifest
    dir-diff, no key, no join — the replica advances by append) and
    the refusal rails (non-replica dst, wrong source, keyless rewrite
    range) are pinned in tests/test_sinks.py. Scale: each tick costs
    the FEED (append ranges: added-dirs scan; rewrite ranges: one
    two-version key join) + one replica commit — never re-reading
    histories; the DR verb a second region runs on a schedule."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.versioned import (
        list_versions,
        read_version,
        replicate,
    )

    src = _cdc_vt_ensure(spark, sf_dir, rewrite=True)
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    dst = os.path.join(_warehouse_dir(), f"repl_vt_{tag}")
    ms = list_versions(dst)
    ok = (
        len(ms) == 3
        and ms[-1].get("repl_cursor") == 2
        and ms[-1].get("repl_src") == src
    )
    if not ok:
        if os.path.exists(dst):
            shutil.rmtree(dst)
        replicate(spark, src, dst, up_to=0)
        replicate(spark, src, dst, key="doc_id", up_to=1)
        replicate(spark, src, dst, key="doc_id", up_to=2)
    return read_version(spark, dst)


def _bloom_vt_ensure(spark, sf_dir) -> str:
    """Build (or reuse) the hash-sliced bloom table: three dirs by
    doc_id % 3 (per-dir ranges all overlap — stats can't prune), both
    stats_col and bloom_col on doc_id, then the rem-4-of-30 erasure
    (confined to the % 3 == 1 slice). Shared by the erasure-read and
    point-lookup lanes."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.versioned import (
        append_snapshot,
        delete_rows,
        list_versions,
        write_snapshot,
    )

    docs = table(spark, sf_dir, "documents")
    val = F.substring(F.col("text"), 1, 40).alias("val")
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    path = os.path.join(_warehouse_dir(), f"cdc_vt_{tag}_bloom")
    fp = "cdc_vt_bloom_v1"

    ms = list_versions(path)
    done = len(ms) == 4 and ms[0].get("fingerprint") == fp
    if not done:
        if os.path.exists(path):
            shutil.rmtree(path)
        sel = docs.select("doc_id", val)
        write_snapshot(
            sel.filter(F.col("doc_id") % 3 == 0), path,
            meta={"fingerprint": fp},
            stats_col="doc_id", bloom_col="doc_id",
        )
        append_snapshot(sel.filter(F.col("doc_id") % 3 == 1), path)
        append_snapshot(sel.filter(F.col("doc_id") % 3 == 2), path)
        erase = docs.filter(F.col("doc_id") % 30 == 4).select("doc_id")
        delete_rows(spark, path, erase, "doc_id")
    return path


@query(
    "versioned_point_lookup_read",
    """
    SELECT doc_id, substr(text, 1, 40) AS val
    FROM documents WHERE doc_id % 30 = 7
    """,
)
def versioned_point_lookup_read(spark, sf_dir):
    """PRUNED POINT-LOOKUP (round 10) — the read twin of the bloom
    erasure and the GDPR right-of-ACCESS verb: a subject-access
    request is "read every row for these ids" against a table that is
    mostly not them. The request (``doc_id % 30 = 7``, hence
    ``% 3 = 1`` — all in the middle hash slice) runs through
    ``read_rows_for_ids``: per-dir stats ranges can't discriminate
    (hash-sliced dirs all span the keyspace) but the Bloom sidecars
    reject the other dirs by content, so the scan touches ~one dir +
    one semi-join on the request frame. The oracle is the requested
    rows' closed form — over-pruning (a dropped subject row: the
    no-false-negative contract) or under-filtering (a leaked foreign
    row) is a hash mismatch. Scale: request-batch-sized probe against
    broadcast bitmaps + admitted-dirs-sized scan; the table is never
    fully read."""
    from uts_spark.sources.versioned import read_rows_for_ids

    docs = table(spark, sf_dir, "documents")
    path = _bloom_vt_ensure(spark, sf_dir)
    req = docs.filter(F.col("doc_id") % 30 == 7).select("doc_id")
    return read_rows_for_ids(spark, path, req, "doc_id")


@query(
    "cdc_bloom_pruned_erasure_read",
    """
    SELECT doc_id, substr(text, 1, 40) AS val
    FROM documents WHERE doc_id % 30 != 4
    """,
)
def cdc_bloom_pruned_erasure_read(spark, sf_dir):
    """BLOOM-PRUNED ERASURE (round 10) — the pruning input for
    HASH-DISTRIBUTED takedown keys, where dir [min,max] stats are
    useless: the table is a three-dir append chain SLICED BY
    ``doc_id % 3`` (every dir's id range spans ~the whole keyspace, so
    range stats admit all three dirs — stats-only pruning degrades to
    a full rewrite, exactly what happens to a real table keyed by a
    hash id). Each dir carries a ``_BLOOM.json`` sidecar
    (``bloom_col='doc_id'``, portable two-lane md5, 16 bits/row); the
    GDPR batch (``doc_id % 30 = 4``, hence ``% 3 = 1``) lives entirely
    in the middle slice, and ``delete_rows`` consults the sidecars: the
    other two dirs' filters reject every deleted key, so they carry by
    reference and ONE dir rewrites — write amplification drops from
    3/3 to 1/3 with zero clustering requirement on the layout
    (pruned_dirs=2 pinned in tests/test_sinks.py; stats+bloom
    composition and the no-false-negative guarantee tested there too).
    The lane returns the post-erasure read; the oracle is the
    survivors' closed form, so a leaked row in a carried dir or an
    over-deleted row in the rewritten dir is a hash mismatch. Scale:
    the bloom build is one Arrow-batched delta-sized fold (one bitmap
    row per partition, OR-ed driver-side); the probe is one pass over
    the TAKEDOWN BATCH against broadcast bitmaps — never a table
    scan."""
    from uts_spark.sources.versioned import read_version

    path = _bloom_vt_ensure(spark, sf_dir)
    return read_version(spark, path)


@query(
    "cdc_incremental_apply_converges",
    """
    SELECT doc_id, substr(text, 1, 40) AS val
    FROM documents WHERE doc_id % 10 NOT IN (2, 4, 7)
    UNION ALL
    SELECT doc_id, 'U:' || substr(text, 1, 40)
    FROM documents WHERE doc_id % 10 = 2
    UNION ALL
    SELECT doc_id, substr(text, 1, 40)
    FROM documents WHERE doc_id % 10 = 7
    """,
)
def cdc_incremental_apply_converges(spark, sf_dir):
    """CDC COMPLETENESS: the change feed must be sufficient to
    reconstruct the table — an incremental consumer that starts from
    its v0 copy and applies ``table_changes(0 -> 2)`` (drop the keys
    of delete + update_preimage rows, add the insert +
    update_postimage rows) must land EXACTLY on v2. This is the
    contract every downstream materialization relies on at 100 TB:
    if apply(feed) != read(v2), the feed is decorative. The lane
    returns the CONSUMER's reconstruction; the oracle is v2's closed
    form — so a missed change type, a doubled row, or a pre/post
    mix-up is a hash mismatch, not a vibe. The apply is one left-anti
    join (copy minus removed keys) + a union — the same delta-sized
    shape as the feed itself."""
    from uts_spark.sources.versioned import read_version, table_changes

    path = _cdc_vt_ensure(spark, sf_dir, rewrite=True)
    copy_v0 = read_version(spark, path, 0)
    ch = table_changes(spark, path, 0, 2, key="doc_id")
    removed = ch.filter(
        F.col("_change_type").isin("delete", "update_preimage")
    ).select("doc_id")
    added = ch.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).drop("_change_type")
    return copy_v0.join(removed, "doc_id", "left_anti").unionByName(added)


@query(
    "versioned_wap_branch_publish",
    """
    SELECT 'branch_audit' AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents
    UNION ALL
    SELECT 'main_during_stage',
           CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id) AS BIGINT)
    FROM documents WHERE doc_id % 10 != 7
    UNION ALL
    SELECT 'main_published',
           CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id) AS BIGINT)
    FROM documents
    """,
)
def versioned_wap_branch_publish(spark, sf_dir):
    """WRITE-AUDIT-PUBLISH on the versioned table (VERDICT r9 #4 /
    ROADMAP r10 #1 — the Iceberg WAP pattern): a risky pipeline write
    (the rem-7 slice, staged in two commits) lands on a BRANCH — a
    second manifest chain over the same immutable dir pool, head
    advanced by the same hard-link CAS as version commits — while
    main's readers keep the fork state untouched; ``read_branch``
    gives the audit full query access to the staged rows; and
    ``merge_branch`` publishes the staged appends as ONE main commit
    (dir-list union — appends commute, so a concurrent main append
    just retries the CAS; a main REWRITE since the fork refuses the
    publish loudly, pinned in tests/test_sinks.py along with
    fast-forward-only overwrite branches, the head CAS race, branch
    schema evolution, and vacuum's branch-retention promise). The
    lane reads all three WAP states and returns their exact
    (count, id-sum) accounting; the oracle is the closed form of the
    two doc slices. Scale: fork is O(1) manifest work, staging costs
    delta dirs only, publish is one manifest commit — nothing is
    table-sized."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.versioned import (
        create_branch,
        merge_branch,
        read_branch,
        read_version,
        write_snapshot,
        write_to_branch,
    )

    docs = table(spark, sf_dir, "documents")
    val = F.substring(F.col("text"), 1, 40).alias("val")
    base = docs.filter(F.col("doc_id") % 10 != 7).select("doc_id", val)
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    path = os.path.join(_warehouse_dir(), f"wap_vt_{tag}")
    # the WAP protocol is the lane's subject — rebuild from scratch so
    # every run exercises fork -> stage -> audit -> publish end to end
    if os.path.exists(path):
        shutil.rmtree(path)
    write_snapshot(base, path)
    create_branch(path, "staging")
    write_to_branch(
        docs.filter(F.col("doc_id") % 20 == 7).select("doc_id", val),
        path, "staging",
    )
    write_to_branch(
        docs.filter(F.col("doc_id") % 20 == 17).select("doc_id", val),
        path, "staging",
    )

    def acct(df, stage):
        return df.agg(
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )

    audit = acct(read_branch(spark, path, "staging"), "branch_audit")
    during = acct(read_version(spark, path), "main_during_stage")
    ver = merge_branch(spark, path, "staging")
    published = acct(read_version(spark, path, ver), "main_published")
    return audit.unionByName(during).unionByName(published)


@query(
    "versioned_dv_mor_erasure",
    """
    WITH base AS (
      SELECT doc_id, substr(text, 1, 20) AS val
      FROM documents WHERE doc_id % 10 <= 6
    ),
    after1 AS (
      SELECT * FROM base WHERE doc_id % 100 NOT IN (3, 14, 25)
    ),
    appended AS (
      SELECT doc_id, substr(text, 1, 20) AS val
      FROM documents WHERE doc_id % 10 = 7
      UNION ALL
      SELECT doc_id, 'R' AS val
      FROM documents WHERE doc_id % 100 = 3
    ),
    visible AS (
      SELECT * FROM (
        SELECT * FROM after1 UNION ALL SELECT * FROM appended
      ) WHERE doc_id % 100 NOT IN (25, 47)
    ),
    acct AS (
      SELECT doc_id % 10 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(doc_id) AS BIGINT) AS id_sum,
             CAST(SUM(CASE WHEN val = 'R' THEN 1 ELSE 0 END) AS BIGINT)
               AS reinserted
      FROM visible GROUP BY doc_id % 10
    )
    SELECT 'mor' AS stage, * FROM acct
    UNION ALL
    SELECT 'materialized' AS stage, * FROM acct
    """,
)
def versioned_dv_mor_erasure(spark, sf_dir):
    """DELETION VECTORS — merge-on-read erasure on the versioned table
    (round 10; the Delta-DV / Iceberg-equality-delete economics):
    delete_rows (even Bloom-pruned) pays a dir rewrite per takedown
    batch; delete_rows_mor commits the deleted KEYS as a tiny sidecar
    and every reader applies them as a scoped broadcast anti-join, so
    a takedown costs kilobytes NOW and the rewrite happens ONCE at
    materialize_dvs, amortized over every takedown since the last
    fold (measured write-amplification curves in tools/dv_smoke.py /
    SCALE.md round 10). The lane drives the whole protocol on the
    documents table: two data commits, a first vector spanning both
    dirs, an APPEND THAT RE-USES ERASED KEYS (vector scope = dirs at
    its commit, so the re-inserted rows must stay visible — the
    semantics that separates key-scoped vectors from a global
    anti-join), a second vector reaching into the appended dir, then
    reads the SAME accounting at both physical states — vectors
    outstanding ('mor') and after materialize_dvs ('materialized').
    The oracle is the closed form of the slice algebra, duplicated
    per stage: a reader that ignored a vector, leaked a masked row,
    hid a re-inserted key, or changed content while materializing
    hashes differently. Time travel, CDF across vectors, CoW/branch/
    replication interop, vacuum liveness, and the measured
    maybe_materialize_dvs trigger are pinned in tests/test_sinks.py.
    Scale: the vector commit is O(keys); the accounting scan is
    stats-pruned to admitting dirs; materialize rewrites only dirs a
    vector's keys admit — nothing here is table-sized except the
    final reads the lane itself returns. (Dir-stats pruning only here —
    the Bloom-sidecar variant of _admitting_dirs has its own lane and
    a measured build tax that belongs there.)"""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.versioned import (
        append_snapshot,
        delete_rows_mor,
        list_versions,
        materialize_dvs,
        read_version,
        write_snapshot,
    )

    docs = table(spark, sf_dir, "documents")
    val = F.substring(F.col("text"), 1, 20).alias("val")
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    path = os.path.join(_warehouse_dir(), f"dv_vt_{tag}")
    # the MOR protocol is the lane's subject — rebuild from scratch so
    # every run exercises commit -> mask -> re-append -> materialize
    if os.path.exists(path):
        shutil.rmtree(path)
    # stats_col only: dir-range pruning drives the vector counts and
    # the materialize; Bloom sidecars are the same _admitting_dirs
    # input (their own lane: cdc_bloom_pruned_erasure_read) and their
    # build cost would triple this lane's wall for no new coverage
    write_snapshot(
        docs.filter(F.col("doc_id") % 10 <= 3).select("doc_id", val),
        path, stats_col="doc_id",
    )
    append_snapshot(
        docs.filter(
            (F.col("doc_id") % 10 >= 4) & (F.col("doc_id") % 10 <= 6)
        ).select("doc_id", val),
        path,
    )
    kill1 = docs.filter(
        (F.col("doc_id") % 100).isin(3, 14, 25)
    ).select("doc_id")
    delete_rows_mor(spark, path, kill1, "doc_id")
    append_snapshot(
        docs.filter(F.col("doc_id") % 10 == 7).select("doc_id", val)
        .unionByName(
            docs.filter(F.col("doc_id") % 100 == 3).select(
                "doc_id", F.lit("R").alias("val")
            )
        ),
        path,
    )
    kill2 = docs.filter(
        (F.col("doc_id") % 100).isin(25, 47)
    ).select("doc_id")
    delete_rows_mor(spark, path, kill2, "doc_id")
    pm = list_versions(path)[-1]
    assert len(pm.get("dv", [])) == 2, "expected two outstanding vectors"

    def acct(df, stage):
        return df.groupBy(
            (F.col("doc_id") % 10).alias("bucket")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.sum(
                F.when(F.col("val") == "R", 1).otherwise(0)
            ).cast("long").alias("reinserted"),
        ).select(F.lit(stage).alias("stage"), "*")

    mor = acct(read_version(spark, path), "mor")
    materialize_dvs(spark, path)
    assert not list_versions(path)[-1].get("dv")
    mat = acct(read_version(spark, path), "materialized")
    return mor.unionByName(mat)


@query(
    "versioned_pdv_positional_erasure",
    f"""
    WITH base AS (
      SELECT doc_id % 7 AS grp, substr(text, 1, 16) AS val
      FROM documents
    ),
    survivors AS (
      SELECT * FROM base
      WHERE grp != 3 AND substr(val, 1, 1) != 'a'
    ),
    appended AS (
      SELECT doc_id % 7 AS grp, 'R' AS val
      FROM documents WHERE doc_id % 7 = 3 AND doc_id % 3 = 0
    ),
    visible AS (
      SELECT * FROM survivors UNION ALL SELECT * FROM appended
    ),
    acct AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM({duck_hash64('val')} % 4294967296) AS BIGINT)
               AS val_sum
      FROM visible GROUP BY grp
    )
    SELECT 'mor' AS stage, * FROM acct
    UNION ALL
    SELECT 'materialized' AS stage, * FROM acct
    """,
)
def versioned_pdv_positional_erasure(spark, sf_dir):
    """POSITIONAL deletion vectors (round 10 cont. — ROADMAP r11 #3):
    merge-on-read erasure for tables with NO natural key. The victims
    are addressed by physical position (parquet file path + row index
    from ``_metadata``) instead of by key value, so keyless schemas
    and duplicate rows erase exactly — the Iceberg position-delete /
    Delta per-file-vector shape. The lane builds a keyless (grp, val)
    projection over three append dirs, commits TWO positional vectors
    (a grp predicate, then a val-prefix predicate over the already-
    masked state — vectors stack), re-appends rows MATCHING the first
    predicate (new files = new addresses, structurally unmaskable —
    no scope bookkeeping needed, unlike key vectors), and accounts the
    visible state at both physical stages: vectors outstanding
    ('mor', one broadcast anti-join on the address inside the shared
    masked-read kernel) and after materialize_dvs folds them
    ('materialized', pruned to the dirs whose files the vectors
    name). Both stages must hash-equal the closed-form survivor
    arithmetic. CDF across a positional delete needs NO key= (the
    keyless delete leg semi-joins the FROM-visible scan on the
    address) — pinned with the rest of the matrix in
    tests/test_sinks.py. Scale: a takedown commits O(victim
    addresses) bytes; the rewrite is deferred to one materialize
    amortizing every vector since the last fold, and the janitor's
    count/fraction trigger includes positional debt."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.versioned import (
        append_snapshot,
        delete_rows_positional,
        list_versions,
        materialize_dvs,
        read_version,
        write_snapshot,
    )

    docs = table(spark, sf_dir, "documents")
    proj = docs.select(
        (F.col("doc_id") % 7).alias("grp"),
        F.substring(F.col("text"), 1, 16).alias("val"),
    )
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    path = os.path.join(_warehouse_dir(), f"pdv_vt_{tag}")
    # the MOR protocol is the subject — rebuild so every run exercises
    # commit -> mask -> re-append -> materialize (same policy as the
    # key-vector lane above)
    if os.path.exists(path):
        shutil.rmtree(path)
    write_snapshot(proj.filter(F.col("grp") % 3 == 0), path)
    append_snapshot(proj.filter(F.col("grp") % 3 == 1), path)
    append_snapshot(proj.filter(F.col("grp") % 3 == 2), path)
    delete_rows_positional(spark, path, F.col("grp") == 3)
    delete_rows_positional(
        spark, path, F.substring(F.col("val"), 1, 1) == "a"
    )
    append_snapshot(
        docs.filter(
            (F.col("doc_id") % 7 == 3) & (F.col("doc_id") % 3 == 0)
        ).select(
            (F.col("doc_id") % 7).alias("grp"), F.lit("R").alias("val")
        ),
        path,
    )
    pm = list_versions(path)[-1]
    assert len(pm.get("pdv", [])) == 2, "expected two positional vectors"

    def acct(df, stage):
        return df.groupBy("grp").agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(
                F.pmod(hash64(F.col("val")), F.lit(1 << 32))
            ).cast("long").alias("val_sum"),
        ).select(F.lit(stage).alias("stage"), "*")

    mor = acct(read_version(spark, path), "mor")
    materialize_dvs(spark, path)
    assert not list_versions(path)[-1].get("pdv")
    mat = acct(read_version(spark, path), "materialized")
    return mor.unionByName(mat)


# --- per-dir KMV column statistics (round 10 cont., ROADMAP r11 #1) ---------

_KMV_SQL_K = 64
_KMV_SQL_SPACE = 1 << 60


def _duck_kmv_est(hash_expr: str, src: str) -> str:
    """DuckDB mirror of versioned.kmv_estimate over the k smallest
    distinct portable hashes of ``hash_expr`` in ``src`` — HUGEINT
    arithmetic because (k-1)·2^60 overflows BIGINT; '//' on positive
    HUGEINTs is the same floor the Python side pins."""
    return f"""(
      WITH hh AS (SELECT DISTINCT {duck_hash64(hash_expr)} AS h FROM {src}),
      sk AS (SELECT h FROM hh ORDER BY h LIMIT {_KMV_SQL_K})
      SELECT CASE
        WHEN (SELECT COUNT(*) FROM sk) < {_KMV_SQL_K}
          THEN (SELECT COUNT(*) FROM sk)
        ELSE CAST(CAST({_KMV_SQL_K - 1} AS HUGEINT)
                  * CAST({_KMV_SQL_SPACE} AS HUGEINT)
                  // CAST((SELECT MAX(h) FROM sk) AS HUGEINT) AS BIGINT)
      END
    )"""


def _kmv_vt_ensure(spark, sf_dir) -> tuple[str, str]:
    """Two KMV-tracked versioned tables: orders keyed on o_custkey
    (3-dir append chain, then a copy-on-write erasure so the rewrite
    path's sketch recompute is exercised in-lane) and customer on
    c_custkey (single snapshot)."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.versioned import (
        append_snapshot,
        delete_rows,
        list_versions,
        write_snapshot,
    )

    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    pa = os.path.join(_warehouse_dir(), f"kmv_vt_orders_{tag}")
    pc = os.path.join(_warehouse_dir(), f"kmv_vt_customer_{tag}")
    fp = "kmv_vt_v1"

    ms = list_versions(pa)
    if not (len(ms) == 4 and ms[0].get("fingerprint") == fp):
        if os.path.exists(pa):
            shutil.rmtree(pa)
        write_snapshot(
            orders.filter(F.col("o_orderkey") % 3 == 0), pa,
            meta={"fingerprint": fp},
            stats_col="o_custkey", kmv_col="o_custkey",
        )
        append_snapshot(orders.filter(F.col("o_orderkey") % 3 == 1), pa)
        append_snapshot(orders.filter(F.col("o_orderkey") % 3 == 2), pa)
        victims = (
            orders.filter(F.col("o_custkey") % 50 == 7)
            .select("o_custkey").distinct()
        )
        delete_rows(spark, pa, victims, "o_custkey")
    mc = list_versions(pc)
    if not (len(mc) == 1 and mc[0].get("fingerprint") == fp):
        if os.path.exists(pc):
            shutil.rmtree(pc)
        write_snapshot(
            cust, pc, meta={"fingerprint": fp}, kmv_col="c_custkey"
        )
    return pa, pc


@query(
    "versioned_kmv_distinct_estimate",
    f"""
    SELECT 'customer' AS side,
           {_duck_kmv_est("CAST(c_custkey AS VARCHAR)", "customer")}
             AS est_distinct,
           (SELECT COUNT(DISTINCT c_custkey) FROM customer)
             AS exact_distinct
    UNION ALL
    SELECT 'orders_after_delete',
           {_duck_kmv_est(
               "CAST(o_custkey AS VARCHAR)",
               "(SELECT * FROM orders WHERE o_custkey % 50 != 7)",
           )},
           (SELECT COUNT(DISTINCT o_custkey) FROM orders
            WHERE o_custkey % 50 != 7)
    UNION ALL
    SELECT 'orders_full',
           {_duck_kmv_est("CAST(o_custkey AS VARCHAR)", "orders")},
           (SELECT COUNT(DISTINCT o_custkey) FROM orders)
    """,
)
def versioned_kmv_distinct_estimate(spark, sf_dir):
    """PER-DIR KMV DISTINCT SKETCHES on the versioned-table manifest
    (round 10 cont. — ROADMAP r11 #1): each committed dir records the
    64 smallest portable hashes of its distinct key values; because
    every globally-smallest hash is smallest in its own dir, the
    merged per-dir union IS the single-pass table synopsis — so
    ``kmv_distinct`` answers "how many distinct keys?" from the
    MANIFEST alone, at any version, across append chains and
    rewrites, without scanning a byte of data. The lane reads three
    estimates (full chain at the pinned pre-delete version, the
    post-erasure rewrite — whose dir sketch the delete recomputed —
    and a second table) beside the exact counts; the oracle recomputes
    the identical floor-pinned integer estimator in SQL, so a drifting
    sketch, a stale merge, or a wrong estimator constant is a hash
    mismatch, and the est-vs-exact gap (~4% at k=64) is recorded
    honestly in the output. Scale: the planner input a 100 TB catalog
    wants before ANY scan — NDV for join planning — at a few hundred
    manifest bytes per dir."""
    from uts_spark.sources.versioned import kmv_distinct, read_version

    pa, pc = _kmv_vt_ensure(spark, sf_dir)
    exact_c = (
        table(spark, sf_dir, "customer").select("c_custkey")
        .distinct().count()
    )
    exact_full = (
        table(spark, sf_dir, "orders").select("o_custkey")
        .distinct().count()
    )
    exact_after = read_version(spark, pa).select(
        "o_custkey"
    ).distinct().count()
    rows = [
        ("customer", kmv_distinct(pc), exact_c),
        ("orders_after_delete", kmv_distinct(pa), exact_after),
        ("orders_full", kmv_distinct(pa, version=2), exact_full),
    ]
    return spark.createDataFrame(
        rows, "side string, est_distinct long, exact_distinct long"
    )


def _duck_kmv_join_sql(
    expr_a: str,
    src_a: str,
    expr_b: str,
    src_b: str,
    key_a: str,
    key_b: str,
    alias_a: str,
    alias_b: str,
) -> str:
    """The KMV join-estimate ORACLE, parameterized over sources/keys.
    Mirrors versioned._kmv_intersect_est's THREE regimes (ADVICE r10,
    low: the first cut always applied the sampled-sketch formula, so a
    scale factor with <k distinct keys on either side would
    hash-mismatch a correct library): both sketches exhaustive
    (<k values = every distinct hash present) -> exact set algebra;
    one exhaustive -> hits scaled by D/k off the sampled side; both
    sampled -> classic KMV union-merge algebra. Shared by the primary
    lane and the multi-key lane (ROADMAP r11 #4)."""
    K, SP = _KMV_SQL_K, _KMV_SQL_SPACE
    return f"""
    WITH ho AS (
      SELECT DISTINCT {duck_hash64(expr_a)} AS h FROM {src_a}
    ),
    sko AS (SELECT h FROM ho ORDER BY h LIMIT {K}),
    hc AS (
      SELECT DISTINCT {duck_hash64(expr_b)} AS h FROM {src_b}
    ),
    skc AS (SELECT h FROM hc ORDER BY h LIMIT {K}),
    no_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM sko),
    nc_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM skc),
    da AS (SELECT CASE
             WHEN (SELECT c FROM no_) < {K}
               THEN (SELECT c FROM no_)
             ELSE CAST(CAST({K - 1} AS HUGEINT)
                  * CAST({SP} AS HUGEINT)
                  // CAST((SELECT MAX(h) FROM sko) AS HUGEINT) AS BIGINT)
           END AS d),
    db AS (SELECT CASE
             WHEN (SELECT c FROM nc_) < {K}
               THEN (SELECT c FROM nc_)
             ELSE CAST(CAST({K - 1} AS HUGEINT)
                  * CAST({SP} AS HUGEINT)
                  // CAST((SELECT MAX(h) FROM skc) AS HUGEINT) AS BIGINT)
           END AS d),
    hx AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM sko
           WHERE h IN (SELECT h FROM skc)),
    ux AS (SELECT CAST(COUNT(*) AS BIGINT) AS c
           FROM (SELECT h FROM sko UNION SELECT h FROM skc)),
    u AS (SELECT h FROM (SELECT h FROM sko UNION SELECT h FROM skc)
          ORDER BY h LIMIT {K}),
    dus AS (SELECT CAST(CAST({K - 1} AS HUGEINT)
                  * CAST({SP} AS HUGEINT)
                  // CAST((SELECT MAX(h) FROM u) AS HUGEINT) AS BIGINT)
                  AS d),
    iu AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM u
           WHERE h IN (SELECT h FROM sko) AND h IN (SELECT h FROM skc)),
    di AS (SELECT CASE
             WHEN (SELECT c FROM no_) < {K}
                  AND (SELECT c FROM nc_) < {K}
               THEN (SELECT c FROM hx)
             WHEN (SELECT c FROM no_) < {K}
               THEN CAST(CAST((SELECT c FROM hx) AS HUGEINT)
                    * CAST((SELECT d FROM db) AS HUGEINT)
                    // {K} AS BIGINT)
             WHEN (SELECT c FROM nc_) < {K}
               THEN CAST(CAST((SELECT c FROM hx) AS HUGEINT)
                    * CAST((SELECT d FROM da) AS HUGEINT)
                    // {K} AS BIGINT)
             ELSE CAST(CAST((SELECT c FROM iu) AS HUGEINT)
                  * CAST((SELECT d FROM dus) AS HUGEINT)
                  // {K} AS BIGINT)
           END AS d),
    du AS (SELECT CASE
             WHEN (SELECT c FROM no_) < {K}
                  AND (SELECT c FROM nc_) < {K}
               THEN (SELECT c FROM ux)
             WHEN (SELECT c FROM no_) < {K}
               THEN (SELECT d FROM db) + (SELECT c FROM no_)
                    - (SELECT d FROM di)
             WHEN (SELECT c FROM nc_) < {K}
               THEN (SELECT d FROM da) + (SELECT c FROM nc_)
                    - (SELECT d FROM di)
             ELSE (SELECT d FROM dus)
           END AS d)
    SELECT (SELECT d FROM da) AS {alias_a},
           (SELECT d FROM db) AS {alias_b},
           (SELECT d FROM di) AS est_intersection,
           (SELECT d FROM du) AS est_union,
           CASE
             WHEN (SELECT d FROM da) = 0 OR (SELECT d FROM db) = 0
               THEN 0
             ELSE CAST(CAST((SELECT d FROM di) AS HUGEINT)
                * (SELECT COUNT(*) FROM {src_a})
                * (SELECT COUNT(*) FROM {src_b})
                // (CAST((SELECT d FROM da) AS HUGEINT)
                   * CAST((SELECT d FROM db) AS HUGEINT)) AS BIGINT)
           END AS est_join_rows,
           (SELECT COUNT(*) FROM {src_a} a
            JOIN {src_b} b ON a.{key_a} = b.{key_b})
             AS exact_join_rows
    """


@query(
    "versioned_kmv_join_estimate",
    _duck_kmv_join_sql(
        "CAST(o_custkey AS VARCHAR)", "orders",
        "CAST(c_custkey AS VARCHAR)", "customer",
        "o_custkey", "c_custkey",
        "est_distinct_orders", "est_distinct_customer",
    ),
)
def versioned_kmv_join_estimate(spark, sf_dir):
    """JOIN-SIZE ESTIMATION from manifests alone (the other half of
    r11 #1): two KMV-tracked tables estimate their inner-equi-join
    output as D∩ · (rows_a/D_a) · (rows_b/D_b) — distinct counts from
    each synopsis, the intersection from KMV set algebra (union-merge
    at k, fraction of the union synopsis present in both sketches
    scales the union estimate), every step floor-pinned integer
    arithmetic the oracle reproduces bit-for-bit. The exact join count
    rides beside the estimate (est 1562 vs exact 1500 at sf0.001 —
    ~4%). At 100 TB this is the broadcast-vs-shuffle and
    explosive-output check a planner runs BEFORE scheduling a scan;
    Spark's CBO wants exactly these NDV inputs, and the manifest
    carries them for free after every commit. The orders synopsis is
    read at the PINNED pre-delete version — estimates time-travel with
    the table."""
    from uts_spark.sources.versioned import kmv_join_estimate, list_versions

    pa, pc = _kmv_vt_ensure(spark, sf_dir)
    n_orders = {m["version"]: m for m in list_versions(pa)}[2]["n_rows"]
    n_cust = list_versions(pc)[-1]["n_rows"]
    j = kmv_join_estimate(pa, n_orders, pc, n_cust, version_a=2)
    exact = (
        table(spark, sf_dir, "orders")
        .join(
            table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    return spark.createDataFrame(
        [
            (
                j["distinct_a"],
                j["distinct_b"],
                j["distinct_intersection"],
                j["distinct_union"],
                j["est_join_rows"],
                exact,
            )
        ],
        "est_distinct_orders long, est_distinct_customer long, "
        "est_intersection long, est_union long, est_join_rows long, "
        "exact_join_rows long",
    )


@query(
    "versioned_kmv_multikey_estimate",
    _duck_kmv_join_sql(
        "CAST(o_orderkey AS VARCHAR)", "orders",
        "CAST(l_orderkey AS VARCHAR)", "lineitem",
        "o_orderkey", "l_orderkey",
        "est_distinct_orderkey", "est_distinct_l_orderkey",
    ),
)
def versioned_kmv_multikey_estimate(spark, sf_dir):
    """MULTI-KEY KMV SYNOPSES (VERDICT r10 #8 / ROADMAP r11 #4): a
    tuple ``kmv_col=("o_custkey", "o_orderkey")`` records one sketch
    per column on the manifest (primary under the classic
    kmv_col/dir_kmv keys — old readers unchanged; the rest per-column
    under ``kmv_extra``), so a SECOND join key plans from metadata
    without any re-scan — previously a consumer asking about a
    different key had to scan the table. The lane builds the orders
    table tracking BOTH keys (append chain so the per-dir merge is
    exercised on the extra column too), a lineitem table on
    l_orderkey, and estimates the orders⋈lineitem join on the
    SECONDARY key (resolved from kmv_extra via
    ``kmv_join_estimate(col_a="o_orderkey")``); the oracle recomputes
    the identical three-regime floor-pinned estimator in SQL beside
    the exact join count. plan_join(key_a=, key_b=) resolution for
    either key — and the honest degrade to row-counts-only for an
    untracked key — is pinned in tests/test_sinks.py. Scale: manifest
    cost is k ints per column per dir; every rewrite verb
    (delete/materialize/optimize/merge) recomputes only the NEW dir's
    sketches."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.versioned import (
        append_snapshot,
        kmv_join_estimate,
        list_versions,
        write_snapshot,
    )

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    po = os.path.join(_warehouse_dir(), f"kmv_mk_orders_{tag}")
    pl = os.path.join(_warehouse_dir(), f"kmv_mk_lineitem_{tag}")
    fp = "kmv_mk_v1"

    ms = list_versions(po)
    if not (len(ms) == 2 and ms[0].get("fingerprint") == fp):
        if os.path.exists(po):
            shutil.rmtree(po)
        write_snapshot(
            orders.filter(F.col("o_orderkey") % 2 == 0), po,
            meta={"fingerprint": fp},
            kmv_col=("o_custkey", "o_orderkey"),
        )
        append_snapshot(orders.filter(F.col("o_orderkey") % 2 == 1), po)
    ml = list_versions(pl)
    if not (len(ml) == 1 and ml[0].get("fingerprint") == fp):
        if os.path.exists(pl):
            shutil.rmtree(pl)
        write_snapshot(
            li, pl, meta={"fingerprint": fp}, kmv_col="l_orderkey"
        )

    n_o = list_versions(po)[-1]["n_rows"]
    n_l = list_versions(pl)[-1]["n_rows"]
    j = kmv_join_estimate(
        po, n_o, pl, n_l, col_a="o_orderkey", col_b="l_orderkey"
    )
    exact = (
        table(spark, sf_dir, "orders")
        .join(
            table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    return spark.createDataFrame(
        [
            (
                j["distinct_a"],
                j["distinct_b"],
                j["distinct_intersection"],
                j["distinct_union"],
                j["est_join_rows"],
                exact,
            )
        ],
        "est_distinct_orderkey long, est_distinct_l_orderkey long, "
        "est_intersection long, est_union long, est_join_rows long, "
        "exact_join_rows long",
    )


@query(
    "versioned_kmv_planned_join",
    f"""
    WITH o AS (
      SELECT o_orderkey, o_custkey FROM orders WHERE o_custkey % 50 != 7
    ),
    j AS (
      SELECT o.o_orderkey, c.c_custkey
      FROM o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT c_custkey % 10 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM({duck_hash64("CAST(o_orderkey AS VARCHAR)")}
                    % 4294967296) AS BIGINT) AS key_sum
    FROM j GROUP BY c_custkey % 10
    """,
)
def versioned_kmv_planned_join(spark, sf_dir):
    """MANIFEST-PLANNED JOIN (refreshed r11 #1 — the estimate→plan
    loop closed): ``join_versioned`` joins two versioned tables with
    the physical strategy chosen by :func:`plan_join` from committed
    manifest statistics — exact ``n_rows`` picks the broadcast build
    side (an explicit hint, where Spark's own size threshold must
    infer from file bytes and mis-sizes filtered or wide tables), and
    the KMV synopses pre-estimate the output so an explosive
    many-to-many key can be refused BEFORE the shuffle materializes
    it. The lane runs the planned join over the KMV-tracked tables
    (orders post-erasure × customer) and aggregates to a
    closed-form-checkable accounting; the broadcast/shuffle plan
    shapes and the explosive refusal are pinned in tests/test_sinks.py.
    Scale: this is the catalog half of a CBO — statistics at plan
    time from a few manifest bytes, no ANALYZE scan, correct at every
    pinned version."""
    from uts_spark.sources.versioned import join_versioned, plan_join

    pa, pc = _kmv_vt_ensure(spark, sf_dir)
    plan = plan_join(pa, pc)
    assert plan["strategy"] == "broadcast" and plan["build_side"] == "b"
    assert "estimate" in plan and not plan["explosive"]
    j = join_versioned(spark, pa, pc, "o_custkey", "c_custkey")
    return j.groupBy(
        (F.col("c_custkey") % 10).alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(
            F.pmod(
                hash64(F.col("o_orderkey").cast("string")), F.lit(1 << 32)
            )
        ).cast("long").alias("key_sum"),
    )


@query(
    "catalog_name_resolution",
    """
    SELECT 'current' AS source, doc_id, substr(text, 1, 40) AS val
    FROM documents
    UNION ALL
    SELECT 'prod_tag', doc_id, substr(text, 1, 40)
    FROM documents WHERE doc_id % 10 != 7
    """,
)
def catalog_name_resolution(spark, sf_dir):
    """The CATALOG SHIM (VERDICT r9 missing #4 / ROADMAP r10 #5):
    queries address tables by NAME, not path. sources/catalog.py maps
    name -> (path, kind) with one hard-link-CAS file per entry (atomic
    registration, loud collisions, no central read-modify-write — the
    object-storage catalog shape), and read_table composes with every
    pin the path readers support: version time travel, named refs,
    branches. The lane registers the versioned docs table under
    ``docs_main``, tags v0 as ``prod``, and returns BOTH resolutions —
    the current version and the prod tag — read purely by name; the
    oracle is the closed form of the two slices, so a catalog that
    resolved the wrong path, version, or ref hashes differently.
    Collision/missing-name/alter/unregister semantics and
    index-by-name probes are pinned in tests/test_sinks.py. Scale:
    resolution is one file read; nothing here grows with the data."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.catalog import read_table, register_entry, resolve
    from uts_spark.sources.versioned import (
        append_snapshot,
        list_versions,
        tag_version,
        write_snapshot,
    )

    docs = table(spark, sf_dir, "documents")
    val = F.substring(F.col("text"), 1, 40).alias("val")
    base = docs.filter(F.col("doc_id") % 10 != 7).select("doc_id", val)
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    tpath = os.path.join(_warehouse_dir(), f"cat_vt_{tag}")
    cat = os.path.join(_warehouse_dir(), f"cat_reg_{tag}")
    fp = "cat_vt_v1"

    ms = list_versions(tpath)
    ok = (
        len(ms) == 2
        and ms[0].get("fingerprint") == fp
        and os.path.isdir(cat)
    )
    if ok:
        try:
            resolve(cat, "docs_main")
        except ValueError:
            ok = False
    if not ok:
        for d in (tpath, cat):
            if os.path.exists(d):
                shutil.rmtree(d)
        write_snapshot(base, tpath, meta={"fingerprint": fp})
        tag_version(tpath, "prod", 0)
        append_snapshot(
            docs.filter(F.col("doc_id") % 10 == 7).select("doc_id", val),
            tpath,
        )
        register_entry(cat, "docs_main", tpath, kind="table")

    cur = read_table(spark, cat, "docs_main").select(
        F.lit("current").alias("source"), "doc_id", "val"
    )
    prod = read_table(spark, cat, "docs_main", ref="prod").select(
        F.lit("prod_tag").alias("source"), "doc_id", "val"
    )
    return cur.unionByName(prod)


@query(
    "versioned_age_retention_vacuum",
    """
    WITH v1 AS (
      SELECT o_custkey % 7 AS grp, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders WHERE o_orderkey % 3 = 1 GROUP BY o_custkey % 7
    ),
    v2 AS (
      SELECT o_custkey % 7 AS grp, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders WHERE o_orderkey % 3 = 2 GROUP BY o_custkey % 7
    )
    SELECT CAST(1 AS BIGINT) AS version,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v1) AS n_rows,
           (SELECT CAST(SUM(grp * cnt) AS BIGINT) FROM v1) AS val_sum,
           CAST(0 AS BIGINT) AS n_exp_huge,
           CAST(1 AS BIGINT) AS n_exp_zero
    UNION ALL
    SELECT CAST(2 AS BIGINT),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v2),
           (SELECT CAST(SUM(grp * cnt) AS BIGINT) FROM v2),
           CAST(0 AS BIGINT), CAST(1 AS BIGINT)
    """,
)
def versioned_age_retention_vacuum(spark, sf_dir):
    """AGE-BASED RETENTION (VERDICT r10 #2 / ROADMAP r11 #1): every
    commit stamps wall time on its manifest (``committed_at`` — an
    output, replay-safe), and ``vacuum(max_age_secs=)`` expires a
    version only when it is BOTH beyond the ``keep_last`` floor AND
    older than the window — Iceberg's ``expire_snapshots(older_than=,
    retain_last=)`` compliance-window shape. The lane builds a
    3-version table, tags v1, then runs the two boundary windows: a
    huge window expires NOTHING (all versions young — the age gate
    actually gates, this is what distinguishes the feature from plain
    keep_last), and a zero window expires exactly v0 — v1 survives on
    its TAG (a name is a retention promise) and v2 as current. The
    output reads both survivors (v1 through the tag ref) with
    closed-form accounting the oracle recomputes; the expired-count
    columns come from the real vacuum return values, so an age gate
    that stopped gating or a tag that stopped protecting is a hash
    mismatch. Real differing ages (doctored ``committed_at``) and the
    mtime fallback for pre-stamp manifests are pinned in
    tests/test_sinks.py. Scale: age retention is manifest-only
    arithmetic — no data scan; the janitor applies it per entry from
    catalog policy (``set_retention(max_age_secs=)``)."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.versioned import (
        read_ref,
        read_version,
        tag_version,
        vacuum,
        write_snapshot,
    )

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    path = os.path.join(_warehouse_dir(), f"age_ret_{tag}")
    # vacuum mutates state — rebuild fresh each run (three tiny
    # aggregate snapshots; idempotence comes from the rebuild)
    shutil.rmtree(path, ignore_errors=True)
    for i in range(3):
        write_snapshot(
            orders.filter(F.col("o_orderkey") % 3 == i)
            .groupBy((F.col("o_custkey") % 7).alias("grp"))
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")),
            path,
        )
    tag_version(path, "pin", 1)
    huge = vacuum(path, keep_last=1, max_age_secs=10**9)
    zero = vacuum(path, keep_last=1, max_age_secs=0)
    assert huge == [] and zero == [0], (huge, zero)

    parts = []
    for v, df in (
        (1, read_ref(spark, path, "pin")),
        (2, read_version(spark, path)),
    ):
        parts.append(
            df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.col("grp") * F.col("cnt"))
                .cast("long").alias("val_sum"),
            ).select(
                F.lit(v).cast("long").alias("version"),
                "n_rows",
                "val_sum",
                F.lit(len(huge)).cast("long").alias("n_exp_huge"),
                F.lit(len(zero)).cast("long").alias("n_exp_zero"),
            )
        )
    return parts[0].unionByName(parts[1])


@query(
    "catalog_sql_stats_join",
    f"""
    WITH o AS (
      SELECT o_orderkey, o_custkey FROM orders WHERE o_custkey % 50 != 7
    ),
    j AS (
      SELECT o.o_orderkey, c.c_custkey
      FROM o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT c_custkey % 10 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM({duck_hash64("CAST(o_orderkey AS VARCHAR)")}
                    % 4294967296) AS BIGINT) AS key_sum
    FROM j GROUP BY c_custkey % 10
    """,
)
def catalog_sql_stats_join(spark, sf_dir):
    """MANIFEST STATISTICS ON THE SQL SURFACE (VERDICT r10 #4 —
    closing the KMV→CBO gap): ``register_sql_views`` registers every
    catalog table as a temp view and attaches a BROADCAST hint when
    the manifest's exact ``n_rows`` fits the budget, so a plain
    ``spark.sql`` join over the views gets the manifest-informed
    build side — the statistic Spark's size-based threshold must
    otherwise infer from file bytes, which mis-sizes filtered or
    masked tables (the post-erasure orders chain here carries three
    dirs of which many rows are deleted — bytes on disk overstate
    rows served). The lane resolves both KMV-tracked tables through
    a catalog, registers hinted views, and aggregates the SQL join to
    the same closed form as ``versioned_kmv_planned_join`` — name
    resolution, view registration, or a wrong-rows hint all hash
    mismatch. The plan shape (hinted broadcast landing with Spark's
    own threshold disabled, unhinted control sort-merging) is pinned
    in tests/test_sinks.py. Scale: the hint is O(1) metadata riding a
    view; no ANALYZE scan, correct at every commit."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.catalog import (
        register_entry,
        register_sql_views,
        resolve,
    )
    from uts_spark.functions.hashing import hash64

    pa, pc = _kmv_vt_ensure(spark, sf_dir)
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    cat = os.path.join(_warehouse_dir(), f"kj_cat_{tag}")
    try:
        resolve(cat, "kj_orders")
    except ValueError:
        shutil.rmtree(cat, ignore_errors=True)
        register_entry(cat, "kj_orders", pa)
        register_entry(cat, "kj_cust", pc)
    rep = register_sql_views(spark, cat)
    assert rep["kj_orders"]["hinted"] and rep["kj_cust"]["hinted"], rep
    j = spark.sql(
        "SELECT c_custkey % 10 AS bucket, o_orderkey "
        "FROM kj_orders JOIN kj_cust "
        "ON o_custkey = c_custkey"
    )
    return j.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(
            F.pmod(
                hash64(F.col("o_orderkey").cast("string")), F.lit(1 << 32)
            )
        ).cast("long").alias("key_sum"),
    )


@query(
    "catalog_sql_view_refresh",
    """
    WITH seed AS (
      SELECT o_custkey % 9 AS grp, o_orderkey % 100 AS val
      FROM orders WHERE o_orderkey % 4 != 3
    ),
    everything AS (
      SELECT o_custkey % 9 AS grp, o_orderkey % 100 AS val FROM orders
    )
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(val) AS BIGINT) AS sum_val,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM seed) AS stale_total
    FROM everything GROUP BY grp
    """,
)
def catalog_sql_view_refresh(spark, sf_dir):
    """SQL-VIEW REFRESH ON THE TICK PATH (ROADMAP r12 #2 — the
    staleness contract's maintenance verb): a registered SQL view
    snapshots the version at registration, so a long-lived session's
    names drift as writers commit; ``refresh_sql_views`` re-registers
    ONLY the names whose table advanced (unmoved names cost one
    manifest listing, no plan rebuild). The lane registers a view at
    the seed version, proves the staleness (the pre-refresh SQL count
    is the SEED's — returned as ``stale_total`` so the oracle checks
    the contract, not just the ending state), appends, refreshes (the
    report must claim exactly one mover), and returns the post-refresh
    aggregate read through plain ``spark.sql`` — a refresh that
    re-registered nothing, refreshed the wrong version, or lost the
    hint bookkeeping all hash mismatch. Scale: refresh is O(names)
    manifest listings + plan rebuilds for movers only — the janitor
    runs it per tick (``catalog_maintenance_tick(refresh_views=)``),
    read-through for everyone sharing the session."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.catalog import (
        refresh_sql_views,
        register_entry,
        register_sql_views,
    )
    from uts_spark.sources.versioned import append_snapshot, write_snapshot

    orders = table(spark, sf_dir, "orders")
    src = orders.select(
        (F.col("o_custkey") % 9).alias("grp"),
        (F.col("o_orderkey") % 100).alias("val"),
        "o_orderkey",
    )
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    cat = os.path.join(_warehouse_dir(), f"svr_cat_{tag}")
    pt = os.path.join(_warehouse_dir(), f"svr_orders_{tag}")
    # the lane walks a specific version history — rebuild each run
    shutil.rmtree(cat, ignore_errors=True)
    shutil.rmtree(pt, ignore_errors=True)

    write_snapshot(src.filter(F.col("o_orderkey") % 4 != 3), pt)
    register_entry(cat, "svr_orders", pt)
    register_sql_views(spark, cat)
    stale_total = spark.sql(
        "SELECT count(*) AS n FROM svr_orders"
    ).first()["n"]
    append_snapshot(src.filter(F.col("o_orderkey") % 4 == 3), pt)
    rep = refresh_sql_views(spark, cat)
    assert rep["svr_orders"]["refreshed"] and rep["svr_orders"]["to"] == 1, (
        rep
    )
    return spark.sql(
        "SELECT grp, CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(val) AS BIGINT) AS sum_val FROM svr_orders GROUP BY grp"
    ).withColumn("stale_total", F.lit(int(stale_total)).cast("long"))


@query(
    "versioned_branch_staged_erasure",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_custkey % 9 AS grp,
             o_orderkey % 100 AS val, o_custkey
      FROM orders
    ),
    key_del AS (SELECT * FROM base WHERE o_custkey % 40 = 3),
    rem AS (SELECT * FROM base WHERE o_custkey % 40 != 3),
    pos_del AS (SELECT * FROM rem WHERE val % 13 = 5),
    appended AS (
      SELECT -k - 1 AS k, grp, val FROM base WHERE k % 97 = 0
    ),
    final_rows AS (
      SELECT k, grp, val FROM rem WHERE val % 13 != 5
      UNION ALL SELECT k, grp, val FROM appended
    ),
    feed_del AS (
      SELECT k, grp, val FROM key_del
      UNION ALL SELECT k, grp, val FROM pos_del
    )
    SELECT 'published' AS stage, grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(val) AS BIGINT) AS sum_val
    FROM final_rows GROUP BY grp
    UNION ALL
    SELECT 'feed_delete' AS stage, grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(val) AS BIGINT) AS sum_val
    FROM feed_del GROUP BY grp
    UNION ALL
    SELECT 'feed_insert' AS stage, grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(val) AS BIGINT) AS sum_val
    FROM appended GROUP BY grp
    """,
)
def versioned_branch_staged_erasure(spark, sf_dir):
    """BRANCH-STAGED MOR ERASURE — WAP for takedowns (round 11,
    ROADMAP r12 #5 grown to the full verb set): a risky erasure
    stages as DELETION VECTORS on a branch (`delete_rows_mor_branch`
    key-scoped + `delete_rows_positional_branch` keyless-by-address),
    the auditor reads the masked branch and its KEYLESS delete feed
    (`branch_changes` now routes staged-takedown ranges through the
    same MOR fast-path kernel as `table_changes` — pruned scans of
    the scoped dirs, no full-outer join, no key= required), and
    publish folds the vectors onto main as ONE commit with exact
    n_rows netting. The lane stages a key takedown, a positional
    takedown over the remaining visible rows, and a later append
    (structurally outside every staged scope/position), returns the
    audit feed's delete/insert images AND the published state — a
    mask that leaks into the feed, a resurrected row, a double-counted
    key∩positional image, or a publish that drops the vectors all
    hash mismatch. Scale: staging cost = victim frame + one branch
    record; the feed is delta-sized (scoped-dir scans); publish is
    O(1) metadata — the erasure itself stays merge-on-read until
    main's janitor materializes."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.versioned import (
        branch_changes,
        create_branch,
        delete_rows_mor_branch,
        delete_rows_positional_branch,
        list_versions,
        merge_branch,
        read_version,
        write_snapshot,
        write_to_branch,
    )

    orders = table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_custkey") % 9).alias("grp"),
        (F.col("o_orderkey") % 100).alias("val"),
        "o_custkey",
    )
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    pt = os.path.join(_warehouse_dir(), f"wap_erase_{tag}")
    # the lane walks a specific fork/stage/publish history — rebuild
    shutil.rmtree(pt, ignore_errors=True)

    write_snapshot(base.select("k", "grp", "val"), pt)
    create_branch(pt, "takedown")
    delete_rows_mor_branch(
        spark, pt, "takedown",
        base.filter(F.col("o_custkey") % 40 == 3).select("k"), "k",
    )
    delete_rows_positional_branch(
        spark, pt, "takedown", F.col("val") % 13 == 5
    )
    write_to_branch(
        base.filter(F.col("k") % 97 == 0).select(
            (-F.col("k") - 1).alias("k"), "grp", "val"
        ),
        pt, "takedown",
    )
    feed = branch_changes(spark, pt, "takedown")  # keyless by design
    feed_agg = feed.groupBy("_change_type", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("val").cast("long").alias("sum_val"),
    )
    feed_agg = feed_agg.withColumn(
        "stage",
        F.concat(F.lit("feed_"), F.col("_change_type")),
    ).select("stage", "grp", "n_rows", "sum_val")
    merge_branch(spark, pt, "takedown")
    pm = list_versions(pt)[-1]
    assert pm.get("dv") and pm.get("pdv"), pm  # vectors published MOR
    pub = read_version(spark, pt).groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("val").cast("long").alias("sum_val"),
    ).withColumn("stage", F.lit("published")).select(
        "stage", "grp", "n_rows", "sum_val"
    )
    return pub.unionByName(feed_agg)


@query(
    "versioned_incremental_agg_view",
    """
    WITH s AS (
      SELECT o_custkey % 7 AS grp, o_orderkey % 100 AS val, o_custkey
      FROM orders WHERE o_orderkey % 3 < 2
    )
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(val) AS BIGINT) AS sum_val
    FROM s WHERE o_custkey % 50 != 7 GROUP BY grp
    """,
)
def versioned_incremental_agg_view(spark, sf_dir):
    """INCREMENTAL AGGREGATE VIEW over the change feed (round 11 —
    IVM on this format's own CDF): ``maintain_agg_view`` keeps a
    COUNT/SUM-per-group materialization current by applying SIGNED
    deltas from ``table_changes`` (insert/update_postimage add,
    delete/update_preimage subtract) — never rescanning the source.
    The lane seeds the view, advances it across an APPEND (dir-diff
    fast-path feed: delta scan, no join) and a MERGE-ON-READ
    takedown (the MOR fast path's pruned delete images — no key
    needed), replays the last tick (exactly-once: the cursor rides
    the view's own manifest, so the replay returns the committed
    version before reading anything), and returns the maintained
    view; the oracle recomputes the final aggregate from scratch, so
    a drifted delta, a missed delete image, or a cursor bug is a
    hash mismatch. Maintenance cost per tick = the feed (delta-sized)
    + one group-sized full-outer merge; sums are integer-exact by
    contract (float views drift under +/- churn — refused at seed).
    Update images (rewrite ranges with key=), the negative-count
    refusal, and view-vs-view config mismatches are pinned in
    tests/test_sinks.py."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.versioned import (
        append_snapshot,
        delete_rows_mor,
        maintain_agg_view,
        read_version,
        write_snapshot,
    )

    orders = table(spark, sf_dir, "orders")
    src = orders.select(
        (F.col("o_custkey") % 7).alias("grp"),
        (F.col("o_orderkey") % 100).alias("val"),
        "o_custkey",
        "o_orderkey",
    )
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    ps = os.path.join(_warehouse_dir(), f"ivm_src_{tag}")
    pv = os.path.join(_warehouse_dir(), f"ivm_view_{tag}")
    # ticks mutate both tables — rebuild fresh each run (tiny)
    shutil.rmtree(ps, ignore_errors=True)
    shutil.rmtree(pv, ignore_errors=True)

    write_snapshot(src.filter(F.col("o_orderkey") % 3 == 0), ps)
    maintain_agg_view(spark, ps, pv, ("grp",), ("val",))  # seed
    append_snapshot(src.filter(F.col("o_orderkey") % 3 == 1), ps)
    maintain_agg_view(spark, ps, pv, ("grp",), ("val",))  # append tick
    victims = (
        src.filter(F.col("o_custkey") % 50 == 7)
        .select("o_custkey").distinct()
    )
    delete_rows_mor(spark, ps, victims, "o_custkey")
    v2 = maintain_agg_view(spark, ps, pv, ("grp",), ("val",))
    # exactly-once: a replayed tick commits nothing
    assert maintain_agg_view(spark, ps, pv, ("grp",), ("val",)) == v2
    return read_version(spark, pv).select("grp", "n_rows", "sum_val")


@query(
    "cdc_table_changes_composite_key",
    """
    WITH base AS (
      SELECT o_orderkey % 1000 AS k1, o_orderkey // 1000 AS k2,
             o_custkey % 100 AS val,
             o_custkey % 13 = 7 AS d, o_orderkey % 11 = 5 AS i,
             o_custkey % 9 = 3 AS u
      FROM orders
    ),
    feed AS (
      SELECT 'insert' AS stage, k1, val + CASE WHEN u THEN 100 ELSE 0 END AS v
      FROM base WHERE i AND NOT d
      UNION ALL
      SELECT 'delete', k1, val FROM base WHERE d AND NOT i
      UNION ALL
      SELECT 'update_preimage', k1, val
      FROM base WHERE u AND NOT i AND NOT d
      UNION ALL
      SELECT 'update_postimage', k1, val + 100
      FROM base WHERE u AND NOT i AND NOT d
    )
    SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(v) AS BIGINT) AS sum_val,
           CAST(SUM(k1) AS BIGINT) AS key_sum
    FROM feed GROUP BY stage
    """,
)
def cdc_table_changes_composite_key(spark, sf_dir):
    """COMPOSITE-KEY CHANGE FEED (round 11): row identity spanning
    more than one column — ``table_changes(key=("k1","k2"))`` diffs a
    rewrite range by the column COMBINATION (orderkey split into
    (mod, div) halves: neither unique alone, the pair unique), the
    same full-outer + content-hash kernel, uniqueness enforced over
    the tuple. This is what unlocks CDF for multi-column-keyed tables
    and for aggregate views keyed by their group columns (the
    view-chain lane next door). The lane commits v0 without the
    insert stripe, rewrites to v1 with deletions + value updates +
    the inserts, and aggregates the feed per change type — a
    mis-joined key column, a delete double-imaged as an update, or a
    combination-uniqueness regression all hash mismatch. Scale: one
    shuffle on the composite key, bounded by the two versions' live
    rows — identical economics to the single-key path."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.versioned import (
        table_changes,
        write_snapshot,
    )

    orders = table(spark, sf_dir, "orders")
    base = orders.select(
        (F.col("o_orderkey") % 1000).alias("k1"),
        F.expr("o_orderkey div 1000").alias("k2"),
        (F.col("o_custkey") % 100).alias("val"),
        (F.col("o_custkey") % 13 == 7).alias("d"),
        (F.col("o_orderkey") % 11 == 5).alias("i"),
        (F.col("o_custkey") % 9 == 3).alias("u"),
    )
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    pt = os.path.join(_warehouse_dir(), f"ckcdf_{tag}")
    shutil.rmtree(pt, ignore_errors=True)

    cols = ("k1", "k2", "val")
    write_snapshot(base.filter(~F.col("i")).select(*cols), pt)
    v1 = base.filter(~F.col("d")).select(
        "k1", "k2",
        (
            F.col("val")
            + F.when(F.col("u"), F.lit(100)).otherwise(F.lit(0))
        ).alias("val"),
    )
    write_snapshot(v1, pt)
    feed = table_changes(spark, pt, 0, 1, key=("k1", "k2"))
    return feed.groupBy(
        F.col("_change_type").alias("stage")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("val").cast("long").alias("sum_val"),
        F.sum("k1").cast("long").alias("key_sum"),
    )


@query(
    "versioned_view_chain",
    """
    WITH s AS (
      SELECT o_orderkey % 12 AS day, o_custkey % 5 AS cat,
             o_orderkey % 100 AS val, o_orderkey
      FROM orders WHERE o_orderkey % 37 != 3
    ),
    d AS (
      SELECT day, cat, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(val) AS BIGINT) AS sv
      FROM s GROUP BY day, cat
    )
    SELECT cat, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(sv) AS BIGINT) AS sum_sum_val,
           CAST(SUM(n) AS BIGINT) AS sum_n_rows
    FROM d GROUP BY cat
    """,
)
def versioned_view_chain(spark, sf_dir):
    """CHAINED AGGREGATE VIEWS (round 11): a rollup maintained OVER
    another view — daily (day, cat) totals from the source, weekly
    cat totals from the daily view — each layer advancing from its
    OWN source's change feed. The inner view's advances are
    whole-snapshot rewrites, so the outer view diffs them with the
    COMPOSITE key = the inner's group columns (``key=("day","cat")``,
    the new tuple-key CDF) — delete/update images of regrouped days
    apply as signed deltas exactly like base-table churn. The lane
    seeds both layers, advances the chain across an APPEND and a MOR
    TAKEDOWN on the source (daily absorbs the vector images, weekly
    absorbs daily's update images), replays the last tick (both
    layers no-op via their manifest cursors), and returns the weekly
    view vs a from-scratch two-level SQL rollup. The janitor advances
    registered chains ancestors-first (topo by view_src — pinned in
    pytest). Scale: each layer's tick is delta-sized against ITS
    source; the weekly tick never touches the base table at all."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.versioned import (
        append_snapshot,
        delete_rows_mor,
        maintain_agg_view,
        read_version,
        write_snapshot,
    )

    orders = table(spark, sf_dir, "orders")
    src = orders.select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_orderkey") % 12).alias("day"),
        (F.col("o_custkey") % 5).alias("cat"),
        (F.col("o_orderkey") % 100).alias("val"),
    )
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    ps = os.path.join(_warehouse_dir(), f"vchain_src_{tag}")
    pdv = os.path.join(_warehouse_dir(), f"vchain_daily_{tag}")
    pw = os.path.join(_warehouse_dir(), f"vchain_weekly_{tag}")
    for p in (ps, pdv, pw):
        shutil.rmtree(p, ignore_errors=True)

    def tick():
        maintain_agg_view(
            spark, ps, pdv, ("day", "cat"), ("val",), key="id"
        )
        return maintain_agg_view(
            spark, pdv, pw, ("cat",), ("sum_val", "n_rows"),
            key=("day", "cat"),
        )

    write_snapshot(src.filter(F.col("id") % 3 == 0), ps)
    tick()  # seed both layers
    append_snapshot(src.filter(F.col("id") % 3 != 0), ps)
    tick()  # append feeds up the chain
    victims = src.filter(F.col("id") % 37 == 3).select("id")
    delete_rows_mor(spark, ps, victims, "id")
    v2 = tick()  # takedown images roll up as signed deltas
    assert tick() == v2  # replayed tick: both layers no-op
    return read_version(spark, pw).select(
        "cat", "n_rows", "sum_sum_val", "sum_n_rows"
    )


@query(
    "versioned_agg_view_minmax",
    """
    WITH s AS (
      SELECT o_custkey % 7 AS grp, o_orderkey % 100 AS val,
             o_orderpriority AS tag, o_custkey
      FROM orders
    )
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(val) AS BIGINT) AS sum_val,
           CAST(SUM(val * val) AS BIGINT) AS sumsq_val,
           CAST(MIN(val) AS BIGINT) AS min_val,
           MIN(tag) AS min_tag,
           CAST(MAX(val) AS BIGINT) AS max_val,
           MAX(tag) AS max_tag
    FROM s WHERE o_custkey % 50 != 7 GROUP BY grp
    """,
)
def versioned_agg_view_minmax(spark, sf_dir):
    """MIN/MAX AGGREGATE VIEW — hybrid IVM (round 11 cont.): extrema
    are not self-maintainable under deletes (removing the attaining
    row leaves the new extremum unknowable from view + delta alone),
    so ``maintain_agg_view(min_cols=, max_cols=)`` merges the
    insert side purely (``least``/``greatest`` — any orderable type,
    strings included) and recomputes ONLY the groups a delete image
    REGRESSED (its value attains the group's current extremum),
    scanning the source once for those groups and never otherwise —
    the classic distributive-vs-MIN/MAX split from the IVM
    literature, driven by this format's own change feed. The lane
    seeds on a third of orders, advances across an APPEND tick (pure
    merge — no source scan) and a MERGE-ON-READ takedown tick that
    provably regresses extrema (the erased custkey stripe holds
    per-group minima/maxima at any SF), and returns the maintained
    view; the oracle recomputes COUNT/SUM/MIN/MAX from scratch, so a
    stale extremum, an unrecomputed regressed group, or an over-eager
    merge all hash mismatch."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.versioned import (
        append_snapshot,
        delete_rows_mor,
        maintain_agg_view,
        read_version,
        write_snapshot,
    )

    orders = table(spark, sf_dir, "orders")
    src = orders.select(
        (F.col("o_custkey") % 7).alias("grp"),
        (F.col("o_orderkey") % 100).alias("val"),
        F.col("o_orderpriority").alias("tag"),
        "o_custkey",
        "o_orderkey",
    )
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    ps = os.path.join(_warehouse_dir(), f"ivmm_src_{tag}")
    pv = os.path.join(_warehouse_dir(), f"ivmm_view_{tag}")
    shutil.rmtree(ps, ignore_errors=True)
    shutil.rmtree(pv, ignore_errors=True)

    kw = dict(
        group_cols=("grp",), sum_cols=("val",), sumsq_cols=("val",),
        min_cols=("val", "tag"), max_cols=("val", "tag"),
    )
    write_snapshot(src.filter(F.col("o_orderkey") % 3 == 0), ps)
    maintain_agg_view(spark, ps, pv, **kw)  # seed
    append_snapshot(src.filter(F.col("o_orderkey") % 3 != 0), ps)
    maintain_agg_view(spark, ps, pv, **kw)  # pure-merge tick
    victims = (
        src.filter(F.col("o_custkey") % 50 == 7)
        .select("o_custkey").distinct()
    )
    delete_rows_mor(spark, ps, victims, "o_custkey")
    v2 = maintain_agg_view(spark, ps, pv, **kw)  # regression tick
    assert maintain_agg_view(spark, ps, pv, **kw) == v2  # replay no-op
    return read_version(spark, pv).select(
        "grp", "n_rows", "sum_val", "sumsq_val", "min_val", "min_tag",
        "max_val", "max_tag",
    )


@query(
    "catalog_snapshot_consistent_read",
    """
    WITH s AS (
      SELECT doc_id, lang FROM documents WHERE doc_id % 10 <= 5
    ),
    snap AS (
      SELECT 'snapshot' AS stage, lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(doc_id) AS BIGINT) AS id_sum
      FROM s GROUP BY lang
    ),
    cur AS (
      SELECT 'current' AS stage, lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(doc_id) AS BIGINT) AS id_sum
      FROM (
        SELECT doc_id, lang FROM s
        UNION ALL
        SELECT doc_id, 'xx' AS lang FROM documents WHERE doc_id % 10 = 6
      ) u GROUP BY lang
    )
    SELECT * FROM snap UNION ALL SELECT * FROM cur
    """,
)
def catalog_snapshot_consistent_read(spark, sf_dir):
    """CONSISTENT MULTI-TABLE SNAPSHOT (round 10 — the catalog-level
    transaction ergonomic): a pipeline joining two versioned tables
    through their names needs both currents to belong to the SAME
    instant, or a writer landing between the two resolutions hands it
    a torn cross-table read. ``create_snapshot`` captures a named
    {table -> version} cut with an optimistic double-read (no lock —
    concurrent writers cost a retry, never a torn cut), CAS-commits
    the cut under the snapshot name, and retention-tags every member
    (vacuum's named-ref promise). The lane snapshots two tables, then
    ADVANCES BOTH (an append with lang='xx' on each), and returns the
    doc/meta join's accounting read BOTH ways: through the snapshot
    (must be the pre-advance closed form — pins held) and through the
    live names (must include the advance). A snapshot read that leaked
    a post-cut row, or a live read that missed one, hashes
    differently. Collision/drop/retention/torn-capture semantics are
    pinned in tests/test_sinks.py. Scale: capture is two manifest
    reads per member; nothing is data-sized until the reads the lane
    itself returns."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.catalog import (
        create_snapshot,
        read_snapshot_table,
        read_table,
        register_entry,
    )
    from uts_spark.sources.versioned import append_snapshot, write_snapshot

    docs = table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 10 <= 5)
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    root = os.path.join(_warehouse_dir(), f"csnap_{tag}")
    cat = os.path.join(root, "cat")
    pa, pb = os.path.join(root, "ta"), os.path.join(root, "tb")
    # the snapshot protocol is the lane's subject — rebuild each run
    if os.path.exists(root):
        shutil.rmtree(root)
    write_snapshot(
        base.select("doc_id", F.substring("text", 1, 16).alias("val")), pa
    )
    write_snapshot(base.select("doc_id", "lang"), pb)
    register_entry(cat, "d_docs", pa, kind="table")
    register_entry(cat, "d_meta", pb, kind="table")
    rec = create_snapshot(cat, "cut1", ["d_docs", "d_meta"])
    assert sorted(rec["pins"]) == ["d_docs", "d_meta"]
    adv = docs.filter(F.col("doc_id") % 10 == 6)
    append_snapshot(
        adv.select("doc_id", F.substring("text", 1, 16).alias("val")), pa
    )
    append_snapshot(
        adv.select("doc_id", F.lit("xx").alias("lang")), pb
    )

    def acct(a, b, stage):
        return (
            a.select("doc_id")
            .join(b, "doc_id")
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("doc_id").cast("long").alias("id_sum"),
            )
            .select(F.lit(stage).alias("stage"), "*")
        )

    snap = acct(
        read_snapshot_table(spark, cat, "cut1", "d_docs"),
        read_snapshot_table(spark, cat, "cut1", "d_meta"),
        "snapshot",
    )
    cur = acct(
        read_table(spark, cat, "d_docs"),
        read_table(spark, cat, "d_meta"),
        "current",
    )
    return snap.unionByName(cur)


@query(
    "catalog_wap_multi_publish",
    """
    WITH s AS (
      SELECT doc_id, lang FROM documents WHERE doc_id % 10 <= 4
    ),
    pre AS (
      SELECT 'pre_publish' AS stage, lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(doc_id) AS BIGINT) AS id_sum
      FROM s GROUP BY lang
    ),
    post AS (
      SELECT 'post_publish' AS stage, lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(doc_id) AS BIGINT) AS id_sum
      FROM (
        SELECT doc_id, lang FROM s
        UNION ALL
        SELECT doc_id, 'st' AS lang FROM documents WHERE doc_id % 10 = 5
      ) u GROUP BY lang
    )
    SELECT * FROM pre UNION ALL SELECT * FROM post
    """,
)
def catalog_wap_multi_publish(spark, sf_dir):
    """MULTI-TABLE WAP (round 10 — the catalog-pointer transaction):
    a pipeline stages risky output for TWO tables on per-table
    branches, audits, and publishes BOTH with one consumer-visible
    step — ``publish_branches`` preflights every branch read-only
    (a doomed publish refuses before any table moves), merges each
    onto its main, then advances the named snapshot in one generation
    commit: consumers reading through the cut see every staged output
    appear TOGETHER or not at all, the Nessie/Iceberg
    catalog-transaction shape. The lane reads the two-table join's
    accounting through the snapshot BEFORE the publish (staged rows
    invisible) and AFTER (both tables' staged slices, lang='st',
    visible at once); a publish that leaked one table's stage into
    the pre-cut, or advanced the cut with only one table merged,
    hashes differently. Refusal paths (missing branch, mid-sequence
    main rewrite, non-member stage) are pinned in
    tests/test_sinks.py. Scale: preflight is manifest reads; publish
    is one commute-merge commit per table + one catalog file."""
    import os
    import shutil

    from uts_spark.queries.llm_ops import _warehouse_dir
    from uts_spark.sources.catalog import (
        create_snapshot,
        publish_branches,
        read_snapshot_table,
        register_entry,
    )
    from uts_spark.sources.versioned import (
        create_branch,
        write_snapshot,
        write_to_branch,
    )

    docs = table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 10 <= 4)
    staged = docs.filter(F.col("doc_id") % 10 == 5)
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    root = os.path.join(_warehouse_dir(), f"mwap_{tag}")
    cat = os.path.join(root, "cat")
    pa, pb = os.path.join(root, "ta"), os.path.join(root, "tb")
    if os.path.exists(root):
        shutil.rmtree(root)
    write_snapshot(
        base.select("doc_id", F.substring("text", 1, 16).alias("val")), pa
    )
    write_snapshot(base.select("doc_id", "lang"), pb)
    register_entry(cat, "w_docs", pa, kind="table")
    register_entry(cat, "w_meta", pb, kind="table")
    create_snapshot(cat, "release", ["w_docs", "w_meta"])
    create_branch(pa, "stage")
    create_branch(pb, "stage")
    write_to_branch(
        staged.select("doc_id", F.substring("text", 1, 16).alias("val")),
        pa, "stage",
    )
    write_to_branch(
        staged.select("doc_id", F.lit("st").alias("lang")), pb, "stage",
    )

    def acct(stage):
        a = read_snapshot_table(spark, cat, "release", "w_docs")
        b = read_snapshot_table(spark, cat, "release", "w_meta")
        return (
            a.select("doc_id")
            .join(b, "doc_id")
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("doc_id").cast("long").alias("id_sum"),
            )
            .select(F.lit(stage).alias("stage"), "*")
        )

    # the pre-cut plan pins its versions at BUILD time (the snapshot
    # file resolves eagerly), so it stays the old cut even though it
    # executes after the flip — dirs are immutable
    pre = acct("pre_publish")
    out = publish_branches(
        spark, cat, "release",
        {"w_docs": "stage", "w_meta": "stage"},
    )
    assert set(out["published"]) == {"w_docs", "w_meta"}
    post = acct("post_publish")
    return pre.unionByName(post)


@query(
    "basket_part_affinity",
    """
    WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM lp),
    pc AS (SELECT p, COUNT(*) AS c FROM lp GROUP BY p),
    pairs AS (
      SELECT a.p AS p1, b.p AS p2, COUNT(*) AS c12
      FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
      HAVING COUNT(*) >= 2
    )
    SELECT p1, p2, c12, c1.c AS c1, c2.c AS c2,
           CAST(c12 AS DOUBLE) * n_orders / (c1.c * c2.c) AS lift
    FROM pairs JOIN pc c1 ON c1.p = p1
               JOIN pc c2 ON c2.p = p2
               CROSS JOIN n
    ORDER BY lift DESC, p1, p2
    LIMIT 50
    """,
)
def basket_part_affinity(spark, sf_dir):
    """Market-basket affinity (association-rule mining's counting
    backbone): parts co-ordered in the same order, with support counts
    and lift = P(p1,p2) / (P(p1)·P(p2)) — lift > 1 means genuinely
    bought together. Top-50 lifted pairs with deterministic
    tie-breaks; every count is an exact integer and the one lift
    division is reproducible across engines.

    Scale: the self-join on the order key explodes per-order pairs —
    bounded by (lines per order choose 2), ~6 for TPC-H-shaped carts,
    NOT corpus-quadratic; the pair aggregation is the big shuffle and
    it's on (p1, p2). Margin counts broadcast back. Basket-size skew
    (one giant cart) is THE production hazard: cap lines per basket
    upstream or salt the order key."""
    li = table(spark, sf_dir, "lineitem")
    lp = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n = lp.agg(F.count_distinct("o").alias("n_orders"))
    pc = lp.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    a = lp.select("o", F.col("p").alias("p1"))
    b = lp.select("o", F.col("p").alias("p2"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= 2)
    )
    return (
        pairs.join(pc.select(F.col("p").alias("p1"), F.col("c").alias("c1")), "p1")
        .join(pc.select(F.col("p").alias("p2"), F.col("c").alias("c2")), "p2")
        .crossJoin(F.broadcast(n))
        .select(
            "p1", "p2", "c12", "c1", "c2",
            (
                F.col("c12").cast("double")
                * F.col("n_orders")
                / (F.col("c1") * F.col("c2"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("p1"), F.asc("p2"))
        .limit(50)
    )


@query(
    "percentile_bands_daily",
    f"""
    WITH e AS (
      SELECT event_type, ({MS}) // {DAY} AS day, value
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, day
                                   ORDER BY value) AS rn,
             COUNT(*) OVER (PARTITION BY event_type, day) AS n
      FROM e
    ),
    p AS (SELECT unnest([0.1, 0.5, 0.9]) AS p)
    SELECT event_type, day * {DAY} AS day_ms, p.p AS p, value
    FROM r, p
    WHERE rn = GREATEST(CAST(ceil(p.p * n) AS BIGINT), 1)
    """,
)
def percentile_bands_daily(spark, sf_dir):
    """Percentile bands over time: per (event_type, day) the discrete
    p10/p50/p90 of value — the dashboard band chart every metrics
    system draws, and the two-level-key test of grouped percentiles
    (percentile_disc_by_type covers the single-key case). Discrete
    ranks → actual data values → bit-exact across engines.

    Scale: one shuffle on the composite (type, day) key; all three
    percentiles ride the same windowed rank pass (the probe list
    broadcasts), so band count doesn't multiply shuffles."""
    from uts_spark.operators.topk import percentile_disc

    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            ((F.col("ts_ms") / DAY).cast("long") * DAY).alias("day_ms"),
            "value",
        )
    )
    return percentile_disc(
        ev, "value", [0.1, 0.5, 0.9], group_cols=["event_type", "day_ms"]
    ).select("event_type", "day_ms", "p", "value")


def _duck_langid_confusion() -> str:
    from uts_spark.queries.llm_ops import _duck_lang_case

    inner = _duck_lang_case()
    return f"""
    WITH pred AS ({inner})
    SELECT label_lang, pred_lang, COUNT(*) AS n
    FROM pred GROUP BY label_lang, pred_lang
    """


@query("text_langid_confusion", _duck_langid_confusion())
def text_langid_confusion(spark, sf_dir):
    """Classifier evaluation harness: the language-ID confusion matrix
    (generator label x heuristic prediction, with counts) — the
    aggregate every model-quality dashboard starts from, and the
    composition proof that per-row operators (text_lang_id) feed
    ordinary grouped analytics without re-reading the corpus.

    Scale: the per-row scores fold into the scan stage; one hash
    aggregation on the (label, pred) pair — 16 output cells however
    large the corpus."""
    from uts_spark.functions.text import lang_id

    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("label_lang"),
            lang_id(F.col("text")).alias("pred_lang"),
        )
        .groupBy("label_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "scd2_history_build",
    f"""
    WITH ev AS (
      SELECT user_id, {MS} AS t, event_id, value FROM events
      WHERE event_type = 'view'
    ),
    chg AS (
      SELECT *,
             CASE WHEN lag(value) OVER w IS NULL
                    OR value <> lag(value) OVER w
                  THEN 1 ELSE 0 END AS is_change
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    v AS (
      SELECT user_id, t, event_id, value
      FROM chg WHERE is_change = 1
    )
    SELECT user_id, value,
           t AS valid_from,
           lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
             AS valid_to,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY t, event_id) AS BIGINT) AS version,
           lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
             AS is_current
    FROM v
    """,
)
def scd2_history_build(spark, sf_dir):
    """Slowly-changing-dimension (type 2) history build: a changelog of
    observed attribute values becomes versioned validity intervals —
    consecutive repeats collapse, each surviving change opens a version
    at its timestamp and closes at the next change (NULL = current).
    The dimension-history shape behind every point-in-time ("as the
    customer was THEN") join; the companion as-of and range joins
    consume exactly these intervals.

    Scale: one shuffle on the key; change detection (lag), interval
    close (lead), and versioning (row_number) all share the single
    (user, time) sort. Collapse-before-lead keeps state row-count =
    number of CHANGES, not observations."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select("user_id", F.col("ts_ms").alias("t"), "event_id", "value")
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    chg = ev.withColumn(
        "is_change",
        F.when(
            F.lag("value").over(w).isNull()
            | (F.col("value") != F.lag("value").over(w)),
            1,
        ).otherwise(0),
    ).filter(F.col("is_change") == 1)
    w2 = Window.partitionBy("user_id").orderBy("t", "event_id")
    return chg.select(
        "user_id",
        "value",
        F.col("t").alias("valid_from"),
        F.lead("t").over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.lead("t").over(w2).isNull().alias("is_current"),
    )


@query(
    "rfm_segmentation",
    f"""
    WITH base AS (
      SELECT o_custkey AS custkey,
             MAX(epoch_ms(o_orderdate)) AS last_order_ms,
             COUNT(*) AS frequency,
             {DSUM('o_totalprice')} AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT *,
             NTILE(4) OVER (ORDER BY last_order_ms, custkey) AS r_score,
             NTILE(4) OVER (ORDER BY frequency, custkey)     AS f_score,
             NTILE(4) OVER (ORDER BY monetary, custkey)      AS m_score
      FROM base
    )
    SELECT custkey, last_order_ms, frequency, monetary,
           CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm_code
    FROM scored
    """,
)
def rfm_segmentation(spark, sf_dir):
    """RFM customer segmentation: recency (last order), frequency
    (order count), monetary (decimal-exact spend) per customer, each
    quartiled by NTILE with a deterministic customer-id tie-break, and
    packed into the classic 3-digit RFM code — the segmentation every
    CRM/marketing warehouse derives from the orders fact.

    Scale: one shuffle on custkey for the per-customer rollup; since
    round 4 each NTILE is the distributed closed form over an exact
    range-partitioned rank (operators/distributed_rank) — three
    bucketed rank passes chained over the aggregate, zero
    single-partition windows at ANY customer count."""
    o = table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.unix_millis(F.col("o_orderdate").cast("timestamp"))).alias("last_order_ms"),
        F.count(F.lit(1)).alias("frequency"),
        _lsum(F.col("o_totalprice")).alias("monetary"),
    )
    # three INDEPENDENT rank branches joined back on custkey — chaining
    # the three ranked_cumsum calls instead nests the lineage 3 deep and
    # the plan tree grows ~4^3 copies of the base aggregate (measured:
    # ~3x the cold plan+codegen time); branches keep it linear, and all
    # three joins share the custkey hash partitioning
    scored = base
    for score, key in (
        ("r_score", "last_order_ms"),
        ("f_score", "frequency"),
        ("m_score", "monetary"),
    ):
        branch = ranked_cumsum(
            base.select("custkey", key),
            F.col(key),
            [F.asc(key), F.asc("custkey")],
            n_buckets=32,
        ).select(
            "custkey",
            ntile_from_rank(F.col("__rank"), F.col("__n"), 4).alias(score),
        )
        scored = scored.join(branch, "custkey")
    return scored.select(
        "custkey",
        "last_order_ms",
        "frequency",
        "monetary",
        F.col("r_score").cast("long").alias("r_score"),
        F.col("f_score").cast("long").alias("f_score"),
        F.col("m_score").cast("long").alias("m_score"),
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).cast("long").alias("rfm_code"),
    )


@query(
    "basket_association_rules",
    """
    WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM lp),
    pc AS (SELECT p, COUNT(*) AS c FROM lp GROUP BY p),
    pairs AS (
      SELECT a.p AS p1, b.p AS p2, COUNT(*) AS c12
      FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
      HAVING COUNT(*) >= 2
    ),
    rules AS (
      SELECT p1 AS antecedent, p2 AS consequent, c12, c1.c AS ca, c2.c AS cc,
             CAST(c12 AS DOUBLE) / c1.c AS confidence,
             CAST(c12 AS DOUBLE) * n_orders / (c1.c * c2.c) AS lift
      FROM pairs JOIN pc c1 ON c1.p = p1
                 JOIN pc c2 ON c2.p = p2
                 CROSS JOIN n
      UNION ALL
      SELECT p2, p1, c12, c2.c, c1.c,
             CAST(c12 AS DOUBLE) / c2.c,
             CAST(c12 AS DOUBLE) * n_orders / (c1.c * c2.c)
      FROM pairs JOIN pc c1 ON c1.p = p1
                 JOIN pc c2 ON c2.p = p2
                 CROSS JOIN n
    )
    SELECT antecedent, consequent, c12 AS support_cnt, confidence, lift
    FROM rules
    WHERE confidence >= 0.08 AND lift > 1.0
    ORDER BY confidence DESC, lift DESC, antecedent, consequent
    LIMIT 100
    """,
)
def basket_association_rules(spark, sf_dir):
    """Association rules over co-order pairs: each frequent pair yields
    the two directed rules A→B and B→A with confidence = P(B|A) and the
    shared lift; rules are pruned at confidence >= 0.5 AND lift > 1
    (the standard Apriori post-filter — high-confidence rules whose
    consequent is merely popular get killed by the lift test). The
    directed extension of basket_part_affinity.

    Scale: identical shape to the affinity query (the pair aggregation
    is the only big shuffle; margins broadcast); the directionalization
    is a cheap union of two projections of the SAME joined result —
    Catalyst reuses the subplan via exchange reuse."""
    li = table(spark, sf_dir, "lineitem")
    lp = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n = lp.agg(F.count_distinct("o").alias("n_orders"))
    pc = lp.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    a = lp.select("o", F.col("p").alias("p1"))
    b = lp.select("o", F.col("p").alias("p2"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= 2)
    )
    joined = (
        pairs.join(pc.select(F.col("p").alias("p1"), F.col("c").alias("c1")), "p1")
        .join(pc.select(F.col("p").alias("p2"), F.col("c").alias("c2")), "p2")
        .crossJoin(F.broadcast(n))
    )
    lift = F.col("c12").cast("double") * F.col("n_orders") / (
        F.col("c1") * F.col("c2")
    )
    fwd = joined.select(
        F.col("p1").alias("antecedent"),
        F.col("p2").alias("consequent"),
        F.col("c12").alias("support_cnt"),
        (F.col("c12").cast("double") / F.col("c1")).alias("confidence"),
        lift.alias("lift"),
    )
    rev = joined.select(
        F.col("p2").alias("antecedent"),
        F.col("p1").alias("consequent"),
        F.col("c12").alias("support_cnt"),
        (F.col("c12").cast("double") / F.col("c2")).alias("confidence"),
        lift.alias("lift"),
    )
    return (
        fwd.unionByName(rev)
        .filter((F.col("confidence") >= 0.08) & (F.col("lift") > 1.0))
        .orderBy(
            F.desc("confidence"), F.desc("lift"),
            F.asc("antecedent"), F.asc("consequent"),
        )
        .limit(100)
    )


@query(
    "funnel_time_to_convert",
    f"""
    WITH s AS (
      SELECT user_id, MIN({MS}) AS t_signup FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT user_id, {MS} AS t FROM events WHERE event_type = 'purchase'
    ),
    conv AS (
      SELECT s.user_id, MIN(p.t) - s.t_signup AS ttc_ms
      FROM s JOIN p ON p.user_id = s.user_id AND p.t >= s.t_signup
      GROUP BY s.user_id, s.t_signup
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY ttc_ms, user_id) AS rn,
             COUNT(*) OVER () AS n
      FROM conv
    ),
    probe AS (SELECT unnest([0.5, 0.9, 0.99]) AS p)
    SELECT probe.p AS p, r.ttc_ms,
           (SELECT COUNT(*) FROM conv) AS n_converted
    FROM r, probe
    WHERE rn = GREATEST(CAST(ceil(probe.p * n) AS BIGINT), 1)
    """,
)
def funnel_time_to_convert(spark, sf_dir):
    """Funnel latency distribution: per user, the time from first
    signup to first subsequent purchase, summarized as discrete
    p50/p90/p99 — the time-to-convert metric product analytics pairs
    with the conversion-rate funnel (funnel_signup_click_purchase
    counts WHO converts; this measures HOW FAST).

    Scale: two filtered pre-aggregations join on user_id (first-touch
    MIN collapse before the join keeps both sides one row per user);
    the percentile rank rides a single window over the
    converted-users aggregate, not the event stream."""
    ev = table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t_signup"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts_ms").alias("t")
    )
    conv = (
        s.join(p, "user_id")
        .filter(F.col("t") >= F.col("t_signup"))
        .groupBy("user_id", "t_signup")
        .agg(F.min("t").alias("t_first"))
        .select(
            "user_id", (F.col("t_first") - F.col("t_signup")).alias("ttc_ms")
        )
    )
    from uts_spark.operators.topk import percentile_disc

    n_conv = conv.agg(F.count(F.lit(1)).alias("n_converted"))
    return (
        percentile_disc(conv, "ttc_ms", [0.5, 0.9, 0.99])
        .crossJoin(F.broadcast(n_conv))
        .select("p", F.col("value").alias("ttc_ms"), "n_converted")
    )


_SQL_SURFACE = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS count_order
    FROM {lineitem}
    WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


@query(
    "sql_surface_pricing",
    _SQL_SURFACE.format(lineitem="lineitem"),
)
def sql_surface_pricing(spark, sf_dir):
    """The SQL-text API surface: the same engine drives plain
    ``spark.sql`` strings over registered temp views — a user of the
    reference can bring raw ANSI SQL instead of the DataFrame builder
    and get the identical Catalyst plan (this query's text IS its own
    oracle, modulo the view name). Registration goes through
    sources.tables.register_views, which applies the same
    nanosecond-timestamp and UTC-session handling as the DataFrame
    path."""
    from uts_spark.sources.tables import load_table

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "__sql_surface_lineitem"
    )
    return spark.sql(_SQL_SURFACE.format(lineitem="__sql_surface_lineitem"))


@query(
    "ts_theilsen_trend",
    f"""
    WITH e AS (
      SELECT user_id, event_id, {MS} AS t, value AS v FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    slopes AS (
      SELECT a.user_id,
             (b.v - a.v) / ((b.t - a.t) / 3600000.0) AS slope,
             a.event_id AS i, b.event_id AS j
      FROM e a JOIN e b
        ON a.user_id = b.user_id AND a.t < b.t
    ),
    r AS (
      SELECT user_id, slope,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY slope, i, j) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM slopes
    )
    SELECT user_id, slope AS theilsen_slope_per_h,
           CAST(n AS BIGINT) AS n_pairs
    FROM r WHERE rn = GREATEST(CAST(ceil(0.5 * n) AS BIGINT), 1)
    """,
)
def ts_theilsen_trend(spark, sf_dir):
    """Theil–Sen robust trend per series: the DISCRETE median of all
    pairwise slopes (value change per hour) — up to ~29% contamination
    leaves the estimate untouched, where the OLS slope
    (ts_linear_trend) chases every outlier. Discrete median pick with
    an (i, j) tie-break keeps it hash-exact; the slope divisions are
    single IEEE ops identical on both engines.

    Scale: the pairwise self-join is O(n_k²) per series — fine for
    per-entity series (tens to hundreds of points), and the classic
    subsample fallback (repeated-median on a hash-sampled pair subset)
    drops in when a series outgrows that; the join shuffles once on
    the series key either way."""
    ev = (
        table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .select("user_id", "event_id", F.col("ts_ms").alias("t"), F.col("value").alias("v"))
    )
    a = ev.select("user_id", F.col("event_id").alias("i"), F.col("t").alias("ta"), F.col("v").alias("va"))
    b = ev.select("user_id", F.col("event_id").alias("j"), F.col("t").alias("tb"), F.col("v").alias("vb"))
    slopes = (
        a.join(b, "user_id")
        .filter(F.col("ta") < F.col("tb"))
        .select(
            "user_id",
            ((F.col("vb") - F.col("va")) / ((F.col("tb") - F.col("ta")) / 3600000.0)).alias("slope"),
            "i",
            "j",
        )
    )
    w = Window.partitionBy("user_id").orderBy("slope", "i", "j")
    wn = Window.partitionBy("user_id")
    r = slopes.select(
        "user_id",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return r.filter(
        F.col("rn") == F.greatest(F.ceil(F.lit(0.5) * F.col("n")), F.lit(1))
    ).select(
        "user_id",
        F.col("slope").alias("theilsen_slope_per_h"),
        F.col("n").cast("long").alias("n_pairs"),
    )


@query(
    "stats_trimmed_mean",
    f"""
    WITH e AS (
      SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY value) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM e
    ),
    kept AS (
      SELECT * FROM r
      WHERE rn > CAST(floor(0.05 * n) AS BIGINT)
        AND rn <= n - CAST(floor(0.05 * n) AS BIGINT)
    )
    SELECT event_type,
           {DSUM('value')} / COUNT(value) AS trimmed_mean,
           COUNT(*) AS n_kept
    FROM kept GROUP BY event_type
    """,
)
def stats_trimmed_mean(spark, sf_dir):
    """5% two-sided trimmed mean per group: drop the floor(0.05·n)
    smallest and largest ranked values, then a decimal-exact mean of
    the rest — the robust location estimate between the mean (breaks
    on any outlier) and the median (discards 100% of magnitude
    information). Rank bounds are integers, the trimmed sum is
    decimal-stable → hash-exact.

    Scale: one shuffle on the group key; the rank pass and the final
    aggregation share it."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value")
    wn = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    cut = F.floor(0.05 * F.col("n"))
    kept = r.filter((F.col("rn") > cut) & (F.col("rn") <= F.col("n") - cut))
    return kept.groupBy("event_type").agg(
        (_lsum(F.col("value")) / F.count("value")).alias("trimmed_mean"),
        F.count(F.lit(1)).alias("n_kept"),
    )


@query(
    "stats_benford_digits",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT digit, COUNT(*) AS cnt FROM d GROUP BY digit),
    t AS (SELECT SUM(cnt) AS total FROM c)
    SELECT digit, cnt,
           CAST(cnt AS DOUBLE) / total AS observed,
           ln(1.0 + 1.0 / digit) / ln(10.0) AS benford_expected
    FROM c, t
    """,
)
def stats_benford_digits(spark, sf_dir):
    """Benford's-law first-digit audit over order totals: observed
    leading-digit shares next to the log10(1 + 1/d) expectation — the
    classic fraud/data-quality screen for naturally-occurring amounts
    (fabricated numbers flunk it). Digit extraction goes through an
    explicit floor (DuckDB's double→BIGINT cast ROUNDS, Spark's
    truncates — floor is the one they share); the expectation
    is the same two-log expression on each side.

    Scale: a 9-row hash aggregation over a pure projection — runs at
    any corpus size for the cost of a scan."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("cnt"))
    t = c.agg(F.sum("cnt").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "cnt",
        (F.col("cnt").cast("double") / F.col("total")).alias("observed"),
        (F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))).alias(
            "benford_expected"
        ),
    )


@query(
    "ts_mann_kendall",
    f"""
    WITH e AS (
      SELECT user_id, event_id, {MS} AS t, value AS v FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    pairs AS (
      SELECT a.user_id,
             CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END AS sgn
      FROM e a JOIN e b
        ON a.user_id = b.user_id
       AND (a.t < b.t OR (a.t = b.t AND a.event_id < b.event_id))
    ),
    s AS (
      SELECT user_id, SUM(sgn) AS s_stat, COUNT(*) AS n_pairs FROM pairs
      GROUP BY user_id
    ),
    n AS (SELECT user_id, COUNT(*) AS n FROM e GROUP BY user_id),
    ties AS (
      SELECT user_id, SUM(c * (c - 1) * (2 * c + 5)) AS tie_term
      FROM (SELECT user_id, v, COUNT(*) AS c FROM e GROUP BY user_id, v)
      GROUP BY user_id
    )
    SELECT s.user_id, CAST(s.s_stat AS BIGINT) AS s_stat,
           CAST(n.n AS BIGINT) AS n,
           (n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term) / 18.0 AS var_s,
           CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                  / sqrt((n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term) / 18.0)
                WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                  / sqrt((n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term) / 18.0)
                ELSE 0.0 END AS z
    FROM s JOIN n USING (user_id) JOIN ties USING (user_id)
    """,
)
def ts_mann_kendall(spark, sf_dir):
    """Mann–Kendall monotonic-trend test per series: S = Σ sign(v_j −
    v_i) over time-ordered pairs (an INTEGER statistic — hash-exact by
    construction), the tie-corrected variance, and the
    continuity-corrected z — the non-parametric companion to Theil–Sen
    (that one estimates the slope, this one tests whether a trend
    exists at all). Same O(n²)-per-series pair join shape; the
    subsample fallback applies identically at scale."""
    ev = (
        table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .select("user_id", "event_id", F.col("ts_ms").alias("t"), F.col("value").alias("v"))
    )
    a = ev.select("user_id", F.col("event_id").alias("i"), F.col("t").alias("ta"), F.col("v").alias("va"))
    b = ev.select("user_id", F.col("event_id").alias("j"), F.col("t").alias("tb"), F.col("v").alias("vb"))
    sgn = (
        F.when(F.col("vb") > F.col("va"), 1)
        .when(F.col("vb") < F.col("va"), -1)
        .otherwise(0)
    )
    s = (
        a.join(b, "user_id")
        .filter(
            (F.col("ta") < F.col("tb"))
            | ((F.col("ta") == F.col("tb")) & (F.col("i") < F.col("j")))
        )
        .groupBy("user_id")
        .agg(F.sum(sgn).alias("s_stat"), F.count(F.lit(1)).alias("n_pairs"))
    )
    n = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        ev.groupBy("user_id", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)
            ).alias("tie_term")
        )
    )
    var_s = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
    ) / 18.0
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var_s))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return (
        s.join(n, "user_id")
        .join(ties, "user_id")
        .select(
            "user_id",
            F.col("s_stat").cast("long").alias("s_stat"),
            F.col("n").cast("long").alias("n"),
            var_s.alias("var_s"),
            z.alias("z"),
        )
    )


@query(
    "stats_ks_two_sample",
    f"""
    WITH e AS (
      SELECT value, event_type = 'purchase' AS g1 FROM events
      WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
    ),
    n AS (
      SELECT SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN g1 THEN 0 ELSE 1 END) AS n2
      FROM e
    ),
    cum AS (
      SELECT value,
             SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN g1 THEN 0 ELSE 1 END) AS c2
      FROM e GROUP BY value
    ),
    ecdf AS (
      SELECT value,
             SUM(c1) OVER (ORDER BY value
                           ROWS UNBOUNDED PRECEDING) AS f1,
             SUM(c2) OVER (ORDER BY value
                           ROWS UNBOUNDED PRECEDING) AS f2
      FROM cum
    ),
    d AS (
      SELECT value,
             abs(CAST(f1 AS DOUBLE) / n.n1 - CAST(f2 AS DOUBLE) / n.n2) AS diff
      FROM ecdf, n
    )
    SELECT (SELECT MAX(diff) FROM d) AS ks_d,
           (SELECT MIN(value) FROM d
            WHERE diff = (SELECT MAX(diff) FROM d)) AS at_value,
           (SELECT n1 FROM n) AS n1,
           (SELECT n2 FROM n) AS n2
    """,
)
def stats_ks_two_sample(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov statistic: the maximum gap between
    the purchase and click value ECDFs, evaluated exactly at every
    distinct value (counts collapse per value first so ties are handled
    at the step level, not per row) — the distribution-drift test
    monitoring pipelines run between cohorts or time slices. The D
    statistic is a ratio of integers (one deterministic division per
    side), the argmax value is tie-broken to the minimum — hash-exact.

    Scale: one value-level aggregation; the ECDFs accumulate via the
    range-partitioned exact prefix sum (operators/distributed_rank,
    since round 4) — distinct values can grow unboundedly without ever
    funnelling through a single-partition window — plus a broadcast of
    the two counts."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isin("purchase", "click")
            & F.col("value").isNotNull()
        )
        .select("value", (F.col("event_type") == "purchase").alias("g1"))
    )
    n = ev.agg(
        F.sum(F.when(F.col("g1"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("g1"), 0).otherwise(1)).alias("n2"),
    )
    cum = ev.groupBy("value").agg(
        F.sum(F.when(F.col("g1"), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("g1"), 0).otherwise(1)).alias("c2"),
    )
    ecdf = ranked_cumsum(
        cum,
        F.col("value"),
        [F.asc("value")],
        values={"f1": F.col("c1"), "f2": F.col("c2")},
        n_buckets=64,
    ).select(
        "value",
        F.col("cum_f1").alias("f1"),
        F.col("cum_f2").alias("f2"),
    )
    d = ecdf.crossJoin(F.broadcast(n)).select(
        "value",
        F.abs(
            F.col("f1").cast("double") / F.col("n1")
            - F.col("f2").cast("double") / F.col("n2")
        ).alias("diff"),
        "n1",
        "n2",
    )
    mx = d.agg(F.max("diff").alias("ks_d"))
    return (
        d.crossJoin(F.broadcast(mx))
        .filter(F.col("diff") == F.col("ks_d"))
        .groupBy("ks_d")
        .agg(
            F.min("value").alias("at_value"),
            F.min("n1").cast("long").alias("n1"),
            F.min("n2").cast("long").alias("n2"),
        )
        .select("ks_d", "at_value", "n1", "n2")
    )


@query(
    "stats_spearman_corr",
    f"""
    WITH e AS (
      SELECT event_type, {MS} AS t, value FROM events WHERE value IS NOT NULL
    ),
    -- tie-averaged (fractional) value ranks, exact as k/2 rationals:
    -- the avg rank of a tie group = (min_rn + max_rn) / 2
    per_row AS (
      SELECT event_type, t, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, t) AS rn_v
      FROM e
    ),
    vgroups AS (
      SELECT event_type, value,
             (CAST(MIN(rn_v) AS DOUBLE) + MAX(rn_v)) / 2.0 AS rv
      FROM per_row GROUP BY event_type, value
    ),
    ranked AS (
      SELECT p.event_type, p.t, g.rv,
             ROW_NUMBER() OVER (PARTITION BY p.event_type
                                ORDER BY p.t, p.value) AS rt
      FROM per_row p JOIN vgroups g
        ON g.event_type = p.event_type AND g.value = p.value
    ),
    mom AS (
      SELECT event_type, COUNT(*) AS n,
             {DSUM('rv')} AS s1, {DSUM('rv * rv')} AS s2,
             {DSUM('CAST(rt AS DOUBLE)')} AS sy,
             {DSUM('CAST(rt AS DOUBLE) * rt')} AS sy2,
             {DSUM('rv * rt')} AS sxy
      FROM ranked GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           (sxy - s1 * sy / n)
             / (sqrt(s2 - s1 * s1 / n) * sqrt(sy2 - sy * sy / n)) AS spearman
    FROM mom
    """,
)
def stats_spearman_corr(spark, sf_dir):
    """Spearman rank correlation (value vs time, per event type):
    Pearson over TIE-AVERAGED ranks — value ties share the exact
    (min+max)/2 fractional rank (a k/2 rational, exactly representable),
    time ranks are unique by the (t, value) tie-break. Rank moments sum
    through decimal, so the monotone-association coefficient is
    bit-stable like the Pearson pack (stats_moments_by_type).

    Scale: two rank windows + one join back on the value group + one
    moment aggregation — all on the same event_type partitioning."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", F.col("ts_ms").alias("t"), "value")
    )
    wv = Window.partitionBy("event_type").orderBy("value", "t")
    per_row = ev.withColumn("rn_v", F.row_number().over(wv))
    vgroups = per_row.groupBy("event_type", "value").agg(
        ((F.min("rn_v").cast("double") + F.max("rn_v")) / 2.0).alias("rv")
    )
    wt = Window.partitionBy("event_type").orderBy("t", "value")
    ranked = (
        per_row.join(vgroups, ["event_type", "value"])
        .withColumn("rt", F.row_number().over(wt))
        .select("event_type", "rv", F.col("rt").cast("double").alias("rt"))
    )
    mom = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        _lsum(F.col("rv")).alias("s1"),
        _dsum(F.col("rv") * F.col("rv")).alias("s2"),
        _lsum(F.col("rt")).alias("sy"),
        _dsum(F.col("rt") * F.col("rt")).alias("sy2"),
        _dsum(F.col("rv") * F.col("rt")).alias("sxy"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    sy, sy2, sxy = F.col("sy"), F.col("sy2"), F.col("sxy")
    return mom.select(
        "event_type",
        n.cast("long").alias("n"),
        (
            (sxy - s1 * sy / n)
            / (F.sqrt(s2 - s1 * s1 / n) * F.sqrt(sy2 - sy * sy / n))
        ).alias("spearman"),
    )


@query(
    "sessions_bounce_rate_daily",
    f"""
    WITH e AS (SELECT user_id, {MS} AS t FROM events),
    m AS (
      SELECT user_id, t,
             CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                    OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                       >= 1800000
                  THEN 1 ELSE 0 END AS new_s
      FROM e),
    s AS (
      SELECT user_id, t,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM m),
    sess AS (
      SELECT user_id, sid, MIN(t) AS session_start, COUNT(*) AS n_events
      FROM s GROUP BY user_id, sid
    )
    SELECT (session_start // {DAY}) * {DAY} AS day_ms,
           COUNT(*) AS n_sessions,
           SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS n_bounces,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS bounce_rate
    FROM sess GROUP BY (session_start // {DAY}) * {DAY}
    """,
)
def sessions_bounce_rate_daily(spark, sf_dir):
    """Daily bounce rate: sessions (30-min gap) rolled up by their
    start day, with the share that contained exactly one event — the
    engagement KPI every web-analytics stack computes, here as a
    composition of native session_window sessionization with a plain
    daily aggregation (sessions attribute to their START day, the
    standard convention).

    Scale: session_window's single user_id shuffle, then a tiny
    per-day aggregation; the bounce flag is a per-session expression."""
    ev = table(spark, sf_dir, "events")
    sess = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.min("ts_ms").alias("session_start"), F.count("*").alias("n_events"))
    )
    bounce = F.when(F.col("n_events") == 1, 1).otherwise(0)
    return (
        sess.groupBy(
            ((F.col("session_start") / DAY).cast("long") * DAY).alias("day_ms")
        )
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(bounce).alias("n_bounces"),
            (F.sum(bounce).cast("double") / F.count(F.lit(1))).alias(
                "bounce_rate"
            ),
        )
    )


@query(
    "cohort_ltv_curves",
    f"""
    WITH first_seen AS (
      SELECT user_id, (MIN({MS}) // {7 * DAY}) * {7 * DAY} AS cohort_wk
      FROM events GROUP BY user_id
    ),
    rev AS (
      SELECT e.user_id, f.cohort_wk,
             (({MS}) - f.cohort_wk) // {7 * DAY} AS age_wk,
             e.value
      FROM events e JOIN first_seen f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
    ),
    wk AS (
      SELECT cohort_wk, age_wk, {DSUM('value')} AS wk_rev
      FROM rev GROUP BY cohort_wk, age_wk
    ),
    size AS (SELECT cohort_wk, COUNT(*) AS cohort_users FROM first_seen GROUP BY cohort_wk)
    SELECT w.cohort_wk, w.age_wk, s.cohort_users,
           CAST(SUM(CAST(w.wk_rev AS DECIMAL(38,6)))
                OVER (PARTITION BY w.cohort_wk ORDER BY w.age_wk
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_revenue,
           CAST(SUM(CAST(w.wk_rev AS DECIMAL(38,6)))
                OVER (PARTITION BY w.cohort_wk ORDER BY w.age_wk
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / s.cohort_users AS ltv_per_user
    FROM wk w JOIN size s ON s.cohort_wk = w.cohort_wk
    """,
)
def cohort_ltv_curves(spark, sf_dir):
    """Cohort LTV curves: users grouped by first-seen week, purchase
    revenue accumulated by weeks-since-signup — cumulative revenue and
    LTV-per-user per (cohort, age) cell, the curve marketing uses to
    compare acquisition vintages (the revenue-weighted sibling of
    cohort_retention_weekly). Cumulative sums run in decimal over the
    tiny cohort x age aggregate, so the curve is bit-stable.

    Scale: first-touch collapse (one shuffle on user), revenue join
    back on user, one (cohort, age) aggregation; the running sum rides
    on cohorts x weeks rows, never events."""
    ev = table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        (F.expr(f"min(ts_ms) div {7 * DAY}") * (7 * DAY)).alias("cohort_wk")
    )
    rev = (
        ev.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .join(first_seen, "user_id")
        .select(
            "cohort_wk",
            F.expr(f"(ts_ms - cohort_wk) div {7 * DAY}").alias("age_wk"),
            "value",
        )
    )
    wk = rev.groupBy("cohort_wk", "age_wk").agg(_lsum(F.col("value")).alias("wk_rev"))
    size = first_seen.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    w = (
        Window.partitionBy("cohort_wk")
        .orderBy("age_wk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col("wk_rev").cast(DEC)).over(w).cast("double")
    return wk.join(F.broadcast(size), "cohort_wk").select(
        "cohort_wk",
        "age_wk",
        "cohort_users",
        cum.alias("cum_revenue"),
        (cum / F.col("cohort_users")).alias("ltv_per_user"),
    )


@query(
    "events_transition_matrix",
    f"""
    WITH e AS (
      SELECT user_id, event_type, {MS} AS t, event_id FROM events
    ),
    pairs AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY t, event_id) AS to_type
      FROM e
    ),
    c AS (
      SELECT from_type, to_type, COUNT(*) AS cnt
      FROM pairs WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    ),
    tot AS (SELECT from_type, SUM(cnt) AS row_total FROM c GROUP BY from_type)
    SELECT c.from_type, c.to_type, c.cnt,
           CAST(c.cnt AS DOUBLE) / t.row_total AS p
    FROM c JOIN tot t ON t.from_type = c.from_type
    """,
)
def events_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over event types: for each
    user's time-ordered stream, count (current → next) pairs and
    row-normalize into transition probabilities — the behavioral model
    behind next-action prediction, funnel leak diagnosis, and anomaly
    scoring of unusual paths (a 5x5 matrix here, however large the
    corpus). Counts are integers; each probability is one exact
    division.

    Scale: one shuffle on user_id for the lead window, then a 25-cell
    aggregation — the transition pairs never materialize wider than
    the event stream."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    c = pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("cnt"))
    tot = c.groupBy("from_type").agg(F.sum("cnt").alias("row_total"))
    return c.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "cnt",
        (F.col("cnt").cast("double") / F.col("row_total")).alias("p"),
    )


@query(
    "stats_gini_revenue",
    f"""
    WITH cust AS (
      SELECT c.c_nationkey AS nationkey, {DSUM('o.o_totalprice')} AS spend
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey
    ),
    nat AS (
      SELECT n.n_name AS nation, cu.spend,
             ROW_NUMBER() OVER (PARTITION BY 1 ORDER BY cu.spend) AS dummy
      FROM cust cu JOIN nation n ON n.n_nationkey = cu.nationkey
    )
    SELECT 1 AS scope, COUNT(*) AS n,
           CAST(2.0 * CAST(SUM(CAST(rnk * spend_d AS DECIMAL(38,6))) AS DOUBLE)
                / (COUNT(*) * CAST(SUM(CAST(spend_d AS DECIMAL(38,6))) AS DOUBLE))
                - (COUNT(*) + 1.0) / COUNT(*) AS DOUBLE) AS gini
    FROM (
      SELECT spend AS spend_d,
             ROW_NUMBER() OVER (ORDER BY spend, nation) AS rnk
      FROM nat
    )
    """,
)
def stats_gini_revenue(spark, sf_dir):
    """Gini coefficient of national revenue concentration: per-nation
    customer spend sorted ascending, G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n —
    the inequality KPI for concentration dashboards (0 = spend spread
    evenly across nations, →1 = one nation dominates). Ranks are
    integers with a deterministic (spend, nation) tie-break; the two
    sums are single deterministic reductions over 25 rows, so the
    statistic is bit-stable.

    Scale: the heavy work is the orders⋈customer rollup (one fact
    shuffle); the Gini itself runs on the nation-sized aggregate."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(_lsum(F.col("o_totalprice")).alias("spend"))
    )
    nat = cust.join(F.broadcast(n), cust.nationkey == n.n_nationkey).select(
        F.col("n_name").alias("nation"), "spend"
    )
    ranked = nat.select(
        F.col("spend").alias("spend_d"),
        F.row_number().over(Window.orderBy("spend", "nation")).alias("rnk"),
    )
    return ranked.agg(
        F.lit(1).alias("scope"),
        F.count(F.lit(1)).alias("n"),
        (
            2.0 * F.sum((F.col("rnk") * F.col("spend_d")).cast(DEC)).cast("double")
            / (F.count(F.lit(1)) * F.sum(F.col("spend_d").cast(DEC)).cast("double"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1))
        ).cast("double").alias("gini"),
    )


@query(
    "abc_pareto_parts",
    f"""
    WITH rev AS (
      SELECT l_partkey AS partkey,
             {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(CAST(revenue AS DECIMAL(38,6))) AS DOUBLE) AS total
            FROM rev),
    r AS (
      SELECT partkey, revenue,
             CAST(SUM(CAST(revenue AS DECIMAL(38,6)))
                  OVER (ORDER BY revenue DESC, partkey
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_rev
      FROM rev
    )
    SELECT partkey, revenue,
           cum_rev / tot.total AS cum_share,
           CASE WHEN cum_rev / tot.total <= 0.8 THEN 'A'
                WHEN cum_rev / tot.total <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM r, tot
    """,
)
def abc_pareto_parts(spark, sf_dir):
    """ABC / Pareto classification of parts by revenue: cumulative
    revenue share in descending order splits the catalog into A (the
    ~80% head), B (to 95%), C (the long tail) — the inventory-
    prioritization classic. The running share accumulates in decimal
    with a (revenue, partkey) tie-break, so every class boundary is
    deterministic.

    Scale: one fact aggregation, then the cumulative share via the
    range-partitioned exact prefix sum (operators/distributed_rank,
    since round 4): bucket on -revenue, per-bucket decimal running sum,
    broadcast bucket-prefix totals — no single-partition window at any
    catalog size; the grand total rides the same pass (tot_rev)."""
    li = table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        _lsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    r = ranked_cumsum(
        rev,
        -F.col("revenue"),
        [F.desc("revenue"), F.asc("partkey")],
        values={"rev": F.col("revenue").cast(DEC)},
        n_buckets=64,
    ).select(
        "partkey",
        "revenue",
        F.col("cum_rev").cast("double").alias("cum_rev"),
        F.col("tot_rev").cast("double").alias("total"),
    )
    share = F.col("cum_rev") / F.col("total")
    return r.select(
        "partkey",
        "revenue",
        share.alias("cum_share"),
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C").alias(
            "abc_class"
        ),
    )


@query(
    "dau_new_vs_returning",
    f"""
    WITH seen AS (
      SELECT user_id, ({MS}) // {DAY} AS day FROM events GROUP BY user_id, ({MS}) // {DAY}
    ),
    first_day AS (SELECT user_id, MIN(day) AS d0 FROM seen GROUP BY user_id)
    SELECT s.day * {DAY} AS day_ms,
           COUNT(*) AS dau,
           SUM(CASE WHEN s.day = f.d0 THEN 1 ELSE 0 END) AS new_users,
           SUM(CASE WHEN s.day > f.d0 THEN 1 ELSE 0 END) AS returning_users
    FROM seen s JOIN first_day f ON f.user_id = s.user_id
    GROUP BY s.day
    """,
)
def dau_new_vs_returning(spark, sf_dir):
    """Daily active users split into new vs returning: a user counts as
    NEW only on their first active day — the growth-accounting
    decomposition (acquisition vs retention) on every product
    dashboard. Distinct (user, day) pairs collapse first so multiple
    same-day events never double-count.

    Scale: one shuffle on user_id (first-day collapse + join share the
    key), then a tiny per-day aggregation."""
    ev = table(spark, sf_dir, "events")
    seen = (
        ev.select("user_id", F.expr(f"ts_ms div {DAY}").alias("day")).distinct()
    )
    first_day = seen.groupBy("user_id").agg(F.min("day").alias("d0"))
    return (
        seen.join(first_day, "user_id")
        .groupBy((F.col("day") * DAY).alias("day_ms"))
        .agg(
            F.count(F.lit(1)).alias("dau"),
            F.sum(F.when(F.col("day") == F.col("d0"), 1).otherwise(0)).alias(
                "new_users"
            ),
            F.sum(F.when(F.col("day") > F.col("d0"), 1).otherwise(0)).alias(
                "returning_users"
            ),
        )
    )


@query(
    "feature_percentile_normalize",
    f"""
    WITH e AS (
      SELECT event_id, event_type, value FROM events WHERE value IS NOT NULL
    )
    SELECT event_id, event_type, value,
           CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY value, event_id) - 1 AS DOUBLE)
             / (COUNT(*) OVER (PARTITION BY event_type) - 1) AS pct_score
    FROM e
    """,
)
def feature_percentile_normalize(spark, sf_dir):
    """Percentile normalization (rank transform) per group: each value
    maps to (rank−1)/(n−1) in [0, 1] within its event type — the
    outlier-immune feature scaling for heterogeneous signals feeding a
    model (min-max scaling breaks on one extreme value; this cannot).
    Ranks tie-break on event_id, so the transform is a deterministic
    bijection and the score an exact integer ratio.

    Scale: one rank window per group key — the same single shuffle as
    any grouped percentile."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "event_type", "value")
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        (
            (F.row_number().over(w) - 1).cast("double")
            / (F.count(F.lit(1)).over(wn) - 1)
        ).alias("pct_score"),
    )


@query(
    "feature_winsorize",
    f"""
    WITH e AS (
      SELECT event_id, event_type, value FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM e
    ),
    bounds AS (
      SELECT event_type,
             MIN(CASE WHEN rn = GREATEST(CAST(ceil(0.05 * n) AS BIGINT), 1)
                      THEN value END) AS lo,
             MIN(CASE WHEN rn = GREATEST(CAST(ceil(0.95 * n) AS BIGINT), 1)
                      THEN value END) AS hi
      FROM r GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           LEAST(GREATEST(e.value, b.lo), b.hi) AS winsorized
    FROM e JOIN bounds b ON b.event_type = e.event_type
    """,
)
def feature_winsorize(spark, sf_dir):
    """Winsorization: clip each value to its group's discrete p5/p95
    (actual data values at ceil(p·n) ranks — no interpolation), keeping
    row count intact — the transform counterpart of stats_trimmed_mean
    (trimming drops tails, winsorizing pins them). Every output is
    either the original value or one of two group constants, so the
    result is hash-exact by construction.

    Scale: one rank pass per group + a broadcast of the 2-value bounds
    back onto the stream."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "event_type", "value")
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pick = lambda p: F.min(  # noqa: E731
        F.when(
            F.col("rn")
            == F.greatest(F.ceil(F.lit(p) * F.col("n")), F.lit(1)),
            F.col("value"),
        )
    )
    bounds = r.groupBy("event_type").agg(
        pick(0.05).alias("lo"), pick(0.95).alias("hi")
    )
    return ev.join(F.broadcast(bounds), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias(
            "winsorized"
        ),
    )


@query(
    "scd2_point_in_time_join",
    f"""
    WITH ev AS (
      SELECT user_id, {MS} AS t, event_id, value FROM events
      WHERE event_type = 'view'
    ),
    chg AS (
      SELECT *,
             CASE WHEN lag(value) OVER w IS NULL
                    OR value <> lag(value) OVER w
                  THEN 1 ELSE 0 END AS is_change
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    hist AS (
      SELECT user_id, value AS dim_value, t AS valid_from,
             lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
               AS valid_to
      FROM chg WHERE is_change = 1
    ),
    facts AS (
      SELECT user_id, {MS} AS t, event_id, value AS fact_value FROM events
      WHERE event_type = 'purchase'
    )
    SELECT f.user_id, f.event_id, f.t AS fact_ms, f.fact_value,
           h.dim_value, h.valid_from
    FROM facts f JOIN hist h
      ON h.user_id = f.user_id
     AND f.t >= h.valid_from
     AND (h.valid_to IS NULL OR f.t < h.valid_to)
    """,
)
def scd2_point_in_time_join(spark, sf_dir):
    """Point-in-time (as-the-dimension-was-THEN) join: purchase facts
    enrich against the SCD2 validity intervals built from the view
    stream (scd2_history_build's shape) — each fact matches exactly the
    version whose [valid_from, valid_to) bracket contains its
    timestamp. THE consumption pattern SCD2 histories exist for, and
    the temporal-join family member between as-of (nearest past) and
    range joins (arbitrary intervals).

    Scale: history and facts co-shuffle once on the entity key; within
    a key the interval predicate touches only that entity's versions
    (versions PARTITION time, so each fact hits exactly one — the join
    never fans out). Facts before an entity's first version drop
    (inner), matching warehouse semantics."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts_ms").alias("t"), "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    chg = views.withColumn(
        "is_change",
        F.when(
            F.lag("value").over(w).isNull()
            | (F.col("value") != F.lag("value").over(w)),
            1,
        ).otherwise(0),
    ).filter(F.col("is_change") == 1)
    hist = chg.select(
        "user_id",
        F.col("value").alias("dim_value"),
        F.col("t").alias("valid_from"),
        F.lead("t").over(w).alias("valid_to"),
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts_ms").alias("fact_ms"),
        "event_id",
        F.col("value").alias("fact_value"),
    )
    return facts.join(
        hist,
        (facts.user_id == hist.user_id)
        & (F.col("fact_ms") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("fact_ms") < F.col("valid_to"))),
    ).select(
        facts.user_id, "event_id", "fact_ms", "fact_value",
        "dim_value", "valid_from",
    )


@query(
    "feature_encode_standardize",
    f"""
    WITH e AS (
      SELECT event_id, event_type, value FROM events WHERE value IS NOT NULL
    ),
    idx AS (
      SELECT event_type,
             ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS type_idx
      FROM (SELECT DISTINCT event_type FROM e)
    ),
    m AS (
      SELECT event_type, COUNT(*) AS n,
             {DSUM('value')} AS s1, {DSUM('value * value')} AS s2
      FROM e GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, i.type_idx, e.value,
           (e.value - m.s1 / m.n)
             / sqrt((m.s2 - m.s1 * m.s1 / m.n) / (m.n - 1)) AS z_value
    FROM e JOIN idx i ON i.event_type = e.event_type
           JOIN m ON m.event_type = e.event_type
    """,
)
def feature_encode_standardize(spark, sf_dir):
    """Model-input feature prep in one pass: a stable integer label
    encoding for the categorical column (sorted-vocabulary index — the
    same id on every run and engine, unlike hash-based indexers) plus
    per-group z-standardization from decimal-exact moments. Together
    with percentile-normalize and winsorize this completes the tabular
    feature-transform block of a training pipeline.

    Scale: the vocabulary index and moment table are group-count-sized
    broadcasts; the stream itself never shuffles. The vocabulary rank
    runs through operators/distributed_rank.label_encode (VERDICT r5):
    this block is the reusable "label-encode a categorical", and on a
    high-cardinality column the naive unpartitioned
    row_number().over(orderBy(col)) is exactly the one-task cliff —
    label_encode range-buckets on the UTF-8 prefix key instead, so the
    plan holds whether the vocabulary is 5 event types or 10^7 terms."""
    from uts_spark.operators.distributed_rank import label_encode

    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "event_type", "value")
    )
    idx = label_encode(ev, "event_type", out="type_idx").select(
        "event_type", F.col("type_idx").cast("int").alias("type_idx")
    )
    v = F.col("value")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        _lsum(v).alias("s1"),
        _dsum(v * v).alias("s2"),
    )
    mu = F.col("s1") / F.col("n")
    sd = F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1))
    return (
        ev.join(F.broadcast(idx), "event_type")
        .join(F.broadcast(m), "event_type")
        .select(
            "event_id",
            "event_type",
            "type_idx",
            "value",
            ((v - mu) / sd).alias("z_value"),
        )
    )


@query(
    "ts_interarrival_stats",
    f"""
    WITH e AS (
      SELECT event_type, user_id, {MS} AS t, event_id FROM events
    ),
    gaps AS (
      SELECT event_type,
             t - lag(t) OVER (PARTITION BY event_type, user_id
                              ORDER BY t, event_id) AS gap_ms
      FROM e
    ),
    g AS (SELECT event_type, gap_ms FROM gaps WHERE gap_ms IS NOT NULL),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY gap_ms) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM g
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_gaps,
           CAST(SUM(CAST(gap_ms AS DECIMAL(38,6))) AS DOUBLE) / MAX(n)
             AS mean_gap_ms,
           CAST(MIN(CASE WHEN rn = GREATEST(CAST(ceil(0.5 * n) AS BIGINT), 1)
                    THEN gap_ms END) AS BIGINT) AS median_gap_ms,
           MIN(gap_ms) AS min_gap_ms,
           MAX(gap_ms) AS max_gap_ms
    FROM r GROUP BY event_type
    """,
)
def ts_interarrival_stats(spark, sf_dir):
    """Inter-arrival time distribution per event type (gaps between a
    user's consecutive events of that type): mean (decimal-exact),
    discrete median, min and max — the traffic-model fingerprint
    (bursty vs Poisson-like) that capacity planning and
    anomaly-baselining read first. Integer millisecond gaps keep every
    statistic hash-exact.

    Scale: one shuffle keyed (type, user) for the lag pass; the rank
    and final aggregation reuse the type partitioning."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy("ts_ms", "event_id")
    gaps = (
        ev.select(
            "event_type",
            (F.col("ts_ms") - F.lag("ts_ms").over(w)).alias("gap_ms"),
        )
        .filter(F.col("gap_ms").isNotNull())
    )
    wr = Window.partitionBy("event_type").orderBy("gap_ms")
    wn = Window.partitionBy("event_type")
    r = gaps.select(
        "event_type",
        "gap_ms",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_gaps"),
        (
            F.sum(F.col("gap_ms").cast(DEC)).cast("double") / F.max("n")
        ).alias("mean_gap_ms"),
        F.min(
            F.when(
                F.col("rn")
                == F.greatest(F.ceil(F.lit(0.5) * F.col("n")), F.lit(1)),
                F.col("gap_ms"),
            )
        ).cast("long").alias("median_gap_ms"),
        F.min("gap_ms").alias("min_gap_ms"),
        F.max("gap_ms").alias("max_gap_ms"),
    )


@query(
    "stats_overdispersion_orders",
    """
    WITH sz AS (
      SELECT l_orderkey, CAST(COUNT(*) AS DOUBLE) AS k FROM lineitem
      GROUP BY l_orderkey
    ),
    m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(k AS DECIMAL(38,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(k * k AS DECIMAL(38,6))) AS DOUBLE) AS s2
      FROM sz
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           s1 / n AS mean_lines,
           (s2 - s1 * s1 / n) / (n - 1) AS var_lines,
           ((s2 - s1 * s1 / n) / (n - 1)) / (s1 / n) AS vmr
    FROM m
    """,
)
def stats_overdispersion_orders(spark, sf_dir):
    """Overdispersion check on basket sizes: the variance-to-mean ratio
    of lines-per-order (VMR = 1 for a Poisson process; > 1 means
    clumping, < 1 regularity) — the one-number test for whether a
    count model fits before anyone fits it. Decimal-exact moments over
    integer counts make the ratio bit-stable.

    Scale: one fact aggregation to order sizes, then a 1-row moment
    reduction."""
    li = table(spark, sf_dir, "lineitem")
    sz = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("double").alias("k")
    )
    m = sz.agg(
        F.count(F.lit(1)).alias("n"),
        _lsum(F.col("k")).alias("s1"),
        _dsum(F.col("k") * F.col("k")).alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    var = (s2 - s1 * s1 / n) / (n - 1)
    return m.select(
        n.cast("long").alias("n_orders"),
        (s1 / n).alias("mean_lines"),
        var.alias("var_lines"),
        (var / (s1 / n)).alias("vmr"),
    )


@query(
    "retention_dn_curve",
    f"""
    WITH seen AS (
      SELECT DISTINCT user_id, ({MS}) // {DAY} AS day FROM events
    ),
    d0 AS (SELECT user_id, MIN(day) AS first_day FROM seen GROUP BY user_id),
    horizons AS (SELECT unnest([1, 7, 14, 28]) AS h),
    base AS (
      SELECT f.first_day, h.h, COUNT(*) AS cohort_n
      FROM d0 f CROSS JOIN horizons h
      GROUP BY f.first_day, h.h
    ),
    act AS (
      SELECT f.first_day, s.day - f.first_day AS offset_d, s.user_id
      FROM seen s JOIN d0 f ON f.user_id = s.user_id
    )
    SELECT b.first_day * {DAY} AS cohort_ms, b.h AS horizon_d, b.cohort_n,
           COUNT(a.user_id) AS retained,
           CAST(COUNT(a.user_id) AS DOUBLE) / b.cohort_n AS retention
    FROM base b LEFT JOIN act a
      ON a.first_day = b.first_day AND a.offset_d = b.h
    GROUP BY b.first_day, b.h, b.cohort_n
    """,
)
def retention_dn_curve(spark, sf_dir):
    """Dn retention curve (D1/D7/D14/D28): for each signup-day cohort,
    the share of users active EXACTLY n days later — the bounded-
    horizon growth metric product teams track daily (the weekly cohort
    matrix cohort_retention_weekly is its coarse sibling). Integer day
    arithmetic and count ratios keep the whole curve hash-exact.

    Scale: distinct user-days collapse first; one shuffle on user for
    the first-day join; the horizon fan-out is a 4-row broadcast."""
    ev = table(spark, sf_dir, "events")
    seen = ev.select(
        "user_id", F.expr(f"ts_ms div {DAY}").alias("day")
    ).distinct()
    d0 = seen.groupBy("user_id").agg(F.min("day").alias("first_day"))
    horizons = spark.createDataFrame([(1,), (7,), (14,), (28,)], "h int")
    base = (
        d0.crossJoin(F.broadcast(horizons))
        .groupBy("first_day", "h")
        .agg(F.count(F.lit(1)).alias("cohort_n"))
    )
    base = base.select(
        F.col("first_day").alias("b_first"), "h", "cohort_n"
    )
    act = seen.join(d0, "user_id").select(
        F.col("first_day").alias("a_first"),
        (F.col("day") - F.col("first_day")).alias("offset_d"),
        F.col("user_id").alias("a_user"),
    )
    return (
        base.join(
            act,
            (F.col("b_first") == F.col("a_first"))
            & (F.col("offset_d") == F.col("h")),
            "left",
        )
        .groupBy("b_first", "h", "cohort_n")
        .agg(F.count("a_user").alias("retained"))
        .select(
            (F.col("b_first") * DAY).alias("cohort_ms"),
            F.col("h").cast("long").alias("horizon_d"),
            "cohort_n",
            "retained",
            (F.col("retained").cast("double") / F.col("cohort_n")).alias(
                "retention"
            ),
        )
    )


@query(
    "events_hour_dow_heatmap",
    f"""
    WITH e AS (
      SELECT (({MS}) // {DAY} + 4) % 7 AS dow,
             (({MS}) % {DAY}) // {HOUR} AS hod,
             value
      FROM events
    )
    SELECT dow, hod, COUNT(*) AS n,
           COALESCE({DSUM('value')} / COUNT(value), 0.0) AS mean_value
    FROM e GROUP BY dow, hod
    """,
)
def events_hour_dow_heatmap(spark, sf_dir):
    """Hour-of-week activity heatmap: the 7x24 (day-of-week, hour)
    grid of event counts and mean values — the temporal-usage
    fingerprint every ops dashboard renders. Day-of-week derives from
    epoch days with the Thursday offset (1970-01-01 was a Thursday;
    +4 makes 0 = Monday) — pure integer arithmetic, identical on both
    engines, no calendar/locale functions to disagree about.

    Scale: a 168-cell hash aggregation over a pure projection."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            F.expr(f"(ts_ms div {DAY} + 4) % 7").alias("dow"),
            F.expr(f"(ts_ms % {DAY}) div {HOUR}").alias("hod"),
            "value",
        )
        .groupBy("dow", "hod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                _lsum(F.col("value")) / F.count("value"), F.lit(0.0)
            ).alias("mean_value"),
        )
    )


@query(
    "session_conversion_rate",
    f"""
    WITH e AS (SELECT user_id, {MS} AS t, event_type FROM events),
    m AS (
      SELECT user_id, t, event_type,
             CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                    OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                       >= 1800000
                  THEN 1 ELSE 0 END AS new_s
      FROM e),
    s AS (
      SELECT user_id, t, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM m),
    sess AS (
      SELECT user_id, sid,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted,
             COUNT(*) AS n_events
      FROM s GROUP BY user_id, sid
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           SUM(converted) AS n_converted,
           CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS conversion_rate,
           CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS mean_session_events
    FROM sess GROUP BY user_id
    """,
)
def session_conversion_rate(spark, sf_dir):
    """Per-user session conversion: the share of a user's sessions
    (30-min gap) that contain a purchase, plus mean session size — the
    engagement-to-revenue bridge metric, composed from native
    session_window sessionization without re-reading events twice.

    Scale: session_window's single user shuffle; the per-user rollup
    reuses the key."""
    ev = table(spark, sf_dir, "events")
    sess = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
            F.count("*").alias("n_events"),
        )
    )
    return sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("converted").alias("n_converted"),
        (F.sum("converted").cast("double") / F.count(F.lit(1))).alias(
            "conversion_rate"
        ),
        (F.sum("n_events").cast("double") / F.count(F.lit(1))).alias(
            "mean_session_events"
        ),
    )


@query(
    "order_fulfillment_aging",
    """
    WITH ship AS (
      SELECT l_orderkey, MAX(epoch_ms(l_shipdate)) AS last_ship_ms
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST((s.last_ship_ms - epoch_ms(o.o_orderdate))
                         // 86400000 AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(*) AS mean_days_to_ship,
           MAX((s.last_ship_ms - epoch_ms(o.o_orderdate)) // 86400000)
             AS max_days_to_ship
    FROM orders o JOIN ship s ON s.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def order_fulfillment_aging(spark, sf_dir):
    """Fulfillment aging by priority: whole days from order date to the
    LAST line shipment (an order isn't done until its slowest line
    ships), mean and worst case per priority class — the SLA telemetry
    ops teams page on. Integer day arithmetic on epoch ms, decimal
    mean — hash-exact.

    Scale: one lineitem rollup to per-order last-ship, co-partitioned
    join with orders on the key, then a 5-row aggregation."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    ship = li.groupBy("l_orderkey").agg(
        F.max(F.unix_millis(F.col("l_shipdate").cast("timestamp"))).alias(
            "last_ship_ms"
        )
    )
    days = F.expr("(last_ship_ms - unix_millis(cast(o_orderdate as timestamp))) div 86400000")
    return (
        o.join(ship, o.o_orderkey == ship.l_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum(days.cast(DEC)).cast("double") / F.count(F.lit(1))
            ).alias("mean_days_to_ship"),
            F.max(days).alias("max_days_to_ship"),
        )
    )


@query(
    "supplier_concentration_hhi",
    f"""
    WITH vol AS (
      SELECT s.s_nationkey AS nationkey, l.l_suppkey,
             {DSUM('l.l_extendedprice * (1 - l.l_discount)')} AS rev
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_nationkey, l.l_suppkey
    ),
    tot AS (
      SELECT nationkey,
             CAST(SUM(CAST(rev AS DECIMAL(38,6))) AS DOUBLE) AS nat_rev,
             COUNT(*) AS n_suppliers
      FROM vol GROUP BY nationkey
    )
    SELECT n.n_name AS nation, t.n_suppliers,
           CAST(SUM(CAST(floor((v.rev / t.nat_rev) * (v.rev / t.nat_rev)
                               * 1e12 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1e12 AS hhi
    FROM vol v JOIN tot t ON t.nationkey = v.nationkey
               JOIN nation n ON n.n_nationkey = v.nationkey
    GROUP BY n.n_name, t.n_suppliers
    """,
)
def supplier_concentration_hhi(spark, sf_dir):
    """Herfindahl–Hirschman concentration index per nation: the sum of
    squared supplier revenue shares (1/n = perfect competition, 1 =
    monopoly) — the antitrust-grade concentration measure next to the
    rank-based Gini (stats_gini_revenue). Shares divide decimal-exact
    revenues; the squared-share terms snap to 1e-12 fixed-point
    INTEGERS (floor(x+0.5), the cross-engine-safe rounding) so the
    per-nation reduction is order-independent and cast-tie-proof.

    Scale: one fact rollup to (nation, supplier), nation totals
    broadcast back, squared-share aggregation on the supplier-sized
    table."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    vol = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nationkey"), "l_suppkey")
        .agg(
            _lsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rev")
        )
    )
    tot = vol.groupBy("nationkey").agg(
        F.sum(F.col("rev").cast(DEC)).cast("double").alias("nat_rev"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    share = F.col("rev") / F.col("nat_rev")
    # floor(x*1e12 + 0.5) integer snap, NOT a decimal cast: the engines
    # round double->decimal differently on shortest-repr ties (the
    # ts_twap lesson; same idiom as _COS in llm_ops)
    term_u = F.floor(share * share * 1e12 + 0.5).cast("long")
    return (
        vol.join(F.broadcast(tot), "nationkey")
        .join(F.broadcast(n), F.col("nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "n_suppliers")
        .agg((F.sum(term_u).cast("double") / 1e12).alias("hhi"))
    )


@query(
    "scalar_variant_pack",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT)      AS k_long,
           json_extract_string(props, '$.k')                      AS k_str,
           CAST(json_extract_string(props, '$.k') AS DOUBLE) / 4  AS k_quarter,
           CAST(NULL AS BIGINT)                                   AS missing,
           'OBJECT<k: BIGINT>'                                    AS sch
    FROM events
    """,
)
def scalar_variant_pack(spark, sf_dir):
    """Semi-structured props via Spark 4's VARIANT type: ``parse_json``
    once into the binary variant encoding, then typed ``variant_get``
    path extraction, a safe ``try_variant_get`` on a missing path, and
    ``schema_of_variant`` introspection. At 100 TB variant beats
    string-JSON re-parsing per expression (one decode, columnar-friendly
    binary layout, shreddable); the oracle mirrors with plain JSON
    functions — same values, different engine-side encoding."""
    ev = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "long").alias("k_long"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        (F.variant_get(v, "$.k", "double") / 4).alias("k_quarter"),
        F.try_variant_get(v, "$.missing", "long").alias("missing"),
        F.schema_of_variant(v).alias("sch"),
    )
