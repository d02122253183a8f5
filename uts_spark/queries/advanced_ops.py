"""Round-4 breadth: warehouse operator families beyond the round-3
surface — skyline (Pareto-dominance frontier), closed-form hierarchical
rollup, a data-quality audit pack (deequ-style constraint checks), and
multi-touch revenue attribution. Every query is SQL-oracle-exact; every
plan is free of single-partition funnels (the skyline sweep rides the
round-4 ``distributed_rank`` operator's exclusive running max).

Reference parity note: none of these exist in the reference engine
(mixer/uts has no joins or multi-table surface at all — uts.ts folds one
in-memory series); they are §2.7 north-star extensions in the same vein
as the TPC-H/window/dedup families.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from uts_spark.operators.distributed_rank import ranked_cumsum
from uts_spark.operators.joins import binned_range_join
from uts_spark.registry import DAY, MS, query, table

DEC = "decimal(38,6)"

# centi-snapped decimal sum: ROUND(decimal, 2) is HALF-UP in both
# engines and *100 of a 2dp decimal is exact — the acf/ohlc convention
# (a double-side round here would tie-break differently; see memory of
# the ts_twap sf0.001 incident)
def _csum(col):
    return (F.round(F.sum(col.cast(DEC)), 2) * 100).cast("long")


def _duck_csum(expr: str) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(38,6))), 2) * 100 AS BIGINT)"


# ===========================================================================
# Skyline / Pareto-dominance frontier
# ===========================================================================

@query(
    "skyline_parts",
    f"""
    WITH p AS (
      SELECT l_partkey AS partkey,
             {_duck_csum('l_extendedprice * (1 - l_discount)')} AS revenue_c,
             {_duck_csum('l_quantity')} AS qty_c
      FROM lineitem GROUP BY l_partkey
    )
    SELECT partkey, revenue_c, qty_c
    FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.revenue_c >= a.revenue_c AND b.qty_c >= a.qty_c
        AND (b.revenue_c > a.revenue_c OR b.qty_c > a.qty_c)
    )
    """,
)
def skyline_parts(spark, sf_dir):
    """SKYLINE (Pareto frontier) of parts on (revenue, quantity): a part
    survives iff no other part is >= on both measures and > on one —
    the multi-criteria shortlist query (Börzsönyi et al., ICDE'01).

    Scale shape: the naive formulation is an n² dominance self-join; the
    2D skyline instead falls out of ONE ordered sweep — collapse to one
    row per distinct revenue (max quantity wins its revenue class), then
    walk revenues in descending order keeping rows whose quantity beats
    the EXCLUSIVE running max of everything strictly richer. That
    running max is ``ranked_cumsum(max_values=...)``'s distributed
    prefix max — range-bucketed, zero single-partition windows, exact —
    so the frontier costs two hash aggregations + one bounded sweep at
    any catalog size. Measures are centi-snapped decimal sums, so
    dominance comparisons are integer-exact vs the NOT EXISTS oracle."""
    li = table(spark, sf_dir, "lineitem")
    parts = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        _csum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue_c"),
        _csum(F.col("l_quantity")).alias("qty_c"),
    )
    revmax = parts.groupBy("revenue_c").agg(F.max("qty_c").alias("__maxq"))
    sweep = ranked_cumsum(
        revmax,
        -F.col("revenue_c"),
        [F.desc("revenue_c")],
        max_values={"q": F.col("__maxq")},
        n_buckets=64,
    ).select("revenue_c", "__maxq", "premax_q")
    return (
        parts.join(sweep, "revenue_c")
        .filter(
            (F.col("qty_c") == F.col("__maxq"))
            & (F.col("premax_q").isNull() | (F.col("premax_q") < F.col("qty_c")))
        )
        .select("partkey", "revenue_c", "qty_c")
    )


# ===========================================================================
# Hierarchical rollup (BOM-style subtree aggregation, closed-form tree)
# ===========================================================================

_TREE_FANOUT = 4
_TREE_DEPTH = 16  # covers 4^16 ≈ 4.3e9 part ids


@query(
    "part_hierarchy_rollup",
    f"""
    WITH own AS (
      SELECT l_partkey AS partkey,
             {_duck_csum('l_extendedprice * (1 - l_discount)')} AS revenue_c
      FROM lineitem GROUP BY l_partkey
    ),
    anc AS (
      SELECT CAST(FLOOR(partkey / POWER({_TREE_FANOUT}, k)) AS BIGINT) AS node,
             revenue_c
      FROM own, (SELECT UNNEST(range(0, {_TREE_DEPTH})) AS k)
      WHERE FLOOR(partkey / POWER({_TREE_FANOUT}, k)) > 0
    ),
    sub AS (
      SELECT node, SUM(revenue_c) AS subtree_revenue_c,
             COUNT(*) AS n_contributors
      FROM anc GROUP BY node
    )
    SELECT s.node AS partkey, s.subtree_revenue_c,
           CAST(s.n_contributors AS BIGINT) AS n_contributors,
           COALESCE(o.revenue_c, 0) AS own_revenue_c
    FROM sub s LEFT JOIN own o ON o.partkey = s.node
    """,
)
def part_hierarchy_rollup(spark, sf_dir):
    """Hierarchical (BOM-style) subtree rollup over a deterministic
    4-ary part tree (parent(p) = p div 4): every node's subtree
    revenue, contributor count, and own revenue.

    The tree is CLOSED-FORM (ancestor k of p is floor(p / 4^k)), so
    the usual iterative bottom-up join — O(depth) shuffles with a driver
    loop — collapses into ONE explode of each part onto its ≤ 16
    ancestors and ONE hash aggregation: contribution rows ∝ n·depth,
    a single shuffle, no iteration, no recursion. This is the scale
    pattern for any hierarchy whose parent edge is computable (time
    hierarchies, geo grids, fixed-radix ids); arbitrary parent POINTERS
    need the iterative path (see functions/clustering.connected_components
    for that machinery). Division is by powers of two ({fanout}^k), so
    the double division is EXACT in both engines — floor never straddles
    a representation boundary."""
    li = table(spark, sf_dir, "lineitem")
    own = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        _csum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue_c"),
    )
    ancs = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(_TREE_DEPTH - 1)),
            lambda k: F.floor(
                F.col("partkey") / F.pow(F.lit(float(_TREE_FANOUT)), k)
            ).cast("long"),
        ),
        lambda node: node > 0,
    )
    sub = (
        own.select(F.explode(ancs).alias("node"), "revenue_c")
        .groupBy("node")
        .agg(
            F.sum("revenue_c").alias("subtree_revenue_c"),
            F.count(F.lit(1)).alias("n_contributors"),
        )
    )
    return sub.join(
        own.select(F.col("partkey").alias("node"), F.col("revenue_c").alias("__own")),
        "node",
        "left",
    ).select(
        F.col("node").alias("partkey"),
        "subtree_revenue_c",
        F.col("n_contributors").cast("long").alias("n_contributors"),
        F.coalesce("__own", F.lit(0)).alias("own_revenue_c"),
    )


# ===========================================================================
# Data-quality audit pack (deequ-style constraint checks)
# ===========================================================================

@query(
    "dq_audit_pack",
    f"""
    WITH li AS (SELECT l_orderkey, l_shipdate FROM lineitem),
    o AS (SELECT o_orderkey, o_orderdate, o_totalprice FROM orders),
    checks AS (
      SELECT 'lineitem_orphan_orderkey' AS check_name,
             (SELECT COUNT(*) FROM li WHERE l_orderkey NOT IN
                (SELECT o_orderkey FROM o)) AS n_violations,
             (SELECT COUNT(*) FROM li) AS n_checked
      UNION ALL
      SELECT 'orders_childless',
             (SELECT COUNT(*) FROM o WHERE o_orderkey NOT IN
                (SELECT l_orderkey FROM li)),
             (SELECT COUNT(*) FROM o)
      UNION ALL
      SELECT 'orders_nonpositive_total',
             (SELECT COUNT(*) FROM o WHERE o_totalprice <= 0),
             (SELECT COUNT(*) FROM o)
      UNION ALL
      SELECT 'lineitem_ship_before_order',
             (SELECT COUNT(*) FROM li JOIN o ON o_orderkey = l_orderkey
              WHERE l_shipdate < o_orderdate),
             (SELECT COUNT(*) FROM li)
      UNION ALL
      SELECT 'customer_unknown_nation',
             (SELECT COUNT(*) FROM customer WHERE c_nationkey NOT IN
                (SELECT n_nationkey FROM nation)),
             (SELECT COUNT(*) FROM customer)
      UNION ALL
      SELECT 'events_null_value',
             (SELECT COUNT(*) FROM events WHERE value IS NULL),
             (SELECT COUNT(*) FROM events)
      UNION ALL
      SELECT 'events_duplicate_event_id',
             (SELECT COUNT(*) - COUNT(DISTINCT event_id) FROM events),
             (SELECT COUNT(*) FROM events)
    )
    SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
           CAST(n_checked AS BIGINT) AS n_checked,
           CAST(n_violations * 1000000 // n_checked AS BIGINT) AS violation_ppm
    FROM checks
    """,
)
def dq_audit_pack(spark, sf_dir):
    """Data-quality audit (the deequ/Great-Expectations constraint
    family): referential integrity both directions (orphan lineitems,
    childless orders, customers with unknown nations), domain checks
    (non-positive totals, NULL measures), temporal consistency
    (shipment before order date), and key uniqueness (duplicate event
    ids) — one row per check with violation counts and an integer ppm
    rate.

    Scale shape: each check is an aggregate or anti-join keyed on its
    own column — the orderkey checks share the orders⋈lineitem shuffle
    key; dimension lookups broadcast; everything reduces map-side to
    single-row counts before the union. Violations on this synthetic
    testdata are mostly zero BY DESIGN — the audit proves the machinery
    (and the oracle proves the counts), the way a DQ suite runs green
    on a healthy warehouse."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    cust = table(spark, sf_dir, "customer")
    nat = table(spark, sf_dir, "nation")
    ev = table(spark, sf_dir, "events")

    def row(name, viol_df, checked_df):
        v = viol_df.agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        c = checked_df.agg(F.count(F.lit(1)).cast("long").alias("n_checked"))
        return (
            v.crossJoin(F.broadcast(c))
            .select(
                F.lit(name).alias("check_name"),
                "n_violations",
                "n_checked",
            )
        )

    dup_ev = ev.agg(
        (F.count(F.lit(1)) - F.count_distinct("event_id"))
        .cast("long")
        .alias("n_violations"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
    ).select(
        F.lit("events_duplicate_event_id").alias("check_name"),
        "n_violations",
        "n_checked",
    )

    checks = (
        row("lineitem_orphan_orderkey",
            li.join(o, li.l_orderkey == o.o_orderkey, "left_anti"), li)
        .unionByName(row("orders_childless",
                         o.join(li, o.o_orderkey == li.l_orderkey, "left_anti"), o))
        .unionByName(row("orders_nonpositive_total",
                         o.filter(F.col("o_totalprice") <= 0), o))
        .unionByName(row("lineitem_ship_before_order",
                         li.join(o, li.l_orderkey == o.o_orderkey)
                         .filter(F.col("l_shipdate") < F.col("o_orderdate")), li))
        .unionByName(row("customer_unknown_nation",
                         cust.join(F.broadcast(nat),
                                   cust.c_nationkey == nat.n_nationkey,
                                   "left_anti"), cust))
        .unionByName(row("events_null_value",
                         ev.filter(F.col("value").isNull()), ev))
        .unionByName(dup_ev)
    )
    return checks.select(
        "check_name",
        "n_violations",
        "n_checked",
        F.floor(F.col("n_violations") * 1_000_000 / F.col("n_checked"))
        .cast("long")
        .alias("violation_ppm"),
    )


# ===========================================================================
# Multi-touch revenue attribution (linear model + direct fallback)
# ===========================================================================

_ATTR_WINDOW = 7 * DAY


@query(
    "attribution_linear",
    f"""
    WITH purch AS (
      SELECT event_id AS p_id, user_id, {MS} AS p_t,
             CAST(ROUND(value * 100) AS BIGINT) AS value_c
      FROM events WHERE event_type = 'purchase' AND value > 0
    ),
    touch AS (
      SELECT user_id, event_type AS channel, {MS} AS t_t
      FROM events WHERE event_type IN ('click', 'view')
    ),
    pairs AS (
      SELECT p.p_id, p.value_c, t.channel
      FROM purch p JOIN touch t
        ON t.user_id = p.user_id
       AND t.t_t >= p.p_t - {_ATTR_WINDOW} AND t.t_t < p.p_t
    ),
    cnt AS (SELECT p_id, COUNT(*) AS n_t FROM pairs GROUP BY p_id),
    credited AS (
      SELECT pr.channel, pr.value_c // c.n_t AS credit_c, pr.p_id
      FROM pairs pr JOIN cnt c USING (p_id)
    ),
    attributed AS (
      SELECT channel, SUM(credit_c) AS attributed_c,
             COUNT(*) AS n_touches, COUNT(DISTINCT p_id) AS n_purchases
      FROM credited GROUP BY channel
    ),
    direct AS (
      SELECT 'direct' AS channel, SUM(value_c) AS attributed_c,
             0 AS n_touches, COUNT(*) AS n_purchases
      FROM purch WHERE p_id NOT IN (SELECT p_id FROM pairs)
    )
    SELECT channel, CAST(attributed_c AS BIGINT) AS attributed_c,
           CAST(n_touches AS BIGINT) AS n_touches,
           CAST(n_purchases AS BIGINT) AS n_purchases
    FROM attributed
    UNION ALL
    SELECT channel, CAST(COALESCE(attributed_c, 0) AS BIGINT),
           CAST(n_touches AS BIGINT), CAST(n_purchases AS BIGINT)
    FROM direct WHERE n_purchases > 0
    """,
)
def attribution_linear(spark, sf_dir):
    """LINEAR multi-touch attribution: each purchase's value splits
    equally (integer centi-credit floor division — deterministic, no
    float allocation) across every click/view by the same user in the
    preceding 7 days; purchases with no preceding touch credit a
    synthetic 'direct' channel — the marketing-analytics allocation
    every warehouse derives between sessionization and LTV.

    Scale shape: the touch⋈purchase pairing is the BINNED range join
    (coarse 7d time buckets + user equi-key → each purchase explodes to
    ≤ 2 bucket rows, never a nested-loop time scan); per-purchase touch
    counts ride one hash aggregation on p_id joined back broadcast-free
    on the same key; the final per-channel rollup is a 3-row aggregate.
    Credits are integer floor divisions of centi-values — bit-exact,
    remainder deliberately unallocated (the standard auditable
    convention)."""
    ev = table(spark, sf_dir, "events")
    purch = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 0)
    ).select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts_ms").alias("p_t"),
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_type").alias("channel"),
        F.col("ts_ms").alias("t_t"),
    )
    pairs = binned_range_join(
        purch,
        touch,
        left_lo=F.col("p_t") - _ATTR_WINDOW,
        left_hi=F.col("p_t") - 1,
        right_ts=F.col("t_t"),
        bin_width=_ATTR_WINDOW,
        keys=["user_id"],
    ).select("p_id", "value_c", "channel")
    cnt = pairs.groupBy("p_id").agg(F.count(F.lit(1)).alias("n_t"))
    attributed = (
        pairs.join(cnt, "p_id")
        .select(
            "channel",
            "p_id",
            F.expr("value_c div n_t").alias("credit_c"),
        )
        .groupBy("channel")
        .agg(
            F.sum("credit_c").cast("long").alias("attributed_c"),
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.count_distinct("p_id").cast("long").alias("n_purchases"),
        )
    )
    direct = (
        purch.join(pairs.select("p_id").distinct(), "p_id", "left_anti")
        .agg(
            F.coalesce(F.sum("value_c"), F.lit(0)).cast("long").alias("attributed_c"),
            F.lit(0).cast("long").alias("n_touches"),
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
        )
        .filter(F.col("n_purchases") > 0)
        .select(F.lit("direct").alias("channel"), "attributed_c", "n_touches", "n_purchases")
    )
    return attributed.unionByName(direct)


# ===========================================================================
# A/B experiment analysis with CUPED variance reduction
# ===========================================================================

from uts_spark.functions.hashing import duck_hash64, hash64  # noqa: E402
from uts_spark.registry import NOW_MS  # noqa: E402

_AB_CUT = NOW_MS - 14 * DAY  # pre-period | experiment-period boundary


def _duck_ab_cuped() -> str:
    return f"""
    WITH u AS (
      SELECT user_id,
             CAST({duck_hash64("concat('ab:', user_id)")} % 2 AS BIGINT) AS grp,
             SUM(CASE WHEN event_type = 'purchase' AND {MS} < {_AB_CUT}
                      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS x,
             SUM(CASE WHEN event_type = 'purchase' AND {MS} >= {_AB_CUT}
                      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS y
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*x) AS sxx, SUM(x*y) AS sxy, SUM(y*y) AS syy,
             SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n_t,
             SUM(CASE WHEN grp = 1 THEN x ELSE 0 END) AS sx_t,
             SUM(CASE WHEN grp = 1 THEN y ELSE 0 END) AS sy_t,
             SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n_c,
             SUM(CASE WHEN grp = 0 THEN x ELSE 0 END) AS sx_c,
             SUM(CASE WHEN grp = 0 THEN y ELSE 0 END) AS sy_c
      FROM u
    ),
    d AS (
      SELECT *,
             CAST(sx AS DOUBLE) / n AS xbar, CAST(sy AS DOUBLE) / n AS ybar,
             CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n) AS cov,
             CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) AS varx,
             CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n) AS vary
      FROM m
    ),
    t AS (
      SELECT *, CASE WHEN varx > 0 THEN cov / varx ELSE 0 END AS theta,
             CAST(sy_t AS DOUBLE) / n_t AS ybar_t, CAST(sy_c AS DOUBLE) / n_c AS ybar_c,
             CAST(sx_t AS DOUBLE) / n_t AS xbar_t, CAST(sx_c AS DOUBLE) / n_c AS xbar_c
      FROM d
    )
    SELECT CAST(n_t AS BIGINT) AS n_treat, CAST(n_c AS BIGINT) AS n_ctrl,
           ybar_t AS mean_treat_c, ybar_c AS mean_ctrl_c,
           ybar_t - ybar_c AS lift_c,
           theta,
           (ybar_t - theta * (xbar_t - xbar))
             - (ybar_c - theta * (xbar_c - xbar)) AS adj_lift_c,
           CASE WHEN vary > 0
                THEN (2 * theta * cov - theta * theta * varx) / vary
                ELSE 0 END AS var_reduction
    FROM t
    """


@query("ab_test_cuped", _duck_ab_cuped())
def ab_test_cuped(spark, sf_dir):
    """A/B experiment readout with CUPED variance reduction (Deng et
    al., WSDM'13): users split 50/50 by the portable hash, per-user
    purchase revenue in the experiment window (last 14 days) is the
    metric, pre-period revenue the covariate; theta = cov(x,y)/var(x)
    adjusts the arm means and the report quantifies how much variance
    the covariate removed — the standard experimentation-platform
    readout.

    Exactness: per-user revenues are centi-integers, all second moments
    accumulate as exact longs in one aggregation pass, and every double
    (means, theta, adjusted lift, variance reduction) derives from those
    integers through formulas written IDENTICALLY on both engines — so
    even the variance arithmetic hash-matches. Scale: one shuffle on
    user_id, then a 1-row moment aggregate; nothing widens with event
    count."""
    ev = table(spark, sf_dir, "events")
    vc = F.round(F.col("value") * 100).cast("long")
    is_purch = F.col("event_type") == "purchase"
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(is_purch & (F.col("ts_ms") < _AB_CUT), vc).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(is_purch & (F.col("ts_ms") >= _AB_CUT), vc).otherwise(0)
        ).alias("y"),
    ).withColumn(
        "grp",
        F.pmod(hash64(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))), F.lit(2)),
    )
    t1 = F.col("grp") == 1
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.when(t1, 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(t1, F.col("x")).otherwise(0)).alias("sx_t"),
        F.sum(F.when(t1, F.col("y")).otherwise(0)).alias("sy_t"),
        F.sum(F.when(~t1, 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(~t1, F.col("x")).otherwise(0)).alias("sx_c"),
        F.sum(F.when(~t1, F.col("y")).otherwise(0)).alias("sy_c"),
    )
    D = lambda c: F.col(c).cast("double")  # noqa: E731
    xbar, ybar = D("sx") / D("n"), D("sy") / D("n")
    cov = D("sxy") / D("n") - (D("sx") / D("n")) * (D("sy") / D("n"))
    varx = D("sxx") / D("n") - (D("sx") / D("n")) * (D("sx") / D("n"))
    vary = D("syy") / D("n") - (D("sy") / D("n")) * (D("sy") / D("n"))
    theta = F.when(varx > 0, cov / varx).otherwise(F.lit(0.0))
    ybar_t, ybar_c = D("sy_t") / D("n_t"), D("sy_c") / D("n_c")
    xbar_t, xbar_c = D("sx_t") / D("n_t"), D("sx_c") / D("n_c")
    return m.select(
        F.col("n_t").cast("long").alias("n_treat"),
        F.col("n_c").cast("long").alias("n_ctrl"),
        ybar_t.alias("mean_treat_c"),
        ybar_c.alias("mean_ctrl_c"),
        (ybar_t - ybar_c).alias("lift_c"),
        theta.alias("theta"),
        (
            (ybar_t - theta * (xbar_t - xbar))
            - (ybar_c - theta * (xbar_c - xbar))
        ).alias("adj_lift_c"),
        F.when(vary > 0, (2 * theta * cov - theta * theta * varx) / vary)
        .otherwise(F.lit(0.0))
        .alias("var_reduction"),
    )


# ===========================================================================
# Session-to-day time attribution (interval overlap splitting)
# ===========================================================================

@query(
    "session_day_attribution",
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
      SELECT user_id, MIN(t) AS s_start, MAX(t) AS s_end
      FROM s GROUP BY user_id, sid
    ),
    split AS (
      SELECT unnest(range(s_start // {DAY}, s_end // {DAY} + 1)) AS d,
             s_start, s_end
      FROM sess
    )
    SELECT d * {DAY} AS day_ms,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(LEAST(s_end, (d + 1) * {DAY})
                    - GREATEST(s_start, d * {DAY})) AS BIGINT)
             AS attributed_ms
    FROM split GROUP BY d
    """,
)
def session_day_attribution(spark, sf_dir):
    """Interval-to-bucket TIME ATTRIBUTION: each 30-min-gap session's
    duration splits across the calendar days it spans (overlap of
    [start, end] with each day), so per-day engagement sums to exactly
    the total session time — the allocation step behind every
    time-spent dashboard, and the batch twin of hopping-window
    accounting (a session crossing midnight credits both days, pro
    rata).

    Scale: sessionization is the native session_window merge (one
    shuffle on user_id); each session then explodes to its spanned days
    only (gap-bounded sessions span 1-2 days, so the explode is ~1× the
    session count — never a per-ms or per-hour blowup) and a tiny
    per-day aggregation finishes. Overlap arithmetic is pure integer
    milliseconds — hash-exact."""
    ev = table(spark, sf_dir, "events")
    sess = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.min("ts_ms").alias("s_start"), F.max("ts_ms").alias("s_end"))
        .select("s_start", "s_end")
    )
    d0 = F.floor(F.col("s_start") / F.lit(DAY)).cast("long")
    d1 = F.floor(F.col("s_end") / F.lit(DAY)).cast("long")
    split = sess.select(
        "s_start", "s_end", F.explode(F.sequence(d0, d1)).alias("d")
    )
    return split.groupBy((F.col("d") * DAY).alias("day_ms")).agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(
            F.least(F.col("s_end"), (F.col("d") + 1) * DAY)
            - F.greatest(F.col("s_start"), F.col("d") * DAY)
        ).cast("long").alias("attributed_ms"),
    )


# ===========================================================================
# REAL image decode: pure-stdlib PNG codec lane (round-4 close of the
# "multimodal codecs stubbed" ROADMAP limitation)
# ===========================================================================

@query(
    "multimodal_png_decode",
    """
    WITH d AS (
      SELECT doc_id,
             8 + (doc_id * 7) % 25 AS w,
             8 + (doc_id * 11) % 25 AS h,
             (doc_id % 5) + 1 AS a,
             (doc_id % 7) + 1 AS b,
             doc_id % 256 AS c0
      FROM documents
    ),
    px AS (
      SELECT d.doc_id, d.w, d.h,
             SUM((x.x * d.a + y.y * d.b + d.c0) % 256)      AS sum_r,
             SUM((x.x * d.a + y.y * d.b + d.c0 + 37) % 256) AS sum_g,
             SUM((x.x * d.a + y.y * d.b + d.c0 + 74) % 256) AS sum_b
      FROM d, UNNEST(range(0, d.w)) AS x(x), UNNEST(range(0, d.h)) AS y(y)
      GROUP BY d.doc_id, d.w, d.h
    )
    SELECT doc_id, w AS width, h AS height, CAST(3 AS BIGINT) AS channels,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(sum_r AS BIGINT) AS sum_r,
           CAST(sum_g AS BIGINT) AS sum_g,
           CAST(sum_b AS BIGINT) AS sum_b,
           CAST(sum_r AS DOUBLE) / (w * h) AS mean_r,
           CAST(sum_g AS DOUBLE) / (w * h) AS mean_g,
           CAST(sum_b AS DOUBLE) / (w * h) AS mean_b
    FROM px
    """,
)
def multimodal_png_decode(spark, sf_dir):
    """REAL image decoding, oracle-verified end-to-end: every document
    gets a genuine PNG blob (pure-stdlib encoder, per-row filters 0/1/2,
    pixels a closed form in doc_id), Spark INFLATES AND UNFILTERS the
    actual bytes executor-side (functions/png.decode_png via Arrow
    mapInPandas) and emits per-channel integer pixel sums — while the
    DuckDB oracle recomputes the same statistics ARITHMETICALLY from the
    generative formula, never seeing a byte of PNG. Any decoder defect
    (filter reconstruction, stride, channel order, chunk parsing) breaks
    the hash match; the codec also decodes real-world encoder output
    (tests/test_multimodal_png.py's external fixture).

    Scale: encode and decode are both partition-streamed Arrow batches —
    blobs never leave executors, nothing shuffles but the final stats
    rows; the pattern is exactly how a 100 TB image-corpus QC pass runs
    (decode → per-image stats → tiny aggregate), with this codec or
    PIL behind the same operator seam."""
    from uts_spark.functions.multimodal import synth_png_decode_stats

    docs = table(spark, sf_dir, "documents")
    # encode+decode fused into ONE Arrow pass (optimization r12,
    # guide §4.1): blobs never cross the JVM boundary
    stats = synth_png_decode_stats(docs)
    n = F.col("n_pixels").cast("double")
    return stats.select(
        "doc_id", "width", "height", "channels", "n_pixels",
        "sum_r", "sum_g", "sum_b",
        (F.col("sum_r").cast("double") / n).alias("mean_r"),
        (F.col("sum_g").cast("double") / n).alias("mean_g"),
        (F.col("sum_b").cast("double") / n).alias("mean_b"),
    )


@query(
    "multimodal_png_resize",
    """
    WITH d AS (
      SELECT doc_id,
             8 + (doc_id * 7) % 25 AS w,
             8 + (doc_id * 11) % 25 AS h,
             (doc_id % 5) + 1 AS a,
             (doc_id % 7) + 1 AS b,
             doc_id % 256 AS c0
      FROM documents
    ),
    px AS (
      SELECT d.doc_id, d.w, d.h,
             SUM(((tx.tx * d.w) // 16 * d.a + (ty.ty * d.h) // 16 * d.b
                  + d.c0) % 256)      AS sum_r,
             SUM(((tx.tx * d.w) // 16 * d.a + (ty.ty * d.h) // 16 * d.b
                  + d.c0 + 37) % 256) AS sum_g,
             SUM(((tx.tx * d.w) // 16 * d.a + (ty.ty * d.h) // 16 * d.b
                  + d.c0 + 74) % 256) AS sum_b
      FROM d, UNNEST(range(0, 16)) AS tx(tx), UNNEST(range(0, 16)) AS ty(ty)
      GROUP BY d.doc_id, d.w, d.h
    )
    SELECT doc_id, w AS src_w, h AS src_h,
           CAST(16 AS BIGINT) AS target_w, CAST(16 AS BIGINT) AS target_h,
           CAST(sum_r AS BIGINT) AS sum_r,
           CAST(sum_g AS BIGINT) AS sum_g,
           CAST(sum_b AS BIGINT) AS sum_b
    FROM px
    """,
)
def multimodal_png_resize(spark, sf_dir):
    """REAL resize pipeline, oracle-verified: decode each document's
    actual PNG bytes, nearest-neighbor resample to 16×16 through the
    pure-integer index map src = (dst·src_dim) // 16, RE-ENCODE to PNG
    executor-side, and emit per-channel sums of the resized pixels —
    the full decode→transform→encode loop that `multimodal_resize`
    could only model while codecs were stubbed. The oracle replays the
    index map arithmetically on the generative pixel formula; the
    re-encoded blob length is computed but not compared (zlib output is
    an implementation detail, not a semantic)."""
    from uts_spark.functions.multimodal import synth_png_resize_stats

    docs = table(spark, sf_dir, "documents")
    # encode+decode+resize fused into ONE Arrow pass (optimization r12)
    return synth_png_resize_stats(docs, 16, 16).select(
        "doc_id", "src_w", "src_h", "target_w", "target_h",
        "sum_r", "sum_g", "sum_b",
    )


@query(
    "multimodal_wav_decode",
    """
    WITH d AS (
      SELECT doc_id,
             4000 + (doc_id * 13) % 2000 AS n,
             1 + doc_id % 9 AS a,
             doc_id % 777 AS c0
      FROM documents
    ),
    s AS (
      SELECT d.doc_id, d.n, i.i // 256 AS widx,
             SUM(((i.i * d.a + d.c0) % 2001 - 1000)
                 * ((i.i * d.a + d.c0) % 2001 - 1000)) AS energy
      FROM d, UNNEST(range(0, (d.n // 256) * 256)) AS i(i)
      GROUP BY d.doc_id, d.n, i.i // 256
    )
    SELECT doc_id, CAST(widx AS BIGINT) AS widx,
           CAST(n AS BIGINT) AS n_samples,
           CAST(8000 AS BIGINT) AS framerate,
           CAST(energy AS BIGINT) AS energy,
           sqrt(CAST(energy AS DOUBLE) / 256) AS rms
    FROM s
    """,
)
def multimodal_wav_decode(spark, sf_dir):
    """REAL audio decoding, oracle-verified: every document gets a
    genuine RIFF/WAVE blob (mono 16-bit PCM whose samples are a closed
    form in doc_id), the executors parse the container with the stdlib
    ``wave`` codec — an actual third-party-format parser, not our own
    round-trip — window the decoded PCM into 256-sample frames and emit
    integer energies + IEEE RMS, while the oracle recomputes every
    window arithmetically from the waveform formula. Container parsing,
    sample width, endianness, or windowing defects all break the hash.

    Scale: same contract as the PNG lane — blobs are born and die on
    executors inside Arrow batches; only ~n/256 stat rows per doc ever
    move."""
    from uts_spark.functions.multimodal import synth_wav_energy_windows

    docs = table(spark, sf_dir, "documents")
    # encode+decode fused into ONE Arrow pass (optimization r12)
    return synth_wav_energy_windows(docs)


@query(
    "multimodal_wav_features",
    """
    WITH d AS (
      SELECT doc_id,
             4000 + (doc_id * 13) % 2000 AS n,
             1 + doc_id % 9 AS a,
             doc_id % 777 AS c0
      FROM documents
    ),
    s AS (
      SELECT d.doc_id, d.n, i.i AS i,
             (i.i * d.a + d.c0) % 2001 - 1000 AS v,
             CASE WHEN i.i >= 1
                  THEN ((i.i - 1) * d.a + d.c0) % 2001 - 1000 END AS pv
      FROM d, UNNEST(range(0, d.n)) AS i(i)
    ),
    agg AS (
      SELECT doc_id, MIN(n) AS n,
             MAX(abs(v)) AS peak,
             SUM(abs(v)) AS sum_abs,
             SUM(CASE WHEN pv IS NOT NULL
                       AND ((v >= 0) != (pv >= 0)) THEN 1 ELSE 0 END) AS zc,
             SUM(CASE WHEN pv IS NOT NULL THEN abs(v - pv) ELSE 0 END) AS tv
      FROM s GROUP BY doc_id
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
           CAST(n AS DOUBLE) / 8000 AS duration_sec,
           CAST(peak AS BIGINT) AS peak,
           CAST(sum_abs AS BIGINT) AS sum_abs,
           CAST(zc AS BIGINT) AS zero_crossings,
           CAST(tv AS BIGINT) AS total_variation
    FROM agg
    """,
)
def multimodal_wav_features(spark, sf_dir):
    """Clip-level audio features through the REAL stdlib-wave decode
    (functions/multimodal.wav_clip_features): peak, Σ|s|, zero
    crossings, total variation, duration — the cheap VAD/quality
    signals an audio-corpus pipeline filters on. The oracle replays
    every feature arithmetically from the closed-form waveform, so a
    container-parsing, endianness, or off-by-one defect in the decode
    breaks the hash. Blobs never shuffle; one stat row per clip moves."""
    from uts_spark.functions.multimodal import synth_wav_clip_features

    docs = table(spark, sf_dir, "documents")
    # encode+decode fused into ONE Arrow pass (optimization r12)
    return synth_wav_clip_features(docs)


# ===========================================================================
# Sweep-line concurrency (distributed prefix-sum over interval endpoints)
# ===========================================================================

@query(
    "sessions_max_concurrency",
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
      SELECT user_id, MIN(t) AS s_start, MAX(t) AS s_end
      FROM s GROUP BY user_id, sid
    ),
    sweep AS (
      SELECT user_id, s_start, s_start AS te, 1 AS d FROM sess
      UNION ALL
      SELECT user_id, s_start, s_end + 1, -1 FROM sess
    ),
    curve AS (
      SELECT te,
             SUM(d) OVER (ORDER BY te, d, user_id, s_start
                          ROWS UNBOUNDED PRECEDING) AS c
      FROM sweep
    ),
    peak AS (SELECT MAX(c) AS peak_concurrency FROM curve)
    SELECT (SELECT COUNT(*) FROM sess)          AS n_sessions,
           CAST(p.peak_concurrency AS BIGINT)   AS peak_concurrency,
           (SELECT MIN(te) FROM curve, peak
            WHERE c = peak.peak_concurrency)    AS peak_at_ms
    FROM peak p
    """,
)
def sessions_max_concurrency(spark, sf_dir):
    """SWEEP-LINE over session intervals: +1 at each session start, -1
    just past its end, cumulative sum along the global endpoint order =
    the concurrency curve; the output is its peak and the earliest
    instant achieving it — the room-occupancy / max-concurrent-users
    question every capacity dashboard asks, and the canonical member of
    the sweep-line algorithm family (interval scheduling, overlap
    counting, resource envelopes all reduce to it).

    Scale: the endpoint cumulative sum is the range-partitioned exact
    prefix sum (operators/distributed_rank) — the sweep parallelizes
    with zero single-partition windows, which is exactly what makes
    sweep-line viable on billions of intervals. Tie note: within equal
    (timestamp, delta) groups the SET of prefix values is
    order-independent, so peak and argmin-time are deterministic even
    though individual row ranks are tie-broken arbitrarily (the order
    columns make them total anyway)."""
    ev = table(spark, sf_dir, "events")
    sess = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.min("ts_ms").alias("s_start"), F.max("ts_ms").alias("s_end"))
        .select("user_id", "s_start", "s_end")
    )
    sweep = sess.select(
        "user_id", "s_start", F.col("s_start").alias("te"), F.lit(1).alias("d")
    ).unionByName(
        sess.select(
            "user_id", "s_start", (F.col("s_end") + 1).alias("te"),
            F.lit(-1).alias("d"),
        )
    )
    curve = ranked_cumsum(
        sweep,
        F.col("te"),
        [F.asc("te"), F.asc("d"), F.asc("user_id"), F.asc("s_start")],
        values={"c": F.col("d")},
        n_buckets=64,
    ).select("te", F.col("cum_c").alias("c"))
    n_sess = sess.agg(F.count(F.lit(1)).alias("n_sessions"))
    peak = curve.agg(F.max("c").alias("peak_concurrency"))
    at = (
        curve.crossJoin(F.broadcast(peak))
        .filter(F.col("c") == F.col("peak_concurrency"))
        .agg(F.min("te").alias("peak_at_ms"))
    )
    return (
        n_sess.crossJoin(F.broadcast(peak))
        .crossJoin(F.broadcast(at))
        .select(
            "n_sessions",
            F.col("peak_concurrency").cast("long").alias("peak_concurrency"),
            "peak_at_ms",
        )
    )


# ===========================================================================
# Pointer-based hierarchy rollup (iterative doubling — the data-driven
# complement of the closed-form part_hierarchy_rollup)
# ===========================================================================

from uts_spark.functions.clustering import ancestor_pairs  # noqa: E402
from uts_spark.functions.hashing import duck_hash64, hash64  # noqa: E402


@query(
    "hierarchy_rollup_pointer",
    f"""
    WITH RECURSIVE nodes AS (SELECT p_partkey AS partkey FROM part),
    rev AS (
      SELECT l_partkey AS partkey,
             {{_dc}} AS rev_c
      FROM lineitem GROUP BY l_partkey
    ),
    own AS (
      SELECT n.partkey, COALESCE(r.rev_c, 0) AS rev
      FROM nodes n LEFT JOIN rev r ON r.partkey = n.partkey
    ),
    edges AS (
      SELECT partkey AS node,
             CASE WHEN partkey > 0
                  THEN {duck_hash64("concat('tree:', partkey)")} % partkey
             END AS parent
      FROM nodes
    ),
    anc AS (
      SELECT node, parent AS anc FROM edges WHERE parent IS NOT NULL
      UNION
      SELECT a.node, e.parent
      FROM anc a JOIN edges e ON e.node = a.anc
      WHERE e.parent IS NOT NULL
    ),
    d AS (
      SELECT a.anc AS partkey, SUM(o.rev) AS drev, COUNT(*) AS ndesc
      FROM anc a JOIN own o ON o.partkey = a.node GROUP BY a.anc
    ),
    na AS (SELECT node AS partkey, COUNT(*) AS nanc FROM anc GROUP BY node)
    SELECT o.partkey,
           o.rev + COALESCE(d.drev, 0)        AS subtree_revenue_c,
           CAST(COALESCE(d.ndesc, 0) AS BIGINT) AS n_descendants,
           CAST(COALESCE(na.nanc, 0) AS BIGINT) AS n_ancestors
    FROM own o
    LEFT JOIN d ON d.partkey = o.partkey
    LEFT JOIN na ON na.partkey = o.partkey
    """.replace("{_dc}", _duck_csum('l_extendedprice * (1 - l_discount)')),
)
def hierarchy_rollup_pointer(spark, sf_dir):
    """Subtree rollup over a DATA-DRIVEN pointer forest — parent(p) =
    hash64('tree:'||p) mod p (portable hash, strictly decreasing →
    acyclic, random-attachment depth ≈ ln n): every part's subtree
    revenue, descendant count, and ancestry depth. The iterative
    complement of part_hierarchy_rollup's closed-form explode: when the
    parent edge is arbitrary DATA, ancestor closure needs
    pointer-doubling (functions/clustering.ancestor_pairs — repeated
    squaring, O(log depth) self-join rounds, per-round localCheckpoint,
    shuffle width ∝ the Σdepth pair set), exactly the recursive-CTE ↔
    iterative-join correspondence the oracle checks: DuckDB walks the
    recursion row-at-a-time, Spark squares it in ~log₂(depth) rounds."""
    part = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("partkey")
    )
    li = table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        _csum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_c")
    )
    own = part.join(rev, "partkey", "left").select(
        "partkey", F.coalesce("rev_c", F.lit(0)).alias("rev")
    )
    edges = part.select(
        F.col("partkey").alias("node"),
        F.when(
            F.col("partkey") > 0,
            F.pmod(
                hash64(F.concat(F.lit("tree:"), F.col("partkey").cast("string"))),
                F.col("partkey"),
            ),
        ).alias("parent"),
    )
    pairs = ancestor_pairs(edges, "node", "parent", doublings=6)
    d = (
        pairs.join(own.select(F.col("partkey").alias("node"), "rev"), "node")
        .groupBy(F.col("anc").alias("partkey"))
        .agg(F.sum("rev").alias("drev"), F.count(F.lit(1)).alias("ndesc"))
    )
    na = pairs.groupBy(F.col("node").alias("partkey")).agg(
        F.count(F.lit(1)).alias("nanc")
    )
    return (
        own.join(d, "partkey", "left")
        .join(na, "partkey", "left")
        .select(
            "partkey",
            (F.col("rev") + F.coalesce("drev", F.lit(0))).alias("subtree_revenue_c"),
            F.coalesce("ndesc", F.lit(0)).cast("long").alias("n_descendants"),
            F.coalesce("nanc", F.lit(0)).cast("long").alias("n_ancestors"),
        )
    )


@query(
    "multimodal_gzip_corpus",
    r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
           md5(text) AS content_md5
    FROM documents
    """,
)
def multimodal_gzip_corpus(spark, sf_dir):
    """COMPRESSED-CORPUS ingestion, round-tripped for real: every
    document is gzip-compressed executor-side (stdlib, mtime pinned for
    deterministic members) into an opaque binary column — the WARC/WET
    / .jsonl.gz shape LLM pipelines actually receive — then GUNZIPPED
    in a second Arrow-batched lane that emits plaintext statistics and
    the md5 of the recovered bytes. The oracle reads the ORIGINAL text
    column, so a hash match proves the compress→store→decompress loop
    is bit-exact end-to-end (the compressed length is computed by the
    operator but excluded here: gzip output is a zlib implementation
    detail, not a semantic).

    Scale: same contract as the PNG/WAV lanes — blobs live and die
    inside executor Arrow batches, spread across cores; only the stat
    rows shuffle."""
    from uts_spark.functions.multimodal import synth_gzip_text_stats

    docs = table(spark, sf_dir, "documents")
    # compress+decompress fused into ONE Arrow pass (optimization r12)
    return synth_gzip_text_stats(docs).select(
        "doc_id", "n_chars", "n_tokens", "content_md5"
    )


@query(
    "multimodal_jpeg_decode",
    """
    WITH d AS (
      SELECT doc_id,
             2 + (doc_id * 7) % 4 AS bw,
             2 + (doc_id * 11) % 4 AS bh,
             (doc_id % 5) + 1 AS a,
             (doc_id % 7) + 1 AS b,
             doc_id % 96 AS c
      FROM documents
    ),
    blk AS (
      SELECT d.doc_id, d.bw, d.bh,
             128 + 2 * (((bx.bx * d.a + by.by * d.b + d.c) % 96) - 48) AS v
      FROM d, UNNEST(range(0, d.bw)) AS bx(bx), UNNEST(range(0, d.bh)) AS by(by)
    ),
    agg AS (
      SELECT doc_id, bw, bh,
             SUM(64 * v) AS sum_px, SUM(64 * v * v) AS sum_sq,
             MIN(v) AS min_px, MAX(v) AS max_px
      FROM blk GROUP BY doc_id, bw, bh
    )
    SELECT doc_id, bw * 8 AS width, bh * 8 AS height,
           CAST(bw * bh * 64 AS BIGINT) AS n_pixels,
           CAST(sum_px AS BIGINT) AS sum_px,
           CAST(sum_sq AS BIGINT) AS sum_sq,
           CAST(min_px AS BIGINT) AS min_px,
           CAST(max_px AS BIGINT) AS max_px,
           CAST(sum_px AS DOUBLE) / (bw * bh * 64) AS mean_px
    FROM agg
    """,
)
def multimodal_jpeg_decode(spark, sf_dir):
    """REAL JPEG decoding, oracle-verified end-to-end: every document
    gets a genuine baseline JPEG (functions/jpeg.py — standards-
    conformant stream with Annex-K Huffman tables), Spark runs the FULL
    decode pipeline executor-side (marker parse, canonical Huffman over
    the byte-stuffed entropy stream, DC prediction, dequantize, 8×8
    IDCT, level shift) and emits integer pixel statistics — while the
    DuckDB oracle recomputes them ARITHMETICALLY from the generative
    formula, never seeing a byte of JPEG. The corpus is the one
    construction where a LOSSY codec is still closed-form decodable:
    DC-only blocks with q0=16 reconstruct EXACTLY to 128 + 2k (F00/8
    integral — no rounding, no clamp in range). Any defect in the
    entropy decoder, predictor, dequantizer, or IDCT shifts the hash.
    General decode (AC coefficients, 4:4:4 color, real-world 4:2:0)
    is pinned in tests/test_multimodal_jpeg.py against an independent
    IDCT reference and the CPython test suite's python.jpg.

    Scale: same contract as the PNG lane — encode and decode are
    Arrow-batched and core-spread; blobs never leave executors; only
    stat rows shuffle."""
    from uts_spark.functions.multimodal import synth_jpeg_decode_stats

    docs = table(spark, sf_dir, "documents")
    # encode+decode fused into ONE Arrow pass (optimization r12)
    stats = synth_jpeg_decode_stats(docs)
    return stats.select(
        "doc_id", "width", "height", "n_pixels",
        "sum_px", "sum_sq", "min_px", "max_px",
        (F.col("sum_px").cast("double") / F.col("n_pixels").cast("double"))
        .alias("mean_px"),
    )


@query(
    "multimodal_jpeg_resize",
    """
    WITH d AS (
      SELECT doc_id,
             2 + (doc_id * 7) % 4 AS bw,
             2 + (doc_id * 11) % 4 AS bh,
             (doc_id % 5) + 1 AS a,
             (doc_id % 7) + 1 AS b,
             doc_id % 96 AS c
      FROM documents
    ),
    px AS (
      SELECT d.doc_id, d.bw, d.bh,
             128 + 2 * (((((tx.tx * (d.bw * 8)) // 16) // 8) * d.a
                       + ((((ty.ty * (d.bh * 8)) // 16) // 8) * d.b)
                       + d.c) % 96 - 48) AS v
      FROM d, UNNEST(range(0, 16)) AS tx(tx), UNNEST(range(0, 16)) AS ty(ty)
    )
    SELECT doc_id, bw * 8 AS src_w, bh * 8 AS src_h,
           CAST(16 AS BIGINT) AS target_w, CAST(16 AS BIGINT) AS target_h,
           CAST(SUM(v) AS BIGINT) AS sum_px,
           CAST(MIN(v) AS BIGINT) AS min_px,
           CAST(MAX(v) AS BIGINT) AS max_px
    FROM px GROUP BY doc_id, bw, bh
    """,
)
def multimodal_jpeg_resize(spark, sf_dir):
    """REAL JPEG resize, oracle-verified: decode each document's actual
    baseline-JPEG bytes (full entropy-decode + IDCT), nearest-neighbor
    resample to 16×16 through the pure-integer index map
    src = (dst·src_dim)//16, and emit integer stats of the resized
    pixels — while the oracle replays the same index map on the
    generative DC-block formula (pixel at (sy, sx) is the block
    constant of (sy//8, sx//8)), never touching a byte. Completes the
    JPEG lane's decode → transform loop alongside the PNG twin."""
    from uts_spark.functions.multimodal import synth_jpeg_resize_stats

    docs = table(spark, sf_dir, "documents")
    # encode+decode+resize fused into ONE Arrow pass (optimization r12)
    return synth_jpeg_resize_stats(docs, 16, 16)
