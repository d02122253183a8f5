"""Extended TPC-H join shapes over the driver's tables (SURVEY §2.7 ➕
joins/sorts — categories absent from the reference, `uts.ts` has no joins
at all).

The testdata schema lacks ``partsupp`` and lineitem's
commit/receipt/shipmode columns, so Q2/Q9/Q11 are re-expressed against
lineitem-derived facts with the SAME plan shape as the canonical query
(correlated min, nation×year rollup, scalar-threshold HAVING); Q8/Q15/Q17/
Q19 are the canonical shapes verbatim.

Plan-shape notes (the 100 TB story):
- every dimension (part/supplier/nation/region/customer) broadcasts; the
  fact table shuffles only for its own aggregations;
- correlated scalar subqueries (Q15 max, Q17 per-part avg, Q11 total)
  become a tiny aggregate broadcast back — never a per-row re-scan;
- Q2's arg-min is one ``min(struct(cost, suppkey))`` partial aggregate:
  deterministic tie-break, no window over the whole fact;
- Q19's disjunction is a single pushed-down filter over one broadcast
  hash join — Catalyst does NOT split it into three scans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from uts_spark.registry import DSUM, query, table

DEC = "decimal(38,6)"


def _dsum(col):
    return F.sum(col.cast(DEC)).cast("double")


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ===========================================================================
# Q8 — national market share within a region's market
# ===========================================================================

@query(
    "tpch_q8_market_share",
    f"""
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN part p      ON l.l_partkey = p.p_partkey
        JOIN supplier s  ON l.l_suppkey = s.s_suppkey
        JOIN nation ns   ON s.s_nationkey = ns.n_nationkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN nation nc   ON c.c_nationkey = nc.n_nationkey
        JOIN region r    ON nc.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'AMERICA'
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           {DSUM("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
             / {DSUM('volume')} AS mkt_share
    FROM vol
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """Q8 market share: NATION_3 suppliers' slice of the AMERICA market
    for ECONOMY parts, by order year. Customer-side region filter and
    supplier-side nation tag ride two broadcasts of the same nation dim
    (two roles); one shuffle total (the year aggregation)."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )

    vol = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(r), F.col("nc_region") == r.r_regionkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return vol.groupBy("o_year").agg(
        (_dsum(nation_vol) / _dsum(F.col("volume"))).alias("mkt_share")
    )


# ===========================================================================
# Q9 — profit by supplier nation × year (supplycost-free variant)
# ===========================================================================

@query(
    "tpch_q9_nation_profit",
    f"""
    SELECT ns.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           {DSUM('l.l_extendedprice * (1 - l.l_discount)')} AS sum_profit
    FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY ns.n_name, year(o.o_orderdate)
    """,
)
def tpch_q9_nation_profit(spark, sf_dir):
    """Q9 product-type profit shape (testdata has no ps_supplycost, so
    profit = discounted revenue): LIKE-filtered part dim broadcasts and
    prunes lineitem before the orders join; rollup keyed on a dimension
    attribute × a derived year."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_profit"
            )
        )
    )


# ===========================================================================
# Q15 — top supplier (scalar-max subquery)
# ===========================================================================

@query(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {DSUM('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    """Q15: quarter revenue per supplier, keep the max. The scalar
    subquery is a 1-row aggregate broadcast back into a filter — the
    revenue CTE is computed once (Spark reuses the exchange), never
    re-scanned per row."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ===========================================================================
# Q17 — small-quantity-order revenue (correlated per-part avg)
# ===========================================================================

@query(
    "tpch_q17_small_qty_revenue",
    f"""
    WITH pavg AS (
      SELECT l_partkey,
             {DSUM('l_quantity')} / COUNT(l_quantity) AS avg_qty
      FROM lineitem
      GROUP BY l_partkey
    )
    SELECT {DSUM('l.l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem l
      JOIN part p  ON l.l_partkey = p.p_partkey
      JOIN pavg a  ON l.l_partkey = a.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < 0.2 * a.avg_qty
    """,
)
def tpch_q17_small_qty_revenue(spark, sf_dir):
    """Q17: revenue from orders below 20% of the part's average quantity.
    The correlated AVG decorrelates to a per-part aggregate joined back on
    partkey; the brand filter broadcasts into both sides. Decimal-stable
    avg so the 0.2× threshold compares identically on both engines."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    pavg = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (_dsum(F.col("l_quantity")) / F.count("l_quantity")).alias("avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(pavg, l.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((_dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


# ===========================================================================
# Q19 — disjunctive predicate join
# ===========================================================================

@query(
    "tpch_q19_disjunctive",
    f"""
    SELECT {DSUM('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE
      (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
         AND l.l_quantity >= 1 AND l.l_quantity <= 11)
      OR
      (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
         AND l.l_quantity >= 10 AND l.l_quantity <= 20)
      OR
      (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
         AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def tpch_q19_disjunctive(spark, sf_dir):
    """Q19: three-branch disjunction mixing dim and fact predicates.
    Stays ONE broadcast hash join with the OR evaluated post-join in
    codegen; the per-branch dim predicates also push into the part scan
    as an OR filter (no triple scan)."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & (q >= 1)
        & (q <= 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & (q >= 10)
        & (q <= 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & (q >= 20)
        & (q <= 30)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(b1 | b2 | b3)
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


# ===========================================================================
# Q2 (variant) — cheapest supplier per part: correlated-min arg-min
# ===========================================================================

@query(
    "tpch_q2_min_cost_supplier",
    """
    WITH uc AS (
      SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_cost
      FROM lineitem
    ),
    mc AS (
      SELECT l_partkey, MIN(unit_cost) AS min_cost FROM uc GROUP BY l_partkey
    ),
    best AS (
      SELECT uc.l_partkey, MIN(uc.l_suppkey) AS best_suppkey, m.min_cost
      FROM uc JOIN mc m ON uc.l_partkey = m.l_partkey
                        AND uc.unit_cost = m.min_cost
      GROUP BY uc.l_partkey, m.min_cost
    )
    SELECT b.l_partkey AS p_partkey, p.p_name, s.s_name, b.min_cost
    FROM best b JOIN part p     ON b.l_partkey = p.p_partkey
                JOIN supplier s ON b.best_suppkey = s.s_suppkey
    WHERE p.p_size = 15
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """Q2 shape without partsupp: per part (size 15), the supplier with
    the lowest observed unit price. The correlated MIN is ONE partial
    aggregate `min(struct(cost, suppkey))` — lexicographic struct order
    gives the arg-min with a deterministic suppkey tie-break, no window,
    no self-join re-scan (the oracle spells the same thing relationally).
    Unit cost is a single double division — bit-identical both engines."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = table(spark, sf_dir, "supplier")
    best = (
        l.select(
            "l_partkey",
            F.struct(
                (F.col("l_extendedprice") / F.col("l_quantity")).alias("c"),
                F.col("l_suppkey").alias("k"),
            ).alias("cs"),
        )
        .groupBy("l_partkey")
        .agg(F.min("cs").alias("best"))
        .select(
            "l_partkey",
            F.col("best.c").alias("min_cost"),
            F.col("best.k").alias("best_suppkey"),
        )
    )
    return (
        best.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("best_suppkey") == s.s_suppkey)
        .select(
            F.col("l_partkey").alias("p_partkey"), "p_name", "s_name", "min_cost"
        )
    )


# ===========================================================================
# Q11 (variant) — value concentration with scalar threshold
# ===========================================================================

@query(
    "tpch_q11_value_concentration",
    f"""
    WITH pv AS (
      SELECT l.l_partkey,
             {DSUM('l.l_extendedprice * (1 - l.l_discount)')} AS value
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
                      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_1'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, value
    FROM pv
    WHERE value > (SELECT {DSUM('value')} * 0.001 FROM pv)
    """,
)
def tpch_q11_value_concentration(spark, sf_dir):
    """Q11 shape (lineitem value standing in for availqty×supplycost):
    per-part value from NATION_1's suppliers, keeping parts above 0.1% of
    the national total. The HAVING threshold is a 1-row aggregate of the
    SAME grouped result — Spark computes pv once and reuses the exchange
    for both the filter's broadcast side and the output."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    pv = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value")
        )
    )
    thresh = pv.agg((_dsum(F.col("value")) * F.lit(0.001)).alias("thr"))
    return pv.join(F.broadcast(thresh), F.col("value") > F.col("thr")).select(
        "l_partkey", "value"
    )
