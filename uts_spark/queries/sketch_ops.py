"""Round-4 widening, part 3: mergeable-sketch and late-interaction
families — an OWN deterministic HyperLogLog (register-exact, so the
external oracle can replay it bit-for-bit, unlike the engine-private
HLL++ demoted to DEMOS in round 4), a mergeable quantile digest, and
friends.

Reference parity note: none of these exist in the reference engine
(mixer/uts folds one in-memory series; see uts.ts) — they are §2.7
north-star extensions.  The design goal throughout: every sketch is
MERGEABLE (register/partial merge == direct computation, proven by
emitting both rows), because at 100 TB sketches are built per-partition
and merged, never computed globally.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from uts_spark.functions.hashing import duck_hash64, hash64
from uts_spark.registry import query, table

# --- HyperLogLog parameters (p=8 → m=256 registers) -----------------------
#
# The 60-bit portable hash (functions/hashing.py) splits into the top 8
# bucket bits and the low 52 "rho" bits; rho = leading-zeros-in-52 + 1
# (max 53).  The register sum Σ 2^-reg is kept EXACT by scaling with
# 2^53: term = 2^(53-reg) is an integer ≥ 1, the 256-bucket sum fits in
# 61 bits, and absent buckets contribute 2^53 each.  The estimate
# α·m²/Σ2^-reg is then A / reg_sum — ONE IEEE division of a literal by
# an exact integer, bit-identical across JVM and C++.
_HLL_P = 8
_HLL_M = 1 << _HLL_P
_HLL_REST_BITS = 60 - _HLL_P
_HLL_MASK = (1 << _HLL_REST_BITS) - 1
_HLL_RHO_MAX = _HLL_REST_BITS + 1  # 53
_HLL_ZERO_TERM = 1 << _HLL_RHO_MAX  # 2^53, the term of an untouched register
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)
_HLL_A = _HLL_ALPHA * _HLL_M * _HLL_M * float(_HLL_ZERO_TERM)
_HLL_A_LIT = repr(_HLL_A)


def _hll_row_sql(scope_expr: str, regs: str, exact: str) -> str:
    """One oracle output row (scope, n_exact, zero_regs, reg_sum) from a
    register CTE ``regs(bucket, reg)`` and an exact-count scalar."""
    return f"""
      SELECT {scope_expr} AS scope,
             ({exact}) AS n_exact,
             {_HLL_M} - COUNT(*) AS zero_regs,
             SUM(CAST(power(2.0, {_HLL_RHO_MAX} - reg) AS BIGINT))
               + ({_HLL_M} - COUNT(*)) * {_HLL_ZERO_TERM} AS reg_sum
      FROM {regs}
    """


_HLL_ORACLE = f"""
WITH el AS (
  SELECT event_type,
         concat('hll:', CAST(event_id AS VARCHAR)) AS elem,
         {duck_hash64("concat('hll:', CAST(event_id AS VARCHAR))")} AS h
  FROM events
),
rh AS (
  SELECT event_type, elem,
         (h >> {_HLL_REST_BITS}) AS bucket,
         CASE WHEN (h & {_HLL_MASK}) = 0 THEN {_HLL_RHO_MAX}
              ELSE {_HLL_RHO_MAX} - length(bin(h & {_HLL_MASK})) END AS rho
  FROM el
),
regs AS (SELECT event_type, bucket, MAX(rho) AS reg FROM rh GROUP BY 1, 2),
per_type AS (
  SELECT r.scope, ex.n_exact, r.zero_regs, r.reg_sum FROM (
    SELECT event_type AS scope,
           {_HLL_M} - COUNT(*) AS zero_regs,
           SUM(CAST(power(2.0, {_HLL_RHO_MAX} - reg) AS BIGINT))
             + ({_HLL_M} - COUNT(*)) * {_HLL_ZERO_TERM} AS reg_sum
    FROM regs GROUP BY 1
  ) r JOIN (
    SELECT event_type AS scope, COUNT(DISTINCT elem) AS n_exact
    FROM el GROUP BY 1
  ) ex USING (scope)
),
mregs AS (SELECT bucket, MAX(reg) AS reg FROM regs GROUP BY 1),
m_row AS ({_hll_row_sql("'__merged__'", 'mregs',
                        'SELECT COUNT(DISTINCT elem) FROM el')}),
dregs AS (SELECT bucket, MAX(rho) AS reg FROM rh GROUP BY 1),
d_row AS ({_hll_row_sql("'__direct__'", 'dregs',
                        'SELECT COUNT(DISTINCT elem) FROM el')}),
allrows AS (
  SELECT * FROM per_type
  UNION ALL SELECT * FROM m_row
  UNION ALL SELECT * FROM d_row
)
SELECT scope, n_exact, zero_regs, reg_sum,
       {_HLL_A_LIT} / reg_sum AS hll_est,
       ({_HLL_A_LIT} / reg_sum - n_exact) / n_exact * 100 AS rel_err_pct
FROM allrows
ORDER BY scope
"""


@query("sketch_hll_own", _HLL_ORACLE)
def sketch_hll_own(spark, sf_dir):
    """Own deterministic HyperLogLog (Flajolet et al. 2007): p=8,
    m=256 registers over the portable md5 hash family, one register
    table per event_type, then a REGISTER MERGE (per-bucket max across
    types) for the union sketch — emitted alongside the directly
    computed global sketch to prove merge == direct, the property that
    makes HLL the 100 TB distinct-count workhorse (per-partition
    registers, tiny merge, no second pass over data).

    Everything the oracle compares is integer-exact: the register sum
    is kept scaled by 2^53 so Σ2^-reg is a BIGINT, and the estimate is
    a single IEEE division (literal A / reg_sum) — bit-identical in
    JVM and DuckDB.  Unlike `approx_distinct`/HLL++ (engine-private
    registers, DEMOS-only since round 4), this sketch is externally
    replayable, hash-exact, and still one shuffle wide.

    Scale shape: groupBy(type, bucket) has map-side combine, so the
    shuffle is ≤ types×256 rows regardless of input size; the merge is
    256 rows.  The exact-count lane (for the error column) is the only
    input-sized aggregate and exists purely for validation.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.concat(F.lit("hll:"), F.col("event_id").cast("string")).alias("elem"),
    )
    rest = hash64(F.col("elem")).bitwiseAND(F.lit(_HLL_MASK))
    rh = ev.select(
        "event_type",
        "elem",
        F.shiftright(hash64(F.col("elem")), _HLL_REST_BITS).alias("bucket"),
        F.when(rest == 0, F.lit(_HLL_RHO_MAX))
        .otherwise(F.lit(_HLL_RHO_MAX) - F.length(F.conv(rest, 10, 2)))
        .alias("rho"),
    )
    regs = rh.groupBy("event_type", "bucket").agg(F.max("rho").alias("reg"))

    term = F.expr(f"CAST(power(2.0, {_HLL_RHO_MAX} - reg) AS BIGINT)")

    def row_stats(reg_df, keys):
        return reg_df.groupBy(*keys).agg(
            (F.lit(_HLL_M) - F.count("*")).alias("zero_regs"),
            (
                F.sum(term)
                + (F.lit(_HLL_M) - F.count("*")) * F.lit(_HLL_ZERO_TERM)
            ).alias("reg_sum"),
        )

    per_type = (
        row_stats(regs, ["event_type"])
        .join(
            ev.groupBy("event_type").agg(
                F.countDistinct("elem").alias("n_exact")
            ),
            "event_type",
        )
        .select(F.col("event_type").alias("scope"), "n_exact", "zero_regs", "reg_sum")
    )

    g_exact = ev.agg(F.countDistinct("elem").alias("n_exact"))
    merged = (
        row_stats(regs.groupBy("bucket").agg(F.max("reg").alias("reg")), [])
        .crossJoin(F.broadcast(g_exact))
        .select(F.lit("__merged__").alias("scope"), "n_exact", "zero_regs", "reg_sum")
    )
    direct = (
        row_stats(
            rh.groupBy("bucket").agg(F.max("rho").alias("reg")), []
        )
        .crossJoin(F.broadcast(g_exact))
        .select(F.lit("__direct__").alias("scope"), "n_exact", "zero_regs", "reg_sum")
    )

    out = per_type.unionByName(merged).unionByName(direct)
    est = F.lit(_HLL_A) / F.col("reg_sum")
    return (
        out.withColumn("hll_est", est)
        .withColumn(
            "rel_err_pct",
            (est - F.col("n_exact")) / F.col("n_exact") * F.lit(100),
        )
        .orderBy("scope")
    )
