"""Deterministic sampling / splitting / mixture ops for training-data
pipelines, plus greedy sequence packing.

Every operator here is REPRODUCIBLE: selection is driven by the portable
md5 hash family (functions/hashing), never by an RNG, so (a) reruns on
the same corpus pick the same rows — a pipeline restart or a backfill
produces the same training set; (b) an external SQL oracle can replay the
selection bit-for-bit; (c) there is no driver-side state to coordinate
across 1000 executors. ``u = hash64(salt || key) / 2^60`` is a uniform
[0,1) draw per row, computed JVM-side in one expression.

SCALE: uniform/weighted sampling and train/eval splitting are pure
narrow filters — no shuffle at all, they fuse into the scan. Stratified
top-n shuffles once on the stratum key. Domain mixing computes one tiny
per-domain aggregate (broadcast back). Packing shuffles once on the
shard key and runs the greedy fill per shard in parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from uts_spark.functions.hashing import duck_hash64, hash64

TWO60 = 1 << 60


def hash_u(salt: str, key: Column) -> Column:
    """Deterministic uniform [0,1) draw per key (portable hash family)."""
    return hash64(F.concat(F.lit(f"{salt}:"), key.cast("string"))) / F.lit(
        float(TWO60)
    )


def duck_hash_u(salt: str, expr: str) -> str:
    """DuckDB SQL mirroring :func:`hash_u` (same md5 bits, same division)."""
    keyed = f"concat('{salt}:', CAST({expr} AS VARCHAR))"
    return f"CAST({duck_hash64(keyed)} AS DOUBLE) / {float(TWO60)!r}"


def sample_uniform(df: DataFrame, rate: float, key: Column, salt: str = "smp") -> DataFrame:
    """Bernoulli(rate) sample, deterministic per key. Integer compare —
    ``floor(rate·2^60)`` is computed exactly in Python, so there is no
    float-rounding edge for the oracle to disagree on."""
    cut = int(rate * TWO60)
    return df.filter(
        hash64(F.concat(F.lit(f"{salt}:"), key.cast("string"))) < F.lit(cut)
    )


def sample_weighted(df: DataFrame, weight: Column, key: Column, salt: str = "wsmp") -> DataFrame:
    """Per-row Bernoulli(weight) with row-dependent weight in [0,1] —
    quality-weighted downsampling: u < weight keeps high-weight rows with
    proportionally higher probability."""
    return df.filter(hash_u(salt, key) < weight)


def sample_stratified(
    df: DataFrame, stratum: Column, n_per: int, key: Column, salt: str = "strat"
) -> DataFrame:
    """Exactly min(n_per, |stratum|) rows per stratum: the hash draw
    defines a deterministic shuffle order inside each stratum; take the
    first n. One shuffle on the stratum key."""
    w = Window.partitionBy(stratum).orderBy(hash_u(salt, key), key)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per)
        .drop("__rn")
    )


def split_assign(
    df: DataFrame,
    key: Column,
    fractions: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Disjoint train/eval/test split labels by hash bucket: fractions
    map label -> share (must sum to ≤ 1; remainder falls in the last
    label). Membership depends only on (salt, key) — stable across reruns
    and across machines, the property train/test hygiene needs."""
    u = hash_u(salt, key)
    expr = None
    acc = 0.0
    labels = list(fractions.items())
    for name, frac in labels[:-1]:
        acc += frac
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def domain_mix(
    df: DataFrame,
    domain: Column,
    targets: dict[str, float],
    budget: int,
    key: Column,
    salt: str = "mix",
) -> DataFrame:
    """Rebalance a corpus toward target domain shares: domain d should
    contribute ``targets[d] · budget`` rows; its sampling rate is
    ``min(1, want / have)`` (a domain can't contribute more than it has —
    no upsampling). Selection inside a domain is the deterministic hash
    draw. The per-domain count is a tiny aggregate joined back broadcast;
    the corpus itself is touched by one narrow filter."""
    d = df.withColumn("__domain", domain)
    counts = d.groupBy("__domain").agg(F.count(F.lit(1)).alias("__have"))
    tgt = [(k, float(v)) for k, v in targets.items()]
    tdf = df.sparkSession.createDataFrame(tgt, "__domain string, __share double")
    rates = (
        counts.join(F.broadcast(tdf), "__domain", "inner")
        .select(
            "__domain",
            F.least(
                F.lit(1.0),
                (F.col("__share") * F.lit(float(budget))) / F.col("__have"),
            ).alias("__rate"),
        )
    )
    return (
        d.join(F.broadcast(rates), "__domain")
        .filter(hash_u(salt, key) < F.col("__rate"))
        .drop("__domain", "__rate")
    )


def pack_greedy(
    df: DataFrame,
    size: Column,
    key: Column,
    budget: int,
    n_shards: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Greedy sequence packing: bin documents into fixed token-budget
    packs (context-window filling for LLM pretraining).

    Rows are hash-partitioned into ``n_shards`` shards; inside a shard,
    rows are taken in deterministic hash order and appended to the
    current pack until the next row would overflow ``budget``, which
    starts a new pack (a row larger than the whole budget gets a pack of
    its own). Output adds ``shard``, ``pack`` (id within shard),
    ``pack_fill`` (cumulative size inside the pack).

    The greedy fill is inherently sequential PER SHARD — that is the
    parallelism contract: shards run concurrently via applyInPandas (one
    Arrow batch per shard), and n_shards scales with the cluster while
    each shard's row list fits one task. Cross-shard packing quality loss
    vs a global greedy is negligible for corpus >> budget.
    """
    import pandas as pd

    u = hash_u(salt, key)
    shard = F.pmod(hash64(F.concat(F.lit(f"{salt}#:"), key.cast("string"))), F.lit(n_shards))
    base = df.withColumn("__size", size).withColumn("__u", u).withColumn("shard", shard)
    cols = base.columns

    def pack_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__u"], kind="mergesort").reset_index(drop=True)
        packs, fills = [], []
        cur_pack, cur_fill = 0, 0
        for s in pdf["__size"]:
            s = int(s)
            if cur_fill > 0 and cur_fill + s > budget:
                cur_pack += 1
                cur_fill = 0
            cur_fill += s
            packs.append(cur_pack)
            fills.append(cur_fill)
        pdf["pack"] = packs
        pdf["pack_fill"] = fills
        return pdf

    schema = ", ".join(
        f"`{c}` {base.schema[c].dataType.simpleString()}" for c in cols
    ) + ", pack long, pack_fill long"
    out = base.groupBy("shard").applyInPandas(pack_one, schema)
    return out.drop("__size", "__u")


def duck_pack_greedy(
    inner_sql: str,
    size_expr: str,
    key_expr: str,
    budget: int,
    n_shards: int = 8,
    salt: str = "pack",
) -> str:
    """DuckDB oracle for :func:`pack_greedy`: the same greedy fill as a
    RECURSIVE CTE stepping row-by-row per shard (depth = rows in the
    largest shard — fine at oracle scale; the Spark side is the scale
    path). ``inner_sql`` must yield the input relation with ``key_expr``
    available."""
    u = duck_hash_u(salt, key_expr)
    sharded = f"concat('{salt}#:', CAST({key_expr} AS VARCHAR))"
    shard = f"CAST({duck_hash64(sharded)} % {n_shards} AS BIGINT)"
    return f"""
    WITH RECURSIVE base AS (
      SELECT *, {size_expr} AS __size, {u} AS __u, {shard} AS shard
      FROM ({inner_sql})
    ),
    seq AS (
      SELECT *, row_number() OVER (PARTITION BY shard ORDER BY __u, {key_expr}) AS __rn
      FROM base
    ),
    packed AS (
      SELECT shard, __rn, __size, CAST(0 AS BIGINT) AS pack,
             CAST(__size AS BIGINT) AS pack_fill
      FROM seq WHERE __rn = 1
      UNION ALL
      SELECT s.shard, s.__rn, s.__size,
             CASE WHEN p.pack_fill + s.__size > {budget}
                  THEN p.pack + 1 ELSE p.pack END,
             CASE WHEN p.pack_fill + s.__size > {budget}
                  THEN CAST(s.__size AS BIGINT)
                  ELSE p.pack_fill + s.__size END
      FROM seq s JOIN packed p ON s.shard = p.shard AND s.__rn = p.__rn + 1
    )
    SELECT seq.* EXCLUDE (__size, __u, __rn),
           packed.pack, packed.pack_fill
    FROM seq JOIN packed ON seq.shard = packed.shard AND seq.__rn = packed.__rn
    """
