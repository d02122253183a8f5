"""Deterministic sampling / splitting / mixing / packing queries over the
documents table — the selection half of a training-data pipeline
(functions/sampling.py). Every query is hash-driven (portable md5
family), so the DuckDB oracle replays the exact row selection.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from uts_spark.functions.sampling import (
    TWO60,
    domain_mix,
    duck_hash64,
    duck_hash_u,
    duck_pack_greedy,
    hash_u,
    pack_greedy,
    sample_stratified,
    sample_uniform,
    sample_weighted,
    split_assign,
)
from uts_spark.registry import query, table

_RATE = 0.25
_CUT = int(_RATE * TWO60)


@query(
    "sample_uniform_hash",
    f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE {duck_hash64("concat('smp:', CAST(doc_id AS VARCHAR))")} < {_CUT}
    ORDER BY doc_id
    """,
)
def sample_uniform_hash(spark, sf_dir):
    """Bernoulli(0.25) corpus sample, deterministic per doc_id: a pure
    narrow filter (no shuffle, fuses into the scan) whose membership an
    independent engine reproduces exactly — restartable pipelines need
    exactly this property."""
    docs = table(spark, sf_dir, "documents")
    return sample_uniform(docs, _RATE, F.col("doc_id")).select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "sample_stratified_lang",
    f"""
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY {duck_hash_u('strat', 'doc_id')}, doc_id
             ) AS __rn
      FROM documents
    ) WHERE __rn <= 30
    """,
)
def sample_stratified_lang(spark, sf_dir):
    """Exactly 30 docs per language: hash draw defines a deterministic
    shuffle order inside each stratum, take the first 30. One shuffle on
    the stratum key — the balanced-subset op for eval-set construction."""
    docs = table(spark, sf_dir, "documents")
    return sample_stratified(
        docs, F.col("lang"), 30, F.col("doc_id")
    ).select("doc_id", "lang", "n_chars")


@query(
    "sample_weighted_quality",
    f"""
    SELECT doc_id, n_chars
    FROM documents
    WHERE {duck_hash_u('wsmp', 'doc_id')}
          < least(1.0, CAST(n_chars AS DOUBLE) / 1000.0)
    ORDER BY doc_id
    """,
)
def sample_weighted_quality(spark, sf_dir):
    """Per-row Bernoulli(weight) with weight = min(1, n_chars/1000):
    longer documents kept with higher probability — the
    quality-proportional downsampling shape (weight would be a model
    score in production; the mechanics are identical)."""
    docs = table(spark, sf_dir, "documents")
    w = F.least(F.lit(1.0), F.col("n_chars").cast("double") / F.lit(1000.0))
    return sample_weighted(docs, w, F.col("doc_id")).select("doc_id", "n_chars")


@query(
    "split_train_eval",
    f"""
    SELECT doc_id,
           CASE WHEN {duck_hash_u('split', 'doc_id')} < 0.75 THEN 'train'
                WHEN {duck_hash_u('split', 'doc_id')} < 0.875 THEN 'eval'
                ELSE 'test' END AS split
    FROM documents
    ORDER BY doc_id
    """,
)
def split_train_eval(spark, sf_dir):
    """Disjoint 75/12.5/12.5 train/eval/test labels by hash bucket —
    stable across reruns and machines (no RNG state), which is the
    leakage-safety property a split must have. Dyadic boundaries (0.75,
    0.875) are exact in binary, so both engines compare identically."""
    docs = table(spark, sf_dir, "documents")
    return split_assign(
        docs, F.col("doc_id"), {"train": 0.75, "eval": 0.125, "test": 0.125}
    ).select("doc_id", "split")


_MIX_TARGETS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
_MIX_BUDGET = 60


def _mix_share_sql() -> str:
    branches = " ".join(
        f"WHEN source = '{k}' THEN {v!r}" for k, v in _MIX_TARGETS.items()
    )
    return f"CASE {branches} END"


@query(
    "domain_mix_rebalance",
    f"""
    WITH counted AS (
      SELECT doc_id, source, n_chars,
             COUNT(*) OVER (PARTITION BY source) AS __have,
             {_mix_share_sql()} AS __share
      FROM documents
    )
    SELECT doc_id, source, n_chars
    FROM counted
    WHERE __share IS NOT NULL
      AND {duck_hash_u('mix', 'doc_id')}
          < least(1.0, (__share * {float(_MIX_BUDGET)!r}) / __have)
    ORDER BY doc_id
    """,
)
def domain_mix_rebalance(spark, sf_dir):
    """Rebalance toward target domain shares (40/30/20/10 over
    src0..src3, budget 60): per-domain rate = min(1, want/have), applied
    as a deterministic hash filter. The count aggregate is tiny and
    broadcast back; domains outside the target map are dropped (inner
    join) — the mixture-weighting op of a pretraining data recipe."""
    docs = table(spark, sf_dir, "documents")
    return domain_mix(
        docs, F.col("source"), _MIX_TARGETS, _MIX_BUDGET, F.col("doc_id")
    ).select("doc_id", "source", "n_chars")


_PACK_BUDGET = 2048
_PACK_SHARDS = 8


@query(
    "pack_sequences_greedy",
    duck_pack_greedy(
        "SELECT doc_id, n_chars FROM documents",
        "n_chars",
        "doc_id",
        _PACK_BUDGET,
        _PACK_SHARDS,
    ),
)
def pack_sequences_greedy(spark, sf_dir):
    """Greedy sequence packing: fill 2048-char packs per shard (8
    hash-shards, shard-parallel applyInPandas; deterministic hash order
    inside a shard). The oracle replays the same greedy fill as a
    recursive CTE — packing is the context-window-filling op of LLM
    pretraining; sizes here are n_chars (a token count in production)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return pack_greedy(
        docs, F.col("n_chars"), F.col("doc_id"), _PACK_BUDGET, _PACK_SHARDS
    )


_ES_K = 100
_ES_SCALE = 1_000_000  # micro-nat snap for the exponential race keys


@query(
    "sample_weighted_topk_es",
    f"""
    WITH d AS (
      SELECT doc_id, n_chars,
             ({duck_hash64("concat('es:', CAST(doc_id AS VARCHAR))")} + 1)
               / {float(1 << 60)!r} AS u
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, n_chars,
             CAST(ROUND((-LN(u) / n_chars) * {_ES_SCALE}) AS BIGINT) AS es_key
      FROM d
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY es_key, doc_id) AS rnk
      FROM keyed
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight, es_key,
           CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= {_ES_K}
    """,
)
def sample_weighted_topk_es(spark, sf_dir):
    """Weighted sampling WITHOUT replacement, exact size k: the
    Efraimidis–Spirakis exponential race. Each row draws its
    deterministic uniform u (portable hash, shifted into (0,1]) and
    competes with key −ln(u)/w — the k smallest keys win, giving
    inclusion probabilities proportional to weight w (here document
    length) with NO sequential pass and no replacement bookkeeping.
    Keys are snapped to integer micro-nats (the tfidf log convention)
    so both engines rank identical integers; doc_id breaks ties.

    Scale: keys are a pure projection; the top-k is
    TakeOrderedAndProject (per-partition k-heaps + driver merge of
    k·partitions rows) — no global sort, no driver-side weighting
    state. THE way to draw a fixed-budget weighted subsample from a
    100 TB corpus in one pass."""
    from uts_spark.functions.hashing import hash64

    docs = table(spark, sf_dir, "documents")
    # (h + 1) as an INTEGER before the double division — the exact
    # mirror of the oracle expression (adding 1 after a double cast
    # could round differently at the 53-bit mantissa boundary)
    h = hash64(F.concat(F.lit("es:"), F.col("doc_id").cast("string")))
    u = (h + F.lit(1)).cast("double") / F.lit(float(TWO60))
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("weight"),
        F.round((-F.log(u) / F.col("n_chars")) * _ES_SCALE)
        .cast("long")
        .alias("es_key"),
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("es_key", "doc_id")
    return (
        keyed.orderBy("es_key", "doc_id")
        .limit(_ES_K)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
    )


_ESS_K = 25  # per-stratum sample size


@query(
    "sample_stratified_weighted_es",
    f"""
    WITH d AS (
      SELECT doc_id, lang, n_chars,
             ({duck_hash64("concat('ess:', CAST(doc_id AS VARCHAR))")} + 1)
               / {float(1 << 60)!r} AS u
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
             CAST(ROUND((-LN(u) / n_chars) * {_ES_SCALE}) AS BIGINT) AS es_key
      FROM d
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                   ORDER BY es_key, doc_id) AS rnk
      FROM keyed
    )
    SELECT doc_id, lang, weight, es_key, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= {_ESS_K}
    """,
)
def sample_stratified_weighted_es(spark, sf_dir):
    """STRATIFIED weighted sampling without replacement: an independent
    Efraimidis–Spirakis exponential race per language, exactly k=25
    winners per stratum with inclusion probability proportional to
    document length WITHIN the stratum — the balanced-mixture sampler
    (domain quotas + length weighting in one pass) that plain ES
    (sample_weighted_topk_es) and exact-n stratified sampling
    (sample_stratified_lang) each solve only half of.

    Scale: keys are a pure projection; the per-stratum pick is one
    row_number window over the stratum key — a single shuffle
    partitioned by stratum, no global sort, no driver state."""
    from uts_spark.functions.hashing import hash64
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    h = hash64(F.concat(F.lit("ess:"), F.col("doc_id").cast("string")))
    u = (h + F.lit(1)).cast("double") / F.lit(float(TWO60))
    keyed = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("weight"),
        F.round((-F.log(u) / F.col("n_chars")) * _ES_SCALE)
        .cast("long")
        .alias("es_key"),
    )
    w = Window.partitionBy("lang").orderBy("es_key", "doc_id")
    return (
        keyed.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _ESS_K)
    )


@query(
    "pack_efficiency_eval",
    f"""
    WITH packed AS (
      {duck_pack_greedy(
        "SELECT doc_id, n_chars FROM documents",
        "n_chars",
        "doc_id",
        _PACK_BUDGET,
        _PACK_SHARDS,
      )}
    ),
    per AS (
      SELECT shard, pack,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(MAX(pack_fill) AS BIGINT) AS fill
      FROM packed GROUP BY shard, pack
    ),
    last AS (SELECT shard, MAX(pack) AS last_pack FROM per GROUP BY shard)
    SELECT p.shard, p.pack, p.n_docs, p.fill,
           p.fill / {float(_PACK_BUDGET)!r} AS fill_ratio,
           CAST({_PACK_BUDGET} - p.fill AS BIGINT) AS waste,
           p.pack = l.last_pack AS is_tail
    FROM per p JOIN last l USING (shard)
    """,
)
def pack_efficiency_eval(spark, sf_dir):
    """Packing-EFFICIENCY eval — the metric that judges a packer: per
    (shard, pack), document count, final fill (max of the running
    pack_fill), fill ratio against the 2048 budget, absolute waste,
    and an is_tail flag separating TAIL waste (the last pack per shard
    is legitimately short — no more docs) from PACKING waste (interior
    packs below budget measure greedy fragmentation). Pure aggregation
    over the packer's output: one groupBy per pack + a shard-count-
    sized broadcast join for the tail flag — eval cost is
    packer-output-shaped."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    packed = pack_greedy(
        docs, F.col("n_chars"), F.col("doc_id"), _PACK_BUDGET, _PACK_SHARDS
    )
    per = packed.groupBy("shard", "pack").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("pack_fill").alias("fill"),
    )
    last = per.groupBy("shard").agg(F.max("pack").alias("last_pack"))
    return per.join(F.broadcast(last), "shard").select(
        "shard",
        "pack",
        "n_docs",
        "fill",
        (F.col("fill") / F.lit(float(_PACK_BUDGET))).alias("fill_ratio"),
        (F.lit(_PACK_BUDGET) - F.col("fill")).cast("long").alias("waste"),
        (F.col("pack") == F.col("last_pack")).alias("is_tail"),
    )
