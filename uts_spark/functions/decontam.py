"""Benchmark decontamination: flag training documents sharing word
n-gram shingles with an evaluation set.

The standard hygiene step of a large-corpus build (the reference, a
time-series store, has nothing comparable — north-star op): any train
document that shares even one n-gram shingle with any eval document is
contaminated and must be dropped or audited. Expressed as a shingle-hash
equi-join, never a doc×doc comparison:

    train docs ─ shingle+hash ─┐
                               ├─ join on shingle hash → per-doc hit count
    eval docs ── shingle+hash ─┘   (eval side distinct'd first)

Scale notes (100 TB story): per-doc ``array_distinct`` before the
explode caps the row blowup at distinct-shingles-per-doc; the eval side
collapses to one row per distinct shingle hash (typically millions of
rows — AQE broadcasts it when small enough, else it's a plain hash
join on a 64-bit key); the final aggregation is one shuffle on doc_id,
the minimum possible for a per-doc verdict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from uts_spark.functions.hashing import duck_hash64
from uts_spark.functions.text import duck_tokens, duck_word_ngrams, tokens


def shingle_hashes(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """One row per (doc, distinct word-n-gram shingle id). Docs with
    fewer than ``n`` tokens contribute no rows (they cannot overlap).

    Shingle ids are the rotate-XOR combine of native per-token xxhash64
    — same id scheme as functions/dedup.doc_shingle_arrays — built
    ROW-WISE: tokens posexplode to (doc, pos, token-hash) rows and the
    n-gram id is ``lead()`` windows XORed together. The array
    formulation is a trap here: exploding a computed array column lets
    the Generate's implicit ``size > 0`` filter push down and inline
    the whole tokenize+hash expression once per element reference
    (measured 65 s for sf0.1 vs 0.5 s for this shape). One shuffle on
    doc id for the window, which the downstream per-doc distinct
    reuses. The oracle hashes shingle STRINGS with its own md5 family:
    overlap COUNTS agree under any injective id, which is all the
    output exposes."""
    from pyspark.sql.window import Window

    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "__t"),
    ).select("doc_id", "pos", F.xxhash64("__t").alias("__h0"))
    w = Window.partitionBy("doc_id").orderBy("pos")

    def rotl(c, r):
        r = r % 64
        if r == 0:
            return c
        return F.shiftleft(c, r).bitwiseOR(F.shiftrightunsigned(c, 64 - r))

    gram = None
    for k in range(n):
        h = rotl(F.lead("__h0", k).over(w), (17 * k) % 64)
        gram = h if gram is None else gram.bitwiseXOR(h)
    return (
        tok.select("doc_id", gram.alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
    )


def contamination(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
) -> DataFrame:
    """Per contaminated train doc: the number of distinct shingles it
    shares with the eval corpus. Docs with zero overlap are absent
    (semi-join-like output — callers anti-join to get the clean set)."""
    train_sh = shingle_hashes(train, text_col, id_col, n)
    eval_sh = shingle_hashes(eval_set, text_col, id_col, n).select("h").distinct()
    return (
        train_sh.join(eval_sh, "h")
        .groupBy("doc_id")
        .agg(F.count_distinct(F.col("h")).alias("n_shared"))
    )


def duck_shingle_hashes(table: str, id_expr: str, text_expr: str, n: int) -> str:
    grams = duck_word_ngrams(duck_tokens(text_expr), n)
    return (
        f"SELECT doc_id, {duck_hash64('g')} AS h FROM ("
        f"SELECT {id_expr} AS doc_id, unnest(list_distinct({grams})) AS g "
        f"FROM {table})"
    )
