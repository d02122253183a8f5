"""Unicode text hardening (VERDICT r6 #5): normalization as an
operator, plus shingle/script behavior on non-ASCII text.

Every text operator in the repo was exercised only on the synthetic
``[a-z ]`` corpus; real corpora carry combining marks (NFC vs NFD
forms of the same visible string), CJK, ligatures, and mixed scripts.
Three lanes, all hash-exact:

- ``text_normalize_nfc`` — NFC normalization per doc over a DERIVED
  decorated text that embeds decomposed sequences (e+U+0301,
  i+U+0308, A+U+030A), CJK, and a ligature. Spark side is an
  Arrow-batched ``unicodedata.normalize`` (Python is unavoidable:
  Spark has no built-in Unicode normalizer; at fleet scale this is an
  ICU JVM UDF — the plumbing is identical). Oracle: DuckDB's native
  ``nfc_normalize``. Engine parity (ICU vs Python unicodedata) is
  pinned on 2000 adversarial strings in tests/test_corpus_ops.py.
- ``text_normalize_shingle_parity`` — WHY normalization gates dedup:
  character-3-gram shingle sets of the raw (NFD-bearing) text vs its
  NFC form, with the raw-vs-NFC shingle Jaccard per doc. A dedup
  pipeline that skips normalization sees these as different docs.
- ``text_script_profile`` — per-doc script composition (Han / Latin /
  digits / combining marks) via Unicode-category regex counts, pure
  JVM expressions. Spark spells scripts ``\\p{IsHan}`` (Java regex),
  the oracle ``\\p{Han}`` (RE2) — different spellings, same classes.

Reference: none (uts.ts has no text surface) — LLM-pipeline brief item.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from uts_spark.registry import query, table

# decorations carry DECOMPOSED forms on purpose: e+COMBINING ACUTE,
# i+COMBINING DIAERESIS, A+COMBINING RING — NFC composes all three —
# plus CJK (unchanged under NFC) and the fi ligature (an NFKC-only
# change, pinning that this lane is NFC, not NFKC)
_PRE = "Café № "
_POST = " — naïve Ångström 東京 ﬁt 42%"


def _decorated(col: str = "text"):
    return F.concat(F.lit(_PRE), F.col(col), F.lit(_POST))


_DUCK_RAW = f"SELECT doc_id, '{_PRE}' || text || '{_POST}' AS raw FROM documents"


def _normalized_docs(docs):
    """(doc_id, raw, nfc): the decorated text and its NFC form, one
    Arrow-batched pass (the only Python in this module — Spark lacks a
    built-in normalizer; everything downstream is JVM expressions)."""

    base = docs.select("doc_id", _decorated().alias("raw"))

    def norm(batches):
        import unicodedata

        for pdf in batches:
            pdf = pdf.copy()
            pdf["nfc"] = [
                None if s is None else unicodedata.normalize("NFC", s)
                for s in pdf["raw"]
            ]
            yield pdf

    return base.mapInPandas(norm, "doc_id long, raw string, nfc string")


@query(
    "text_normalize_nfc",
    f"""
    SELECT doc_id,
           nfc_normalize(raw) AS nfc_text,
           CAST(octet_length(encode(raw)) AS BIGINT) AS n_bytes_raw,
           CAST(octet_length(encode(nfc_normalize(raw))) AS BIGINT)
             AS n_bytes_nfc,
           raw != nfc_normalize(raw) AS changed
    FROM ({_DUCK_RAW})
    """,
)
def text_normalize_nfc(spark, sf_dir):
    """NFC normalization as a corpus operator (module docstring): the
    normalized text itself is in the output, so the driver's value
    hash pins byte-exact agreement between Python unicodedata and
    DuckDB's ICU-backed nfc_normalize on every doc. Byte lengths
    before/after and a changed flag make the compaction visible
    (every doc changes here — the decorations guarantee a composable
    sequence)."""
    nd = _normalized_docs(table(spark, sf_dir, "documents"))
    return nd.select(
        "doc_id",
        F.col("nfc").alias("nfc_text"),
        F.octet_length("raw").cast("long").alias("n_bytes_raw"),
        F.octet_length("nfc").cast("long").alias("n_bytes_nfc"),
        (F.col("raw") != F.col("nfc")).alias("changed"),
    )


# character 3-gram shingle set; code-point substrings agree between
# Spark (UTF8String code points) and DuckDB (code-point length/substr)
_SH_SPARK = (
    "array_distinct(transform(sequence(1, greatest(length({c}) - 2, 1)), "
    "i -> substring({c}, i, 3)))"
)
_SH_DUCK = (
    "list_distinct(list_transform(range(1, greatest(length({c}) - 2, 1) + 1), "
    "i -> substr({c}, i, 3)))"
)


@query(
    "text_normalize_shingle_parity",
    f"""
    WITH base AS ({_DUCK_RAW}),
    sh AS (
      SELECT doc_id,
             {_SH_DUCK.format(c='raw')} AS sr,
             {_SH_DUCK.format(c='nfc_normalize(raw)')} AS sn
      FROM base
    )
    SELECT doc_id,
           CAST(len(sr) AS BIGINT) AS n_sh_raw,
           CAST(len(sn) AS BIGINT) AS n_sh_nfc,
           CAST(len(list_intersect(sr, sn)) AS BIGINT) AS n_sh_shared,
           CAST(len(list_intersect(sr, sn)) AS DOUBLE)
             / len(list_distinct(list_concat(sr, sn))) AS sh_jaccard
    FROM sh
    """,
)
def text_normalize_shingle_parity(spark, sf_dir):
    """Character-shingle sets of the raw (decomposed) text vs its NFC
    form, with the cross-form Jaccard — the measurement behind the
    'normalize before dedup' rule: identical visible strings in
    different normal forms share only part of their shingles (the
    decorated docs land well below 1.0 here), so an unnormalized
    MinHash pass under-clusters. Pure JVM set expressions after the
    one normalization pass; the Jaccard is a single IEEE division of
    exact intersection/union cardinalities — hash-exact."""
    nd = _normalized_docs(table(spark, sf_dir, "documents"))
    sh = nd.select(
        "doc_id",
        F.expr(_SH_SPARK.format(c="raw")).alias("sr"),
        F.expr(_SH_SPARK.format(c="nfc")).alias("sn"),
    )
    inter = F.size(F.array_intersect("sr", "sn"))
    union = F.size(F.array_union("sr", "sn"))
    return sh.select(
        "doc_id",
        F.size("sr").cast("long").alias("n_sh_raw"),
        F.size("sn").cast("long").alias("n_sh_nfc"),
        inter.cast("long").alias("n_sh_shared"),
        (inter.cast("double") / union).alias("sh_jaccard"),
    )


def _cnt_spark(raw, pat: str):
    return (
        F.length(raw) - F.length(F.regexp_replace(raw, pat, ""))
    ).cast("long")


def _cnt_duck(pat: str) -> str:
    return (
        "CAST(length(raw) - length(regexp_replace(raw, "
        f"'{pat}', '', 'g')) AS BIGINT)"
    )


_D_HAN = _cnt_duck(r"[\p{Han}]")
_D_LATIN = _cnt_duck(r"[\p{Latin}]")
_D_DIGIT = _cnt_duck(r"[\p{Nd}]")
_D_MARK = _cnt_duck(r"[\p{M}]")

_SCRIPT_ORACLE = f"""
    SELECT doc_id,
           CAST(length(raw) AS BIGINT) AS n_chars,
           {_D_HAN} AS n_han,
           {_D_LATIN} AS n_latin,
           {_D_DIGIT} AS n_digit,
           {_D_MARK} AS n_mark,
           CASE WHEN {_D_LATIN} >= {_D_HAN}
                THEN 'latin' ELSE 'han' END AS dominant
    FROM ({_DUCK_RAW})
    """


@query("text_script_profile", _SCRIPT_ORACLE)
def text_script_profile(spark, sf_dir):
    """Per-doc script composition over the decorated text — the
    language-routing signal a multilingual pipeline shards on: Unicode
    script/category counts (Han, Latin, decimal digits, combining
    marks) as pure JVM regex-removal expressions (count = length minus
    length-after-removing-the-class), plus a deterministic dominant
    label. Java regex spells scripts \\p{{IsHan}}; the RE2 oracle
    \\p{{Han}} — the classes are the same Unicode data. No shuffle at
    all: this is a map-only scan, the 100 TB shape for routing."""
    docs = table(spark, sf_dir, "documents")
    raw = _decorated()
    n_han = _cnt_spark(raw, r"[\p{IsHan}]")
    n_latin = _cnt_spark(raw, r"[\p{IsLatin}]")
    return docs.select(
        "doc_id",
        F.length(raw).cast("long").alias("n_chars"),
        n_han.alias("n_han"),
        n_latin.alias("n_latin"),
        _cnt_spark(raw, r"[\p{Nd}]").alias("n_digit"),
        _cnt_spark(raw, r"[\p{M}]").alias("n_mark"),
        F.when(n_latin >= n_han, F.lit("latin"))
        .otherwise(F.lit("han"))
        .alias("dominant"),
    )
