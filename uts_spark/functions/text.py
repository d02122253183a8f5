"""Text-analysis operators for large-scale training-data pipelines:
tokenization, token counting, quality scoring, language ID, document
fingerprinting. All pure Column expressions (JVM-side, codegen'd, no
UDFs) with DuckDB-portable semantics so every operator is oracle-checkable.

Scale notes: each operator is a narrow map over the documents table — no
shuffle at all until a downstream groupBy. Regexes are anchored to simple
character classes that mean the same thing in Java regex and RE2.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from uts_spark.functions.hashing import duck_hash64, hash64

TOKEN_RE = "[a-z0-9]+"
PUNCT_RE = "[.,;:!?]"

# Tiny stopword lexicons for the n-gram/stopword language heuristic.
# Order matters: ties resolve by this precedence (first wins).
LANGS = ("en", "de", "fr", "es")
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "en", "por"],
}


def tokens(col: Column) -> Column:
    """Lowercased word tokens (alnum runs)."""
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE), F.lit(0))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def stopword_count(toks: Column, lang: str) -> Column:
    """Occurrence count (not distinct) of the language's stopwords."""
    lex = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(lex, t)))


def lang_id(col: Column) -> Column:
    """Argmax of stopword-occurrence scores with fixed precedence
    (LANGS order). A deterministic heuristic — the point is the scalable
    shape (pure expressions), not linguistic accuracy."""
    toks = tokens(col)
    scores = [stopword_count(toks, lang) for lang in LANGS]
    best = F.greatest(*scores)
    expr = F.lit("unknown")
    for lang, score in reversed(list(zip(LANGS, scores))):
        expr = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_metrics(col: Column) -> dict[str, Column]:
    """Raw quality signals; combine with :func:`quality_score`."""
    toks = tokens(col)
    n_chars = F.length(col)
    n_tokens = F.size(toks)
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "mean_token_len": (
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
            .cast("double")
            / n_tokens
        ),
        "punct_ratio": (
            F.regexp_count(col, F.lit(PUNCT_RE)).cast("double") / n_chars
        ),
        "stopword_ratio": (
            stopword_count(toks, "en").cast("double") / n_tokens
        ),
    }


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality score. Weighted mix of length saturation,
    mean token length window, punctuation moderation, stopword presence —
    the standard cheap pre-filter shape for LLM corpus cleaning. The exact
    op order is mirrored in the DuckDB oracle (queries/llm_ops.py)."""
    m = quality_metrics(col)
    length_sat = F.least(m["n_tokens"].cast("double") / F.lit(64.0), F.lit(1.0))
    tok_len_ok = F.when(
        (m["mean_token_len"] >= 3.0) & (m["mean_token_len"] <= 8.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    punct_ok = F.greatest(F.lit(0.0), F.lit(1.0) - m["punct_ratio"] * F.lit(10.0))
    stop_ok = F.least(m["stopword_ratio"] * F.lit(5.0), F.lit(1.0))
    return (
        length_sat * F.lit(0.4)
        + tok_len_ok * F.lit(0.2)
        + punct_ok * F.lit(0.2)
        + stop_ok * F.lit(0.2)
    )


# GPT-2-style pre-tokenizer, restricted to the regex subset Java and RE2
# share (no lookahead): contraction suffixes, space-prefixed letter runs,
# digit runs, punctuation runs, whitespace runs. Counting these matches
# estimates LLM token counts ~within the pre-tokenizer's granularity —
# the "BPE-ish" budget metric for training-data pipelines.
BPEISH_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpeish_token_count(col: Column) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pre-tokenizer
    pattern. Pure regexp — JVM-side, linear scan."""
    return F.size(F.regexp_extract_all(col, F.lit(BPEISH_RE), 0))


def duck_bpeish_count(expr: str) -> str:
    quoted = BPEISH_RE.replace("'", "''")  # pattern starts with a quote
    return f"len(regexp_extract_all({expr}, '{quoted}'))"


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-gram shingles joined by a single space; [] if fewer than n
    tokens."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def fingerprint(col: Column, n: int = 5) -> Column:
    """Document fingerprint: min 64-bit hash over word n-gram shingles
    (one-permutation minhash); short docs hash the whole text. Two docs
    sharing a fingerprint share at least one shingle."""
    shingles = word_ngrams(tokens(col), n)
    return F.when(
        F.size(shingles) > 0,
        F.array_min(F.transform(shingles, lambda s: hash64(s))),
    ).otherwise(hash64(col))


# --------------------------------------------------------------------------
# DuckDB mirrors (SQL fragments) for the oracle side

def duck_tokens(expr: str) -> str:
    return f"regexp_extract_all(lower({expr}), '{TOKEN_RE}')"


def duck_stopword_count(toks: str, lang: str) -> str:
    lex = "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"
    return f"len(list_filter({toks}, t -> list_contains({lex}, t)))"


def duck_word_ngrams(toks: str, n: int) -> str:
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n} + 2), "
        f"i -> array_to_string(({toks})[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )


def duck_fingerprint(expr: str, toks: str, n: int = 5) -> str:
    sh = duck_word_ngrams(toks, n)
    return (
        f"CASE WHEN len({sh}) > 0 THEN "
        f"list_min(list_transform({sh}, s -> {duck_hash64('s')})) "
        f"ELSE {duck_hash64(expr)} END"
    )
