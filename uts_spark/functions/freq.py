"""Frequent-items (heavy hitters) with bounded memory: distributed
Misra-Gries.

The exact token-frequency table (``text_heavy_hitters``) needs one hash
aggregation over the full vocabulary — fine until the vocabulary itself
outgrows executor memory (web-scale corpora: billions of distinct
n-grams). The classic mergeable-summary answer is Misra-Gries: a k-counter
summary whose undercount is bounded by n/(k+1), so every item with true
count > n/(k+1) is guaranteed to survive.

Distributed form (Agarwal et al., "Mergeable Summaries", PODS'12 —
public literature):
  1. each partition streams its tokens through a k-counter MG summary
     (``mapInPandas`` generator — state lives across Arrow batches of
     one partition, O(k) memory however large the partition);
  2. the union of surviving candidate terms is a guaranteed SUPERSET of
     every term with global count > n/(k+1): count(t) > n/(k+1) implies
     count_p(t) > n_p/(k+1) in at least one partition p (averaging),
     and MG's per-stream bound keeps t alive there;
  3. one exact recount restricted to candidates (broadcast semi-join —
     the candidate set is ≤ k·partitions rows) + the threshold filter
     ``cnt·k > n`` yields the EXACT heavy-hitter set.

The candidate set of step 2 depends on partition order; the final output
does not (superset + exact recount) — which is what makes the operator
deterministic and oracle-checkable even though the sketch itself is not.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F


def _mg_partition(k: int):
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for t in pdf["term"]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < k:
                    counters[t] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"term": list(counters.keys())})

    return run


def mg_heavy_hitters(terms: DataFrame, k: int = 64) -> DataFrame:
    """Exact terms with count·k > total, computed with O(k) memory per
    partition for the discovery pass. ``terms`` is a one-column
    DataFrame named ``term``. Returns (term, cnt, share)."""
    candidates = (
        terms.mapInPandas(_mg_partition(k), "term string").distinct()
    )
    counts = (
        terms.join(F.broadcast(candidates), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = terms.agg(F.count(F.lit(1)).alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("total"))
        .select(
            "term",
            "cnt",
            (F.col("cnt").cast("double") / F.col("total")).alias("share"),
        )
    )
