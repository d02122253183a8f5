"""Semantic tests for the deterministic sampling / splitting / mixing /
packing operators (functions/sampling.py). The DuckDB oracle gate covers
hash-exactness; these assert the operator CONTRACTS: determinism across
reruns, exact stratum counts, split disjointness, pack-budget invariants,
mixture rates.
"""

import pytest
from pyspark.sql import functions as F

from uts_spark.functions import sampling

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_uniform_sample_deterministic_and_plausible(docs):
    a = sampling.sample_uniform(docs, 0.5, F.col("doc_id"))
    b = sampling.sample_uniform(docs, 0.5, F.col("doc_id"))
    ids_a = sorted(r.doc_id for r in a.select("doc_id").collect())
    ids_b = sorted(r.doc_id for r in b.select("doc_id").collect())
    assert ids_a == ids_b  # rerun picks the identical rows
    n = docs.count()
    assert 0.25 * n <= len(ids_a) <= 0.75 * n  # binomial plausibility


def test_uniform_sample_is_subset_monotone(docs):
    # raising the rate only ADDS rows (hash-cut property): a 25% sample
    # is a strict subset of the 50% sample — lets pipelines grow a
    # sample without reshuffling what was already selected
    small = {r.doc_id for r in sampling.sample_uniform(docs, 0.25, F.col("doc_id")).select("doc_id").collect()}
    big = {r.doc_id for r in sampling.sample_uniform(docs, 0.5, F.col("doc_id")).select("doc_id").collect()}
    assert small <= big


def test_stratified_exact_counts(docs):
    out = sampling.sample_stratified(docs, F.col("lang"), 5, F.col("doc_id"))
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    have = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(5, have[lang])


def test_split_disjoint_complete_stable(docs):
    out = sampling.split_assign(
        docs, F.col("doc_id"), {"train": 0.75, "eval": 0.125, "test": 0.125}
    )
    rows = out.select("doc_id", "split").collect()
    assert len(rows) == docs.count()  # every row labeled exactly once
    assert {r.split for r in rows} <= {"train", "eval", "test"}
    again = {r.doc_id: r.split for r in out.select("doc_id", "split").collect()}
    assert all(again[r.doc_id] == r.split for r in rows)  # stable


def test_domain_mix_hits_targets(docs):
    targets = {"src0": 0.5, "src1": 0.5}
    out = sampling.domain_mix(docs, F.col("source"), targets, 10, F.col("doc_id"))
    got = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(got) <= set(targets)  # unlisted domains dropped
    # each domain contributes ~ share*budget (binomial, loose bound)
    for src, n in got.items():
        assert n <= 10


def test_pack_greedy_budget_invariant(docs):
    budget = 1024
    out = sampling.pack_greedy(
        docs.select("doc_id", "n_chars"), F.col("n_chars"), F.col("doc_id"),
        budget, n_shards=4,
    )
    rows = out.collect()
    assert len(rows) == docs.count()  # packing is a relabeling, not a filter
    fills = {}
    for r in rows:
        fills[(r.shard, r.pack)] = max(fills.get((r.shard, r.pack), 0), r.pack_fill)
    sizes = {}
    for r in rows:
        sizes.setdefault((r.shard, r.pack), []).append(r.n_chars)
    for key, members in sizes.items():
        # a pack either fits the budget or is a single oversize row
        assert sum(members) <= budget or len(members) == 1
        assert fills[key] == sum(members)  # pack_fill = cumulative size


def test_pack_greedy_deterministic(docs):
    a = sampling.pack_greedy(
        docs.select("doc_id", "n_chars"), F.col("n_chars"), F.col("doc_id"), 1024
    ).collect()
    b = sampling.pack_greedy(
        docs.select("doc_id", "n_chars"), F.col("n_chars"), F.col("doc_id"), 1024
    ).collect()
    key = lambda r: (r.doc_id,)
    assert sorted(((r.doc_id, r.shard, r.pack) for r in a)) == sorted(
        (r.doc_id, r.shard, r.pack) for r in b
    )
