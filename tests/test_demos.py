"""Engine-native library demos (registry.DEMOS) stay runnable.

These three ops were demoted from the driver-facing ``queries()`` registry
in round 4 (VERDICT r3 #1): their outputs are engine-private by nature
(HLL++/GK sketch registers, MLlib k-means training, eigensolver
sign/order), so no external oracle can hash-match them. Their
deterministic siblings (``approx_sketches``, ``similarity_ann_ivf_det``,
the PCA invariants test) carry the correctness rows; this test keeps the
native paths exercised end-to-end.
"""

from uts_spark.registry import DEMOS, ORACLES, QUERIES


def test_demos_are_not_driver_facing():
    assert set(DEMOS) == {
        "approx_sketches_native",
        "similarity_ann_ivf",
        "embedding_pca_project",
    }
    for name in DEMOS:
        assert name not in QUERIES and name not in ORACLES


def test_every_query_has_an_oracle():
    # the invariant that keeps the driver correctness file free of
    # `err: no_oracle` rows (registry.py enforces it at import too)
    assert sorted(QUERIES) == sorted(ORACLES)


def test_approx_sketches_native_runs(spark, sf_dir):
    rows = DEMOS["approx_sketches_native"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.approx_users > 0 and r.approx_events > 0
    assert r.approx_p50 <= r.approx_p95 <= r.approx_p99


def test_similarity_ann_ivf_runs(spark, sf_dir):
    rows = DEMOS["similarity_ann_ivf"](spark, sf_dir).collect()
    assert rows, "IVF demo returned no neighbors"
    assert {r.anchor_id for r in rows} <= {0, 1, 2, 3, 4}
    for r in rows:
        assert 1 <= r.rank <= 10


def test_embedding_pca_project_runs(spark, sf_dir):
    df = DEMOS["embedding_pca_project"](spark, sf_dir)
    n_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    rows = df.collect()
    assert len(rows) == n_emb
    assert len(rows[0].components) == 8
