"""Tests for the mining module (queries/mining.py): item-item CF,
OLS trend, seasonal decomposition, link prediction. The DuckDB oracle
gate (tools/oracle_check.py) is the primary correctness check; these
pin the semantic invariants the oracle can't express (numpy parity,
structural constraints, plan shape).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from uts_spark.registry import QUERIES
from uts_spark.sources.tables import load_events


def test_recsys_topk_structure(spark, sf_dir):
    rows = QUERIES["recsys_item_item_topk"](spark, sf_dir).collect()
    assert rows
    by_item = {}
    for r in rows:
        by_item.setdefault(r.item, []).append(r)
        assert 1 <= r.rk <= 3
        assert 0.0 < r.cosine <= 1.0
        assert r.neighbor != r.item
    for item, lst in by_item.items():
        lst.sort(key=lambda r: r.rk)
        assert [r.rk for r in lst] == list(range(1, len(lst) + 1))
        # rank order agrees with (cosine desc, c12 desc, neighbor asc)
        keys = [(-r.cosine, -r.c12, r.neighbor) for r in lst]
        assert keys == sorted(keys)


def test_recsys_cosine_symmetric(spark, sf_dir):
    rows = QUERIES["recsys_item_item_topk"](spark, sf_dir).collect()
    seen = {(r.item, r.neighbor): r.cosine for r in rows}
    checked = 0
    for (a, b), cos in seen.items():
        if (b, a) in seen:
            assert seen[(b, a)] == cos
            checked += 1
    assert checked > 0


def test_ols_matches_numpy(spark, sf_dir):
    got = {
        r.event_type: r
        for r in QUERIES["stats_ols_trend"](spark, sf_dir).collect()
    }
    ev = (
        load_events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_type", "ts_ms", "value")
        .collect()
    )
    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rows in by_type.items():
        # same integer lanes the query uses (seconds offset, centi-value)
        x = np.array([r.ts_ms // 1000 - 1706745600 for r in rows], dtype=float)
        y = np.array([round(r.value * 100) for r in rows], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        g = got[et]
        assert g.n == len(rows)
        assert g.slope_per_hour == pytest.approx(slope * 36.0, rel=1e-9)
        assert g.intercept == pytest.approx(intercept / 100.0, rel=1e-9)
        r = np.corrcoef(x, y)[0, 1]
        assert g.r2 == pytest.approx(r * r, rel=1e-9)


def test_seasonal_decompose_identity(spark, sf_dir):
    rows = QUERIES["ts_seasonal_decompose"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # decomposition identity holds exactly by construction
        assert r.hourly_mean == pytest.approx(
            r.trend + r.seasonal + r.residual, abs=1e-9
        )
    # seasonal is constant within (event_type, hour-of-day)
    seas = {}
    for r in rows:
        key = (r.event_type, (r.hour_ms // 3600000) % 24)
        seas.setdefault(key, set()).add(r.seasonal)
    assert all(len(v) == 1 for v in seas.values())


def test_link_prediction_excludes_existing_edges(spark, sf_dir):
    df = QUERIES["graph_link_prediction"](spark, sf_dir)
    preds = {(r.p1, r.p2) for r in df.collect()}
    assert preds
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lp = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = lp.select("o", F.col("p").alias("p1"))
    b = lp.select("o", F.col("p").alias("p2"))
    edges = {
        (r.p1, r.p2)
        for r in (
            a.join(b, "o")
            .filter(F.col("p1") < F.col("p2"))
            .groupBy("p1", "p2")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= 2)
            .collect()
        )
    }
    assert not (preds & edges)
    for p1, p2 in preds:
        assert p1 < p2


def test_link_prediction_plan_is_takeordered(spark, sf_dir):
    plan = QUERIES["graph_link_prediction"](
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_markov_removal_invariants(spark, sf_dir):
    rows = QUERIES["attribution_markov_removal"](spark, sf_dir).collect()
    assert len(rows) == 4
    assert {r.channel for r in rows} == {"view", "click", "signup", "error"}
    conv_full = rows[0].conv_full
    assert conv_full > 0
    for r in rows:
        assert r.conv_full == conv_full
        # removing a channel can only lose conversion mass
        assert 0 <= r.conv_removed <= conv_full
        assert 0.0 <= r.removal_effect <= 1.0
    shares = [r.share for r in rows if r.share is not None]
    if shares:
        assert sum(shares) == pytest.approx(1.0, abs=1e-9)


def test_dedup_recall_eval_bounds(spark, sf_dir):
    r = QUERIES["dedup_recall_eval"](spark, sf_dir).collect()[0]
    assert r.n_truth > 0 and r.n_pred > 0
    assert 0 <= r.tp <= min(r.n_truth, r.n_pred)
    assert 0.0 <= r.precision <= 1.0
    assert 0.0 <= r.recall <= 1.0
    assert 0.0 <= r.f1 <= 1.0


def test_ann_recall_eval_bounds(spark, sf_dir):
    rows = {r.config: r for r in
            QUERIES["similarity_ann_recall_eval"](spark, sf_dir).collect()}
    assert set(rows) == {"precision_12x4", "recall_4x8"}
    for r in rows.values():
        assert r.n_truth > 0
        assert 0 <= r.hits <= r.n_truth
        assert 0.0 <= r.recall_at_10 <= 1.0
    # the recall-tuned config must actually be useful, not vacuous
    assert rows["recall_4x8"].recall_at_10 >= 0.5
    # and the eval should expose the config gap it exists to measure
    assert (rows["recall_4x8"].recall_at_10
            >= rows["precision_12x4"].recall_at_10)


def test_forecast_backtest_sanity(spark, sf_dir):
    rows = QUERIES["ts_forecast_backtest"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_evals > 0
        assert r.mae_naive >= 0 and r.mae_snaive >= 0
        # MASE consistency with its own components
        assert r.mase_snaive == pytest.approx(
            r.mae_snaive / r.mae_naive, rel=1e-9
        )


def test_containment_pairs_nonvacuous(spark, sf_dir):
    rows = QUERIES["dedup_containment_pairs"](spark, sf_dir).collect()
    assert rows  # planted dups must surface — a 0-row pass is vacuous
    for r in rows:
        assert r.containment >= 0.8
        assert r.shared <= min(r.na, r.nb)
        assert r.jaccard <= r.containment  # identity: J <= C always


def test_top_paths_structure(spark, sf_dir):
    rows = QUERIES["events_top_paths"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    counts = [r.n_users for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 1 <= len(r.path.split(">")) <= 5
        assert 0 <= r.n_converted <= r.n_users
        assert r.conversion_rate == pytest.approx(
            r.n_converted / r.n_users, rel=1e-12
        )


def test_supplier_scorecard_invariants(spark, sf_dir):
    rows = QUERIES["supplier_scorecard"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_returns <= r.n_lines
        assert 0.0 <= r.return_rate <= 1.0
        assert r.lead_p50 is not None and r.lead_p90 is not None
        assert r.lead_p50 <= r.lead_p90


def test_xyz_classes_partition_by_cv(spark, sf_dir):
    rows = QUERIES["part_xyz_classification"](spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        seen.add(r.xyz_class)
        if r.n_weeks >= 2:
            if r.xyz_class == "X":
                assert r.cv_squared < 0.25
            elif r.xyz_class == "Y":
                assert 0.25 <= r.cv_squared < 1.0
            else:
                assert r.cv_squared >= 1.0
    assert seen <= {"X", "Y", "Z"}


def test_window_funnel_depths(spark, sf_dir):
    rows = QUERIES["events_window_funnel"](spark, sf_dir).collect()
    assert rows
    depths = {r.max_depth for r in rows}
    assert depths <= {1, 2, 3}
    assert 3 in depths  # full conversions exist in the corpus
    for r in rows:
        assert r.n_signups >= 1


def test_segment_migration_matrix(spark, sf_dir):
    rows = QUERIES["segment_migration_matrix"](spark, sf_dir).collect()
    assert rows
    segs = {"heavy", "regular", "light", "inactive"}
    for r in rows:
        assert r.seg_from in segs and r.seg_to in segs
        assert r.n_users > 0
    # no user can be inactive in both periods (they'd have no events)
    assert not any(
        r.seg_from == "inactive" and r.seg_to == "inactive" for r in rows
    )


def test_binned_first_after_equals_naive_join(spark, sf_dir):
    """The bounded array variant must be row-identical to the
    pair-explode + min_by plan it replaces (the 20M-row A/B in
    SCALE.md rests on this equivalence)."""
    from uts_spark.operators.joins import binned_first_after, binned_range_join

    DAY = 86_400_000
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        "user_id", "event_id", "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t"),
    )
    s = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("sid"), F.col("t").alias("t1")
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("cid"), F.col("t").alias("tc")
    )
    j = binned_range_join(
        s, c, left_lo=F.col("t1") + 1, left_hi=F.col("t1") + DAY,
        right_ts=F.col("tc"), bin_width=DAY, keys=["user_id"],
    )
    naive = {
        r["sid"]: (r["__first"]["tc"], r["__first"]["cid"])
        for r in j.groupBy("user_id", "sid")
        .agg(F.min(F.struct("tc", "cid")).alias("__first"))
        .collect()
    }
    fa = binned_first_after(
        s, c, F.col("t1"), F.col("tc"), DAY, ["user_id"],
        right_payload=["cid"],
    )
    got = {
        r["sid"]: (r["__first"]["__t"], r["__first"]["cid"])
        for r in fa.collect()
        if r["__first"] is not None
    }
    assert naive == got and naive


def test_binned_first_after_preserves_duplicate_left_rows(spark):
    """Fully duplicate left rows must each produce an output row (one
    row per left INPUT row) — the unique-tag re-group contract added in
    round 5; without the tag they collapse into one."""
    from uts_spark.operators.joins import binned_first_after

    left = spark.createDataFrame(
        [("u1", 100), ("u1", 100), ("u1", 100), ("u2", 50)],
        "user_id string, t1 long",
    )
    right = spark.createDataFrame(
        [("u1", 150, "a"), ("u1", 120, "b"), ("u2", 9999, "z")],
        "user_id string, tc long, cid string",
    )
    out = binned_first_after(
        left, right, F.col("t1"), F.col("tc"), 1000, ["user_id"],
        right_payload=["cid"],
    ).collect()
    assert len(out) == 4
    u1 = [r for r in out if r["user_id"] == "u1"]
    assert len(u1) == 3
    for r in u1:
        assert r["__first"]["__t"] == 120 and r["__first"]["cid"] == "b"
    (u2,) = [r for r in out if r["user_id"] == "u2"]
    assert u2["__first"] is None  # 9999 beyond the 1000 ms window


def test_ivm_merge_equals_full_recompute(spark, sf_dir):
    rows = {r.event_type: r for r in
            QUERIES["ivm_merge_partials"](spark, sf_dir).collect()}
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("value").isNotNull())
    )
    full = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.col("value").cast("decimal(12,2)")) * 100)
            .cast("long")
            .alias("sum_c"),
        )
        .collect()
    }
    assert set(rows) == set(full)
    for et, r in rows.items():
        assert r.n == full[et].n
        assert r.sum_c == full[et].sum_c
        assert r.min_c <= r.max_c


def test_matryoshka_eval_monotone(spark, sf_dir):
    rows = {r.dims: r for r in
            QUERIES["embedding_matryoshka_eval"](spark, sf_dir).collect()}
    assert set(rows) == {16, 32}
    for r in rows.values():
        assert 0 <= r.hits <= r.n_truth
        assert 0.0 <= r.recall_at_10 <= 1.0
    # more prefix dims cannot hurt on average corpora; allow equality
    assert rows[32].recall_at_10 >= rows[16].recall_at_10 - 0.1


def test_power_user_curve_shares(spark, sf_dir):
    rows = QUERIES["events_power_user_curve"](spark, sf_dir).collect()
    assert rows
    assert sum(r.user_share for r in rows) == pytest.approx(1.0, abs=1e-9)
    assert sum(r.activity_share for r in rows) == pytest.approx(1.0, abs=1e-9)
    for r in rows:
        assert 1 <= r.active_days <= 28


def test_recsys_holdout_eval_bounds(spark, sf_dir):
    r = QUERIES["recsys_holdout_eval"](spark, sf_dir).collect()[0]
    assert r.n_test > 0 and r.n_preds > 0
    assert 0 <= r.hits <= r.n_test
    assert 0.0 <= r.hit_rate <= 1.0


def test_psi_monitor_sane(spark, sf_dir):
    r = QUERIES["monitor_psi_value_drift"](spark, sf_dir).collect()[0]
    assert r.n_bins == 10
    assert r.n1 > 0 and r.n2 > 0
    assert r.psi >= 0.0
    assert r.verdict in ("stable", "moderate", "major")


def test_novelty_curve_monotone_floor(spark, sf_dir):
    rows = sorted(
        QUERIES["text_novelty_curve"](spark, sf_dir).collect(),
        key=lambda r: r.batch,
    )
    assert len(rows) == 10
    # batch 0 is all-new by construction
    assert rows[0].novelty == 1.0
    for r in rows:
        assert 0 <= r.n_new <= r.n_shingles


def test_stickiness_bounds(spark, sf_dir):
    rows = QUERIES["events_dau_mau_stickiness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.dau <= r.mau
        assert 0.0 < r.stickiness <= 1.0


def test_interarrival_hist_shares(spark, sf_dir):
    rows = QUERIES["events_interarrival_hist"](spark, sf_dir).collect()
    assert rows
    assert sum(r.share for r in rows) == pytest.approx(1.0, abs=1e-9)
    for r in rows:
        if r.bucket > 0:
            assert r.gap_lo_ms == 2 ** (r.bucket - 1)


def test_zipf_alpha_plausible(spark, sf_dir):
    r = QUERIES["text_zipf_fit"](spark, sf_dir).collect()[0]
    assert 0 < r.n <= 200  # sf0.001's vocab is smaller than the cap
    assert 0.0 < r.zipf_alpha < 3.0
    assert 0.0 <= r.r2 <= 1.0
