"""Plan-shape regressions: the physical-plan properties SCALE.md claims
are asserted here so a refactor that silently loses pushdown, a
broadcast, or the top-k operator fails CI — at sf0.001 the plan shapes
are identical to production ones (sizes change, shapes don't).
"""

import pytest

from uts_spark.registry import QUERIES
import uts_spark.queries  # noqa: F401  (fills QUERIES)


def plan(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_where_predicates_reach_parquet_scan(spark, sf_dir):
    p = plan(spark, sf_dir, "uts_where_range")
    pushed = p.split("PushedFilters: [")[1].split("]")[0]
    assert "GreaterThan(value,50.0)" in pushed
    assert "LessThan(value,150.0)" in pushed
    assert "EqualTo" in pushed  # toString truncates the arg list


def test_scan_prunes_columns(spark, sf_dir):
    p = plan(spark, sf_dir, "uts_interval_mean_fill")
    # the mean/count query must read only ts + value, never the 5 other cols
    read = p.split("ReadSchema: ")[1].splitlines()[0]
    assert "value" in read and "ts" in read
    assert "props" not in read and "event_type" not in read


def test_topk_uses_take_ordered_not_global_sort(spark, sf_dir):
    p = plan(spark, sf_dir, "tpch_q3_topk")
    assert "TakeOrderedAndProject" in p


def test_dimension_joins_broadcast(spark, sf_dir):
    p = plan(spark, sf_dir, "tpch_q5_region_revenue")
    assert p.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_spine_join_broadcasts(spark, sf_dir):
    p = plan(spark, sf_dir, "uts_interval_mean_fill")
    assert "BroadcastHashJoin" in p  # the zero-fill spine is never shuffled


def test_sessionization_single_shuffle(spark, sf_dir):
    p = plan(spark, sf_dir, "session_windows_per_user")
    # one exchange for user_id; the session merge itself adds no shuffle
    assert p.count("Exchange hashpartitioning") <= 2  # agg partial/final pair


def test_uts_core_has_no_python_udfs(spark, sf_dir):
    # the reference surface must stay entirely JVM-side (SCALE.md):
    # python appears only in the explicitly python map(fn)/reduce(fn) ops
    for name in (
        "uts_global_agg",
        "uts_where_range",
        "uts_interval_mean_fill",
        "uts_interval_last_nofill",
        "uts_map_exploded",
        "uts_derivative",
    ):
        p = plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name


def test_scalar_pack_is_single_stage_scan(spark, sf_dir):
    p = plan(spark, sf_dir, "scalar_function_pack")
    assert "Exchange" not in p  # pure projection: zero shuffles


def test_q19_single_broadcast_join_no_triple_scan(spark, sf_dir):
    p = plan(spark, sf_dir, "tpch_q19_disjunctive")
    # the 3-branch OR must stay ONE join over ONE lineitem scan
    assert p.count("BroadcastHashJoin") == 1
    assert p.count("Scan parquet") == 2  # lineitem + part, once each


def test_q2_argmin_has_no_window(spark, sf_dir):
    p = plan(spark, sf_dir, "tpch_q2_min_cost_supplier")
    # arg-min via min(struct(...)) partial agg, not a per-part window sort
    assert "Window" not in p
    assert "BroadcastHashJoin" in p


def test_q8_all_dimensions_broadcast(spark, sf_dir):
    p = plan(spark, sf_dir, "tpch_q8_market_share")
    assert p.count("BroadcastHashJoin") >= 6
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
