"""The reference's 16 behavioral goldens + quirk probes (FIXTURES.md,
/root/reference/test.js:14-312), as pytest cases with now=1000 pinned
(the reference pins Date.now() to 1000 via sinon, test.js:15)."""

import math

import pytest

from uts_spark import TSDB
from uts_spark.plans.groupers import interval

NOW = 1000


def make_series(tsdb, name, rows, schema):
    df = tsdb.spark.createDataFrame(rows, schema=schema)
    return tsdb.series(name, df=df)


@pytest.fixture(scope="module")
def tsdb(spark):
    return TSDB(spark)


@pytest.fixture(scope="module")
def series_a(tsdb):
    # test.js:19-24 — 5 points, 100ms spacing
    rows = [(i, 600 + 100 * i, float(i), float(2 * i)) for i in range(5)]
    return make_series(
        tsdb, "a", rows, "ingest_id long, time long, my_col1 double, my_col2 double"
    )


@pytest.fixture(scope="module")
def series_b(tsdb):
    # test.js:25-29 — quadratic values
    rows = [(i, 600 + 100 * i, float(i * i)) for i in range(5)]
    return make_series(tsdb, "b", rows, "ingest_id long, time long, my_col1 double")


@pytest.fixture(scope="module")
def series_mixed(tsdb):
    rows = [(0, 10, 1.0, None), (1, 20, None, 9.0), (2, 30, 3.0, None)]
    return make_series(tsdb, "mixed", rows, "ingest_id long, time long, v double, w double")


@pytest.fixture(scope="module")
def series_signs(tsdb):
    rows = [(0, 10, 5.0, -5.0), (1, 20, 3.0, -3.0)]
    return make_series(tsdb, "signs", rows, "ingest_id long, time long, pos double, neg double")


@pytest.fixture(scope="module")
def series_empty(tsdb):
    return make_series(tsdb, "empty", [], "ingest_id long, time long, v double")


def one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


# -- basic aggregates (test.js:34-94) ---------------------------------------

def test_map_column(series_a):
    r = one(series_a.query({"m": TSDB.map("my_col1")}))
    assert r["m"] == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_mean_max_min(series_a):
    r = one(
        series_a.query(
            {
                "mean": TSDB.mean("my_col1"),
                "max": TSDB.max("my_col1"),
                "min": TSDB.min("my_col1"),
                "sum": TSDB.sum("my_col1"),
                "count": TSDB.count(),
            }
        )
    )
    assert r["mean"] == 2.0
    assert r["max"] == 4.0
    assert r["min"] == 0.0  # fold starts at 0 → min of positives clamps to 0
    assert r["sum"] == 10.0
    assert r["count"] == 5


# -- where filters (test.js:243-276) ----------------------------------------

def test_where_single_bound(series_a):
    r = one(
        series_a.query(
            {"m": TSDB.map("my_col1")},
            where={"my_col1": {"is": ">", "than": 2}},
        )
    )
    assert r["m"] == [3.0, 4.0]


def test_where_range_exclusive(series_a):
    # bounds are strict: time>700 AND time<1000 keeps exactly 800, 900
    r = one(
        series_a.query(
            {"m": TSDB.map("my_col1")},
            where={"time": [{"is": ">", "than": 700}, {"is": "<", "than": 1000}]},
        )
    )
    assert r["m"] == [2.0, 3.0]


def test_where_equality(series_a):
    r = one(
        series_a.query(
            {"m": TSDB.map("my_col2")},
            where={"my_col1": {"is": "=", "than": 2}},
        )
    )
    assert r["m"] == [4.0]


# -- interval grouping (test.js:138-190) ------------------------------------

def test_interval_last_newest_first(series_a):
    rows = series_a.query(
        {"last": TSDB.last("my_col1")},
        group=interval(250, fill=False, now=NOW),
    ).collect()
    got = [(r["start"], r["last"]) for r in rows]
    assert got == [(750, 4.0), (500, 1.0)]  # newest-first


def test_interval_fill_zero_bins(series_a):
    rows = series_a.query(
        {"c": TSDB.count()},
        where={"time": {"is": ">", "than": 0}},
        group=interval(250, fill=True, now=NOW),
    ).collect()
    # bins anchored at 1000, width 250, spine from time>0 bound: 4 bins
    got = [(r["start"], r["c"]) for r in rows]
    assert got[0] == (750, 3)  # 800, 900, 1000 (right-inclusive at now)
    assert got[1] == (500, 2)  # 600, 700
    assert all(c == 0 for _, c in got[2:])
    assert [s for s, _ in got] == sorted([s for s, _ in got], reverse=True)


def test_interval_time_shifted_now(series_a):
    # querying "as of" t=800 shifts bins (test.js:174-190)
    rows = series_a.query(
        {"c": TSDB.count()},
        group=interval(250, fill=False, now=800),
    ).collect()
    got = [(r["start"], r["c"]) for r in rows]
    # points ≤ 800: 600,700,800 → bins (550,800]: 600,700,800
    assert got == [(550, 3)]


def test_interval_right_inclusive_edges(tsdb):
    # a point exactly at a bin edge falls in the OLDER bin; a point at now
    # is included (SURVEY §2.5 G2, verified against the reference)
    s = make_series(
        tsdb, "edges", [(0, 500, 1.0), (1, 750, 1.0), (2, 1000, 1.0)],
        "ingest_id long, time long, v double",
    )
    rows = s.query(
        {"c": TSDB.count()}, group=interval(250, fill=False, now=NOW)
    ).collect()
    got = {r["start"]: r["c"] for r in rows}
    # (750,1000] → 1000; (500,750] → 750; (250,500] → 500
    assert got == {750: 1, 500: 1, 250: 1}


# -- grouping × where interaction (test.js:192-241) -------------------------

def test_group_with_where(series_a):
    rows = series_a.query(
        {"m": TSDB.mean("my_col1")},
        where={"my_col1": {"is": ">", "than": 0}},
        group=interval(250, fill=False, now=NOW),
    ).collect()
    got = [(r["start"], r["m"]) for r in rows]
    assert got == [(750, 3.0), (500, 1.0)]


# -- derivative (test.js:96-136) --------------------------------------------

def deriv(series, col, w, **kw):
    r = one(series.query({"d": TSDB.derivative(col, w)}, **kw))
    return [(p["time"], p["value"]) for p in r["d"]]


def test_derivative_100(series_b):
    assert deriv(series_b, "my_col1", 100) == [(700, 1.0), (800, 3.0), (900, 5.0), (1000, 7.0)]


def test_derivative_200(series_b):
    assert deriv(series_b, "my_col1", 200) == [(800, 4.0), (1000, 12.0)]


def test_derivative_500(series_b):
    assert deriv(series_b, "my_col1", 500) == [(1000, 16.0)]


def test_derivative_empty(series_empty):
    assert deriv(series_empty, "v", 100) == []


def test_derivative_single_point(tsdb):
    s = make_series(tsdb, "single", [(0, 700, 5.0)], "ingest_id long, time long, v double")
    assert deriv(s, "v", 100) == [(700, 0.0)]


def test_derivative_gap_zero_fill(tsdb):
    # FIXTURES §5 shifted: points (0, v=1), (350, v=5)
    s = make_series(
        tsdb, "gaps", [(0, 0, 1.0), (1, 350, 5.0)], "ingest_id long, time long, v double"
    )
    assert deriv(s, "v", 100) == [(100, 0.0), (200, 0.0), (300, 0.0), (350, 4.0)]


def test_derivative_negative_deltas(tsdb):
    s = make_series(
        tsdb, "down", [(0, 0, 10.0), (1, 100, 4.0)], "ingest_id long, time long, v double"
    )
    assert deriv(s, "v", 100) == [(100, -6.0)]


# -- missing-column quirks (FIXTURES §3, SURVEY probes) ---------------------

def test_missing_column_semantics(series_mixed):
    r = one(
        series_mixed.query(
            {
                "mean": TSDB.mean("v"),
                "sum": TSDB.sum("v"),
                "max": TSDB.max("v"),
                "cstar": TSDB.count(),
                "cv": TSDB.count("v"),
                "m": TSDB.map("v"),
            }
        )
    )
    assert r["mean"] == 2.0  # skips NULLs
    assert math.isnan(r["sum"])  # missing col poisons to NaN
    assert math.isnan(r["max"])
    assert r["cstar"] == 3
    assert r["cv"] == 2
    assert r["m"] == [1.0, None, 3.0]  # hole preserved, push order


def test_missing_column_never_matches_filter(series_mixed):
    r = one(
        series_mixed.query({"m": TSDB.map("v")}, where={"v": {"is": ">", "than": 0}})
    )
    assert r["m"] == [1.0, 3.0]


def test_remove_keeps_missing_column_rows(tsdb, spark):
    rows = [(0, 10, 1.0, None), (1, 20, None, 9.0), (2, 30, 3.0, None)]
    s = make_series(
        tsdb, "mixed_rm", rows, "ingest_id long, time long, v double, w double"
    )
    s.remove({"v": {"is": ">", "than": 0}})
    left = [r["ingest_id"] for r in s.df.collect()]
    assert left == [1]  # missing-col point kept (uts.ts:297 never-match)


def test_zero_clamped_min_max(series_signs):
    r = one(series_signs.query({"minp": TSDB.min("pos"), "maxn": TSDB.max("neg")}))
    assert r["minp"] == 0.0  # not 3
    assert r["maxn"] == 0.0  # not -3


def test_empty_series_global_agg_one_row(series_empty):
    r = one(
        series_empty.query(
            {
                "mean": TSDB.mean("v"),
                "sum": TSDB.sum("v"),
                "count": TSDB.count(),
                "max": TSDB.max("v"),
                "min": TSDB.min("v"),
                "last": TSDB.last("v"),
                "m": TSDB.map("v"),
            }
        )
    )
    assert r["mean"] == 0.0
    assert r["sum"] == 0.0
    assert r["count"] == 0
    assert r["max"] == 0.0
    assert r["min"] == 0.0
    assert r["last"] is None
    assert r["m"] == []


def test_last_is_insertion_order_not_time_order(tsdb):
    # out-of-order append: last = last INSERTED, not max time
    rows = [(0, 100, 1.0), (1, 300, 3.0), (2, 200, 2.0)]
    s = make_series(tsdb, "ooo", rows, "ingest_id long, time long, v double")
    r = one(s.query({"last": TSDB.last("v")}))
    assert r["last"] == 2.0


# -- remove/truncate (test.js:278-312) --------------------------------------

def test_truncate(tsdb):
    s = make_series(tsdb, "trunc", [(0, 10, 1.0)], "ingest_id long, time long, v double")
    s.remove()
    assert s.df.count() == 0


def test_retention_read_filter(tsdb):
    rows = [(0, 100, 1.0), (1, 900, 2.0)]
    s = make_series(tsdb, "ret", rows, "ingest_id long, time long, v double")
    s.set_retention(500)
    r = one(s.query({"m": TSDB.map("v")}, now=NOW))
    assert r["m"] == [2.0]  # point at t=100 < now-ttl=500 dropped


# -- map(fn) / reduce(fn): the python UDAF surface (uts.ts:398-434,
#    562-580; SURVEY §2.6) -----------------------------------------------

def test_map_fn_per_point(series_a):
    r = one(series_a.query({"m": TSDB.map(lambda pt: pt["my_col1"] + pt["my_col2"])}))
    assert r["m"] == [0.0, 3.0, 6.0, 9.0, 12.0]


def test_reduce_fold(series_a):
    r = one(
        series_a.query(
            {"r": TSDB.reduce(lambda acc, pt: acc + pt["my_col1"] * 2.0, 0.0)}
        )
    )
    assert r["r"] == 20.0  # 2*(0+1+2+3+4)


def test_map_fn_is_push_order_not_time_order(tsdb):
    rows = [(0, 300, 1.0), (1, 100, 2.0), (2, 200, 3.0)]
    s = make_series(tsdb, "fnord", rows, "ingest_id long, time long, v double")
    r = one(s.query({"m": TSDB.map(lambda pt: pt["v"])}))
    assert r["m"] == [1.0, 2.0, 3.0]


def test_reduce_empty_series_returns_initial(series_empty):
    r = one(series_empty.query({"r": TSDB.reduce(lambda a, pt: a + 1, 0.0)}))
    assert r["r"] == 0.0


# -- schemaless MapType payload mode (SURVEY §1.3): absent map key ≡
#    missing column, reproducing pt.has semantics ------------------------

@pytest.fixture(scope="module")
def series_payload(tsdb):
    rows = [
        (0, 100, {"a": 1.0, "b": 10.0}),
        (1, 200, {"a": 2.0}),             # missing b
        (2, 300, {"a": 3.0, "b": 30.0}),
    ]
    df = tsdb.spark.createDataFrame(
        rows, "ingest_id long, time long, payload map<string,double>"
    )
    return tsdb.series("pl", df=df, payload_col="payload")


def test_payload_aggregates_missing_key_quirks(series_payload):
    r = one(
        series_payload.query(
            {
                "mean_b": TSDB.mean("b"),    # skips the missing point
                "sum_b": TSDB.sum("b"),      # NaN-poisoned by the missing point
                "count_b": TSDB.count("b"),
                "count_all": TSDB.count(),
                "last_a": TSDB.last("a"),
                "map_b": TSDB.map("b"),      # hole preserved
            }
        )
    )
    assert r["mean_b"] == 20.0
    assert math.isnan(r["sum_b"])
    assert r["count_b"] == 2
    assert r["count_all"] == 3
    assert r["last_a"] == 3.0
    assert r["map_b"] == [10.0, None, 30.0]


def test_payload_where_missing_key_never_matches(series_payload):
    r = one(
        series_payload.query(
            {"m": TSDB.map("a")},
            where={"b": {"is": ">", "than": 0.0}},
        )
    )
    assert r["m"] == [1.0, 3.0]  # the b-less point never matches


def test_payload_remove_keeps_missing_key_points(tsdb):
    rows = [(0, 100, {"v": 5.0}), (1, 200, {}), (2, 300, {"v": 1.0})]
    df = tsdb.spark.createDataFrame(
        rows, "ingest_id long, time long, payload map<string,double>"
    )
    s = tsdb.series("plrm", df=df, payload_col="payload")
    s.remove({"v": {"is": ">", "than": 2.0}})
    r = one(s.query({"m": TSDB.map("v")}))
    assert r["m"] == [None, 1.0]  # v=5 removed; keyless point KEPT


def test_last_point_missing_column_yields_null(tsdb):
    # uts.ts:611-617: last() pushes pt.get(col) for EVERY point — a final
    # point missing the column yields undefined, not the previous value.
    rows = [(0, 10, 1.0), (1, 20, None)]
    s = make_series(tsdb, "lastnull", rows, "ingest_id long, time long, v double")
    r = one(s.query({"last": TSDB.last("v")}))
    assert r["last"] is None


def test_compact_materializes_retention(tsdb):
    rows = [(0, 100, 1.0), (1, 900, 2.0)]
    s = make_series(tsdb, "cmp", rows, "ingest_id long, time long, v double")
    s.set_retention(500).compact(now=NOW)
    assert [r.v for r in s.df.collect()] == [2.0]


def test_derivative_inside_interval_groups(tsdb):
    # derivative metric under an IntervalGrouper: each bin folds its own
    # points independently (uts: each Bin owns its Aggregate instance)
    rows = [(i, 100 * i, float(i * i)) for i in range(8)]  # t=0..700
    s = make_series(tsdb, "dgrp", rows, "ingest_id long, time long, v double")
    out = s.query(
        {"d": TSDB.derivative("v", 200)},
        group=interval(400, fill=False, now=700),
    ).collect()
    by_start = {r["start"]: [(p["time"], p["value"]) for p in r["d"]] for r in out}
    # bin (300,700]: points t=400..700, v=16,25,36,49 → first=400,
    # emissions at 600 (Δ16+Δ20... t=500,600 accrue: (25-16)+(36-25)=20) and
    # final flush at 700 (49-36=13)
    assert by_start[300] == [(600, 20.0), (700, 13.0)]
    # bin (-100,300]: points t=0..300, v=0,1,4,9 → emissions at 200
    # ((1-0)+(4-1)=4) and final flush at 300 (9-4=5)
    assert by_start[-100] == [(200, 4.0), (300, 5.0)]
