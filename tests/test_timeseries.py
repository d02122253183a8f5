"""Unit tests for the extended time-series operators
(operators/timeseries.py) on small inline series where the expected
values are computable by hand."""

import math

import pytest
from pyspark.sql import functions as F

from uts_spark.operators import timeseries as ts

H = 3_600_000


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        # (key, ts_ms, value, ingest)
        (1, 0, 10.0, 0),
        (1, 1000, 25.0, 1),
        (1, 3000, 5.0, 2),   # counter reset (5 < 25)
        (2, 0, 1.0, 3),
        (2, 4000, 9.0, 4),
    ]
    return spark.createDataFrame(rows, "k long, t long, v double, o long")


def test_counter_rate_reset_rule(series):
    out = ts.counter_rate(series, "k", "t", "v")
    got = {(r.k, r.t): r.rate_per_s for r in out.collect()}
    assert got[(1, 1000)] == pytest.approx(15.0)   # (25-10)/1s
    assert got[(1, 3000)] == pytest.approx(2.5)    # reset: 5/2s
    assert got[(2, 4000)] == pytest.approx(2.0)    # (9-1)/4s
    assert (1, 0) not in got and (2, 0) not in got  # first points dropped


def test_resample_buckets(series, spark):
    out = ts.resample(series, "k", "t", "v", 2000, "o")
    got = {(r.k, r.bucket_ms): r for r in out.collect()}
    b = got[(1, 0)]
    assert b.n == 2 and b.mean_v == pytest.approx(17.5)
    assert b.min_v == 10.0 and b.max_v == 25.0 and b.last_v == 25.0
    assert got[(1, 2000)].last_v == 5.0
    assert got[(2, 4000)].n == 1


def test_interpolate_linear_values(spark):
    rows = [(1, 0, 0.0), (1, 2 * H, 72.0), (1, 3 * H, 30.0)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = ts.interpolate_linear(df, "k", "t", "v", H)
    got = {r.grid_ms: r.value for r in out.collect()}
    assert got[0] == 0.0            # exact hit on first obs
    assert got[H] == pytest.approx(36.0)   # halfway 0→72
    assert got[2 * H] == 72.0       # exact hit
    assert got[3 * H] == 30.0       # exact hit on LAST obs (no next neighbor)
    assert len(got) == 4


def test_interpolate_skips_outside_span(spark):
    rows = [(1, H + 1, 5.0), (1, 2 * H - 1, 7.0)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    # span contains no grid point fully bracketed?  grid candidates:
    # ceil((H+1)/H)*H = 2H > t1-…  →  start 2H, end H → empty sequence
    # guard: sequence(start > end) would throw; operator must emit zero
    # rows, not crash
    out = ts.interpolate_linear(df, "k", "t", "v", H)
    assert out.count() == 0


def test_ewma_recurrence(series):
    out = ts.ewma(series, "k", "t", "v", 0.25, "o")
    got = {(r.k, r.ts_ms): r.ewma for r in out.collect()}
    y1 = 10.0
    y2 = 0.25 * 25.0 + 0.75 * y1
    y3 = 0.25 * 5.0 + 0.75 * y2
    assert got[(1, 0)] == y1
    assert got[(1, 1000)] == y2
    assert got[(1, 3000)] == y3
    assert got[(2, 0)] == 1.0
    assert got[(2, 4000)] == 0.25 * 9.0 + 0.75 * 1.0


def test_anomaly_zscore_flags_spike_only(spark):
    from uts_spark.operators.timeseries import anomaly_zscore

    # 20 calm points then one 10x spike inside the same trailing window
    rows = [("s", i * 1000, 10.0 + (i % 2)) for i in range(20)]
    rows.append(("s", 20000, 100.0))
    df = spark.createDataFrame(rows, "key string, ts_ms long, value double")
    out = anomaly_zscore(
        df, "key", "ts_ms", "value", window_ms=60_000, min_points=5,
        threshold=3.0,
    ).collect()
    assert [r["ts_ms"] for r in out] == [20000]
    assert out[0]["z"] > 3


def test_anomaly_zscore_zero_variance_never_flags(spark):
    from uts_spark.operators.timeseries import anomaly_zscore

    df = spark.createDataFrame(
        [("s", i * 1000, 5.0) for i in range(30)],
        "key string, ts_ms long, value double",
    )
    assert (
        anomaly_zscore(df, "key", "ts_ms", "value", window_ms=60_000).count() == 0
    )


# --------------------------------------------------------------------------
# OHLC bars and TWAP

def test_ohlc_open_close_tiebreak_and_extremes(spark):
    from uts_spark.operators.timeseries import ohlc

    rows = [
        # key a, one bucket [0, 1000): two points at the SAME ts —
        # order_col breaks the tie (open=id1, close=id2); high/low from
        # the middle point
        ("a", 100, 1, 5.0),
        ("a", 100, 2, 7.0),
        ("a", 500, 3, -1.0),
        # key a, second bucket
        ("a", 1500, 4, 9.0),
    ]
    df = spark.createDataFrame(rows, "k string, t long, id long, v double")
    out = {
        (r.k, r.bucket_ms): (r.open, r.high, r.low, r.close, r.n)
        for r in ohlc(df, "k", "t", "v", 1000, "id").collect()
    }
    assert out[("a", 0)] == (5.0, 7.0, -1.0, -1.0, 3)
    assert out[("a", 1000)] == (9.0, 9.0, 9.0, 9.0, 1)


def test_ohlc_packed_key_envelope_raises_not_corrupts(spark):
    # ADVICE r3 (medium): a snowflake-scale order id outside the packed
    # key's id space used to silently invert open/close ordering — the
    # envelope is now ENFORCED: out-of-range order values raise at
    # execution instead of corrupting the bars.
    from uts_spark.operators.timeseries import ohlc

    big_id = (1 << 62) // 1000 + 7  # just past the interval_ms=1000 space
    rows = [("a", 100, 1, 5.0), ("a", 200, big_id, 7.0)]
    df = spark.createDataFrame(rows, "k string, t long, id long, v double")
    with pytest.raises(Exception, match="packed_order_key"):
        ohlc(df, "k", "t", "v", 1000, "id").collect()
    # negative order ids are equally outside the lexicographic envelope
    df2 = spark.createDataFrame(
        [("a", 100, -1, 5.0)], "k string, t long, id long, v double"
    )
    with pytest.raises(Exception, match="packed_order_key"):
        ohlc(df2, "k", "t", "v", 1000, "id").collect()
    # in-envelope data on the same plan still aggregates fine
    ok = ohlc(
        spark.createDataFrame(
            [("a", 100, 1, 5.0), ("a", 200, 2, 7.0)],
            "k string, t long, id long, v double",
        ),
        "k", "t", "v", 1000, "id",
    ).collect()
    assert ok[0].open == 5.0 and ok[0].close == 7.0


def test_twap_weights_by_holding_time(spark):
    from uts_spark.operators.timeseries import twap

    # v=0 held for 900ms then v=10 held for 100ms → twap = 1.0
    rows = [("a", 0, 1, 0.0), ("a", 900, 2, 10.0), ("a", 1000, 3, 0.0),
            ("b", 42, 1, 3.0)]  # single point: zero span → NULL
    df = spark.createDataFrame(rows, "k string, t long, id long, v double")
    out = {r.k: (r.twap, r.n) for r in twap(df, "k", "t", "v", "id").collect()}
    assert out["a"] == (1.0, 3)
    assert out["b"][0] is None and out["b"][1] == 1


def test_cusum_matches_sequential_fold(spark):
    """The prefix-sum/prefix-min unrolling must equal the textbook
    sequential recursion S_t = max(0, S_{t-1} + d_t - k)."""
    import random

    from uts_spark.operators.timeseries import cusum_changepoint

    rng = random.Random(7)
    rows = []
    for key in ("a", "b"):
        # drift upward halfway through so the positive side fires
        for i in range(80):
            base = 10.0 if (key == "a" and i >= 40) else 0.0
            rows.append((key, i * 1000, i, round(rng.uniform(0, 20) + base, 2)))
    df = spark.createDataFrame(rows, "k string, t long, o long, v double")
    out = {
        (r["k"], r["t"]): r
        for r in cusum_changepoint(df, "k", "t", "v", "o", k=2.0, h=60.0).collect()
    }

    by_key = {}
    for k, t, o, v in rows:
        by_key.setdefault(k, []).append((t, o, v))
    for key, pts in by_key.items():
        mu = sum(v for _, _, v in pts) / len(pts)
        sp = sn = 0.0
        for t, _, v in sorted(pts):
            sp = max(0.0, sp + (v - mu) - 2.0)
            sn = max(0.0, sn + -(v - mu) - 2.0)
            got = out[(key, t)]
            assert abs(got["s_pos"] - sp) < 1e-5, (key, t, got["s_pos"], sp)
            assert abs(got["s_neg"] - sn) < 1e-5
            assert got["changepoint"] == (sp > 60.0 or sn > 60.0)
    # the injected level shift must actually be detected
    assert any(r["changepoint"] for (k, _), r in out.items() if k == "a")
    assert not any(r["changepoint"] for (k, _), r in out.items() if k == "b")


def test_rolling_autocorr_matches_pandas(spark):
    import numpy as np
    import pandas as pd

    from uts_spark.operators.timeseries import rolling_autocorr

    rng = np.random.default_rng(11)
    vals = np.round(np.cumsum(rng.normal(0, 1, 60)) + 50, 2)  # smooth walk
    rows = [("u", i * 1000, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t long, o long, v double")
    got = {
        r["t"]: r["autocorr"]
        for r in rolling_autocorr(df, "k", "t", "v", "o", window_rows=20).collect()
    }

    s = pd.Series(np.round(vals * 100))  # same integer snapping
    x, y = s, s.shift(1)
    for i in range(len(vals)):
        lo = max(0, i - 19)
        xs, ys = x[lo : i + 1], y[lo : i + 1]
        mask = ys.notna()
        if mask.sum() >= 20 and xs[mask].std() > 0 and ys[mask].std() > 0:
            exp = float(np.corrcoef(xs[mask], ys[mask])[0, 1])
            assert abs(got[i * 1000] - exp) < 1e-9, (i, got[i * 1000], exp)
        else:
            assert got[i * 1000] is None
    # a smooth random walk is strongly positively autocorrelated
    filled = [v for v in got.values() if v is not None]
    assert filled and sum(filled) / len(filled) > 0.5


def test_lttb_keeps_spike_and_endpoints(spark):
    from uts_spark.operators.timeseries import lttb_downsample

    # flat series with one big spike mid-bucket: LTTB must keep the
    # spike (largest triangle) and both endpoints
    rows = [("u", t * 100, t, 10.0 if t != 55 else 500.0) for t in range(100)]
    df = spark.createDataFrame(rows, "k string, t long, o long, v double")
    out = lttb_downsample(df, "k", "t", "v", "o", bucket_ms=1000)
    got = [(r["t"], r["v"], r["is_endpoint"]) for r in out.collect()]
    ts = {t for t, _, _ in got}
    assert 5500 in ts, "spike dropped"          # the 500.0 point
    assert 0 in ts and 9900 in ts               # endpoints
    flags = {t: e for t, _, e in got}
    assert flags[0] and flags[9900] and not flags[5500]
    # one pick per interior bucket (buckets 1..8) + 2 endpoints
    interior = [t for t, _, e in got if not e]
    assert len(interior) == 8
    assert len({t // 1000 for t in interior}) == 8


def test_lttb_single_point_series(spark):
    from uts_spark.operators.timeseries import lttb_downsample

    df = spark.createDataFrame([("s", 42, 0, 7.0)], "k string, t long, o long, v double")
    out = lttb_downsample(df, "k", "t", "v", "o", bucket_ms=1000).collect()
    # one row: the point is simultaneously first and last
    assert len(out) == 1 and out[0]["is_endpoint"]


def test_capped_sessions_cap_splits_dense_stream(spark):
    """The 4h cap must split a continuously-active stream that never
    hits the inactivity gap (the branch the sparse events data may not
    exercise), and the split is where the cap is EXCEEDED."""
    from uts_spark.operators.timeseries import capped_sessions

    MIN = 60_000
    # events every 10 minutes for 10 hours: gap (30 min) never fires
    rows = [(1, i * 10 * MIN, i) for i in range(61)]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long, event_id long")
    out = capped_sessions(
        df, "user_id", "ts_ms", gap_ms=30 * MIN, cap_ms=4 * 60 * MIN,
        order_col="event_id",
    ).orderBy("ts_ms").collect()
    seqs = [r.session_seq for r in out]
    # t=0..240min in session 1 (cap INclusive at exactly 4h), split at
    # 250min, then again 4h later
    assert seqs[0] == 1 and seqs[24] == 1  # 240 min: t - start == cap
    assert seqs[25] == 2                   # 250 min: cap exceeded
    assert max(seqs) == 3                  # one more split before 10h
    starts = {r.session_seq: r.session_start for r in out}
    assert starts[2] == 25 * 10 * MIN


def test_capped_sessions_gap_and_cap_interact(spark):
    from uts_spark.operators.timeseries import capped_sessions

    MIN = 60_000
    # a gap resets the cap clock: 3h of activity, 40-min silence,
    # then 3h more — two sessions, no cap split
    rows = [(1, i * 10 * MIN, i) for i in range(19)]          # 0..180min
    rows += [(1, 220 * MIN + i * 10 * MIN, 100 + i) for i in range(19)]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long, event_id long")
    out = capped_sessions(
        df, "user_id", "ts_ms", gap_ms=30 * MIN, cap_ms=4 * 60 * MIN,
        order_col="event_id",
    ).collect()
    assert max(r.session_seq for r in out) == 2


def test_ohlc_pre_epoch_timestamps_order_correctly(spark):
    # regression: the packed ordering key must use pmod — Spark's % is
    # sign-following, which inverted open/close for negative timestamps
    from uts_spark.operators.timeseries import ohlc

    rows = [("s", -10, 1.0, 0), ("s", -5, 2.0, 1)]
    df = spark.createDataFrame(rows, "k string, t long, v double, o long")
    out = ohlc(df, "k", "t", "v", 10, "o").collect()
    assert len(out) == 1
    assert out[0]["open"] == 1.0 and out[0]["close"] == 2.0
