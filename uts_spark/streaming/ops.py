"""Structured Streaming overlay (SURVEY §7 Phase 3).

The reference is a poll-style in-memory store with exactly one time-driven
behavior: retention (uts.ts:245-269, a 1 s timer dropping points with
``time < now - ttl``). Everything else here is the *streaming re-expression*
of its batch surface, with the divergences SURVEY §2.7 documents:

- **retention ≈ watermark**: ``withWatermark(ts, ttl)`` bounds state just
  like retention bounds the array. Divergence (strictly better): the
  reference silently LOSES late data appended after a future-stamped point
  (verified, uts.ts:133-136 array-order break); a watermark gives late rows
  a bounded grace window and drops them *predictably*.
- **IntervalGrouper ≈ tumbling window**: the reference's bins are anchored
  at a query-time ``now`` and right-INCLUSIVE ``(s, s+w]``; Spark's
  ``F.window`` is epoch-aligned and right-EXCLUSIVE ``[s, s+w)``. On a
  stream there is no query-time ``now``, so we keep the epoch-aligned
  native window (scale path: it's a plain hash aggregation with partial
  state eviction) and expose the same exact-fidelity aggregate EXPRESSIONS
  over it — quirk semantics (zero-defaults, NaN-poisoning, zero-clamps)
  carry over unchanged because they are ordinary Columns.
- **derivative on a stream**: the batch closed form (operators/derivative)
  needs ``tlast`` — unknowable on an unbounded stream — so the stateful
  variant emits an interval's change only once it CLOSES (a later point
  arrives past its end). The never-flushed final partial interval is the
  documented divergence from the batch final-flush-at-``tlast``.

Scale notes (100 TB / 1000 executors): every op below is keyed state —
watermark-evicted aggregation or per-key flat-map-groups-with-state — so
state shards across executors by the grouping key; nothing collects to the
driver; shuffle is one exchange on the key, same as the batch plan.
"""

from __future__ import annotations

from typing import Iterable, Mapping

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from uts_spark.operators import aggregates as agg
from uts_spark.operators.aggregates import Metric


def read_parquet_stream(spark, path: str, schema) -> DataFrame:
    """File-source stream: each new parquet file in ``path`` is a
    micro-batch — the streaming analog of ``Series.insert`` batches.
    (The reference's insert is an array push, uts.ts:271-278.)"""
    return spark.readStream.schema(schema).parquet(path)


def with_retention_watermark(
    df: DataFrame, time_col: str = "ts", ttl: str = "7 days"
) -> DataFrame:
    """Retention (uts.ts:245-269) as a watermark: state older than
    ``max(event time) - ttl`` is evicted instead of swept by a timer."""
    return df.withWatermark(time_col, ttl)


def tumbling_agg_stream(
    df: DataFrame,
    metrics: Mapping[str, Metric],
    interval_ms: int,
    time_col: str = "ts",
    watermark: str | None = "1 hour",
    key_cols: Iterable[str] = (),
    slide_ms: int | None = None,
) -> DataFrame:
    """IntervalGrouper on a stream: watermarked tumbling-window aggregation
    with the SAME exact-fidelity aggregate expressions as the batch path
    (operators/aggregates — mean→0 default, sum/max/min NaN-poisoning and
    zero-clamps). Emits ``start`` (epoch ms) + ``width`` like the batch
    grouper; append output mode finalizes a window when the watermark
    passes its end.

    ``slide_ms`` < ``interval_ms`` turns the windows HOPPING (each event
    lands in ``interval/slide`` overlapping windows — Spark's window
    expression does the fan-out inside the same hash aggregation; no
    self-join, state still watermark-evicted per window).

    ``fill=true`` (empty-bin synthesis) intentionally does NOT exist here:
    a stream cannot enumerate bins that never received data without a
    driver-side clock — consumers wanting gap-fill join against a calendar
    spine downstream (documented divergence)."""
    w = F.window(
        F.col(time_col),
        f"{interval_ms} milliseconds",
        f"{slide_ms} milliseconds" if slide_ms else f"{interval_ms} milliseconds",
    )
    exprs = [
        agg.agg_expr(m, order_col=time_col).alias(k) for k, m in metrics.items()
    ]
    # watermark=None: inherit the watermark already defined upstream —
    # required when chaining stateful operators (Spark disallows
    # REDEFINING the watermark mid-plan, e.g. after a streaming dedup)
    src = df.withWatermark(time_col, watermark) if watermark is not None else df
    out = src.groupBy(w.alias("__w"), *key_cols).agg(*exprs)
    return out.select(
        F.unix_millis(F.col("__w.start")).alias("start"),
        F.lit(int(interval_ms)).alias("width"),
        *key_cols,
        *metrics.keys(),
    )


def uts_interval_agg_stream(
    df: DataFrame,
    metrics: Mapping[str, Metric],
    interval_ms: int,
    now_ms: int,
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """The reference's EXACT IntervalGrouper semantics on a stream:
    ``now``-anchored, right-inclusive bins ``(now-(i+1)·w, now-i·w]``
    (uts.ts:138) rather than Spark's epoch-aligned right-exclusive
    windows. The bucket index is a deterministic per-row expression, so
    it streams through an ordinary watermarked groupBy — windows close
    as the watermark passes their (absolute) end time.

    ``now_ms`` is the fixed anchor (G3's time-shifted ``now``); rows
    after it are dropped exactly like the batch grouper.

    Run in ``complete``/``update`` output mode: the grouping key is a
    DERIVED expression, so Spark cannot tie it to the watermark for
    append-mode finalization. State stays bounded anyway — one row per
    bin, and the bin count is ``(now - oldest)/w`` by construction. Use
    ``tumbling_agg_stream`` (native window, append mode, watermark
    eviction) when epoch alignment is acceptable; this variant exists
    for bit-compatibility with batch uts queries."""
    tcol = F.col(time_col)
    is_timestamp = dict(df.dtypes)[time_col].startswith("timestamp")
    ms = F.unix_millis(tcol) if is_timestamp else tcol
    idx = F.floor((F.lit(now_ms) - ms) / F.lit(int(interval_ms))).cast("long")
    exprs = [
        agg.agg_expr(m, order_col=time_col).alias(k) for k, m in metrics.items()
    ]
    # watermark only applies to TIMESTAMP event-time columns; complete
    # mode runs fine without one (state = one row per bin regardless)
    src = df.withWatermark(time_col, watermark) if is_timestamp else df
    out = (
        src.filter(ms <= F.lit(now_ms))
        .groupBy(idx.alias("__bin"))
        .agg(*exprs)
    )
    start = (
        F.lit(now_ms).cast("long") - (F.col("__bin") + 1) * F.lit(int(interval_ms))
    ).alias("start")
    return out.select(start, F.lit(int(interval_ms)).alias("width"), *metrics.keys())


_UTS_APPEND_OUT = StructType(
    [
        StructField("start", LongType()),
        StructField("width", LongType()),
        StructField("mean_value", DoubleType()),
        StructField("n", LongType()),
    ]
)
# state: 6dp-snapped integer micro-unit sum, row count, non-null value
# count for one bin
_UTS_APPEND_STATE = StructType(
    [
        StructField("acc", LongType()),
        StructField("n", LongType()),
        StructField("nv", LongType()),
    ]
)


def uts_interval_agg_stream_append(
    df: DataFrame,
    interval_ms: int,
    now_ms: int,
    time_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """The reference's exact now-anchored IntervalGrouper in APPEND output
    mode — closing the documented gap of :func:`uts_interval_agg_stream`
    (a DERIVED bucket key can't drive Spark's native append-mode watermark
    finalization). The fix is EVENT-TIME TIMEOUTS on keyed state: each bin
    index keys an ``applyInPandasWithState`` group whose state accumulates
    a decimal-snapped sum + count, with its timeout set to the bin's
    ABSOLUTE end; when the watermark passes that end the group fires once
    with ``state.hasTimedOut`` and emits the finalized (start, width,
    mean, n) row — exactly the append contract the native path gets from
    window-column watermarks.

    Emits mean + count (the replay-gated aggregate pair); empty-bin
    synthesis (fill) intentionally doesn't exist on a stream (see
    tumbling_agg_stream). State: one 2-field row per OPEN bin, evicted at
    emission — strictly bounded by (watermark delay / interval)."""

    def step(key, pdfs, state: GroupState):
        from decimal import ROUND_HALF_UP, Decimal

        six = Decimal("0.000001")
        (bin_idx,) = key
        bin_idx = int(bin_idx)
        if state.hasTimedOut:
            acc, n, nv = state.get
            start = now_ms - (bin_idx + 1) * interval_ms
            # mean over NON-NULL values; 0.0 when the bin has none — the
            # reference's A1 mean empty→0 / COUNT(value) semantics
            mean = (
                float(Decimal(int(acc)).scaleb(-6)) / int(nv) if nv else 0.0
            )
            state.remove()
            yield pd.DataFrame(
                {
                    "start": [start],
                    "width": [interval_ms],
                    "mean_value": [mean],
                    "n": [int(n)],
                }
            )
        else:
            acc, n, nv = state.get if state.exists else (0, 0, 0)
            acc, n, nv = int(acc), int(n), int(nv)
            for pdf in pdfs:
                for v in pdf[value_col]:
                    n += 1
                    if pd.isna(v):  # NULL value: counted in n, not mean
                        continue
                    acc += int(
                        Decimal(float(v)).quantize(six, ROUND_HALF_UP).scaleb(6)
                    )
                    nv += 1
            state.update((acc, n, nv))
            # fire once the watermark passes the bin's right-inclusive end
            state.setTimeoutTimestamp(now_ms - bin_idx * interval_ms + 1)

    tcol = F.col(time_col)
    is_timestamp = dict(df.dtypes)[time_col].startswith("timestamp")
    ms = F.unix_millis(tcol) if is_timestamp else tcol
    idx = F.floor((F.lit(now_ms) - ms) / F.lit(int(interval_ms))).cast("long")
    # watermarks need a TIMESTAMP event-time column: derive one for
    # epoch-ms LONG time columns (the sibling complete-mode grouper
    # accepts both; this operator must too)
    wm_col = time_col
    if not is_timestamp:
        wm_col = "__evt"
        df = df.withColumn(wm_col, F.timestamp_millis(tcol))
    # the > now filter sits AFTER the watermark node so future-stamped
    # sentinel rows still advance the watermark (and thus fire timeouts);
    # the bin index must be a MATERIALIZED column (withColumn) — the
    # stateful operator can't group by a raw derived expression
    src = (
        df.withWatermark(wm_col, watermark)
        .filter(ms <= F.lit(now_ms))
        .withColumn("__bin", idx)
    )
    return src.groupBy("__bin").applyInPandasWithState(
        step,
        outputStructType=_UTS_APPEND_OUT,
        stateStructType=_UTS_APPEND_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def session_agg_stream(
    df: DataFrame,
    metrics: Mapping[str, Metric],
    gap: str = "30 minutes",
    time_col: str = "ts",
    watermark: str = "1 hour",
    key_cols: Iterable[str] = (),
) -> DataFrame:
    """Sessionization on a stream: the same native ``session_window``
    the batch query uses (queries/analytics.session_windows_per_user),
    with watermark-driven finalization — a session emits once the
    watermark passes its close (last event + gap). State per live
    session only; merged in-partition after one shuffle on the keys."""
    w = F.session_window(F.col(time_col), gap)
    exprs = [
        agg.agg_expr(m, order_col=time_col).alias(k) for k, m in metrics.items()
    ]
    out = (
        df.withWatermark(time_col, watermark)
        .groupBy(w.alias("__w"), *key_cols)
        .agg(*exprs)
    )
    return out.select(
        F.unix_millis(F.col("__w.start")).alias("session_start"),
        F.unix_millis(F.col("__w.end")).alias("session_end"),
        *key_cols,
        *metrics.keys(),
    )


def dedup_within_watermark(
    df: DataFrame,
    keys: Iterable[str],
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact streaming dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps one row per key and evicts key
    state once the watermark passes — the streaming face of the batch
    ``dedup_exact`` operator (functions/dedup). The reference never
    dedups (insert appends blindly, uts.ts:271-278); this is north-star
    surface."""
    return df.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


# ---------------------------------------------------------------------------
# stateful streaming derivative (applyInPandasWithState)

_DERIV_OUT = StructType(
    [
        StructField("series", StringType()),
        StructField("time", LongType()),
        StructField("change", DoubleType()),
    ]
)
# state: first point time, prev value, current open-interval end,
# accumulated change in the open interval, last point time (for the
# end-of-stream flush at tlast)
_DERIV_STATE = StructType(
    [
        StructField("tfirst", LongType()),
        StructField("prev_v", DoubleType()),
        StructField("open_end", LongType()),
        StructField("acc", DoubleType()),
        StructField("tprev", LongType()),
    ]
)


def derivative_stateful_stream(
    df: DataFrame,
    interval_ms: int,
    key_col: str = "series",
    time_col: str = "ts_ms",
    value_col: str = "value",
    watermark_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming ``derivative(col, interval)`` (uts.ts:458-507): per-key
    per-interval change, gap intervals emitting zero-change rows — the
    reference's fold (SURVEY §2.4 A9) made incremental.

    Emission rule: the batch closed form accrues each delta to emission
    time ``e = min(tfirst + k*interval ≥ t, tlast)``; on a stream an
    interval is emitted when it CLOSES — i.e. when a point lands beyond
    its end. The final partial interval is flushed by a FLUSH MARKER: a
    row whose ``value_col`` is NULL/NaN drains the key's state, emitting
    the open interval's accumulated change at ``min(open_end, tlast)`` —
    exactly the batch final flush at ``tlast`` (uts.ts:500-506). Feed one
    marker per key at stream shutdown (or from a stop-time hook) and the
    streaming output equals the batch closed form bit-for-bit, final row
    included.

    Scale: state is one 5-field row per series key, sharded by key across
    executors; each micro-batch touches only keys present in the batch.
    """

    def step(key, pdfs, state: GroupState):
        # the accumulator holds 1e-6-unit INTEGERS: each delta is snapped
        # to 6 dp with the same round-half-up the engines use for
        # double→DECIMAL(38,6), so the emitted per-interval change is
        # bit-identical to the batch operator's decimal-stable sum (and
        # the DuckDB oracle) regardless of how many micro-batches the
        # interval's points were spread across
        from decimal import ROUND_HALF_UP, Decimal

        six = Decimal("0.000001")

        (series,) = key
        if state.exists:
            tfirst, prev_v, open_end, acc, tprev = state.get
            acc = int(acc)
        else:
            tfirst = prev_v = open_end = acc = tprev = None
        out_t, out_c = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(time_col)  # micro-batch arrival order
            for t, v in zip(pdf[time_col].astype("int64"), pdf[value_col]):
                if pd.isna(v):  # flush marker: drain state at tlast
                    if tfirst is not None:
                        out_t.append(min(open_end, tprev))
                        out_c.append(float(Decimal(acc).scaleb(-6)))
                        tfirst = prev_v = open_end = acc = tprev = None
                    continue
                t, v = int(t), float(v)
                if tfirst is None:
                    tfirst, prev_v, open_end, acc, tprev = (
                        t, v, t + interval_ms, 0, t,
                    )
                    continue
                while t > open_end:  # close finished intervals, zero-fill gaps
                    out_t.append(open_end)
                    out_c.append(float(Decimal(acc).scaleb(-6)))
                    open_end += interval_ms
                    acc = 0
                acc += int(
                    Decimal(v - prev_v).quantize(six, ROUND_HALF_UP).scaleb(6)
                )
                prev_v = v
                tprev = t
        if tfirst is None:
            if state.exists:
                state.remove()
        else:
            state.update((tfirst, prev_v, open_end, float(acc), tprev))
        if out_t:
            yield pd.DataFrame(
                {"series": series, "time": out_t, "change": out_c}
            )

    grouped = df.groupBy(key_col)
    if watermark_col:
        grouped = df.withWatermark(watermark_col, watermark).groupBy(key_col)
    return grouped.applyInPandasWithState(
        step,
        outputStructType=_DERIV_OUT,
        stateStructType=_DERIV_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def derivative_tws_stream(
    df: DataFrame,
    interval_ms: int,
    key_col: str = "series",
    time_col: str = "ts_ms",
    value_col: str = "value",
) -> DataFrame:
    """The same streaming derivative on the ``transformWithStateInPandas``
    API (Spark 4's successor to applyInPandasWithState): state lives in a
    named ValueState handle inside a StatefulProcessor, which composes
    with multiple state variables, timers, and TTL where the legacy API
    held one opaque tuple. Emission semantics are identical to
    :func:`derivative_stateful_stream` (asserted equal in tests).

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` →
    ``RocksDBStateStoreProvider``) — at scale that is also the right
    provider: state lives off-heap per executor with incremental
    checkpointing, instead of an in-memory HDFS-backed map."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class DerivativeProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("deriv", _DERIV_STATE)

        def handleInputRows(self, key, rows, timer_values):
            (series,) = key
            if self._st.exists():
                tfirst, prev_v, open_end, acc, tprev = self._st.get()
            else:
                tfirst = prev_v = open_end = acc = tprev = None
            out_t, out_c = [], []
            for pdf in rows:
                pdf = pdf.sort_values(time_col)
                for t, v in zip(pdf[time_col].astype("int64"), pdf[value_col]):
                    if pd.isna(v):  # flush marker (see stateful variant)
                        if tfirst is not None:
                            out_t.append(min(open_end, tprev))
                            out_c.append(acc)
                            tfirst = prev_v = open_end = acc = tprev = None
                        continue
                    t, v = int(t), float(v)
                    if tfirst is None:
                        tfirst, prev_v, open_end, acc, tprev = (
                            t, v, t + interval_ms, 0.0, t,
                        )
                        continue
                    while t > open_end:
                        out_t.append(open_end)
                        out_c.append(acc)
                        open_end += interval_ms
                        acc = 0.0
                    acc += v - prev_v
                    prev_v = v
                    tprev = t
            if tfirst is None:
                self._st.clear()
            else:
                self._st.update((tfirst, prev_v, open_end, acc, tprev))
            if out_t:
                yield pd.DataFrame(
                    {"series": series, "time": out_t, "change": out_c}
                )

        def close(self) -> None:
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=DerivativeProcessor(),
        outputStructType=_DERIV_OUT,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Stream-static enrichment

def enrich_stream_static(
    stream: DataFrame, static_dim: DataFrame, on, how: str = "left"
) -> DataFrame:
    """Enrich a stream with a static dimension (the lookup-join every
    event pipeline needs). The static side broadcasts — each micro-batch
    is a map-side hash join, no stream-side shuffle, and the dimension
    snapshot is re-resolved per batch (so an updated static table is
    picked up on the next trigger)."""
    return stream.join(F.broadcast(static_dim), on, how)


# ---------------------------------------------------------------------------
# Streaming anomaly detection (previous-window baseline)

_Z_OUT = StructType(
    [
        StructField("series", StringType()),
        StructField("ts_ms", LongType()),
        StructField("value", DoubleType()),
        StructField("z", DoubleType()),
    ]
)
_Z_STATE = StructType(
    [
        StructField("win_start", LongType()),
        StructField("n", LongType()),
        StructField("s1", DoubleType()),
        StructField("s2", DoubleType()),
        StructField("pn", LongType()),
        StructField("ps1", DoubleType()),
        StructField("ps2", DoubleType()),
    ]
)


def zscore_stream(
    df: DataFrame,
    window_ms: int,
    key_col: str = "series",
    time_col: str = "ts_ms",
    value_col: str = "value",
    min_points: int = 5,
    threshold: float = 3.0,
) -> DataFrame:
    """Streaming z-score outliers: each point is scored against the
    COMPLETED previous epoch-aligned window's mean/stddev for its key
    (the classic baseline-vs-live design — the live window can't score
    its own points without lookahead). Emits only flagged points.

    The batch analog (operators/timeseries.anomaly_zscore) scores
    against a trailing RANGE frame; the streaming divergence — discrete
    baseline windows instead of a sliding frame — is the price of O(1)
    state: two (n, Σv, Σv²) triples per key, regardless of rate. After
    a silent gap the baseline window is empty and nothing flags until a
    full window of data rebuilds it (documented cold-start behavior).
    Scale: state shards by key; each micro-batch touches only keys
    present in that batch.
    """

    def step(key, pdfs, state: GroupState):
        (series,) = key
        if state.exists:
            win_start, n, s1, s2, pn, ps1, ps2 = state.get
        else:
            win_start = None
            n, s1, s2, pn, ps1, ps2 = 0, 0.0, 0.0, 0, 0.0, 0.0
        out_t, out_v, out_z = [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(time_col)
            for t, v in zip(pdf[time_col].astype("int64"), pdf[value_col]):
                t, v = int(t), float(v)
                if win_start is None:
                    win_start = (t // window_ms) * window_ms
                while t >= win_start + window_ms:
                    pn, ps1, ps2 = n, s1, s2
                    n, s1, s2 = 0, 0.0, 0.0
                    win_start += window_ms
                if pn >= min_points:
                    mean = ps1 / pn
                    var = (ps2 - ps1 * ps1 / pn) / pn
                    if var > 0:
                        z = (v - mean) / var ** 0.5
                        if abs(z) > threshold:
                            out_t.append(t)
                            out_v.append(v)
                            out_z.append(z)
                n += 1
                s1 += v
                s2 += v * v
        state.update((win_start, n, s1, s2, pn, ps1, ps2))
        if out_t:
            yield pd.DataFrame(
                {"series": series, "ts_ms": out_t, "value": out_v, "z": out_z}
            )

    return df.groupBy(key_col).applyInPandasWithState(
        step,
        outputStructType=_Z_OUT,
        stateStructType=_Z_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lo_ms: int,
    hi_ms: int,
    watermark: str,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: right rows with ``right_ts`` in
    ``[left_ts + lo_ms, left_ts + hi_ms]`` for the same ``key``.

    Both sides get an event-time watermark, and the join condition bounds
    the event-time gap — together that is exactly what Spark needs to
    EVICT join state: a buffered left row can be dropped once the right
    watermark passes ``left_ts + hi_ms`` (and vice versa), so state is
    O(rate × window), not O(stream). Without the time bound an inner
    stream-stream join must buffer both streams forever.

    Matches emit as they are found (inner-join append mode needs no
    watermark finalization — only cleanup). ``how="left_outer"`` /
    ``"right_outer"``: the unmatched row emits with NULL other-side
    columns only once the watermark passes its join window (it cannot
    be declared match-less earlier) — Spark requires exactly the
    watermark + time-bound combination this operator always builds.
    ``left_ts``/``right_ts`` must be distinct TIMESTAMP column names;
    non-key columns should be pre-renamed to avoid output ambiguity.
    Scale: one shuffle of each side on ``key``, symmetric-hash state
    per key partition."""
    assert how in ("inner", "left_outer", "right_outer")
    assert left_ts != right_ts, "rename time columns to distinct names"
    l = left.withWatermark(left_ts, watermark).alias("__l")
    r = right.withWatermark(right_ts, watermark).alias("__r")
    cond = (
        (F.col(f"__l.{key}") == F.col(f"__r.{key}"))
        & (
            F.col(f"__r.{right_ts}")
            >= F.col(f"__l.{left_ts}") + F.expr(f"INTERVAL {lo_ms} MILLISECOND")
        )
        & (
            F.col(f"__r.{right_ts}")
            <= F.col(f"__l.{left_ts}") + F.expr(f"INTERVAL {hi_ms} MILLISECOND")
        )
    )
    return l.join(r, cond, how).drop(F.col(f"__r.{key}"))


def kmv_distinct_stream(
    df: DataFrame,
    id_expr: Column,
    interval_ms: int,
    time_col: str = "ts",
    watermark: str | None = "1 hour",
    k: int = 64,
) -> DataFrame:
    """Streaming distinct-count sketch per tumbling window: the KMV
    estimator (k smallest portable-hash values; see the batch
    ``sketch_kmv_distinct`` query) over a watermarked window aggregation
    — append mode emits one (start, width, kmv_est, n_seen) row when the
    watermark closes a window.

    The k-min set is exactly the kind of small mergeable state streaming
    aggregation wants: order-insensitive, idempotent under duplicates,
    and union-mergeable across batches. This implementation keeps the
    window's distinct hash set via ``collect_set`` and trims to k at
    serialization — semantically identical to a capped accumulator; a
    state-size-critical deployment would cap in-flight state with
    ``transformWithState`` (same estimate, bounded memory).
    """
    from uts_spark.functions.hashing import hash64

    w = F.window(F.col(time_col), f"{interval_ms} milliseconds")
    src = df.withWatermark(time_col, watermark) if watermark is not None else df
    agg = (
        src.select(F.col(time_col), id_expr.alias("__id"))
        .select(F.col(time_col), hash64(F.col("__id").cast("string")).alias("__h"))
        .groupBy(w.alias("__w"))
        .agg(
            F.array_sort(F.collect_set("__h")).alias("__hs"),
        )
    )
    n_seen = F.size("__hs")
    kth = F.element_at("__hs", k)
    est = F.when(
        n_seen >= k, F.lit(float((k - 1) * (1 << 60))) / kth
    ).otherwise(n_seen.cast("double"))
    return agg.select(
        F.unix_millis(F.col("__w.start")).alias("start"),
        F.lit(int(interval_ms)).alias("width"),
        est.alias("kmv_est"),
        n_seen.alias("n_distinct_seen"),
    )


_COV_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("island_start", LongType()),
        StructField("island_end", LongType()),
        StructField("dur_ms", LongType()),
    ]
)
_COV_STATE = StructType(
    [StructField("cs", LongType()), StructField("ce", LongType())]
)


def interval_coverage_stream(
    df: DataFrame,
    key_col: str = "key",
    start_col: str = "s",
    end_col: str = "e",
) -> DataFrame:
    """Streaming union-of-intervals coverage (the stateful face of
    operators/timeseries.interval_coverage): per-key state is just the
    OPEN island (start, running max end); an arriving interval either
    extends it or closes it — a closed island emits immediately with
    its span. Requires per-key arrival in start order (the batch
    operator's sort; replay feeds it ordered). The final open island
    stays in state — same divergence contract as the streaming
    derivative, and the replay oracle simply excludes each key's last
    island. Integer arithmetic end-to-end → hash-exact.

    Scale: two longs of state per key, sharded by key; each batch
    touches only the keys it contains."""

    def step(key, pdfs, state: GroupState):
        (k,) = key
        cs, ce = state.get if state.exists else (None, None)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values([start_col, end_col])
            for s, e in zip(
                pdf[start_col].astype("int64"), pdf[end_col].astype("int64")
            ):
                s, e = int(s), int(e)
                if cs is None:
                    cs, ce = s, e
                elif s > ce:
                    out.append((k, cs, ce, ce - cs))
                    cs, ce = s, e
                elif e > ce:
                    ce = e
        state.update((cs, ce))
        if out:
            yield pd.DataFrame(
                out, columns=["key", "island_start", "island_end", "dur_ms"]
            )

    return df.groupBy(key_col).applyInPandasWithState(
        step,
        outputStructType=_COV_OUT,
        stateStructType=_COV_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_CSESS_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("ts_ms", LongType()),
        StructField("order_id", LongType()),
        StructField("session_seq", LongType()),
        StructField("session_start", LongType()),
    ]
)
_CSESS_STATE = StructType(
    [
        StructField("seq", LongType()),
        StructField("start", LongType()),
        StructField("prev", LongType()),
    ]
)


def capped_session_stream(
    df: DataFrame,
    gap_ms: int,
    cap_ms: int,
    key_col: str = "key",
    time_col: str = "ts_ms",
    order_col: str = "order_id",
) -> DataFrame:
    """Streaming capped-duration sessionization (the stateful face of
    operators/timeseries.capped_sessions): per-key state is three longs
    (session seq, session start, previous event time); every event
    emits its assignment IMMEDIATELY — no finalization wait, so unlike
    windowed aggs this stateful op has no open-item divergence at all;
    the ordered replay hash-matches the batch fold row for row.
    Requires per-key arrival in time order (same contract as the
    streaming derivative)."""

    def step(key, pdfs, state: GroupState):
        (k,) = key
        seq, start, prev = state.get if state.exists else (0, None, None)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values([time_col, order_col])
            for t, o in zip(
                pdf[time_col].astype("int64"), pdf[order_col].astype("int64")
            ):
                t, o = int(t), int(o)
                if start is None or t - prev >= gap_ms or t - start > cap_ms:
                    seq += 1
                    start = t
                prev = t
                out.append((k, t, o, seq, start))
        state.update((seq, start, prev))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "key", "ts_ms", "order_id", "session_seq", "session_start",
                ],
            )

    return df.groupBy(key_col).applyInPandasWithState(
        step,
        outputStructType=_CSESS_OUT,
        stateStructType=_CSESS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_EWMA_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("ts_ms", LongType()),
        StructField("value", DoubleType()),
        StructField("ewma", DoubleType()),
    ]
)
_EWMA_STATE = StructType([StructField("y", DoubleType())])


def ewma_stream(
    df: DataFrame,
    alpha: float,
    key_col: str = "key",
    time_col: str = "ts_ms",
    value_col: str = "value",
    order_col: str = "order_id",
) -> DataFrame:
    """Streaming EWMA (the stateful face of operators/timeseries.ewma):
    one double of state per key, the identical multiply-add order as
    the batch fold, per-event emission — the ordered replay
    hash-matches the batch operator exactly. The smoothing primitive
    for live dashboards where the batch recompute would re-read the
    whole history every refresh."""
    a = float(alpha)
    b = 1.0 - a

    def step(key, pdfs, state: GroupState):
        (k,) = key
        (y,) = state.get if state.exists else (None,)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values([time_col, order_col])
            for t, x in zip(
                pdf[time_col].astype("int64"), pdf[value_col]
            ):
                x = float(x)
                y = x if y is None else a * x + b * y
                out.append((k, int(t), x, y))
        state.update((y,))
        if out:
            yield pd.DataFrame(out, columns=["key", "ts_ms", "value", "ewma"])

    return df.groupBy(key_col).applyInPandasWithState(
        step,
        outputStructType=_EWMA_OUT,
        stateStructType=_EWMA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_RATE_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("ts_ms", LongType()),
        StructField("value", DoubleType()),
        StructField("rate_per_s", DoubleType()),
    ]
)
_RATE_STATE = StructType(
    [StructField("pt", LongType()), StructField("pv", DoubleType())]
)


def counter_rate_stream(
    df: DataFrame,
    key_col: str = "key",
    time_col: str = "ts_ms",
    value_col: str = "value",
    order_col: str = "order_id",
) -> DataFrame:
    """Streaming reset-aware counter rate (the stateful face of
    operators/timeseries.counter_rate): state is the previous (time,
    value) pair per key; every subsequent event emits its per-second
    rate immediately, with a counter reset (value drop) treated as the
    new value being the whole increase — Prometheus ``rate`` semantics,
    live. Per-event emission, identical arithmetic order to the batch
    window expression → ordered replay hash-matches it exactly."""

    def step(key, pdfs, state: GroupState):
        (k,) = key
        pt, pv = state.get if state.exists else (None, None)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values([time_col, order_col])
            for t, v in zip(
                pdf[time_col].astype("int64"), pdf[value_col]
            ):
                t, v = int(t), float(v)
                if pt is not None:
                    delta = v - pv if v >= pv else v
                    out.append((k, t, v, delta / ((t - pt) / 1000.0)))
                pt, pv = t, v
        state.update((pt, pv))
        if out:
            yield pd.DataFrame(
                out, columns=["key", "ts_ms", "value", "rate_per_s"]
            )

    return df.groupBy(key_col).applyInPandasWithState(
        step,
        outputStructType=_RATE_OUT,
        stateStructType=_RATE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_BAL_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("ts_ms", LongType()),
        StructField("delta", DoubleType()),
        StructField("order_id", LongType()),
        StructField("balance", DoubleType()),
    ]
)
_BAL_STATE = StructType([StructField("bal", DoubleType())])


def clamped_balance_stream(
    df: DataFrame,
    floor_value: float = 0.0,
    key_col: str = "key",
    time_col: str = "ts_ms",
    delta_col: str = "delta",
    order_col: str = "order_id",
) -> DataFrame:
    """Streaming floor-clamped running balance (the stateful face of
    operators/timeseries.clamped_running_balance): one double of state
    per key, add-then-clamp in the identical order, per-event emission
    — live inventory / prepaid-credit / battery level, hash-exact
    against the batch fold under ordered replay."""
    fv = float(floor_value)

    def step(key, pdfs, state: GroupState):
        (k,) = key
        (bal,) = state.get if state.exists else (fv,)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values([time_col, order_col])
            for t, d, o in zip(
                pdf[time_col].astype("int64"),
                pdf[delta_col],
                pdf[order_col].astype("int64"),
            ):
                bal = bal + float(d)
                if bal < fv:
                    bal = fv
                out.append((k, int(t), float(d), int(o), bal))
        state.update((bal,))
        if out:
            yield pd.DataFrame(
                out, columns=["key", "ts_ms", "delta", "order_id", "balance"]
            )

    return df.groupBy(key_col).applyInPandasWithState(
        step,
        outputStructType=_BAL_OUT,
        stateStructType=_BAL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming near-dup prefilter (SimHash bucket state)

_NEARDUP_OUT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("band", LongType()),
        StructField("hamming", LongType()),
    ]
)
_NEARDUP_STATE = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("sketches", ArrayType(LongType())),
    ]
)


def simhash_neardup_stream(
    df: DataFrame,
    bands: int = 4,
    bits: int = 48,
    id_col: str = "doc_id",
    sketch_col: str = "simhash",
    time_col: str | None = None,
    watermark: str = "1 hour",
    horizon_ms: int = 0,
) -> DataFrame:
    """STREAM-side near-duplicate prefilter: each arriving document's
    SimHash is banded (``bands`` slices of ``bits/bands`` bits); per
    (band, slice) bucket, keyed state holds the sketches seen so far and
    each arrival emits its minimum hamming distance against EARLIER
    bucket-mates — the streaming face of the batch
    ``dedup_simhash_pairs`` LSH (a doc that shares no band bucket with
    anything seen is a guaranteed non-candidate, exactly the batch
    banding guarantee).

    Input needs (id_col, sketch_col) — sketches are a stateless per-row
    computation upstream (Column exprs or a pandas UDF over the text),
    so this operator is the only stateful stage. Downstream, min over a
    doc's bands gives its best-match distance; ``<= max_hamming`` is the
    dedup-drop signal.

    State: one (ids, sketches) pair of arrays per OCCUPIED bucket. Pass
    ``time_col`` (event-time TIMESTAMP) + ``horizon_ms`` to bound it:
    each bucket's event-time timeout is pushed to (last arrival +
    horizon), and when the watermark passes it the bucket's sketches are
    EVICTED — the dedup-horizon contract (a re-arrival after the horizon
    is treated as new, exactly what watermark-evicted exact dedup does).
    Without ``time_col`` state is unbounded — the replay harness uses
    that on purpose to match the batch oracle over the whole corpus."""
    width = bits // bands
    mask = (1 << width) - 1

    slices = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col(sketch_col), b * width)
            .bitwiseAND(F.lit(mask)).alias("slice"),
        )
        for b in range(bands)
    ])
    evict = time_col is not None
    cols = [
        F.col(id_col).alias("doc_id"),
        F.col(sketch_col).alias("sk"),
        F.explode(slices).alias("__s"),
    ]
    src = df.withWatermark(time_col, watermark) if evict else df
    if evict:
        # the watermark-tagged column itself must flow into the stateful
        # operator (event-time timeout requires it in the child output);
        # __ms rides alongside for the state arithmetic
        cols.append(F.col(time_col))
        cols.append(F.unix_millis(F.col(time_col)).alias("__ms"))
    exploded = src.select(*cols).select(
        "doc_id", "sk",
        F.col("__s.band").alias("band"), F.col("__s.slice").alias("slice"),
        *([time_col, "__ms"] if evict else []),
    )

    def step(key, pdfs, state: GroupState):
        band = int(key[0])
        if evict and state.hasTimedOut:
            state.remove()  # horizon passed: forget this bucket
            return
        if state.exists:
            ids, sketches = state.get
            ids, sketches = list(ids), list(sketches)
        else:
            ids, sketches = [], []
        out_d, out_h = [], []
        last_ms = None
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id")  # arrival order within batch
            ms_col = pdf["__ms"].astype("int64") if evict else [0] * len(pdf)
            for doc_id, sk, ms in zip(
                pdf["doc_id"].astype("int64"), pdf["sk"].astype("int64"), ms_col
            ):
                doc_id, sk = int(doc_id), int(sk)
                if sketches:
                    best = min(bin(sk ^ h).count("1") for h in sketches)
                    out_d.append(doc_id)
                    out_h.append(best)
                ids.append(doc_id)
                sketches.append(sk)
                if evict:
                    ms = int(ms)
                    last_ms = ms if last_ms is None else max(last_ms, ms)
        state.update((ids, sketches))
        if evict and last_ms is not None:
            state.setTimeoutTimestamp(last_ms + horizon_ms)
        if out_d:
            yield pd.DataFrame(
                {"doc_id": out_d, "band": band, "hamming": out_h}
            )

    return exploded.groupBy("band", "slice").applyInPandasWithState(
        step,
        outputStructType=_NEARDUP_OUT,
        stateStructType=_NEARDUP_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout if evict
            else GroupStateTimeout.NoTimeout
        ),
    )


_KMV_STREAM_OUT = (
    "day long, n_min long, kth_hv long, kmv_est double"
)
_KMV_STREAM_STATE = "hv array<bigint>"


def kmv_daily_stream(
    df: DataFrame,
    k: int = 64,
    hash_space: float = float(1 << 60),
    time_col: str = "ts",
    hv_col: str = "hv",
    watermark: str = "60 days",
) -> DataFrame:
    """STREAMING K-minimum-values distinct sketch: per day-window the
    state is the sorted set of the <= k smallest 60-bit hashes seen — a
    few hundred bytes per open window, independent of cardinality, and
    ORDER-INDEPENDENT (min-k is commutative/associative), so replayed
    micro-batches finalize bit-identically to batch however the rows
    are sliced. Finalization is an event-time timeout at the day's end
    (the applyInPandasWithState append pattern of
    uts_interval_agg_stream_append); the emitted estimate is the batch
    KMV estimator (k-1)*H/h_(k), exact below k."""
    import pandas as pd  # noqa: F811

    DAY = 86_400_000

    def step(key, pdfs, state: GroupState):
        (day,) = key
        day = int(day)
        if state.hasTimedOut:
            (hv_list,) = state.get
            hv = sorted(int(x) for x in hv_list)
            state.remove()
            n = len(hv)
            if n >= k:
                kth = hv[k - 1]
                est = (k - 1) * hash_space / float(kth)
            else:
                kth = None
                est = float(n)
            yield pd.DataFrame(
                {
                    "day": [day * DAY],
                    "n_min": [n],
                    "kth_hv": [kth],
                    "kmv_est": [est],
                }
            )
        else:
            cur = set(int(x) for x in state.get[0]) if state.exists else set()
            for pdf in pdfs:
                cur.update(int(x) for x in pdf[hv_col])
            keep = sorted(cur)[:k]
            state.update((keep,))
            state.setTimeoutTimestamp((day + 1) * DAY + 1)

    src = (
        df.withWatermark(time_col, watermark)
        .withColumn(
            "__day",
            F.floor(F.unix_millis(F.col(time_col)) / F.lit(DAY)).cast("long"),
        )
    )
    return src.groupBy("__day").applyInPandasWithState(
        step,
        outputStructType=_KMV_STREAM_OUT,
        stateStructType=_KMV_STREAM_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
