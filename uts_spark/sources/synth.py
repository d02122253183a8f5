"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): a
deterministic synthetic series generator, `uts-synth`.

The reference has no pluggable source surface at all (uts.ts ingests via
`insert` only); Spark's V2 Python DataSource API is the idiomatic
extension point — a source declares its schema and PARTITIONS, and each
partition generates/reads its slice executor-side, so a synthetic load
(or any external system wrapped the same way) scales out like a parquet
scan instead of bottlenecking on a driver-side generator loop.

Determinism contract: row content is a pure function of (seed, row id),
via the same md5 construction as the portable hash family — two reads of
the same options produce identical tables, which is what makes the
source usable in oracle-checked tests.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


def _h(seed: int, i: int, salt: str) -> int:
    return int(
        hashlib.md5(f"{salt}:{seed}:{i}".encode()).hexdigest()[:15], 16
    )


class _SeriesPartition(InputPartition):
    def __init__(self, pid: int, start: int, end: int):
        self.pid, self.start, self.end = pid, start, end


class SynthSeriesReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.n = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 7))
        self.t0 = int(options.get("start_ms", 1_700_000_000_000))
        self.step = int(options.get("step_ms", 1000))

    def partitions(self):
        per = -(-self.n // self.parts)  # ceil
        return [
            _SeriesPartition(p, p * per, min((p + 1) * per, self.n))
            for p in range(self.parts)
            if p * per < self.n
        ]

    def read(self, partition: _SeriesPartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (
                i,                                        # ingest_id
                self.t0 + i * self.step,                  # time
                f"s{_h(self.seed, i, 'k') % 8}",          # series key
                (_h(self.seed, i, 'v') % 1_000_000) / 100.0,  # value
            )


class SynthSeriesDataSource(DataSource):
    """`spark.read.format("uts-synth").option("rows", N)...` — options:
    rows, partitions, seed, start_ms, step_ms."""

    @classmethod
    def name(cls) -> str:
        return "uts-synth"

    def schema(self) -> str:
        return "ingest_id long, time long, series string, value double"

    def reader(self, schema: StructType) -> SynthSeriesReader:
        return SynthSeriesReader(schema, self.options)

    def streamReader(self, schema: StructType) -> "SynthSeriesStreamReader":
        return SynthSeriesStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SynthSeriesDataSource)


# ---------------------------------------------------------------------------
# Streaming side: the same deterministic generator as an unbounded source.
# Offsets are plain row indices; each micro-batch emits `rate` rows split
# into `partitions` slices, so the stream is replayable from any offset —
# the property Structured Streaming needs for exactly-once recovery
# (a checkpointed offset range re-reads identically).

from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SynthSeriesStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.rate = int(options.get("rows_per_batch", 100))
        self.parts = int(options.get("partitions", 2))
        self.seed = int(options.get("seed", 7))
        self.t0 = int(options.get("start_ms", 1_700_000_000_000))
        self.step = int(options.get("step_ms", 1000))
        self._current = 0

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        # _current is restart-aware BEFORE this is called: on recovery
        # Spark replays the last logged batch via partitions(start, end)
        # (and re-commits) first, and both paths max() the counter up to
        # the logged range — so the offset stream stays monotone across
        # restarts instead of depending on partitions() repairing a
        # backwards end after the engine already persisted it (ADVICE r3)
        self._current += self.rate
        return {"index": self._current}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["index"], end["index"]
        if hi < lo:
            # defense-in-depth: never emit a backwards range even if an
            # engine version plans one from a stale offset log
            hi = lo
        # restart-awareness: any planned or replayed range advances the
        # in-memory counter, so the next latestOffset() continues AFTER
        # the checkpointed position (never below a committed offset)
        self._current = max(self._current, hi)
        per = -(-(hi - lo) // self.parts) if hi > lo else 1
        return [
            _RangePartition(lo + p * per, min(lo + (p + 1) * per, hi))
            for p in range(self.parts)
            if lo + p * per < hi
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield (
                i,
                self.t0 + i * self.step,
                f"s{_h(self.seed, i, 'k') % 8}",
                (_h(self.seed, i, 'v') % 1_000_000) / 100.0,
            )

    def commit(self, end: dict) -> None:
        # second restart seed: Spark re-commits the last completed batch
        # during recovery, so a fresh reader learns the committed
        # position here even before planning a range
        self._current = max(self._current, end["index"])

    def stop(self) -> None:
        pass
