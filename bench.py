#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints a
COMPACT final JSON line: {"metric": ..., "value": total_sec, "unit":
"sec", "queries": {name: sec}, "sf": ...}.

Each query executes fully via the noop sink (no driver-side collect — the
measured cost is the distributed plan, not result transfer).

Noise-robust protocol (round 5): one cold pass (pays one-time JVM codegen
of the generated code, ~2-4 s for the biggest dedup DAGs) then THREE
steady-state passes; the reported per-query number is the MEDIAN of the
warm passes, which is robust to a single co-tenant CPU spike in either
direction (observed 2-8x spikes on this host made BENCH_r04 read +23%
uniform inflation).

Artifact-format lessons (rounds 5-6): the driver's parser reads the LAST
stdout line through a bounded tail buffer (~2 KB — BENCH_r06's tail
starts mid-line), so the final line must stay small.  The final line now
carries ONLY the compact summary (metric/value/queries-median/totals/
loadavg/calibration, ~1.5 KB at 36 queries); the full detail (per-query
min, cold, raw warm samples) goes to an EARLIER stdout line and to the
sidecar file BENCH_DETAIL.json next to this script.

Host-drift calibration (round 6 lesson): the judge measured ~20% wall
drift between the r5 and r6 artifact runs using identical code — the
artifact could not distinguish "host got slower" from "plans got
slower".  Two fixed-work calibration constants are now recorded so
cross-round totals self-normalize:
  - calib_cpu_sec: min-of-3 single-core pure-Python busy loop (fixed
    iteration count) — tracks raw CPU speed / co-tenancy.
  - calib_spark_sec: min-of-3 fixed Spark job (sum over a 200M-row
    range, 32 partitions, whole-stage codegen, no I/O) — tracks the
    JVM+scheduler side at the bench's own parallelism.
Normalize round-over-round as total_r{N} * (calib_r{ref}/calib_r{N}).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WARM_PASSES = 3
_CALIB_LOOP_N = 2_000_000
_CALIB_SPARK_ROWS = 200_000_000


def _calib_cpu() -> float:
    """Fixed single-core busy loop; min of 3 runs (seconds)."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0
        for i in range(_CALIB_LOOP_N):
            acc += i * i
        best = min(best, time.perf_counter() - t0)
    assert acc >= 0
    return round(best, 4)


def _calib_spark(spark) -> float:
    """Fixed in-memory Spark job (codegen sum over range); min of 3."""
    job = lambda: spark.range(0, _CALIB_SPARK_ROWS, 1, 32).selectExpr(
        "sum(id * 2) as s"
    ).collect()
    job()  # warm codegen
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        job()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from uts_spark.session import get_spark
    from uts_spark.registry import QUERIES, HEADLINE

    # Quiet-host guard (VERDICT r7 #8): the r7 artifact started at
    # loadavg 4.43 and its numbers ran 15-30% hot — the single-core CPU
    # calibration constant cannot correct multi-core contention. Wait
    # (bounded) for the 1-min load to drop below 1.0; if it never does,
    # stamp `contended: true` so the driver can discount the artifact
    # instead of silently adjudicating inflated numbers.
    wait_budget = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_WAIT", "600"))
    waited = 0.0
    while os.getloadavg()[0] > 1.0 and waited < wait_budget:
        time.sleep(15)
        waited += 15
    load_start = os.getloadavg()
    contended = load_start[0] > 1.0
    calib_cpu = _calib_cpu()
    spark = get_spark("uts-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    calib_spark = _calib_spark(spark)

    # pass 1 (cold): pays JVM codegen + parquet footer first-touch
    cold: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.time() - t0, 3)

    # warm passes: median predicts sustained behavior, min is best-case
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(WARM_PASSES):
        for name in HEADLINE:
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(time.time() - t0)

    med = {n: round(statistics.median(s), 2) for n, s in samples.items()}
    mins = {n: round(min(s), 3) for n, s in samples.items()}
    load_end = os.getloadavg()

    detail = {
        "queries_median": {n: round(statistics.median(s), 3) for n, s in samples.items()},
        "queries_min": mins,
        "queries_cold": cold,
        "samples": {n: [round(x, 3) for x in s] for n, s in samples.items()},
        "calib_cpu_sec": calib_cpu,
        "calib_spark_sec": calib_spark,
        "sf": sf,
        "warm_passes": WARM_PASSES,
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in load_end],
    }
    summary = {
        "metric": "headline_queries_total",
        "value": round(sum(statistics.median(s) for s in samples.values()), 3),
        "unit": "sec",
        "queries": med,
        "min_total_sec": round(sum(mins.values()), 3),
        "cold_total_sec": round(sum(cold.values()), 3),
        "sf": sf,
        "warm_passes": WARM_PASSES,
        "calib_cpu_sec": calib_cpu,
        "calib_spark_sec": calib_spark,
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in load_end],
        "contended": contended,
        "quiet_waited_sec": round(waited, 1),
    }

    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)

    # Detail first (earlier stdout line + sidecar), compact summary LAST:
    # the driver's artifact parser reads the last stdout line through a
    # ~2 KB tail buffer (BENCH_r06 parsed:null — the old single fat line
    # overran it), and py4j/log4j shutdown chatter must not follow the
    # summary, so Spark is stopped in between.
    print("BENCH_DETAIL " + json.dumps(detail), flush=True)
    spark.stop()
    print(json.dumps(summary, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
