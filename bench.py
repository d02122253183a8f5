#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes fully via the noop sink (no driver-side collect — the
measured cost is the distributed plan, not result transfer).

Each query runs three times: one cold pass (pays one-time JVM codegen of
the generated code, ~2-4 s for the biggest dedup DAGs) and two timed
steady-state passes, reporting the per-query MINIMUM of the timed
passes. Codegen amortizes to zero against hours of executor time at
production scale, so steady-state is the number that predicts 100 TB
behavior; the min damps co-tenant CPU noise (observed 2-8x spikes on
this host). The cold pass total is emitted under "cold_total_sec" so
compile overhead stays visible.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from uts_spark.session import get_spark
    from uts_spark.registry import QUERIES, HEADLINE

    spark = get_spark("uts-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # pass 1 (cold): pays JVM codegen + parquet footer first-touch
    cold: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.time() - t0, 3)

    # passes 2-3 (steady-state): per-query min is reported — what a
    # long-running cluster job actually sustains
    timings: dict[str, float] = {}
    for _ in range(2):
        for name in HEADLINE:
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cold_total_sec": round(sum(cold.values()), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
