#!/usr/bin/env python3
"""Skewed-join benchmark: one hot key carrying most of the fact table.

Measures the three strategies SCALE.md discusses, on identical data:
  plain      — shuffle hash/sort-merge join, AQE off: the hot key lands on
               ONE reducer (the 100 TB failure mode);
  aqe_skew   — AQE skew-join split (spark.sql.adaptive.skewJoin): runtime
               re-plan splits the oversized partition;
  salted     — operators/joins.salted_join: deterministic salt spreads the
               hot key over N reducers, right side replicated N times
               (the manual fallback when a single key is too hot for any
               unsplit partition, or AQE is unavailable).

Broadcast is disabled throughout — with a broadcastable dim the whole
question disappears (that IS the first-choice fix; this bench is the
non-broadcastable case). Prints one JSON line with seconds per strategy.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uts_spark.operators.joins import salted_join
from uts_spark.session import get_spark

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
HOT_SHARE = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4
N_KEYS = 50_000


def main() -> None:
    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    hot_rows = int(ROWS * HOT_SHARE)
    # key 0 carries HOT_SHARE of the fact table; the rest is uniform
    fact = spark.range(ROWS).select(
        F.when(F.col("id") < hot_rows, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        .cast("long")
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"),
        F.concat(F.lit("grp_"), (F.col("id") % 64).cast("string")).alias("grp"),
    )
    fact.write.format("noop").mode("overwrite").save()  # warm JIT/codegen

    def run(name: str, df) -> float:
        t0 = time.time()
        df.groupBy("grp").agg(F.sum("v").alias("s")).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.time() - t0, 3)

    timings = {}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    timings["plain_no_aqe"] = run("plain", fact.join(dim, "k"))
    timings["salted_no_aqe"] = run("salted", salted_join(fact, dim, ["k"], salt=16))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # thresholds low enough that the bench's ~200MB hot partition triggers
    # the split on a laptop-sized dataset
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    timings["plain_aqe_skew"] = run("aqe", fact.join(dim, "k"))
    # salted under AQE too: measures whether the manual salt and the
    # runtime split compose or fight (VERDICT r5 #3 asked for the A/B)
    timings["salted_aqe"] = run(
        "salted_aqe", salted_join(fact, dim, ["k"], salt=16)
    )

    print(
        json.dumps(
            {
                "metric": "skew_join_strategies",
                "unit": "sec",
                "rows": ROWS,
                "hot_share": HOT_SHARE,
                "timings": timings,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
