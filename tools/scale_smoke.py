#!/usr/bin/env python3
"""Scale smoke beyond the driver testdata: generate N synthetic events
JVM-SIDE (spark.range + hash-derived columns — no Python in the data
path, no files) and time the core operator families on them. sf0.1
events is 600k rows; default here is 20M (~33×), demonstrating the
same plans at a scale where a driver-side or single-partition mistake
would be minutes, not noise.

Run: python3 tools/scale_smoke.py [rows]
Prints one JSON line {"rows": N, "timings": {op: sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from uts_spark.session import get_spark

    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = 1_700_000_000_000
    ev = spark.range(rows).select(
        F.col("id").alias("ingest_id"),
        (F.lit(t0) + F.col("id") * 50
         + F.pmod(F.xxhash64("id"), 40_000)).alias("ts_ms"),
        F.pmod(F.xxhash64("id", F.lit(1)), 5_000).alias("user_id"),
        F.concat(F.lit("t"), F.pmod(F.xxhash64("id", F.lit(2)), 8)
                 .cast("string")).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(3)), 1_000_000) / 100.0
         ).alias("value"),
    )

    from uts_spark.operators.aggregates import Metric
    from uts_spark.operators.timeseries import ohlc
    from uts_spark.plans.groupers import interval
    from uts_spark.plans.tsdb import Series

    now = t0 + rows * 50 + 40_000
    HOUR = 3_600_000

    def uts_interval(df):
        s = Series(df, time_col="ts_ms", order_col="ingest_id")
        return s.query(
            {"mean_value": Metric("mean", "value", params={"stable": True}),
             "n": Metric("count")},
            group=interval(24 * HOUR, fill=True, now=now),
        )

    def _equidepth(df):
        from uts_spark.operators.distributed_rank import (
            ntile_from_rank,
            ranked_cumsum,
        )

        r = ranked_cumsum(
            df.select("value", "ingest_id"),
            F.col("value"),
            [F.asc("value"), F.asc("ingest_id")],
            n_buckets=128,
            sample_mod=512,
        )
        d = r.select(
            "value", ntile_from_rank(F.col("__rank"), F.col("__n"), 10).alias("decile")
        )
        return d.groupBy("decile").agg(
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )

    def _funnel_step(df):
        from uts_spark.operators.joins import binned_range_join

        DAY = 86_400_000
        s = df.filter(F.col("event_type") == "t0").select(
            "user_id", F.col("ingest_id").alias("sid"),
            F.col("ts_ms").alias("t1"),
        )
        c = df.filter(F.col("event_type") == "t1").select(
            "user_id", F.col("ingest_id").alias("cid"),
            F.col("ts_ms").alias("tc"),
        )
        j = binned_range_join(
            s, c,
            left_lo=F.col("t1") + 1, left_hi=F.col("t1") + DAY,
            right_ts=F.col("tc"), bin_width=DAY, keys=["user_id"],
        )
        return j.groupBy("user_id", "sid").agg(
            F.min(F.struct("tc", "cid")).alias("__first")
        )

    def _funnel_step_arrays(df):
        from uts_spark.operators.joins import binned_first_after

        DAY = 86_400_000
        s = df.filter(F.col("event_type") == "t0").select(
            "user_id", F.col("ingest_id").alias("sid"),
            F.col("ts_ms").alias("t1"),
        )
        c = df.filter(F.col("event_type") == "t1").select(
            "user_id", F.col("ingest_id").alias("cid"),
            F.col("ts_ms").alias("tc"),
        )
        return binned_first_after(
            s, c, F.col("t1"), F.col("tc"), DAY, ["user_id"],
            right_payload=["cid"],
        )

    ops = {
        "uts_interval_mean_fill_24h": uts_interval,
        "ohlc_hourly": lambda df: ohlc(
            df, "event_type", "ts_ms", "value", HOUR, "ingest_id"
        ),
        "session_windows_30m": lambda df: (
            df.withColumn("ts", F.timestamp_millis("ts_ms"))
            .groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count(F.lit(1)).alias("n"))
        ),
        "topk_global_100": lambda df: df.orderBy(
            F.desc("value"), F.asc("ingest_id")
        ).limit(100),
        "distinct_users": lambda df: df.agg(
            F.count_distinct("user_id").alias("u")
        ),
        # NOTE: unboundedPreceding, not a huge bounded lower bound — a
        # bounded frame (even one larger than any partition) drops Spark
        # to the sliding-frame path that re-aggregates per row: measured
        # 566 s vs 5 s on this exact query at 20M rows. Running totals
        # must say UNBOUNDED to get the O(1)-per-row accumulator.
        "window_running_sum_per_user": lambda df: df.select(
            "user_id", "ts_ms",
            F.sum(F.col("value").cast("decimal(38,6)")).over(
                Window.partitionBy("user_id")
                .orderBy("ts_ms", "ingest_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ).cast("double").alias("rs"),
        ),
        # r4: the distributed exact-rank operator at smoke scale — an
        # exact global decile assignment over every row with ZERO
        # single-partition windows (the plan a naive ntile would
        # serialize through one task at this size)
        "equidepth_deciles_distributed": _equidepth,
        # r4b: the binned-range-join machinery (window funnel step):
        # first t1-event → first t2-event within 24h, per user — each
        # left row explodes to ≤2 day-buckets, never a per-user cross
        # join; survivor count shrinks per step
        "window_funnel_step_24h": _funnel_step,
        # r4b A/B: the bounded variant (per-(user, bucket) sorted array,
        # join width ∝ instances x 2) — same first-match output
        "window_funnel_step_24h_arrays": _funnel_step_arrays,
    }

    timings = {}
    for name, fn in ops.items():
        t = time.time()
        fn(ev).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t, 2)
    print(json.dumps({"rows": rows, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
