#!/usr/bin/env python3
"""Incremental-view-maintenance economics (round 11): what a
maintained aggregate view buys over recomputing from scratch, and
what the hybrid min/max recompute costs when a delete regresses an
extremum.

Setup: an N-row source (default 2M) with G groups; the view maintains
count/sum/sumsq/min. Ticks measured warm (one throwaway seed pass
first):

- full   — from-scratch groupBy aggregate + snapshot write (what a
           nightly job without IVM pays every time);
- append — one delta append (N/100 rows) + maintain_agg_view tick
           (feed = dir-diff scan of the delta, group-sized merge);
- mor    — a merge-on-read takedown that does NOT touch any group
           minimum + tick (feed = pruned delete images; no recompute);
- regress— a takedown that HITS group minima + tick (the one scoped
           source scan hybrid min/max maintenance ever pays).

Run: python3 tools/ivm_smoke.py [n] [groups]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from uts_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = get_spark("ivm-smoke", master="local[8]", shuffle_partitions=16)
    import uts_spark.sources.versioned as V

    work = tempfile.mkdtemp(prefix="ivm_smoke_")
    ps, pv = os.path.join(work, "src"), os.path.join(work, "view")
    out = {"n": n, "groups": g}

    def src_rows(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id"),
            F.pmod(F.xxhash64("id"), F.lit(g)).alias("grp"),
            # minimum per group is attained by few rows: val in
            # [0, 10^6), uniform — the regress tick targets exact minima
            F.pmod(F.xxhash64("id", F.lit("v")), F.lit(1_000_000))
            .alias("val"),
        )

    kw = dict(
        group_cols=("grp",), sum_cols=("val",), sumsq_cols=("val",),
        key="id",
    )
    if os.environ.get("IVM_MINMAX", "1") != "0":
        kw["min_cols"] = ("val",)
    try:
        t0 = time.time()
        V.write_snapshot(src_rows(0, n), ps)
        out["write_src_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        V.maintain_agg_view(spark, ps, pv, **kw)
        out["seed_s"] = round(time.time() - t0, 2)

        # full recompute, measured twice warm
        for i in range(2):
            pfull = os.path.join(work, f"full{i}")
            t0 = time.time()
            V.write_snapshot(
                V.read_version(spark, ps).groupBy("grp").agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum("val").alias("sum_val"),
                    F.sum(F.col("val") * F.col("val")).alias("sumsq_val"),
                    F.min("val").alias("min_val"),
                ),
                pfull,
            )
            out[f"full_recompute_s{i}"] = round(time.time() - t0, 2)

        # append tick: N/100 new rows
        t0 = time.time()
        V.append_snapshot(src_rows(n, n + n // 100), ps)
        out["append_delta_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        V.maintain_agg_view(spark, ps, pv, **kw)
        out["tick_append_s"] = round(time.time() - t0, 2)

        # non-regressing MOR takedown: victims chosen ABOVE every
        # group minimum (val >= 500k hits no min at these n/g odds)
        vic = (
            V.read_version(spark, ps)
            .filter((F.col("val") >= 500_000) & (F.col("id") % 997 == 0))
            .select("id")
        )
        t0 = time.time()
        V.delete_rows_mor(spark, ps, vic, "id")
        out["mor_delete_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        V.maintain_agg_view(spark, ps, pv, **kw)
        out["tick_mor_noregress_s"] = round(time.time() - t0, 2)

        # regressing takedown: erase the EXACT minimum row of ~1% of
        # groups -> scoped recompute of those groups
        cur = V.read_version(spark, ps)
        from pyspark.sql import Window

        w = Window.partitionBy("grp").orderBy("val", "id")
        min_rows = (
            cur.withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("grp") % 100 == 0))
            .select("id")
        )
        t0 = time.time()
        V.delete_rows_mor(spark, ps, min_rows, "id")
        out["mor_delete_min_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        V.maintain_agg_view(spark, ps, pv, **kw)
        out["tick_regress_s"] = round(time.time() - t0, 2)

        # sanity: view equals from-scratch
        acols = [F.sum("n_rows"), F.sum("sum_val")]
        bcols = [F.count(F.lit(1)), F.sum("val")]
        if "min_cols" in kw:
            acols.append(F.min("min_val"))
            bcols.append(F.min("val"))
        a = V.read_version(spark, pv).agg(*acols).first()
        b = V.read_version(spark, ps).agg(*bcols).first()
        assert tuple(a) == tuple(b), (a, b)
        out["exact"] = True
        print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
