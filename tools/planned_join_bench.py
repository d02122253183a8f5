#!/usr/bin/env python3
"""Planned-join A/B at sf0.1 scale (VERDICT r10 #5 / ROADMAP r11 #5):
does the manifest-informed broadcast beat Spark's own size inference
where file bytes MIS-SIZE the build side?

The scenario this engine PRODUCES naturally: a MERGE-ON-READ table.
After delete_rows_mor masks 90% of a wide dim, the parquet bytes on
disk (what Spark's autoBroadcastJoinThreshold reads — 64MB in this
session) still describe ALL rows, while the manifest's n_rows counts
only the SERVED rows. Spark sizes the scan from bytes → SortMergeJoin
of the full fact; join_versioned reads the manifest → broadcasts the
masked build side (the anti-join applies before the broadcast, so
what ships is exactly the visible rows).

A/B (min of 3 warm passes, noop sink):
  unhinted: read_version(fact) JOIN read_version(dim) + agg
  planned:  join_versioned(fact, dim) + agg (broadcast from manifest)

Run: python3 tools/planned_join_bench.py [n_fact] [n_dim]
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
    n_fact = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
    # third arg: autoBroadcastJoinThreshold to bench under — default
    # the STOCK 10MB (the session's own 64MB is a tuned sandbox
    # choice; a fleet cluster runs the stock value)
    thr = sys.argv[3] if len(sys.argv) > 3 else str(10 * 1024 * 1024)
    spark = get_spark(
        "planned-join-bench",
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": thr},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import uts_spark.sources.versioned as V

    work = tempfile.mkdtemp(prefix="pj_bench_")
    out: dict = {"n_fact": n_fact, "n_dim": n_dim}
    try:
        pf = os.path.join(work, "fact")
        pd_ = os.path.join(work, "dim")
        V.write_snapshot(
            spark.range(0, n_fact).select(
                (F.col("id") % n_dim).alias("k"),
                (F.col("id") % 97).alias("v"),
            ),
            pf, kmv_col="k",
        )
        # dim: wide incompressible rows; then a MOR takedown masks 90%
        # — bytes on disk stay dim-sized, served rows are 10%
        V.write_snapshot(
            spark.range(0, n_dim).select(
                F.col("id").alias("k"),
                F.concat_ws(
                    "",
                    *[
                        F.sha2(
                            F.concat(
                                F.col("id").cast("string"),
                                F.lit(f":{j}"),
                            ),
                            256,
                        )
                        for j in range(4)
                    ],
                ).alias("blob"),
            ),
            pd_, kmv_col="k",
        )
        victims = spark.range(0, n_dim).filter(
            F.col("id") % 10 != 7
        ).select(F.col("id").alias("k"))
        V.delete_rows_mor(spark, pd_, victims, "k")
        dim_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(os.path.join(pd_, "data"))
            for f in fs
            if f.endswith(".parquet")
        )
        out["dim_rows_served"] = V.list_versions(pd_)[-1]["n_rows"]
        out["dim_parquet_mb"] = round(dim_bytes / 1e6, 1)
        plan = V.plan_join(pf, pd_, key_a="k", key_b="k")
        out["plan"] = {
            k: plan[k] for k in ("strategy", "build_side", "rows_a",
                                 "rows_b")
        }

        def agg(j):
            return j.groupBy((F.col("k") % 10).alias("b")).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.length("blob")).alias("s"),
            )

        def unhinted():
            a = V.read_version(spark, pf)
            b = V.read_version(spark, pd_)
            return agg(a.join(b, "k"))

        def planned():
            return agg(V.join_versioned(spark, pf, pd_, "k"))

        for tag, fn in (("unhinted", unhinted), ("planned", planned)):
            shape = fn()._jdf.queryExecution().executedPlan().toString()
            # the MOR mask contributes its own broadcast anti-join —
            # count operators instead of matching one substring
            join_op = {
                "bhj": shape.count("BroadcastHashJoin"),
                "smj": shape.count("SortMergeJoin"),
            }
            fn().write.format("noop").mode("overwrite").save()  # warm
            walls = []
            for _ in range(3):
                t0 = time.time()
                fn().write.format("noop").mode("overwrite").save()
                walls.append(round(time.time() - t0, 2))
            out[tag] = {"join": join_op, "walls": walls,
                        "min": min(walls)}
            print(json.dumps({tag: out[tag]}), flush=True)
        out["speedup"] = round(
            out["unhinted"]["min"] / out["planned"]["min"], 2
        )
        print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
