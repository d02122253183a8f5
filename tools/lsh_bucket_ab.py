#!/usr/bin/env python3
"""Zero-shuffle LSH bucketing A/B (VERDICT r10 #6): the broadcast-
planes mapInPandas kernel vs the crossJoin+groupBy shape.

The agg shape shuffles corpus×tables rows through the (id, table)
groupBy — the one structural cost the r10 verdict flagged. The numpy
kernel computes every table's sign bits per Arrow batch in one GEMM
and emits its rows IN PLACE: no crossJoin, no groupBy, no exchange.

This tool measures both at a given corpus size AND verifies the
(id, table, bucket) sets are EXACTLY equal — the fold-the-winner
precondition (a GEMM reorders float additions; a sign flip needs a
projection within ulps of zero, and the check proves none occurred
on this corpus; the oracle-gated LSH lanes re-verify at the driver
SFs).

Run: python3 tools/lsh_bucket_ab.py [n_vec] [dim] [planes] [tables]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from uts_spark.session import get_spark  # noqa: E402


def vecs(spark, n: int, dim: int):
    return spark.range(0, n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id"), j), 2001) - 1000
            ).cast("double") / F.lit(1000.0),
        ).alias("embedding"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    planes = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    tables = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    spark = get_spark("lsh-bucket-ab")
    spark.sparkContext.setLogLevel("ERROR")

    from uts_spark.functions.similarity import lsh_bucket_table

    corpus = vecs(spark, n, dim).localCheckpoint(eager=True)
    out = {"n": n, "dim": dim, "planes": planes, "tables": tables}
    for impl in ("agg", "np"):
        df = lambda: lsh_bucket_table(
            corpus, dim, planes, tables, impl=impl
        ).select("vec_id", "table", "bucket")
        df().write.format("noop").mode("overwrite").save()  # warm
        walls = []
        for _ in range(3):
            t0 = time.time()
            df().write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 2))
        out[impl] = {"walls": walls, "min": min(walls)}
        print(json.dumps({impl: out[impl]}), flush=True)

    # exact equality: every (id, table) pair carries the same bucket
    a = lsh_bucket_table(corpus, dim, planes, tables, impl="agg")
    b = lsh_bucket_table(corpus, dim, planes, tables, impl="np")
    mism = (
        a.select("vec_id", "table", F.col("bucket").alias("ba"))
        .join(
            b.select("vec_id", "table", F.col("bucket").alias("bb")),
            ["vec_id", "table"],
            "full_outer",
        )
        .filter(
            F.col("ba").isNull()
            | F.col("bb").isNull()
            | (F.col("ba") != F.col("bb"))
        )
        .count()
    )
    out["bucket_mismatches"] = mism
    out["speedup_np"] = round(out["agg"]["min"] / out["np"]["min"], 2)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
