#!/usr/bin/env python3
"""Bloom-pruned erasure economics at 1M rows (round 10).

The scenario dir min/max stats CANNOT help with: a table keyed by a
hash-like id (uniform over the keyspace) ingested as D append dirs —
every dir's [min, max] spans ~the whole space, so stats admit all D
dirs and "pruned" erasure degrades to a full rewrite. Per-dir Bloom
sidecars prune by CONTENT instead: a takedown batch whose ids live in
one ingest batch rewrites ~1 dir.

Measures, for the SAME 1M-row 8-dir table and the SAME 200-id takedown
(confined to one dir):

- stats-only table: dirs rewritten + delete wall;
- stats+bloom table: dirs rewritten + delete wall + the build-side tax
  (bloom sidecar build time across the 8 appends).

Run: python3 tools/bloom_smoke.py [n_rows] [n_dirs] [batch]
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from uts_spark.session import get_spark  # noqa: E402
from uts_spark.sources.versioned import (  # noqa: E402
    append_snapshot,
    delete_rows,
    list_versions,
    read_version,
    write_snapshot,
)


def build(spark, path, n_rows, n_dirs, bloom):
    shutil.rmtree(path, ignore_errors=True)
    per = n_rows // n_dirs
    t0 = time.time()
    for d in range(n_dirs):
        sl = spark.range(d * per, (d + 1) * per).select(
            F.conv(
                F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10
            ).cast("long").alias("id"),
            (F.col("id") % 100).alias("v"),
        )
        if d == 0:
            write_snapshot(
                sl, path, stats_col="id",
                bloom_col="id" if bloom else None,
            )
        else:
            append_snapshot(sl, path)
    return time.time() - t0


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_dirs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    spark = get_spark("bloom_smoke", master="local[8]", shuffle_partitions=16)
    per = n_rows // n_dirs

    # the takedown: `batch` ids from ONE ingest dir (dir 3's id slice)
    victim = spark.range(3 * per, 3 * per + batch).select(
        F.conv(
            F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10
        ).cast("long").alias("id")
    )
    victim.cache().count()

    for bloom in (False, True):
        path = f"/tmp/bloom_smoke_{'b' if bloom else 's'}"
        t_build = build(spark, path, n_rows, n_dirs, bloom)
        t0 = time.time()
        delete_rows(spark, path, victim, "id")
        t_del = time.time() - t0
        pm = list_versions(path)[-1]
        pruned = pm.get("pruned_dirs", 0)
        n = read_version(spark, path).count()
        assert n == n_rows - batch, (n, n_rows - batch)
        print(
            f"{'stats+bloom' if bloom else 'stats-only '}: "
            f"build {t_build:6.1f}s  delete {t_del:6.2f}s  "
            f"dirs rewritten {n_dirs - pruned}/{n_dirs}  "
            f"rows_after {n}"
        )
        shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
