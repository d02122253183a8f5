#!/usr/bin/env python3
"""Deletion-vector (merge-on-read) erasure economics at 1M rows
(round 10).

The question maybe_materialize_dvs' knobs answer: for K takedown
batches against the SAME 1M-row 8-dir hash-keyed table (stats+bloom),
what do the two erasure modes cost, and what does the deferred
anti-join cost readers as vectors accumulate?

- **CoW lane**: K x delete_rows — each batch pays its pruned dir
  rewrite immediately (bytes written per batch = the admitting dirs).
- **MOR lane**: K x delete_rows_mor — each batch pays a key-frame
  write + a pruned COUNT; then ONE materialize_dvs folds all K. Reads
  in between pay the scoped broadcast anti-join; measured at 0, K/2
  and K outstanding vectors (full-scan agg + 200-id point lookup).

Bytes written are measured as the du of the table's data/ tree after
each phase (immutable dirs: growth == writes).

Run: python3 tools/dv_smoke.py [n_rows] [n_dirs] [batch] [k_batches]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from uts_spark.session import get_spark  # noqa: E402
from uts_spark.sources.versioned import (  # noqa: E402
    append_snapshot,
    delete_rows,
    delete_rows_mor,
    list_versions,
    materialize_dvs,
    read_rows_for_ids,
    read_version,
    write_snapshot,
)


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(os.path.join(path, "data")):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def hashkey(col):
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("long")


def build(spark, path, n_rows, n_dirs):
    shutil.rmtree(path, ignore_errors=True)
    per = n_rows // n_dirs
    for d in range(n_dirs):
        sl = spark.range(d * per, (d + 1) * per).select(
            hashkey(F.col("id")).alias("id"),
            (F.col("id") % 100).alias("v"),
        )
        if d == 0:
            write_snapshot(sl, path, stats_col="id", bloom_col="id")
        else:
            append_snapshot(sl, path)


def victims(spark, per, batch, k):
    """K disjoint takedown batches, batch i confined to dir i % n_dirs."""
    out = []
    for i in range(k):
        v = spark.range(i * per + i * batch, i * per + (i + 1) * batch).select(
            hashkey(F.col("id")).alias("id")
        )
        v.cache().count()
        out.append(v)
    return out


def read_walls(spark, path, tag):
    t0 = time.time()
    read_version(spark, path).agg(F.sum("v")).collect()
    t_scan = time.time() - t0
    ids = spark.range(0, 200).select(hashkey(F.col("id")).alias("id"))
    t0 = time.time()
    read_rows_for_ids(spark, path, ids, "id").count()
    t_pt = time.time() - t0
    print(f"  read[{tag}]: full-scan agg {t_scan:5.2f}s  "
          f"point-lookup {t_pt:5.2f}s")
    return t_scan


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_dirs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    spark = get_spark("dv_smoke", master="local[8]", shuffle_partitions=16)
    per = n_rows // n_dirs
    vs = victims(spark, per, batch, k)

    # --- CoW lane ---
    path = "/tmp/dv_smoke_cow"
    build(spark, path, n_rows, n_dirs)
    base_bytes = du(path)
    t0 = time.time()
    for v in vs:
        delete_rows(spark, path, v, "id")
    t_cow = time.time() - t0
    cow_bytes = du(path) - base_bytes
    n = read_version(spark, path).count()
    assert n == n_rows - k * batch, (n, n_rows - k * batch)
    print(f"CoW : {k} takedowns {t_cow:6.1f}s  "
          f"bytes written {cow_bytes/1e6:7.2f} MB")
    read_walls(spark, path, "post-CoW")
    shutil.rmtree(path, ignore_errors=True)

    # --- MOR lane ---
    path = "/tmp/dv_smoke_mor"
    build(spark, path, n_rows, n_dirs)
    base_bytes = du(path)
    read_walls(spark, path, "0 vectors")
    t0 = time.time()
    for i, v in enumerate(vs):
        delete_rows_mor(spark, path, v, "id")
        if i + 1 == k // 2:
            read_walls(spark, path, f"{k//2} vectors")
    t_mor = time.time() - t0
    mor_bytes = du(path) - base_bytes
    n = read_version(spark, path).count()
    assert n == n_rows - k * batch, (n, n_rows - k * batch)
    print(f"MOR : {k} takedowns {t_mor:6.1f}s  "
          f"bytes written {mor_bytes/1e6:7.2f} MB "
          f"({len(list_versions(path)[-1]['dv'])} vectors outstanding)")
    read_walls(spark, path, f"{k} vectors")
    t0 = time.time()
    materialize_dvs(spark, path)
    t_mat = time.time() - t0
    mat_bytes = du(path) - base_bytes - mor_bytes
    n = read_version(spark, path).count()
    assert n == n_rows - k * batch, (n, n_rows - k * batch)
    print(f"MAT : one materialize {t_mat:6.1f}s  "
          f"bytes written {mat_bytes/1e6:7.2f} MB")
    read_walls(spark, path, "materialized")
    shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
