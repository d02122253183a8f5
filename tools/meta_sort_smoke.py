#!/usr/bin/env python3
"""Metadata-sorted index layout: measured row-group pruning (round 10
cont., refreshed r11 #5).

Filtered probes push the metadata predicate into the cell-pruned scan
(PushedFilters), but pushdown only SKIPS data when row-group min/max
stats can refuse it — and a build that sorts rows by (cell, id)
scatters every label across every row group, so each group's label
range spans everything and the reader decodes all of them.
``ivf_vindex_build(meta_sort=True)`` clusters rows by
(cell, label, id) instead; this smoke measures what that buys:

- build two snapshot IVF indexes over the same corpus (meta_sort off /
  on) with a small parquet block size so files hold many row groups
  (the knob a 100 TB table doesn't need — its files hold hundreds of
  groups naturally; the sandbox has to force the granularity);
- read every data file's row-group statistics via pyarrow and count
  the groups whose [min, max] of ``label`` ADMITS the probe's label —
  the groups a pushed ``label = L`` predicate must decode;
- time the warm filtered probe against both layouts.

Run: python3 tools/meta_sort_smoke.py [n_vec] [block_bytes]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from uts_spark.session import get_spark  # noqa: E402

DIM = 64
LABELS = 10


def vecs(spark, n: int):
    return spark.range(0, n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id"), j), 2001) - 1000
            ).cast("float") / F.lit(1000.0),
        ).alias("embedding"),
        F.pmod(F.col("id"), F.lit(LABELS)).cast("int").alias("label"),
    )


def rowgroup_stats(path: str, label: int) -> dict:
    import pyarrow.parquet as pq

    total = admit = 0
    for f in glob.glob(os.path.join(path, "data", "d-*", "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }["label"]
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            total += 1
            if st is None or (st.min <= label <= st.max):
                admit += 1
    return {"row_groups": total, "admitting": admit}


def main() -> None:
    n_vec = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    spark = get_spark(
        "meta-sort-smoke", master="local[8]", shuffle_partitions=16
    )
    # force many row groups per file — the granularity stand-in for
    # the 128MB-block files a production table writes
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    hc.setInt("parquet.block.size", block)

    import uts_spark.functions.vindex as vx

    work = tempfile.mkdtemp(prefix="meta_sort_")
    corpus = vecs(spark, n_vec)
    anchors = corpus.filter(F.col("vec_id") < 5)
    out = {"n_vec": n_vec, "block_bytes": block}
    try:
        for tag, ms in (("scattered", False), ("meta_sorted", True)):
            p = os.path.join(work, tag)
            t0 = time.time()
            vx.ivf_vindex_build(
                corpus, p, fingerprint="f0", n_cells=8,
                meta_cols=("label",), meta_sort=ms,
            )
            build = round(time.time() - t0, 2)
            stats = rowgroup_stats(p, label=7)

            def probe():
                return vx.ivf_vindex_probe(
                    spark, p, anchors, k=10, n_probe=3,
                    where=F.col("label") == 7,
                ).count()

            probe()  # warm
            t0 = time.time()
            probe()
            wall = round(time.time() - t0, 2)
            out[tag] = {
                "build_s": build, "probe_warm_s": wall, **stats,
                "admit_frac": round(
                    stats["admitting"] / max(1, stats["row_groups"]), 3
                ),
            }
            print(json.dumps({tag: out[tag]}), flush=True)
        print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
