#!/usr/bin/env python3
"""Metadata-sorted index layout: measured row-group pruning, ALL FOUR
snapshot-index families (round 10 cont. for IVF; round 11 generalizes
— VERDICT r10 #3 / ROADMAP r11 #2).

Filtered probes push the metadata predicate into the pruned scan
(PushedFilters), but pushdown only SKIPS data when row-group min/max
stats can refuse it — and a build that sorts rows by the family key +
id scatters every label across every row group, so each group's label
range spans everything and the reader decodes all of them.
``*_vindex_build(meta_sort=True)`` clusters rows by the family key +
meta_cols + id instead; this smoke measures what that buys per family:

- build two snapshot indexes over the same corpus (meta_sort off / on)
  with a small parquet block size so files hold many row groups (the
  knob a 100 TB table doesn't need — its files hold hundreds of groups
  naturally; the sandbox has to force the granularity);
- read every data file's row-group statistics via pyarrow and count
  the groups whose [min, max] of the meta column ADMITS the probe's
  value — the groups a pushed predicate must decode;
- time the warm filtered probe against both layouts.

Sort keys measured: ivf/ivfpq (cell, label, id); lsh (table, bucket,
label, id); minhash (band, grp, lang, bucket, id).

Run: python3 tools/meta_sort_smoke.py [family|all] [n] [block_bytes]
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


def docs(spark, n: int):
    """Synthetic documents: 12 hash-derived words each, a 10-language
    label column — enough shingle overlap for banding to be real."""
    word = lambda j: F.concat(
        F.lit("w"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(500)).cast("string"),
    )
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[word(j) for j in range(12)]).alias("text"),
        F.concat(
            F.lit("l"), F.pmod(F.col("id"), F.lit(LABELS)).cast("string")
        ).alias("lang"),
    )


def rowgroup_stats(path: str, col: str, value) -> dict:
    import pyarrow.parquet as pq

    total = admit = 0
    for f in glob.glob(os.path.join(path, "data", "d-*", "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }[col]
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            total += 1
            if st is None or (st.min <= value <= st.max):
                admit += 1
    return {"row_groups": total, "admitting": admit}


# Per-family row-group granularity: the sandbox corpus is tiny, so the
# block size must scale DOWN with the family's run size (rows per sort
# prefix) for row-group stats to be meaningful. A production table's
# runs are millions of rows against ~1M-row groups — the ratios below
# reproduce that run/group relationship, not its absolute size:
#   ivf/ivfpq: 8 cells -> huge runs, 1MB blocks suffice;
#   lsh: planes=4 -> 32 (table,bucket) runs (256-bucket production
#        indexes have the same run/group ratio at 1B vectors);
#   minhash: bands=4 x n_grps=4 -> 16 (band,grp) runs, rows are ~50B
#        so blocks drop to 64KB.
_FAMILY_BLOCK = {
    "ivf": 1 << 20, "ivfpq": 1 << 20, "lsh": 1 << 18, "minhash": 1 << 16,
}


def run_family(spark, vx, work: str, family: str, n: int) -> dict:
    out = {}
    corpus = vecs(spark, n)
    anchors = corpus.filter(F.col("vec_id") < 5)
    for tag, ms in (("scattered", False), ("meta_sorted", True)):
        p = os.path.join(work, f"{family}_{tag}")
        t0 = time.time()
        if family == "ivf":
            vx.ivf_vindex_build(
                corpus, p, fingerprint="f0", n_cells=8,
                meta_cols=("label",), meta_sort=ms,
            )
            probe = lambda: vx.ivf_vindex_probe(
                spark, p, anchors, k=10, n_probe=3,
                where=F.col("label") == 7,
            ).count()
            meta_col, val = "label", 7
        elif family == "ivfpq":
            vx.ivfpq_vindex_build(
                corpus, p, dim=DIM, fingerprint="f0", n_cells=8,
                m_sub=8, n_cent=16, meta_cols=("label",), meta_sort=ms,
            )
            probe = lambda: vx.ivfpq_vindex_probe(
                spark, p, anchors, k=10, n_probe=3,
                where=F.col("label") == 7,
            ).count()
            meta_col, val = "label", 7
        elif family == "lsh":
            vx.lsh_vindex_build(
                corpus, p, dim=DIM, fingerprint="f0", planes=4,
                tables=2, meta_cols=("label",), meta_sort=ms,
            )
            probe = lambda: vx.lsh_vindex_probe(
                spark, p, anchors, k=10, where=F.col("label") == 7,
            ).count()
            meta_col, val = "label", 7
        else:  # minhash
            corpus_d = docs(spark, n)
            new = corpus_d.filter(F.col("doc_id") % 50 == 0)
            vx.minhash_vindex_build(
                corpus_d, "text", "doc_id", p, fingerprint="f0",
                bands=4, n_grps=4, meta_cols=("lang",), meta_sort=ms,
            )
            probe = lambda: vx.minhash_vindex_probe(
                spark, p, new, corpus_d, "text", "doc_id",
                bands=4, n_grps=4,
                threshold=0.2, where=F.col("lang") == "l7",
            ).count()
            meta_col, val = "lang", "l7"
        build = round(time.time() - t0, 2)
        stats = rowgroup_stats(p, meta_col, val)
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
        print(json.dumps({family: {tag: out[tag]}}), flush=True)
    return out


def vecs2(spark, n: int):
    """Two INDEPENDENT metadata columns (different hash seeds):
    ``coarse`` 4 values, ``fine`` 64 values — the multi-column
    sort-order experiment (ROADMAP r12 #3)."""
    return spark.range(0, n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id"), j), 2001) - 1000
            ).cast("float") / F.lit(1000.0),
        ).alias("embedding"),
        F.pmod(F.xxhash64(F.col("id"), F.lit("c")), F.lit(4))
        .cast("int").alias("coarse"),
        F.pmod(F.xxhash64(F.col("id"), F.lit("f")), F.lit(64))
        .cast("int").alias("fine"),
    )


def run_multicol(spark, vx, work: str, n: int) -> dict:
    """Does cardinality-ASCENDING sort-key ordering buy admit
    fraction with 2+ meta columns? Build the same IVF index with the
    sort key's meta columns in (fine, coarse) declaration order vs
    (coarse, fine) — measure row-group admits for a predicate on each
    column alone. The high-card-first layout leaves the low-card
    column scattered inside short fine-runs (its groups admit ~all);
    low-card-first keeps BOTH prunable: coarse in long runs, fine
    sorted within each (cell, coarse) block."""
    corpus = vecs2(spark, n)
    out = {}
    for tag, cols in (
        ("fine_first", ("fine", "coarse")),
        ("coarse_first", ("coarse", "fine")),
    ):
        p = os.path.join(work, f"mc_{tag}")
        vx.ivf_vindex_build(
            corpus, p, fingerprint="f0", n_cells=8,
            meta_cols=cols, meta_sort=True,
        )
        r = {}
        for col, val in (("coarse", 2), ("fine", 37)):
            st = rowgroup_stats(p, col, val)
            r[col] = {
                **st,
                "admit_frac": round(
                    st["admitting"] / max(1, st["row_groups"]), 3
                ),
            }
        # conjunctive probe (coarse=2 AND fine=37): a group must admit
        # BOTH — the workload shape where first-column choice decides
        import pyarrow.parquet as pq

        total = admit = 0
        for f in glob.glob(os.path.join(p, "data", "d-*", "*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = {
                md.schema.column(i).name: i
                for i in range(md.num_columns)
            }
            for g in range(md.num_row_groups):
                total += 1
                ok = True
                for col, val in (("coarse", 2), ("fine", 37)):
                    st = md.row_group(g).column(idx[col]).statistics
                    if st is not None and not (st.min <= val <= st.max):
                        ok = False
                        break
                admit += ok
        r["both"] = {
            "row_groups": total, "admitting": admit,
            "admit_frac": round(admit / max(1, total), 3),
        }
        out[tag] = r
        print(json.dumps({tag: r}), flush=True)
    return out


def main() -> None:
    fam = sys.argv[1] if len(sys.argv) > 1 else "all"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    block = int(sys.argv[3]) if len(sys.argv) > 3 else 1 << 20
    fams = ["ivf", "ivfpq", "lsh", "minhash"] if fam == "all" else [fam]
    spark = get_spark(
        "meta-sort-smoke", master="local[8]", shuffle_partitions=16
    )
    # force many row groups per file — the granularity stand-in for
    # the 128MB-block files a production table writes
    hc = spark.sparkContext._jsc.hadoopConfiguration()

    import uts_spark.functions.vindex as vx

    work = tempfile.mkdtemp(prefix="meta_sort_")
    out = {"n": n, "block_bytes": block}
    try:
        if fam == "multicol":
            import uts_spark.functions.vindex as vx2

            hc.setInt("parquet.block.size", block)
            out["multicol"] = run_multicol(spark, vx2, work, n)
            print(json.dumps(out), flush=True)
            return
        for family in fams:
            hc.setInt(
                "parquet.block.size",
                block if len(sys.argv) > 3 else _FAMILY_BLOCK[family],
            )
            # minhash band rows explode n docs x bands — size it down
            nf = n // 4 if family == "minhash" else n
            out[family] = run_family(spark, vx, work, family, nf)
        print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
