#!/usr/bin/env python3
"""Marker-vs-snapshot protocol A/B over the FULL service-lane suite —
the retirement measurement (ROADMAP round-10 #2): every maintained
index family (MinHash bands, LSH, IVF, IVF-PQ) runs the same matched
op sequence on BOTH commit protocols:

    build -> append x3 -> warm probe -> scattered delete -> compact
          -> warm probe (post-compact)

- marker  = the pending-marker / rename-swap family
  (dedup.minhash_index_*, similarity.{lsh,ivf,ivfpq}_index_*),
  POSIX-local-FS primitives (O_EXCL, os.replace).
- snapshot = the CAS-manifest family (functions/vindex.py),
  Iceberg-style fast-appends + copy-on-write rewrites — the
  object-storage-safe protocol.

If snapshot wins or ties every lane, the default index protocol flips
(functions/index_protocol.py) and the marker verbs stay as the
compatibility surface. The measured table lands in SCALE.md.

Data is JVM-side synthetic (no files, no Python in the data path):
dim-64 vectors from xxhash64, 30-word md5 docs. Probe walls are warm
(2nd of 2); every other op is a one-shot service tick measured once —
ratios, not absolutes, are the signal (host drift is recorded
separately in SCALE.md round 9b).

Run: python3 tools/protocol_ab.py [vec_rows] [doc_rows]
Prints one JSON line {"rows": ..., "suites": {family: {op: {marker,
snapshot}}}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

DIM = 64
BATCH = 10_000
N_APPENDS = 3
N_DELETE = 1_000
N_ANCHORS = 5


def vecs(spark, lo: int, n: int):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id"), j), 2001) - 1000
            ).cast("float") / F.lit(1000.0),
        ).alias("embedding"),
    )


def docs(spark, lo: int, n: int):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(29)),
                lambda j: F.substring(
                    F.md5(F.concat(F.col("id").cast("string"), F.lit("-"), j.cast("string"))),
                    1,
                    6,
                ),
            ),
        ).alias("text"),
    )


def scattered_ids(spark, n_rows: int, col: str):
    # one id every ~(n_rows/N_DELETE) — hits every append dir's id range,
    # the pruning-hostile case (both protocols pay their worst shape)
    step = max(1, n_rows // N_DELETE)
    return spark.range(0, n_rows, step).select(F.col("id").alias(col))


def timed(walls: dict, tag: str, fn):
    t0 = time.time()
    out = fn()
    walls[tag] = round(time.time() - t0, 2)
    print(f"    {tag}: {walls[tag]}s", flush=True)
    return out


def run_vector_family(spark, work: str, family: str, n_rows: int) -> dict:
    """One matched suite for an embedding family on both protocols."""
    from uts_spark.functions import similarity as sim
    from uts_spark.functions import vindex as vx
    from uts_spark.sources.sinks import compact_partitioned

    anchors = vecs(spark, 0, N_ANCHORS)
    dele = scattered_ids(spark, n_rows, "vec_id")
    dele_vecs = vecs(spark, 0, n_rows).join(dele, "vec_id")

    marker = {
        "ivf": dict(
            build=lambda p: sim.ivf_index_write(vecs(spark, 0, n_rows), p),
            append=lambda p, lo: sim.ivf_index_append(spark, vecs(spark, lo, BATCH), p),
            probe=lambda p: sim.ivf_index_probe(spark, p, anchors, k=10, n_probe=3),
            delete=lambda p: sim.ivf_index_delete(spark, dele_vecs, p),
            compact=lambda p: compact_partitioned(spark, p, ["cell"]),
        ),
        "ivfpq": dict(
            build=lambda p: sim.ivfpq_index_write(vecs(spark, 0, n_rows), p, DIM),
            append=lambda p, lo: sim.ivfpq_index_append(spark, vecs(spark, lo, BATCH), p, DIM),
            probe=lambda p: sim.ivfpq_index_probe(spark, p, anchors, dim=DIM, k=10, n_probe=3),
            delete=lambda p: sim.ivfpq_index_delete(spark, dele_vecs, p),
            compact=lambda p: compact_partitioned(spark, p, ["cell"]),
        ),
        "lsh": dict(
            build=lambda p: sim.lsh_index_write(vecs(spark, 0, n_rows), p, DIM),
            append=lambda p, lo: sim.lsh_index_append(vecs(spark, lo, BATCH), p, DIM),
            probe=lambda p: sim.lsh_index_probe(spark, p, anchors, DIM, k=10),
            delete=lambda p: sim.lsh_index_delete(spark, dele_vecs, p, DIM),
            compact=lambda p: compact_partitioned(spark, p, ["table", "bucket"]),
        ),
    }[family]
    snapshot = {
        "ivf": dict(
            build=lambda p: vx.ivf_vindex_build(vecs(spark, 0, n_rows), p, fingerprint="f0"),
            append=lambda p, lo: vx.ivf_vindex_append(vecs(spark, lo, BATCH), p),
            probe=lambda p: vx.ivf_vindex_probe(spark, p, anchors, k=10, n_probe=3),
            delete=lambda p: vx.ivf_vindex_delete(spark, dele, p),
            compact=lambda p: vx.ivf_vindex_compact(spark, p),
        ),
        "ivfpq": dict(
            build=lambda p: vx.ivfpq_vindex_build(vecs(spark, 0, n_rows), p, DIM, fingerprint="f0"),
            append=lambda p, lo: vx.ivfpq_vindex_append(vecs(spark, lo, BATCH), p),
            probe=lambda p: vx.ivfpq_vindex_probe(spark, p, anchors, k=10, n_probe=3),
            delete=lambda p: vx.ivfpq_vindex_delete(spark, dele, p),
            compact=lambda p: vx.ivfpq_vindex_compact(spark, p),
        ),
        "lsh": dict(
            build=lambda p: vx.lsh_vindex_build(vecs(spark, 0, n_rows), p, DIM, fingerprint="f0"),
            append=lambda p, lo: vx.lsh_vindex_append(vecs(spark, lo, BATCH), p, DIM),
            probe=lambda p: vx.lsh_vindex_probe(spark, p, anchors, k=10),
            delete=lambda p: vx.lsh_vindex_delete(spark, dele, p),
            compact=lambda p: vx.lsh_vindex_compact(spark, p),
        ),
    }[family]

    out: dict = {}
    for proto, verbs in (("marker", marker), ("snapshot", snapshot)):
        path = os.path.join(work, f"{family}_{proto}")
        walls: dict = {}
        print(f"  [{family}/{proto}]", flush=True)
        timed(walls, "build", lambda: verbs["build"](path))
        t0 = time.time()
        for i in range(N_APPENDS):
            verbs["append"](path, n_rows + i * BATCH)
        walls["append_x3"] = round(time.time() - t0, 2)
        print(f"    append_x3: {walls['append_x3']}s", flush=True)
        verbs["probe"](path).count()
        timed(walls, "probe_warm", lambda: verbs["probe"](path).count())
        timed(walls, "delete", lambda: verbs["delete"](path))
        timed(walls, "compact", lambda: verbs["compact"](path))
        verbs["probe"](path).count()
        timed(walls, "probe_post_compact", lambda: verbs["probe"](path).count())
        for op in walls:
            out.setdefault(op, {})[proto] = walls[op]
    return out


def run_minhash(spark, work: str, n_docs: int) -> dict:
    from uts_spark.functions import dedup as dd
    from uts_spark.functions import vindex as vx
    from uts_spark.sources.sinks import compact_partitioned

    corpus = docs(spark, 0, n_docs)
    probe_new = docs(spark, 10_000_000, 100)
    dele = scattered_ids(spark, n_docs, "doc_id")
    dele_docs = corpus.join(dele, "doc_id")

    marker = dict(
        build=lambda p: dd.minhash_index_write(corpus, "text", "doc_id", p),
        append=lambda p, lo: dd.minhash_index_append(docs(spark, lo, BATCH), "text", "doc_id", p),
        probe=lambda p: dd.minhash_index_probe(spark, p, probe_new, corpus, "text", "doc_id"),
        delete=lambda p: dd.minhash_index_delete(spark, dele_docs, "text", "doc_id", p),
        compact=lambda p: compact_partitioned(spark, p, ["band", "grp"]),
    )
    snapshot = dict(
        build=lambda p: vx.minhash_vindex_build(corpus, "text", "doc_id", p, fingerprint="f0"),
        append=lambda p, lo: vx.minhash_vindex_append(docs(spark, lo, BATCH), "text", "doc_id", p),
        probe=lambda p: vx.minhash_vindex_probe(spark, p, probe_new, corpus, "text", "doc_id"),
        delete=lambda p: vx.minhash_vindex_delete(spark, dele, p),
        compact=lambda p: vx.minhash_vindex_compact(spark, p),
    )
    out: dict = {}
    for proto, verbs in (("marker", marker), ("snapshot", snapshot)):
        path = os.path.join(work, f"minhash_{proto}")
        walls: dict = {}
        print(f"  [minhash/{proto}]", flush=True)
        timed(walls, "build", lambda: verbs["build"](path))
        t0 = time.time()
        for i in range(N_APPENDS):
            verbs["append"](path, n_docs + i * BATCH)
        walls["append_x3"] = round(time.time() - t0, 2)
        print(f"    append_x3: {walls['append_x3']}s", flush=True)
        verbs["probe"](path).count()
        timed(walls, "probe_warm", lambda: verbs["probe"](path).count())
        timed(walls, "delete", lambda: verbs["delete"](path))
        timed(walls, "compact", lambda: verbs["compact"](path))
        verbs["probe"](path).count()
        timed(walls, "probe_post_compact", lambda: verbs["probe"](path).count())
        for op in walls:
            out.setdefault(op, {})[proto] = walls[op]
    return out


def main() -> None:
    vec_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    doc_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    from uts_spark.session import get_spark

    spark = get_spark("protocol-ab")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="uts_protocol_ab_")
    suites: dict = {}
    try:
        for family in ("ivf", "ivfpq", "lsh"):
            print(f"[{family}] vec_rows={vec_rows}", flush=True)
            suites[family] = run_vector_family(spark, work, family, vec_rows)
        print(f"[minhash] doc_rows={doc_rows}", flush=True)
        suites["minhash"] = run_minhash(spark, work, doc_rows)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({"vec_rows": vec_rows, "doc_rows": doc_rows, "suites": suites}))


if __name__ == "__main__":
    main()
