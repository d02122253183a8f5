"""Python UDTFs — the 1→N slow-path escape hatch.

The engine's stance (SURVEY §2.6): every 1→N fan-out that CAN be a
Column expression IS one (chunking, shingling, frame sampling are
explode/sequence/slice — JVM-side, codegen'd). A Python UDTF is the
fallback for semantics a Column genuinely can't express (imperative
per-row logic emitting a variable number of rows with cross-row python
state). This module keeps one UDTF mirroring the native chunker so the
fallback path stays exercised and provably row-identical to the fast
path (tests/test_llm_ops.py) — if you need a custom UDTF, copy this
shape.

Scale: a UDTF runs row-at-a-time in a Python worker — fine for control
flow, 10-100x slower than the expression path for bulk data. Prefer
mapInPandas (Arrow-batched) when the logic is vectorizable.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

from uts_spark.functions.text import CHUNK_OVERLAP, CHUNK_SIZE, TOKEN_RE


@udtf(returnType="chunk_id: bigint, chunk_text: string, n_tokens: bigint")
class ChunkWindowsUDTF:
    """Row-identical python mirror of text.chunk_windows (size=32,
    overlap=8): chunk i covers tokens [i*stride, i*stride+size); last
    chunk may be short; every doc yields >= 1 chunk."""

    def eval(self, text: str):
        size, overlap = CHUNK_SIZE, CHUNK_OVERLAP
        stride = size - overlap
        toks = re.findall(TOKEN_RE, (text or "").lower())
        nt = len(toks)
        nchunks = max(1, -(-(nt - overlap) // stride))
        for i in range(nchunks):
            window = toks[i * stride: i * stride + size]
            yield i, " ".join(window), len(window)


def register_udtfs(spark) -> None:
    """Register the UDTF surface for SQL lateral use:
    ``SELECT d.doc_id, c.* FROM docs d, LATERAL chunk_windows(d.text) c``."""
    spark.udtf.register("chunk_windows_udtf", ChunkWindowsUDTF)
