"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing is real and tested: schemas, batch iteration,
partition-preserving transforms. The actual codec step is STUBBED —
image/audio libraries are not in this container — behind
``decode_image``, which raises ``NotImplementedError`` unless a decoder is
importable; ``fake_decode_features`` is the deterministic stand-in used by
tests and queries (features derived from the bytes themselves, so results
are reproducible anywhere).

At 100 TB: binaries live in parquet/object storage; ``mapInPandas``
processes them partition-streamed in Arrow batches (no driver transfer,
bounded memory per batch via spark.sql.execution.arrow.maxRecordsPerBatch);
metadata-only queries never touch the blob column thanks to parquet column
pruning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

FEATURE_DIM = 8

DECODE_SCHEMA = (
    "doc_id long, byte_len long, width long, height long, channels long, "
    f"feature array<double>"
)


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Make a binary 'media' column (UTF-8 bytes of the text — the
    testdata has no real media; the pipeline shape is what matters)."""
    return df.withColumn("media", F.encode(F.col(text_col), "UTF-8"))


def media_metadata(df: DataFrame, blob_col: str = "media") -> DataFrame:
    """Metadata-only projection: never decodes, prunes to the binary
    column's statistics where possible."""
    return df.select(
        "doc_id",
        F.octet_length(F.col(blob_col)).cast("long").alias("byte_len"),
        F.md5(F.col(blob_col)).alias("content_md5"),
    )


def decode_image(blob: bytes):
    """Real decoder stub. Wire PIL/libvips here when available.

    STUB: the container ships no image codecs; see fake_decode_features
    for the deterministic test-path implementation.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires PIL/pillow, not present in this "
            "container; use fake_decode_features for the plumbing path"
        ) from exc
    raise NotImplementedError("PIL present but decoder not implemented yet")


def _fake_features(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic fake 'decode': dimensions + an 8-dim feature vector
    derived from the md5 of the bytes. Stands in for a real decoder with
    identical Spark-side shape (bytes → fixed-schema struct)."""
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    channels = 1 + digest[2] % 3
    feature = [round((b - 128) / 128.0, 6) for b in digest[4 : 4 + FEATURE_DIM]]
    return width, height, channels, feature


def fake_decode_features(df: DataFrame, blob_col: str = "media") -> DataFrame:
    """mapInPandas decode pipeline: Arrow-batched, partition-streamed.
    One output row per input row with decoded metadata + feature vector."""

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[blob_col]):
                blob = bytes(payload)
                width, height, channels, feature = _fake_features(blob)
                rows.append(
                    (int(doc_id), len(blob), width, height, channels, feature)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "byte_len", "width", "height", "channels", "feature"],
            )

    return df.select("doc_id", blob_col).mapInPandas(decode_batches, DECODE_SCHEMA)
