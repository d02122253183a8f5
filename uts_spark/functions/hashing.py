"""Portable deterministic 64-bit hashing, identical in Spark and DuckDB.

Built on md5 (both engines emit identical lowercase hex): take the first
15 hex chars (60 bits — fits BIGINT, no sign issues) and parse as an
integer. This gives every dedup/similarity operator a hash family that an
external SQL oracle can reproduce bit-for-bit — Spark's ``hash()`` /
``xxhash64()`` are engine-specific and would make results unverifiable.

For a hash FAMILY (minhash), member ``i`` hashes ``concat(i, ':', s)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash64(col: Column) -> Column:
    """60-bit deterministic hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash64_member(i: int, col: Column) -> Column:
    """Member i of the hash family: hash64(i || ':' || s)."""
    return hash64(F.concat(F.lit(f"{i}:"), col))


def duck_hash64(expr: str) -> str:
    """DuckDB SQL mirroring :func:`hash64` exactly."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def duck_hash64_member(i: int, expr: str) -> str:
    return duck_hash64(f"concat('{i}:', {expr})")
