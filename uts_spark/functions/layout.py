"""Z-order (Morton) curve layout: multi-dimensional data clustering.

A 100 TB table queried by TWO selective dimensions (e.g. user and value
band, or lat/lon) can only be range-partitioned by one of them — unless
rows are ordered by an interleaved space-filling curve, which keeps rows
close in BOTH dimensions close on the curve. Sorting/range-partitioning
by the z-value makes every file cover a small rectangle of (x, y) space,
so min/max file statistics prune scans on either predicate (the same
mechanism behind Delta/Iceberg ``ZORDER BY``; reference has no storage
layer at all — uts.ts:243 is a plain in-memory array).

The interleave is pure integer bit-math (shift/mask spreading), identical
in Spark and DuckDB, so the curve assignment itself is oracle-checkable
bit-for-bit. ``tests/test_sinks.py`` proves the locality claim: files
written in z-order have strictly smaller average (x, y) bounding boxes
than time-ordered files.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (shift, mask) steps that spread a 16-bit int so one zero bit separates
# every payload bit: 0000abcd -> 0a0b0c0d (classic Morton magic numbers)
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(v: Column) -> Column:
    for shift, mask in _SPREAD_STEPS:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def z_value(x: Column, y: Column) -> Column:
    """Morton z-value of two 16-bit non-negative ints (y gets the odd
    bits). Inputs are masked to 16 bits — callers bucket/clamp first."""
    sx = _spread16(x.cast("long").bitwiseAND(F.lit(0xFFFF)))
    sy = _spread16(y.cast("long").bitwiseAND(F.lit(0xFFFF)))
    return sx.bitwiseOR(F.shiftleft(sy, 1)).alias("zval")


def _duck_spread16(expr: str) -> str:
    for shift, mask in _SPREAD_STEPS:
        expr = f"((({expr}) | (({expr}) << {shift})) & {mask})"
    return expr


def duck_z_value(x: str, y: str) -> str:
    """DuckDB SQL mirroring :func:`z_value` exactly."""
    sx = _duck_spread16(f"(CAST({x} AS BIGINT) & 65535)")
    sy = _duck_spread16(f"(CAST({y} AS BIGINT) & 65535)")
    return f"({sx} | ({sy} << 1))"
