"""Groupers: partition filtered points into bins.

Reference semantics (SURVEY.md §2.5, verified):

- ``AnyGrouper`` (uts.ts:149-162): all points → ONE bin; always exactly one
  output row, even for an empty input (each aggregate serializes its
  initial) → Spark global ``df.agg`` (which also always emits one row).

- ``IntervalGrouper`` = ``TSDB.interval(interval, fill, now)``
  (uts.ts:100-147): tumbling windows of width ``interval`` ms anchored at
  ``now`` counting BACKWARDS — point → bin index
  ``floor((now - t) / interval)`` (uts.ts:138), i.e. bin *i* covers the
  left-exclusive right-inclusive range ``(now-(i+1)·w, now-i·w]``.
  Points with ``t > now`` are dropped. Bin count =
  ``floor((now - start) / interval) + 1`` where ``start`` comes from the
  first ``time >`` comparator in the where clause (uts.ts:113-119), else
  the first (oldest) data point's time. ``fill=true`` keeps empty bins
  (aggregate initials); results are returned NEWEST-FIRST.

This is deliberately NOT ``F.window()``: Spark windows are epoch-aligned
and right-exclusive ``[start, end)``; μts bins are ``now``-anchored and
right-inclusive. The bucket index is a plain integer expression, so Spark
groups by a computed dense key — same O(1) bucket assignment as the
reference's direct-index array (uts.ts:138), but hash-partitioned across
executors.

Scale notes: the grouped aggregation gets map-side partial aggregation;
the zero-fill spine is ``sequence``+``explode`` of bin indices (tiny) and
joins broadcast-style against the aggregated (already small) side — no
extra shuffle over the raw data. When no explicit ``time >`` bound exists
we need min(ts) first; that is one extra cheap column-pruned scan
(min/max come from parquet footer statistics).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class AnyGrouper:
    """All filtered points → one bin (default grouper, uts.ts:368)."""


@dataclass(frozen=True)
class IntervalGrouper:
    """Tumbling bins anchored at ``now``, newest-first (uts.ts:100-147).

    ``interval`` and ``now`` are in the same units as the time column
    (epoch ms for reference-style tables; any numeric works).
    """

    interval: int
    fill: bool = True
    now: int | float | None = None  # None → caller supplies at query time


def interval(width: int, fill: bool = True, now=None) -> IntervalGrouper:
    """Mirror of ``TSDB.interval`` (uts.ts:643-648)."""
    return IntervalGrouper(width, fill, now)
