"""Interval-overlap (range) join — the reference's flagship analytical
pattern (1000-genomes variants × genes, reference
r_pkg/vignettes/ranges.Rmd:218-237).

Two physical strategies:

- ``overlap_join`` (default, binned): both sides are exploded onto a
  fixed-width bin grid per partition key and equi-joined on
  (key, bin); a bin-ownership predicate (pair counted only in the bin
  containing the overlap start) removes duplicates without a
  ``distinct()``.  Probe work scales with true selectivity instead of
  |left|·(right rows per key).  Works broadcast OR shuffled — both
  sides may be arbitrarily large, which is the 100 TB posture.
- ``overlap_join_naive``: plain equi-join on the partition key with the
  range predicate as a filter — optimal only when one side is a small
  broadcastable dimension with few rows per key.

Semantics: rows (l, r) with ``l.key == r.key`` and
``l.start <= r.end AND l.end >= r.start`` (closed intervals).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def auto_bin_width(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    stats_rows: int = 100_000,
) -> int:
    """Pick a bin width from interval-length statistics.

    Cost model (measured, sf0.1 sweep on the both-sides-large join):
    candidate-pair probes grow ∝ width once width exceeds the typical
    interval length, while duplicate-bin explosion grows ∝ length/width
    below it — the wall-clock optimum is a wide plateau centred near
    HALF the median length of the longer-interval side (512→2.45s,
    1024-4096→1.47s, 8192→1.65s, 16384→2.12s, 32768→3.08s).  We take
    the max of the two sides' approximate median lengths, halve it, and
    round to a power of two.

    The stats jobs read only the first ``stats_rows`` rows of each side
    (a LocalLimit — no shuffle, no full scan, and it short-circuits any
    repartition upstream; measured 3.0s → 0.3s at sf0.1 vs whole-table
    medians).  A head sample is positionally biased, but the plateau is
    ~4 widths wide — only order-of-magnitude length skew along file
    order could mislead it, and callers with such layouts can pin the
    width explicitly."""

    def median_len(df: DataFrame, s: str, e: str) -> float:
        row = (
            df.select((F.col(e) - F.col(s)).alias("__len"))
            .limit(stats_rows)
            .select(F.expr("approx_percentile(__len, 0.5)").alias("m"))
            .first()
        )
        return float(row.m) if row.m is not None else 0.0

    m = max(
        median_len(left, left_start, left_end),
        median_len(right, right_start, right_end),
        1.0,
    )
    width = 2 ** round(math.log2(max(m / 2.0, 64.0)))
    return int(min(max(width, 64), 1 << 22))


def _with_bins(df: DataFrame, start: str, end: str, width: int) -> DataFrame:
    return df.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start) / width), F.floor(F.col(end) / width)
            )
        ),
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: int | str = "auto",
    broadcast_right: bool = False,
    stats_rows: int = 100_000,
) -> DataFrame:
    """Binned interval join; returns the joined rows (all columns of both
    sides).  ``bin_width`` trades duplicate-bin explosion against probe
    fan-out; the default ``"auto"`` derives it from interval-length
    medians (see :func:`auto_bin_width` — measured optimum is ~half the
    longer side's median length).  Pass an int to pin it."""
    if bin_width == "auto":
        bin_width = auto_bin_width(
            left, right, left_start, left_end, right_start, right_end,
            stats_rows=stats_rows,
        )
    lb = _with_bins(left, left_start, left_end, bin_width)
    rb = _with_bins(right, right_start, right_end, bin_width)
    if broadcast_right:
        rb = F.broadcast(rb)
    joined = lb.join(rb, [key, "__bin"]).filter(
        (F.col(left_start) <= F.col(right_end))
        & (F.col(left_end) >= F.col(right_start))
    )
    # count each overlapping pair exactly once: in the bin where the
    # overlap begins
    owner = F.floor(
        F.greatest(F.col(left_start), F.col(right_start)) / bin_width
    )
    return joined.filter(F.col("__bin") == owner).drop("__bin")


def overlap_join_naive(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
) -> DataFrame:
    """Equi-join on key + range filter — for small broadcastable right
    sides with few rows per key."""
    return left.join(F.broadcast(right), key).filter(
        (F.col(left_start) <= F.col(right_end))
        & (F.col(left_end) >= F.col(right_start))
    )
