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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    bin_width: int = 16384,
    broadcast_right: bool = False,
) -> DataFrame:
    """Binned interval join; returns the joined rows (all columns of both
    sides).  ``bin_width`` trades duplicate-bin explosion against probe
    fan-out — set it near the typical interval length."""
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
