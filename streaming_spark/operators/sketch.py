"""Count-Min sketch: mergeable point-frequency estimation.

Completes the sketch family (HLL distinct, Greenwald-Khanna quantiles,
Misra-Gries heavy hitters) with the LINEAR frequency sketch: a
depth × width counter matrix where item i increments cell
(row, h_row(i) % width) in every row, and the estimate is the MINIMUM of
an item's cells.  Linearity is the scale property: two sketches over
disjoint data merge by ELEMENTWISE SUM, so per-partition matrices built
in one Arrow pass combine exactly — no second pass, no key shuffle at
all.  Guarantees: estimate ≥ true count always (one-sided error);
overestimate ≤ ε·N with probability 1-δ for width = ⌈e/ε⌉,
depth = ⌈ln 1/δ⌉.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from streaming_spark.operators.stream import stream

_SEEDS = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F, 0x165667B1)


def _hash_rows(values: pd.Series, depth: int, width: int) -> np.ndarray:
    """(depth, n) column indices — one deterministic hash row per seed
    (pandas string hashing is unstable across runs; use md5-derived
    64-bit ints, stable like every hash in the engine)."""
    import hashlib

    base = np.array(
        [
            int.from_bytes(
                hashlib.md5(str(v).encode()).digest()[:8], "little"
            )
            for v in values
        ],
        dtype=np.uint64,
    )
    rows = []
    for d in range(depth):
        mixed = (base ^ np.uint64(_SEEDS[d % len(_SEEDS)] + d)) * np.uint64(
            0x9E3779B97F4A7C15
        )
        rows.append((mixed >> np.uint64(17)) % np.uint64(width))
    return np.stack(rows)


def countmin_sketch(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> np.ndarray:
    """Build the corpus Count-Min matrix: one narrow Arrow pass emits a
    per-partition matrix (flattened), and the driver sums them — the
    merge IS addition, which is the whole point.  Driver collect is
    O(partitions · depth · width) ints, independent of row count."""

    def partial(pdf: pd.DataFrame, side) -> pd.DataFrame:
        d, w = side
        if len(pdf) == 0:
            return None
        mat = np.zeros((d, w), dtype=np.int64)
        idx = _hash_rows(pdf[col], d, w)
        for row in range(d):
            np.add.at(mat[row], idx[row], 1)
        return pd.DataFrame({"cells": [mat.reshape(-1).tolist()]})

    parts = stream(
        df.select(col),
        partial,
        "cells ARRAY<BIGINT>",
        side_input=(depth, width),
    ).collect()
    total = np.zeros(depth * width, dtype=np.int64)
    for r in parts:
        total += np.array(r["cells"], dtype=np.int64)
    return total.reshape(depth, width)


def countmin_estimate(sketch: np.ndarray, values: list) -> list[int]:
    """Point estimates: min over the item's cells in each row."""
    depth, width = sketch.shape
    idx = _hash_rows(pd.Series(values), depth, width)
    return [
        int(min(sketch[row, idx[row, i]] for row in range(depth)))
        for i in range(len(values))
    ]
