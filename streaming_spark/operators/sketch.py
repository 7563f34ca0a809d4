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

The 64-bit base hash is Spark's own ``xxhash64`` (seed 42), computed
JVM-side in the select that feeds the Arrow pass — the per-value Python
hashing loop this replaced was the slowest hash in the engine at corpus
scale (VERDICT r5 item 4).  Driver-side point estimates recompute the
same base with a pure-Python XXH64 (the public-domain Cyan4973
algorithm; bit-equality with Spark's expression is pinned in
tests/test_operators.py::test_python_xxh64_matches_spark).  The
depth-row seed mixing stays in numpy, unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from streaming_spark.operators.stream import stream

_SEEDS = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F, 0x165667B1)

_M64 = (1 << 64) - 1
_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F
_P64_3 = 0x165667B19E3779F9
_P64_4 = 0x85EBCA77C2B2AE63
_P64_5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64_round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P64_2) & _M64
    return (_rotl64(acc, 31) * _P64_1) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """Pure-Python XXH64 over ``data`` — bit-identical to Spark SQL's
    ``xxhash64(CAST(x AS STRING))`` when ``data`` is the value's UTF-8
    bytes and ``seed`` is 42 (Spark's default).  Used only for bounded
    driver-side query lists; the corpus pass hashes JVM-side."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P64_1) & _M64
        while i <= n - 32:
            v1 = _xxh64_round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _xxh64_round(
                v2, int.from_bytes(data[i + 8 : i + 16], "little")
            )
            v3 = _xxh64_round(
                v3, int.from_bytes(data[i + 16 : i + 24], "little")
            )
            v4 = _xxh64_round(
                v4, int.from_bytes(data[i + 24 : i + 32], "little")
            )
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _xxh64_round(0, v)) * _P64_1 + _P64_4) & _M64
    else:
        h = (seed + _P64_5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _xxh64_round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl64(h, 27) * _P64_1 + _P64_4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P64_1) & _M64
        h = (_rotl64(h, 23) * _P64_2 + _P64_3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P64_5) & _M64
        h = (_rotl64(h, 11) * _P64_1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h


def _mix_rows(base: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) column indices from uint64 base hashes — one
    deterministic seed-mix per sketch row (unchanged from the md5 era,
    so only the base hash moved JVM-side)."""
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
    O(partitions · depth · width) ints, independent of row count.  The
    base hash (xxhash64 of the value's string form, seed 42) runs in
    whole-stage codegen before the pass; Python only mixes and counts."""

    def partial(pdf: pd.DataFrame, side) -> pd.DataFrame:
        d, w = side
        if len(pdf) == 0:
            return None
        mat = np.zeros((d, w), dtype=np.int64)
        base = pdf["__cm_base"].to_numpy(dtype=np.int64).view(np.uint64)
        idx = _mix_rows(base, d, w)
        for row in range(d):
            np.add.at(mat[row], idx[row], 1)
        return pd.DataFrame({"cells": [mat.reshape(-1).tolist()]})

    hashed = df.select(
        F.xxhash64(F.col(col).cast("string")).alias("__cm_base")
    )
    parts = stream(
        hashed,
        partial,
        "cells ARRAY<BIGINT>",
        side_input=(depth, width),
    ).collect()
    total = np.zeros(depth * width, dtype=np.int64)
    for r in parts:
        total += np.array(r["cells"], dtype=np.int64)
    return total.reshape(depth, width)


def bloom_build(
    df: DataFrame, col: str, n_bits: int = 1 << 16, k: int = 4
) -> np.ndarray:
    """Build a Bloom-filter membership sketch over ``col``: a packed
    ``n_bits``-bit bitmap (returned as ``n_bits/64`` uint64 words) where
    each value sets ``k`` bits chosen by the same xxhash64-base +
    numpy-seed-mix scheme as Count-Min (:func:`_mix_rows` with
    depth=k, width=n_bits — one hash family for the whole sketch
    module).  The merge is BITWISE OR, so per-partition bitmaps built in
    one narrow Arrow pass combine exactly — linear like Count-Min, no
    key shuffle.  Guarantees: NO false negatives ever; false-positive
    rate ≈ (1 - e^{-kn/m})^k, observable and bounded by sizing m.

    This is the reference's membership-gate pattern (a corpus-side
    digest index probed before expensive work) in fixed memory: at
    100 TB a 2^30-bit bitmap (128 MB) indexes billions of digests and
    broadcasts to every executor, so ingest batches classify locally
    with zero shuffle and only bloom HITS pay the exact verify join."""
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")

    def partial(pdf: pd.DataFrame, side) -> pd.DataFrame:
        kk, m = side
        if len(pdf) == 0:
            return None
        words = np.zeros(m // 64, dtype=np.uint64)
        base = pdf["__cm_base"].to_numpy(dtype=np.int64).view(np.uint64)
        pos = _mix_rows(base, kk, m)  # (k, n) bit positions
        flat = pos.reshape(-1)
        np.bitwise_or.at(
            words,
            (flat >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (flat & np.uint64(63)),
        )
        return pd.DataFrame({"words": [words.view(np.int64).tolist()]})

    hashed = df.select(
        F.xxhash64(F.col(col).cast("string")).alias("__cm_base")
    )
    parts = stream(
        hashed, partial, "words ARRAY<BIGINT>", side_input=(k, n_bits)
    ).collect()
    total = np.zeros(n_bits // 64, dtype=np.uint64)
    for r in parts:
        total |= np.array(r["words"], dtype=np.int64).view(np.uint64)
    return total


def bloom_contains(bloom: np.ndarray, values: list, k: int = 4) -> list[bool]:
    """Driver-side point membership: True iff ALL k bits are set.  Same
    str()-UTF-8 xxh64 base as :func:`countmin_estimate` (exact for
    strings and integers), so build/probe agree bit-for-bit."""
    n_bits = len(bloom) * 64
    base = np.array(
        [xxh64(str(v).encode("utf-8")) for v in values], dtype=np.uint64
    )
    pos = _mix_rows(base, k, n_bits)
    out = []
    for i in range(len(values)):
        hit = True
        for row in range(k):
            p = int(pos[row, i])
            if not (int(bloom[p >> 6]) >> (p & 63)) & 1:
                hit = False
                break
        out.append(hit)
    return out


def bloom_probe_col(
    df: DataFrame, col: str, bloom: np.ndarray, k: int = 4,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Distributed membership probe: adds boolean ``out_col`` = might-
    be-present.  The base hash (xxhash64 of the value's string form)
    runs JVM-side; the bitmap rides to executors closed over the Arrow
    map (at cluster scale: an sc.broadcast) and the k bit tests are
    vectorized numpy per batch — zero shuffle, zero false negatives."""
    n_bits = len(bloom) * 64

    def probe(pdf: pd.DataFrame, side) -> pd.DataFrame:
        kk, m, words = side
        if len(pdf) == 0:
            return pdf.assign(**{out_col: pd.Series([], dtype=bool)})
        base = pdf["__bf_base"].to_numpy(dtype=np.int64).view(np.uint64)
        pos = _mix_rows(base, kk, m)
        hit = np.ones(len(pdf), dtype=bool)
        for row in range(kk):
            p = pos[row]
            bits = (
                words[(p >> np.uint64(6)).astype(np.int64)]
                >> (p & np.uint64(63))
            ) & np.uint64(1)
            hit &= bits.astype(bool)
        return pdf.assign(**{out_col: hit})

    hashed = df.withColumn(
        "__bf_base", F.xxhash64(F.col(col).cast("string"))
    )
    # fresh StructType: StructType.add mutates in place, and hashed's
    # cached Python-side schema must keep matching its JVM plan
    schema = StructType(list(hashed.schema.fields)).add(out_col, "boolean")
    return stream(
        hashed, probe, schema, side_input=(k, n_bits, bloom.copy())
    ).drop("__bf_base")


def countmin_estimate(sketch: np.ndarray, values: list) -> list[int]:
    """Point estimates: min over the item's cells in each row.  The
    driver-side base hash must agree with the build's JVM xxhash64, so
    values are hashed via :func:`xxh64` on their ``str()`` UTF-8 bytes —
    exact for strings and integers (Python str == Spark CAST AS STRING
    for those types; don't feed floats through the estimate path)."""
    depth, width = sketch.shape
    base = np.array(
        [xxh64(str(v).encode("utf-8")) for v in values], dtype=np.uint64
    )
    idx = _mix_rows(base, depth, width)
    return [
        int(min(sketch[row, idx[row, i]] for row in range(depth)))
        for i in range(len(values))
    ]
