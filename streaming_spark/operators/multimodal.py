"""Multimodal (binary) column operators.

Images/audio/video are opaque ``binary`` columns with typed metadata —
the direct generalization of the reference's MNIST pipeline, which ships
image blobs through the feather protocol as binary attributes (reference
py_pkg/examples/4-machine-learning.py:80-96: csv → binary images;
StreamSettings.h:94-123: binary is a first-class wire type).

The decode step needs image/audio libraries that are not in this
container, so decode is STUBBED: ``decode_image`` raises
NotImplementedError unless PIL is importable, and the tested path uses
``fake_decode_features`` — a deterministic md5-based feature vector with
the REAL Spark plumbing (schema, Arrow batch shape, partitioning,
one-to-many frame explode).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streaming_spark.operators.stream import ensure_parallelism, stream

try:  # pragma: no cover - not available in this container
    from PIL import Image  # type: ignore

    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False


def to_blob(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Encode a string column to a binary blob column (utf-8) — the
    reference's csv→binary step (4-machine-learning.py:112-147)."""
    return df.select(
        F.col(id_col).alias("id"), F.encode(F.col(text_col), "utf-8").alias("blob")
    )


def decode_image(blob: bytes):  # pragma: no cover - stub
    """Real image decode — requires PIL, absent in this container."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL/opencv which are not installed; "
            "use fake_decode_features for the plumbing-tested path"
        )
    import io

    return Image.open(io.BytesIO(blob))


def fake_decode_features(df: DataFrame, blob_col: str = "blob", dim: int = 8) -> DataFrame:
    """Deterministic stand-in for decode→feature-extract: md5 of the blob
    expanded to ``dim`` floats in [0,1).  Schema/batching identical to a
    real embedding UDF (array<float> out, Arrow in/out)."""

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        feats = []
        for blob in pdf[blob_col]:
            h = hashlib.md5(bytes(blob)).digest()
            rng = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
            feats.append((rng.astype(np.float64) / 2**32).astype(np.float32).tolist())
        return pd.DataFrame({"id": pdf["id"], "features": feats})

    return stream(
        ensure_parallelism(df.select("id", blob_col)),
        compute,
        "id BIGINT, features ARRAY<FLOAT>",
    )


def write_tar_shards(
    samples: list[tuple[str, str, bytes]],
    out_dir: str,
    n_shards: int = 2,
) -> list[str]:
    """Write ``(key, ext, payload)`` samples into ``n_shards`` webdataset-
    style tar shards (member name ``<key>.<ext>``), deterministically:
    samples sorted by key, round-robin sharded, fixed mtimes.  Fixture
    generator for the container-source tests/queries — at production
    scale shards come from the data-collection pipeline."""
    import os
    import tarfile

    paths = []
    shards: list[list[tuple[str, str, bytes]]] = [[] for _ in range(n_shards)]
    for i, item in enumerate(sorted(samples)):
        shards[i % n_shards].append(item)
    for s, members in enumerate(shards):
        path = os.path.join(out_dir, f"shard-{s:05d}.tar")
        with tarfile.open(path, "w") as tf:
            for key, ext, payload in members:
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                info.mtime = 0
                import io

                tf.addfile(info, io.BytesIO(payload))
        paths.append(path)
    return paths


def read_tar_members(
    spark, path: str, pattern: str = "*.tar", batch_bytes: int = 64 << 20
) -> DataFrame:
    """Container (webdataset-style) multimodal source: a directory of tar
    shards → one row per member file —
    ``(shard, sample_key, ext, blob, n_bytes)``.

    Scale shape: Spark's ``binaryFile`` source assigns ONE TASK PER
    SHARD (shards don't split — tar has no internal index), so
    parallelism = shard count; the webdataset convention of ~1 GB shards
    makes each task's working set bounded.  The tar walk runs
    executor-side inside an Arrow-batched map — the driver never sees a
    byte of payload.  Member rows flush to an output batch every
    ``batch_bytes`` of accumulated payload, so the peak Python-side
    buffer is one OUTPUT batch, not one whole decompressed shard (the
    shard's raw bytes are already resident via binaryFile — that is the
    source's floor — but the exploded copy is bounded).  Members named
    ``<key>.<ext>`` with the same key are one logical sample (group
    downstream by ``sample_key``)."""
    import ntpath

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
        .select("path", "content")
    )

    def explode(batches):
        import io
        import tarfile

        for pdf in batches:
            for shard_path, content in zip(pdf["path"], pdf["content"]):
                shard = ntpath.basename(shard_path)
                keys, exts, blobs, sizes = [], [], [], []
                pending = 0

                def flush():
                    return pd.DataFrame(
                        {
                            "shard": shard,
                            "sample_key": keys,
                            "ext": exts,
                            "blob": blobs,
                            "n_bytes": sizes,
                        }
                    )

                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        base = ntpath.basename(m.name)
                        key, _, ext = base.rpartition(".")
                        data = tf.extractfile(m).read()
                        keys.append(key or base)
                        exts.append(ext)
                        blobs.append(data)
                        sizes.append(len(data))
                        pending += len(data)
                        if pending >= batch_bytes:
                            yield flush()
                            keys, exts, blobs, sizes = [], [], [], []
                            pending = 0
                if keys:
                    yield flush()

    return files.mapInPandas(
        explode,
        "shard STRING, sample_key STRING, ext STRING, blob BINARY, n_bytes BIGINT",
    )


def fake_decode_image(
    df: DataFrame, blob_col: str = "blob", height: int = 16, width: int = 16
) -> DataFrame:
    """Deterministic stand-in for blob→image DECODE: raster row ``r``'s
    bytes are ``md5(blob + b"|" + str(r))`` tiled to ``width`` — a
    ``height × width`` uint8 grayscale raster (flattened row-major,
    plus shape columns) whose rows all differ, so downstream
    interpolation is exercised in BOTH axes.  Same contract as
    :func:`fake_decode_features` — only the codec is faked (PIL is
    absent here; :func:`decode_image` is the env-gated real one); the
    Spark-side plumbing (Arrow batching, schema, one-raster-per-row
    array column) is exactly what a real decoder produces, so every
    downstream image op (resize, feature extract) runs real math over
    it.  The per-row digest construction is deliberately replayable in
    ANSI SQL (``md5(text || '|' || r)`` + hex-substring byte extraction)
    — the resize pipeline's DuckDB oracle recomputes every pixel."""

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        reps = width // 16 + 1
        pixels = []
        for blob in pdf[blob_col]:
            b = bytes(blob)
            rows = [
                np.frombuffer(
                    (hashlib.md5(b + b"|" + str(r).encode()).digest() * reps)[
                        :width
                    ],
                    dtype=np.uint8,
                )
                for r in range(height)
            ]
            pixels.append(
                np.concatenate(rows).astype(np.int32).tolist()
            )
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "img": pixels,
                "img_h": height,
                "img_w": width,
            }
        )

    return stream(
        ensure_parallelism(df.select("id", blob_col)),
        compute,
        "id BIGINT, img ARRAY<INT>, img_h INT, img_w INT",
    )


def _bilinear_batch(imgs: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """REAL vectorized bilinear resize of a batch of grayscale rasters
    ``(n, H, W) float64 → (n, out_h, out_w)`` — the half-pixel-center
    (align_corners=False) convention used by PIL/torch/TF defaults,
    edge-replicate at the borders.  Pure numpy: four fancy-indexed
    gathers + the two lerps, no per-pixel Python."""
    n, H, W = imgs.shape
    ys = (np.arange(out_h) + 0.5) * (H / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (W / out_w) - 0.5
    y0f = np.floor(ys)
    x0f = np.floor(xs)
    wy = (ys - y0f)[None, :, None]  # (1, out_h, 1)
    wx = (xs - x0f)[None, None, :]  # (1, 1, out_w)
    y0 = np.clip(y0f.astype(np.int64), 0, H - 1)
    y1 = np.clip(y0f.astype(np.int64) + 1, 0, H - 1)
    x0 = np.clip(x0f.astype(np.int64), 0, W - 1)
    x1 = np.clip(x0f.astype(np.int64) + 1, 0, W - 1)
    tl = imgs[:, y0[:, None], x0[None, :]]
    tr = imgs[:, y0[:, None], x1[None, :]]
    bl = imgs[:, y1[:, None], x0[None, :]]
    br = imgs[:, y1[:, None], x1[None, :]]
    top = tl + (tr - tl) * wx
    bot = bl + (br - bl) * wx
    return top + (bot - top) * wy


def resize_images(
    df: DataFrame,
    img_col: str = "img",
    h_col: str = "img_h",
    w_col: str = "img_w",
    out_h: int = 8,
    out_w: int = 8,
    id_col: str = "id",
) -> DataFrame:
    """Bilinear image resize over a raster column — the standard
    image-preprocessing stage between decode and feature extraction
    (train-set normalization to a fixed input size).  Input rows carry
    a flattened row-major grayscale raster (``img_col``) plus its
    ``h_col × w_col`` shape (the :func:`fake_decode_image` /
    :func:`decode_image` contract); output replaces them with the
    ``out_h × out_w`` resize as ``ARRAY<FLOAT>`` plus shape columns.

    The resize MATH is real (vectorized half-pixel-center bilinear,
    edge-replicate — contract-tested against constant / gradient /
    exact-2x-box-mean identities); only the upstream image DECODE is
    env-gated (PIL).  Plan shape: one narrow Arrow map, rasters grouped
    by shape within each batch so every same-shape group resizes in one
    (n, H, W) vectorized call; no shuffle, output rows = input rows.
    At 100 TB the raster column dominates the batch bytes — size
    ``arrow.maxRecordsPerBatch`` to the raster, not the row count."""

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.reset_index(drop=True)  # positions == labels even if
        # an upstream chunk_rows slice handed us a shifted index
        n = len(pdf)
        out = np.empty((n, out_h * out_w), dtype=np.float32)
        shapes = pd.DataFrame(
            {"h": pdf[h_col].to_numpy(), "w": pdf[w_col].to_numpy()}
        )
        for (hh, ww), idx in shapes.groupby(["h", "w"]).groups.items():
            rows = np.asarray(idx, dtype=np.int64)
            imgs = np.stack(
                [
                    np.asarray(pdf[img_col].iloc[i], dtype=np.float64).reshape(
                        hh, ww
                    )
                    for i in rows
                ]
            )
            out[rows] = (
                _bilinear_batch(imgs, out_h, out_w)
                .reshape(len(rows), -1)
                .astype(np.float32)
            )
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                "img": list(out),
                "img_h": out_h,
                "img_w": out_w,
            }
        )

    return stream(
        df.select(id_col, img_col, h_col, w_col),
        compute,
        f"{id_col} BIGINT, img ARRAY<FLOAT>, img_h INT, img_w INT",
    )


def frame_sample(
    df: DataFrame, blob_col: str = "blob", frame_bytes: int = 64, max_frames: int = 4
) -> DataFrame:
    """One-to-many frame sampling: slice each blob into up to
    ``max_frames`` fixed-size 'frames' and emit one row per frame with a
    content digest — the video-frame-sampling plumbing shape (explode
    inside an Arrow map; output is larger than input, which mapInPandas
    supports natively)."""

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        ids, frame_nos, digests, sizes = [], [], [], []
        for doc_id, blob in zip(pdf["id"], pdf[blob_col]):
            data = bytes(blob)
            n = min(max_frames, max(1, (len(data) + frame_bytes - 1) // frame_bytes))
            for f in range(n):
                chunk = data[f * frame_bytes : (f + 1) * frame_bytes]
                ids.append(doc_id)
                frame_nos.append(f)
                digests.append(hashlib.md5(chunk).hexdigest())
                sizes.append(len(chunk))
        return pd.DataFrame(
            {"id": ids, "frame_no": frame_nos, "frame_md5": digests, "frame_bytes": sizes}
        )

    return stream(
        ensure_parallelism(df.select("id", blob_col)),
        compute,
        "id BIGINT, frame_no INT, frame_md5 STRING, frame_bytes INT",
    )
