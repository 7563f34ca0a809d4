"""Scaling measurement for the MULTIMODAL container-ingest path —
webdataset-style tar shards → read_tar_members → fake_decode_features /
frame_sample — complementing stress_blocked.py (embeddings) and
stress_dedup.py (text).

Corpus: deterministic binary payloads (~100 KB each, splitmix64-expanded
pure functions of the sample id), written into tar shards by a local
generator (the engine never sees the generator — it reads the tars via
Spark's binaryFile source exactly as production would).

What the sweep measures / exposes:

- Ingest bandwidth: binaryFile assigns ONE TASK PER SHARD (tar has no
  internal index, so shards don't split).  The sweep includes a
  few-big-shards point (4 × 256 MB) and a many-small-shards point at the
  same total bytes (16 × 64 MB) to show parallelism = shard count —
  sharding is the scale knob, exactly the webdataset contract.
- Bounded explode: read_tar_members flushes an output batch every
  batch_bytes (default 64 MB) of accumulated payload, so a big shard
  never materializes as one Arrow batch.  The 256 MB-shard point runs
  the multi-flush path for real (4+ flushes per shard).
- Byte-exactness at scale: every payload's md5 is recomputed
  EXECUTOR-SIDE from the sample id and compared against the md5 of the
  blob that came back through tar + binaryFile + Arrow; the JSON line
  reports mismatches (must be 0) — the correctness-at-scale number.
- Downstream chaining: fake_decode_features (Arrow-batched feature UDF
  stand-in), frame_sample (one-to-many explode), and the r11
  decode→resize_images preprocessing (32×32 fake rasters bilinear-
  downsampled to 8×8) timed over the full member table.

Usage:
    PYTHONPATH=/root/repo python scripts/stress_tar.py [max_total_mb]
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import shutil
import sys
import tarfile
import time

import numpy as np
import pandas as pd

from streaming_spark import get_spark, scratch

MEMBER_KB = 100  # payload size per member (~100 KB)


def _payload(sample_id: int) -> bytes:
    """~100 KB deterministic bytes — splitmix64 over (id, word index)."""
    n_words = (MEMBER_KB * 1024) // 8
    x = (
        np.uint64(sample_id) * np.uint64(0x9E3779B97F4A7C15)
        + np.arange(n_words, dtype=np.uint64)
    )
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x.tobytes()


def stage_shards(n_shards: int, members_per_shard: int) -> str:
    """Write the tar shards (generator-side, streaming one member at a
    time — constant memory regardless of shard size)."""
    d = scratch.scratch_dir(
        f"stress_tar_{n_shards}x{members_per_shard}", pin=True
    )
    for s in range(n_shards):
        with tarfile.open(os.path.join(d, f"shard-{s:05d}.tar"), "w") as tf:
            for m in range(members_per_shard):
                sid = s * members_per_shard + m
                data = _payload(sid)
                info = tarfile.TarInfo(name=f"{sid:08d}.bin")
                info.size = len(data)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(data))
    return d


def release(*dirs: str) -> None:
    for p in dirs:
        scratch.unpin(p)
        shutil.rmtree(p, ignore_errors=True)


def _verify_digests(members) -> int:
    """Recompute each payload from its sample id executor-side and count
    md5 mismatches vs the blob that came back through the tar path."""

    def check(batches):
        for pdf in batches:
            bad = 0
            for key, blob in zip(pdf["sample_key"], pdf["blob"]):
                expect = hashlib.md5(_payload(int(key))).hexdigest()
                if hashlib.md5(bytes(blob)).hexdigest() != expect:
                    bad += 1
            yield pd.DataFrame({"bad": [bad]})

    return (
        members.select("sample_key", "blob")
        .mapInPandas(check, "bad BIGINT")
        .groupBy()
        .sum("bad")
        .collect()[0][0]
    )


def run_point(spark, n_shards: int, members_per_shard: int) -> None:
    from pyspark.sql import functions as F

    from streaming_spark.operators.multimodal import (
        fake_decode_features,
        frame_sample,
        read_tar_members,
    )

    n_members = n_shards * members_per_shard
    total_mb = n_members * MEMBER_KB // 1024
    d = stage_shards(n_shards, members_per_shard)
    tag = {
        "shards": n_shards,
        "members": n_members,
        "total_mb": total_mb,
    }

    # 1. ingest: tar explode → count + byte total (bandwidth)
    t0 = time.perf_counter()
    agg = (
        read_tar_members(spark, d)
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_bytes").alias("bytes"),
        )
        .collect()[0]
    )
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "op": "tar_ingest",
                **tag,
                "seconds": round(dt, 2),
                "rows": agg["rows"],
                "mb_per_s": round(total_mb / dt, 1),
                "bytes_ok": agg["bytes"] == n_members * MEMBER_KB * 1024,
            }
        ),
        flush=True,
    )

    # 2. byte-exactness: every blob's md5 vs the id-recomputed payload
    t0 = time.perf_counter()
    bad = _verify_digests(read_tar_members(spark, d))
    print(
        json.dumps(
            {
                "op": "tar_digest_verify",
                **tag,
                "seconds": round(time.perf_counter() - t0, 2),
                "mismatches": int(bad),
            }
        ),
        flush=True,
    )

    # 3. chain: members → Arrow feature UDF stand-in (one staging of the
    # member table so the two downstream ops don't re-walk the tars)
    members_dir = scratch.scratch_dir(
        f"stress_tar_members_{n_shards}x{members_per_shard}", pin=True
    )
    read_tar_members(spark, d).select(
        F.col("sample_key").cast("bigint").alias("id"), "blob"
    ).write.parquet(members_dir + "/m")
    blobs = spark.read.parquet(members_dir + "/m")
    t0 = time.perf_counter()
    n_feats = fake_decode_features(blobs, dim=16).count()
    print(
        json.dumps(
            {
                "op": "tar_fake_decode",
                **tag,
                "seconds": round(time.perf_counter() - t0, 2),
                "rows": n_feats,
            }
        ),
        flush=True,
    )

    # 4. chain: one-to-many frame explode (8 × 4 KB frames per member)
    t0 = time.perf_counter()
    n_frames = frame_sample(blobs, frame_bytes=4096, max_frames=8).count()
    print(
        json.dumps(
            {
                "op": "tar_frame_sample",
                **tag,
                "seconds": round(time.perf_counter() - t0, 2),
                "rows": n_frames,
            }
        ),
        flush=True,
    )

    # 5. chain: decode→RESIZE preprocessing (r11) — 32×32 fake rasters
    # bilinear-downsampled to 8×8; the sum guard forces full evaluation
    from streaming_spark.operators.multimodal import (
        fake_decode_image,
        resize_images,
    )

    t0 = time.perf_counter()
    imgs = fake_decode_image(blobs, height=32, width=32)
    small = resize_images(imgs, out_h=8, out_w=8)
    row = small.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.element_at("img", 1)).alias("s"),
    ).first()
    print(
        json.dumps(
            {
                "op": "tar_resize_32to8",
                **tag,
                "seconds": round(time.perf_counter() - t0, 2),
                "rows": int(row["n"]),
            }
        ),
        flush=True,
    )
    release(d, members_dir)


def main() -> None:
    max_total_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    spark = get_spark(app_name="stress-tar")

    # warm the Arrow/pandas worker pools + binaryFile path before timing
    warm = stage_shards(2, 4)
    from streaming_spark.operators.multimodal import read_tar_members

    read_tar_members(spark, warm).count()
    release(warm)

    # (shards, members/shard): 50 MB, 400 MB, then 1 GB as 4 big shards
    # vs 16 small shards (same bytes — isolates parallelism = shards),
    # then 2 GB wide.
    for n_shards, per_shard in (
        (4, 128),
        (16, 256),
        (4, 2560),
        (16, 640),
        (32, 640),
    ):
        total_mb = n_shards * per_shard * MEMBER_KB // 1024
        if total_mb > max_total_mb:
            break
        run_point(spark, n_shards, per_shard)


if __name__ == "__main__":
    main()
