"""Interleaved A/B of ensure_parallelism variants for the Python-heavy
fan-out consumers (VERDICT r14 items 1/2/6).

Variants of the resize pipeline's fan-out (same math, same rows):
  full32  — xxhash64(all columns incl. blob) to defaultParallelism (r14 HEAD)
  rr32    — keyless round-robin repartition (r13 shape)
  id32    — xxhash64(id) only, defaultParallelism
  idN     — xxhash64(id) only, N partitions sized by input bytes

Usage: python scripts/ab_fanout.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streaming_spark import get_spark
from streaming_spark.io import load_table
from streaming_spark.operators import multimodal
from streaming_spark.operators.stream import stream

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="ab-fanout")
    sc = spark.sparkContext
    dp = sc.defaultParallelism

    import pandas as pd

    warm = spark.range(0, dp, 1, dp)
    stream(warm, lambda pdf: pdf, warm.schema).count()

    def run_resize(repart):
        docs = load_table(spark, SF_DIR, "documents").filter(
            F.col("text").isNotNull()
        )
        blobs = multimodal.to_blob(docs, text_col="text", id_col="doc_id")
        sel = blobs.select("id", "blob")
        fan = repart(sel)

        # reproduce fake_decode_image -> resize_images with the
        # experiment-controlled exchange, then the bench query's tail
        import streaming_spark.operators.multimodal as mm

        orig = mm.ensure_parallelism
        mm.ensure_parallelism = lambda df, *a, **k: df  # fan handled here
        try:
            imgs = mm.fake_decode_image(fan, height=16, width=16)
            small = mm.resize_images(imgs, out_h=8, out_w=8)
        finally:
            mm.ensure_parallelism = orig
        out = small.select("id", F.posexplode("img").alias("px_no", "px"))
        return out.count()

    variants = {
        "full32": lambda df: df.repartition(
            dp, F.xxhash64(*[F.col(c) for c in df.columns])
        ),
        "rr32": lambda df: df.repartition(dp),
        "id32": lambda df: df.repartition(dp, F.xxhash64("id")),
        "id8": lambda df: df.repartition(8, F.xxhash64("id")),
        "id12": lambda df: df.repartition(12, F.xxhash64("id")),
        "none": lambda df: df,
    }
    times = {k: [] for k in variants}
    for r in range(rounds):
        for name, repart in variants.items():
            t0 = time.perf_counter()
            n = run_resize(repart)
            dt = time.perf_counter() - t0
            times[name].append(round(dt, 3))
    for name, ts in times.items():
        print(f"{name:8s} best={min(ts):.3f} runs={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
