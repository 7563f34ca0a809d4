"""Interleaved A/B of q_dsir_weights shapes (r15 VERDICT item 3).

arms:
  unstaged  — r14 shape: dsir_scores(dtf) evaluates tokenize twice
  staged    — r15: dtf written to scratch, both consumers read it
  staged8   — r15 + coalesce(8) before the write (fewer files/commit)

Usage: python scripts/ab_dsir.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streaming_spark import get_spark
from streaming_spark.io import load_table
from streaming_spark.queries.curation import dsir_scores
from streaming_spark.scratch import scratch_dir

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def dtf_frame(spark):
    docs = load_table(spark, SF_DIR, "documents")
    toks = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
        )
        .select(
            "doc_id", "source", F.substring(F.md5("tok"), 1, 4).alias("bucket")
        )
    )
    return toks.groupBy("doc_id", "source", "bucket").agg(
        F.count(F.lit(1)).alias("tf")
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="ab-dsir")
    spark.range(10).count()

    def unstaged():
        return dsir_scores(dtf_frame(spark)).count()

    def staged():
        d = scratch_dir("abdsir", pin=True)
        dtf_frame(spark).write.parquet(d + "/t")
        return dsir_scores(spark.read.parquet(d + "/t")).count()

    def staged8():
        d = scratch_dir("abdsir8", pin=True)
        dtf_frame(spark).coalesce(8).write.parquet(d + "/t")
        return dsir_scores(spark.read.parquet(d + "/t")).count()

    arms = {"unstaged": unstaged, "staged": staged, "staged8": staged8}
    times = {a: [] for a in arms}
    for _ in range(rounds):
        for a, fn in arms.items():
            t0 = time.perf_counter()
            fn()
            times[a].append(round(time.perf_counter() - t0, 3))
    for a, ts in times.items():
        print(f"{a:9s} best={min(ts):.3f} runs={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
