"""Interleaved A/B of the exact-Jaccard expression on the all-pairs
dedup_ngram_jaccard shape, same session, alternating per round.

A = derived  (|A∩B| / (|A|+|B| − |A∩B|): union size from the carried
              array sizes — the shipped form; grams are distinct sets)
B = unionmat (|A∩B| / |array_union(A, B)|: materializes an
              |A|+|B|-element array per pair just to count it — r14)

Also asserts both arms return identical row counts each round.

Usage: python scripts/ab_jaccard.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streaming_spark import get_spark
from streaming_spark.queries import REGISTRY
from streaming_spark.queries.registry import T

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark, derived: bool):
    from streaming_spark.operators.stream import ensure_parallelism
    from streaming_spark.operators.text import with_word_ngrams

    docs = T(spark, SF_DIR, "documents").filter(F.col("doc_id") % 5 == 0)
    toks = docs.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= 3
    )
    grams = with_word_ngrams(toks, "toks", 3, "g3").select(
        "doc_id", F.array_distinct("g3").alias("grams")
    )
    a = ensure_parallelism(
        grams.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("g_a")),
        spark.sparkContext.defaultParallelism,
    )
    b = grams.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("g_b"))
    inter = F.size(F.array_intersect("g_a", "g_b"))
    if derived:
        jac = inter / (F.size("g_a") + F.size("g_b") - inter)
    else:
        jac = inter / F.size(F.array_union("g_a", "g_b"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.05)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="ab-jaccard")
    REGISTRY["q_count"](spark, SF_DIR).collect()
    from streaming_spark.operators.stream import stream, stream_arrow

    warm = spark.range(
        0, spark.sparkContext.defaultParallelism, 1,
        spark.sparkContext.defaultParallelism,
    )
    stream(warm, lambda pdf: pdf, warm.schema).count()
    stream_arrow(warm, lambda b: b, warm.schema).count()

    arms = {"derived": True, "unionmat": False}
    times: dict[str, list[float]] = {a: [] for a in arms}
    counts: dict[str, set[int]] = {a: set() for a in arms}
    for _ in range(rounds):
        for arm, derived in arms.items():
            t0 = time.perf_counter()
            n = build(spark, derived).count()
            times[arm].append(round(time.perf_counter() - t0, 3))
            counts[arm].add(n)
    for arm in arms:
        ts = times[arm]
        print(
            f"dedup_ngram_jaccard {arm:8s} best={min(ts):.3f} "
            f"median={sorted(ts)[len(ts)//2]:.3f} runs={ts} rows={counts[arm]}"
        )
    assert counts["derived"] == counts["unionmat"], counts
    spark.stop()


if __name__ == "__main__":
    main()
