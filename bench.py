"""Headline benchmark: runs the engine's representative queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count-style materialization, no
driver collect of bulk data).  One warmup of a tiny query amortizes
session/JVM startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streaming_spark import get_spark
from streaming_spark.queries import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: core operator families, heaviest first-class workloads.
BENCH_QUERIES = [
    "q_grouped_agg",          # hash agg (TPC-H Q1 shape)
    "q_revenue_by_nation",    # multiway star join
    "q_top_customers",        # join + top-k
    "q_overlap_join",         # interval join (reference flagship)
    "q_overlap_join_large",   # interval join, both sides fact-sized
    "q_bucketed_join",        # co-located bucketed fact-fact join
    "q_salted_agg",           # skew-proof two-phase aggregation
    "q_rolling_avg3",         # sort-window
    "q_asof_join",            # union+carry-forward point-in-time join
    "q_global_sum_twophase",  # two-phase stream() aggregation
    "q_identity_roundtrip",   # Arrow round-trip bandwidth
    "q_tumbling_window",      # event-time window
    "q_session_window",       # session windows (gaps-and-islands)
    "dedup_exact",            # digest groupBy
    "dedup_minhash_lsh",      # MinHash+LSH near-dup pipeline
    "dedup_simhash",          # SimHash near-dup (vectorized signatures)
    "ann_topk_bruteforce",    # broadcast-query blocked matmul
    "ann_topk_lsh",           # hyperplane-bucketed approximate top-k
    "dedup_embedding_cosine",  # semantic near-dup, auto mode (broadcast
    #                           matmul at this size; blocked-exact above)
    "text_quality",           # codegen'd text featurization
    "multimodal_blob_features",  # binary column plumbing
    # round-5 additions (headline total not comparable to BENCH_r04's
    # 21-query set; compare per-query shapes)
    "ann_topk_ivfpq",         # composed IVF-PQ: cells + residual ADC + rerank
    "q_fuzzy_name_pairs",     # symmetric-deletion-blocked Levenshtein join
    "text_bpe_encode_stats",  # BPE train (driver) + distributed encode
    # round-5 late additions.  q_qgram_cosine_prefix is deliberately NOT
    # benched: the fixture's 377-trigram alphabet (100-word pool) is
    # prefix filtering's worst case — no gram is rare, so candidates
    # degenerate to near-all-pairs (measured 18 s at sf0.1); on natural
    # text the prefix join keys on rare grams.  The gate still verifies
    # it exactly at sf0.01.
    "ann_topk_lsh_multiprobe",  # query-directed probing, 2-table index
    # unigram-LM tokenizer: driver EM train (memoized once per session)
    # + broadcast Viterbi encode over the corpus.  q_dup_spans stays out
    # for the same fixture-degeneracy reason as q_qgram_cosine_prefix
    # (~58k hot hashes over 1.29M windows → near-total candidates).
    "text_unigram_encode_stats",
    # round-6 additions: data-selection scorers (one fact shuffle each,
    # model-sized broadcast stats)
    "q_dsir_weights",         # DSIR hashed-feature importance weights
    "q_lm_perplexity",        # CCNet-style unigram-LM cross-entropy
    "q_line_dedup",           # CCNet line dedup: digest-only shuffle +
    #                           broadcast removals, text never shuffles
    "dedup_bloom_ingest",     # bloom-gated ingest dedup: fixed-memory
    #                           corpus probe, exact verify on hits only
    # round-7 additions: the recall-1 scale paths that replaced the two
    # all-pairs legs (VERDICT r6 #1)
    "dedup_embedding_cosine_blocked",  # blocked-exact IVF-cell pairs
    #                           (triangle-inequality cell pruning; on
    #                           this near-uniform fixture nothing CAN
    #                           prune — the entry measures the r8
    #                           task-matmul worst case, ~N·sqrt(N)
    #                           shuffle instead of an O(N²) pair join)
    "q_mutual_nn_pairs",      # bound-pruned exact top-1 + reciprocity
    # round-8 addition: the same blocked-exact plan on a corpus where
    # the triangle prune BITES (8 deterministic clusters derived from
    # the fixture embeddings — candidates 25% of the all-pairs
    # ceiling vs 100% uniform, VERDICT r7 #1 "done" criterion; the
    # candidate count is in the telemetry log)
    "dedup_embedding_cosine_clustered",
    # round-8 addition: exact top-k with the blocked arm FORCED on the
    # full 2k-vector table (auto would broadcast at this size) — the
    # task-matmul pass A/B shape; the per-pair-join shape it replaced
    # measured 124 s at this N, the task shape ~3-8 s (ROADMAP r8)
    "q_exact_nn_blocked",
    # round-11 addition: decode→bilinear-resize preprocessing, the
    # multimodal train-set normalization stage (per-pixel oracle-checked
    # in the gate; real vectorized resize math, fake decode)
    "multimodal_resize_pipeline",
]


def main() -> None:
    spark = get_spark(app_name="streaming-spark-bench")
    sf = None
    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        pass

    # warmup: JVM codegen paths + the Python worker pool (one trivial
    # mapInPandas task per core so per-query timings measure steady state)
    REGISTRY["q_count"](spark, SF_DIR).collect()
    import pandas as pd  # noqa: PLC0415

    from streaming_spark.operators.stream import stream

    from streaming_spark.operators.stream import stream_arrow

    warm = spark.range(
        0, spark.sparkContext.defaultParallelism, 1,
        spark.sparkContext.defaultParallelism,
    )
    stream(warm, lambda pdf: pdf, warm.schema).count()
    # mapInArrow tasks use a separate Python worker pool — warm it too
    stream_arrow(warm, lambda b: b, warm.schema).count()
    # materialize the bucketed tables (one-time ETL, not query time —
    # bucketing is write-once/join-many)
    REGISTRY["q_bucketed_join"](spark, SF_DIR).count()

    # min of 3 runs per query: steady-state time, excluding one-off pool
    # spawn / JIT / GC noise (the shared host varies ±30% run to run;
    # min-of-2 was observed to let a multi-second load spike through)
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best, rows = float("inf"), 0
        for _ in range(3):
            t0 = time.perf_counter()
            df = REGISTRY[name](spark, SF_DIR)
            rows = df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({rows} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
