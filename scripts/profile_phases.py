"""Phase breakdown for bench queries: builder (eager driver-side jobs —
staging writes, collects, localCheckpoints) vs the final count action.

Usage: python scripts/profile_phases.py [query ...]
Runs each query 3x after the bench's own warmup, printing
build/count/total per run.  Diagnostic only — bench.py is untouched.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_spark import get_spark
from streaming_spark.queries import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:] or [
        "q_fuzzy_name_pairs",
        "q_exact_nn_blocked",
        "dedup_embedding_cosine_blocked",
        "q_dsir_weights",
        "dedup_minhash_lsh",
    ]
    spark = get_spark(app_name="profile-phases")
    import pandas as pd  # noqa: F401

    from streaming_spark.operators.stream import stream, stream_arrow

    REGISTRY["q_count"](spark, SF_DIR).collect()
    warm = spark.range(
        0, spark.sparkContext.defaultParallelism, 1,
        spark.sparkContext.defaultParallelism,
    )
    stream(warm, lambda pdf: pdf, warm.schema).count()
    stream_arrow(warm, lambda b: b, warm.schema).count()

    for name in names:
        for i in range(3):
            t0 = time.perf_counter()
            df = REGISTRY[name](spark, SF_DIR)
            t1 = time.perf_counter()
            n = df.count()
            t2 = time.perf_counter()
            print(
                f"{name} run{i}: build={t1-t0:.3f}s count={t2-t1:.3f}s "
                f"total={t2-t0:.3f}s rows={n}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
