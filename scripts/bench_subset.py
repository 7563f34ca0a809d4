"""Per-query timing for optimization work: best-of-N (default 3) wall
seconds for the named queries, same timing boundary as bench.py
(build + count), after the same warmup.

Usage: python scripts/bench_subset.py [-n N] query [query ...]
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
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    spark = get_spark(app_name="bench-subset")
    REGISTRY["q_count"](spark, SF_DIR).collect()
    from streaming_spark.operators.stream import stream, stream_arrow

    warm = spark.range(
        0, spark.sparkContext.defaultParallelism, 1,
        spark.sparkContext.defaultParallelism,
    )
    stream(warm, lambda pdf: pdf, warm.schema).count()
    stream_arrow(warm, lambda b: b, warm.schema).count()

    for name in args:
        best, rows, all_t = float("inf"), 0, []
        for _ in range(n):
            t0 = time.perf_counter()
            df = REGISTRY[name](spark, SF_DIR)
            rows = df.count()
            dt = time.perf_counter() - t0
            all_t.append(round(dt, 3))
            best = min(best, dt)
        print(f"{name}: best={best:.3f}s runs={all_t} rows={rows}")
    spark.stop()


if __name__ == "__main__":
    main()
