"""Interleaved A/B of ensure_parallelism's size-adaptive target vs the
old all-cores target, same session, alternating per round so box load
spikes hit both arms equally.

A = size-adaptive (stream._FANOUT_TARGET_BYTES = 64 KB, the new default)
B = old behavior (target bytes = 1, so est//1 >= dp for every consumer)

Usage: python scripts/ab_sizing.py [rounds] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_spark import get_spark
from streaming_spark.operators import stream as stream_mod
from streaming_spark.queries import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    rounds = int(sys.argv[1])
    names = sys.argv[2:]
    spark = get_spark(app_name="ab-sizing")
    REGISTRY["q_count"](spark, SF_DIR).collect()
    from streaming_spark.operators.stream import stream, stream_arrow

    warm = spark.range(
        0, spark.sparkContext.defaultParallelism, 1,
        spark.sparkContext.defaultParallelism,
    )
    stream(warm, lambda pdf: pdf, warm.schema).count()
    stream_arrow(warm, lambda b: b, warm.schema).count()

    arms = {"adaptive": 64 * 1024, "allcores": 1}
    times: dict[str, dict[str, list[float]]] = {
        n: {a: [] for a in arms} for n in names
    }
    for _ in range(rounds):
        for arm, bpp in arms.items():
            stream_mod._FANOUT_TARGET_BYTES = bpp
            for name in names:
                t0 = time.perf_counter()
                REGISTRY[name](spark, SF_DIR).count()
                times[name][arm].append(round(time.perf_counter() - t0, 3))
    for name in names:
        for arm in arms:
            ts = times[name][arm]
            print(f"{name:34s} {arm:9s} best={min(ts):.3f} runs={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
