"""Scaling measurement for the blocked-exact similarity family
(VERDICT r8 #2): blocked cosine pairs and blocked exact-NN at
N = 2k .. 200k on BOTH corpus regimes — uniform (the worst case: no
sound geometric bound can prune, candidate volume saturates at the
all-pairs ceiling and the QuadraticCandidateVolumeWarning fires) and
clustered (the pruning regime the blocking exists for).  One JSON line
per measurement; record the table in ROADMAP next to the r8 2k-20k
curve so the 100 TB grade rests on a measured exponent.

Corpora are deterministic (seeded numpy), staged once to scratch
parquet so the timed operator starts from a parquet scan like a real
deployment, and each run's pinned staging dirs are released through
``scratch.unpin`` afterwards (the ADVICE r8 release handle) so the
sweep keeps disk bounded across the sweep of Ns.

Uniform ops above N = 200k are disk-capped on this box — with zero
pruning each path's task shuffle is ~N x sqrt N vector rows (the pair
path ships each vector once per partner CELL after the r9 cell-pair
task grouping; the NN path ships each query once per probed cell):
measured peak scratch+shuffle at N = 200k was ~37 GB (fits), so the
next step would not.  The cap is itself the documented scale behavior
(the telemetry warns and the sanctioned escape is the ANN family);
the clustered regime runs the full sweep comfortably.

Usage:
    PYTHONPATH=/root/repo python scripts/stress_blocked.py [max_n]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
import warnings

import numpy as np
import pandas as pd

from streaming_spark import get_spark
from streaming_spark import scratch

DIM = 64
SEED = 20260815
CLUSTERS = 32
CLUSTER_NOISE = 0.05  # per-dim sigma: intra-cluster cosine ~0.86 +- 0.02


def make_corpus(kind: str, n: int) -> pd.DataFrame:
    rng = np.random.default_rng(SEED)
    if kind == "uniform":
        mat = rng.standard_normal((n, DIM)).astype(np.float32)
    else:
        centers = rng.standard_normal((CLUSTERS, DIM))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        noise = rng.standard_normal((n, DIM)) * CLUSTER_NOISE
        mat = (centers[np.arange(n) % CLUSTERS] + noise).astype(np.float32)
    return pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(mat)}
    )


def stage_corpus(spark, kind: str, n: int) -> tuple[str, "object"]:
    d = scratch.scratch_dir(f"stress_{kind}_{n}", pin=True)
    pdf = make_corpus(kind, n)
    spark.createDataFrame(
        pdf, "vec_id BIGINT, embedding ARRAY<FLOAT>"
    ).write.parquet(d + "/t")
    return d, spark.read.parquet(d + "/t")


def release(stats: dict, *extra_dirs: str) -> None:
    for p in stats.get("staged_dirs", []):
        scratch.unpin(p)
    for p in extra_dirs:
        scratch.unpin(p)
        shutil.rmtree(p, ignore_errors=True)


def main() -> None:
    from streaming_spark.operators.similarity import cosine_pairs, exact_nn_topk

    max_n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    warnings.filterwarnings(
        "default", category=Warning
    )  # keep the quadratic warning visible in the log
    spark = get_spark(app_name="stress-blocked")

    # warm both worker pools and the JVM before timing (CLAUDE.md)
    warm_dir, warm = stage_corpus(spark, "uniform", 1_000)
    st: dict = {}
    exact_nn_topk(warm, k=2, mode="blocked", stats_out=st).count()
    release(st)
    st = {}
    cosine_pairs(warm, threshold=0.7, mode="blocked", stats_out=st).count()
    release(st, warm_dir)

    ns = [n for n in (2_000, 20_000, 50_000, 100_000, 200_000) if n <= max_n]
    plan = []
    for n in ns:
        for kind in ("clustered", "uniform"):
            for op in ("pairs", "nn"):
                if kind == "uniform" and n > 200_000:
                    plan.append((op, kind, n, "skipped: ~N*sqrt(N) vector "
                                 "shuffle rows exceed local disk at zero "
                                 "pruning"))
                else:
                    plan.append((op, kind, n, None))
    # biggest uniform runs last so earlier results survive a disk blowup
    plan.sort(key=lambda p: (p[2], p[1] == "uniform"))

    for op, kind, n, skip in plan:
        if skip:
            print(json.dumps({"op": op, "corpus": kind, "n": n, "skipped": skip}),
                  flush=True)
            continue
        d, df = stage_corpus(spark, kind, n)
        stats: dict = {}
        t0 = time.perf_counter()
        if op == "pairs":
            thr = 0.7 if kind == "uniform" else 0.92
            rows = cosine_pairs(
                df, threshold=thr, mode="blocked", stats_out=stats
            ).count()
        else:
            rows = exact_nn_topk(
                df, k=2, mode="blocked", stats_out=stats
            ).count()
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "op": op,
                    "corpus": kind,
                    "n": n,
                    "seconds": round(dt, 2),
                    "rows": rows,
                    "candidates": stats.get("candidates"),
                    "total_pairs": stats.get("total_pairs"),
                }
            ),
            flush=True,
        )
        release(stats, d)

    spark.stop()


if __name__ == "__main__":
    main()
