"""Scaling measurement for the TEXT near-duplicate families —
MinHash-LSH pairs, SimHash pairs, and the components step that turns
pairs into dedup groups — at N = 10k .. 1M documents, complementing
scripts/stress_blocked.py's embedding-space tables.

Corpus: deterministic hash-generated documents (~60 words from a
10k-word vocabulary), with every fifth document a PLANTED near-copy of
its predecessor (each position mutates independently with p = 1/20, so
~3 of 60 words differ — Jaccard over 9-char shingles ≈ 0.75-0.9).
Every value is a pure function of doc_id (splitmix64 mixing), so the
corpus is identical across partitionings, runs, and task retries.
Expected structure per N: N/5 planted pairs, each its own 2-clique.

Reported per (op, N): wall seconds, result rows, planted-pair RECALL
(the fraction of (d-1, d) pairs recovered — the correctness-at-scale
number; MinHash should sit near 1.0 at threshold 0.5, SimHash lower
because 6 differing words can flip > 3 signature bits), and for
components the group count.

Scale notes the sweep exposes (document next to the table in ROADMAP):

- MinHash-LSH candidate volume stays ~linear in N here: unique docs
  hash to singleton buckets, so pairs come only from planted dups plus
  band-collision noise.  Wall time tracks the signature map (O(N·len·
  num_perm), embarrassingly parallel) + one banded shuffle.
- SimHash's fixed 4x16-bit banding has an N²/2^16 candidate FLOOR on
  random docs (expected bucket size N/65536 per band): negligible at
  200k (~3/bucket), material at 1M (~15/bucket, ~30M candidate pairs
  before Hamming verify).  Wider/more bands are the standard remedy at
  larger N; the floor is a property of the published 4-band scheme,
  not of this implementation.

Usage:
    PYTHONPATH=/root/repo python scripts/stress_dedup.py [max_n]
    PYTHONPATH=/root/repo python scripts/stress_dedup.py maint [max_n]

``maint`` runs the INDEX-MAINTENANCE arm (operators/neardup_index.py):
at each N it builds the staged near-dup index once, appends a fixed
10k-doc delta, and times the append against the accumulated re-join
(``minhash_dedup_pairs`` over base ∪ delta — the cost every ingest
batch pays WITHOUT the index), asserting the maintained pair set is
EXACTLY the batch arm's.  The claim under measurement: append cost is
DELTA-bound (flat in N) while the re-join is N-bound; plus takedown +
compact cost points (the dedup analog of stress_ann's maintenance arm).
"""

from __future__ import annotations

import json
import shutil
import sys
import time

import numpy as np
import pandas as pd

from streaming_spark import get_spark, scratch

VOCAB = 10_000
WORDS = 60
MUT_DENOM = 20  # per-position mutation probability 1/20 for planted dups
_WORDS_TAB = [f"w{i}" for i in range(VOCAB)]


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — wrapping uint64 arithmetic."""
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _gen_texts(ids: np.ndarray) -> list[str]:
    """Texts for a batch of doc ids — pure function of doc_id."""
    ids = ids.astype(np.uint64)
    is_dup = (ids % np.uint64(5)) == np.uint64(4)
    base = np.where(is_dup, ids - np.uint64(1), ids)
    pos = np.arange(WORDS, dtype=np.uint64)
    with np.errstate(over="ignore"):
        w = _mix64(base[:, None] * np.uint64(0x9E3779B97F4A7C15) + pos[None, :])
        mut = _mix64(
            ids[:, None] * np.uint64(0xD6E8FEB86659FD93) + pos[None, :]
        )
        alt = _mix64(
            ids[:, None] * np.uint64(0xA24BAED4963EE407) + pos[None, :]
        )
    w = w % np.uint64(VOCAB)
    take_alt = is_dup[:, None] & ((mut % np.uint64(MUT_DENOM)) == np.uint64(0))
    w = np.where(take_alt, alt % np.uint64(VOCAB), w).astype(np.int64)
    tab = _WORDS_TAB
    return [" ".join(tab[i] for i in row) for row in w]


def stage_corpus(spark, n: int) -> tuple[str, "object"]:
    d = scratch.scratch_dir(f"stress_dedup_{n}", pin=True)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame({"doc_id": ids, "text": _gen_texts(ids)})

    (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "doc_id BIGINT, text STRING")
        .write.parquet(d + "/t")
    )
    return d, spark.read.parquet(d + "/t")


def _recall(pairs, n: int) -> float:
    """Fraction of the N/5 planted (d-1, d) pairs present in ``pairs``."""
    from pyspark.sql import functions as F

    planted = n // 5
    if planted == 0:
        return 1.0
    hit = pairs.filter(
        (F.col("id_b") == F.col("id_a") + 1) & (F.col("id_a") % 5 == 3)
    ).count()
    return round(hit / planted, 4)


def release(*dirs: str) -> None:
    for p in dirs:
        scratch.unpin(p)
        shutil.rmtree(p, ignore_errors=True)


def _maint_main(
    max_n: int, n_band_prefixes: int = 16, n_id_buckets: int = 16
) -> None:
    """Index-maintenance sweep: build once, append a 10k delta, compare
    against the accumulated re-join, then a 100-doc trickle append,
    then take down 100 docs and compact.  One JSON line per
    measurement.  The partition-granularity knobs are argv-settable;
    the 100k comparison they enabled (idle box) is a NEGATIVE result
    worth keeping: 256 prefixes × 64 id-buckets ran 3-4× slower than
    16 × 16 on every move (build 18 vs 13 s, append_10k 44 vs 12,
    append_100 31 vs 11, compact 19 vs 8) — 4096 tiny band files cost
    more in listing/write overhead than their pruning saves at this
    corpus size, and a 100-doc trickle append costs about the same as a
    10k one either way (job + digest-scan overhead dominates the delta
    axis).  Partition count is a data-volume knob (~128 MB/partition),
    not a delta-size knob."""
    import numpy as np
    from pyspark.sql import functions as F

    from streaming_spark.operators.dedup import minhash_dedup_pairs
    from streaming_spark.operators.neardup_index import (
        neardup_index_append,
        neardup_index_build,
        neardup_index_compact,
        neardup_index_pairs,
        neardup_index_tombstone,
    )

    DELTA = 10_000
    spark = get_spark(app_name="stress-dedup-maint")
    warm_dir, warm = stage_corpus(spark, 1_000)
    minhash_dedup_pairs(warm, "text", "doc_id").count()
    release(warm_dir)

    SMALL = 100  # trickle-ingest point: the delta axis of append cost
    for n in (100_000, 500_000, 1_000_000):
        if n > max_n:
            break
        d, df = stage_corpus(spark, n + DELTA + SMALL)
        base = df.filter(F.col("doc_id") < n)
        delta = df.filter(
            (F.col("doc_id") >= n) & (F.col("doc_id") < n + DELTA)
        )
        small = df.filter(F.col("doc_id") >= n + DELTA)
        idx = scratch.scratch_dir(f"ndmaint_{n}", pin=True) + "/idx"

        t0 = time.perf_counter()
        st: dict = {}
        neardup_index_build(
            idx, base, n_id_buckets=n_id_buckets,
            n_band_prefixes=n_band_prefixes, stats_out=st,
        )
        print(json.dumps({
            "op": "neardup_build", "n": n,
            "n_band_prefixes": n_band_prefixes,
            "n_id_buckets": n_id_buckets,
            "seconds": round(time.perf_counter() - t0, 2),
            "pairs": st["new_pairs"],
        }), flush=True)

        t0 = time.perf_counter()
        st = {}
        neardup_index_append(idx, delta, stats_out=st)
        append_s = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        batch = minhash_dedup_pairs(
            df.filter(F.col("doc_id") < n + DELTA),
            "text", "doc_id", threshold=0.5,
        )
        batch_rows = batch.count()
        rejoin_s = round(time.perf_counter() - t0, 2)

        live = neardup_index_pairs(spark, idx)
        extra = live.subtract(batch).count()
        missing = batch.subtract(live).count()
        print(json.dumps({
            "op": "neardup_append_10k", "n": n, "seconds": append_s,
            "new_pairs": st["new_pairs"],
            "crossed_buckets": st["crossed_buckets"],
            "retracted_pairs": st["retracted_pairs"],
            "accumulated_rejoin_seconds": rejoin_s,
            "batch_rows": batch_rows,
            "pair_set_exactly_equal": extra == 0 and missing == 0,
        }), flush=True)

        # the delta axis: a 100-doc trickle append into the same index —
        # probe, candidates and verify all shrink with the delta (the
        # re-join alternative would still pay the full O(N) re-hash)
        t0 = time.perf_counter()
        st = {}
        neardup_index_append(idx, small, stats_out=st)
        print(json.dumps({
            "op": "neardup_append_100", "n": n,
            "seconds": round(time.perf_counter() - t0, 2),
            "new_pairs": st["new_pairs"],
            "buckets_touched": st["buckets_touched"],
        }), flush=True)

        # takedown + compact cost (fixed 100 victims → footprint-bound)
        rng = np.random.default_rng(n)
        victims = [int(v) for v in rng.choice(n, size=100, replace=False)]
        t0 = time.perf_counter()
        st = {}
        neardup_index_tombstone(spark, idx, victims, stats_out=st)
        tomb_s = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        cstats = neardup_index_compact(spark, idx)
        print(json.dumps({
            "op": "neardup_takedown_compact", "n": n,
            "tombstone_seconds": tomb_s,
            "compact_seconds": round(time.perf_counter() - t0, 2),
            "readmitted_pairs": st["readmitted_pairs"],
            "sig_parts_rewritten": cstats["sig_parts_rewritten"],
            "band_parts_rewritten": cstats["band_parts_rewritten"],
            "rows_removed": cstats["sig_rows_removed"],
        }), flush=True)

        release(d)
        scratch.unpin(idx.rsplit("/", 1)[0])
        shutil.rmtree(idx.rsplit("/", 1)[0], ignore_errors=True)
    spark.stop()


def main() -> None:
    from streaming_spark.operators.dedup import (
        connected_components,
        minhash_dedup_pairs,
        simhash_dedup_pairs,
    )

    args = sys.argv[1:]
    if args and args[0] == "maint":
        _maint_main(
            int(args[1]) if len(args) > 1 else 1_000_000,
            int(args[2]) if len(args) > 2 else 16,
            int(args[3]) if len(args) > 3 else 16,
        )
        return
    max_n = int(args[0]) if args else 1_000_000
    spark = get_spark(app_name="stress-dedup")

    # warm the Arrow worker pool + JVM before timing (CLAUDE.md)
    warm_dir, warm = stage_corpus(spark, 1_000)
    minhash_dedup_pairs(warm, "text", "doc_id").count()
    simhash_dedup_pairs(warm, "text", "doc_id").count()
    release(warm_dir)

    for n in (10_000, 50_000, 200_000, 500_000, 1_000_000):
        if n > max_n:
            break
        d, df = stage_corpus(spark, n)

        t0 = time.perf_counter()
        mh = minhash_dedup_pairs(df, "text", "doc_id", threshold=0.5)
        mh_rows = mh.count()
        mh_dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "op": "minhash_lsh",
                    "n": n,
                    "seconds": round(mh_dt, 2),
                    "rows": mh_rows,
                    "recall_planted": _recall(mh, n),
                }
            ),
            flush=True,
        )

        # components over the just-found pairs (localCheckpointed by
        # minhash_dedup_pairs, so this times ONLY the components step)
        t0 = time.perf_counter()
        comp = connected_components(mh)
        n_comp = comp.select("component").distinct().count()
        print(
            json.dumps(
                {
                    "op": "components",
                    "n": n,
                    "seconds": round(time.perf_counter() - t0, 2),
                    "rows": n_comp,
                }
            ),
            flush=True,
        )

        # at the sweep's largest point, also time the ITERATIVE arm on
        # the same edges — the path that runs when edges exceed the
        # driver contract (>1M); results must agree with the driver arm
        if n >= max_n or n == 1_000_000:
            t0 = time.perf_counter()
            n_comp_it = (
                connected_components(mh, mode="iterative")
                .select("component")
                .distinct()
                .count()
            )
            print(
                json.dumps(
                    {
                        "op": "components_iterative",
                        "n": n,
                        "seconds": round(time.perf_counter() - t0, 2),
                        "rows": n_comp_it,
                        "agrees_with_driver_arm": n_comp_it == n_comp,
                    }
                ),
                flush=True,
            )

        t0 = time.perf_counter()
        sh = simhash_dedup_pairs(df, "text", "doc_id", max_hamming=3)
        sh_rows = sh.count()
        sh_dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "op": "simhash",
                    "n": n,
                    "seconds": round(sh_dt, 2),
                    "rows": sh_rows,
                    "recall_planted": _recall(sh, n),
                }
            ),
            flush=True,
        )

        release(d)

    spark.stop()


if __name__ == "__main__":
    main()
