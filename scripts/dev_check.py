"""Dev loop: run registered queries against their DuckDB oracles at a
small scale factor and report mismatches.  Usage:

    python scripts/dev_check.py [sf_dir] [query ...]
    python scripts/dev_check.py [sf_dir] --sample N --seed R

``--sample N --seed R`` replays a deterministic random N-slug sample of
the registry — the same shape as the driver's rotating 50-row
correctness gate, so any seed exercises a plausible future driver
sample (VERDICT r5 item 6: insurance against the queries the driver
hasn't sampled yet).
"""

from __future__ import annotations

import random
import sys
import time
import traceback

from streaming_spark import get_spark
from streaming_spark.oracle import compare, duckdb_connection
from streaming_spark.queries import ORACLES, REGISTRY


def sample_names(n: int, seed: int) -> list[str]:
    """Deterministic n-slug sample of the registry (sorted before
    sampling so the draw is stable across dict-order changes)."""
    rng = random.Random(seed)
    pool = sorted(REGISTRY)
    return rng.sample(pool, min(n, len(pool)))


def run(names: list[str], sf_dir: str, spark=None) -> list[str]:
    """Run ``names`` against their oracles; return the failed slugs."""
    owns_spark = spark is None
    if owns_spark:
        spark = get_spark(cpus=16, shuffle_partitions=16)
    con = duckdb_connection(sf_dir)
    failed = []
    for name in names:
        fn = REGISTRY[name]
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark raised")
            traceback.print_exc()
            failed.append(name)
            continue
        if name not in ORACLES:
            print(f"ok?   {name}: rows={len(spark_pdf)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            oracle_pdf = con.execute(ORACLES[name]).fetchdf()
        except Exception:
            print(f"FAIL  {name}: oracle SQL raised")
            traceback.print_exc()
            failed.append(name)
            continue
        problems = compare(spark_pdf, oracle_pdf)
        if problems:
            print(f"FAIL  {name}: {problems} [{time.time()-t0:.1f}s]")
            failed.append(name)
        else:
            print(f"PASS  {name}: rows={len(spark_pdf)} [{time.time()-t0:.1f}s]")
    print(f"\n{len(names)-len(failed)}/{len(names)} ok; failed: {failed}")
    if owns_spark:
        spark.stop()
    return failed


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sample_n = None
    seed = 0
    if "--sample" in args:
        i = args.index("--sample")
        sample_n = int(args[i + 1])
        del args[i : i + 2]
    if "--seed" in args:
        i = args.index("--seed")
        seed = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    explicit = [a for a in args if "/" not in a]
    if sample_n is not None:
        if explicit:
            # refuse the ambiguous combination rather than silently
            # dropping the named queries (code review r6)
            print(
                "error: --sample cannot be combined with explicit query "
                f"names ({explicit}); run them separately",
                file=sys.stderr,
            )
            return 2
        names = sample_names(sample_n, seed)
        print(f"sampled {len(names)} of {len(REGISTRY)} (seed={seed})")
    else:
        names = explicit or list(REGISTRY)
    failed = run(names, sf_dir)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
