"""Dev loop: run registered queries against their DuckDB oracles at a
small scale factor and report mismatches.  Usage:

    python scripts/dev_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

from streaming_spark import get_spark
from streaming_spark.oracle import compare, duckdb_connection
from streaming_spark.queries import ORACLES, REGISTRY


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a] or list(REGISTRY)
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
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
