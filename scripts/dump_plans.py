"""Dump .explain("formatted") for bench queries to plans/<tag>/.

Usage: python scripts/dump_plans.py <tag> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each query (default: the
bench set).  Suffix comes from $PLAN_SUFFIX (default "before").
Building the DataFrame may run eager staging work (index builds,
driver-side trainers) but never executes the returned plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_spark import get_spark
from streaming_spark.queries import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def formatted_plan(df) -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        import bench  # noqa: PLC0415

        names = bench.BENCH_QUERIES
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-dump")
    for name in names:
        try:
            df = REGISTRY[name](spark, SF_DIR)
            plan = formatted_plan(df)
        except Exception as exc:  # noqa: BLE001 — record, keep dumping
            plan = f"ERROR building/explaining {name}: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
