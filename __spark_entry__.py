"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in ``streaming_spark/``; this module only adapts its
query registry (streaming_spark/queries) to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streaming_spark.queries import ORACLES, REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the core stream() operator — chunk-count total over
    sf0.001 lineitem (the reference's canonical first example,
    py_pkg/examples/0-iquery.txt).  This is the oracle-checked twin of
    q_chunk_count (whose per-partition rows are partition-dependent by
    design and therefore rows-only in the gate — VERDICT r2 item 2 moved
    the flagship to the driver-green variant; q_chunk_count itself stays
    registered as the protocol demo)."""
    return REGISTRY["q_chunk_count_total"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(REGISTRY)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(ORACLES)
