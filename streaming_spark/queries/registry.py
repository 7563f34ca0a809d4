"""Registration plumbing + shared fixture helpers for query modules."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REGISTRY: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn):
        REGISTRY[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (schema-memoized parquet scan — io.py)."""
    from streaming_spark.io import _read_parquet, table_path

    return _read_parquet(spark, table_path(sf_dir, name))


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load ``events`` with its nanosecond ``ts`` converted to a proper
    timestamp (see io.load_table — the conversion lives in the public
    loader so every entry point sees the same schema)."""
    from streaming_spark.io import load_table

    return load_table(spark, sf_dir, "events")
