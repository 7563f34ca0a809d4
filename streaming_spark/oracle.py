"""Local replica of the driver's correctness gate: run each registered
query on Spark AND its oracle SQL on DuckDB over the same parquet tables,
then compare row count, schema shape, and order-insensitive values.

Used by tests/test_queries_oracle.py so oracle drift is caught locally
before the driver's CORRECTNESS_r{N}.json run.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from streaming_spark.io import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and fold tiny fp noise the same way a value-hash
        # after rounding would
        return round(v, 9) + 0.0
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    if type(v).__module__ == "numpy":  # numpy scalar → python scalar
        return _norm_cell(v.item())
    return v


def normalized_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort(key=repr)
    return out


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty ⇒ match)."""
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    # dtype-kind drift (e.g. DuckDB promoting integer sums to HUGEINT →
    # float64 in pandas) breaks exact-schema/hash comparisons downstream
    kind_of = {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "ts"}
    for col in s_cols:
        ks = kind_of.get(spark_pdf[col].dtype.kind, "obj")
        ko = kind_of.get(oracle_pdf[col].dtype.kind, "obj")
        if ks != ko and len(spark_pdf) and len(oracle_pdf):
            problems.append(
                f"dtype kind for {col}: spark={spark_pdf[col].dtype} "
                f"oracle={oracle_pdf[col].dtype}"
            )
    s_rows = normalized_rows(spark_pdf)
    o_rows = normalized_rows(oracle_pdf)
    if s_rows != o_rows:
        diff_at = next(
            (i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b), None
        )
        problems.append(
            f"values differ; first diff at sorted row {diff_at}: "
            f"spark={s_rows[diff_at] if diff_at is not None else None} "
            f"oracle={o_rows[diff_at] if diff_at is not None else None}"
        )
    return problems
