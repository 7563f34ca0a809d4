"""As-of join — match each left row to the most recent right row at or
before its timestamp, per key.

The reference has no as-of join (SURVEY.md §2.6 explicit-absence list);
this is a north-star operator Spark also lacks natively.  The
implementation is the scalable union-and-carry-forward formulation:

1. tag both sides and union them on (key, time);
2. one window per key ordered by (time, side) carries the latest right
   row's payload forward (``last(..., ignoreNulls=True)``);
3. keep only left rows.

Cost: ONE shuffle of (|L|+|R|) rows keyed by the join key — versus the
naive range-join which is O(|L|·|R|) per key.  Skewed keys can be salted
upstream; AQE skew handling applies to the sort-exchange.  This is the
standard formulation used at 100 TB scale (it is how point-in-time joins
are done in feature stores).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DateType,
    DayTimeIntervalType,
    NumericType,
    StringType,
    StructType,
    TimestampNTZType,
    TimestampType,
    YearMonthIntervalType,
)
from pyspark.sql.window import Window

_ORDERABLE_LEAVES = (
    NumericType,
    StringType,
    BinaryType,
    BooleanType,
    DateType,
    TimestampType,
    TimestampNTZType,
    DayTimeIntervalType,
    YearMonthIntervalType,
)


def _orderable(dt) -> bool:
    """Whether Spark can sort values of this type — an ALLOWLIST of the
    known-orderable leaves plus struct/array recursion (and UDTs via
    their sql storage type, which is how Spark itself orders them), so
    anything unlisted (MAP, VARIANT, geospatial, future types)
    conservatively skips the tie-break sort key instead of failing the
    join's analysis with a not-orderable error."""
    from pyspark.sql.types import UserDefinedType

    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, UserDefinedType):
        return _orderable(dt.sqlType())
    return isinstance(dt, _ORDERABLE_LEAVES)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_time <= left_time`` sharing the join key(s).

    ``left_time``/``right_time`` must be mutually comparable (both numeric
    or both the same timestamp type).  Unmatched left rows keep NULLs.
    """
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = value_cols or [
        c for c in right.columns if c not in keys and c != right_time
    ]

    lhs = left.withColumn("__side", F.lit(1)).withColumn(
        "__t", F.col(left_time)
    )
    rhs_cols = [F.col(k) for k in keys] + [
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_time).alias(right_time + suffix),
            *[F.col(c).alias(c + suffix) for c in value_cols],
        ).alias("__payload"),
    ]
    rhs = right.select(*rhs_cols)

    lhs_aligned = lhs.select(
        *[F.col(c) for c in left.columns],
        F.col("__t"),
        F.col("__side"),
        F.lit(None).cast(rhs.schema["__payload"].dataType).alias("__payload"),
    )
    unioned = lhs_aligned.unionByName(rhs.select(*keys, "__t", "__side", "__payload"), allowMissingColumns=True)

    # right rows sort before left rows at equal time → "at or before".
    # __payload as the final sort key makes the pick among DUPLICATE
    # (key, time) right rows deterministic — without it, which tied row
    # `last` sees depends on the shuffle's arbitrary order within equal
    # sort keys.  Spark compares structs field-wise, so the winner is
    # the greatest (right_time, *value_cols) tuple — right_time ties by
    # construction, leaving the greatest value fields; left rows' NULL
    # payloads sort among themselves and are irrelevant (every right
    # row at the time still precedes every left row, and `last`
    # ignores nulls).  A payload carrying a non-ORDERABLE column (MAP,
    # anywhere it nests) cannot be a sort key — those inputs keep the
    # arbitrary-among-exact-ties pick rather than failing analysis.
    order_keys = [F.col("__t").asc(), F.col("__side").asc()]
    if _orderable(rhs.schema["__payload"].dataType):
        order_keys.append(F.col("__payload").asc())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1).select(
        *[c for c in left.columns],
        *[
            F.col("__match").getField(right_time + suffix).alias(right_time + suffix),
            *[
                F.col("__match").getField(c + suffix).alias(c + suffix)
                for c in value_cols
            ],
        ],
    )
    return out
