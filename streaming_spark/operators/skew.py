"""Skew-handling operators.

AQE's skew-join splitting handles most cases (enabled in session.py);
salting is the explicit tool for aggregations and joins where one key
dominates — at 100 TB a single hot key can pin an executor for hours.

``salted_aggregate`` is semantics-neutral: phase 1 aggregates on
(key, salt) — spreading a hot key over ``salt_buckets`` reducers —
phase 2 merges the partials per key.  Works for any algebraic aggregate
expressed as (partial, merge) column pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partials: dict[str, Column],
    merges: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partials``: output-name → aggregate over the raw rows (phase 1,
    grouped by keys + salt).  ``merges``: output-name → aggregate over
    the phase-1 partial columns (phase 2, grouped by keys only).
    The salt is a deterministic hash of the full row content: rows land
    in the same (key, salt) group even under stage retry / partial
    recomputation (monotonically_increasing_id would not — it is
    nondeterministic across retries).
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(*df.columns), F.lit(salt_buckets)).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(name) for name, c in partials.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(name) for name, c in merges.items()]
    )
