"""Query registry — every implemented operator from SURVEY.md §2 is
registered here as a ``(spark, sf_dir) -> DataFrame`` callable, with a
DuckDB oracle SQL string where the semantics are SQL-expressible.

``__spark_entry__.py`` re-exports :data:`REGISTRY` / :data:`ORACLES`.
"""

from streaming_spark.queries.registry import REGISTRY, ORACLES, query

# Import for side effect: each module registers its queries.
from streaming_spark.queries import relational  # noqa: F401
from streaming_spark.queries import joins  # noqa: F401
from streaming_spark.queries import analytics  # noqa: F401
from streaming_spark.queries import streamops  # noqa: F401
from streaming_spark.queries import windows  # noqa: F401
from streaming_spark.queries import northstar  # noqa: F401
from streaming_spark.queries import extras  # noqa: F401
from streaming_spark.queries import curation  # noqa: F401

__all__ = ["REGISTRY", "ORACLES", "query"]
