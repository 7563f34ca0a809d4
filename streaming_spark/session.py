"""SparkSession factory with engine defaults.

Tuned for local[N] testing but with settings that carry to a large
cluster: AQE on (runtime re-planning, skew-join handling), Arrow
exchange on (the engine's core operator is Arrow-batch streaming, the
Spark analog of the reference's per-chunk columnar exchange —
reference FeatherInterface.cpp:254-355), UTC session timezone for
deterministic timestamp semantics across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size is the analog of the reference's chunk_size: keyword
# (reference StreamSettings.h:272 — default 1 GiB of values). 64k rows per
# batch keeps per-batch memory bounded while amortizing Arrow framing.
DEFAULT_ARROW_BATCH = 65536


def get_spark(
    app_name: str = "streaming-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS, then ``*``.  Shuffle
    partitions default to 32 (matched to local core count; on a real
    cluster this should scale with executor count — AQE coalesces the
    excess at runtime).
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    shuffle = int(shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE", 32))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(DEFAULT_ARROW_BATCH),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    return builder.getOrCreate()
