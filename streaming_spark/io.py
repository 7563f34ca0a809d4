"""Fixture loaders for the driver's parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet per table under
/root/testdata/sf{0.001,0.01,0.1}/.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# footer-schema memo, keyed by (path, mtime, size): spark.read.parquet
# runs schema inference per CALL (~120 ms of driver/py4j work on this
# box — measured 5-6x the cost of a schema-supplied read), and query
# builders load the same immutable fixture tables on every invocation.
# Caching only the SCHEMA (metadata, never rows) and re-issuing the
# scan with .schema(...) keeps every execution reading the parquet from
# disk while skipping the repeated inference; it is also the deployment
# idiom — production readers declare schemas rather than sample
# footers.  The mtime/size key invalidates the memo when a file at a
# cached path is rewritten with a different schema (reused tmp dirs,
# regenerated fixtures — ADVICE r14); the os.stat is ~µs against the
# ~120 ms it saves.  Distinct scale factors never collide (distinct
# paths), and tests can drop entries via ``_SCHEMA_CACHE.clear()``.
_SCHEMA_CACHE: dict = {}


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        # directory-style parquet (or racing writer): stat the dir's
        # own entry; fall back to path-only keying if even that fails
        key = (path, None, None)
    sch = _SCHEMA_CACHE.get(key)
    if sch is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan — columnar, splittable, predicate-pushdown friendly.

    The reference's only bulk sources are delimited text
    (aio_input/input, SURVEY.md section 2.3); parquet is the scale-correct
    upgrade and the driver's fixture format.

    ``events`` stores TIMESTAMP(NANOS), which Spark's parquet reader
    rejects; it is read via ``nanosAsLong`` and converted to a
    microsecond timestamp so every caller sees a proper ``ts``.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events_ts(_read_parquet(spark, table_path(sf_dir, name)))
    return _read_parquet(spark, table_path(sf_dir, name))


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize a raw events frame's ``ts`` to a microsecond timestamp.

    Spark <= 4.0 honors ``spark.sql.legacy.parquet.nanosAsLong`` (ts
    arrives as bigint nanos, needs the explicit conversion); Spark >= 4.1
    reads TIMESTAMP(NANOS) natively as TIMESTAMP_NTZ truncated to µs.
    NTZ must then be cast to TIMESTAMP: ``withWatermark`` rejects NTZ
    event-time columns (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), and the
    session timezone is pinned to UTC (session.py) so the cast is
    value-preserving — wall-clock fields and epoch both unchanged.
    Every reader of the events fixture (batch, streaming, tests) must go
    through this guard — an unconditional ``ts / 1000`` breaks on one
    version or the other."""
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long"))
        )
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def load_table_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro twin of the parquet loaders (the warehouse interchange
    format Kafka-ecosystem pipelines hand off): same frame out, so every
    downstream operator is source-agnostic and swapping formats is THIS
    function and nothing else.  Spark ships Avro as an EXTERNAL module
    (a JAR deployment choice, not a code change — same contract as
    streaming/core.py read_events_kafka); absent here, this raises a
    clear error instead of Spark's generic source-not-found."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:
        # Only the MODULE-ABSENT failure is reclassified; with
        # spark-avro installed, a corrupt/unreadable file (whose error
        # text typically also mentions 'avro') must surface as-is
        # (ADVICE r5).  Spark raises error class DATA_SOURCE_NOT_FOUND
        # ("Failed to find the data source: avro") when the module is
        # missing.
        msg = str(exc)
        if not (
            "DATA_SOURCE_NOT_FOUND" in msg
            or "Failed to find the data source" in msg
            or "Failed to find data source" in msg
        ):
            raise
        raise NotImplementedError(
            "load_table_avro requires the spark-avro module on the "
            "classpath (deploy with --packages org.apache.spark:"
            "spark-avro_2.13:<spark-version>); not installed in this "
            "environment — use the parquet/csv/jsonl/orc loaders here"
        ) from exc
