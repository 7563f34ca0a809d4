"""Event-time window queries over the ``events`` fixture.

The reference has NO event-time semantics — "streaming" there means
pipelined chunk exchange (SURVEY.md §2.6).  These are the Structured
Streaming-shaped extensions; each is expressed so the SAME code runs in a
batch DataFrame (oracle-checkable here) and behind ``readStream`` (tested
in tests/test_streaming.py with watermarks).

All outputs use epoch seconds for window bounds — timezone-free and
identical across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streaming_spark.queries.registry import events_table, query


@query(
    "q_tumbling_window",
    oracle="""
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS win_start,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY win_start
    """,
)
def q_tumbling_window(spark, sf_dir):
    """Tumbling 1-hour event-time window aggregate.  Spark's window() is
    epoch-aligned, matching DuckDB's time_bucket."""
    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("win_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_sliding_window",
    oracle="""
    SELECT CAST(epoch(time_bucket(INTERVAL '30 minutes', ts)
                      - k.k * INTERVAL '30 minutes') AS BIGINT) AS win_start,
           count(*) AS n_events
    FROM events CROSS JOIN (VALUES (0), (1)) k(k)
    GROUP BY win_start
    """,
)
def q_sliding_window(spark, sf_dir):
    """Sliding window: 1 hour long, 30-minute slide — every event lands in
    exactly two windows."""
    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("win_start"), "n_events"
        )
    )


@query(
    "q_session_window",
    oracle="""
    WITH marks AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '10 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marks
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start,
           CAST(floor(epoch(max(ts) + INTERVAL '10 minutes')) AS BIGINT) AS sess_end,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q_session_window(spark, sf_dir):
    """Session windows with a 10-minute inactivity gap, per user.  The
    oracle is the classic gaps-and-islands formulation; Spark's
    session_window merges events where ts < previous session end
    (start of session + gap), i.e. a gap >= 10 min opens a new session."""
    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("sess_start"),
            F.unix_timestamp(F.col("w.end")).alias("sess_end"),
            "n_events",
        )
    )


@query(
    "q_dedup_events",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id FROM (
      SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def q_dedup_events(spark, sf_dir):
    """Keyed streaming-style dedup: keep the first event per
    (user, event_type) — the deterministic form of dropDuplicates
    (streaming twin: dropDuplicates + watermark)."""
    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event_id"))
    )


@query(
    "q_event_type_rollup",
    oracle="""
    SELECT event_type,
           CAST(epoch(time_bucket(INTERVAL '1 day', ts)) AS BIGINT) AS day_start,
           count(*) AS n,
           round(avg(value), 6) AS avg_value,
           round(max(value), 6) AS max_value
    FROM events GROUP BY event_type, day_start
    """,
)
def q_event_type_rollup(spark, sf_dir):
    """Hypertable-style daily rollup per event type — the
    continuous-aggregate pattern (time-bucketed groupBy; in streaming
    form this runs incrementally with a watermark)."""
    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy("event_type", F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
        .select(
            "event_type",
            F.unix_timestamp(F.col("w.start")).alias("day_start"),
            "n",
            "avg_value",
            "max_value",
        )
    )


@query(
    "q_user_activity_topk",
    oracle="""
    SELECT user_id, n_events, rank FROM (
      SELECT user_id, count(*) AS n_events,
             row_number() OVER (ORDER BY count(*) DESC, user_id) AS rank
      FROM events GROUP BY user_id) t
    WHERE rank <= 20
    """,
)
def q_user_activity_topk(spark, sf_dir):
    """Top-20 most active users — agg + distributed top-k."""
    ev = events_table(spark, sf_dir)
    agg = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.orderBy(F.col("n_events").desc(), F.col("user_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("user_id", "n_events", "rank")
    )


def _stage_stream_dir(
    sf_dir: str, n_files: int = 4, event_type: str | None = None
) -> str:
    """Re-materialize the events table as ``n_files`` part files (with
    ascending mtimes, so the file source discovers them in order) — the
    finite stand-in for an unbounded source; each file becomes one
    micro-batch.  ``event_type`` filters to a single type (for
    stream-stream joins where the two sides are different substreams)."""
    import os
    import tempfile
    import time as _time

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from streaming_spark.io import table_path

    stream_dir = tempfile.mkdtemp(prefix="spark_graft_stream_")
    table = pq.read_table(table_path(sf_dir, "events"))
    if event_type is not None:
        table = table.filter(pc.equal(table["event_type"], event_type))
    step = (table.num_rows + n_files - 1) // n_files
    base = int(_time.time()) - 1000
    for i in range(n_files):
        path = os.path.join(stream_dir, f"part-{i}.parquet")
        pq.write_table(table.slice(i * step, step), path)
        os.utime(path, (base + i, base + i))
    return stream_dir


def _run_to_memory_sink(df, sink_name: str, output_mode: str):
    """Execute a finite streaming query to a memory sink (availableNow)
    and return the final result table."""
    import tempfile

    q = (
        df.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode(output_mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="spark_graft_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(300)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"streaming query {sink_name} did not finish within 300s — "
            "refusing to return a partial memory-sink table"
        )
    return df.sparkSession.table(sink_name)


@query(
    "q_streaming_tumbling",
    oracle="""
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS win_start,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY win_start
    """,
)
def q_streaming_tumbling(spark, sf_dir):
    """A REAL Structured Streaming execution inside the correctness gate:
    the events table is re-materialized as four part files, consumed as a
    file-source stream (micro-batch per file), aggregated with window()
    in complete output mode into a memory sink, and the final result
    table is returned — it must equal the batch tumbling aggregation
    row-for-row (the streaming/batch unification guarantee)."""
    from streaming_spark.streaming import read_events_stream

    ev = read_events_stream(
        spark, _stage_stream_dir(sf_dir), max_files_per_trigger=1
    )
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("win_start"),
            "n_events",
            "sum_value",
        )
    )
    return _run_to_memory_sink(agg, "q_streaming_tumbling_sink", "complete")


@query(
    "q_streaming_sessionization",
    oracle="""
    WITH marks AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '10 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marks
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start,
           CAST(floor(epoch(max(ts) + INTERVAL '10 minutes')) AS BIGINT) AS sess_end,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q_streaming_sessionization(spark, sf_dir):
    """Sessionization executed AS A STREAM: per-user 10-minute-gap
    session windows over the file-source event stream, one micro-batch
    per file — sessions merge correctly ACROSS micro-batches (the state
    store carries open sessions between triggers).  The final table must
    equal the batch q_session_window / gaps-and-islands oracle
    row-for-row.

    Complete output mode is used because the fixture is finite and the
    gate compares the FINAL table (same decision as q_streaming_tumbling
    — with append mode the watermark never passes the last sessions).
    In unbounded production the same aggregation runs in append mode
    with ``sessionized_counts``'s watermark, where state is evicted as
    sessions close."""
    from streaming_spark.streaming import read_events_stream

    ev = read_events_stream(
        spark, _stage_stream_dir(sf_dir), max_files_per_trigger=1
    )
    agg = (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("sess_start"),
            F.unix_timestamp(F.col("w.end")).alias("sess_end"),
            "n_events",
        )
    )
    return _run_to_memory_sink(
        agg, "q_streaming_sessionization_sink", "complete"
    )


@query(
    "q_streaming_join",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS purchase_id,
           a.user_id AS user_id,
           CAST(floor((epoch_us(b.ts) - epoch_us(a.ts)) / 1000000.0)
                AS BIGINT) AS secs_to_purchase
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '30 minutes'
    """,
)
def q_streaming_join(spark, sf_dir):
    """Stream-stream interval join executed as a real streaming query:
    clicks and purchases arrive as two independent file-source streams
    (different micro-batch cadence), joined on user within a 30-minute
    attribution window via ``interval_join`` — watermarked on both sides
    so join state is EVICTABLE (the property that keeps this runnable on
    an unbounded 100 TB stream).  Inner-join output in append mode; the
    result must equal the batch interval join row-for-row."""
    from streaming_spark.streaming import interval_join, read_events_stream

    clicks = read_events_stream(
        spark, _stage_stream_dir(sf_dir, n_files=3, event_type="click")
    ).select("event_id", "ts", "user_id")
    purchases = read_events_stream(
        spark, _stage_stream_dir(sf_dir, n_files=2, event_type="purchase")
    ).select("event_id", "ts", "user_id")
    joined = interval_join(
        clicks,
        purchases,
        on="user_id",
        lower="0 seconds",
        upper="30 minutes",
        watermark="2 hours",
    ).select(
        F.col("event_id").alias("click_id"),
        F.col("event_id_r").alias("purchase_id"),
        "user_id",
        # whole seconds via µs arithmetic — unix_timestamp() TRUNCATES
        # each side separately, which disagrees with flooring the diff
        F.floor(
            (F.unix_micros("ts_r") - F.unix_micros("ts")) / F.lit(1_000_000.0)
        ).alias("secs_to_purchase"),
    )
    return _run_to_memory_sink(joined, "q_streaming_join_sink", "append")


@query(
    "q_streaming_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_streaming_dedup(spark, sf_dir):
    """Streaming deduplication: dropDuplicates state carried ACROSS
    micro-batches (one per staged file) — each (user, event_type) key is
    emitted exactly once over the whole stream, in append mode.  Only
    the key columns are emitted, so the result is deterministic whatever
    duplicate arrives first (the batch oracle is a plain DISTINCT).  In
    unbounded production the same plan runs as
    ``dropDuplicatesWithinWatermark`` to bound the key state."""
    from streaming_spark.streaming import read_events_stream

    ev = read_events_stream(
        spark, _stage_stream_dir(sf_dir), max_files_per_trigger=1
    )
    deduped = ev.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    return _run_to_memory_sink(deduped, "q_streaming_dedup_sink", "append")


@query(
    "q_streaming_sink_parquet",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def q_streaming_sink_parquet(spark, sf_dir):
    """Exactly-once streaming ETL into a parquet sink: each micro-batch
    lands via foreachBatch as an idempotent overwrite keyed by batch_id
    (rerun-safe — a retried batch replaces its own output, never
    duplicates it); the sink directory is then read back and aggregated.
    This is the streaming→lakehouse write path; with a transactional
    table format the same foreachBatch body becomes a MERGE."""
    import tempfile

    from streaming_spark.streaming import read_events_stream

    sink_dir = tempfile.mkdtemp(prefix="spark_graft_sink_") + "/t"
    ev = read_events_stream(
        spark, _stage_stream_dir(sf_dir), max_files_per_trigger=1
    )

    def land(batch_df, batch_id):
        # partition-by-batch overwrite: idempotent under Spark's batch
        # replay (same batch_id -> same directory replaced)
        (
            batch_df.withColumn("__batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch")
            .parquet(sink_dir)
        )

    q = (
        ev.writeStream.foreachBatch(land)
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="spark_graft_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("q_streaming_sink_parquet did not finish within 300s")
    landed = spark.read.parquet(sink_dir)
    return landed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
