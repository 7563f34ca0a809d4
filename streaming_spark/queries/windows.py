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
    import os
    import tempfile
    import time as _time

    import pyarrow.parquet as pq

    from streaming_spark.io import table_path

    stream_dir = tempfile.mkdtemp(prefix="spark_graft_stream_")
    table = pq.read_table(table_path(sf_dir, "events"))
    step = (table.num_rows + 3) // 4
    base = int(_time.time()) - 1000
    for i in range(4):
        path = os.path.join(stream_dir, f"part-{i}.parquet")
        pq.write_table(table.slice(i * step, step), path)
        os.utime(path, (base + i, base + i))

    from streaming_spark.streaming import read_events_stream

    ev = read_events_stream(spark, stream_dir, max_files_per_trigger=1)
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
    sink_name = "q_streaming_tumbling_sink"
    ckpt = tempfile.mkdtemp(prefix="spark_graft_ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink_name)
