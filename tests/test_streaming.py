"""Structured Streaming integration tests: file-source micro-batches,
watermarked windows, stateful rolling mean, foreachBatch chunk host.

Streaming results are compared against the equivalent batch computation
over the same data — the strongest available oracle for unbounded
operators.
"""

import os
import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from streaming_spark.io import normalize_events_ts
from streaming_spark.streaming import (
    foreach_batch_stream,
    read_events_stream,
    stateful_rolling_mean,
    windowed_counts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """Split the events fixture into several part files so the file
    source produces multiple micro-batches."""
    src = os.path.join(SF_SMOKE, "events.parquet")
    out = str(tmp_path_factory.mktemp("events_stream"))
    import pyarrow.parquet as pq

    table = pq.read_table(src)
    n = table.num_rows
    step = (n + 3) // 4
    base = int(__import__("time").time()) - 1000
    for i in range(4):
        path = os.path.join(out, f"part-{i}.parquet")
        pq.write_table(table.slice(i * step, step), path)
        # the file source orders micro-batches by modification time; the
        # stateful-rolling contract is in-order arrival (the reference's
        # chunk order), so make the order deterministic
        os.utime(path, (base + i, base + i))
    return out


def _run_available_now(writer, tmpdir):
    q = (
        writer.option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_counts_match_batch(spark, events_dir):
    stream_ev = read_events_stream(spark, events_dir)
    agg = windowed_counts(stream_ev, window="1 hour", watermark="10 minutes")
    with tempfile.TemporaryDirectory() as tmp:
        out_dir = os.path.join(tmp, "out")
        writer = agg.writeStream.format("parquet").option("path", out_dir).outputMode("append")
        _run_available_now(writer, tmp)
        got = spark.read.parquet(out_dir).toPandas()

    # batch oracle over the same files
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = (
        normalize_events_ts(spark.read.parquet(events_dir))
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("win_start"), "n_events", "sum_value"
        )
        .toPandas()
    )
    # append mode emits only windows sealed by the watermark; every
    # emitted window must exactly match the batch result for that window
    got_map = {r.win_start: (r.n_events, r.sum_value) for r in got.itertuples()}
    batch_map = {r.win_start: (r.n_events, r.sum_value) for r in batch.itertuples()}
    assert len(got_map) > 0
    for ws, vals in got_map.items():
        assert batch_map[ws] == vals
    # availableNow over ordered files: all but the tail windows seal
    assert len(got_map) >= len(batch_map) - 3


def test_stateful_rolling_mean_stream(spark, events_dir):
    stream_ev = read_events_stream(spark, events_dir)
    rolled = stateful_rolling_mean(stream_ev, width=3)
    with tempfile.TemporaryDirectory() as tmp:
        out_dir = os.path.join(tmp, "out")
        writer = (
            rolled.writeStream.format("parquet").option("path", out_dir).outputMode("append")
        )
        _run_available_now(writer, tmp)
        got = spark.read.parquet(out_dir).toPandas()

    assert len(got) > 0
    # oracle: batch rolling mean via window functions over the same data
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    batch = (
        spark.read.parquet(events_dir)
        .withColumn("rolling_mean", F.avg("value").over(w))
        .select("user_id", "event_id", "rolling_mean")
        .toPandas()
    )
    got_map = dict(zip(got["event_id"], got["rolling_mean"]))
    batch_map = dict(zip(batch["event_id"], batch["rolling_mean"]))
    assert len(got_map) == len(batch_map)
    mismatches = [
        e
        for e in got_map
        if abs(got_map[e] - batch_map[e]) > 1e-9
    ]
    assert not mismatches, f"{len(mismatches)} mismatching rolling means"


def test_foreach_batch_chunk_host(spark, events_dir):
    """The stream() operator hosted per micro-batch: per-chunk counts
    accumulate to the total event count."""
    stream_ev = read_events_stream(spark, events_dir)
    results = []

    def sink(df, batch_id):
        results.append(df.agg(F.sum("n").alias("s")).collect()[0].s or 0)

    writer = foreach_batch_stream(
        stream_ev,
        lambda pdf: pd.DataFrame({"n": [len(pdf)]}),
        "n BIGINT",
        sink,
    )
    with tempfile.TemporaryDirectory() as tmp:
        q = (
            writer.option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    total = sum(results)
    expected = spark.read.parquet(events_dir).count()
    assert total == expected
    assert len(results) >= 2  # multiple micro-batches actually happened


def test_interval_join_stream_matches_batch(spark, events_dir):
    """Stream-stream interval join: clicks joined to purchases within the
    attribution window, two independent streams — append-mode output must
    equal the identical batch interval join (inner matches emit as both
    sides arrive; nothing waits on the watermark)."""
    from streaming_spark.streaming import interval_join

    def side(event_type):
        return read_events_stream(spark, events_dir).filter(
            F.col("event_type") == event_type
        ).select("event_id", "ts", "user_id")

    joined = interval_join(
        side("click"), side("purchase"), on="user_id", upper="30 minutes"
    ).select(
        F.col("event_id").alias("a_id"), F.col("event_id_r").alias("b_id")
    )
    with tempfile.TemporaryDirectory() as tmp:
        out_dir = os.path.join(tmp, "out")
        writer = (
            joined.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
        )
        _run_available_now(writer, tmp)
        got = {(r.a_id, r.b_id) for r in spark.read.parquet(out_dir).collect()}

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = normalize_events_ts(spark.read.parquet(events_dir))
    a = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts"), "user_id"
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts"),
        F.col("user_id").alias("b_user"),
    )
    want = {
        (r.a_id, r.b_id)
        for r in a.join(
            b,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 30 minutes")),
        ).collect()
    }
    assert got == want
    assert len(want) > 0


def test_transform_with_state_running_totals(spark, events_dir):
    """transformWithStateInPandas: per-key ValueState accumulates across
    micro-batches; final running sums equal the batch per-key sums.

    Skipped where protobuf is unavailable (the state server's wire
    dependency, not installable in this container); the operator then
    raises NotImplementedError with the fallback named."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState needs protobuf (absent in container)",
    )
    from streaming_spark.streaming.core import running_totals_tws

    stream_ev = read_events_stream(spark, events_dir)
    totals = running_totals_tws(stream_ev)
    with tempfile.TemporaryDirectory() as tmp:
        out_dir = os.path.join(tmp, "out")
        writer = (
            totals.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
        )
        q = (
            writer.option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.read.parquet(out_dir).toPandas()

    # one output row per (key, micro-batch it appeared in); the LAST
    # running_sum per key must equal the batch total
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.sum("value").alias("total"))
        .toPandas()
    )
    import numpy as np

    # rows arrive in batch order; take the max running_sum (monotone)
    last = got.groupby("user_id")["running_sum"].max()
    want = dict(zip(batch["user_id"], batch["total"]))
    assert set(last.index) == set(want)
    for uid, total in want.items():
        assert abs(last[uid] - total) < 1e-6, uid
    # events were split across multiple batches → some key has >1 row
    assert (got.groupby("user_id").size() > 1).any()


def test_transform_with_state_gated_without_protobuf(spark):
    try:
        import google.protobuf  # noqa: F401
        pytest.skip("protobuf present; gate not applicable")
    except ImportError:
        pass
    from streaming_spark.streaming.core import running_totals_tws

    ev = spark.createDataFrame([(1, 1.0)], "user_id BIGINT, value DOUBLE")
    with pytest.raises(NotImplementedError, match="protobuf"):
        running_totals_tws(ev)


def test_events_ts_is_watermark_compatible(spark, events_dir):
    """Contract pin: load_table / read_events_stream must yield a ts
    column of plain TIMESTAMP (not timestamp_ntz, not bigint) — Spark
    rejects withWatermark on NTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).
    A Spark version bump that changes how TIMESTAMP(NANOS) parquet
    arrives should fail HERE, in one second, not in the streaming gate
    (VERDICT r4 item 2)."""
    from streaming_spark.io import load_table

    batch = load_table(spark, SF_SMOKE, "events")
    assert dict(batch.dtypes)["ts"] == "timestamp"

    stream_ev = read_events_stream(spark, events_dir)
    assert dict(stream_ev.dtypes)["ts"] == "timestamp"
    # must not raise EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    stream_ev.withWatermark("ts", "1 hour")


def test_streaming_funnel_state_carries_across_batches(spark, events_dir):
    """The funnel state must genuinely span micro-batches: users emit
    one row per batch they appear in (several batches → several rows),
    the cumulative n_seen is strictly increasing, and stage timestamps
    never regress (monotone state)."""
    import os
    import tempfile

    from streaming_spark.streaming import read_events_stream
    from streaming_spark.streaming.core import stateful_funnel_stages

    stream_ev = read_events_stream(spark, events_dir)
    staged = stateful_funnel_stages(stream_ev)
    with tempfile.TemporaryDirectory() as tmp:
        q = (
            staged.writeStream.format("memory")
            .queryName("funnel_carry_sink")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.table("funnel_carry_sink").toPandas()

    multi = got.groupby("user_id").size()
    assert (multi > 1).any()  # state crossed at least one batch boundary
    for _, g in got.groupby("user_id"):
        g = g.sort_values("n_seen")
        assert g["n_seen"].is_monotonic_increasing
        for col in ("t1_us", "t2_us", "t3_us"):
            vals = g[col].dropna()
            # once set, a stage timestamp never changes
            assert vals.nunique() <= 1


def test_normalize_events_ts_all_encodings(spark):
    """normalize_events_ts must map every encoding the fixture can
    arrive in — bigint nanos (Spark <= 4.0 nanosAsLong), timestamp_ntz
    (Spark >= 4.1 native), plain timestamp (already normalized) — to
    the same watermark-compatible timestamp values."""
    import datetime

    from pyspark.sql import functions as F

    from streaming_spark.io import normalize_events_ts

    want = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)
    nanos = int(want.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000) * 1000

    as_bigint = spark.createDataFrame([(nanos,)], "ts BIGINT")
    as_ntz = spark.createDataFrame([(want,)], "ts TIMESTAMP_NTZ")
    as_ts = spark.createDataFrame([(want,)], "ts TIMESTAMP")
    got = set()
    for df in (as_bigint, as_ntz, as_ts):
        out = normalize_events_ts(df)
        assert dict(out.dtypes)["ts"] == "timestamp", df.dtypes
        got.add(out.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")).first()[0])
    assert got == {"2024-03-01 12:30:45.123456"}, got


def test_streaming_ann_index_equals_batch(spark):
    """The incrementally-built ANN index must be bit-identical to a
    batch rebuild (pure per-row encode against frozen quantizers):
    every vector present exactly once, zero disagreeing rows."""
    from streaming_spark.queries.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    r = REGISTRY["q_streaming_ann_index"](spark, SF_SMOKE).collect()[0]
    assert r.n_streamed == r.n_batch > 0, r
    assert r.n_mismatch == 0, r


def test_kafka_source_gated_without_connector(spark):
    """The Kafka twin of read_events_stream must fail with a clear
    error naming the missing connector (a deployment JAR, not a code
    change) — the file-source path stays the tested one here."""
    from streaming_spark.streaming.core import read_events_kafka

    with pytest.raises(NotImplementedError, match="spark-sql-kafka"):
        read_events_kafka(spark, "localhost:9092", "events")


def test_streaming_progress_accounting(spark):
    """The progress metrics must account for every fixture row exactly
    (input_rows == events count), one data batch per staged file, and
    nonzero windowed state."""
    from streaming_spark.io import load_table
    from streaming_spark.queries.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    r = REGISTRY["q_streaming_progress"](spark, SF_SMOKE).collect()[0]
    total = load_table(spark, SF_SMOKE, "events").count()
    assert r.input_rows == total, r
    assert r.n_data_batches == 4  # _stage_stream_dir default n_files
    assert r.peak_state_rows > 0


def test_streaming_kmeans_matches_batch(spark):
    """The streamed Lloyd update must agree with the batch update of
    the same corpus: centroid fold within float tolerance (the fold is
    associative; only summation grouping differs) and IDENTICAL
    assignments under both updated centroid sets."""
    from streaming_spark.queries.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    row = REGISTRY["q_streaming_kmeans_update"](spark, SF_SMOKE).collect()[0]
    assert row.n_vectors == 500
    assert row.n_streamed_vectors == 500
    assert row.n_batch_vectors == 500
    assert row.max_centroid_diff < 1e-9, row.max_centroid_diff
    assert row.n_assign_mismatch == 0


def test_streaming_countmin_merges_bit_identical(spark):
    """The streamed Count-Min sink, summed, must equal the batch-built
    sketch cell-for-cell (linearity is exact, not approximate), with
    the one-sided error witness non-negative for every event type."""
    from streaming_spark.queries.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = REGISTRY["q_streaming_countmin"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_cell_mismatch == 0
        assert r.overshoot >= 0
        assert r.estimate_n >= r.exact_n


def test_streaming_hll_union_matches_batch(spark):
    """The union of per-batch HLL sketches must estimate EXACTLY what
    the single-pass corpus sketch estimates (registers are maxes —
    merge order cannot matter), within the usual HLL error of the true
    distinct count."""
    from streaming_spark.queries.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    row = REGISTRY["q_streaming_hll_distinct"](spark, SF_SMOKE).collect()[0]
    assert row.union_exactly_matches_batch
    assert row.est_streamed == row.est_batch
    assert row.exact_distinct > 0
    assert row.rel_error <= 0.05


def test_streaming_minhash_index_matches_batch(spark):
    """The near-dup pairs maintained by the streamed index must equal
    the batch pipeline's pairs row-for-row (the neardup_index lifecycle
    invariant composed with streaming ingest), AND the per-batch work
    must be delta-bound: every micro-batch ran
    build-or-append (stats recorded per batch), each probe touched only
    buckets the BATCH's own band rows name (≤ rows × bands — the
    accumulated index's bucket count never enters), and the appended
    row counts sum to the corpus — the accumulated re-join this query
    ran before r13 had no such per-batch stats to record."""
    from streaming_spark.operators.dedup import minhash_dedup_pairs
    from streaming_spark.queries.registry import REGISTRY, T
    from tests.conftest import SF_SMOKE

    fn = REGISTRY["q_streaming_minhash_index"]
    streamed = {(r.id_a, r.id_b) for r in fn(spark, SF_SMOKE).collect()}
    docs = T(spark, SF_SMOKE, "documents")
    batch = {
        (r.id_a, r.id_b)
        for r in minhash_dedup_pairs(
            docs, "text", "doc_id", threshold=0.5
        ).collect()
    }
    assert streamed == batch
    assert streamed  # non-vacuous: the fixture plants near-dups

    stats = fn.last_append_stats
    assert len(stats) >= 2  # first ingest + at least one delta append
    assert sum(st["rows_appended"] for st in stats) == docs.count()
    bands = 16  # the index's frozen banding default
    for st in stats:
        assert 0 < st["buckets_touched"] <= st["rows_appended"] * bands


def test_batch_keyed_sink_is_retry_idempotent(spark, tmp_path):
    """The exactly-once claim every incremental-index query makes rests
    on one mechanism: a batch-keyed partition with dynamic partition
    overwrite, where a RETRIED batch replaces its own partition instead
    of appending a duplicate.  Pin the mechanism itself: writing the
    same batch id twice (second write with different content, as a
    recomputed retry would produce) leaves exactly the second write's
    rows; other batches' partitions are untouched."""
    from pyspark.sql import functions as F

    sink = str(tmp_path / "sink")

    def land(batch_id, values):
        (
            spark.createDataFrame([(v,) for v in values], "v BIGINT")
            .withColumn("__batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch")
            .parquet(sink)
        )

    land(0, [1, 2, 3])
    land(1, [10, 20])
    land(1, [10, 20, 30])  # the "retry" recomputes batch 1
    rows = {
        (r["__batch"], r["v"]) for r in spark.read.parquet(sink).collect()
    }
    assert rows == {(0, 1), (0, 2), (0, 3), (1, 10), (1, 20), (1, 30)}


def test_stream_conf_sets_and_restores_state_partitions(spark):
    """VERDICT r8 #4: the finite-stream runners size the state-store
    count to the fixture (per-batch stateful cost is dominated by
    per-partition store overhead at gate scale) and must RESTORE the
    session's shuffle-partition conf afterwards — leaking the small
    value would degrade every later batch query in the session."""
    from streaming_spark.queries.windows import _stream_conf

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    restore = _stream_conf(spark, 4)
    assert spark.conf.get(key) == "4"
    restore()
    assert spark.conf.get(key) == before
    # None = inherit the session conf: a no-op both ways
    restore2 = _stream_conf(spark, None)
    assert spark.conf.get(key) == before
    restore2()
    assert spark.conf.get(key) == before
