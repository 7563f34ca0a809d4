"""The composed delta-bound curation tail
(operators/curation_incremental.py): the fold's survivor set must
EXACTLY equal the batch pipeline's over the whole corpus under ordered
ingest; replays of completed batches must be no-ops; a crashed batch
must refuse further ingests and recover exactly through
curation_recover_batch."""

import json
import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from streaming_spark.operators.curation_incremental import (
    curation_ingest_batch,
    curation_recover_batch,
    curation_survivors,
)
from streaming_spark.queries.registry import T
from tests.conftest import SF_CORRECT


def _docs(spark):
    return T(spark, SF_CORRECT, "documents").select("doc_id", "text")


def _batch_tail_ids(docs, grams):
    """The batch pipeline's global stages run once over everything —
    the reference the maintained state must reproduce."""
    from streaming_spark.operators.dedup import (
        dedup_keep_one,
        minhash_dedup_pairs,
    )
    from streaming_spark.operators.text import line_dedup_clean
    from streaming_spark.queries.curation import decontaminate_against

    cleaned = line_dedup_clean(docs)
    w = Window.partitionBy("cleaned_hash").orderBy("doc_id")
    keep = (
        cleaned.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("doc_id")
    )
    exact = docs.join(keep, "doc_id")
    pairs = minhash_dedup_pairs(exact, "text", "doc_id")
    survivors = dedup_keep_one(exact, pairs, "doc_id")
    flags = decontaminate_against(
        survivors.withColumn("source", F.lit("")), grams
    )
    clean = survivors.join(
        flags.filter("contaminated").select("doc_id"), "doc_id", "left_anti"
    )
    return sorted(r.doc_id for r in clean.select("doc_id").collect())


def _incr_ids(spark, work):
    return sorted(r.doc_id for r in curation_survivors(spark, work).collect())


def test_incremental_curation_matches_batch_and_skips_replays(
    spark, tmp_path
):
    """Three ordered batches through curation_ingest_batch reproduce the
    batch pipeline's survivor set exactly; a foreachBatch-style REPLAY
    of a completed batch is a skip, not a double-landing (the failure
    the completed-batch ledger exists to prevent: re-run appends would
    flip the batch's decisions to is_dup and empty its landing)."""
    from streaming_spark.queries.curation import benchmark_grams

    docs = _docs(spark).localCheckpoint(eager=True)
    grams = benchmark_grams(docs.filter("doc_id % 97 = 0")).localCheckpoint(
        eager=True
    )
    work = str(tmp_path / "work")
    kw = dict(
        bench_grams=grams,
        quality_filter=None,
        digest_kwargs=dict(n_prefixes=2, n_id_buckets=2),
        neardup_kwargs=dict(n_id_buckets=2, n_band_prefixes=2),
    )
    cuts = (160, 330)
    conds = (
        f"doc_id < {cuts[0]}",
        f"doc_id >= {cuts[0]} AND doc_id < {cuts[1]}",
        f"doc_id >= {cuts[1]}",
    )
    for b, cond in enumerate(conds):
        st: dict = {}
        curation_ingest_batch(docs.filter(cond), work, b, stats_out=st, **kw)
        assert st["skipped"] is False and st["rows_exact"] > 0

    expected = _batch_tail_ids(docs, grams)
    assert _incr_ids(spark, work) == expected
    assert len(expected) > 0

    # replay of a completed batch: skip, state unchanged
    st = {}
    curation_ingest_batch(
        docs.filter(conds[1]), work, 1, stats_out=st, **kw
    )
    assert st["skipped"] is True
    assert _incr_ids(spark, work) == expected


def test_curation_crashed_batch_refuses_and_recovers(spark, tmp_path):
    """A crashed ingest (pending marker on disk, index appends possibly
    half-landed) refuses further ingests; curation_recover_batch
    tombstones the marker's ids from every index, compacts, drops the
    batch's sink partitions, and clears the marker — after re-ingest
    the survivor set equals the batch pipeline's.  A marker whose batch
    is already recorded complete resolves by marker removal alone."""
    from streaming_spark.operators.digest_index import digest_index_append
    from streaming_spark.operators.text import line_digests
    from streaming_spark.queries.curation import benchmark_grams

    docs = _docs(spark).localCheckpoint(eager=True)
    grams = benchmark_grams(docs.filter("doc_id % 97 = 0")).localCheckpoint(
        eager=True
    )
    work = str(tmp_path / "work")
    kw = dict(
        bench_grams=grams,
        quality_filter=None,
        digest_kwargs=dict(n_prefixes=2, n_id_buckets=2),
        neardup_kwargs=dict(n_id_buckets=2, n_band_prefixes=2),
    )
    b0, b1 = docs.filter("doc_id < 250"), docs.filter("doc_id >= 250")
    curation_ingest_batch(b0, work, 0, **kw)

    # simulate batch 1 crashing AFTER the marker write and the line-
    # index landing but before anything else (the composed mid-crash
    # state the per-index markers cannot see alone)
    b1_ids = sorted(r.doc_id for r in b1.select("doc_id").collect())
    with open(os.path.join(work, ".batch_pending"), "w") as f:
        json.dump({"batch_id": 1, "ids": b1_ids}, f)
    digest_index_append(os.path.join(work, "lines_idx"), line_digests(b1))

    with pytest.raises(RuntimeError, match="crashed mid-ingest"):
        curation_ingest_batch(b1, work, 1, **kw)
    # the fold refuses too: folding a partial state would silently
    # return a smaller survivor set (the or-empty sink guard must not
    # mask a crash)
    with pytest.raises(RuntimeError, match="crashed mid-ingest"):
        curation_survivors(spark, work)

    st: dict = {}
    curation_recover_batch(spark, work, stats_out=st)
    assert st["completed"] is False and st["batch_id"] == 1
    # partial landing gone: survivors are batch-0-only again
    assert _incr_ids(spark, work) == _batch_tail_ids(b0, grams)

    # re-ingest lands cleanly and the full equality holds
    curation_ingest_batch(b1, work, 1, **kw)
    assert _incr_ids(spark, work) == _batch_tail_ids(docs, grams)

    # completed-batch marker (crash between the completion record and
    # the marker removal): recovery is marker removal ALONE
    with open(os.path.join(work, ".batch_pending"), "w") as f:
        json.dump({"batch_id": 1, "ids": b1_ids}, f)
    st = {}
    curation_recover_batch(spark, work, stats_out=st)
    assert st["completed"] is True
    assert _incr_ids(spark, work) == _batch_tail_ids(docs, grams)


def test_curation_survivors_with_zero_row_sinks(spark, tmp_path):
    """A sink whose every batch landed ZERO rows is a directory with no
    parquet files — spark.read.parquet cannot infer a schema from it,
    so curation_survivors must read through an or-empty guard (the
    review-confirmed crash: an empty benchmark flags nothing, leaving
    contam_ids/ file-less)."""
    from streaming_spark.queries.curation import benchmark_grams

    docs = _docs(spark).filter("doc_id < 40").localCheckpoint(eager=True)
    grams = benchmark_grams(docs.filter("doc_id < 0")).localCheckpoint(
        eager=True
    )  # empty benchmark: zero contamination, a file-less contam sink
    work = str(tmp_path / "work")
    curation_ingest_batch(
        docs, work, 0, bench_grams=grams, quality_filter=None,
        digest_kwargs=dict(n_prefixes=2, n_id_buckets=2),
        neardup_kwargs=dict(n_id_buckets=2, n_band_prefixes=2),
    )
    got = _incr_ids(spark, work)
    assert got == _batch_tail_ids(docs, grams)
    assert len(got) > 0


def test_curation_survivors_empty_work_dir_message(spark, tmp_path):
    """A work dir with no ingested batches must raise a curation-level
    message pointing at curation_ingest_batch — not digest_index's
    internal 'not a digest index ... digest_index_build' error, which
    misdirects the caller (ADVICE r13)."""
    work = str(tmp_path / "empty_work")
    with pytest.raises(ValueError, match="no batches ingested"):
        curation_survivors(spark, work)
    os.makedirs(work)  # an existing-but-empty dir behaves the same
    with pytest.raises(ValueError, match="curation_ingest_batch first"):
        curation_survivors(spark, work)
