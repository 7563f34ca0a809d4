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


# ---------------------------------------------------------------- backfill


def _line_pool(n=120):
    return [" ".join(f"w{i}_{j}" for j in range(10)) for i in range(n)]


def _backfill_corpus(spark, seed=42):
    """Multi-line corpus engineered for the out-of-order cascade: the
    late batch (ids < 100) shares lines with both ordered batches in
    both directions, contains an exact copy of an ordered doc under a
    SMALLER id (steals exact-dedup ownership), and a near-duplicate of
    an ordered doc (flips the keep-one component min).  Heavy pool
    reuse also creates empty-cleaned-text groups, re-keyed hashes and
    promoted keepers without hand-enumerating them — the batch-arm
    comparator recomputes everything, so any mishandled cascade shows
    up as an id diff."""
    import numpy as np

    rng = np.random.default_rng(seed)
    pool = _line_pool()

    def doc(doc_id, line_ids):
        return (doc_id, " ".join(pool[i] for i in line_ids))

    rows = []
    for i in range(40):
        rows.append(doc(100 + i, [int(x) for x in rng.integers(0, 60, 3)]))
    for i in range(40):
        rows.append(doc(200 + i, [int(x) for x in rng.integers(20, 90, 3)]))
    rows.append(doc(140, [5, 6, 7]))
    rows.append(doc(240, [5, 6, 7]))  # exact dup inside the ordered corpus
    late = []
    for i in range(15):
        late.append(doc(10 + i, [int(x) for x in rng.integers(0, 120, 3)]))
    late.append(doc(25, [5, 6, 7]))  # smaller-id exact copy: steals owner
    t100 = dict(rows)[100]
    late.append((26, t100.replace("_3 ", "_3x ")))  # near-dup of 100
    return spark.createDataFrame(
        sorted(rows + late), "doc_id BIGINT, text STRING"
    ).localCheckpoint(eager=True)


_BF_ND_KW = dict(num_perm=32, bands=8, n_id_buckets=2, n_band_prefixes=2)


def _bf_batch_ids(docs, grams):
    """The batch pipeline with the fixture-sized minhash knobs the
    backfill corpus uses (both arms must share parameters)."""
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
    pairs = minhash_dedup_pairs(exact, "text", "doc_id", num_perm=32, bands=8)
    survivors = dedup_keep_one(exact, pairs, "doc_id")
    flags = decontaminate_against(
        survivors.withColumn("source", F.lit("")), grams
    )
    clean = survivors.join(
        flags.filter("contaminated").select("doc_id"), "doc_id", "left_anti"
    )
    return sorted(r.doc_id for r in clean.select("doc_id").collect())


def _bf_setup(spark, tmp_path, grams, docs):
    from streaming_spark.operators.curation_incremental import (
        curation_ingest_batch,
    )

    work = str(tmp_path / "work")
    kw = dict(
        bench_grams=grams,
        quality_filter=None,
        digest_kwargs=dict(n_prefixes=2, n_id_buckets=2),
        neardup_kwargs=dict(_BF_ND_KW),
    )
    curation_ingest_batch(
        docs.filter("doc_id >= 100 AND doc_id < 200"), work, 0, **kw
    )
    curation_ingest_batch(docs.filter("doc_id >= 200"), work, 1, **kw)
    return work, kw


def test_curation_backfill_matches_batch_pipeline(spark, tmp_path):
    """The VERDICT r13 #2 contract: after a late (out-of-order) batch
    goes through curation_backfill, the fold EXACTLY equals the batch
    pipeline over the full corpus — the r13 pinned caveat becomes the
    passing case.  Ordered ingest continues to work AFTER the backfill
    (new batches' decisions stay final against the resynced indexes),
    and a replay of the completed backfill is a skip."""
    from streaming_spark.operators.curation_incremental import (
        curation_backfill,
        curation_ingest_batch,
    )
    from streaming_spark.queries.curation import benchmark_grams

    docs = _backfill_corpus(spark)
    grams = benchmark_grams(docs.filter("doc_id % 37 = 0")).localCheckpoint(
        eager=True
    )
    work, kw = _bf_setup(spark, tmp_path, grams, docs)
    ordered = docs.filter("doc_id >= 100")
    late = docs.filter("doc_id < 100")

    st: dict = {}
    curation_backfill(
        spark, late, work, 2, corpus=ordered, bench_grams=grams,
        quality_filter=None, stats_out=st,
    )
    assert st["skipped"] is False
    assert st["affected_docs"] > len(
        [r for r in late.collect()]
    )  # the cascade reached ordered docs, not just the late batch
    assert st["rekeyed_hashes"] > 0 and st["nd_removed"] > 0
    assert _incr_ids(spark, work) == _bf_batch_ids(docs, grams)

    # ordered ingest continues on the resynced state
    extra = spark.createDataFrame(
        [(300, _line_pool()[5] + " " + _line_pool()[100]),
         (301, " ".join(_line_pool()[110:113]))],
        "doc_id BIGINT, text STRING",
    )
    curation_ingest_batch(extra, work, 3, **kw)
    full = docs.union(extra)
    assert _incr_ids(spark, work) == _bf_batch_ids(full, grams)

    # replay of the completed backfill: skip, state unchanged
    st = {}
    curation_backfill(
        spark, late, work, 2, corpus=ordered, bench_grams=grams,
        quality_filter=None, stats_out=st,
    )
    assert st["skipped"] is True
    assert _incr_ids(spark, work) == _bf_batch_ids(full, grams)


def test_curation_backfill_crash_resumes_roll_forward(spark, tmp_path):
    """Crash posture: a backfill that dies mid-flight (here: during the
    near-dup membership reconcile, after the hashes re-key already
    landed) leaves its marker — further ingests and the fold refuse,
    curation_recover_batch refuses with the roll-forward instruction
    (rollback would corrupt the re-keyed state), and RE-RUNNING the
    backfill resumes every diff to the exact batch-pipeline state."""
    from streaming_spark.operators import neardup_index as ND
    from streaming_spark.operators.curation_incremental import (
        curation_backfill,
        curation_ingest_batch,
        curation_recover_batch,
        curation_survivors,
    )
    from streaming_spark.queries.curation import benchmark_grams

    docs = _backfill_corpus(spark, seed=7)
    grams = benchmark_grams(docs.filter("doc_id % 37 = 0")).localCheckpoint(
        eager=True
    )
    work, kw = _bf_setup(spark, tmp_path, grams, docs)
    ordered = docs.filter("doc_id >= 100")
    late = docs.filter("doc_id < 100")

    real_append = ND.neardup_index_append
    calls = {"n": 0}

    def crashing_append(*a, **k):
        calls["n"] += 1
        raise RuntimeError("injected crash")

    ND.neardup_index_append = crashing_append
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            curation_backfill(
                spark, late, work, 2, corpus=ordered, bench_grams=grams,
                quality_filter=None,
            )
    finally:
        ND.neardup_index_append = real_append
    assert calls["n"] == 1
    assert os.path.isfile(os.path.join(work, ".batch_pending"))

    with pytest.raises(RuntimeError, match="crashed mid-ingest"):
        curation_ingest_batch(docs.limit(1), work, 3, **kw)
    with pytest.raises(RuntimeError, match="crashed mid-ingest"):
        curation_survivors(spark, work)
    with pytest.raises(RuntimeError, match="roll"):
        curation_recover_batch(spark, work)

    # roll forward: the re-run resumes (line/hash steps are no-op
    # diffs, the nd reconcile completes) and lands batch equality
    st: dict = {}
    curation_backfill(
        spark, late, work, 2, corpus=ordered, bench_grams=grams,
        quality_filter=None, stats_out=st,
    )
    assert st["skipped"] is False
    assert _incr_ids(spark, work) == _bf_batch_ids(docs, grams)


def test_curation_backfill_resume_heals_crashed_subappend(spark, tmp_path):
    """A resume where one INDEX-LEVEL append crashed mid-landing (its
    own .append_pending marker is set): the heal step runs the index's
    documented recovery — covering takedown (clears the marker) +
    compact — then the diff re-lands, ending at exact batch equality."""
    import json as _json

    from streaming_spark.operators import digest_index as DI
    from streaming_spark.operators.curation_incremental import (
        curation_backfill,
    )
    from streaming_spark.operators.text import line_digests
    from streaming_spark.queries.curation import benchmark_grams

    docs = _backfill_corpus(spark, seed=11)
    grams = benchmark_grams(docs.filter("doc_id % 37 = 0")).localCheckpoint(
        eager=True
    )
    work, kw = _bf_setup(spark, tmp_path, grams, docs)
    ordered = docs.filter("doc_id >= 100")
    late = docs.filter("doc_id < 100").localCheckpoint(eager=True)
    late_ids = sorted(r.doc_id for r in late.select("doc_id").collect())

    # simulate: the backfill wrote its marker, then the LINE-index
    # append crashed mid-landing — marker set, rows partially live
    with open(os.path.join(work, ".batch_pending"), "w") as f:
        _json.dump({"batch_id": 2, "mode": "backfill", "ids": late_ids}, f)
    lines_idx = os.path.join(work, "lines_idx")
    lp = DI._load_params(lines_idx)
    dig = line_digests(late.limit(4))
    crashed_ids = sorted(
        r.doc_id for r in dig.select("doc_id").distinct().collect()
    )
    dig.withColumn("pb", DI._pb_expr(F.col("h"), lp["n_prefixes"])).withColumn(
        "ib", DI._ib_expr(F.col("doc_id"), lp["n_id_buckets"])
    ).write.mode("append").partitionBy("pb", "ib").parquet(
        os.path.join(lines_idx, "occ")
    )
    with open(os.path.join(lines_idx, ".append_pending"), "w") as f:
        _json.dump({"ids": crashed_ids, "n": len(crashed_ids)}, f)

    curation_backfill(
        spark, late, work, 2, corpus=ordered, bench_grams=grams,
        quality_filter=None,
    )
    assert not os.path.isfile(os.path.join(lines_idx, ".append_pending"))
    assert _incr_ids(spark, work) == _bf_batch_ids(docs, grams)


def test_curation_backfill_refusals(spark, tmp_path):
    """Guard rails: an empty work dir refuses (a first batch is an
    ordered ingest); late ids already ingested refuse (ids are unique
    corpus-wide); a marker from a DIFFERENT batch refuses; a corpus
    that does not cover the cascade refuses instead of leaving a stale
    hash."""
    from streaming_spark.operators.curation_incremental import (
        curation_backfill,
    )
    from streaming_spark.queries.curation import benchmark_grams

    docs = _backfill_corpus(spark, seed=13)
    grams = benchmark_grams(docs.filter("doc_id < 0")).localCheckpoint(
        eager=True
    )
    late = docs.filter("doc_id < 100")
    with pytest.raises(ValueError, match="no batches ingested"):
        curation_backfill(
            spark, late, str(tmp_path / "nowork"), 1, corpus=docs,
            quality_filter=None,
        )

    work, kw = _bf_setup(spark, tmp_path, grams, docs)
    ordered = docs.filter("doc_id >= 100")
    with pytest.raises(ValueError, match="already ingested"):
        curation_backfill(
            spark, docs.filter("doc_id >= 200 AND doc_id < 210"), work, 2,
            corpus=ordered, quality_filter=None,
        )
    import json as _json

    with open(os.path.join(work, ".batch_pending"), "w") as f:
        _json.dump({"batch_id": 9, "mode": "ingest", "ids": [1]}, f)
    with pytest.raises(RuntimeError, match="different batch"):
        curation_backfill(
            spark, late, work, 2, corpus=ordered, quality_filter=None,
        )
    os.remove(os.path.join(work, ".batch_pending"))

    # coverage gap: a corpus missing the ordered docs the late batch
    # cascades into must refuse loudly
    with pytest.raises(ValueError, match="cover"):
        curation_backfill(
            spark, late, work, 2, corpus=ordered.limit(1),
            quality_filter=None,
        )
