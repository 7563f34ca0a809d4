"""END-TO-END curation-pipeline scaling measurement — the composed
pipeline a training-data run would execute, at N = 50k .. 1M documents:

    quality filters (Gopher + C4, codegen scan stage)
      → cross-doc line dedup + exact dedup on the CLEANED text digest
      → MinHash-LSH near-dup pairs → components → keep-one
      → n-gram decontamination against a benchmark slice
      → token accounting (whitespace + BPE-ish counts)

stress_dedup.py / stress_blocked.py time the families in ISOLATION;
this script answers the composition question — does the whole pipeline
hold when stages feed each other at scale (shuffles in sequence, scratch
churn, survivor-set joins), and what does each stage cost relative to
the others?  Stages are checkpointed to scratch parquet between phases
(exactly what a production run does), so each timing covers one stage's
compute + write, never a replay of its upstream.

Corpus: stress_dedup's deterministic generator (~60-word docs, every
5th a planted near-copy of its predecessor), plus source = doc_id % 4.
Expected structure per N (the correctness-at-scale checks):
- exact dedup on the line-cleaned digest drops the planted copies whose
  per-position mutations all missed — ≈ N/5 · (19/20)^60 ≈ 0.94% of N;
- near-dup keep-one drops the remaining ~N/5 planted dups (recall
  ~0.995 per stress_dedup);
- the benchmark is the doc_id % 97 == 0 slice of the RAW corpus (an
  external eval suite whose items were also scraped into the crawl);
  after dedup the surviving copies of benchmark docs — at minimum the
  benchmark docs themselves, kept as min-id cluster members — must be
  flagged by 5-gram overlap (random collisions are ~impossible at
  VOCAB=10k), so the JSON reports contaminated_removed against that
  floor.

Usage:
    PYTHONPATH=/root/repo python scripts/stress_pipeline.py [max_n]
    PYTHONPATH=/root/repo python scripts/stress_pipeline.py N streaming
        # the foreachBatch ingest arm at one point N: per-doc stages in
        # micro-batches, global tail over the sink, and an EXACT
        # survivor-set equality assert against the batch pipeline
    PYTHONPATH=/root/repo python scripts/stress_pipeline.py N incremental
        # the DELTA-BOUND tail arm at one point N: every global stage
        # maintained incrementally per ingest batch — line/exact dedup
        # via staged digest-membership indexes, near-dup via
        # neardup_index_append — with per-batch tail seconds reported
        # (the claim: they do NOT grow with accumulated N, unlike the
        # streaming arm's recompute-over-the-sink tail) and the final
        # survivor set EXACTLY equal to the batch pipeline's
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from stress_dedup import release, stage_corpus  # noqa: E402

from streaming_spark import get_spark, scratch  # noqa: E402


def _quality(docs, id_col="doc_id", text_col="text"):
    """The library's standard Gopher ∧ C4 gate with the synthetic-vocab
    calibration (min_stop=0 — the generated corpus has no stopwords) —
    ONE definition for every arm, so the identical-survivors assertions
    always compare the same rule set."""
    from streaming_spark.operators.curation_incremental import (
        default_quality_filter,
    )

    return default_quality_filter(
        docs, id_col=id_col, text_col=text_col, min_stop=0
    )


def _stage(spark, name: str, df, n: int):
    """Checkpoint a stage to scratch parquet; return (dir, df, rows)."""
    d = scratch.scratch_dir(f"stress_pipe_{name}_{n}", pin=True)
    df.write.parquet(d + "/t")
    out = spark.read.parquet(d + "/t")
    return d, out, out.count()


def run_point(spark, n: int) -> None:
    from pyspark.sql import functions as F

    from streaming_spark.operators.dedup import (
        dedup_keep_one,
        minhash_dedup_pairs,
    )
    from streaming_spark.operators.text import (
        bpe_ish_token_count,
        line_dedup_clean,
        token_count,
    )
    from streaming_spark.queries.curation import (
        benchmark_grams,
        decontaminate_against,
    )

    t_all = time.perf_counter()
    corpus_dir, raw = stage_corpus(spark, n)
    docs = raw.withColumn("source", (F.col("doc_id") % 4).cast("string"))

    def report(op, seconds, rows, **extra):
        print(
            json.dumps(
                {
                    "op": op,
                    "n": n,
                    "seconds": round(seconds, 2),
                    "rows": rows,
                    **extra,
                }
            ),
            flush=True,
        )

    # 1. quality filters — the library's standard Gopher ∧ C4 gate
    # (min_stop=0: the synthetic vocab has no stopwords); ONE
    # definition shared by every arm so the identical-survivors
    # assertions always compare the same rule set
    t0 = time.perf_counter()
    filtered = _quality(docs)
    d1, filtered, rows1 = _stage(spark, "filtered", filtered, n)
    report("pipe_quality_filters", time.perf_counter() - t0, rows1)

    # 2. cross-doc line dedup, then EXACT dedup on the cleaned-text
    # digest (keep min doc_id per cleaned_hash) — one digest shuffle +
    # one window, text never shuffles
    t0 = time.perf_counter()
    cleaned = line_dedup_clean(filtered)
    from pyspark.sql import Window

    w = Window.partitionBy("cleaned_hash").orderBy("doc_id")
    keep_ids = (
        cleaned.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("doc_id")
    )
    exact = filtered.join(keep_ids, "doc_id")
    d2, exact, rows2 = _stage(spark, "exact", exact, n)
    report("pipe_line_exact_dedup", time.perf_counter() - t0, rows2)

    # 3. near-dup: MinHash-LSH pairs → components → keep-one
    t0 = time.perf_counter()
    pairs = minhash_dedup_pairs(exact, "text", "doc_id", threshold=0.5)
    survivors = dedup_keep_one(exact, pairs, "doc_id")
    d3, survivors, rows3 = _stage(spark, "neardup", survivors, n)
    report(
        "pipe_near_dedup",
        time.perf_counter() - t0,
        rows3,
        removed=rows2 - rows3,
        planted=n // 5,
    )

    # 4. decontamination against an EXTERNAL eval set: the benchmark is
    # the doc_id % 97 == 0 slice of the RAW corpus (simulating an eval
    # suite whose items were also scraped into the training crawl);
    # every surviving copy of a benchmark doc must be flagged via
    # 5-gram overlap and dropped
    t0 = time.perf_counter()
    bench = raw.filter("doc_id % 97 = 0")
    flags = decontaminate_against(survivors, benchmark_grams(bench))
    clean = survivors.join(
        flags.filter("contaminated").select("doc_id"), "doc_id", "left_anti"
    )
    d4, clean, rows4 = _stage(spark, "clean", clean, n)
    # the floor: surviving docs that ARE benchmark docs (near-dedup
    # keeps the min-id member, which for a (bench, planted-dup) pair is
    # the bench doc itself); mutated planted dups of bench docs that
    # escape minhash add a few more
    bench_in_corpus = survivors.filter("doc_id % 97 = 0").count()
    report(
        "pipe_decontaminate",
        time.perf_counter() - t0,
        rows4,
        bench_docs=bench.count(),
        contaminated_removed=rows3 - rows4,
        contaminated_floor=bench_in_corpus,
        floor_met=(rows3 - rows4) >= bench_in_corpus,
    )

    # 5. token accounting over the final corpus — pure codegen aggregate
    t0 = time.perf_counter()
    stats = clean.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(token_count("text")).alias("ws_tokens"),
        F.sum(bpe_ish_token_count("text")).alias("bpe_tokens"),
    ).collect()[0]
    report(
        "pipe_token_stats",
        time.perf_counter() - t0,
        int(stats["docs"]),
        ws_tokens=int(stats["ws_tokens"]),
        bpe_tokens=int(stats["bpe_tokens"]),
    )

    report(
        "pipeline_total",
        time.perf_counter() - t_all,
        rows4,
        docs_in=n,
    )
    release(corpus_dir, d1, d2, d3, d4)


def run_streaming_point(spark, n: int) -> None:
    """STREAMING-INGEST arm (VERDICT r10 #5): the same composed
    pipeline with the per-document stages (Gopher + C4 quality
    filters) run AT INGEST inside foreachBatch micro-batches — the
    q_streaming_curate_corpus division of labor — and the global
    stages (line/exact dedup, near-dup keep-one, decontamination)
    over the accumulated survivor sink.  Then the BATCH pipeline runs
    over the same corpus and the two final survivor ID sets are
    compared for EXACT equality: the landed stages are per-doc pure
    and every global stage is deterministic in the ids (keep-first /
    min-id rules), so incremental curation must reproduce the batch
    run row for row — the contract that lets a production corpus be
    curated as it arrives instead of in one monolithic job."""
    import shutil

    from pyspark.sql import functions as F

    t_all = time.perf_counter()
    corpus_dir, raw = stage_corpus(spark, n)

    def report(op, seconds, rows, **extra):
        print(
            json.dumps(
                {"op": op, "n": n, "seconds": round(seconds, 2),
                 "rows": rows, **extra}
            ),
            flush=True,
        )

    # ---- streaming ingest: per-doc stages inside each micro-batch
    t0 = time.perf_counter()
    sink = scratch.scratch_dir(f"stress_pipe_stream_sink_{n}", pin=True)
    ckpt = sink + "/ckpt"
    n_batches = [0]

    def land(batch_df, batch_id):
        from streaming_spark.queries.windows import _land_batch

        docs = batch_df.withColumn(
            "source", (F.col("doc_id") % 4).cast("string")
        )
        # idempotent batch-keyed landing (the engine's sink discipline):
        # a replayed micro-batch after checkpoint recovery overwrites
        # its own partition instead of appending duplicate doc rows,
        # which would poison the stream-vs-batch survivor-set equality
        _land_batch(_quality(docs), batch_id, sink + "/t")
        n_batches[0] += 1

    stream_docs = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 4)  # 32 staged files -> 8 batches
        .parquet(corpus_dir + "/t")
    )
    q = (
        stream_docs.writeStream.foreachBatch(land)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.read.parquet(sink + "/t")
    rows_s = streamed.count()
    report(
        "pipe_streaming_ingest_filters",
        time.perf_counter() - t0,
        rows_s,
        micro_batches=n_batches[0],
    )

    # ---- global stages over the accumulated survivors (shared tail)
    t0 = time.perf_counter()
    stream_ids = _pipeline_tail_ids(spark, streamed, raw, n, "stream")
    report(
        "pipe_streaming_global_tail", time.perf_counter() - t0, len(stream_ids)
    )

    # ---- the batch pipeline over the same corpus
    t0 = time.perf_counter()
    docs = raw.withColumn("source", (F.col("doc_id") % 4).cast("string"))
    batch_filtered = _quality(docs)
    batch_ids = _pipeline_tail_ids(spark, batch_filtered, raw, n, "batch")
    report("pipe_batch_reference", time.perf_counter() - t0, len(batch_ids))

    report(
        "pipe_streaming_vs_batch",
        time.perf_counter() - t_all,
        len(stream_ids),
        identical_survivors=stream_ids == batch_ids,
        batch_rows=len(batch_ids),
    )
    assert stream_ids == batch_ids, (
        "streaming and batch pipelines diverged: "
        f"{len(stream_ids)} vs {len(batch_ids)} survivors"
    )
    scratch.unpin(sink)
    shutil.rmtree(sink, ignore_errors=True)
    release(corpus_dir)


def run_incremental_point(spark, n: int, n_batches: int = 8) -> None:
    """DELTA-BOUND incremental tail (VERDICT r11 #3): the streaming arm
    proved ingest-time curation reproduces the batch pipeline exactly,
    but its tail RECOMPUTES the global stages over the accumulated sink
    every time — O(N) per refresh.  This arm maintains every global
    stage incrementally per ingest batch, through the COMPOSED library
    operator (operators/curation_incremental.py — this script is now a
    thin timer around curation_ingest_batch/curation_survivors, per the
    same promotion discipline as the digest index):

    - cross-doc line dedup: a staged line-digest occurrence index
      (operators/digest_index.py, promoted from this script's private
      helper per VERDICT r12 #1); a batch occurrence is removed iff the
      append's returned decision flags it — digest seen in an earlier
      batch OR earlier within this batch (the batch arm's keep-first
      window rule, split at the batch boundary);
    - exact dedup on the cleaned-text digest: a second digest index,
      same split of the keep-min-id window;
    - near-dup: neardup_index_append — signatures computed once per
      batch, banded join delta-vs-index + delta-vs-delta only;
    - decontamination: per-doc 5-gram overlap against the static
      benchmark (already per-batch pure).

    Ordered-ingest contract: batches arrive in ascending doc_id ranges
    (ids assigned at ingest — the production shape), so first-seen ==
    global min-id and no decision is ever retroactive.  Out-of-order
    backfill needs the ARGMIN owner-index (q_streaming_line_index) and
    the near-dup tombstone ledger — both exist; this arm measures the
    in-order fast path.

    Keep-one (components over the accumulated pair set → min-id per
    component) runs once at the end: the pair TABLE is maintained per
    batch; turning pairs into survivors is metadata-scale.

    Reports per-batch tail seconds (the claim: ~flat in batch index —
    the accumulated corpus grows 8x across batches while per-batch cost
    tracks the DELTA) and asserts the final survivor set EXACTLY equals
    the batch pipeline's."""
    import shutil

    from pyspark.sql import functions as F

    from streaming_spark.operators.curation_incremental import (
        curation_ingest_batch,
        curation_survivors,
    )
    from streaming_spark.queries.curation import benchmark_grams

    t_all = time.perf_counter()
    corpus_dir, raw = stage_corpus(spark, n)

    def report(op, seconds, rows, **extra):
        print(
            json.dumps(
                {"op": op, "n": n, "seconds": round(seconds, 2),
                 "rows": rows, **extra}
            ),
            flush=True,
        )

    # static external benchmark (an eval suite, known upfront) —
    # checkpointed once, consumed by every batch's flagging pass
    bench = raw.filter("doc_id % 97 = 0")
    grams = benchmark_grams(bench).localCheckpoint(eager=True)

    work = scratch.scratch_dir(f"stress_pipe_incr_{n}", pin=True)

    width = n // n_batches
    batch_secs = []
    for b in range(n_batches):
        lo, hi = b * width, (b + 1) * width if b < n_batches - 1 else n
        t0 = time.perf_counter()
        docs = raw.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).withColumn("source", (F.col("doc_id") % 4).cast("string"))
        st: dict = {}
        curation_ingest_batch(
            docs, work, b, bench_grams=grams, quality_filter=_quality,
            digest_kwargs=dict(n_prefixes=16, n_id_buckets=4),
            neardup_kwargs=dict(n_id_buckets=16, n_band_prefixes=16),
            stats_out=st,
        )
        dt = time.perf_counter() - t0
        batch_secs.append(round(dt, 2))
        report(
            "pipe_incr_batch", dt, st["rows_exact"],
            batch=b, accumulated_hi=hi,
        )

    # the end-of-stream fold: pairs -> components -> keep-one -> final
    t0 = time.perf_counter()
    incr_ids = sorted(
        r.doc_id for r in curation_survivors(spark, work).collect()
    )
    fold_s = time.perf_counter() - t0
    report("pipe_incr_final_fold", fold_s, len(incr_ids))

    # the batch reference over the same corpus (same shared gate)
    t0 = time.perf_counter()
    docs = raw.withColumn("source", (F.col("doc_id") % 4).cast("string"))
    batch_filtered = _quality(docs)
    batch_ids = _pipeline_tail_ids(spark, batch_filtered, raw, n, "incrref")
    report("pipe_incr_batch_reference", time.perf_counter() - t0, len(batch_ids))

    report(
        "pipe_incremental_vs_batch",
        time.perf_counter() - t_all,
        len(incr_ids),
        identical_survivors=incr_ids == batch_ids,
        batch_rows=len(batch_ids),
        per_batch_tail_seconds=batch_secs,
        last_over_first=round(batch_secs[-1] / batch_secs[0], 2)
        if batch_secs[0] else None,
    )
    assert incr_ids == batch_ids, (
        "incremental and batch pipelines diverged: "
        f"{len(incr_ids)} vs {len(batch_ids)} survivors"
    )
    scratch.unpin(work)
    shutil.rmtree(work, ignore_errors=True)
    release(corpus_dir)


def run_backfill_point(spark, n: int, late: int = 1_000,
                       n_batches: int = 4) -> None:
    """Out-of-order backfill cost law (curation_backfill, r14): after
    ``n_batches`` ordered ingests over ids [late, late+n), a LATE batch
    of ``late`` docs arrives whose ids are SMALLER than everything
    ingested and whose texts are exact copies of already-ingested docs
    — every late doc steals line/exact ownership from an ingested doc,
    so the full resync cascade (affected-doc recompute, exact-index
    re-key, near-dup membership churn, sink rewrite) runs at delta
    scale, not floor scale.  Measured against the batch recompute over
    the same corpus, with survivor-set equality asserted.  The claim
    under measure: backfill's text-touching work is bounded by
    late + affected + churn (delta-bound), while the batch alternative
    re-runs every global stage over the accumulated corpus."""
    import shutil

    from pyspark.sql import functions as F

    from streaming_spark.operators.curation_incremental import (
        curation_backfill,
        curation_ingest_batch,
        curation_survivors,
    )
    from streaming_spark.queries.curation import benchmark_grams

    corpus_dir, raw = stage_corpus(spark, n + late)

    def report(op, seconds, rows, **extra):
        print(
            json.dumps(
                {"op": op, "n": n, "seconds": round(seconds, 2),
                 "rows": rows, **extra}
            ),
            flush=True,
        )

    bench = raw.filter("doc_id % 97 = 0")
    grams = benchmark_grams(bench).localCheckpoint(eager=True)
    work = scratch.scratch_dir(f"stress_pipe_backfill_{n}", pin=True)

    ingested = raw.filter(F.col("doc_id") >= late).withColumn(
        "source", (F.col("doc_id") % 4).cast("string")
    )
    width = n // n_batches
    for b in range(n_batches):
        lo = late + b * width
        hi = late + (b + 1) * width if b < n_batches - 1 else late + n
        t0 = time.perf_counter()
        curation_ingest_batch(
            ingested.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ),
            work, b, bench_grams=grams, quality_filter=_quality,
            digest_kwargs=dict(n_prefixes=16, n_id_buckets=4),
            neardup_kwargs=dict(n_id_buckets=16, n_band_prefixes=16),
        )
        report("backfill_ordered_batch", time.perf_counter() - t0,
               hi - lo, batch=b)

    # the late batch: ids [0, late) carrying the TEXTS of ingested docs
    # [late, 2*late) — each steals exact/line ownership (smaller id)
    late_docs = (
        raw.filter(
            (F.col("doc_id") >= late) & (F.col("doc_id") < 2 * late)
        )
        .select(
            (F.col("doc_id") - late).alias("doc_id"), "text",
            ((F.col("doc_id") - late) % 4).cast("string").alias("source"),
        )
        .localCheckpoint(eager=True)
    )
    full_corpus = ingested.select("doc_id", "text", "source").union(
        late_docs
    )
    t0 = time.perf_counter()
    st: dict = {}
    curation_backfill(
        spark, late_docs, work, n_batches, full_corpus,
        bench_grams=grams, quality_filter=_quality, stats_out=st,
    )
    backfill_s = time.perf_counter() - t0
    report(
        "backfill_late_batch", backfill_s, late,
        affected_docs=st.get("affected_docs"),
        rekeyed_hashes=st.get("rekeyed_hashes"),
        nd_removed=st.get("nd_removed"), nd_added=st.get("nd_added"),
        keep_size=st.get("keep_size"),
    )

    t0 = time.perf_counter()
    incr_ids = sorted(
        r.doc_id for r in curation_survivors(spark, work).collect()
    )
    fold_s = time.perf_counter() - t0
    report("backfill_final_fold", fold_s, len(incr_ids))

    # the batch recompute over the same corpus — what a pipeline
    # without the resync operator pays for ONE late batch
    t0 = time.perf_counter()
    batch_ids = _pipeline_tail_ids(
        spark, _quality(full_corpus), raw, n, "bfref"
    )
    report(
        "backfill_batch_reference", time.perf_counter() - t0,
        len(batch_ids),
        identical_survivors=incr_ids == batch_ids,
        backfill_seconds=round(backfill_s, 2),
    )
    assert incr_ids == batch_ids, (
        "backfill and batch pipelines diverged: "
        f"{len(incr_ids)} vs {len(batch_ids)} survivors"
    )
    scratch.unpin(work)
    shutil.rmtree(work, ignore_errors=True)
    release(corpus_dir)


def _pipeline_tail_ids(spark, filtered, raw, n: int, tag: str) -> list:
    """The pipeline's GLOBAL stages (cross-doc line dedup + exact dedup
    → near-dup keep-one → decontamination), shared verbatim by the
    batch and streaming arms; returns the sorted final survivor ids.
    Stages are checkpointed to scratch like run_point's."""
    from pyspark.sql import Window, functions as F

    from streaming_spark.operators.dedup import (
        dedup_keep_one,
        minhash_dedup_pairs,
    )
    from streaming_spark.operators.text import line_dedup_clean
    from streaming_spark.queries.curation import (
        benchmark_grams,
        decontaminate_against,
    )

    d1, filtered, _ = _stage(spark, f"{tag}_filtered", filtered, n)
    cleaned = line_dedup_clean(filtered)
    w = Window.partitionBy("cleaned_hash").orderBy("doc_id")
    keep_ids = (
        cleaned.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("doc_id")
    )
    d2, exact, _ = _stage(spark, f"{tag}_exact", filtered.join(keep_ids, "doc_id"), n)
    pairs = minhash_dedup_pairs(exact, "text", "doc_id", threshold=0.5)
    d3, survivors, _ = _stage(
        spark, f"{tag}_neardup", dedup_keep_one(exact, pairs, "doc_id"), n
    )
    bench = raw.filter("doc_id % 97 = 0")
    flags = decontaminate_against(survivors, benchmark_grams(bench))
    clean = survivors.join(
        flags.filter("contaminated").select("doc_id"), "doc_id", "left_anti"
    )
    ids = sorted(r.doc_id for r in clean.select("doc_id").collect())
    release(d1, d2, d3)
    return ids


def main() -> None:
    max_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="stress-pipeline")
    # stress_dedup is imported as a module here (not __main__ as in its
    # own run), so its generator closures pickle by REFERENCE — ship the
    # file so executor workers can import it
    spark.sparkContext.addPyFile(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "stress_dedup.py")
    )

    # warm the Arrow worker pools before timing (CLAUDE.md)
    run_point(spark, 1_000)

    if len(sys.argv) > 2 and sys.argv[2] == "streaming":
        run_streaming_point(spark, max_n)
        return
    if len(sys.argv) > 2 and sys.argv[2] == "incremental":
        run_incremental_point(spark, max_n)
        return
    if len(sys.argv) > 2 and sys.argv[2] == "backfill":
        run_backfill_point(spark, max_n)
        return

    for n in (50_000, 200_000, 1_000_000):
        if n > max_n:
            break
        run_point(spark, n)


if __name__ == "__main__":
    main()
