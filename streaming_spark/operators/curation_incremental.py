"""Delta-bound incremental curation tail, as a library composition.

The staged-index trio (exact/line dedup: operators/digest_index.py;
near-dup: operators/neardup_index.py) makes each GLOBAL curation stage
maintainable per ingest batch — but the composition itself (which index
feeds which stage, what lands in which sink, how the end-of-stream fold
turns maintained state into the survivor set) lived in
scripts/stress_pipeline.py's incremental arm, unreachable from the
library.  This module is that composition as two calls:

- :func:`curation_ingest_batch` — the per-batch half: quality filters →
  cross-doc line dedup (line-digest index decisions) → exact dedup on
  the cleaned-text digest (second digest index) → near-dup signature
  landing (``neardup_index_append``) → decontamination flags; survivor
  and contaminated ids land in batch-keyed sinks under ``work_dir``.
- :func:`curation_survivors` — the end-of-stream fold: accumulated
  exact-dedup survivors minus near-dup keep-one drops (components over
  the MAINTAINED pair table → min-id per component) minus contaminated.

Exactness contract (witnessed by the registered
``incremental_curation_maintenance`` query and
tests/test_curation_incremental.py): under ordered ingest (batches
arrive in ascending ``id_col`` ranges — ids assigned at ingest, the
production shape) the final survivor set EXACTLY equals the batch
pipeline run once over the whole corpus — every global stage's
keep-first / keep-min-id window splits exactly at the batch boundary.
Out-of-order backfill needs the digest indexes' ARGMIN owners view and
the near-dup tombstone ledger (both exist; recompute survivor sinks
from them after a backfill).

Scale shape: per-batch cost is DELTA-bound — the digest probes read
only the batch's digest-prefix partitions, the banded join runs
delta-vs-index only, decontamination is per-doc pure — measured flat
(20.8–25.2 s/batch at 200k over 8× corpus growth, sub-linear at 1M;
ROADMAP r12/r13).  The fold is metadata-scale: pair table → components
→ anti-joins, never the corpus text.

Crash posture — the composed story, because the composition has its own
hazard the per-index markers cannot see: the three index appends are
NOT replay-idempotent, so re-running a batch whose appends already
landed would double-land occurrence/band rows and flip every decision
to is_dup (the batch's own digests are now "seen"), silently emptying
its survivor landing.  So:

- a ``.batch_pending`` marker (atomic tmp + rename, recording the
  batch's ids) brackets each ingest; while it exists every further
  ingest refuses the work dir;
- a completed batch id is recorded in ``_meta.json`` AFTER all
  landings, and re-ingesting a batch id ≤ the last completed one is a
  SKIP (stats_out["skipped"]=True) — a foreachBatch replay of a
  committed batch is a no-op, not corruption;
- a crashed batch (marker present) is recovered by
  :func:`curation_recover_batch`: tombstone the marker's ids in all
  three indexes (each index's own crashed-append marker accepts exactly
  this takedown and clears itself), compact them, drop the batch's sink
  partitions, clear the marker — then re-ingest the batch.  Recovery is
  exact for the same reason each index's is.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streaming_spark.operators.digest_index import (
    _load_params as _dig_params,
    digest_index_append,
    digest_index_build,
)
from streaming_spark.operators.neardup_index import (
    neardup_index_append,
    neardup_index_build,
    neardup_index_pairs,
)
from streaming_spark.operators.text import (
    apply_line_removals,
    c4_quality,
    gopher_quality,
    line_digests,
)

_LINES, _HASHES, _ND = "lines_idx", "hashes_idx", "nd_idx"
_EXACT_SINK, _CONTAM_SINK = "exact_ids", "contam_ids"
_META, _PENDING = "_meta.json", ".batch_pending"
_PARAMS = "_params.json"


def _last_batch_id(work_dir: str) -> int:
    path = os.path.join(work_dir, _META)
    if not os.path.isfile(path):
        return -1
    with open(path, encoding="utf-8") as f:
        return int(json.load(f).get("last_batch_id", -1))


def _write_json_atomic(path: str, payload: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(payload, f)
    os.rename(tmp, path)


def default_quality_filter(docs: DataFrame, id_col: str = "doc_id", *,
                           text_col: str = "text",
                           min_stop: int = 2) -> DataFrame:
    """The standard per-doc quality gate: Gopher ∧ C4 rule sets (both
    codegen'd scan expressions).  Per-doc pure, so it composes with any
    batching.  ``min_stop=0`` for synthetic corpora without stopwords
    (see gopher_quality).  The rule operators' own contract is
    (doc_id, text), so custom column names normalize in and rename back
    out here.  ``text_col``/``min_stop`` are keyword-only: a positional
    third argument intended as min_stop would otherwise silently become
    the text column."""
    norm = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    keep_g = (
        gopher_quality(norm, min_stop=min_stop)
        .filter("passes")
        .select(F.col("doc_id").alias(id_col))
    )
    keep_c = c4_quality(norm).filter("passes").select(
        F.col("doc_id").alias(id_col)
    )
    return docs.join(keep_g, id_col).join(keep_c, id_col)


def _land_ids(ids: DataFrame, batch_id: int, sink: str) -> None:
    """Batch-keyed idempotent landing (the engine's sink discipline —
    same idiom as queries/windows._land_batch): a replayed batch
    overwrites its own partition, never double-appends.  The overwrite
    mode is scoped to THIS writer via .option — mutating the session
    conf would leak dynamic semantics to concurrent writers."""
    ids.withColumn("batch", F.lit(int(batch_id))).repartition(
        1
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("batch").parquet(sink)


def curation_ingest_batch(
    batch_docs: DataFrame,
    work_dir: str,
    batch_id: int,
    bench_grams: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_filter=default_quality_filter,
    digest_kwargs: dict | None = None,
    neardup_kwargs: dict | None = None,
    stats_out: dict | None = None,
) -> None:
    """Ingest one batch through the delta-bound curation tail (module
    docstring).  ``batch_id`` keys the sink landings (replay-
    idempotent); batches must arrive in ascending ``id_col`` ranges for
    the survivor-set-equals-batch-pipeline contract.  ``bench_grams``
    (from queries.curation.benchmark_grams) enables decontamination;
    ``quality_filter`` is any per-doc-pure gate with the signature
    ``gate(docs, id_col=..., text_col=...) -> DataFrame`` — it is
    always invoked with both keywords (None to skip the stage).
    ``digest_kwargs`` / ``neardup_kwargs`` are
    partition-granularity knobs frozen into the indexes on the first
    batch (data-volume sizing — see the index docstrings).

    ``stats_out`` keys: rows_in, rows_quality, rows_exact,
    contaminated — plus ``skipped=True`` when ``batch_id`` was already
    completed (a replay no-op; see the module docstring's crash
    posture)."""
    from streaming_spark.queries.curation import decontaminate_against

    os.makedirs(work_dir, exist_ok=True)
    pending = os.path.join(work_dir, _PENDING)
    if os.path.isfile(pending):
        with open(pending, encoding="utf-8") as f:
            pb = json.load(f)
        raise RuntimeError(
            f"curation_ingest_batch: {pending!r} exists — batch "
            f"{pb.get('batch_id')} crashed mid-ingest (its index appends "
            "may be partially landed).  Recover first with "
            "curation_recover_batch(spark, work_dir), then re-ingest."
        )
    if batch_id <= _last_batch_id(work_dir):
        # a replay of a COMPLETED batch: the index appends already
        # landed, so re-running them would double-land rows and flip
        # every decision to is_dup — skip instead (exactly-once)
        if stats_out is not None:
            stats_out.update(
                skipped=True, rows_in=0, rows_quality=0, rows_exact=0,
                contaminated=0,
            )
        return

    docs = batch_docs
    n_in = None
    if stats_out is not None:
        n_in = docs.count()
    # the pending marker records the batch's ids (bounded) so the
    # composed recovery can tombstone them from every index
    id_rows = (
        batch_docs.select(id_col).distinct().limit(100_001).collect()
    )
    batch_ids = (
        sorted(r[0] for r in id_rows) if len(id_rows) <= 100_000 else None
    )
    _write_json_atomic(
        pending, {"batch_id": int(batch_id), "ids": batch_ids}
    )
    filtered = (
        quality_filter(docs, id_col=id_col, text_col=text_col)
        if quality_filter is not None
        else docs
    ).localCheckpoint(eager=True)

    # cross-doc line dedup: the line-digest index's append decisions
    # ARE the removal set (seen in an earlier batch, or not first
    # within this one)
    lines_idx = os.path.join(work_dir, _LINES)
    dig = line_digests(filtered, text_col, id_col)
    dkw = dict(digest_kwargs or {})
    if not os.path.isfile(os.path.join(lines_idx, "_params.json")):
        dec_l = digest_index_build(
            lines_idx, dig, digest_col="h",
            order_cols=(id_col, "line_no"), **dkw,
        )
    else:
        dec_l = digest_index_append(lines_idx, dig)
    removals = dec_l.filter("is_dup").groupBy(id_col).agg(
        F.collect_list("line_no").alias("removed"),
        F.count(F.lit(1)).alias("n_rm"),
    )
    cleaned = apply_line_removals(
        filtered, removals, text_col, id_col
    ).localCheckpoint(eager=True)

    # exact dedup on the cleaned digest: same split of the keep-min-id
    # window
    hashes_idx = os.path.join(work_dir, _HASHES)
    if not os.path.isfile(os.path.join(hashes_idx, "_params.json")):
        dec_e = digest_index_build(
            hashes_idx, cleaned, digest_col="cleaned_hash",
            order_cols=(id_col,), **dkw,
        )
    else:
        dec_e = digest_index_append(hashes_idx, cleaned)
    keep_ids = dec_e.filter("NOT is_dup").select(id_col)
    exact_batch = filtered.join(keep_ids, id_col).localCheckpoint(
        eager=True
    )
    _land_ids(
        exact_batch.select(id_col), batch_id,
        os.path.join(work_dir, _EXACT_SINK),
    )

    # near-dup: the staged index's delta probe (signatures computed
    # once, banded join delta-vs-index + delta-vs-delta only)
    nd_idx = os.path.join(work_dir, _ND)
    if not os.path.isfile(os.path.join(nd_idx, "_params.json")):
        neardup_index_build(
            nd_idx, exact_batch, text_col=text_col, id_col=id_col,
            **(neardup_kwargs or {}),
        )
    else:
        neardup_index_append(nd_idx, exact_batch)

    # decontamination flags are per-doc pure: flag at ingest.
    # decontaminate_against's contract is (doc_id, text, source) —
    # normalize in and rename back out, so the composition works for
    # any id/text column names and sourceless corpora
    n_contam = 0
    if bench_grams is not None:
        corpus = exact_batch.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("text"),
            (
                F.col("source")
                if "source" in exact_batch.columns
                else F.lit("").alias("source")
            ),
        )
        flags = decontaminate_against(corpus, bench_grams)
        contam = flags.filter("contaminated").select(
            F.col("doc_id").alias(id_col)
        )
        if stats_out is not None:
            # checkpoint only when the landing AND the stats count both
            # consume it — without stats there is a single consumer and
            # the eager materialization would be pure overhead
            contam = contam.localCheckpoint(eager=True)
        _land_ids(
            contam, batch_id, os.path.join(work_dir, _CONTAM_SINK)
        )
        if stats_out is not None:
            n_contam = contam.count()

    # batch complete: record it, then clear the marker — a crash
    # between the two leaves a marker whose batch_id is ≤ the recorded
    # last, which curation_recover_batch recognizes as ALREADY COMPLETE
    # and resolves by dropping the marker alone (tombstoning a
    # completed batch would destroy legitimate rows the skip rule never
    # re-ingests); the reverse order would let a replay re-run a
    # completed batch
    _write_json_atomic(
        os.path.join(work_dir, _META), {"last_batch_id": int(batch_id)}
    )
    os.remove(pending)
    if stats_out is not None:
        stats_out.update(
            skipped=False,
            rows_in=n_in,
            rows_quality=filtered.count(),
            rows_exact=exact_batch.count(),
            contaminated=n_contam,
        )


def curation_recover_batch(spark, work_dir: str,
                           stats_out: dict | None = None) -> None:
    """Recover a crashed :func:`curation_ingest_batch` (its
    ``.batch_pending`` marker exists).  Two cases:

    - the marker's batch_id is ≤ the recorded last completed batch: the
      crash fell between the completion record and the marker removal —
      the batch IS complete, so recovery is dropping the marker (a
      tombstone here would destroy legitimate rows the skip rule never
      re-ingests);
    - otherwise the batch is partial: tombstone the marker's ids in
      every index that exists (an index whose own ``.append_pending``
      marker is set accepts exactly this takedown and clears it; an
      index the batch never reached records zero removals — pinned per
      index), compact each (folding the ledgers so the re-ingest's
      tombstone-conflict gate passes), drop the batch's sink
      partitions, clear the marker.  Then re-ingest the batch under the
      same batch_id.

    ``stats_out`` keys: batch_id, completed (bool)."""
    from streaming_spark.operators.digest_index import (
        digest_index_compact,
        digest_index_tombstone,
    )
    from streaming_spark.operators.neardup_index import (
        neardup_index_compact,
        neardup_index_tombstone,
    )

    pending = os.path.join(work_dir, _PENDING)
    if not os.path.isfile(pending):
        raise ValueError(
            f"curation_recover_batch: no {_PENDING} marker under "
            f"{work_dir!r} — nothing to recover."
        )
    with open(pending, encoding="utf-8") as f:
        pb = json.load(f)
    batch_id, ids = int(pb["batch_id"]), pb.get("ids")
    completed = batch_id <= _last_batch_id(work_dir)
    if not completed:
        if ids is None:
            raise RuntimeError(
                f"curation_recover_batch: batch {batch_id} was too "
                "large for its ids to be recorded — recover manually "
                "per the index docstrings (tombstone the batch's ids in "
                "each index, compact, drop the batch's sink partitions, "
                "delete the marker), then re-ingest."
            )
        for sub, tomb, compact in (
            (_LINES, digest_index_tombstone, digest_index_compact),
            (_HASHES, digest_index_tombstone, digest_index_compact),
            (_ND, neardup_index_tombstone, neardup_index_compact),
        ):
            idx = os.path.join(work_dir, sub)
            if os.path.isfile(os.path.join(idx, "_params.json")):
                tomb(spark, idx, ids)
                compact(spark, idx)
        for sink in (_EXACT_SINK, _CONTAM_SINK):
            shutil.rmtree(
                os.path.join(work_dir, sink, f"batch={batch_id}"),
                ignore_errors=True,
            )
    os.remove(pending)
    if stats_out is not None:
        stats_out.update(batch_id=batch_id, completed=completed)


def curation_survivors(spark, work_dir: str) -> DataFrame:
    """The end-of-stream fold: accumulated exact-dedup survivors minus
    near-dup keep-one drops (connected components over the MAINTAINED
    pair table → keep the min id per component) minus contaminated ids.
    Metadata-scale — reads the id sinks and the pair table, never the
    corpus.  Returns one ``id_col`` column; under ordered ingest the
    set EXACTLY equals the batch pipeline's (the registered
    ``incremental_curation_maintenance`` witness)."""
    from streaming_spark.operators.dedup import dedup_keep_one

    # a crashed mid-ingest work dir must refuse loudly, not fold a
    # partial state into a silently smaller survivor set (the or-empty
    # sink guard below would otherwise mask exactly that)
    pending = os.path.join(work_dir, _PENDING)
    if os.path.isfile(pending):
        with open(pending, encoding="utf-8") as f:
            pb = json.load(f)
        raise RuntimeError(
            f"curation_survivors: {pending!r} exists — batch "
            f"{pb.get('batch_id')} crashed mid-ingest.  Recover first "
            "with curation_recover_batch(spark, work_dir)."
        )

    # an empty work dir would otherwise surface digest_index's internal
    # "not a digest index" error, misdirecting the caller toward
    # digest_index_build when the fix is ingesting a batch (ADVICE r13)
    hashes_idx = os.path.join(work_dir, _HASHES)
    if not os.path.isfile(os.path.join(hashes_idx, _PARAMS)):
        raise ValueError(
            f"curation_survivors: no batches ingested under {work_dir!r} "
            "— run curation_ingest_batch first."
        )
    p = _dig_params(hashes_idx)
    id_col, id_type = p["order_cols"][0], p["order_types"][0]

    def sink_ids(name: str) -> DataFrame:
        # a sink whose every batch landed zero rows is a DIRECTORY with
        # no files — spark.read.parquet cannot infer a schema from it
        # (empirically: AnalysisException UNABLE_TO_INFER_SCHEMA), so
        # the READ goes through an or-empty guard; the column selection
        # stays OUTSIDE the try so schema drift surfaces loudly instead
        # of being swallowed into an empty frame
        path = os.path.join(work_dir, name)
        from pyspark.errors import AnalysisException

        try:
            df = spark.read.parquet(path)
        except AnalysisException:
            return spark.createDataFrame([], f"{id_col} {id_type}")
        return df.select(id_col)

    exact_ids = sink_ids(_EXACT_SINK)
    pairs = neardup_index_pairs(spark, os.path.join(work_dir, _ND))
    out = dedup_keep_one(exact_ids, pairs, id_col)
    if os.path.isdir(os.path.join(work_dir, _CONTAM_SINK)):
        out = out.join(sink_ids(_CONTAM_SINK), id_col, "left_anti")
    return out
