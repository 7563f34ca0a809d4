"""Incrementally-maintained exact-dedup digest index.

The exact/line dedup stages of a curation pipeline are windowed ARGMIN
queries over content digests (``dedup_exact``: keep min doc_id per
md5(text); ``q_line_dedup``: keep the first (doc_id, line_no) per line
digest).  Re-running those windows over the accumulated corpus per
ingest batch is O(N)/batch — the same accumulate-then-recompute shape
the near-dup (operators/neardup_index.py) and ANN (similarity.py
ann_index_*) families already replace with staged indexes.  This module
completes the trio for the FIRST dedup stage every ingest pipeline
runs: a staged digest-occurrence index probed delta-vs-index only.

Index layout (all under one caller-owned ``index_dir``)::

    _params.json        frozen digest/order columns + partition knobs
    occ/ pb=P/ib=B/…    one row per ingested occurrence
                        (digest, *order_cols), partitioned by a
                        digest-hash prefix (probe pruning) and an
                        id-hash bucket (compact pruning)
    doc_tombstones/ …   (id)  takedown ledger (merge-on-read)

Semantics — the index stores ALL occurrences, not a membership set, so
two views coexist:

- :func:`digest_index_owners` — the ARGMIN serve view: for every
  digest, the minimal live ``order_cols`` tuple.  EXACT against the
  batch window (min per digest group over the live corpus) at every
  lifecycle point, under ANY ingest order and after takedowns: a
  takedown of an owner automatically promotes the next-smallest live
  occurrence because the dup occurrences were stored too.
- :func:`digest_index_append`'s returned per-row decisions (``is_dup``)
  — the ingest-time keep-first call: a delta row is a dup iff its
  digest has a live occurrence already indexed OR an earlier row within
  the same delta.  Under the ORDERED-INGEST contract (batches arrive in
  ascending ``order_cols`` ranges — ids assigned at ingest, the
  production shape) these decisions equal the batch window's and are
  final; out-of-order backfill or takedowns can promote a previously
  rejected occurrence, which the owners view reflects and recorded
  decisions do not — the owners-based resync is implemented as
  ``curation_incremental.curation_backfill`` (decisions are never
  consulted there).

Scale shape: an append probes the index pruned to the delta's
digest-prefix (``pb=``) partitions with the delta digests broadcast
under a bound — the probe scan is bounded by the delta's prefix union,
never shuffles the index, and reads digest rows only (never text).
A compact rewrites only the victims' id-bucket (``ib=``) partitions.
``n_prefixes`` / ``n_id_buckets`` are DATA-VOLUME knobs (~128 MB per
partition at deployment, fixture-small defaults) — the measured
small-files law from the near-dup index (ROADMAP r12: 256×64 partitions
3-4× slower than 16×16 at 100k docs) applies verbatim.

Reference precedent: replaces the reference's store/scan accumulate
idiom (reference tests/py_pkg_examples.sh:40-47) for the exact-dedup
half of the incremental curation tail, exactly as neardup_index.py did
for the near-dup half (VERDICT r12 #1).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from streaming_spark.operators.index_commit import (
    clear_marker,
    park_and_swap,
    read_marker,
    read_table_or_empty,
    write_marker,
)

_PARAMS_NAME = "_params.json"
_FORMAT = "streaming-spark-digestidx"


# ---------------------------------------------------------------- params


def _params_path(index_dir: str) -> str:
    return os.path.join(index_dir, _PARAMS_NAME)


def _load_params(index_dir: str) -> dict:
    path = _params_path(index_dir)
    if not os.path.isfile(path):
        raise ValueError(
            f"{index_dir!r} is not a digest index (no {_PARAMS_NAME}) — "
            "create one with digest_index_build first."
        )
    with open(path, encoding="utf-8") as f:
        p = json.load(f)
    if p.get("format") != _FORMAT or p.get("version") != 1:
        raise ValueError(f"unrecognized digest index format at {path!r}")
    return p


def _check_siblings(index_dir: str, what: str) -> None:
    """Refuse an index whose on-disk state says a previous operation
    crashed mid-mutation — same recover-first posture as the near-dup
    and ANN index families."""
    park = os.path.join(index_dir, ".compact_old")
    if os.path.isdir(park):
        raise RuntimeError(
            f"{what}: {park!r} exists — a previous digest_index_compact "
            "crashed mid-swap and some partitions are parked there "
            "(absent from the index).  Recover first: move each parked "
            "directory back, remove the .compact/.compact_old siblings, "
            "then re-run the compact."
        )
    pending = os.path.join(index_dir, ".append_pending")
    if os.path.isfile(pending):
        raise RuntimeError(
            f"{what}: {pending!r} exists — a previous "
            "digest_index_append crashed mid-landing (occurrence rows "
            "may be partially live, so owners and decisions could "
            "silently diverge from the batch arm).  Recover first: run "
            "digest_index_tombstone with the ids recorded in the marker "
            "(it clears this marker on completion), then "
            "digest_index_compact, then re-ingest the batch under the "
            "same ids."
        )


# ------------------------------------------------------------- sub-tables


def _dir(index_dir: str, name: str) -> str:
    return os.path.join(index_dir, name)


def _pb_expr(digest_col, n_prefixes: int):
    return F.pmod(F.xxhash64(digest_col), F.lit(n_prefixes)).cast("int")


def _ib_expr(id_col, n_id_buckets: int):
    return F.pmod(F.xxhash64(id_col), F.lit(n_id_buckets)).cast("int")


def _occ_schema(p: dict) -> str:
    cols = [f"{p['digest_col']} {p['digest_type']}"]
    cols += [f"{c} {t}" for c, t in zip(p["order_cols"], p["order_types"])]
    return ", ".join(cols) + ", pb INT, ib INT"


def _read_or_empty(spark, path: str, schema: str) -> DataFrame:
    return read_table_or_empty(spark, path, schema)


def _doc_tombs(spark, index_dir: str, p: dict) -> DataFrame:
    return _read_or_empty(
        spark,
        _dir(index_dir, "doc_tombstones"),
        f"{p['order_cols'][0]} {p['order_types'][0]}",
    ).distinct()


def _live_occ(spark, index_dir: str, p: dict, pbs=None) -> DataFrame:
    """Occurrence rows minus takedown victims (merge-on-read),
    optionally pruned to a ``pb=`` partition list (planning-time
    partition pruning — the filter reaches the scan)."""
    occ = _read_or_empty(spark, _dir(index_dir, "occ"), _occ_schema(p))
    if pbs is not None:
        occ = occ.filter(F.col("pb").isin(pbs))
    tombs = _doc_tombs(spark, index_dir, p)
    return occ.join(F.broadcast(tombs), p["order_cols"][0], "left_anti")


# ------------------------------------------------------------ operations


def digest_index_build(
    index_dir: str,
    df: DataFrame,
    digest_col: str = "h",
    order_cols=("doc_id",),
    n_prefixes: int = 4,
    n_id_buckets: int = 4,
    stats_out: dict | None = None,
) -> DataFrame:
    """Create a digest index at ``index_dir`` and ingest ``df`` as its
    first batch; returns the batch's per-row keep-first decisions (see
    :func:`digest_index_append`).  Column names and types are FROZEN
    into ``_params.json`` — appends re-load them, so a mixed-schema
    index cannot be assembled silently.  ``order_cols`` is the
    keep-first ordering (``("doc_id",)`` for whole-doc exact dedup,
    ``("doc_id", "line_no")`` for line occurrences); takedowns key on
    its FIRST column.  Refuses an existing index."""
    if os.path.isfile(_params_path(index_dir)):
        raise ValueError(
            f"digest index already exists at {index_dir!r} — append to "
            "it with digest_index_append, or choose a fresh directory."
        )
    order_cols = list(order_cols)
    params = {
        "format": _FORMAT,
        "version": 1,
        "digest_col": digest_col,
        "digest_type": df.schema[digest_col].dataType.simpleString(),
        "order_cols": order_cols,
        "order_types": [
            df.schema[c].dataType.simpleString() for c in order_cols
        ],
        "n_prefixes": n_prefixes,
        "n_id_buckets": n_id_buckets,
    }
    os.makedirs(index_dir, exist_ok=True)
    with open(_params_path(index_dir), "w", encoding="utf-8") as f:
        json.dump(params, f)
    return digest_index_append(index_dir, df, stats_out=stats_out)


def digest_index_append(
    index_dir: str,
    delta: DataFrame,
    stats_out: dict | None = None,
) -> DataFrame:
    """Delta ingest: probe the index for the delta's digests through the
    ``pb=``-pruned scan (delta digests broadcast under a 50k bound),
    decide keep-first per delta row, then land the delta's occurrence
    rows under their own ``pb=/ib=`` partitions.  Returns the delta's
    (digest, *order_cols) rows with ``is_dup`` — true iff the digest has
    a LIVE indexed occurrence or an earlier occurrence within this
    delta (the batch keep-first window, split at the batch boundary —
    exact and final under the ordered-ingest contract; the module
    docstring says what out-of-order backfill/takedowns change).  The
    returned frame is eagerly checkpointed BEFORE the landing, so
    consuming it never re-probes a table that now contains the delta.

    The landing is guarded by an ``.append_pending`` marker (atomic
    tmp + rename, recording the batch's order ids) — while it exists
    every other operation refuses the index; recovery = tombstone the
    marker's ids (clears the marker), compact, re-ingest.  Recovery is
    exact: a partially landed batch's rows vanish merge-on-read once
    tombstoned.

    Cost shape (measured, stress_dedup ``digmaint``, idle box): every
    move is FLAT in N — 10k append ~7 s at N = 100k/500k/1M, takedown
    ~0.5 s, compact 2-3 s, owners equality held throughout.  Honest
    framing: the batch recompute (one digest scan + window) costs under
    1 s at 1M locally, so the index does NOT win local wall seconds —
    its value is corpus BYTES (the recompute re-reads O(corpus) text
    per refresh; the append reads O(delta) text plus the delta's
    digest-prefix partitions — 1.56% of the digest table for a 1-doc
    trickle, stress_dedup ``prune``) and bounded takedown/compact,
    which the recompute has no answer to.

    ``stats_out`` keys: rows_appended, digests_probed, digests_seen,
    new_digests, prefixes_probed, dup_rows."""
    p = _load_params(index_dir)
    _check_siblings(index_dir, "digest_index_append")
    spark = delta.sparkSession
    dcol, ocols = p["digest_col"], p["order_cols"]
    # loud type gate: the partition exprs hash the VALUES, so a delta
    # whose column types drift from the frozen params (int vs bigint,
    # string keys) would land under — and probe — the WRONG partitions
    # silently; refuse instead (same frozen-params ethos as the ANN
    # fingerprint binding)
    for c, t in zip(
        [dcol, *ocols], [p["digest_type"], *p["order_types"]]
    ):
        actual = delta.schema[c].dataType.simpleString()
        if actual != t:
            raise ValueError(
                f"digest_index_append: column {c!r} is {actual}, index "
                f"froze {t} — cast the delta (a mixed-type index would "
                "hash to the wrong partitions)."
            )

    d = delta.select(dcol, *ocols).localCheckpoint(eager=True)
    n_delta = d.count()
    # refuse ids still live in the tombstone ledger: re-ingesting a
    # crashed batch BEFORE the compact step of the recovery sequence
    # would land rows that merge-on-read immediately hides (decisions
    # say kept, owners serve nothing) and that the eventual compact
    # folds away — data loss, silently.  The ledger is small by
    # contract, so this is one broadcast semi-join probe.
    tombs = _doc_tombs(spark, index_dir, p)
    if not d.join(
        F.broadcast(tombs), p["order_cols"][0], "left_semi"
    ).isEmpty():
        raise ValueError(
            "digest_index_append: the delta contains ids that are "
            "still in the tombstone ledger — run digest_index_compact "
            "first (re-ingesting before the fold would land rows the "
            "compact then removes)."
        )
    if n_delta == 0:
        if stats_out is not None:
            stats_out.update(
                rows_appended=0, digests_probed=0, digests_seen=0,
                new_digests=0, prefixes_probed=0, dup_rows=0,
            )
        return d.withColumn("is_dup", F.lit(False))
    # enforce the 'delta ids are NEW' contract (ADVICE r13, parity with
    # neardup_index_append): a replay of a committed batch would
    # double-land occurrence rows and flip its decisions to is_dup —
    # at-least-once ingest makes this reachable, so refuse.  The probe
    # reads the occ table pruned to the delta ids' ib= partitions.
    id0 = ocols[0]
    # d is already checkpointed, so the distinct is cheap to recompute —
    # no extra checkpoint/count jobs (gate-cost: every append runs this)
    delta_ids = d.select(id0).distinct()
    ibs = sorted(
        r[0]
        for r in delta_ids.select(
            _ib_expr(F.col(id0), p["n_id_buckets"]).alias("ib")
        )
        .distinct()
        .collect()
    )
    mb0 = F.broadcast if n_delta <= 50_000 else (lambda x: x)
    if not (
        _read_or_empty(spark, _dir(index_dir, "occ"), _occ_schema(p))
        .filter(F.col("ib").isin(ibs))
        .select(id0)
        .join(mb0(delta_ids), id0, "left_semi")
        .isEmpty()
    ):
        raise ValueError(
            "digest_index_append: the delta contains ids that are "
            "already indexed — delta ids must be NEW (a replayed batch "
            "would double-land occurrence rows and flip its decisions "
            "to is_dup); an upsert is digest_index_tombstone + compact "
            "+ re-append under the same ids."
        )

    batch_digests = (
        d.select(dcol)
        .distinct()
        .withColumn("pb", _pb_expr(F.col(dcol), p["n_prefixes"]))
        .localCheckpoint(eager=True)
    )
    n_digests = batch_digests.count()
    # bounded collect: ≤ n_prefixes values by construction
    pbs = sorted(
        r["pb"] for r in batch_digests.select("pb").distinct().collect()
    )
    mb = F.broadcast if n_digests <= 50_000 else (lambda x: x)
    seen = (
        _live_occ(spark, index_dir, p, pbs=pbs)
        .join(mb(batch_digests.select(dcol)), dcol, "left_semi")
        .select(dcol)
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_seen = seen.count()

    w = Window.partitionBy(dcol).orderBy(*ocols)
    decisions = (
        d.join(mb(seen.withColumn("_seen", F.lit(True))), dcol, "left")
        .withColumn("_rk", F.row_number().over(w))
        .select(
            dcol,
            *ocols,
            (
                F.coalesce(F.col("_seen"), F.lit(False))
                | (F.col("_rk") > 1)
            ).alias("is_dup"),
        )
        .localCheckpoint(eager=True)
    )

    # pending marker BEFORE the landing (same posture and recovery
    # contract as neardup_index_append's).  The recording bound is on
    # DISTINCT order ids, not occurrence rows: the line family lands
    # many rows per doc, and the recovery tombstone needs the doc ids
    # (limit+1 keeps the collect bounded without a separate count job).
    pending = _dir(index_dir, ".append_pending")
    id_rows = d.select(ocols[0]).distinct().limit(100_001).collect()
    batch_ids = (
        sorted(r[0] for r in id_rows) if len(id_rows) <= 100_000 else None
    )
    write_marker(pending, {"ids": batch_ids, "n": n_delta})

    d.withColumn("pb", _pb_expr(F.col(dcol), p["n_prefixes"])).withColumn(
        "ib", _ib_expr(F.col(ocols[0]), p["n_id_buckets"])
    ).repartition("pb", "ib").write.mode("append").partitionBy(
        "pb", "ib"
    ).parquet(_dir(index_dir, "occ"))
    clear_marker(pending)

    if stats_out is not None:
        stats_out.update(
            rows_appended=n_delta,
            digests_probed=n_digests,
            digests_seen=n_seen,
            new_digests=n_digests - n_seen,
            prefixes_probed=len(pbs),
            dup_rows=decisions.filter("is_dup").count(),
        )
    return decisions


def digest_index_tombstone(
    spark,
    index_dir: str,
    ids,
    stats_out: dict | None = None,
) -> None:
    """Takedown: retire every occurrence of the given ids (values of
    ``order_cols[0]``), merge-on-read.  A retired owner's digest is
    automatically served by its next-smallest live occurrence — the
    occurrence table stored the dups — so :func:`digest_index_owners`
    stays exactly the batch window over the live corpus with no
    re-admission machinery (the property the near-dup index needs a
    pair ledger for comes free at membership granularity).

    One ledger append (Spark's committed write — either the batch's
    ledger file lands or it does not), so no pending marker is needed.
    Doubles as the crashed-append recovery entry point: a takedown
    covering ALL of a pending append's recorded ids proceeds and clears
    the ``.append_pending`` marker."""
    p = _load_params(index_dir)
    park = os.path.join(index_dir, ".compact_old")
    if os.path.isdir(park):
        raise RuntimeError(
            f"digest_index_tombstone: {park!r} exists — recover the "
            "crashed compact first (see digest_index_compact)."
        )
    if isinstance(ids, DataFrame):
        # cast to the index's frozen id type: the ib partition expr
        # hashes the value, and xxhash64(int) != xxhash64(bigint) — an
        # uncast frame would prune to the wrong partitions silently
        tomb = ids.select(
            F.col(ids.columns[0])
            .cast(p["order_types"][0])
            .alias(p["order_cols"][0])
        ).distinct()
    else:
        tomb = spark.createDataFrame(
            [(i,) for i in ids],
            f"{p['order_cols'][0]} {p['order_types'][0]}",
        ).distinct()
    tomb = tomb.localCheckpoint(eager=True)
    id_list = sorted(r[0] for r in tomb.collect())  # ledger-small

    append_marker = _dir(index_dir, ".append_pending")
    am = read_marker(append_marker)
    if am is not None:
        am_ids = am.get("ids")
        if am_ids is None:
            raise RuntimeError(
                f"digest_index_tombstone: {append_marker!r} exists but "
                f"the crashed batch was too large ({am.get('n')} rows) "
                "for its ids to be recorded — recover manually: DELETE "
                "the marker file first (this takedown refuses while it "
                "exists), then tombstone the batch's ids "
                "(caller-known), compact, then re-ingest."
            )
        if not set(am_ids) <= set(id_list):
            raise RuntimeError(
                f"digest_index_tombstone: {append_marker!r} exists — a "
                "previous digest_index_append crashed mid-landing.  "
                "Recover first: re-run the takedown including ALL the "
                "ids recorded in the marker (it clears the marker), "
                "then compact, then re-ingest the batch."
            )

    tomb.coalesce(1).write.mode("append").parquet(
        _dir(index_dir, "doc_tombstones")
    )
    if os.path.isfile(append_marker):
        clear_marker(append_marker)  # crashed-append recovery complete
    if stats_out is not None:
        stats_out.update(tombstoned=len(id_list))


def digest_index_compact(spark, index_dir: str) -> dict:
    """Fold the tombstone ledger into the files, rewriting ONLY the
    victims' ``ib=`` id-bucket partitions (computed driver-side from
    the bounded ledger) — unaffected buckets keep their exact files.
    Crash-safe with the park-then-swap discipline of
    neardup_index_compact / ann_index_compact: rewrites stage under
    ``.compact``, replaced directories park under ``.compact_old``
    until every swap lands (other operations refuse the index while a
    park exists), then the park is removed BEFORE the ledger — a crash
    between those two leaves a correct, idempotently re-compactable
    index (merge-on-read already excludes the folded rows).

    Returns stats: occ_rows_removed, parts_rewritten."""
    p = _load_params(index_dir)
    _check_siblings(index_dir, "digest_index_compact")
    doc_t = _doc_tombs(spark, index_dir, p).localCheckpoint(eager=True)
    stats = {"occ_rows_removed": 0, "parts_rewritten": 0}
    if doc_t.isEmpty():
        return stats

    id0 = p["order_cols"][0]
    ibs = sorted(
        r[0]
        for r in doc_t.select(
            _ib_expr(F.col(id0), p["n_id_buckets"]).alias("ib")
        )
        .distinct()
        .collect()
    )
    occ_root = _dir(index_dir, "occ")
    parts = []
    if os.path.isdir(occ_root):
        for pb_dir in sorted(os.listdir(occ_root)):
            if not pb_dir.startswith("pb="):
                continue
            for ib in ibs:
                rel = f"occ/{pb_dir}/ib={ib}"
                if os.path.isdir(_dir(index_dir, rel)):
                    parts.append(rel)

    comp = _dir(index_dir, ".compact")
    park = _dir(index_dir, ".compact_old")
    shutil.rmtree(comp, ignore_errors=True)
    if parts:
        affected = _read_or_empty(spark, occ_root, _occ_schema(p)).filter(
            F.col("ib").isin(ibs)
        )
        survivors = affected.join(F.broadcast(doc_t), id0, "left_anti")
        stats["occ_rows_removed"] = affected.count() - survivors.count()
        survivors.repartition("pb", "ib").write.mode("overwrite").partitionBy(
            "pb", "ib"
        ).parquet(os.path.join(comp, "occ"))

    park_and_swap(index_dir, comp, park, parts)
    stats["parts_rewritten"] = len(parts)
    shutil.rmtree(park, ignore_errors=True)  # park first, ledger second
    shutil.rmtree(_dir(index_dir, "doc_tombstones"), ignore_errors=True)
    shutil.rmtree(comp, ignore_errors=True)
    return stats


def digest_index_owners(spark, index_dir: str) -> DataFrame:
    """The ARGMIN serve view: (digest, *order_cols) of the minimal live
    occurrence per digest — EXACTLY the batch keep-first window
    (``row_number() over (partition by digest order by order_cols) = 1``
    / ``min(doc_id) group by digest``) evaluated over the live corpus,
    at every lifecycle point and under any ingest order (pinned by
    tests/test_digest_index.py).  O(index) — the serve view for audits
    and backfills; per-batch ingest never needs it (append's pruned
    probe answers membership)."""
    p = _load_params(index_dir)
    _check_siblings(index_dir, "digest_index_owners")
    dcol, ocols = p["digest_col"], p["order_cols"]
    live = _live_occ(spark, index_dir, p)
    return (
        live.groupBy(dcol)
        .agg(F.min(F.struct(*ocols)).alias("_o"))
        .select(dcol, *[F.col(f"_o.{c}").alias(c) for c in ocols])
    )
