"""Candidate-volume telemetry for blocking strategies (VERDICT r7 #4).

Every near-dup / similarity family in the engine is a candidate-
generation + exact-verify pipeline: a blocking key (IVF cell-ring, LSH
band, deletion-variant hash, q-gram, rolling span hash) bounds which
pairs reach the exact verify.  Blocking is only a scale story while the
candidate volume stays far below N²/2 — and whether it does is a DATA
property (a near-uniform high-d embedding corpus defeats any sound
geometric prune; a hot q-gram defeats postings blocking).  A plan that
silently runs a quadratic shuffle is indistinguishable from one that
pruned — until it falls over at 100×.

So candidate volume is a first-class, OBSERVABLE contract:

- ``self_join_candidate_volume`` computes the EXACT number of rows a
  key-equality self-join blocking pushes into its verify stage —
  Σ_key n·(n−1)/2 — from the keyed frame, in one small aggregate.
  That is an upper bound on distinct candidate PAIRS (a pair sharing
  several keys is counted per key, and a downstream ``distinct`` may
  dedup it) but it is the exact JOIN volume, which is what the shuffle
  pays for.  Tests gate each family: estimate ≥ actual always, and
  estimate ≤ 2× actual on the fixture (tests/test_candidates.py).
- ``scan_files_rows`` is the SCAN-accounting primitive behind the
  layout probes (layout_partitioned_pruning, layout_zorder_pruning,
  ann_topk_ivfpq_pruned): one row of (files, rows) a frame's scan
  actually touched, with the project-input_file_name-before-aggregating
  subtlety owned in one place.
- ``log_candidate_volume`` records the volume against the all-pairs
  ceiling and raises :class:`QuadraticCandidateVolumeWarning` when the
  blocking kept ≥ ``warn_fraction`` of all pairs — the loud signal
  VERDICT r7 asked for instead of a silent quadratic shuffle.  The
  blocked-exact cosine path computes its volume driver-side (allowlist
  × block histogram — exact, free) and routes it through here before
  launching the join.
"""

from __future__ import annotations

import logging
import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger("streaming_spark.candidates")


class QuadraticCandidateVolumeWarning(RuntimeWarning):
    """A blocking strategy's candidate volume is approaching the
    all-pairs ceiling — the plan is effectively quadratic on this data.
    Correctness is unaffected (verify is exact); cost is the issue.
    Remedies are strategy-specific: more cells/rings or a higher
    threshold (blocked cosine), a ``max_bucket`` cap (fuzzy variants,
    LSH bands), a document-frequency ceiling (q-grams), or an explicit
    approximate mode where the contract tolerates recall < 1."""


def self_join_candidate_volume(keyed: DataFrame, key_cols: list[str] | str) -> int:
    """EXACT row count of the candidate stage of a key-equality
    self-join blocking over ``keyed`` (one row per (item, key)):
    Σ over keys of n·(n−1)/2.  One groupBy + one scalar agg — metadata
    cost, safe to run eagerly before committing to the join."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    row = (
        keyed.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        # integer `div`, not `/`: BIGINT `/` goes through DOUBLE and a
        # bucket of ≳1.3e8 members would round — n·(n−1) is even, so
        # the integral division is exact at any size
        .agg(F.sum(F.expr("__n * (__n - 1) div 2")).alias("__cand"))
        .first()
    )
    return int(row["__cand"] or 0)


def log_candidate_volume(
    label: str,
    candidates: int,
    n_items: int,
    warn_fraction: float = 0.5,
    total_pairs: int | None = None,
) -> None:
    """Record a blocking strategy's candidate volume against the
    all-pairs ceiling; warn loudly when blocking is not pruning.
    ``total_pairs`` overrides the default unordered n·(n−1)/2 ceiling —
    top-k search counts ORDERED (query, member) candidates, so its
    ceiling is n·(n−1)."""
    total = (
        total_pairs
        if total_pairs is not None
        else n_items * (n_items - 1) // 2
    )
    frac = candidates / total if total else 0.0
    log.info(
        "%s: %d candidate pairs over %d items (%.1f%% of the %d-pair "
        "all-pairs ceiling)",
        label,
        candidates,
        n_items,
        100.0 * frac,
        total,
    )
    if total > 0 and candidates >= warn_fraction * total:
        warnings.warn(
            f"{label}: candidate volume {candidates} is "
            f"{100.0 * frac:.0f}% of the all-pairs ceiling "
            f"({total} pairs over {n_items} items) — blocking is not "
            f"pruning on this data and the verify stage is effectively "
            f"quadratic; see QuadraticCandidateVolumeWarning for "
            f"remedies",
            QuadraticCandidateVolumeWarning,
            stacklevel=3,
        )


def scan_files_rows(df: DataFrame) -> DataFrame:
    """One-row (files, rows) accounting of what ``df``'s scan actually
    touched — the layout-probe primitive behind
    layout_partitioned_pruning / layout_zorder_pruning /
    ann_topk_ivfpq_pruned.  The load-bearing subtlety lives HERE once:
    ``input_file_name()`` is non-deterministic, so it must be PROJECTED
    before any aggregate (an agg over it directly fails analysis with
    AGGREGATE_FUNCTION_WITH_NONDETERMINISTIC_EXPRESSION)."""
    return df.select(F.input_file_name().alias("__f")).agg(
        F.countDistinct("__f").alias("files"),
        F.count(F.lit(1)).alias("rows"),
    )
