"""Candidate-volume telemetry as a first-class contract (VERDICT r7
#4): every blocking family must EXPOSE its candidate volume, the
estimator must agree with the physical candidate stage, and the
quadratic-volume warning must fire exactly when blocking fails to
prune.  A blocking strategy whose candidate count nobody can observe is
indistinguishable from an all-pairs join until it falls over at 100×.

Families gated here:
- blocked-exact cosine pairs (IVF cell-ring blocks, driver-side exact
  volume via ``stats_out``)
- symmetric-deletion fuzzy matching (variant-hash buckets)
- q-gram cosine join (gram postings)
- duplicate-span detection (rolling-hash hot windows)
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from streaming_spark.io import load_table
from streaming_spark.telemetry import (
    QuadraticCandidateVolumeWarning,
    log_candidate_volume,
    self_join_candidate_volume,
)
from tests.conftest import SF_SMOKE


def test_warning_fires_only_when_not_pruning():
    with pytest.warns(QuadraticCandidateVolumeWarning):
        log_candidate_volume("t", candidates=60, n_items=12)  # 66 pairs
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("error")
        log_candidate_volume("t", candidates=10, n_items=12)  # 15% — quiet
        log_candidate_volume("t", candidates=0, n_items=0)  # degenerate


def test_blocked_pairs_volume_clustered_vs_uniform(spark):
    """The blocked-exact pair path exposes its EXACT driver-side volume:
    on the clustered corpus the prune keeps candidates ≪ N²/2 (quietly);
    on the near-uniform fixture no sound geometric bound can prune, and
    the path must SAY so (QuadraticCandidateVolumeWarning) rather than
    silently run a quadratic verify."""
    from streaming_spark.operators.similarity import cosine_pairs
    from streaming_spark.queries.northstar import _clustered_embeddings

    clustered = _clustered_embeddings(spark, SF_SMOKE)
    stats: dict = {}
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("error", QuadraticCandidateVolumeWarning)
        out = cosine_pairs(
            clustered, threshold=0.85, mode="blocked", stats_out=stats
        )
    n_true = out.count()
    assert stats["candidates"] <= 0.35 * stats["total_pairs"], stats
    assert stats["candidates"] >= n_true  # sound: candidates ⊇ true pairs

    uniform = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    with pytest.warns(QuadraticCandidateVolumeWarning):
        cosine_pairs(uniform, threshold=0.4, mode="blocked")


def test_fuzzy_variant_estimator_within_2x_of_actual(spark):
    """Symmetric-deletion blocking: the histogram estimator
    (Σ n·(n−1)/2 over variant buckets — the exact pre-distinct join
    volume) must bound the distinct candidate count from above and stay
    within 2× of it on the fixture (a pair sharing several deletion
    variants is counted once per variant; the slack is that
    multiplicity)."""
    from streaming_spark.operators.fuzzy import deletion_variants

    cust = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("__id"), F.col("c_name").alias("__s")
    )
    variants = cust.select(
        "__id", F.explode(deletion_variants("__s", 1)).alias("__vs")
    ).select("__id", F.xxhash64("__vs").alias("__v"))
    est = self_join_candidate_volume(variants, "__v")
    actual = (
        variants.alias("a")
        .join(variants.alias("b"), "__v")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
        .count()
    )
    assert actual <= est <= 2 * max(actual, 1), (est, actual)
    # the operator's opt-in runtime telemetry must report the same
    # estimate (fuzzy_self_pairs stats_out)
    from streaming_spark.operators.fuzzy import fuzzy_self_pairs

    stats: dict = {}
    fuzzy_self_pairs(
        load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name"),
        "c_name",
        "c_custkey",
        max_dist=1,
        stats_out=stats,
    )
    assert stats["candidates"] == est


def test_qgram_postings_estimator_equals_join_volume(spark):
    """Gram-postings blocking: the histogram estimator IS the exact
    number of rows the gram-keyed self-join pushes into the dot-product
    aggregate — assert equality against the physical join so the
    estimator can never drift from the plan it describes."""
    docs = load_table(spark, SF_SMOKE, "documents").filter(
        (F.col("doc_id") % 5 == 0) & (F.length("text") >= 3)
    )
    grams = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 2),
                lambda i: F.substr(F.col("text"), i, F.lit(3)),
            )
        ).alias("gram"),
    )
    tf = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("tf"))
    est = self_join_candidate_volume(tf, "gram")
    a = tf.select(F.col("doc_id").alias("id_a"), "gram")
    b = tf.select(F.col("doc_id").alias("id_b"), "gram")
    actual = a.join(b, "gram").filter(F.col("id_a") < F.col("id_b")).count()
    assert est == actual and est > 0


def test_span_hot_hash_estimator_equals_candidate_positions(spark):
    """Duplicate-span blocking: the per-hash histogram (positions per
    hash, restricted to hashes spanning >1 distinct doc) must equal the
    number of candidate positions the verify stage receives."""
    from streaming_spark.operators.text import window_hashes

    width = 40
    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.length("text") >= width
    )
    wh = window_hashes(docs, "text", "doc_id", width=width)
    hist = wh.groupBy("h").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("nd"),
    )
    est = (
        hist.filter(F.col("nd") > 1)
        .agg(F.sum("n").alias("s"))
        .first()["s"]
        or 0
    )
    hot = hist.filter(F.col("nd") > 1).select("h")
    actual = wh.join(hot, "h").count()
    assert est == actual and est > 0
