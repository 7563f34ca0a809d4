"""Iterative graph computation over edge-list DataFrames.

Complements ``dedup.connected_components`` (label propagation) with a
NUMERIC iterative algorithm: PageRank, expressed as repeated
join+aggregate rounds — the canonical Spark formulation (each round is
one shuffle of the edge list; ``localCheckpoint`` truncates lineage so
iteration i does not replay i-1 predecessors).

Used by the dedup surface to pick a CENTRAL representative per near-dup
cluster (the member most similar to the rest) instead of the arbitrary
min-id — the quality-aware keeper policy for training corpora, where
the most-connected duplicate is usually the canonical copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    pairs: DataFrame,
    damping: float = 0.85,
    max_iter: int = 15,
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank over an UNDIRECTED edge list ``(id_a, id_b)`` →
    ``(id, rank)``, ranks summing to ~1 over the graph.

    Undirected means each edge contributes both ways, so every listed
    node has out-degree ≥ 1 — no dangling-mass correction needed (the
    near-dup pair graphs this serves are symmetric by construction).
    Each iteration: contributions = ranks/degree pushed along edges,
    then rank = (1-d)/N + d·Σ contributions — one edge-keyed shuffle
    per round, fixed iteration count for determinism, lineage truncated
    every ``checkpoint_every`` rounds (each truncation eagerly
    materializes the ranks frame, so the cadence trades lineage depth
    against materialization count — every round for deep graphs /
    many iterations, sparser for the shallow cluster graphs dedup
    feeds).  At 100 TB scale the edge list is the big side and stays
    partitioned by node; ranks/degrees are node-sized."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    degrees = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = degrees.select(F.col("src").alias("id"))
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    base = (1.0 - damping) / n_nodes
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes)).localCheckpoint()
    for it in range(max_iter):
        contribs = (
            edges.join(ranks, edges.src == ranks.id)
            .join(degrees, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0 or it == max_iter - 1:
            ranks = ranks.localCheckpoint()
    return ranks
