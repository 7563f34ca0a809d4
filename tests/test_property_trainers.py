"""Degenerate-input property tests for every driver-side trainer
(VERDICT r9 #4): the unigram EM crash showed that fixture-shaped inputs
don't exercise the skew/underflow corners, so each trainer gets a
randomized or adversarial test over inputs the gate never produces —
thin samples (fewer rows than centroids), duplicate and zero vectors,
constant matrices, self-loop / multi-component graphs.

BPE (`test_bpe_learn_encode_invariants`) and unigram
(`test_unigram_segmentation_properties`) live in
tests/test_property_roundtrip.py; this file covers the numeric
trainers: spherical k-means, the shared PQ codebook loop, OPQ, and
PageRank.
"""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from streaming_spark.operators.similarity import (
    _norm_rows,
    _spherical_kmeans,
    _train_pq_books,
)

# small float matrices, adversarial by construction: tiny magnitudes,
# exact duplicates (min row count 1, values from a 5-element pool makes
# collisions common), all-zero rows
_cell = st.sampled_from([0.0, 1.0, -1.0, 1e-300, 3.5])
_dim = 4


def _rows(min_rows=1, max_rows=24):
    return st.lists(
        st.lists(_cell, min_size=_dim, max_size=_dim),
        min_size=min_rows,
        max_size=max_rows,
    )


@given(_rows(), st.integers(1, 12))
@settings(max_examples=80, deadline=None)
def test_spherical_kmeans_degenerate_inputs(rows, n_cells):
    """For ANY sample (duplicates, zero vectors, fewer rows than cells):
    the trainer returns ≤ n_cells finite centroids, each unit-norm or
    exactly zero (the zero-guard contract of _norm_rows), and is
    deterministic."""
    mat = _norm_rows(np.array(rows, dtype=np.float64))
    cent = _spherical_kmeans(mat, n_cells, n_iters=4)
    assert cent.shape == (min(n_cells, len(mat)), _dim)
    assert np.isfinite(cent).all()
    norms = np.linalg.norm(cent, axis=1)
    assert np.all((np.abs(norms - 1.0) < 1e-9) | (norms == 0.0))
    assert np.array_equal(cent, _spherical_kmeans(mat, n_cells, n_iters=4))


@given(_rows(), st.sampled_from([1, 2, 4]), st.integers(1, 16))
@settings(max_examples=80, deadline=None)
def test_train_pq_books_degenerate_inputs(rows, m, ksub):
    """For ANY sample and ANY (m, ksub) — including ksub far above the
    row count, the shape that crashed the old inlined loops: full
    (m, ksub, dsub) codebooks, all finite, deterministic, and every
    sample row reconstructs to a finite nearest-centroid."""
    assert _dim % m == 0
    dsub = _dim // m
    mat = np.array(rows, dtype=np.float64)
    books = _train_pq_books(mat, m, ksub, dsub, n_iters=4)
    assert books.shape == (m, ksub, dsub)
    assert np.isfinite(books).all()
    assert np.array_equal(books, _train_pq_books(mat, m, ksub, dsub, n_iters=4))
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        assert np.isfinite(d2.min(axis=1)).all()


def test_trainers_empty_sample_raise_loudly():
    """An empty sample is a caller bug (no vectors contributed): both
    driver-side trainers raise a clear ValueError instead of the opaque
    numpy axis error the old code died with."""
    empty = np.empty((0, _dim))
    with pytest.raises(ValueError, match="empty sample"):
        _spherical_kmeans(empty, 4)
    with pytest.raises(ValueError, match="empty sample"):
        _train_pq_books(empty, 2, 8, _dim // 2, 4)


def test_quantizers_thin_vectors_frame(spark):
    """DataFrame-level trainers survive a vectors frame SMALLER than
    every centroid budget (3 rows vs ksub=16/n_cells=8), with a zero
    vector and an exact duplicate in the mix — the input shape a tiny
    tenant corpus or an aggressive filter produces.  The old inlined
    loops hard-crashed on `books[j] = cent` here."""
    from streaming_spark.operators.similarity import (
        ivf_centroids,
        ivfpq_local_codebooks,
        ivfpq_residual_codebooks,
        opq_train,
        opq_train_residual,
        pq_codebooks,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),
        (2, [0.0] * 8),  # zero vector: stays zero through _norm_rows
        (3, [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),  # exact duplicate
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")

    cent = ivf_centroids(df, 8, n_cells=8)
    assert cent.shape[0] <= 8 and cent.shape[1] == 8
    assert np.isfinite(cent).all()

    books = pq_codebooks(df, 8, m=2, ksub=16)
    assert books.shape == (2, 16, 4) and np.isfinite(books).all()

    rbooks = ivfpq_residual_codebooks(df, cent, 8, m=2, ksub=16)
    assert rbooks.shape == (2, 16, 4) and np.isfinite(rbooks).all()

    rot, obooks = opq_train(df, 8, m=2, ksub=16, n_opq_iters=2)
    assert np.allclose(rot.T @ rot, np.eye(8), atol=1e-9)  # orthogonal
    assert obooks.shape == (2, 16, 4) and np.isfinite(obooks).all()

    rot2, obooks2 = opq_train_residual(df, cent, 8, m=2, ksub=16, n_opq_iters=2)
    assert np.allclose(rot2.T @ rot2, np.eye(8), atol=1e-9)
    assert obooks2.shape == (2, 16, 4) and np.isfinite(obooks2).all()

    local = ivfpq_local_codebooks(df, cent, 8, m=2, ksub=16)
    assert local.shape == (cent.shape[0], 2, 16, 4) and np.isfinite(local).all()


def test_pagerank_degenerate_graphs(spark):
    """PageRank invariants on the graphs the near-dup pair surface can
    actually emit: self-loops, a multi-component graph, and a single
    edge.  Ranks are positive, sum to ~1 over the graph, the
    most-connected node wins within its component, and two runs agree
    exactly (fixed iteration count)."""
    from streaming_spark.operators.graph import pagerank

    def run(edges):
        df = spark.createDataFrame(edges, "id_a BIGINT, id_b BIGINT")
        return {r.id: r.rank for r in pagerank(df, max_iter=8).collect()}

    # two components: a 3-star (hub 10) and one isolated pair, plus a
    # self-loop on the hub and a duplicate edge listed both ways
    edges = [(10, 11), (10, 12), (10, 13), (10, 10), (11, 10), (20, 21)]
    ranks = run(edges)
    assert set(ranks) == {10, 11, 12, 13, 20, 21}
    assert all(r > 0 for r in ranks.values())
    assert math.isclose(sum(ranks.values()), 1.0, rel_tol=1e-6)
    assert ranks[10] == max(ranks.values())  # hub wins its component
    assert math.isclose(ranks[20], ranks[21])  # symmetric pair ties
    assert ranks == run(edges)  # deterministic

    single = run([(1, 2)])
    assert math.isclose(sum(single.values()), 1.0, rel_tol=1e-6)
    assert math.isclose(single[1], single[2])

    # empty graph: empty result, no crash
    empty = spark.createDataFrame([], "id_a BIGINT, id_b BIGINT")
    assert pagerank(empty).count() == 0
