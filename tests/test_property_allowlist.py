"""Property fuzz of the blocked-exact pair primitive's core theorem:
the triangle-inequality block bound is a SOUND upper bound on every
member-pair cosine — for ANY centroids, ANY assignment geometry, ANY
ring partition (pure numpy, no Spark: this is the driver math recall-1
rests on, so it gets adversarial breadth beyond the seeded fixtures).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from streaming_spark.operators.similarity import (
    _block_pair_allowlist,
    _norm_rows,
)


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(2, 5), st.integers(1, 3))
def test_block_bound_never_prunes_a_qualifying_pair(seed, dim, n_rings):
    """Random points, random centroid count, random ring count: after
    assigning each point to its nearest centroid and its angular ring,
    EVERY above-threshold point pair's block pair must survive the
    allowlist (soundness — the exactness theorem), and the reported
    volume must equal the exact Σ|bi|·|bj| over survivors."""
    rng = np.random.default_rng(seed)
    n_pts, n_cells = rng.integers(4, 40), int(rng.integers(2, 6))
    pts = _norm_rows(rng.standard_normal((int(n_pts), dim)))
    cent = _norm_rows(rng.standard_normal((n_cells, dim)))
    sims = pts @ cent.T
    cell = np.argmax(sims, axis=1)
    cent_sim = sims[np.arange(len(pts)), cell]
    band = np.pi / 2.0 / n_rings
    ang = np.arccos(np.clip(cent_sim, -1.0, 1.0))
    ring = np.minimum(n_rings - 1, (ang / band).astype(int))
    block = cell * n_rings + ring
    ids = np.unique(block)
    radii = np.array([cent_sim[block == b].min() for b in ids])
    sizes = np.array([(block == b).sum() for b in ids])
    threshold = float(rng.uniform(-0.5, 0.95))
    ii, jj, same, volume = _block_pair_allowlist(
        cent, ids, radii, sizes, threshold, n_rings
    )
    allowed = set(zip(ids[ii].tolist(), ids[jj].tolist()))
    pair_sims = pts @ pts.T
    for a in range(len(pts)):
        for b in range(a + 1, len(pts)):
            if pair_sims[a, b] >= threshold:
                key = (min(block[a], block[b]), max(block[a], block[b]))
                assert key in allowed, (
                    f"pruned a qualifying pair: sim={pair_sims[a, b]} "
                    f"threshold={threshold} blocks={key}"
                )
    # volume is the exact candidate count implied by the survivors
    expect = 0
    for i, j, s in zip(ii, jj, same):
        ni, nj = int(sizes[i]), int(sizes[j])
        expect += ni * (ni - 1) // 2 if s else ni * nj
    assert volume == expect


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(2, 6))
def test_cell_bound_dominates_every_member_cosine(seed, dim):
    """exact_nn_topk's per-query CELL bound (r9 cell-granularity probes)
    is a sound upper bound on the cosine to ANY member of the cell, for
    ANY centroids and ANY assignment geometry:
    cos(q, y) <= cos(max(0, theta(q, c) - alpha_c)) with alpha_c the
    cell's max member angle.  This inequality IS the recall-1 argument:
    a query's true above-s_q neighbor can never live in an unprobed
    cell, so scoring own cell + bound-passing cells is exhaustive."""
    rng = np.random.default_rng(seed)
    n_pts, n_cells = int(rng.integers(4, 50)), int(rng.integers(2, 6))
    pts = _norm_rows(rng.standard_normal((n_pts, dim)))
    cent = _norm_rows(rng.standard_normal((n_cells, dim)))
    sims = pts @ cent.T
    cell = np.argmax(sims, axis=1)
    cent_sim = sims[np.arange(n_pts), cell]
    pair = pts @ pts.T
    theta_q = np.arccos(np.clip(sims, -1.0, 1.0))  # (n, n_cells)
    for c in np.unique(cell):
        alpha = np.arccos(np.clip(cent_sim[cell == c].min(), -1.0, 1.0))
        bound = np.cos(np.maximum(0.0, theta_q[:, c] - alpha))
        members = np.flatnonzero(cell == c)
        assert (pair[:, members] <= bound[:, None] + 1e-9).all()
