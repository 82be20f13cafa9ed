"""Grid-hash radius search: set-exactness vs scipy cKDTree and the tiled scan."""
import numpy as np
import pytest
from scipy.spatial import cKDTree

from depth_correction_tpu.ops.grid_hash import (
    grid_neighbor_counts,
    grid_radius_neighbors,
)
from depth_correction_tpu.ops.knn import neighbor_counts, radius_neighbors


def neighbor_sets(idx):
    return [set(int(j) for j in row if j >= 0) for row in np.asarray(idx)]


@pytest.mark.parametrize("seed,n,r", [(0, 3000, 0.25), (1, 5000, 0.4)])
def test_grid_matches_ckdtree(seed, n, r):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    counts = np.array([len(b) for b in cKDTree(pts).query_ball_point(pts, r)])
    k = int(counts.max())

    d, idx = grid_radius_neighbors(pts, r=r, k=k + 3)
    got = neighbor_sets(idx)
    want = [set(b) for b in cKDTree(pts).query_ball_point(pts, r)]
    assert got == want
    # Distances ascending, within r, diagonal (self) present at 0.
    d = np.asarray(d)
    finite = np.isfinite(d)
    assert (d[finite] <= r + 1e-6).all()
    dd = np.where(finite, d, 1e9)  # finite sentinel keeps diff well-defined
    assert (np.diff(dd, axis=1) >= -1e-6)[finite[:, 1:]].all()


def test_grid_validity_masks_and_padding():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-2, 2, (1500, 3)).astype(np.float32)
    valid = rng.uniform(size=1500) > 0.3
    pts_pad = np.concatenate([pts, np.zeros((100, 3), np.float32)])
    valid_pad = np.concatenate([valid, np.zeros(100, bool)])

    r = 0.5
    tree = cKDTree(pts[valid])
    idx_map = np.flatnonzero(valid)
    want = [
        set(idx_map[b]) if v else set()
        for b, v in zip(tree.query_ball_point(pts, r), valid)
    ]
    counts = max((len(s) for s in want), default=1)

    d, idx = grid_radius_neighbors(
        pts_pad, r=r, k=counts + 2, valid_points=valid_pad, valid_query=valid_pad
    )
    got = neighbor_sets(idx[: len(pts)])
    assert got == want
    assert (np.asarray(idx[len(pts) :]) == -1).all()


def test_grid_matches_tiled_scan():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-3, 3, (2048, 3)).astype(np.float32)
    r, k = 0.35, 48
    d_g, i_g = grid_radius_neighbors(pts, r=r, k=k)
    d_t, i_t = radius_neighbors(pts, r=r, k=k)
    assert neighbor_sets(i_g) == neighbor_sets(i_t)


def test_grid_counts():
    rng = np.random.default_rng(4)
    pts = rng.uniform(-3, 3, (2000, 3)).astype(np.float32)
    r = 0.3
    got = np.asarray(grid_neighbor_counts(pts, r=r))
    want = np.asarray(neighbor_counts(pts, r=r))
    np.testing.assert_array_equal(got, want)


def test_grid_query_differs_from_points():
    rng = np.random.default_rng(5)
    pts = rng.uniform(-2, 2, (1200, 3)).astype(np.float32)
    q = rng.uniform(-2, 2, (700, 3)).astype(np.float32)
    r = 0.45
    tree = cKDTree(pts)
    want = [set(b) for b in tree.query_ball_point(q, r)]
    k = max((len(s) for s in want), default=1)
    _, idx = grid_radius_neighbors(pts, query=q, r=r, k=k + 2)
    assert neighbor_sets(idx) == want


def test_grid_k_larger_than_candidate_window():
    """Drop-in contract: k beyond the candidate width pads with -1/inf
    instead of crashing top_k (sparse clouds floor the window at 8)."""
    rng = np.random.default_rng(7)
    pts = rng.uniform(-20, 20, (2000, 3)).astype(np.float32)  # sparse
    d, idx = grid_radius_neighbors(pts, r=0.25, k=128)
    assert idx.shape == (2000, 128)
    want = [set(b) for b in cKDTree(pts).query_ball_point(pts, 0.25)]
    assert neighbor_sets(idx) == want
    assert (np.asarray(idx)[:, -1] == -1).all()  # padded tail


def test_suggest_k_max_uses_grid_at_scale():
    """suggest_k_max routes through the grid counter above 64k points and
    agrees with the brute-force sizing."""
    from depth_correction_tpu.ops.knn import suggest_k_max

    rng = np.random.default_rng(8)
    pts = rng.uniform(0, 12.0, (70000, 3)).astype(np.float32)
    k = suggest_k_max(pts, r=0.25)
    counts = np.array(
        [len(b) for b in cKDTree(pts).query_ball_point(pts[:2000], 0.25)]
    )
    assert k >= counts.max()
    assert k <= max(8, int(counts.max() * 4))  # sane, not wildly padded


@pytest.mark.parametrize(
    "thickness,axis", [(0.0, 2), (0.3, 2), (0.0, 0), (0.45, 1)]
)
def test_grid_thin_slab_exact(thickness, axis):
    """Grids with <= 2 cells along an axis: the clamped z-window / masked
    columns must not alias points into the candidate set twice (duplicates
    used to evict true neighbors from top-k on flat clouds)."""
    rng = np.random.default_rng(11)
    n, r = 4000, 0.25
    pts = rng.uniform(-4, 4, (n, 3))
    pts[:, axis] = rng.uniform(0, thickness, n)  # flat or thin slab
    pts = pts.astype(np.float32)

    tree = cKDTree(pts)
    want = [set(b) for b in tree.query_ball_point(pts, r)]
    k = max(len(s) for s in want)
    d, idx = grid_radius_neighbors(pts, r=r, k=k + 2)
    got = neighbor_sets(idx)
    assert got == want
    # No duplicate indices within a row.
    rows = np.asarray(idx)
    for row, s in zip(rows, want):
        kept = row[row >= 0]
        assert len(kept) == len(set(kept.tolist())) == len(s)
    counts = np.asarray(grid_neighbor_counts(pts, r=r))
    np.testing.assert_array_equal(counts, [len(s) for s in want])


@pytest.mark.slow  # ~11 min on the 1-core sandbox (one guard, 26% of suite)
def test_grid_huge_extent_coarsens_instead_of_raising():
    """A scene whose extent would need >= 2^31 cells auto-coarsens the cell
    size (exactness holds for any cell >= r) instead of raising."""
    rng = np.random.default_rng(12)
    pts = rng.uniform(0, 50.0, (3000, 3))
    pts[:5] += np.asarray([[40000.0, 35000.0, 30000.0]])  # blow up the extent
    pts = pts.astype(np.float32)
    r = 0.02  # tiny r: dims ~ (2e6)^3 cells before coarsening
    tree = cKDTree(pts)
    want = [set(b) for b in tree.query_ball_point(pts, r)]
    k = max(len(s) for s in want)
    _, idx = grid_radius_neighbors(pts, r=r, k=k + 2)
    assert neighbor_sets(idx) == want


def test_grid_bucket_cap_exact_when_sized():
    """Explicit bucket_cap >= true occupancy stays exact."""
    rng = np.random.default_rng(6)
    pts = rng.uniform(-1, 1, (800, 3)).astype(np.float32)
    r = 0.5
    want = [set(b) for b in cKDTree(pts).query_ball_point(pts, r)]
    k = max(len(s) for s in want)
    _, idx = grid_radius_neighbors(pts, r=r, k=k + 1, bucket_cap=256)
    assert neighbor_sets(idx) == want


def test_grid_establish_traced_matches_ckdtree():
    """The all-traced establishment (the fused node program's engine,
    grid_establish_traced) + the chunk kernel reproduce exact cKDTree
    neighbor sets, including under validity masks and padding."""
    import jax
    import jax.numpy as jnp

    from depth_correction_tpu.ops.grid_hash import (
        _grid_query_chunk_impl,
        grid_establish_traced,
    )

    rng = np.random.default_rng(11)
    pts = rng.uniform(-3, 3, (2000, 3)).astype(np.float32)
    valid = rng.uniform(size=2000) > 0.2
    r, k, n_cells_pad, width = 0.4, 48, 1 << 15, 64

    @jax.jit
    def program(pts, valid):
        est = grid_establish_traced(pts, valid, r, n_cells_pad)
        (pts_T, val_s, ids_s, order, mins, dims, cell, starts, true_win) = est
        d, idx = _grid_query_chunk_impl(
            pts, valid, pts_T, val_s, ids_s, order, mins, dims,
            jnp.asarray(r, pts.dtype) ** 2, k, width, cell, starts)
        return d, idx, true_win

    d, idx, true_win = program(jnp.asarray(pts), jnp.asarray(valid))
    assert int(true_win) <= width  # window covered; result is exact
    tree = cKDTree(pts[valid])
    idx_map = np.flatnonzero(valid)
    want = [
        set(idx_map[b]) if v else set()
        for b, v in zip(tree.query_ball_point(pts, r), valid)
    ]
    assert neighbor_sets(idx) == want


def test_grid_establish_traced_coarsens_to_fit_table():
    """Scenes needing more cells than the static table auto-coarsen the
    cell in-program (exactness holds for any cell >= r)."""
    import jax
    import jax.numpy as jnp

    from depth_correction_tpu.ops.grid_hash import (
        _grid_query_chunk_impl,
        grid_establish_traced,
    )

    rng = np.random.default_rng(3)
    pts = rng.uniform(-40, 40, (800, 3)).astype(np.float32)  # huge extent
    valid = np.ones(800, bool)
    r, k, n_cells_pad, width = 0.6, 16, 1 << 9, 64  # tiny table forces it

    @jax.jit
    def program(pts, valid):
        est = grid_establish_traced(pts, valid, r, n_cells_pad)
        (pts_T, val_s, ids_s, order, mins, dims, cell, starts, true_win) = est
        d, idx = _grid_query_chunk_impl(
            pts, valid, pts_T, val_s, ids_s, order, mins, dims,
            jnp.asarray(r, pts.dtype) ** 2, k, width, cell, starts)
        return idx, true_win, cell, dims

    idx, true_win, cell, dims = program(jnp.asarray(pts), jnp.asarray(valid))
    assert float(cell) > r  # did coarsen
    assert int(np.prod(np.asarray(dims, np.int64))) <= n_cells_pad
    assert int(true_win) <= width
    want = [set(b) for b in cKDTree(pts).query_ball_point(pts, r)]
    assert neighbor_sets(idx) == want
