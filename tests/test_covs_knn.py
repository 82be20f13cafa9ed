"""Weighted covariance vs torch oracle; neighbor engine vs scipy cKDTree."""
import numpy as np
import jax.numpy as jnp
import torch
from scipy.spatial import cKDTree

from depth_correction_tpu.ops.covs import weighted_cov, weighted_mean, trace3
from depth_correction_tpu.ops.knn import (
    nearest_neighbors,
    neighbor_counts,
    radius_neighbors,
    suggest_k_max,
)


def reference_covs_torch(x, weights):
    """Oracle reproducing the reference weighted-cov semantics
    (utils.py:109-149) via torch ops: weighted mean, weighted outer-product
    sum, Bessel-corrected weight-sum normalizer clamped at 1e-6."""
    x = torch.as_tensor(x)
    w = torch.as_tensor(weights)[..., None]
    wsum = w.sum(dim=-2, keepdim=True)
    xm = (w * x).sum(dim=-2, keepdim=True) / wsum
    xc = x - xm
    xx = (w * xc).transpose(-1, -2) @ xc
    denom = (wsum - 1).clamp(1e-6)[..., 0]
    return xx / denom[..., None], xm[..., 0, :]


def test_weighted_cov_matches_reference_semantics():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((32, 16, 3))
    w = (rng.random((32, 16)) > 0.3).astype(np.float64)
    w[0] = 0.0
    w[0, 0] = 1.0  # single-neighbor: denom clamps at 1e-6
    cov = np.asarray(weighted_cov(jnp.asarray(x), jnp.asarray(w)))
    mean = np.asarray(weighted_mean(jnp.asarray(x), jnp.asarray(w)))
    cov_ref, mean_ref = reference_covs_torch(x, w)
    np.testing.assert_allclose(mean, mean_ref.numpy(), atol=1e-10)
    np.testing.assert_allclose(cov, cov_ref.numpy(), atol=1e-8)


def test_weighted_cov_equals_numpy_cov_for_full_weights():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 20, 3))
    w = np.ones((8, 20))
    cov = np.asarray(weighted_cov(jnp.asarray(x), jnp.asarray(w)))
    for i in range(8):
        np.testing.assert_allclose(cov[i], np.cov(x[i].T), atol=1e-10)


def test_trace3():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((5, 3, 3))
    np.testing.assert_allclose(
        np.asarray(trace3(jnp.asarray(a))), np.trace(a, axis1=-2, axis2=-1)
    )


# --- neighbor engine ----------------------------------------------------


def test_knn_matches_ckdtree():
    rng = np.random.default_rng(3)
    pts = rng.random((500, 3)) * 10
    q = rng.random((100, 3)) * 10
    d, i = nearest_neighbors(jnp.asarray(pts), jnp.asarray(q), k=5, tile=128)
    tree = cKDTree(pts)
    d_ref, i_ref = tree.query(q, k=5)
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(i), i_ref)


def test_knn_with_radius_bound_matches_ckdtree():
    rng = np.random.default_rng(4)
    pts = rng.random((400, 3)) * 5
    q = rng.random((80, 3)) * 5
    r = 0.7
    d, i = nearest_neighbors(jnp.asarray(pts), jnp.asarray(q), k=4, r=r, tile=128)
    tree = cKDTree(pts)
    d_ref, i_ref = tree.query(q, k=4, distance_upper_bound=r)
    i_ref = i_ref.copy()
    i_ref[i_ref == tree.n] = -1  # reference pads misses with -1
    np.testing.assert_array_equal(np.asarray(i), i_ref)
    valid = i_ref >= 0
    np.testing.assert_allclose(np.asarray(d)[valid], d_ref[valid], atol=1e-10)
    assert np.all(np.isinf(np.asarray(d)[~valid]))


def test_radius_neighbors_sets_match_query_ball_point():
    rng = np.random.default_rng(5)
    pts = rng.random((300, 3)) * 4
    r = 0.8
    counts = np.asarray(neighbor_counts(jnp.asarray(pts), r=r, tile=128))
    tree = cKDTree(pts)
    balls = tree.query_ball_point(pts, r)
    np.testing.assert_array_equal(counts, [len(b) for b in balls])

    k = suggest_k_max(jnp.asarray(pts), r=r)
    assert k >= counts.max()
    d, i = radius_neighbors(jnp.asarray(pts), r=r, k=k, tile=128)
    i = np.asarray(i)
    for row, ball in zip(i, balls):
        got = set(int(x) for x in row if x >= 0)
        assert got == set(ball)


def test_knn_respects_point_validity():
    rng = np.random.default_rng(6)
    pts = rng.random((64, 3))
    valid = np.ones(64, bool)
    valid[10:20] = False
    d, i = nearest_neighbors(
        jnp.asarray(pts), jnp.asarray(pts), k=3, valid_points=jnp.asarray(valid), tile=32
    )
    i = np.asarray(i)
    assert not np.any((i >= 10) & (i < 20))
    tree = cKDTree(pts[valid])
    remap = np.flatnonzero(valid)
    d_ref, i_ref = tree.query(pts, k=3)
    np.testing.assert_array_equal(i, remap[i_ref])
