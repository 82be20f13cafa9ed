"""Pallas KNN kernel vs scipy cKDTree (interpreter mode on CPU)."""
import numpy as np
import jax.numpy as jnp
from scipy.spatial import cKDTree

from depth_correction_tpu.ops.pallas_knn import pallas_knn


def test_pallas_knn_exact_vs_ckdtree():
    rng = np.random.default_rng(0)
    n, q, k = 1024, 256, 8
    pts = rng.uniform(0, 5, (n, 3)).astype(np.float32)
    queries = rng.uniform(0, 5, (q, 3)).astype(np.float32)

    d2, idx = pallas_knn(jnp.asarray(pts), jnp.asarray(queries), k=k,
                         q_block=128, tile=256, interpret=True)
    d2, idx = np.asarray(d2), np.asarray(idx)

    tree = cKDTree(pts)
    d_ref, i_ref = tree.query(queries, k=k)
    np.testing.assert_allclose(np.sqrt(d2), d_ref, rtol=1e-4, atol=1e-5)
    # Same neighbor sets (ties may permute equal-distance entries).
    for got, ref in zip(idx, i_ref):
        assert set(got.tolist()) == set(ref.tolist())
    # Ascending distances, deterministic tie-break on index.
    assert np.all(np.diff(d2, axis=1) >= -1e-6)


def test_pallas_knn_padding_points_excluded():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 2, (512, 3)).astype(np.float32)
    pts[500:] = 1e30  # padding slots pushed to infinity
    queries = pts[:128].copy()
    d2, idx = pallas_knn(jnp.asarray(pts), jnp.asarray(queries), k=4,
                         q_block=128, tile=256, interpret=True)
    assert np.asarray(idx).max() < 500
    # Self-match first (distance 0).
    np.testing.assert_allclose(np.asarray(d2)[:, 0], 0.0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(128))
