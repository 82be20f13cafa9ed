"""OOM-protection chunking on very large uncapped graphs.

XLA materializes a big bucket's backward gather (and the forward moments
gather past ~16M pairs) in natural index-major order with the narrow minor
dim lane-padded to 128 — a 45M-pair bucket became a 23 GB buffer on a
16 GB v5e (observed while benching the reference's uncapped query_ball_point
semantics, reference nearest_neighbors.py:40-52). ``features.py`` guards
both paths by splitting buckets / row-chunking the forward past a pair
budget; these tests shrink the budgets so small fixtures exercise the
chunked code paths and assert bitwise/numeric identity with the unchunked
ones.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import depth_correction_tpu.ops.features as F


def _radius_graph(m=400, r=0.5, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 3, (m, 3))
    from scipy.spatial import cKDTree

    balls = cKDTree(pts).query_ball_point(pts, r)
    k = max(len(b) for b in balls)
    nb = np.full((m, k), -1, np.int64)
    for i, b in enumerate(balls):
        nb[i, : len(b)] = b
    return pts, nb


@pytest.mark.parametrize("builder", ["host", "device"])
def test_bucket_split_matches_unsplit(monkeypatch, builder):
    pts, nb = _radius_graph()
    w = (nb >= 0).astype(np.float64)
    build = (
        F.build_bucketed_transpose
        if builder == "host"
        else F.build_bucketed_transpose_device
    )
    tg_full = build(jnp.asarray(nb, jnp.int32), weights=jnp.asarray(w))
    monkeypatch.setattr(F, "_BUCKET_PAIRS_MAX", 256)
    tg_split = build(jnp.asarray(nb, jnp.int32), weights=jnp.asarray(w))
    assert len(tg_split.idx) > len(tg_full.idx)
    # Same widths ladder, just parts; every (point, pair) is preserved:
    # moments + gradients through both graphs must agree exactly.
    p = jnp.asarray(pts)
    nb_j = jnp.asarray(nb, jnp.int32)
    w_j = jnp.asarray(w)

    def loss(p, tg):
        mean, comps = F.neighborhood_moments_bucketed(p, nb_j, w_j, tg)
        return jnp.sum(mean) + sum(jnp.sum(c**2) for c in comps)

    v_full, g_full = jax.value_and_grad(loss)(p, tg_full)
    v_split, g_split = jax.value_and_grad(loss)(p, tg_split)
    np.testing.assert_allclose(float(v_split), float(v_full), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(g_split), np.asarray(g_full), rtol=1e-9, atol=1e-12
    )


def test_forward_moments_row_chunking(monkeypatch):
    pts, nb = _radius_graph(m=300, seed=1)
    w = np.where(nb >= 0, 0.5, 0.0)
    p = jnp.asarray(pts)
    nb_j = jnp.asarray(nb, jnp.int32)
    w_j = jnp.asarray(w)
    full = F._moments_impl(p, nb_j, w_j)
    monkeypatch.setattr(F, "_FWD_PAIRS_MAX", 1024)
    chunked = F._moments_impl(p, nb_j, w_j)
    for a, b in zip(jax.tree_util.tree_leaves(full),
                    jax.tree_util.tree_leaves(chunked)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-12, atol=1e-15
        )


def test_forward_chunking_grads(monkeypatch):
    pts, nb = _radius_graph(m=300, seed=2)
    w = (nb >= 0).astype(np.float64)
    p = jnp.asarray(pts)
    nb_j = jnp.asarray(nb, jnp.int32)
    w_j = jnp.asarray(w)

    def loss(p):
        mean, comps, w_sum = F._moments_impl(p, nb_j, w_j)
        return jnp.sum(mean**2) + sum(jnp.sum(c**2) for c in comps)

    g_full = jax.grad(loss)(p)
    monkeypatch.setattr(F, "_FWD_PAIRS_MAX", 1024)
    g_chunk = jax.grad(loss)(p)
    np.testing.assert_allclose(
        np.asarray(g_chunk), np.asarray(g_full), rtol=1e-9, atol=1e-12
    )
