"""Scatter-free gather backward: gradients must match plain autodiff."""
import numpy as np
import jax
import jax.numpy as jnp

from depth_correction_tpu.ops.covs import weighted_cov
from depth_correction_tpu.ops.eigh3 import eigvals3
from depth_correction_tpu.ops.features import (
    build_transpose_graph,
    gather_neighbors,
    gather_neighbors_transposed,
)


def random_graph(m=200, k=9, seed=0, symmetric=False, with_padding=True):
    rng = np.random.default_rng(seed)
    if symmetric:
        # Radius-style graph from actual points.
        pts = rng.uniform(0, 3, (m, 3))
        from scipy.spatial import cKDTree

        balls = cKDTree(pts).query_ball_point(pts, 0.5)
        k = max(len(b) for b in balls)
        nb = np.full((m, k), -1, np.int64)
        for i, b in enumerate(balls):
            nb[i, : len(b)] = b
        return pts, nb
    nb = rng.integers(0, m, (m, k))
    if with_padding:
        nb[rng.random((m, k)) < 0.2] = -1
    return rng.uniform(0, 3, (m, 3)), nb


def test_transpose_graph_structure():
    _, nb = random_graph()
    t_idx, t_slot = build_transpose_graph(nb)
    t_idx, t_slot = np.asarray(t_idx), np.asarray(t_slot)
    m, k = nb.shape
    # Every valid (i, k) pair appears exactly once in row nb[i, k].
    pairs = set()
    for j in range(m):
        for c in range(t_idx.shape[1]):
            if t_idx[j, c] >= 0:
                i, s = t_idx[j, c], t_slot[j, c]
                assert nb[i, s] == j
                pairs.add((int(i), int(s)))
    expected = {(i, s) for i in range(m) for s in range(k) if nb[i, s] >= 0}
    assert pairs == expected


def test_gradients_match_plain_gather():
    for symmetric in (False, True):
        pts, nb = random_graph(symmetric=symmetric, seed=3)
        t_idx, t_slot = build_transpose_graph(nb)
        nb_j = jnp.asarray(nb, jnp.int32)
        w = (nb_j >= 0).astype(jnp.float64)

        def loss_plain(p):
            cc = weighted_cov(gather_neighbors(p, nb_j), w)
            ev = eigvals3(cc)
            return jnp.sum(ev[:, 0] / jnp.maximum(ev.sum(-1), 1e-6))

        def loss_t(p):
            nbp = gather_neighbors_transposed(p, nb_j, t_idx, t_slot)
            cc = weighted_cov(nbp, w)
            ev = eigvals3(cc)
            return jnp.sum(ev[:, 0] / jnp.maximum(ev.sum(-1), 1e-6))

        p = jnp.asarray(pts)
        np.testing.assert_allclose(float(loss_plain(p)), float(loss_t(p)), rtol=1e-12)
        g_plain = np.asarray(jax.grad(loss_plain)(p))
        g_t = np.asarray(jax.grad(loss_t)(p))
        np.testing.assert_allclose(g_t, g_plain, rtol=1e-9, atol=1e-12)


def test_end_to_end_training_uses_transpose(tmp_path):
    """prepare_sequences builds the transpose; loss/grads stay identical."""
    from depth_correction_tpu.config import Config
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.train import make_loss_fn, prepare_sequences

    cfg = Config()
    cfg.float_type = "float64"
    cfg.train_names = ["ground_plane/4"]
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.1, 20.0, 0.25
    cfg.nn_r, cfg.nn_k = 0.4, 0
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = []
    cfg.min_valid_neighbors = 3
    cfg.depth_bias_model_kwargs = {"w": [-0.002], "exponent": [4.0]}
    cfg.loss_kwargs = {"sqrt": False, "normalization": False}

    ds = create_dataset("ground_plane/4", cfg)
    data = prepare_sequences([ds], cfg)
    assert data.t_neighbors and data.t_neighbors[0] is not None

    import dataclasses

    data_plain = dataclasses.replace(data, t_neighbors=(), t_slots=())
    loss_fn = make_loss_fn(cfg)
    params = {"model": ScaledPolynomial(w=jnp.asarray([-1e-3]),
                                        exponent=jnp.asarray([4.0]))}

    def w_loss(w, d):
        p = {"model": ScaledPolynomial(w=w, exponent=jnp.asarray([4.0]))}
        return loss_fn(p, d)

    w0 = jnp.asarray([-1e-3])
    v_t = float(w_loss(w0, data))
    v_p = float(w_loss(w0, data_plain))
    np.testing.assert_allclose(v_t, v_p, rtol=1e-12)
    g_t = float(jax.grad(w_loss)(w0, data)[0])
    g_p = float(jax.grad(w_loss)(w0, data_plain)[0])
    np.testing.assert_allclose(g_t, g_p, rtol=1e-9)


def test_bucketed_transpose_structure():
    """Every valid (query, point) pair appears exactly once across buckets,
    with its weight; inv maps points to their concatenated-bucket slot."""
    from depth_correction_tpu.ops.features import build_bucketed_transpose

    rng = np.random.default_rng(7)
    mq, k, m = 300, 11, 500
    nb = rng.integers(0, m, (mq, k))
    nb[rng.random((mq, k)) < 0.3] = -1
    w = rng.uniform(0.5, 1.5, (mq, k))
    tg = build_bucketed_transpose(nb, num_points=m, weights=w)

    # Reconstruct per-point pair sets from the buckets.
    offset = 0
    got = {}
    for idx_b, w_b in zip(tg.idx, tg.w):
        idx_b, w_b = np.asarray(idx_b), np.asarray(w_b)
        inv = np.asarray(tg.inv)
        for local_row in range(idx_b.shape[0]):
            j = int(np.flatnonzero(inv == offset + local_row)[0])
            for c in range(idx_b.shape[1]):
                if idx_b[local_row, c] >= 0:
                    got.setdefault(j, []).append(
                        (int(idx_b[local_row, c]), float(w_b[local_row, c]))
                    )
        offset += idx_b.shape[0]
    expected = {}
    for i in range(mq):
        for c in range(k):
            if nb[i, c] >= 0:
                expected.setdefault(int(nb[i, c]), []).append((i, float(w[i, c])))
    assert {j: sorted(v) for j, v in got.items()} == {
        j: sorted(v) for j, v in expected.items()
    }
    # Padding bound: bucketing keeps padded size within 2x of real pairs
    # (plus the minimum bucket width floor).
    real = int((nb >= 0).sum())
    padded = sum(int(np.asarray(i).size) for i in tg.idx)
    assert padded <= 2 * real + 8 * len(np.unique(nb[nb >= 0]))


def test_device_builders_match_host():
    """The on-device transpose builders reproduce the host numpy builders
    bitwise (same stable pair order, same bucket ladder)."""
    from depth_correction_tpu.ops.features import (
        build_bucketed_transpose,
        build_bucketed_transpose_device,
        build_transpose_graph,
        build_transpose_graph_device,
    )

    rng = np.random.default_rng(5)
    mq, k, m = 300, 11, 500
    nb = rng.integers(0, m, (mq, k))
    nb[rng.random((mq, k)) < 0.3] = -1
    w = rng.uniform(0.5, 1.5, (mq, k))

    t_h = build_transpose_graph(nb, num_points=m, weights=w)
    t_d = build_transpose_graph_device(
        jnp.asarray(nb, jnp.int32), num_points=m, weights=jnp.asarray(w)
    )
    for a, b in zip(t_h, t_d):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    bt_h = build_bucketed_transpose(nb, num_points=m, weights=w)
    bt_d = build_bucketed_transpose_device(
        jnp.asarray(nb, jnp.int32), num_points=m, weights=jnp.asarray(w)
    )
    assert len(bt_h.idx) == len(bt_d.idx)
    for a, b in zip(bt_h.idx, bt_d.idx):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(bt_h.w, bt_d.w):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(bt_h.inv), np.asarray(bt_d.inv))

    # Weightless variants (weights default to the validity mask).
    t_h2 = build_transpose_graph(nb, num_points=m)
    t_d2 = build_transpose_graph_device(jnp.asarray(nb, jnp.int32), num_points=m)
    for a, b in zip(t_h2, t_d2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_symmetrize_neighbors_device():
    """Mutual-pair trim matches the brute-force set semantics."""
    from depth_correction_tpu.preproc import symmetrize_neighbors

    rng = np.random.default_rng(9)
    m, k = 700, 7
    nb = rng.integers(0, m, (m, k))
    nb[rng.random((m, k)) < 0.25] = -1
    out = np.asarray(symmetrize_neighbors(jnp.asarray(nb, jnp.int32)))

    listed = [set(row[row >= 0].tolist()) for row in nb]
    for i in range(m):
        for c in range(k):
            j = nb[i, c]
            if j >= 0 and i in listed[j]:
                assert out[i, c] == j
            else:
                assert out[i, c] == -1


def test_bucketed_moments_gradients_match():
    """Bucketed analytic backward == plain autodiff gradients."""
    from depth_correction_tpu.ops.features import (
        build_bucketed_transpose,
        neighborhood_features,
    )

    rng = np.random.default_rng(11)
    m, mq, k = 400, 150, 9
    pts = rng.uniform(0, 3, (m, 3))
    nb = rng.integers(0, m, (mq, k))
    nb[rng.random((mq, k)) < 0.2] = -1
    nb[:, 0] = rng.integers(0, m, mq)  # at least one valid neighbor
    nb_j = jnp.asarray(nb, jnp.int32)
    w = (nb_j >= 0).astype(jnp.float64)
    tg = build_bucketed_transpose(nb, num_points=m, weights=np.asarray(w))

    def loss(p, t):
        f = neighborhood_features(p, nb_j, w, compute_normals=False, t_idx=t)
        ev = f["eigvals"]
        return jnp.sum(ev[:, 0] / jnp.maximum(ev.sum(-1), 1e-6)) + jnp.sum(
            f["mean"]
        )

    p = jnp.asarray(pts)
    np.testing.assert_allclose(float(loss(p, tg)), float(loss(p, None)), rtol=1e-12)
    g_b = np.asarray(jax.grad(loss)(p, tg))
    g_p = np.asarray(jax.grad(loss)(p, None))
    np.testing.assert_allclose(g_b, g_p, rtol=1e-9, atol=1e-12)
