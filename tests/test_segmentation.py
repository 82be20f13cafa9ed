"""Plane RANSAC, voxel-graph clustering, and the plane-neighborhood loss path."""
import numpy as np
import jax.numpy as jnp
import pytest

from depth_correction_tpu.segmentation import (
    cluster_voxel_graph,
    fit_plane_ransac,
    fit_planes,
)


def two_plane_scene(n=600, noise=0.002, seed=0):
    rng = np.random.default_rng(seed)
    ground = np.c_[rng.uniform(-5, 5, (n, 2)), rng.normal(0, noise, n)]
    wall = np.c_[rng.uniform(-5, 5, n), np.full(n, 3.0) + rng.normal(0, noise, n),
                 rng.uniform(0, 4, n)]
    return np.concatenate([ground, wall]).astype(np.float32)


def test_ransac_finds_dominant_plane():
    pts = two_plane_scene()
    plane, support = fit_plane_ransac(pts, distance_threshold=0.02,
                                      max_iterations=512)
    # One of the two planes, with most of its points.
    n = np.abs(plane[:3])
    assert max(n[2], n[1]) > 0.99
    assert len(support) > 450


def test_fit_planes_extracts_both():
    pts = two_plane_scene()
    planes = fit_planes(pts, 0.02, min_support=100, max_iterations=512,
                        max_models=5)
    assert 2 <= planes.size <= 3
    normals = np.abs(np.asarray(planes.params[:, :3]))
    # Both orientations present.
    assert (normals[:, 2] > 0.99).any()
    assert (normals[:, 1] > 0.99).any()
    # Members of distinct planes do not overlap.
    idx = np.asarray(planes.member_idx)
    flat = idx[idx >= 0]
    assert len(flat) == len(set(flat.tolist()))


def test_cluster_voxel_graph_separates_blobs():
    rng = np.random.default_rng(1)
    a = rng.normal(0, 0.1, (50, 3))
    b = rng.normal(0, 0.1, (60, 3)) + np.array([5.0, 0, 0])
    labels = cluster_voxel_graph(np.concatenate([a, b]), eps=0.5, min_points=10)
    assert labels[:50].min() == labels[:50].max() >= 0
    assert labels[50:].min() == labels[50:].max() >= 0
    assert labels[0] != labels[60]


def test_plane_mode_training_recovers_bias(tmp_path):
    """End-to-end: plane-neighborhood loss path drives w toward GT."""
    import jax
    import optax

    from depth_correction_tpu.config import Config, NeighborhoodType
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.train import make_loss_fn, prepare_sequences

    gt_w = -0.004
    cfg = Config()
    cfg.float_type = "float64"
    cfg.nn_type = NeighborhoodType.plane
    cfg.train_names = ["ground_plane/6"]
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.1, 20.0, 0.2
    cfg.ransac_dist_thresh = 0.06
    cfg.num_ransac_iters = 256
    cfg.min_valid_neighbors = 200
    cfg.max_neighborhoods = 3
    cfg.depth_bias_model_kwargs = {"w": [gt_w], "exponent": [4.0]}
    cfg.loss_kwargs = {"sqrt": False, "normalization": False}

    ds = create_dataset("ground_plane/6", cfg)
    data = prepare_sequences([ds], cfg)
    assert data.neighbors[0].size >= 1

    loss_fn = make_loss_fn(cfg)
    params = {"model": ScaledPolynomial(w=jnp.zeros(1), exponent=jnp.asarray([4.0]))}
    l0 = float(loss_fn(params, data))
    l_gt = float(
        loss_fn({"model": ScaledPolynomial(w=jnp.asarray([gt_w]),
                                           exponent=jnp.asarray([4.0]))}, data)
    )
    assert l_gt < 0.5 * l0, (l_gt, l0)

    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, data):
        loss, grads = jax.value_and_grad(loss_fn)(params, data)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    for _ in range(120):
        loss, params, opt_state = step(params, opt_state, data)
    w = float(np.asarray(params["model"].w)[0])
    assert w == pytest.approx(gt_w, abs=0.5 * abs(gt_w)), w
