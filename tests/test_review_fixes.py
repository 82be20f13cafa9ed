"""Regression tests for the round-2 self-review findings."""
import numpy as np
import jax.numpy as jnp
import pytest

from depth_correction_tpu.config import Config


def test_rendered_mesh_cache_key_distinguishes_paths(tmp_path):
    """Same-named meshes in different directories must not share cache
    entries."""
    from depth_correction_tpu.datasets.rendered_mesh import RenderedMeshDataset
    from tests.test_raycast import room_mesh

    import os

    verts, faces = room_mesh()
    for sub in ("v1", "v2"):
        os.makedirs(str(tmp_path / sub))
        with open(str(tmp_path / sub / "room.obj"), "w") as f:
            for v in verts * (1.0 if sub == "v1" else 2.0):
                f.write("v %f %f %f\n" % tuple(v))
            for fc in faces:
                f.write("f %d %d %d\n" % tuple(fc + 1))

    cache = str(tmp_path / "cache")
    kw = dict(n_poses=1, radius=2.0, height=1.5, h_beams=16, v_beams=8,
              cache_dir=cache)
    ds1 = RenderedMeshDataset(str(tmp_path / "v1" / "room.obj"), **kw)
    ds2 = RenderedMeshDataset(str(tmp_path / "v2" / "room.obj"), **kw)
    assert ds1._disk_cache_path(0) != ds2._disk_cache_path(0)
    c1 = ds1.local_cloud(0)
    c2 = ds2.local_cloud(0)
    # The doubled room produces different geometry, not a cache hit.
    assert not (
        len(c1) == len(c2) and np.allclose(c1["x"], c2["x"])
    )


def test_icp_correspondences_empty_scan():
    """A fully filtered-out scan yields a zero-weight pair, not a crash."""
    from depth_correction_tpu.loss import icp_pair_correspondences

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(3, 50, 3))
    valid = np.ones((3, 50), bool)
    valid[1] = False  # middle scan fully filtered
    idx, w = icp_pair_correspondences(pts, valid, 0.5)
    assert idx.shape == (2, 50) and w.shape == (2, 50)
    assert not w[0].any() and not w[1].any()

    valid2 = np.ones((2, 50), bool)
    idx2, w2 = icp_pair_correspondences(pts[:2], valid2, 0.5)
    assert w2[0].any()


def test_nn_scale_query_rows_match_full_table():
    """Compacted query rows + query_rows reproduce the full-table Gaussian
    re-weighting exactly (the query's own position drives the weights,
    reference depth_cloud.py:362-363)."""
    from depth_correction_tpu.ops.features import neighborhood_features
    from depth_correction_tpu.ops.knn import radius_neighbors

    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(-1, 1, (400, 3)))
    _, nn = radius_neighbors(pts, r=0.5, k=24)
    w = (nn >= 0).astype(pts.dtype)

    full = neighborhood_features(pts, nn, w, scale=0.3, compute_normals=False)

    rows = np.arange(0, 400, 3)
    qr = jnp.asarray(rows, jnp.int32)
    sub = neighborhood_features(
        pts, nn[rows], w[rows], scale=0.3, compute_normals=False,
        query_rows=qr,
    )
    np.testing.assert_allclose(
        np.asarray(sub["eigvals"]), np.asarray(full["eigvals"])[rows],
        rtol=1e-6, atol=1e-12,
    )

    with pytest.raises(ValueError):
        neighborhood_features(pts, nn[rows], w[rows], scale=0.3,
                              compute_normals=False)


def test_nn_scale_training_path():
    """cfg.nn_scale runs end to end (now with query compaction); the
    Gaussian re-weighting changes the loss."""
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.train import make_loss_fn, prepare_sequences

    def cfg_with(scale):
        cfg = Config()
        cfg.float_type = "float32"
        cfg.train_names = ["ground_plane/3"]
        cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.1, 20.0, 0.3
        cfg.nn_r, cfg.nn_k = 0.4, 0
        cfg.vp_dispersion_bounds = []
        cfg.eigenvalue_ratio_bounds = []
        cfg.min_valid_neighbors = 3
        cfg.depth_bias_model_kwargs = {"w": [-0.002], "exponent": [4.0]}
        cfg.loss_kwargs = {"sqrt": False, "normalization": False}
        cfg.nn_scale = scale
        return cfg

    model = {"model": ScaledPolynomial(w=jnp.zeros(1),
                                       exponent=jnp.asarray([4.0]))}
    vals = {}
    for scale in (None, 0.3):
        cfg = cfg_with(scale)
        ds = create_dataset(cfg.train_names[0], cfg)
        data = prepare_sequences([ds], cfg)
        vals[scale] = float(make_loss_fn(cfg)(model, data))
        assert np.isfinite(vals[scale])
    assert vals[None] != vals[0.3]


def test_slam_mapper_target_grows_with_map():
    """as_target pads to the current map size, not full capacity (and the
    capacity overflow warns instead of silently truncating)."""
    import warnings

    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.preproc import local_feature_cloud
    from depth_correction_tpu.slam_eval import slam_mapper

    cfg = Config()
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.1, 30.0, 0.3
    cfg.nn_r, cfg.nn_k = 0.6, 0
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = []
    cfg.min_valid_neighbors = 3
    cfg.depth_bias_model_kwargs = {"w": [0.0], "exponent": [4.0]}
    ds = create_dataset("open_box/n_3_size_8_8_4_height_1_density_40", cfg,
                        noisy=False)
    clouds, poses = [], []
    for scan, pose in ds:
        clouds.append(local_feature_cloud(scan, cfg))
        poses.append(np.asarray(pose))
    poses = np.stack(poses)

    # Overflowing capacity (full map is ~1.9k voxels): the mapper warns and
    # EVICTS voxels far from the sensor (maintained local map) instead of
    # dropping new geometry — drift reduction vs odometry survives overflow.
    import jax.numpy as jnp

    from depth_correction_tpu.metrics import localization_errors
    from depth_correction_tpu.slam_eval import perturb_odometry

    odom = perturb_odometry(poses, [1e-5, 1e-5, 1e-5, 4e-3, 4e-3, 4e-3],
                            seed=3)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        est = slam_mapper(clouds, odom, n_iters=4, map_voxel=0.3,
                          map_capacity=1536)
    assert est.shape == (3, 4, 4)
    assert any("evicting" in str(w.message) for w in rec)
    _, odom_t, _, _ = localization_errors(jnp.asarray(poses), jnp.asarray(odom))
    _, est_t, _, _ = localization_errors(jnp.asarray(poses), jnp.asarray(est))
    assert float(jnp.mean(est_t)) < 0.2 * float(jnp.mean(odom_t))


def test_cfg_device_resolution_and_train(tmp_path):
    """cfg.device ("cpu", "cpu:N") resolves to a JAX device and train()
    places data/params there (reference: config.py:180 device knob)."""
    import jax

    from depth_correction_tpu.train import train

    cfg = Config()
    assert cfg.jax_device() is None  # default backend
    cfg.device = "cpu:1"
    assert cfg.jax_device() == jax.devices("cpu")[1]

    cfg.log_dir = str(tmp_path)
    cfg.float_type = "float32"
    cfg.train_names = ["ground_plane/3"]
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.1, 20.0, 0.25
    cfg.nn_r, cfg.nn_k = 0.4, 0
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = []
    cfg.min_valid_neighbors = 3
    cfg.loss = "min_eigval_loss"
    cfg.depth_bias_model_kwargs = {"w": [-0.002], "exponent": [4.0]}
    cfg.lr, cfg.n_opt_iters = 1e-3, 3
    best = train(cfg)
    assert best is not None
    rows = np.loadtxt(str(tmp_path / "train_history.csv"), skiprows=1, ndmin=2)
    assert rows[-1, 1] < rows[0, 1]


def test_mean_vp_dist_and_vp_dist_to_depth_mask():
    """mean_vp_dist matches the reference statistic (depth_cloud.py:336-346)
    and cfg.vp_dist_to_depth_bounds gates the global mask."""
    from depth_correction_tpu.cloud import Cloud
    from depth_correction_tpu.ops.features import mean_depth, mean_vp_dist
    from depth_correction_tpu.ops.filters import global_cloud_mask

    rng = np.random.default_rng(3)
    n, k = 64, 8
    vps = rng.standard_normal((n, 3))
    dirs = rng.standard_normal((n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    depth = rng.uniform(1.0, 5.0, n)
    cloud = Cloud(
        vps=jnp.asarray(vps), dirs=jnp.asarray(dirs),
        depth=jnp.asarray(depth), valid=jnp.ones(n, bool),
    )
    neighbors = rng.integers(0, n, (n, k))
    weights = (rng.random((n, k)) > 0.3).astype(np.float64)
    weights[:, 0] = 1.0

    got = np.asarray(mean_vp_dist(cloud, jnp.asarray(neighbors),
                                  jnp.asarray(weights)))
    # numpy oracle: weighted mean distance of neighbor vps from their mean
    w = weights
    nb = vps[neighbors]
    wsum = w.sum(-1)
    mvp = (w[..., None] * nb).sum(-2) / wsum[..., None]
    d = np.linalg.norm(nb - mvp[:, None], axis=-1)
    want = (w * d).sum(-1) / wsum
    np.testing.assert_allclose(got, want, rtol=1e-6)

    md = np.asarray(mean_depth(cloud, jnp.asarray(neighbors),
                               jnp.asarray(weights)))
    ratio = want / md
    thresh = float(np.median(ratio))

    cfg = Config()
    for f in ("min_valid_neighbors", "eigenvalue_bounds",
              "eigenvalue_ratio_bounds", "dir_dispersion_bounds",
              "vp_dispersion_bounds", "vp_dispersion_to_depth2_bounds"):
        setattr(cfg, f, [] if f != "min_valid_neighbors" else 0)
    cfg.vp_dist_to_depth_bounds = [thresh, float("inf")]
    mask = np.asarray(global_cloud_mask(
        cloud, jnp.asarray(neighbors), jnp.asarray(weights), cfg))
    np.testing.assert_array_equal(mask, ratio >= thresh)


def test_optimizer_args_positional_lr(tmp_path):
    """cfg.optimizer_args[0] overrides the learning rate, matching the
    reference's eval(cfg.optimizer)(params, *optimizer_args)
    (reference: train.py:146-156)."""
    from depth_correction_tpu.train import make_optimizer

    cfg = Config()
    cfg.optimizer = "sgd"
    cfg.lr = 1e-3
    cfg.optimizer_args = [0.5]
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones(2)}
    state = tx.init(params)
    grads = {"w": jnp.ones(2)}
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.5, rtol=1e-6)


# --- round-3 late-review fixes ---------------------------------------------


def test_local_features_ignore_nn_scale():
    """cfg.nn_scale must not touch LOCAL per-scan features: the reference
    computes them unscaled (preproc.py:50); scale applies to the global
    cloud only (preproc.py:184, 216)."""
    import numpy as np

    from depth_correction_tpu.config import Config
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.preproc import local_feature_cloud

    def cfg_with(scale):
        cfg = Config()
        cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.1, 20.0, 0.25
        cfg.nn_r, cfg.nn_k = 0.4, 0
        cfg.min_valid_neighbors = 3
        cfg.nn_scale = scale
        return cfg

    ds = create_dataset("ground_plane/3", cfg_with(None), noisy=False)
    scan, _ = ds[0]
    a = local_feature_cloud(scan, cfg_with(0.3))
    b = local_feature_cloud(scan, cfg_with(None))
    np.testing.assert_array_equal(np.asarray(a.eigvals), np.asarray(b.eigvals))


def test_host_scipy_knn_k1_and_nearest_truncation():
    """scipy backend: k=1 kNN returns (N, 1) (cKDTree gives a flat array),
    and over-full radius balls truncate to the NEAREST k like the device
    engines, not query_ball_point's arbitrary order."""
    import numpy as np
    import jax.numpy as jnp

    from depth_correction_tpu.cloud import Cloud
    from depth_correction_tpu.config import Config
    from depth_correction_tpu.preproc import _host_neighbors

    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, (64, 3))
    valid = np.ones(64, bool)

    cfg = Config()
    cfg.nn_backend = "scipy"
    cfg.nn_k, cfg.nn_r = 1, None
    idx, w = _host_neighbors(jnp.asarray(pts), jnp.asarray(valid), cfg)
    assert idx.shape == (64, 1)
    np.testing.assert_array_equal(np.asarray(idx[:, 0]), np.arange(64))

    cfg.nn_k, cfg.nn_r = 0, 0.8
    k = 4  # far fewer than the true ball sizes
    idx, _ = _host_neighbors(jnp.asarray(pts), jnp.asarray(valid), cfg, k_max=k)
    from scipy.spatial import cKDTree

    d_true, i_true = cKDTree(pts).query(pts, k=k)
    for row in range(64):
        kept = sorted(int(j) for j in np.asarray(idx[row]) if j >= 0)
        assert kept == sorted(i_true[row].tolist()), row


def test_gather_transposed_grad_1d_values():
    """gather_neighbors_transposed supports (N,) values in the BACKWARD
    too (the forward always did); grad matches plain jnp.take autodiff."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from depth_correction_tpu.ops.features import (
        build_transpose_graph,
        gather_neighbors_transposed,
    )

    rng = np.random.default_rng(4)
    n, m, k = 30, 12, 5
    nb = rng.integers(-1, n, (m, k)).astype(np.int32)
    t_idx, t_slot = build_transpose_graph(nb, num_points=n)
    vals = jnp.asarray(rng.normal(size=n))

    def with_transpose(v):
        out = gather_neighbors_transposed(v, jnp.asarray(nb), t_idx, t_slot)
        return jnp.sum(jnp.where(jnp.asarray(nb) >= 0, out, 0.0) ** 2)

    def plain(v):
        out = jnp.take(v, jnp.maximum(jnp.asarray(nb), 0), axis=0)
        return jnp.sum(jnp.where(jnp.asarray(nb) >= 0, out, 0.0) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(with_transpose)(vals)),
        np.asarray(jax.grad(plain)(vals)),
        atol=1e-12,
    )


def test_pure_knn_not_symmetrized_despite_cap():
    """nn_k > 0 with a leftover nn_max_neighbors must NOT mutual-trim the
    kNN graph (reference kNN is one-sided); only truncated radius graphs
    get symmetrized."""
    import numpy as np
    import jax.numpy as jnp

    from depth_correction_tpu.cloud import Cloud
    from depth_correction_tpu.config import Config
    from depth_correction_tpu.ops.knn import nearest_neighbors
    from depth_correction_tpu.preproc import establish_neighborhoods

    rng = np.random.default_rng(5)
    pts = rng.uniform(-2, 2, (512, 3)).astype(np.float32)
    cloud = Cloud.from_points(jnp.asarray(pts))

    cfg = Config()
    cfg.nn_k, cfg.nn_r = 8, None
    cfg.nn_max_neighbors = 32  # leftover radius knob must not matter
    got, _ = establish_neighborhoods(cloud, cfg)
    _, want = nearest_neighbors(cloud.get_points(), cloud.get_points(), k=8,
                                valid_points=cloud.valid,
                                valid_query=cloud.valid)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
