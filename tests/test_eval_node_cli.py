"""Evaluation harness, online-corrector node, metrics, and CLI."""
import os

import numpy as np
import jax.numpy as jnp

from depth_correction_tpu.config import Config


def small_cfg(tmp_path):
    cfg = Config()
    cfg.log_dir = str(tmp_path / "log")
    cfg.train_names = ["ground_plane/4"]
    cfg.test_names = ["ground_plane/4"]
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.1, 20.0, 0.25
    cfg.nn_r, cfg.nn_k = 0.4, 0
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = []
    cfg.min_valid_neighbors = 3
    cfg.model_kwargs = {"w": [0.0], "exponent": [4.0]}
    cfg.depth_bias_model_kwargs = {"w": [-0.002], "exponent": [4.0]}
    cfg.loss_kwargs = {"sqrt": False, "normalization": False}
    return cfg


def test_eval_loss_writes_csv(tmp_path):
    from depth_correction_tpu.eval import eval_loss

    cfg = small_cfg(tmp_path)
    cfg.loss_eval_csv = str(tmp_path / "loss_eval_min_eigval_loss.csv")
    val = eval_loss(cfg)
    assert np.isfinite(val) and val > 0
    line = open(cfg.loss_eval_csv).read().strip()
    name, num = line.split()
    assert name == "ground_plane/4"
    # CSV keeps the reference's %.9f schema (eval.py:184), which quantizes.
    np.testing.assert_allclose(float(num), val, atol=1e-9)
    # Appends, not truncates (lock-file guarded).
    eval_loss(cfg)
    assert len(open(cfg.loss_eval_csv).read().strip().splitlines()) == 2


def test_corrector_node_roundtrip(tmp_path):
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.node import DepthCorrector

    cfg = small_cfg(tmp_path)
    cfg.grid_res = 0.0  # node does its own (hashed) grid filtering when set
    ds = create_dataset("ground_plane/4", cfg, noisy=False)
    scan, _ = ds[0]

    model = ScaledPolynomial(w=jnp.asarray([-0.002]), exponent=jnp.asarray([4.0]))
    node = DepthCorrector(cfg, model=model)
    out = node.process(scan)
    assert out is not None and len(out) > 100
    assert set(out.dtype.names) >= {"x", "y", "z", "normal_x", "mask"}
    # Stale scans are dropped by age gating.
    node_aged = DepthCorrector(cfg, model=model, max_age=0.001)
    assert node_aged.process(scan, stamp=0.0) is None


def test_corrector_node_grid_engine_matches_brute(tmp_path):
    """The fused grid-hash program (the big-scan engine,
    node.py:_grid_correct_program) produces the SAME corrected output as the
    fused brute-force program: identical neighbor sets within r (both exact)
    -> identical features, masks, and corrected points."""
    from depth_correction_tpu.cloud import Cloud
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.node import correct_cloud
    from depth_correction_tpu.preproc import pad_size

    cfg = small_cfg(tmp_path)
    cfg.grid_res = 0.25
    ds = create_dataset("ground_plane/4", cfg, noisy=False)
    scan, _ = ds[0]
    cloud = Cloud.from_structured_array(scan, dtype=cfg.jax_float_type())
    cloud = cloud.pad(pad_size(cloud.size))
    model = ScaledPolynomial(w=jnp.asarray([-0.002]),
                             exponent=jnp.asarray([4.0]))

    cfg.nn_backend = "brute"
    ref = correct_cloud(model, cloud, cfg)
    cfg.nn_backend = "grid"
    got = correct_cloud(model, cloud, cfg)
    keep = np.asarray(ref[4])
    np.testing.assert_array_equal(np.asarray(got[4]), keep)
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))
    np.testing.assert_allclose(
        np.asarray(got[0])[keep], np.asarray(ref[0])[keep], rtol=1e-6,
        atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(got[1])[keep], np.asarray(ref[1])[keep], rtol=1e-6,
        atol=1e-7)

    # Width-overflow retry: an undersized initial window trips the in-program
    # true_win flag, retries once at the next pow2, and matches exactly.
    from depth_correction_tpu.node import _WIDTH_CACHE
    _WIDTH_CACHE.clear()
    tiny = correct_cloud(model, cloud, cfg, width=1)
    np.testing.assert_array_equal(np.asarray(tiny[3]), np.asarray(got[3]))
    np.testing.assert_array_equal(np.asarray(tiny[0]), np.asarray(got[0]))
    assert max(_WIDTH_CACHE.values()) > 1  # the retry resized + cached

    # SLAB engine (the streaming default for big scans): same membership
    # (bit-compatible d2), one-pass tile-shifted moments -> identical masks
    # and corrected points to f32 rounding. The slab engine is UNCAPPED
    # (reference query_ball_point semantics); the brute oracle must get a
    # K that covers the max within-r degree for the sets to coincide.
    cfg.nn_backend = "brute"
    ref = correct_cloud(model, cloud, cfg, k=128)
    cfg.nn_backend = "slab"
    slab = correct_cloud(model, cloud, cfg)
    np.testing.assert_array_equal(np.asarray(slab[4]), keep)
    np.testing.assert_array_equal(np.asarray(slab[3]), np.asarray(ref[3]))
    np.testing.assert_allclose(
        np.asarray(slab[0])[keep], np.asarray(ref[0])[keep], rtol=1e-5,
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(slab[1])[keep], np.asarray(ref[1])[keep], rtol=1e-5,
        atol=1e-6)
    # normals agree up to f32 eigenvector rounding on MASKED rows (below
    # min_valid_neighbors the covariance is degenerate and the eigenvector
    # arbitrary — those rows are masked and left uncorrected)
    msk = np.asarray(slab[3])
    np.testing.assert_allclose(
        np.asarray(slab[2])[msk], np.asarray(ref[2])[msk], rtol=1e-3,
        atol=1e-4)

    # Slab-width overflow retry.
    _WIDTH_CACHE.clear()
    slab2 = correct_cloud(model, cloud, cfg, width=8)
    np.testing.assert_array_equal(np.asarray(slab2[3]), np.asarray(slab[3]))
    np.testing.assert_allclose(
        np.asarray(slab2[0]), np.asarray(slab[0]), rtol=1e-6, atol=1e-7)
    assert max(_WIDTH_CACHE.values()) > 8


def test_grid_static_shapes_identical_results():
    """static_shapes=True (the streaming node's recompile guard,
    ops/grid_hash.py) pow2-rounds the window width and dense-starts length
    without changing any result."""
    from depth_correction_tpu.ops.grid_hash import grid_radius_neighbors

    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.uniform(0, 4, (3000, 3)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=3000) > 0.1)
    d0, i0 = grid_radius_neighbors(pts, r=0.3, k=16, valid_points=valid,
                                   valid_query=valid)
    d1, i1 = grid_radius_neighbors(pts, r=0.3, k=16, valid_points=valid,
                                   valid_query=valid, static_shapes=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)


def test_localization_errors_identity_and_known_offset():
    from depth_correction_tpu.metrics import localization_errors
    from depth_correction_tpu.ops.se3 import xyz_axis_angle_to_matrix

    rng = np.random.default_rng(0)
    x = np.concatenate([rng.standard_normal((5, 3)), 0.3 * rng.standard_normal((5, 3))], 1)
    T = np.asarray(xyz_axis_angle_to_matrix(jnp.asarray(x)))
    a, t, ra, rt = localization_errors(jnp.asarray(T), jnp.asarray(T))
    np.testing.assert_allclose(np.asarray(a), 0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(rt), 0, atol=1e-9)
    # Constant world-frame offset (D @ T): relative errors cancel exactly;
    # the absolute rotation error equals D's angle (conjugation-invariant).
    D = np.asarray(
        xyz_axis_angle_to_matrix(jnp.asarray([0.1, 0.0, 0.0, 0.0, 0.0, 0.05]))
    )
    a, t, ra, rt = localization_errors(jnp.asarray(T), jnp.asarray(D @ T))
    np.testing.assert_allclose(np.asarray(a), 0.05, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ra), 0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(rt), 0, atol=1e-9)


def test_chamfer_and_mapping_accuracy():
    from depth_correction_tpu.metrics import chamfer_distance, mapping_accuracy

    rng = np.random.default_rng(1)
    y = rng.uniform(0, 5, (500, 3))
    shift = np.array([0.02, 0.0, 0.0])
    x = y[:300] + shift
    d = float(chamfer_distance(jnp.asarray(x), jnp.asarray(y)))
    assert 0 < d <= 0.02 + 1e-9
    m = float(mapping_accuracy(jnp.asarray(x), jnp.asarray(y), icp_inlier_ratio=0.8))
    assert 0 < m <= 0.02 + 1e-9


def test_cli_print_config_and_splits(capsys, tmp_path):
    from depth_correction_tpu.main import create_splits, main

    main(["--lr", "0.01", "--", "print_config"])
    out = capsys.readouterr().out
    assert "lr: 0.01" in out

    splits = create_splits(["a", "b", "c", "d"], num_splits=4)
    assert len(splits) == 4
    for s in splits:
        assert len(s["train_names"]) == 2
        assert s["val_names"][0] not in s["train_names"]
        assert s["test_names"][0] not in s["train_names"]
        assert s["val_names"] != s["test_names"]


def test_slab_engine_y_windows_cover_walls(tmp_path):
    """A surface PERPENDICULAR to the major sort axis packs into one slab
    (the open-box walls measured width 16384 on TPU, 106 of the 113
    ms/scan). The per-tile second-axis windows (column-aligned layout,
    ops/slabwin.py) cut wall tiles to their local y-range, so the cached
    width stays far below the whole-wall size while results remain exact
    vs the brute oracle. The residual width here comes from the artificial
    SPARSE volume columns: their single tile spans the full y-range, so
    its window legitimately includes the neighboring wall slab (real lidar
    scans are surfaces — every occupied column is dense and y-local)."""
    from depth_correction_tpu.cloud import Cloud
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.node import _WIDTH_CACHE, correct_cloud
    from depth_correction_tpu.preproc import pad_size

    rng = np.random.default_rng(5)
    # Dense wall at x = 0 spanning y-z (thin in x), plus sparse volume.
    wall = np.stack([
        np.zeros(3000),
        rng.uniform(0, 8, 3000),
        rng.uniform(0, 4, 3000),
    ], 1)
    vol = rng.uniform([-4, 0, 0], [4, 8, 4], (1500, 3))
    pts = np.concatenate([wall, vol]).astype(np.float32)
    vps = pts - np.array([5.0, 0.0, 0.0], np.float32)  # views from -x

    cfg = small_cfg(tmp_path)
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.1, 50.0, 0.0
    cfg.nn_r = 0.25

    cloud = Cloud.from_points(pts, vps=jnp.asarray(vps),
                              dtype=jnp.float32)
    cloud = cloud.pad(pad_size(cloud.size))
    model = ScaledPolynomial(w=jnp.asarray([-0.002]),
                             exponent=jnp.asarray([4.0]))

    cfg.nn_backend = "brute"
    ref = correct_cloud(model, cloud, cfg, k=256)
    cfg.nn_backend = "slab"
    _WIDTH_CACHE.clear()
    slab = correct_cloud(model, cloud, cfg, width=1024)
    slab_w = max(w for (bk, *_), w in _WIDTH_CACHE.items() if bk == "slab")
    # Dense-wall tiles are y-windowed (~400 candidates); the sparse volume
    # tiles next to the wall bound the width at ~the wall-slab population,
    # still 4x under the whole-wall 16384 the slab-only windows needed.
    assert slab_w <= 4096
    keep = np.asarray(ref[4])
    np.testing.assert_array_equal(np.asarray(slab[4]), keep)
    msk = np.asarray(slab[3]) & np.asarray(ref[3])
    # 0.1 mm: f32 eigenvector sensitivity on dense wall neighborhoods
    # (one-pass vs two-pass covariance), two orders below the mm-to-cm
    # biases the model corrects.
    np.testing.assert_allclose(
        np.asarray(slab[0])[msk], np.asarray(ref[0])[msk], rtol=1e-5,
        atol=1e-4)


def test_slab_engine_xcols_retry(tmp_path):
    """A scan spanning more major-axis columns than the slab engine's
    initial bound (NODE_X_COLS_MIN) silently over-coarsens the grid on the
    first compile (exact, wider spans); the program's dims0 scalar then
    drives one retry at the scan's actual column count, the stream caches
    it, and results match the brute oracle exactly."""
    from depth_correction_tpu.cloud import Cloud
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.node import (
        _WIDTH_CACHE,
        _XCOLS_CACHE,
        NODE_X_COLS_MIN,
        correct_cloud,
    )
    from depth_correction_tpu.preproc import pad_size

    rng = np.random.default_rng(11)
    # A long strip: ~200 columns at cell = nn_r = 0.25 (x span 50 m).
    n = 4000
    pts = np.stack([
        rng.uniform(0, 50, n),
        rng.uniform(0, 1.5, n),
        rng.uniform(0, 0.2, n),
    ], 1).astype(np.float32)
    vps = pts - np.array([0.0, 5.0, 0.0], np.float32)

    cfg = small_cfg(tmp_path)
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.1, 50.0, 0.0
    cfg.nn_r = 0.25
    cloud = Cloud.from_points(pts, vps=jnp.asarray(vps), dtype=jnp.float32)
    cloud = cloud.pad(pad_size(cloud.size))
    model = ScaledPolynomial(w=jnp.asarray([-0.002]),
                             exponent=jnp.asarray([4.0]))

    cfg.nn_backend = "brute"
    ref = correct_cloud(model, cloud, cfg, k=128)
    cfg.nn_backend = "slab"
    _WIDTH_CACHE.clear()
    _XCOLS_CACHE.clear()
    slab = correct_cloud(model, cloud, cfg)
    xc = max(_XCOLS_CACHE.values())
    assert xc > NODE_X_COLS_MIN  # the retry resized + cached
    keep = np.asarray(ref[4])
    np.testing.assert_array_equal(np.asarray(slab[4]), keep)
    np.testing.assert_array_equal(np.asarray(slab[3]), np.asarray(ref[3]))
    # 0.1 mm: f32 eigenvector sensitivity of the one-pass vs gathered
    # covariance at ~50 m coordinates (same class as the wall test).
    np.testing.assert_allclose(
        np.asarray(slab[0])[keep], np.asarray(ref[0])[keep], rtol=1e-5,
        atol=1e-4)
