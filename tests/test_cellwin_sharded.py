"""Sharded cell-window engine: parity on the 8-virtual-device CPU mesh.

The sharded kernels (parallel/cellwin_shard.py: forward over row-tile
shards, backward over point-tile shards, cotangent-table all_gather in
the VJP) must reproduce the single-device engine — and through it the
frozen uncapped within-r graph — exactly, value and gradient, including
exception rows.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from depth_correction_tpu.ops.cellwin import (
    build_cellwin_graph,
    cellwin_moments,
    graph_to_device,
)
from depth_correction_tpu.ops.features import permute_rows
from depth_correction_tpu.parallel import make_mesh
from depth_correction_tpu.parallel.cellwin_shard import (
    cellwin_moments_sharded,
    cellwin_shard_specs,
    shard_cellwin_device,
)


def _uncapped_graph(pts, r):
    from scipy.spatial import cKDTree

    tree = cKDTree(pts)
    lists = tree.query_ball_point(pts, r)
    k = max(len(l) for l in lists)
    nn = np.full((len(pts), k), -1, np.int64)
    for i, l in enumerate(lists):
        nn[i, : len(l)] = sorted(l)
    return nn


def _scene(n=2200, r=0.35, seed=0, boundary_pair=True):
    rng = np.random.default_rng(seed)
    n1 = n // 2
    p1 = np.c_[rng.uniform(-3, 3, (n1, 2)), 0.02 * rng.standard_normal(n1)]
    p2 = rng.uniform(-3, 3, (n - n1, 3))
    pts = np.vstack([p1, p2])
    if boundary_pair:
        # A pair exactly at distance r forces >= 1 exception row, so the
        # sharded exception split (per-shard slots + stacked transposes)
        # is exercised.
        pts[1] = pts[0] + np.array([r, 0.0, 0.0])
    nn = _uncapped_graph(pts, r)
    qrows = np.arange(len(pts))
    qrows = qrows[rng.uniform(size=len(pts)) < 0.7]
    nn = nn[qrows]
    return pts, qrows, nn


def _build(pts, qrows, nn, r):
    g = build_cellwin_graph(
        pts, np.ones(len(pts), bool), qrows, nn, r,
        row_cap=64, pt_cap=64, span_limit=256,
    )
    assert g is not None
    return g


@pytest.mark.slow
def test_sharded_cellwin_value_and_grad_parity():
    r = 0.35
    pts, qrows, nn = _scene(r=r)
    g = _build(pts, qrows, nn, r)
    dev = graph_to_device(g)
    assert dev.n_exc >= 1  # the boundary pair must be flagged

    mesh = make_mesh(8)
    sh = shard_cellwin_device(dev, mesh)
    specs = cellwin_shard_specs(sh)

    # Fixed per-PADDED-ROW weights aligned via the original compacted row
    # (the sharded layout appends rows, so slot indices differ).
    rng = np.random.default_rng(3)
    row_map_s = np.asarray(dev.row_map)
    n_rows = int((row_map_s >= 0).sum())
    w_orig = rng.standard_normal(int(np.asarray(qrows).shape[0]))
    w_orig = jnp.asarray(w_orig)

    def scalar_of(mean, comps, row_map_local):
        valid = row_map_local >= 0
        w = jnp.where(valid, w_orig[jnp.maximum(row_map_local, 0)], 0.0)
        return jnp.sum(
            w * (comps[0] + 0.7 * comps[3] + 0.3 * comps[5]
                 + 0.11 * mean[1])
        )

    def f_single(p):
        ps = permute_rows(p, dev.perm, dev.inv)
        mean, comps = cellwin_moments(ps, dev)
        return scalar_of(mean, comps, jnp.asarray(dev.row_map))

    def body(p, shl):
        ps = permute_rows(p, shl.perm, shl.inv)
        mean, comps = cellwin_moments_sharded(ps, shl)
        s = scalar_of(mean, comps, shl.row_map)
        return jax.lax.psum(s, "data")

    sharded_fn = jax.shard_map(
        body, mesh=mesh, in_specs=(P(), specs), out_specs=P(),
        check_vma=False,
    )

    def f_sharded(p):
        return sharded_fn(p, sh)

    p = jnp.asarray(pts)
    v1, g1 = jax.value_and_grad(f_single)(p)
    v2, g2 = jax.value_and_grad(f_sharded)(p)
    assert n_rows > 0
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(g2), np.asarray(g1), rtol=1e-7, atol=1e-9
    )


def _tiny_cfg(tmp_path, backend, **kw):
    from depth_correction_tpu.config import Config

    cfg = Config()
    cfg.log_dir = str(tmp_path / ("exp_" + backend))
    cfg.float_type = "float64"
    cfg.train_names = ["ground_plane/4"]
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.1, 20.0, 0.25
    cfg.nn_r, cfg.nn_k = 0.4, 0
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = []
    cfg.min_valid_neighbors = 3
    cfg.model_kwargs = {"w": [0.0], "exponent": [4.0]}
    cfg.depth_bias_model_kwargs = {"w": [-0.002], "exponent": [4.0]}
    cfg.loss_kwargs = {"sqrt": False, "normalization": True}
    cfg.moments_backend = backend
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _w_grad(loss_fn, w0=-1e-3):
    from depth_correction_tpu.models import ScaledPolynomial

    def f(w):
        return loss_fn(
            {"model": ScaledPolynomial(w=w, exponent=jnp.asarray([4.0]))}
        )

    w = jnp.asarray([w0])
    v, g = jax.value_and_grad(f)(w)
    return float(v), float(np.asarray(g)[0])


@pytest.mark.parametrize("loss_offset", [False, True])
@pytest.mark.slow
def test_sharded_cellwin_loss_matches_single_device(tmp_path, loss_offset):
    """End to end: explicit cellwin + mesh trains on the SHARDED engine
    and matches both the single-device cellwin loss and the gather loss
    (same uncapped graph), value and model gradient — incl. the dynamic
    loss offset re-indexed into the padded tile layout."""
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.parallel import (
        make_sharded_loss_fn,
        shard_train_data,
    )
    from depth_correction_tpu.train import make_loss_fn, prepare_sequences

    results = {}
    ds = create_dataset("ground_plane/4", _tiny_cfg(tmp_path, "gather"))
    for backend in ("gather", "cellwin"):
        cfg = _tiny_cfg(tmp_path, backend, loss_offset=loss_offset)
        data = prepare_sequences([ds], cfg)
        if backend == "cellwin":
            assert data.cellwin[0] is not None
        results[backend] = _w_grad(
            lambda p, d=data, c=cfg: make_loss_fn(c)(p, d)
        )

    cfg = _tiny_cfg(tmp_path, "cellwin", loss_offset=loss_offset)
    mesh = make_mesh(8)
    data = prepare_sequences([ds], cfg, mesh=mesh)
    assert data.cellwin[0] is not None
    sharded = shard_train_data(data, mesh)
    from depth_correction_tpu.parallel.cellwin_shard import CellWinShards

    assert isinstance(sharded.cellwin[0], CellWinShards)
    # The engine's tables replaced the generic row tables for the sequence.
    assert sharded.neighbors[0] is None and sharded.t_neighbors[0] is None
    loss_fn = make_sharded_loss_fn(sharded, cfg, mesh)
    results["sharded"] = _w_grad(loss_fn)

    v_ref, g_ref = results["cellwin"]
    for key in ("gather", "sharded"):
        v, g = results[key]
        np.testing.assert_allclose(v, v_ref, rtol=1e-9, err_msg=key)
        np.testing.assert_allclose(g, g_ref, rtol=1e-6, err_msg=key)


@pytest.mark.slow
def test_sharded_cellwin_trains_e2e(tmp_path):
    """train() under cfg.mesh_shape + explicit cellwin recovers the
    injected bias like the single-device engine does."""
    from depth_correction_tpu.train import load_model, train

    cfg = _tiny_cfg(tmp_path, "cellwin")
    cfg.mesh_shape = {"data": 4}
    cfg.n_opt_iters = 30
    cfg.lr = 2e-4
    cfg.optimizer = "Adam"
    best = train(cfg)
    assert best is not None
    w = float(np.asarray(load_model(cfg=best).w)[0])
    # True bias is -0.002; from w=0 the fit must move decisively toward it.
    assert w < -5e-4
