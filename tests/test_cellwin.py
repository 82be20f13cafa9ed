"""Cell-window moments kernel: parity vs the gather path (interpret mode).

The kernel must reproduce the UNCAPPED within-r graph's moments and
gradients exactly (up to summation order) — including exception rows,
which route through the gather path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depth_correction_tpu.ops.cellwin import (
    build_cellwin_graph,
    cellwin_moments,
    graph_to_device,
)
from depth_correction_tpu.ops.features import (
    _moments_impl,
    permute_rows,
)


def _uncapped_graph(pts, r):
    """(Mq=N, K) within-r neighbor matrix via scipy (includes self)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(pts)
    lists = tree.query_ball_point(pts, r)
    k = max(len(l) for l in lists)
    nn = np.full((len(pts), k), -1, np.int64)
    for i, l in enumerate(lists):
        nn[i, : len(l)] = sorted(l)
    return nn


def _setup(n=3000, r=0.35, seed=0, plane_frac=0.5):
    rng = np.random.default_rng(seed)
    # half on a plane (dense, thin cells), half in a box (3-D occupancy)
    n1 = int(n * plane_frac)
    p1 = np.c_[rng.uniform(-3, 3, (n1, 2)), 0.02 * rng.standard_normal(n1)]
    p2 = rng.uniform(-3, 3, (n - n1, 3))
    pts = np.vstack([p1, p2])
    nn = _uncapped_graph(pts, r)
    qrows = np.arange(len(pts))
    # drop some rows to exercise compaction (rows != points)
    qrows = qrows[rng.uniform(size=len(pts)) < 0.7]
    nn = nn[qrows]
    return pts, qrows, nn


def _gather_moments(pts, nn):
    w = (nn >= 0).astype(pts.dtype)
    mean, comps, w_sum = _moments_impl(
        jnp.asarray(pts), jnp.asarray(nn), jnp.asarray(w)
    )
    return mean, comps


def test_cellwin_forward_parity():
    pts, qrows, nn = _setup()
    r = 0.35
    g = build_cellwin_graph(
        pts, np.ones(len(pts), bool), qrows, nn, r,
        row_cap=64, pt_cap=64, span_limit=256,
    )
    assert g is not None
    dev = graph_to_device(g)
    pts_j = jnp.asarray(pts)
    pts_sorted = permute_rows(pts_j, dev.perm, dev.inv)
    mean_c, comps_c = cellwin_moments(pts_sorted, dev)

    mean_g, comps_g = _gather_moments(pts, nn)

    # padded row slot -> original compacted row
    row_map = np.asarray(dev.row_map)
    sel = row_map >= 0
    np.testing.assert_allclose(
        np.asarray(mean_c)[:, sel], np.asarray(mean_g)[:, row_map[sel]],
        rtol=1e-9, atol=1e-10,
    )
    for cc, cg in zip(comps_c, comps_g):
        np.testing.assert_allclose(
            np.asarray(cc)[sel], np.asarray(cg)[row_map[sel]],
            rtol=1e-8, atol=1e-9,
        )


def test_cellwin_gradient_parity():
    pts, qrows, nn = _setup(n=1500, seed=1)
    r = 0.35
    g = build_cellwin_graph(
        pts, np.ones(len(pts), bool), qrows, nn, r,
        row_cap=64, pt_cap=64, span_limit=256,
    )
    assert g is not None
    dev = graph_to_device(g)
    row_map = np.asarray(dev.row_map)
    sel = row_map >= 0
    # arbitrary fixed per-row weights so every cotangent is exercised
    rng = np.random.default_rng(3)
    wm = jnp.asarray(rng.standard_normal(int(sel.sum())))
    wg = jnp.zeros(row_map.shape[0]).at[np.flatnonzero(sel)].set(wm)

    def f_cell(p):
        ps = permute_rows(p, dev.perm, dev.inv)
        mean, comps = cellwin_moments(ps, dev)
        return jnp.sum(wg * (comps[0] + 0.7 * comps[3] + 0.3 * comps[5]
                             + 0.11 * mean[1]))

    def f_gather(p):
        w = (jnp.asarray(nn) >= 0).astype(p.dtype)
        mean, comps, _ = _moments_impl(p, jnp.asarray(nn), w)
        wr = jnp.zeros(mean.shape[1]).at[row_map[sel]].set(wm)
        return jnp.sum(wr * (comps[0] + 0.7 * comps[3] + 0.3 * comps[5]
                             + 0.11 * mean[1]))

    p = jnp.asarray(pts)
    v1, g1 = jax.value_and_grad(f_cell)(p)
    v2, g2 = jax.value_and_grad(f_gather)(p)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-7, atol=1e-8
    )


def test_cellwin_exception_rows():
    """A pair exactly at distance r is boundary-ambiguous: its rows must be
    flagged and recomputed through the gather path — parity still exact."""
    rng = np.random.default_rng(7)
    pts = rng.uniform(-1, 1, (400, 3))
    r = 0.5
    pts[1] = pts[0] + np.array([r, 0.0, 0.0])  # exactly at the boundary
    nn = _uncapped_graph(pts, r)
    qrows = np.arange(len(pts))
    g = build_cellwin_graph(
        pts, np.ones(len(pts), bool), qrows, nn, r,
        row_cap=32, pt_cap=32, span_limit=256,
    )
    assert g is not None and g.n_exc >= 1
    dev = graph_to_device(g)
    ps = permute_rows(jnp.asarray(pts), dev.perm, dev.inv)
    mean_c, comps_c = cellwin_moments(ps, dev)
    mean_g, comps_g = _gather_moments(pts, nn)
    row_map = np.asarray(dev.row_map)
    sel = row_map >= 0
    np.testing.assert_allclose(
        np.asarray(mean_c)[:, sel], np.asarray(mean_g)[:, row_map[sel]],
        rtol=1e-9, atol=1e-10,
    )
    for cc, cg in zip(comps_c, comps_g):
        np.testing.assert_allclose(
            np.asarray(cc)[sel], np.asarray(cg)[row_map[sel]],
            rtol=1e-8, atol=1e-9,
        )


def _tiny_cfg(tmp_path, backend):
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
    return cfg


def test_cellwin_loss_matches_gather_backend(tmp_path):
    """Same config, same (uncapped) graph: the two moments engines must
    agree on the loss value and its model gradient."""
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.train import make_loss_fn, prepare_sequences

    vals = {}
    grads = {}
    for backend in ("gather", "cellwin"):
        cfg = _tiny_cfg(tmp_path, backend)
        ds = create_dataset(cfg.train_names[0], cfg)
        data = prepare_sequences([ds], cfg)
        if backend == "cellwin":
            assert data.cellwin[0] is not None, "cellwin build declined"
        loss_fn = make_loss_fn(cfg)
        params = {
            "model": ScaledPolynomial(
                w=jnp.asarray([-1e-3]), exponent=jnp.asarray([4.0])
            )
        }
        val, g = jax.value_and_grad(lambda p: loss_fn(p, data))(params)
        vals[backend] = float(val)
        grads[backend] = float(np.asarray(g["model"].w)[0])
    np.testing.assert_allclose(vals["cellwin"], vals["gather"], rtol=1e-9)
    np.testing.assert_allclose(grads["cellwin"], grads["gather"], rtol=1e-6)


@pytest.mark.slow
def test_cellwin_train_recovers_bias(tmp_path):
    """train() end to end with the cellwin engine recovers the injected
    depth bias like the gather engine does."""
    from depth_correction_tpu.models import load_model
    from depth_correction_tpu.train import train

    cfg = _tiny_cfg(tmp_path, "cellwin")
    cfg.loss_kwargs = {"sqrt": False, "normalization": False}
    cfg.lr, cfg.n_opt_iters = 1e-4, 60
    best = train(cfg)
    m = load_model(cfg=best)
    w = float(np.asarray(m.w)[0])
    assert -0.0026 < w < -0.0012, w


@pytest.mark.slow
def test_cellwin_offset_and_multisequence_parity(tmp_path):
    """loss_offset tables re-index into the padded row layout, and each
    sequence carries its own graph — value+grad parity vs gather."""
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.train import make_loss_fn, prepare_sequences

    vals = {}
    grads = {}
    for backend in ("gather", "cellwin"):
        cfg = _tiny_cfg(tmp_path, backend)
        cfg.train_names = ["ground_plane/4", "open_box/n_3_density_60"]
        cfg.loss_offset = True
        dss = [create_dataset(n, cfg) for n in cfg.train_names]
        data = prepare_sequences(dss, cfg)
        if backend == "cellwin":
            assert all(c is not None for c in data.cellwin)
        loss_fn = make_loss_fn(cfg)
        params = {
            "model": ScaledPolynomial(
                w=jnp.asarray([-1e-3]), exponent=jnp.asarray([4.0])
            )
        }
        val, g = jax.value_and_grad(lambda p: loss_fn(p, data))(params)
        vals[backend] = float(val)
        grads[backend] = float(np.asarray(g["model"].w)[0])
    np.testing.assert_allclose(vals["cellwin"], vals["gather"], rtol=1e-9)
    np.testing.assert_allclose(grads["cellwin"], grads["gather"], rtol=1e-6)


def test_cellwin_build_declines_gracefully():
    """Span budgets the windows cannot meet return None (the caller falls
    back to the gather engine)."""
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (500, 3))
    nn = _uncapped_graph(pts, 0.4)
    g = build_cellwin_graph(
        pts, np.ones(500, bool), np.arange(500), nn, 0.4,
        row_cap=32, pt_cap=32, span_limit=8,
    )
    assert g is None


@pytest.mark.slow
def test_cellwin_checkpoint_resume_bitexact(tmp_path):
    """A resumed cellwin run reproduces the uninterrupted trajectory (the
    graph rebuild at resume is deterministic)."""
    from depth_correction_tpu.config import Config
    from depth_correction_tpu.models import load_model
    from depth_correction_tpu.train import train

    def cfgf(log_dir, iters):
        cfg = _tiny_cfg(tmp_path, "cellwin")
        cfg.log_dir = str(log_dir)
        cfg.loss_kwargs = {"sqrt": False, "normalization": False}
        cfg.lr = 2e-4
        cfg.n_opt_iters = iters
        cfg.checkpoint_period = 5
        return cfg

    best_a = train(cfgf(tmp_path / "a", 12))
    w_a = np.asarray(load_model(cfg=best_a).w)

    train(cfgf(tmp_path / "b", 7))
    best_b = train(cfgf(tmp_path / "b", 12))
    w_b = np.asarray(load_model(cfg=best_b).w)
    np.testing.assert_allclose(w_b, w_a, rtol=1e-12)


def test_cellwin_auto_under_mesh_promotes_sharded(tmp_path, monkeypatch):
    """'auto' + mesh selects the sharded cell-window engine on TPU (round-5
    promotion: parity at 8 virtual devices proven in
    tests/test_cellwin_sharded.py, single-chip speedup 8.7x) — under the
    same uncapped-graph gate as single-chip auto. A capped graph keeps
    gather (auto never changes the objective); off-TPU auto keeps gather."""
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.parallel import make_mesh
    from depth_correction_tpu import train as train_mod
    from depth_correction_tpu.train import prepare_sequences

    mesh = make_mesh(2)
    cfg = _tiny_cfg(tmp_path, "auto")
    ds = create_dataset(cfg.train_names[0], cfg)

    # Off-TPU (this CPU suite): auto keeps gather, mesh or not.
    data = prepare_sequences([ds], cfg, mesh=mesh)
    assert not any(c is not None for c in (data.cellwin or ()))

    # On TPU (mocked backend): auto + mesh now builds the cellwin graph
    # (shard_train_data then splits it into CellWinShards).
    monkeypatch.setattr(train_mod.jax, "default_backend", lambda: "tpu")
    data = prepare_sequences([ds], cfg, mesh=mesh)
    assert data.cellwin[0] is not None

    # ... but never for a capped graph (the objective the user asked for
    # is not the uncapped within-r graph).
    capped = _tiny_cfg(tmp_path, "auto")
    capped.nn_max_neighbors = 16
    data = prepare_sequences([ds], capped, mesh=mesh)
    assert not any(c is not None for c in (data.cellwin or ()))

    cfg = _tiny_cfg(tmp_path, "cellwin")
    data = prepare_sequences([ds], cfg, mesh=mesh)
    assert data.cellwin[0] is not None


def test_bind_cellwin_static_identity(tmp_path):
    """bind_cellwin_static: stripped data + closure graphs == original
    objective (value and model gradient)."""
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.train import (
        bind_cellwin_static,
        make_loss_fn,
        prepare_sequences,
    )

    cfg = _tiny_cfg(tmp_path, "cellwin")
    ds = create_dataset(cfg.train_names[0], cfg)
    data = prepare_sequences([ds], cfg)
    assert data.cellwin[0] is not None
    loss_fn = make_loss_fn(cfg)
    params = {
        "model": ScaledPolynomial(
            w=jnp.asarray([-1e-3]), exponent=jnp.asarray([4.0])
        )
    }
    ref_v, ref_g = jax.value_and_grad(lambda p: loss_fn(p, data))(params)

    bound, stripped = bind_cellwin_static(loss_fn, data)
    assert not any(c is not None for c in (stripped.cellwin or ()))
    v, g = jax.jit(jax.value_and_grad(bound))(params, stripped)
    # jit-vs-eager reassociation leaves ~1e-11 relative noise
    np.testing.assert_allclose(float(v), float(ref_v), rtol=1e-9)
    np.testing.assert_allclose(
        float(np.asarray(g["model"].w)[0]),
        float(np.asarray(ref_g["model"].w)[0]),
        rtol=1e-8,
    )
    # no-op passthrough without graphs
    f2, d2 = bind_cellwin_static(loss_fn, stripped)
    assert f2 is loss_fn and d2 is stripped
