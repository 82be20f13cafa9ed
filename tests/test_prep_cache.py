"""Cross-run prep cache (cfg.prep_cache_dir, utils/prep_cache.py).

The reference amortizes establishment within one run (reference:
train.py:166-226); the cache extends it across runs: a second
prepare_sequences() on identical (data, knobs) must reload a bit-identical
frozen graph without re-running establishment.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_cfg(tmp_path, **kw):
    from depth_correction_tpu.config import Config

    cfg = Config()
    cfg.log_dir = str(tmp_path / "exp")
    cfg.prep_cache_dir = str(tmp_path / "prep_cache")
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
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _entries(cfg):
    d = cfg.prep_cache_dir
    return sorted(f for f in os.listdir(d)) if os.path.isdir(d) else []


def _assert_tree_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_prep_cache_hit_is_bitidentical(tmp_path, monkeypatch):
    """Second prepare_sequences on identical (data, knobs) reloads a
    bit-identical TrainData WITHOUT re-running establishment; a config
    differing only in model/optimizer/lr shares the entry."""
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu import train as train_mod
    from depth_correction_tpu.train import prepare_sequences

    cfg = _tiny_cfg(tmp_path)
    ds = create_dataset(cfg.train_names[0], cfg)
    data1 = prepare_sequences([ds], cfg)
    assert len(_entries(cfg)) == 1

    # Establishment must NOT run on the hit path.
    def _boom(*a, **kw):
        raise AssertionError("establishment ran despite a prep-cache hit")

    monkeypatch.setattr(train_mod, "establish_neighborhoods", _boom)
    monkeypatch.setattr(train_mod, "local_feature_cloud", _boom)
    data2 = prepare_sequences([ds], cfg)
    _assert_tree_equal(data1, data2)
    assert len(_entries(cfg)) == 1

    # model / optimizer / lr are excluded from the fingerprint: the grid
    # runner's experiments share one entry.
    cfg3 = _tiny_cfg(tmp_path, model_kwargs={"w": [0.5]}, lr=123.0,
                     optimizer="SGD", n_opt_iters=7)
    data3 = prepare_sequences([ds], cfg3)
    _assert_tree_equal(data1, data3)
    assert len(_entries(cfg)) == 1


@pytest.mark.slow
def test_prep_cache_knob_or_data_invalidates(tmp_path):
    """Establishment knobs and scan content are both in the fingerprint."""
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.train import prepare_sequences

    cfg = _tiny_cfg(tmp_path)
    ds = create_dataset(cfg.train_names[0], cfg)
    prepare_sequences([ds], cfg)
    assert len(_entries(cfg)) == 1

    cfg2 = _tiny_cfg(tmp_path, nn_r=0.3)
    prepare_sequences([ds], cfg2)
    assert len(_entries(cfg)) == 2

    # Different data (injected bias changes scan content) -> new entry.
    cfg3 = _tiny_cfg(tmp_path,
                     depth_bias_model_kwargs={"w": [-0.004],
                                              "exponent": [4.0]})
    ds3 = create_dataset(cfg3.train_names[0], cfg3)
    prepare_sequences([ds3], cfg3)
    assert len(_entries(cfg)) == 3

    # mesh presence changes which auxiliary graphs are built -> new entry.
    from depth_correction_tpu.parallel import make_mesh

    prepare_sequences([ds], cfg, mesh=make_mesh(2))
    assert len(_entries(cfg)) == 4


def test_prep_cache_cellwin_roundtrip(tmp_path, monkeypatch):
    """The cell-window structure (incl. static metadata and the exception
    transpose) survives the cache; the loss from cached data is identical."""
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu import train as train_mod
    from depth_correction_tpu.train import make_loss_fn, prepare_sequences

    cfg = _tiny_cfg(tmp_path, moments_backend="cellwin",
                    cellwin_eps_rel=5e-4, cellwin_max_exc_frac=0.5)
    ds = create_dataset(cfg.train_names[0], cfg)
    data1 = prepare_sequences([ds], cfg)
    cw1 = data1.cellwin[0]
    assert cw1 is not None and cw1.n_exc > 0  # exception path in the record

    def _boom(*a, **kw):
        raise AssertionError("cellwin build ran despite a prep-cache hit")

    monkeypatch.setattr(train_mod, "establish_neighborhoods", _boom)
    data2 = prepare_sequences([ds], cfg)
    cw2 = data2.cellwin[0]
    assert cw2.n_exc == cw1.n_exc and cw2.dims == cw1.dims
    _assert_tree_equal(data1, data2)

    params = {"model": ScaledPolynomial(w=jnp.asarray([-1e-3]),
                                        exponent=jnp.asarray([4.0]))}
    loss_fn = make_loss_fn(cfg)
    v1 = float(loss_fn(params, data1))
    v2 = float(loss_fn(params, data2))
    assert v1 == v2


def test_prep_cache_corrupt_entry_rebuilds(tmp_path):
    """A truncated/corrupt entry is a miss, not a crash."""
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.train import prepare_sequences

    cfg = _tiny_cfg(tmp_path)
    ds = create_dataset(cfg.train_names[0], cfg)
    data1 = prepare_sequences([ds], cfg)
    (entry,) = _entries(cfg)
    path = os.path.join(cfg.prep_cache_dir, entry)
    with open(path, "wb") as f:
        f.write(b"not a pickle")
    data2 = prepare_sequences([ds], cfg)
    _assert_tree_equal(data1, data2)
