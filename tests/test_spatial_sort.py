"""Morton point-table layout (cfg.spatial_sort): permutation op + parity."""
import numpy as np
import jax
import jax.numpy as jnp

from depth_correction_tpu.config import Config
from depth_correction_tpu.datasets import create_dataset
from depth_correction_tpu.models import ScaledPolynomial
from depth_correction_tpu.train import make_loss_fn, prepare_sequences


def base_cfg(**over):
    cfg = Config()
    cfg.float_type = "float32"
    cfg.train_names = ["ground_plane/4"]
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.1, 20.0, 0.25
    cfg.nn_r, cfg.nn_k = 0.4, 0
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = []
    cfg.min_valid_neighbors = 3
    cfg.loss = "min_eigval_loss"
    cfg.loss_kwargs = {"sqrt": False, "normalization": True}
    cfg.depth_bias_model_kwargs = {"w": [-0.002], "exponent": [4.0]}
    for k, v in over.items():
        setattr(cfg, k, v)
    return cfg


def test_permute_rows_grad_is_exact_inverse_gather():
    from depth_correction_tpu.ops.features import permute_rows

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(40, 3)), jnp.float32)
    perm = jnp.asarray(rng.permutation(40), jnp.int32)
    inv = jnp.argsort(perm).astype(jnp.int32)

    np.testing.assert_array_equal(
        np.asarray(permute_rows(x, perm, inv)), np.asarray(x)[np.asarray(perm)]
    )

    def f(x):
        return jnp.sum(jnp.sin(permute_rows(x, perm, inv)) * jnp.arange(120.0).reshape(40, 3))

    def f_ref(x):
        return jnp.sum(jnp.sin(jnp.take(x, perm, axis=0)) * jnp.arange(120.0).reshape(40, 3))

    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(x)), np.asarray(jax.grad(f_ref)(x)), rtol=1e-6
    )


def test_spatial_sort_perm_is_valid_permutation():
    from depth_correction_tpu.preproc import spatial_sort_perm

    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.uniform(-5, 5, (300, 3)), jnp.float32)
    valid = jnp.asarray(rng.random(300) < 0.8)
    perm, inv = spatial_sort_perm(pts, valid, 0.5)
    p = np.asarray(perm)
    assert sorted(p.tolist()) == list(range(300))
    np.testing.assert_array_equal(np.asarray(inv)[p], np.arange(300))
    # Invalid rows sort to the tail.
    nv = int((~np.asarray(valid)).sum())
    assert not np.asarray(valid)[p][300 - nv :].any()


def _loss_and_grad(cfg):
    ds = create_dataset(cfg.train_names[0], cfg)
    data = prepare_sequences([ds], cfg)
    loss_fn = make_loss_fn(cfg)

    def f(w):
        p = {"model": ScaledPolynomial(w=w, exponent=jnp.asarray([4.0]))}
        return loss_fn(p, data)

    w0 = jnp.asarray([-0.001])
    return float(f(w0)), np.asarray(jax.grad(f)(w0))


def test_spatial_sort_loss_and_grad_parity():
    ref_v, ref_g = _loss_and_grad(base_cfg())
    got_v, got_g = _loss_and_grad(base_cfg(spatial_sort=True))
    np.testing.assert_allclose(got_v, ref_v, rtol=1e-5)
    np.testing.assert_allclose(got_g, ref_g, rtol=1e-4)


def test_spatial_sort_parity_nn_scale_and_offset():
    # nn_scale exercises the query_rows remap; loss_offset the local path.
    over = {"nn_scale": 0.3}
    ref_v, ref_g = _loss_and_grad(base_cfg(**over))
    got_v, got_g = _loss_and_grad(base_cfg(spatial_sort=True, **over))
    np.testing.assert_allclose(got_v, ref_v, rtol=1e-5)
    np.testing.assert_allclose(got_g, ref_g, rtol=1e-4)

    over = {"loss_offset": True}
    ref_v, ref_g = _loss_and_grad(base_cfg(**over))
    got_v, got_g = _loss_and_grad(base_cfg(spatial_sort=True, **over))
    np.testing.assert_allclose(got_v, ref_v, rtol=1e-5)
    np.testing.assert_allclose(got_g, ref_g, rtol=1e-4)


def test_spatial_sort_train_recovers_bias(tmp_path):
    from depth_correction_tpu.train import train

    cfg = base_cfg(spatial_sort=True)
    cfg.log_dir = str(tmp_path / "exp")
    cfg.model_kwargs = {"w": [0.0], "exponent": [4.0]}
    cfg.lr, cfg.n_opt_iters = 1e-3, 15
    best = train(cfg)
    assert best is not None
    rows = np.loadtxt(tmp_path / "exp" / "train_history.csv", skiprows=1, ndmin=2)
    assert rows[-1, 1] < rows[0, 1]
