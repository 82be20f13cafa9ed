"""loss_offset semantics and the L-BFGS optimizer path."""
import pytest
import numpy as np
import jax.numpy as jnp

from depth_correction_tpu.config import Config
from depth_correction_tpu.datasets import create_dataset
from depth_correction_tpu.models import ScaledPolynomial
from depth_correction_tpu.train import make_loss_fn, make_optimizer, prepare_sequences


def cfg_base(loss_offset=False):
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
    cfg.loss_offset = loss_offset
    return cfg


def test_loss_offset_reduces_loss():
    """Offsetting by the local-cloud loss removes the single-scan floor:
    the offset loss is strictly below the raw loss and stays nonnegative."""
    ds = create_dataset("ground_plane/4", cfg_base())
    cfg_raw = cfg_base(False)
    cfg_off = cfg_base(True)
    data_raw = prepare_sequences([ds], cfg_raw)
    data_off = prepare_sequences([ds], cfg_off)
    assert data_off.off_neighbors[0] is not None
    assert np.asarray(data_off.off_neighbors[0]).max() > 0

    model = ScaledPolynomial(w=jnp.zeros(1), exponent=jnp.asarray([4.0]))
    raw = float(make_loss_fn(cfg_raw)({"model": model}, data_raw))
    off = float(make_loss_fn(cfg_off)({"model": model}, data_off))
    assert 0.0 <= off < raw


@pytest.mark.slow
def test_loss_offset_tracks_current_model():
    """The dynamic offset equals a FROM-SCRATCH local-loss recomputation
    under the current model at several w values (reference: preproc.py:67-77
    applies the model to the local clouds before offsetting)."""
    import jax

    from depth_correction_tpu.ops.features import neighborhood_features
    from depth_correction_tpu.preproc import flatten_batch

    cfg = cfg_base(True)
    ds = create_dataset("ground_plane/4", cfg)
    data = prepare_sequences([ds], cfg)
    batch = data.batches[0]
    onn, ow = data.off_neighbors[0], data.off_weights[0]

    loss_fn = make_loss_fn(cfg)
    for w in (-0.004, 0.0, 0.003):
        model = ScaledPolynomial(w=jnp.asarray([w]), exponent=jnp.asarray([4.0]))

        # From-scratch: apply the model to the LOCAL clouds, recompute local
        # eigvals over the frozen local neighborhoods (autodiff path, no
        # transpose graph), take lambda_1.
        local = flatten_batch(model.apply(batch.cloud))
        f = neighborhood_features(
            local.get_points(), onn, ow, compute_normals=False
        )
        expected = np.asarray(f["eigvals"][..., 0])

        # The trainer's offset: recomputed inside loss_fn via the analytic
        # transpose path. Compare through the scalar loss: loss(with offset)
        # must equal loss(raw) with `expected` subtracted pointwise.
        got = float(loss_fn({"model": model}, data))
        cfg_raw = cfg_base(False)
        data_raw = prepare_sequences([ds], cfg_raw)
        raw_fn = make_loss_fn(cfg_raw)

        from depth_correction_tpu.loss import create_loss
        from depth_correction_tpu.train import FeatureRows

        # Recompute the raw pointwise loss on the same rows and subtract the
        # expected offset manually.
        from depth_correction_tpu.preproc import global_cloud

        g = global_cloud(batch, model=model)
        fg = neighborhood_features(
            g.get_points(), data.neighbors[0], data.weights[0],
            compute_normals=False,
        )
        pw = np.asarray(fg["eigvals"][..., 0])
        mask = np.asarray(data.masks[0])
        manual = np.maximum(pw - expected, 0.0)[mask].mean()
        assert np.isfinite(got)
        np.testing.assert_allclose(got, manual, rtol=1e-5)


def _run_lbfgs(cfg, n_iters=20):
    import jax
    import optax

    ds = create_dataset("ground_plane/4", cfg)
    data = prepare_sequences([ds], cfg)
    loss_fn = make_loss_fn(cfg)
    params = {"model": ScaledPolynomial(w=jnp.zeros(1), exponent=jnp.asarray([4.0]))}
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, data):
        loss, grads = jax.value_and_grad(loss_fn)(params, data)
        updates, opt_state = tx.update(
            grads, opt_state, params,
            value=loss, grad=grads, value_fn=lambda p: loss_fn(p, data),
        )
        return loss, optax.apply_updates(params, updates), opt_state

    l0 = float(loss_fn(params, data))
    for _ in range(n_iters):
        loss, params, opt_state = step(params, opt_state, data)
    return l0, float(loss_fn(params, data))


def test_lbfgs_optimizer_trains():
    cfg = cfg_base()
    cfg.optimizer = "lbfgs"
    cfg.lr = 0.3
    l0, l_ls = _run_lbfgs(cfg)
    assert l_ls < l0

    # The strong-Wolfe line search (default) should converge at least as
    # well in the same iteration count as the plain lr-scaled update
    # (reference torch LBFGS re-evaluates the closure; train.py:300-312).
    cfg2 = cfg_base()
    cfg2.optimizer = "lbfgs"
    cfg2.lr = 0.3
    cfg2.optimizer_kwargs = {"line_search": False}
    _, l_plain = _run_lbfgs(cfg2)
    assert l_ls <= l_plain * 1.05


def test_loss_offset_with_nn_scale_pair_transpose():
    """nn_scale + loss_offset: the offset features stay UNSCALED (reference
    semantics — cfg.nn_scale applies to the global cloud only) and ride the
    moments transpose; value and gradient match the transpose-free
    evaluation exactly."""
    import dataclasses

    import jax

    cfg = cfg_base(True)
    cfg.nn_scale = 0.3
    ds = create_dataset("ground_plane/4", cfg)
    data = prepare_sequences([ds], cfg)
    ot = data.off_transpose[0]
    assert hasattr(ot, "idx")  # BucketedTranspose (moments VJP)
    plain = dataclasses.replace(
        data,
        off_transpose=tuple(None for _ in data.off_transpose),
        t_neighbors=tuple(None for _ in data.t_neighbors),
        t_slots=tuple(None for _ in data.t_slots),
    )

    def value(w, d):
        model = ScaledPolynomial(w=w, exponent=jnp.asarray([4.0]))
        return make_loss_fn(cfg)({"model": model}, d)

    w0 = jnp.asarray([-0.001])
    v_t, g_t = jax.value_and_grad(value)(w0, data)
    v_p, g_p = jax.value_and_grad(value)(w0, plain)
    np.testing.assert_allclose(float(v_t), float(v_p), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_p), rtol=1e-10)
