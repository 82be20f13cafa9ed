"""Model algebra and loss semantics, with torch/numpy oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from depth_correction_tpu.cloud import Cloud
from depth_correction_tpu.loss import min_eigval_loss, trace_loss
from depth_correction_tpu.models import (
    BaseModel,
    Linear,
    Polynomial,
    ScaledInvCos,
    ScaledPolynomial,
    load_model,
    model_by_name,
    trainable_mask,
)
from depth_correction_tpu.ops.reduce import masked_quantile


def make_cloud(n=64, seed=0, with_mask=True):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(1.0, 10.0, (n, 3))
    cloud = Cloud.from_points(pts)
    inc = rng.uniform(0.0, 1.4, n)
    mask = rng.random(n) > 0.3 if with_mask else None
    return cloud.replace(
        inc_angles=jnp.asarray(inc), mask=jnp.asarray(mask) if with_mask else None
    )


def test_scaled_polynomial_bias_matches_torch():
    # Oracle: bias = inc^exponent @ w^T, depth * (1 - bias)
    # (reference semantics, model.py:243-261).
    rng = np.random.default_rng(1)
    inc = rng.uniform(0, 1.5, 100)
    depth = rng.uniform(1, 30, 100)
    w = np.array([-0.01, 0.002])
    e = np.array([2.0, 4.0])
    model = ScaledPolynomial(w=jnp.asarray(w), exponent=jnp.asarray(e))
    got = np.asarray(model.correct_depth(jnp.asarray(depth), jnp.asarray(inc)))
    x = torch.pow(torch.as_tensor(inc)[:, None], torch.as_tensor(e)[None])
    bias = (x @ torch.as_tensor(w)[:, None])[:, 0]
    ref = torch.as_tensor(depth) * (1.0 - bias)
    np.testing.assert_allclose(got, ref.numpy(), atol=1e-12)


def test_polynomial_inverse_roundtrip():
    rng = np.random.default_rng(2)
    depth = jnp.asarray(rng.uniform(1, 30, 50))
    inc = jnp.asarray(rng.uniform(0, 1.5, 50))
    for cls in (Polynomial, ScaledPolynomial):
        m = cls(w=jnp.asarray([-0.01, 0.003]), exponent=jnp.asarray([2.0, 4.0]))
        d2 = m.correct_depth(m.inverse_depth(depth, inc), inc)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(depth), rtol=1e-12)
    m = ScaledInvCos(p0=jnp.asarray(0.01))
    d2 = m.correct_depth(m.inverse_depth(depth, inc), inc)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(depth), rtol=1e-12)


def test_masked_application():
    cloud = make_cloud()
    m = ScaledPolynomial(w=jnp.asarray([-0.05]), exponent=jnp.asarray([4.0]))
    out = m.apply(cloud)
    mask = np.asarray(cloud.mask)
    d0 = np.asarray(cloud.depth)
    d1 = np.asarray(out.depth)
    np.testing.assert_array_equal(d1[~mask], d0[~mask])
    assert np.all(d1[mask] != d0[mask])


def test_base_and_linear():
    cloud = make_cloud(with_mask=False)
    assert np.allclose(
        np.asarray(BaseModel().apply(cloud).depth), np.asarray(cloud.depth)
    )
    lin = Linear(w0=jnp.asarray(1.1), w1=jnp.asarray(0.01), b=jnp.asarray(-0.2))
    got = np.asarray(lin.apply(cloud).depth)
    ref = 1.1 * np.asarray(cloud.depth) + 0.01 * np.asarray(cloud.inc_angles) - 0.2
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_model_factory_and_trainable_mask():
    m = load_model(
        class_name="ScaledPolynomial",
        model_kwargs={"w": [0.0, 0.0], "exponent": [2, 4]},
    )
    assert isinstance(m, ScaledPolynomial)
    tm = trainable_mask(m)
    assert bool(np.asarray(tm.w).all()) is True
    assert bool(np.asarray(tm.exponent).all()) is False
    # Legacy p0/p1 form.
    m2 = load_model(class_name="Polynomial", model_kwargs={"p0": -0.01, "p1": 0.0})
    np.testing.assert_allclose(np.asarray(m2.exponent), [2.0, 4.0])
    assert model_by_name("BaseModel") is BaseModel


def make_feature_cloud(n=200, seed=3):
    rng = np.random.default_rng(seed)
    cloud = Cloud.from_points(rng.uniform(0, 5, (n, 3)))
    x = rng.standard_normal((n, 3, 3))
    cov = 1e-3 * (x @ np.swapaxes(x, -1, -2))
    eigvals = np.sort(np.linalg.eigvalsh(cov), axis=-1)
    return cloud.replace(
        cov=jnp.asarray(cov),
        eigvals=jnp.asarray(eigvals),
        trace=jnp.asarray(np.trace(cov, axis1=-2, axis2=-1)),
    ), eigvals, cov


def test_min_eigval_loss_semantics():
    cloud, eigvals, _ = make_feature_cloud()
    # Unnormalized mean of lam1.
    val, lc = min_eigval_loss(cloud, normalization=False)
    np.testing.assert_allclose(float(val), eigvals[:, 0].mean(), rtol=1e-12)
    # Normalized: lam1 / clamp(sum, 1e-6).
    val, _ = min_eigval_loss(cloud, normalization=True)
    ref = (eigvals[:, 0] / np.maximum(eigvals.sum(1), 1e-6)).mean()
    np.testing.assert_allclose(float(val), ref, rtol=1e-12)
    # Masked.
    mask = jnp.asarray(np.arange(len(eigvals)) % 3 == 0)
    val, _ = min_eigval_loss(cloud, mask=mask, normalization=False)
    np.testing.assert_allclose(
        float(val), eigvals[np.asarray(mask), 0].mean(), rtol=1e-12
    )


def test_trace_loss_semantics():
    cloud, eigvals, cov = make_feature_cloud()
    val, _ = trace_loss(cloud)
    np.testing.assert_allclose(
        float(val), np.trace(cov, axis1=-2, axis2=-1).mean(), rtol=1e-12
    )


def test_inlier_trimming_matches_torch_quantile():
    cloud, eigvals, _ = make_feature_cloud()
    ratio = 0.7
    val, _ = min_eigval_loss(cloud, normalization=False, inlier_ratio=ratio)
    loss = torch.as_tensor(eigvals[:, 0])
    thr = torch.quantile(loss, ratio)
    ref = loss[loss <= thr].mean()
    np.testing.assert_allclose(float(val), float(ref), rtol=1e-10)


def test_masked_quantile_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(501)
    mask = rng.random(501) > 0.4
    for q in (0.0, 0.3, 0.5, 0.77, 1.0):
        got = float(masked_quantile(jnp.asarray(x), jnp.asarray(mask), q))
        ref = float(torch.quantile(torch.as_tensor(x[mask]), q))
        np.testing.assert_allclose(got, ref, atol=1e-12)


def test_batch_loss_point_weighted_mean():
    c1, e1, _ = make_feature_cloud(100, seed=5)
    c2, e2, _ = make_feature_cloud(300, seed=6)
    val, _ = min_eigval_loss([c1, c2], normalization=False)
    ref = np.concatenate([e1[:, 0], e2[:, 0]]).mean()
    np.testing.assert_allclose(float(val), ref, rtol=1e-12)


def test_loss_gradient_flows_to_model():
    # End-to-end grad: model w -> depth -> points -> cov -> lam1.
    from depth_correction_tpu.ops.features import neighborhood_features

    rng = np.random.default_rng(7)
    n, k = 128, 8
    pts = rng.uniform(0, 3, (n, 3))
    cloud = Cloud.from_points(pts).replace(inc_angles=jnp.asarray(rng.uniform(0, 1.2, n)))
    neighbors = jnp.asarray(rng.integers(0, n, (n, k)), jnp.int32)
    weights = jnp.ones((n, k))

    def loss_fn(w):
        m = ScaledPolynomial(w=w, exponent=jnp.asarray([4.0]))
        c = m.apply(cloud)
        feats = neighborhood_features(c.to_points(), neighbors, weights, dirs=c.dirs,
                                      compute_normals=False)
        lam1 = feats["eigvals"][:, 0]
        return jnp.mean(lam1)

    g = jax.grad(loss_fn)(jnp.asarray([0.0]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert abs(float(g[0])) > 0
