"""16-bit-rate bitcast gather: exactness in float32."""
import numpy as np
import jax.numpy as jnp

from depth_correction_tpu.ops.features import _take16


def test_take16_exact_f32():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((5, 1000)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 1000, (64, 7)), jnp.int32)
    got = np.asarray(_take16(table, idx))
    ref = np.asarray(jnp.take(table, idx, axis=1))
    # Bitcast gather must be bit-exact, including special values.
    np.testing.assert_array_equal(got, ref)
    assert got.shape == (5, 64, 7)


def test_take16_special_values():
    table = jnp.asarray(
        [[0.0, -0.0, np.inf, -np.inf, np.nan, 1e-45, 3.4e38, -1.17e-38]],
        jnp.float32,
    )
    idx = jnp.asarray(np.arange(8)[None], jnp.int32)
    got = np.asarray(_take16(table, idx))[0, 0]
    ref = np.asarray(table)[0]
    np.testing.assert_array_equal(
        got.view(np.uint32), ref.view(np.uint32)
    )


def test_take16_f64_passthrough():
    table = jnp.asarray(np.random.default_rng(1).standard_normal((3, 50)))
    idx = jnp.asarray([[0, 4], [7, 2]], jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(_take16(table, idx)), np.asarray(jnp.take(table, idx, axis=1))
    )


def test_moments_f32_matches_f64():
    """The full f32 fast path (bitcast gathers + analytic backward) agrees
    with the f64 reference path on values and gradients."""
    import jax

    from depth_correction_tpu.ops.features import (
        build_transpose_graph,
        neighborhood_moments,
    )

    rng = np.random.default_rng(2)
    m, k = 256, 8
    pts64 = rng.uniform(0, 3, (m, 3))
    nb = rng.integers(0, m, (m, k))
    nb[rng.random((m, k)) < 0.2] = -1
    w = (nb >= 0).astype(np.float64)
    t_idx, t_slot, t_w = build_transpose_graph(nb, weights=w)

    def loss(p, w_, t_w_):
        mean, comps = neighborhood_moments(
            p, jnp.asarray(nb, jnp.int32), w_, t_idx, t_w_
        )
        return jnp.sum(comps[0] + comps[1]) + jnp.sum(mean[2])

    v64, g64 = jax.value_and_grad(loss)(
        jnp.asarray(pts64), jnp.asarray(w), t_w.astype(jnp.float64)
    )
    v32, g32 = jax.value_and_grad(loss)(
        jnp.asarray(pts64, jnp.float32),
        jnp.asarray(w, jnp.float32),
        t_w.astype(jnp.float32),
    )
    np.testing.assert_allclose(float(v32), float(v64), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g32), np.asarray(g64), rtol=1e-3,
                               atol=1e-5)
