"""Closed-form 3x3 eigensolver vs LAPACK, values / vectors / gradients.

Port of the reference's validation strategy (loss.py:714-735: random SPD
matrices, sign-agnostic eigenvector comparison) plus gradient checks in the
near-degenerate regime the map-consistency loss optimizes toward.
"""
import numpy as np
import jax
import jax.numpy as jnp

from depth_correction_tpu.ops.eigh3 import eigh3, eigvals3, eigvecs3


def rand_spd(rng, n, jitter=0.0):
    x = rng.standard_normal((n, 3, 3))
    a = x @ np.swapaxes(x, -1, -2)
    return a + jitter * np.eye(3)


def test_eigvals_match_lapack():
    rng = np.random.default_rng(0)
    A = rand_spd(rng, 256)
    lams = np.asarray(eigvals3(jnp.asarray(A)))
    lams_ref = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(lams, lams_ref, rtol=1e-9, atol=1e-9)


def test_eigvals_scaled_covariances():
    # Realistic magnitudes: covariances of ~0.25 m neighborhoods are ~1e-2.
    rng = np.random.default_rng(1)
    A = 1e-2 * rand_spd(rng, 128)
    lams = np.asarray(eigvals3(jnp.asarray(A)))
    np.testing.assert_allclose(lams, np.linalg.eigvalsh(A), rtol=1e-8, atol=1e-14)


def test_eigvecs_match_lapack_up_to_sign():
    rng = np.random.default_rng(2)
    A = rand_spd(rng, 128)
    lams, V = eigh3(jnp.asarray(A))
    V = np.asarray(V)
    _, V_ref = np.linalg.eigh(A)
    dots = np.abs(np.einsum("nki,nki->ni", V, V_ref))
    np.testing.assert_allclose(dots, 1.0, atol=1e-7)


def test_eigvecs_reconstruct_matrix():
    rng = np.random.default_rng(3)
    A = rand_spd(rng, 64)
    lams, V = eigh3(jnp.asarray(A))
    lams, V = np.asarray(lams), np.asarray(V)
    recon = np.einsum("nik,nk,njk->nij", V, lams, V)
    np.testing.assert_allclose(recon, A, atol=1e-8)


def test_degenerate_matrices():
    # Isotropic, planar-degenerate (two equal), and rank-1 cases.
    A = np.stack(
        [
            np.eye(3),
            np.diag([0.0, 1.0, 1.0]),
            np.diag([2.0, 2.0, 5.0]),
            np.zeros((3, 3)),
            np.diag([0.0, 0.0, 3.0]),
        ]
    )
    lams = np.asarray(eigvals3(jnp.asarray(A)))
    np.testing.assert_allclose(lams, np.linalg.eigvalsh(A), atol=1e-12)
    # Vectors stay finite and unit for degenerate inputs.
    _, V = eigh3(jnp.asarray(A))
    V = np.asarray(V)
    assert np.all(np.isfinite(V))
    np.testing.assert_allclose(np.linalg.norm(V, axis=1), 1.0, atol=1e-9)


def test_gradient_matches_vvT():
    # d lam_i / dA = v_i v_i^T for simple eigenvalues.
    rng = np.random.default_rng(4)
    A = rand_spd(rng, 16)

    def smallest(a):
        return eigvals3(a)[..., 0].sum()

    g = np.asarray(jax.grad(smallest)(jnp.asarray(A)))
    lams_ref, V_ref = np.linalg.eigh(A)
    vvT = np.einsum("ni,nj->nij", V_ref[..., 0], V_ref[..., 0])
    np.testing.assert_allclose(g, vvT, atol=1e-7)


def test_gradient_finite_near_planar():
    # Near-planar neighborhoods (lam1 -> 0, lam2 ~ lam3): the regime the
    # loss drives toward; naive autodiff through acos diverges here.
    A = np.diag([1e-12, 1.0, 1.0 + 1e-12])[None]

    def smallest(a):
        return eigvals3(a)[..., 0].sum()

    g = np.asarray(jax.grad(smallest)(jnp.asarray(A)))
    assert np.all(np.isfinite(g))
    # Gradient should be ~ e0 e0^T.
    np.testing.assert_allclose(g[0, 0, 0], 1.0, atol=1e-3)


def test_gradcheck_against_finite_differences():
    rng = np.random.default_rng(5)
    A0 = rand_spd(rng, 1)[0] * 1e-2
    dA = rand_spd(rng, 1)[0] * 1e-2
    dA = (dA + dA.T) / 2

    def f(a):
        lams = eigvals3(a)
        return jnp.sum(lams[..., 0] / jnp.maximum(lams.sum(-1), 1e-6))

    g = np.asarray(jax.grad(f)(jnp.asarray(A0)))
    eps = 1e-6
    fd = (float(f(jnp.asarray(A0 + eps * dA))) - float(f(jnp.asarray(A0 - eps * dA)))) / (
        2 * eps
    )
    np.testing.assert_allclose(np.sum(g * dA), fd, rtol=1e-5)


def test_float32_accuracy():
    rng = np.random.default_rng(6)
    A = (1e-2 * rand_spd(rng, 512)).astype(np.float32)
    lams = np.asarray(eigvals3(jnp.asarray(A)))
    lams_ref = np.linalg.eigvalsh(A.astype(np.float64))
    scale = np.abs(lams_ref).max(axis=-1, keepdims=True)
    # Trig-formula float32 error is ~40 eps relative to the largest
    # eigenvalue (measured max 5.2e-6 over 512 SPD samples); the normalized
    # loss lam1/sum(lam) inherits this scale, staying under the 1e-5 parity
    # budget. Use float64 for strict parity runs.
    np.testing.assert_allclose(lams / scale, lams_ref / scale, atol=2e-5)


def test_degenerate_eigvec_lies_in_eigenspace():
    """Multiplicity-2 eigenvalues: the fallback eigenvector must satisfy
    A v = lam v (the adjugate vanishes there; a fixed e_x generally is NOT
    in the eigenspace and would corrupt the eigenvalue JVP)."""
    import jax
    import numpy as np
    import jax.numpy as jnp

    from depth_correction_tpu.ops.eigh3 import eigh3

    rng = np.random.default_rng(9)
    mats = []
    for _ in range(16):
        # Random rank-1 PSD (lam_min = lam_mid = 0, exactly degenerate) and
        # random isotropic-plus-rank-1 (lam_mid = lam_max degenerate).
        u = rng.normal(size=3)
        u /= np.linalg.norm(u)
        mats.append(np.outer(u, u))
        mats.append(np.eye(3) * 2.0 - np.outer(u, u))
    A = jnp.asarray(np.stack(mats))
    vals, vecs = eigh3(A)
    v1 = vecs[..., :, 0]  # smallest eigenvalue's eigenvector
    resid = jnp.einsum("nij,nj->ni", A, v1) - vals[..., :1] * v1
    np.testing.assert_allclose(np.asarray(resid), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(v1, axis=-1)), 1.0, atol=1e-6
    )

    # JVP through the smallest eigenvalue of an exactly-degenerate matrix
    # is a valid directional derivative: for A = u u^T, lam_min = 0 with
    # eigenspace orthogonal to u; perturbing A by dA moves lam_min by
    # v^T dA v for some unit v in that eigenspace (subgradient).
    u = np.zeros(3); u[0] = 1.0
    A1 = jnp.asarray(np.outer(u, u))[None]

    def lam_min(a):
        return eigh3(a)[0][0, 0]

    g = jax.grad(lam_min)(A1)[0]
    # grad = v v^T for unit v orthogonal to e_x: zero first row/col, trace 1.
    g = np.asarray(g)
    sym = 0.5 * (g + g.T)
    np.testing.assert_allclose(sym[0], 0.0, atol=1e-8)
    np.testing.assert_allclose(np.trace(sym), 1.0, atol=1e-6)
