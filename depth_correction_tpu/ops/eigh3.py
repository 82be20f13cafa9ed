"""Closed-form eigendecomposition of symmetric 3x3 matrices.

Replaces the reference's LAPACK ``torch.linalg.eigh`` call, which is forced
onto the CPU and re-entered with random jitter on failure
(reference: src/depth_correction/depth_cloud.py:376-396). The reference also
ships an analytic fallback (``eigh3_deledalle``, loss.py:39-103) validated
against LAPACK (loss.py:714-735); here the analytic path *is* the main path,
fused into the XLA graph so covariance -> eigenvalues never leaves the TPU.

Algorithm: the trigonometric solution of the characteristic cubic
(Smith 1961). For A symmetric 3x3 with q = tr(A)/3 and
p = sqrt(tr((A-qI)^2)/6), the eigenvalues are

    lam_k = q + 2 p cos(phi/3 + 2 pi k / 3),  phi = acos(det((A-qI)/p)/2)

which yields an ascending triple by construction. Gradients are supplied by
a custom JVP using the exact first-order perturbation d lam_i = v_i^T dA v_i,
with eigenvectors from adjugate cross-products — this is stable exactly where
the loss drives the system (near-planar neighborhoods, lam_1 -> 0), where
naive autodiff through acos would blow up.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["eigvals3", "eigh3", "eigvecs3", "eigvals3_c"]

_TWO_PI_3 = 2.0943951023931953  # 2*pi/3


def _eigvals3_core(a00, a11, a22, a01, a02, a12):
    """Trigonometric eigenvalues from the six matrix components.

    Component form avoids materializing (..., 3, 3) tensors, whose tiny
    trailing dims get padded to (8, 128) tiles on TPU (a 42x memory blowup
    at cloud scale).
    """
    q = (a00 + a11 + a22) / 3.0
    b00 = a00 - q
    b11 = a11 - q
    b22 = a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))

    # det(A - qI); for B = (A-qI)/p, r = det(B)/2 = det(A-qI) / (2 p^3).
    det_b = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    # Guard p == 0 (A is a multiple of I: all eigenvalues equal q).
    p_safe = jnp.where(p > 0.0, p, 1.0)
    r = det_b / (2.0 * p_safe * p_safe * p_safe)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    lam_max = q + 2.0 * p * jnp.cos(phi)
    lam_min = q + 2.0 * p * jnp.cos(phi + _TWO_PI_3)
    lam_mid = 3.0 * q - lam_max - lam_min
    return lam_min, lam_mid, lam_max


def _eigvals3_impl(A: jax.Array) -> jax.Array:
    lam_min, lam_mid, lam_max = _eigvals3_core(
        A[..., 0, 0], A[..., 1, 1], A[..., 2, 2],
        A[..., 0, 1], A[..., 0, 2], A[..., 1, 2],
    )
    return jnp.stack([lam_min, lam_mid, lam_max], axis=-1)


def _eigvec_c(a00, a11, a22, a01, a02, a12, lam):
    """Component-form eigenvector for eigenvalue ``lam`` via the largest
    cross product of rows of (A - lam I); returns unit (vx, vy, vz).

    Rows: r0 = (b00, a01, a02), r1 = (a01, b11, a12), r2 = (a02, a12, b22).
    Cross products of row pairs (r1 x r2, r2 x r0, r0 x r1) are the columns
    of adj(A - lam I), any nonzero one spans the eigenspace.
    """
    b00, b11, b22 = a00 - lam, a11 - lam, a22 - lam
    c0 = (b11 * b22 - a12 * a12, a12 * a02 - a01 * b22, a01 * a12 - b11 * a02)
    c1 = (a12 * a02 - a01 * b22, b00 * b22 - a02 * a02, a01 * a02 - b00 * a12)
    c2 = (a01 * a12 - a02 * b11, a02 * a01 - b00 * a12, b00 * b11 - a01 * a01)
    n0 = c0[0] ** 2 + c0[1] ** 2 + c0[2] ** 2
    n1 = c1[0] ** 2 + c1[1] ** 2 + c1[2] ** 2
    n2 = c2[0] ** 2 + c2[1] ** 2 + c2[2] ** 2
    use1 = (n1 >= n0) & (n1 >= n2)
    use2 = (n2 > n0) & (n2 > n1) & ~use1
    vx = jnp.where(use1, c1[0], jnp.where(use2, c2[0], c0[0]))
    vy = jnp.where(use1, c1[1], jnp.where(use2, c2[1], c0[1]))
    vz = jnp.where(use1, c1[2], jnp.where(use2, c2[2], c0[2]))
    n = jnp.sqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-40))
    # Degenerate eigenvalue (the adjugate vanishes; multiplicity >= 2):
    # (A - lam I) is rank <= 1 and its ROWS span the remaining simple
    # eigenvector u, so any unit vector orthogonal to the largest row lies
    # in lam's eigenspace — unlike a fixed e_x, which generally does not
    # (and would feed an invalid v^T dA v into the eigenvalue JVP). With
    # multiplicity 3 the matrix is zero and every direction works.
    m0 = b00 * b00 + a01 * a01 + a02 * a02
    m1 = a01 * a01 + b11 * b11 + a12 * a12
    m2 = a02 * a02 + a12 * a12 + b22 * b22
    # The adjugate of an (exactly) degenerate matrix is zero only up to
    # rounding: its entries carry O(eps * |A - lam I|^2) noise, so the
    # "adjugate usable" test must be RELATIVE to the matrix scale — an
    # absolute epsilon would happily normalize pure noise into a direction
    # far outside the eigenspace.
    eps = jnp.finfo(n.dtype).eps
    thr = 64.0 * eps * jnp.maximum(jnp.maximum(m0, m1), m2)
    # Absolute floor: for an all-zero shifted matrix the relative threshold
    # degenerates to 0 and would accept the zero adjugate.
    ok = n > jnp.maximum(thr, 1e-20)
    ruse1 = (m1 >= m0) & (m1 >= m2)
    ruse2 = (m2 > m0) & (m2 > m1) & ~ruse1
    ux = jnp.where(ruse1, a01, jnp.where(ruse2, a02, b00))
    uy = jnp.where(ruse1, b11, jnp.where(ruse2, a12, a01))
    uz = jnp.where(ruse1, a12, jnp.where(ruse2, b22, a02))
    # u x e_x = (0, uz, -uy); u x e_y = (-uz, 0, ux): take the larger.
    usex = uz * uz + uy * uy >= uz * uz + ux * ux
    fx = jnp.where(usex, 0.0, -uz)
    fy = jnp.where(usex, uz, 0.0)
    fz = jnp.where(usex, -uy, ux)
    fn = jnp.sqrt(jnp.maximum(fx * fx + fy * fy + fz * fz, 1e-40))
    f_ok = fn > 1e-20
    fx = jnp.where(f_ok, fx / fn, 1.0)
    fy = jnp.where(f_ok, fy / fn, 0.0)
    fz = jnp.where(f_ok, fz / fn, 0.0)
    vx = jnp.where(ok, vx / n, fx)
    vy = jnp.where(ok, vy / n, fy)
    vz = jnp.where(ok, vz / n, fz)
    return vx, vy, vz


@jax.custom_jvp
def eigvals3_c(a00, a11, a22, a01, a02, a12):
    """Ascending eigenvalues of symmetric 3x3 matrices, component form.

    Same math as :func:`eigvals3` but takes/returns flat component arrays,
    keeping every intermediate at the batch shape (no padded 3x3 tiles).
    :return: (lam_min, lam_mid, lam_max).
    """
    return _eigvals3_core(a00, a11, a22, a01, a02, a12)


@eigvals3_c.defjvp
def _eigvals3_c_jvp(primals, tangents):
    comps = primals
    dts = tangents
    lams = _eigvals3_core(*comps)
    outs = []
    douts = []
    for lam in lams:
        vx, vy, vz = _eigvec_c(*comps, lam)
        # dlam = v^T dA v expanded over the six components.
        d = (
            vx * vx * dts[0]
            + vy * vy * dts[1]
            + vz * vz * dts[2]
            + 2.0 * vx * vy * dts[3]
            + 2.0 * vx * vz * dts[4]
            + 2.0 * vy * vz * dts[5]
        )
        outs.append(lam)
        douts.append(d)
    return tuple(outs), tuple(douts)


def eigvecs3(A: jax.Array, lams: jax.Array) -> jax.Array:
    """Eigenvectors of symmetric 3x3 ``A`` for eigenvalues ``lams``.

    For each eigenvalue lam, the columns of adj(A - lam I) span the
    eigenspace; equivalently the cross products of any two rows of
    (A - lam I) do. We take all three row cross-products and pick the one
    with the largest norm — robust whenever lam is a simple eigenvalue. For
    (near-)repeated eigenvalues an arbitrary unit vector in the eigenspace is
    returned via safe normalization.

    :param A: (..., 3, 3) symmetric matrices.
    :param lams: (..., 3) eigenvalues.
    :return: (..., 3, 3) matrix whose COLUMN i is the eigenvector of lams[i]
        (same layout as ``torch.linalg.eigh`` / ``jnp.linalg.eigh``).
    """
    # One implementation for both entry points: the component-form
    # _eigvec_c carries the relative degenerate-adjugate test and the
    # in-eigenspace fallback (orthogonal to the largest row).
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    vs = []
    for i in range(3):
        vx, vy, vz = _eigvec_c(a00, a11, a22, a01, a02, a12, lams[..., i])
        vs.append(jnp.stack([vx, vy, vz], axis=-1))
    return jnp.stack(vs, axis=-1)  # columns are eigenvectors


@jax.custom_jvp
def eigvals3(A: jax.Array) -> jax.Array:
    """Ascending eigenvalues (..., 3) of symmetric (..., 3, 3) matrices."""
    return _eigvals3_impl(A)


@eigvals3.defjvp
def _eigvals3_jvp(primals, tangents):
    (A,) = primals
    (dA,) = tangents
    lams = _eigvals3_impl(A)
    V = eigvecs3(A, lams)  # (..., 3, 3), columns v_i
    # d lam_i = v_i^T dA v_i  (exact for simple eigenvalues; the stable
    # subgradient choice at degeneracies). ELEMENTWISE on purpose: an
    # einsum here lowers to ~231k-batched 3x3 MXU matmuls whose K pads to
    # 128 lanes (and full-f32 passes multiply that again — measured ~+30
    # ms/step on the bench backward); broadcast-multiply-reduce rides the
    # VPU at full f32 precision for free.
    t = (V[..., :, None, :] * dA[..., :, :, None]).sum(-3)  # t_li = dA^T V
    dlams = (t * V).sum(-2)  # (..., 3)
    return lams, dlams


def eigh3(A: jax.Array):
    """Eigenvalues and eigenvectors of symmetric 3x3 matrices.

    Drop-in analytic equivalent of ``torch.linalg.eigh`` for the 3x3
    symmetric case (reference: loss.py:106-122). Eigenvalues ascend;
    eigenvectors are the columns of the second output. Eigenvector sign is
    arbitrary, as with LAPACK.
    """
    lams = eigvals3(A)
    V = eigvecs3(A, jax.lax.stop_gradient(lams))
    return lams, V
