"""Differentiable SE(3) utilities.

The 6-vector (xyz translation + axis-angle rotation) parameterization is the
pose-correction representation used throughout training
(reference: src/depth_correction/transform.py:68-91,
src/depth_correction/utils.py:170-304). All functions are batched, jittable,
and numerically safe at the identity (zero rotation) so gradients flow
through zero-initialized pose deltas.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "axis_angle_to_matrix",
    "matrix_to_quaternion",
    "matrix_to_xyz_axis_angle",
    "quaternion_to_axis_angle",
    "xyz_axis_angle_to_matrix",
    "transform_points",
    "transform_inv",
    "delta_transform",
    "rotation_angle",
    "translation_norm",
    "absolute_orientation",
]

# TPU matmuls default to bfloat16 passes; on a 20 m scene that quantizes
# rotated positions by ~1 cm (observed on the bench cloud: mean 9.6 mm,
# max 84 mm vs the f32-exact product), swamping the mm-scale depth biases
# this framework estimates. Every position-critical contraction pins full
# f32 precision — these are K=3 contractions, so the extra MXU passes are
# noise next to the neighborhood work. DC_PPREC=default relaxes the pin
# for perf-attribution A/B runs ONLY (the values are then knowingly
# bf16-quantized); tests/test_matmul_precision.py guards the default.
import os as _os

PPREC = (
    jax.lax.Precision.DEFAULT
    if _os.environ.get("DC_PPREC", "").lower() == "default"
    else jax.lax.Precision.HIGHEST
)


def axis_angle_to_matrix(aa: jax.Array) -> jax.Array:
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation.

    R = I + sinc(t) * K + cosc(t) * K^2 with K = skew(aa), t = |aa|.
    Near t = 0 the sinc/cosc factors switch to Taylor series *in t^2*, and
    sqrt is only evaluated on a guarded argument, so gradients at exactly
    zero rotation (the pose-delta initialization) are finite — the standard
    safe-where pattern avoiding NaN from d sqrt(0).
    """
    t2 = jnp.sum(aa * aa, axis=-1)
    small = t2 < 1e-8
    t = jnp.sqrt(jnp.where(small, 1.0, t2))
    s = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)
    c = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / jnp.where(small, 1.0, t2))
    x, y, z = aa[..., 0], aa[..., 1], aa[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    K2 = jnp.matmul(K, K, precision=PPREC)
    return eye + s[..., None, None] * K + c[..., None, None] * K2


def xyz_axis_angle_to_matrix(x: jax.Array) -> jax.Array:
    """(..., 6) [tx ty tz rx ry rz] -> (..., 4, 4) homogeneous transform.

    Matches the reference pose-delta parameterization
    (reference: transform.py:68-78).
    """
    R = axis_angle_to_matrix(x[..., 3:])
    t = x[..., :3]
    batch = x.shape[:-1]
    T = jnp.zeros(batch + (4, 4), dtype=x.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def matrix_to_quaternion(R: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation -> (..., 4) unit quaternion (w, x, y, z).

    Branch-free Shepperd-style extraction: compute all four candidate
    quaternions and pick the one seeded by the largest diagonal combination,
    which avoids catastrophic cancellation for any rotation.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # Four squared magnitudes (up to scale 4): w, x, y, z seeded.
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-24))

    sw = safe_sqrt(qw2)
    sx = safe_sqrt(qx2)
    sy = safe_sqrt(qy2)
    sz = safe_sqrt(qz2)

    cand_w = jnp.stack([0.5 * sw, (m21 - m12) / (2 * sw), (m02 - m20) / (2 * sw), (m10 - m01) / (2 * sw)], axis=-1)
    cand_x = jnp.stack([(m21 - m12) / (2 * sx), 0.5 * sx, (m01 + m10) / (2 * sx), (m02 + m20) / (2 * sx)], axis=-1)
    cand_y = jnp.stack([(m02 - m20) / (2 * sy), (m01 + m10) / (2 * sy), 0.5 * sy, (m12 + m21) / (2 * sy)], axis=-1)
    cand_z = jnp.stack([(m10 - m01) / (2 * sz), (m02 + m20) / (2 * sz), (m12 + m21) / (2 * sz), 0.5 * sz], axis=-1)

    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    # Canonicalize sign (w >= 0) and normalize.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_to_axis_angle(q: jax.Array) -> jax.Array:
    """(..., 4) unit quaternion (w, x, y, z) -> (..., 3) axis-angle."""
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vn2 = jnp.sum(v * v, axis=-1)
    small = vn2 < 1e-24
    vn = jnp.sqrt(jnp.where(small, 1.0, vn2))
    angle = 2.0 * jnp.arctan2(vn, w)
    # angle/vn -> 2/w as vn -> 0 (Taylor of atan2); finite grads at identity.
    scale = jnp.where(small, 2.0, angle / vn)
    return v * scale[..., None]


def matrix_to_xyz_axis_angle(T: jax.Array) -> jax.Array:
    """(..., 4, 4) -> (..., 6) [xyz, axis-angle] (reference: transform.py:81-91)."""
    aa = quaternion_to_axis_angle(matrix_to_quaternion(T[..., :3, :3]))
    return jnp.concatenate([T[..., :3, 3], aa], axis=-1)


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) transform to (..., N, 3) points (rotate + translate)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return (
        jnp.matmul(pts, jnp.swapaxes(R, -1, -2), precision=PPREC)
        + t[..., None, :]
    )


def transform_inv(T: jax.Array) -> jax.Array:
    """Inverse of a rigid (..., 4, 4) transform (reference: utils.py:183-189)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    Ti = jnp.zeros_like(T)
    Ti = Ti.at[..., :3, :3].set(Rt)
    Ti = Ti.at[..., :3, 3:].set(-jnp.matmul(Rt, t, precision=PPREC))
    Ti = Ti.at[..., 3, 3].set(1.0)
    return Ti


def delta_transform(T0: jax.Array, T1: jax.Array) -> jax.Array:
    """Delta D such that T1 = T0 @ D (reference: utils.py:192-196)."""
    return jnp.matmul(transform_inv(T0), T1, precision=PPREC)


def rotation_angle(T: jax.Array) -> jax.Array:
    """Rotation angle of (..., 4, 4) or (..., 3, 3) (reference: utils.py:170-174)."""
    R = T[..., :3, :3]
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.arccos(cos)


def translation_norm(T: jax.Array) -> jax.Array:
    """Translation magnitude of (..., 4, 4) (reference: utils.py:177-180)."""
    return jnp.linalg.norm(T[..., :3, 3], axis=-1)


def absolute_orientation(x: jax.Array, y: jax.Array) -> jax.Array:
    """Kabsch/Umeyama: rigid T in SE(D) minimizing ||R x_i + t - y_i||^2.

    :param x: D-by-M points to align.
    :param y: D-by-M reference points.
    :return: (D+1, D+1) homogeneous transform (reference: utils.py:253-304).
    """
    d = x.shape[0]
    xm = x.mean(axis=1, keepdims=True)
    ym = y.mean(axis=1, keepdims=True)
    M = jnp.matmul(x - xm, (y - ym).T, precision=PPREC)
    U, _, Vt = jnp.linalg.svd(M)
    # Proper rotation: flip the last singular direction if det < 0.
    det = jnp.linalg.det(jnp.matmul(U, Vt, precision=PPREC).T)
    S = jnp.eye(d, dtype=x.dtype).at[-1, -1].set(jnp.sign(det))
    R = jnp.matmul(jnp.matmul(U, S, precision=PPREC), Vt, precision=PPREC).T
    t = ym - jnp.matmul(R, xm, precision=PPREC)
    T = jnp.eye(d + 1, dtype=x.dtype)
    T = T.at[:d, :d].set(R)
    T = T.at[:d, d:].set(t)
    return T
