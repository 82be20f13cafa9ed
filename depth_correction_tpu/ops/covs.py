"""Weighted neighborhood statistics (mean / covariance / trace).

Masked-weight equivalents of the reference's ``covs``
(reference: src/depth_correction/utils.py:109-149): neighborhoods are
fixed-shape (N, K, D) gathers where invalid neighbor slots carry zero weight
instead of being absent. Semantics preserved exactly:

- normalizer is the weight sum (valid-neighbor count for 0/1 weights),
- Bessel correction subtracts 1 from the weight sum,
- the corrected normalizer is clamped to 1e-6 from below.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .se3 import PPREC

__all__ = ["weighted_mean", "weighted_cov", "trace3"]


def weighted_mean(x: jax.Array, weights: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Weighted mean over the neighbor axis.

    :param x: (..., K, D) neighbor values.
    :param weights: (..., K) or (..., K, 1) nonnegative weights.
    :return: (..., D) means.
    """
    if weights.ndim == x.ndim:
        weights = weights[..., 0]
    w_sum = jnp.sum(weights, axis=-1, keepdims=True)
    m = jnp.sum(weights[..., None] * x, axis=-2)
    return m / jnp.maximum(w_sum, eps)


def weighted_cov(
    x: jax.Array,
    weights: Optional[jax.Array] = None,
    center: bool = True,
    correction: bool = True,
    mean: Optional[jax.Array] = None,
) -> jax.Array:
    """Weighted covariance over the neighbor axis.

    cov = sum_k w_k (x_k - m)(x_k - m)^T / max(sum_k w_k - correction, 1e-6)

    :param x: (..., K, D) neighbor values.
    :param weights: (..., K) or (..., K, 1); None = all-ones.
    :param center: subtract the (weighted) mean first.
    :param correction: apply the Bessel -1 correction to the normalizer
        (reference: utils.py:143-147).
    :param mean: optional precomputed (..., D) mean to reuse.
    :return: (..., D, D) covariance matrices.
    """
    if weights is None:
        weights = jnp.ones(x.shape[:-1], dtype=x.dtype)
    elif weights.ndim == x.ndim:
        weights = weights[..., 0]
    weights = weights.astype(x.dtype)

    w_sum = jnp.sum(weights, axis=-1)
    if center:
        if mean is None:
            mean = weighted_mean(x, weights)
        xc = x - mean[..., None, :]
    else:
        xc = x

    # sum_k w_k x_k x_k^T as a batched matmul: (D, K) @ (K, D) hits the MXU.
    xw = xc * weights[..., None]
    # precision: bf16 MXU passes would round the centered coordinates to
    # 8 mantissa bits (see ops/se3.py PPREC).
    xx = jnp.einsum("...ki,...kj->...ij", xw, xc,
                    precision=PPREC)

    denom = w_sum - 1.0 if correction else w_sum
    denom = jnp.maximum(denom, 1e-6)
    return xx / denom[..., None, None]


def trace3(cov: jax.Array) -> jax.Array:
    """Trace of (..., 3, 3) matrices (reference: utils.py:152-154)."""
    return cov[..., 0, 0] + cov[..., 1, 1] + cov[..., 2, 2]
