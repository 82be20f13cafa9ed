"""Masked reductions and quantiles.

Fixed-shape equivalents of the reference's filtering reductions
(reference: src/depth_correction/loss.py:125-150): where the reference drops
elements by boolean indexing, we carry an explicit mask, so the ops stay
jittable with static shapes.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["masked_mean", "masked_sum", "masked_quantile", "reduce_loss"]


def masked_sum(x: jax.Array, mask: Optional[jax.Array], axis=None) -> jax.Array:
    if mask is None:
        return jnp.sum(x, axis=axis)
    return jnp.sum(jnp.where(mask, x, 0.0), axis=axis)


def masked_mean(
    x: jax.Array,
    mask: Optional[jax.Array],
    axis=None,
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean over unmasked elements; 0 when nothing is unmasked."""
    if weights is None:
        weights = jnp.ones_like(x)
    if mask is not None:
        weights = jnp.where(mask, weights, 0.0)
    denom = jnp.sum(weights, axis=axis)
    # Zero masked entries before multiplying: 0 * inf would poison the sum.
    x_safe = jnp.where(weights > 0, x, 0.0)
    num = jnp.sum(weights * x_safe, axis=axis)
    return jnp.where(denom > 0, num / jnp.maximum(denom, 1e-30), 0.0)


def masked_quantile(x: jax.Array, mask: Optional[jax.Array], q: float) -> jax.Array:
    """Quantile of the unmasked subset of a 1-D array.

    Linear interpolation between order statistics, matching
    ``torch.quantile`` / ``np.quantile`` (used for inlier trimming,
    reference: loss.py:256-267). Invalid entries sort to +inf and are
    excluded via the valid count.
    """
    x = jnp.ravel(x)
    if mask is None:
        valid = jnp.ones_like(x, dtype=bool)
    else:
        valid = jnp.ravel(mask)
    xs = jnp.sort(jnp.where(valid, x, jnp.inf))
    n = jnp.sum(valid)
    pos = q * jnp.maximum(n - 1, 0).astype(x.dtype)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(x.dtype)
    v_lo = xs[jnp.clip(lo, 0, x.shape[0] - 1)]
    v_hi = xs[jnp.clip(hi, 0, x.shape[0] - 1)]
    return v_lo * (1.0 - frac) + v_hi * frac


def reduce_loss(
    x: jax.Array,
    mask: Optional[jax.Array] = None,
    reduction: str = "mean",
    only_finite: bool = False,
    skip_nans: bool = False,
):
    """Reduce pointwise losses under a mask.

    Mirrors ``reduce`` (reference: loss.py:125-150): ``only_finite`` /
    ``skip_nans`` extend the mask instead of dropping elements.

    :return: (reduced value, effective mask).
    """
    eff = mask
    if only_finite:
        fin = jnp.isfinite(x)
        eff = fin if eff is None else (eff & fin)
    elif skip_nans:
        notnan = ~jnp.isnan(x)
        eff = notnan if eff is None else (eff & notnan)

    if reduction == "mean":
        return masked_mean(x, eff), eff
    if reduction == "sum":
        return masked_sum(x, eff), eff
    if reduction == "none":
        return x, eff
    raise ValueError("Unknown reduction: %s" % reduction)
