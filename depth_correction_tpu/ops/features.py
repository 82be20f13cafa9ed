"""Fused neighborhood feature computation.

One pure function replaces the reference's mutation chain
``update_points -> update_neighbors -> update_mean -> update_weights ->
update_cov -> update_eig -> update_normals -> update_incidence_angles``
(reference: src/depth_correction/depth_cloud.py:426-441): a single XLA
graph of gather -> weighted mean/cov -> closed-form 3x3 eigh -> oriented
normals -> incidence angles, with no host round-trips (the reference bounces
to CPU for both the KD-tree and LAPACK eigh).

Neighborhoods are (N, K) int32 index matrices with -1 padding and (N, K)
weights (0 weight on padding), produced once by the neighbor engine and kept
frozen across optimization iterations, exactly like the reference training
loop (train.py:166-226).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..cloud import Cloud
from .covs import weighted_cov, weighted_mean, trace3
from .eigh3 import eigh3

__all__ = [
    "gather_neighbors",
    "neighborhood_features",
    "compute_features",
    "vp_dispersion",
    "dir_dispersion",
    "mean_depth",
]


def gather_neighbors(values: jax.Array, neighbors: jax.Array) -> jax.Array:
    """Gather per-point values for each neighbor slot.

    :param values: (N, D) or (N,) per-point values.
    :param neighbors: (M, K) int32 indices, -1 = missing (clamped to 0; the
        corresponding weight must be zero).
    :return: (M, K, D) or (M, K).
    """
    idx = jnp.maximum(neighbors, 0)
    return values[idx]


def neighborhood_features(
    points: jax.Array,
    neighbors: jax.Array,
    weights: jax.Array,
    dirs: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    compute_normals: bool = True,
):
    """Weighted neighborhood statistics for each query point.

    :param points: (N, 3) global cloud positions.
    :param neighbors: (N, K) neighbor indices with -1 padding.
    :param weights: (N, K) neighbor weights (0 on padding slots).
    :param dirs: (N, 3) view directions for normal orientation / incidence
        angles; None skips those outputs.
    :param scale: optional Gaussian re-weighting by distance from the mean
        (reference: depth_cloud.py:356-364).
    :param compute_normals: skip the eigenvector path when False (the
        min-eigval / trace losses only need eigenvalues).
    :return: dict with mean, cov, eigvals, trace and optionally eigvecs,
        normals, inc_angles.
    """
    nn_pts = gather_neighbors(points, neighbors)  # (N, K, 3)
    mean = weighted_mean(nn_pts, weights)

    if scale is not None:
        # Reference update_weights(scale): w *= exp(-(|x - mean| / scale)^2)
        # with x the *query* point (depth_cloud.py:362-363).
        dist = jnp.linalg.norm(points - mean, axis=-1, keepdims=True)
        weights = weights * jnp.exp(-((dist / scale) ** 2))
        mean = weighted_mean(nn_pts, weights)

    cov = weighted_cov(nn_pts, weights, mean=mean)
    out = {"mean": mean, "cov": cov, "weights": weights, "trace": trace3(cov)}

    if compute_normals and dirs is not None:
        eigvals, eigvecs = eigh3(cov)
        out["eigvals"] = eigvals
        out["eigvecs"] = eigvecs
        # Normal = eigenvector of the smallest eigenvalue, oriented against
        # the view direction (reference: depth_cloud.py:401-415).
        normals = eigvecs[..., :, 0]
        cos = jnp.sum(dirs * normals, axis=-1)
        normals = -jnp.sign(cos)[..., None] * normals
        out["normals"] = normals
        # Incidence angle = arccos |dirs . n| (depth_cloud.py:417-424).
        inc = jnp.arccos(jnp.clip(jnp.abs(cos), 0.0, 1.0))
        out["inc_angles"] = inc
    else:
        from .eigh3 import eigvals3

        out["eigvals"] = eigvals3(cov)

    return out


def compute_features(
    cloud: Cloud,
    neighbors: jax.Array,
    weights: jax.Array,
    scale: Optional[float] = None,
    compute_normals: bool = True,
) -> Cloud:
    """Cloud-level wrapper: returns a new Cloud with derived fields set
    (the pure equivalent of ``update_all(keep_neighbors=True)``,
    reference: depth_cloud.py:435-441 / preproc.py:216).
    """
    points = cloud.get_points()
    feats = neighborhood_features(
        points,
        neighbors,
        weights,
        dirs=cloud.dirs,
        scale=scale,
        compute_normals=compute_normals,
    )
    return cloud.replace(
        points=points,
        mean=feats["mean"],
        cov=feats["cov"],
        eigvals=feats["eigvals"],
        eigvecs=feats.get("eigvecs"),
        normals=feats.get("normals", cloud.normals),
        inc_angles=feats.get("inc_angles", cloud.inc_angles),
        trace=feats["trace"],
    )


def vp_dispersion(cloud: Cloud, neighbors: jax.Array, weights: jax.Array) -> jax.Array:
    """Total variation of neighbor viewpoints — trainability filter
    (reference: depth_cloud.py:314-319).
    """
    vps = gather_neighbors(cloud.vps, neighbors)
    return trace3(weighted_cov(vps, weights))


def dir_dispersion(cloud: Cloud, neighbors: jax.Array, weights: jax.Array) -> jax.Array:
    """Total variation of neighbor view directions (depth_cloud.py:321-326)."""
    dirs = gather_neighbors(cloud.dirs, neighbors)
    return trace3(weighted_cov(dirs, weights))


def mean_depth(cloud: Cloud, neighbors: jax.Array, weights: jax.Array) -> jax.Array:
    """Weighted mean neighbor depth (reference: depth_cloud.py:328-334)."""
    d = gather_neighbors(cloud.depth, neighbors)
    w_sum = jnp.maximum(jnp.sum(weights, axis=-1), 1e-12)
    return jnp.sum(weights * d, axis=-1) / w_sum
