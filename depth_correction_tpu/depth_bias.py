"""Depth-bias analysis: fit plane-distance vs incidence-angle trends.

Re-design of the reference's bias visualizer (reference: src/depth_correction/
depth_bias.py:57-156): for a feature cloud, regress the signed distance to
the local plane (along the normal) against the incidence angle with low-order
polynomials — the empirical signature of the bias a correction model should
remove.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from .cloud import Cloud

__all__ = ["plane_distances", "fit_depth_bias"]


def plane_distances(cloud: Cloud) -> jnp.ndarray:
    """Signed distance of each point to its local-plane fit, along the
    normal: n . (x - mean) (reference: loss.py demo:648)."""
    assert cloud.normals is not None and cloud.mean is not None
    return jnp.sum(cloud.normals * (cloud.get_points() - cloud.mean), axis=-1)


def fit_depth_bias(
    cloud: Cloud, mask: Optional[np.ndarray] = None, degrees=(1, 2)
) -> Dict[str, np.ndarray]:
    """Polynomial fits of bias trends (reference: depth_bias.py:57-87).

    :return: dict with per-degree coefficients (ascending order, numpy
        polynomial convention) for three regressions: distance vs incidence
        angle, normalized distance (dist/depth) vs angle, and normalized
        distance vs 1/cos(angle).
    """
    dist = np.asarray(plane_distances(cloud))
    inc = np.asarray(cloud.inc_angles)
    depth = np.asarray(cloud.depth)
    keep = np.asarray(cloud.valid)
    if mask is not None:
        keep = keep & np.asarray(mask)
    keep = keep & np.isfinite(dist) & np.isfinite(inc)
    dist, inc, depth = dist[keep], inc[keep], depth[keep]
    norm_dist = dist / np.maximum(depth, 1e-9)
    inv_cos = 1.0 / np.maximum(np.cos(inc), 1e-9)

    out = {}
    for deg in degrees:
        out["dist_vs_angle_deg%d" % deg] = np.polynomial.polynomial.polyfit(
            inc, dist, deg
        )
        out["norm_dist_vs_angle_deg%d" % deg] = np.polynomial.polynomial.polyfit(
            inc, norm_dist, deg
        )
        out["norm_dist_vs_inv_cos_deg%d" % deg] = np.polynomial.polynomial.polyfit(
            inv_cos, norm_dist, deg
        )
    return out
