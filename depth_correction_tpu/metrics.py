"""Evaluation metrics: chamfer distance, map accuracy, pose errors.

Array-native replacements for the reference's metric surface:
- chamfer distance (reference: src/depth_correction/metrics.py:57-125, a
  trimmed pytorch3d kNN wrapper),
- mapping/reconstruction accuracy — inlier-trimmed point-to-point map error
  (reference: scripts/mapping_accuracy:100-118),
- SLAM-style localization errors — absolute/relative rotation and
  translation per pose (reference: scripts/robot_data:153-205).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .ops.knn import nearest_neighbors
from .ops.reduce import masked_mean, masked_quantile
from .ops.se3 import delta_transform, rotation_angle, translation_norm

__all__ = [
    "chamfer_distance",
    "mapping_accuracy",
    "localization_errors",
]


def chamfer_distance(
    x: jax.Array,
    y: jax.Array,
    valid_x: Optional[jax.Array] = None,
    valid_y: Optional[jax.Array] = None,
    bidirectional: bool = False,
) -> jax.Array:
    """One-directional (x -> y) chamfer: mean over x of the euclidean
    distance to the nearest y (sqrt of the kNN squared distance, matching
    reference metrics.py:103-117).
    """
    d, idx = nearest_neighbors(y, x, k=1, valid_points=valid_y)
    d = d[:, 0]
    ok = idx[:, 0] >= 0
    if valid_x is not None:
        ok = ok & valid_x
    out = masked_mean(d, ok)
    if bidirectional:
        out = out + chamfer_distance(y, x, valid_y, valid_x)
    return out


def mapping_accuracy(
    cloud: jax.Array,
    gt_map: jax.Array,
    icp_inlier_ratio: float = 0.8,
    valid_cloud: Optional[jax.Array] = None,
    valid_gt: Optional[jax.Array] = None,
) -> jax.Array:
    """Inlier-trimmed point-to-point distance of an aggregated (corrected)
    map against a ground-truth scanner map
    (reference: scripts/mapping_accuracy:100-118): mean 1-NN distance over
    the closest ``icp_inlier_ratio`` fraction of points.
    """
    d, idx = nearest_neighbors(gt_map, cloud, k=1, valid_points=valid_gt)
    d = d[:, 0]
    ok = idx[:, 0] >= 0
    if valid_cloud is not None:
        ok = ok & valid_cloud
    thr = masked_quantile(d, ok, icp_inlier_ratio)
    return masked_mean(d, ok & (d <= thr))


def localization_errors(
    T_gt: jax.Array, T_est: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-pose absolute and relative localization errors.

    Matches the robot_data evaluator (reference: scripts/robot_data:153-205):
    absolute delta = gt^-1 @ est per pose; relative errors compare the
    consecutive-pose increments of gt and est.

    :param T_gt: (N, 4, 4) ground-truth poses.
    :param T_est: (N, 4, 4) estimated poses.
    :return: (abs_angle (N,), abs_offset (N,), rel_angle (N-1,),
        rel_offset (N-1,)).
    """
    delta = delta_transform(T_gt, T_est)
    abs_angle = rotation_angle(delta)
    abs_offset = translation_norm(delta)

    inc_gt = delta_transform(T_gt[:-1], T_gt[1:])
    inc_est = delta_transform(T_est[:-1], T_est[1:])
    rel = delta_transform(inc_gt, inc_est)
    rel_angle = rotation_angle(rel)
    rel_offset = translation_norm(rel)
    return abs_angle, abs_offset, rel_angle, rel_offset
