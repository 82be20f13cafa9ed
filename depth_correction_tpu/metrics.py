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
    "static_intervals",
    "tracker_position_error",
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


def static_intervals(times, positions, min_duration: float = 1.0,
                     max_motion: float = 0.01):
    """Stationary intervals of a tracked-position time series.

    Host-side equivalent of the reference's rosbag static-scan extraction
    (reference: scripts/localization_accuracy — it detects when the
    total-station crystal didn't move and keeps scans from those periods):
    an interval is static when every position stays within ``max_motion`` of
    the interval's first sample and it lasts at least ``min_duration``.

    :param times: (N,) seconds, ascending.
    :param positions: (N, 3) tracked positions.
    :return: list of (start, end) index pairs, end exclusive.
    """
    import numpy as np

    times = np.asarray(times, np.float64)
    positions = np.asarray(positions, np.float64)
    out = []
    i = 0
    n = len(times)
    while i < n:
        j = i + 1
        while j < n and np.linalg.norm(positions[j] - positions[i]) <= max_motion:
            j += 1
        if j > i + 1 and times[j - 1] - times[i] >= min_duration:
            out.append((i, j))
        i = j if j > i + 1 else i + 1
    return out


def tracker_position_error(T_est, xyz_tracker):
    """Mean position error of estimated poses against tracker positions
    (reference: scripts/model_poses_learning:138-140)."""
    T_est = jnp.asarray(T_est)
    xyz = jnp.asarray(xyz_tracker, T_est.dtype)
    return jnp.linalg.norm(T_est[:, :3, 3] - xyz, axis=1).mean()
