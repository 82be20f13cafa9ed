"""Core numeric ops: SE(3), 3x3 eigendecomposition, covariances, neighbors."""

from .se3 import (
    absolute_orientation,
    delta_transform,
    matrix_to_xyz_axis_angle,
    rotation_angle,
    transform_inv,
    transform_points,
    translation_norm,
    xyz_axis_angle_to_matrix,
)
from .eigh3 import eigh3, eigvals3
from .covs import weighted_cov, weighted_mean, trace3
from .knn import nearest_neighbors, radius_neighbors

__all__ = [
    "absolute_orientation",
    "delta_transform",
    "eigh3",
    "eigvals3",
    "matrix_to_xyz_axis_angle",
    "nearest_neighbors",
    "radius_neighbors",
    "rotation_angle",
    "trace3",
    "transform_inv",
    "transform_points",
    "translation_norm",
    "weighted_cov",
    "weighted_mean",
    "xyz_axis_angle_to_matrix",
]
