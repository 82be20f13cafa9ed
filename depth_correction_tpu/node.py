"""Online depth correction — the deployable product path.

The reference ships this as a ROS node (reference: scripts/depth_correction:
13-79): subscribe PointCloud2, compute local features, apply the model,
republish. Here the node boundary becomes a pure jitted function
``correct(params, cloud) -> cloud`` plus a host streaming wrapper that:

- buckets incoming scans to a small set of padded sizes (so recompilation
  stops after the first few scans),
- runs feature extraction + masked correction as one XLA program,
- returns structured arrays for interop (and drops stale scans by age, like
  the reference's age gating, scripts/depth_correction:63-66).
"""
from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .cloud import Cloud
from .config import Config
from .models import load_model
from .ops.features import neighborhood_features
from .ops.filters import (
    filter_depth_mask,
    filter_eigenvalue_ratios_mask,
    filter_eigenvalues_mask,
    filter_grid_mask,
)
from .ops.knn import radius_neighbors
from .preproc import pad_size

__all__ = ["CloudFilter", "DepthCorrector", "correct_cloud"]


@partial(jax.jit, static_argnames=("k", "nn_r", "min_depth", "max_depth",
                                   "grid_res", "eigval_bounds", "ratio_bounds"))
def _correct_program(
    model,
    vps,
    dirs,
    depth,
    valid,
    k: int,
    nn_r: float,
    min_depth: float,
    max_depth: float,
    grid_res: float,
    eigval_bounds,
    ratio_bounds,
):
    """One fused program: filters -> neighbors -> features -> masked model
    application -> corrected points (the online forward pass,
    reference: scripts/depth_correction:31-58).
    """
    cloud = Cloud(vps=vps, dirs=dirs, depth=depth, valid=valid)
    keep = filter_depth_mask(cloud, min_depth, max_depth)
    if grid_res and grid_res > 0.0:
        pts0 = cloud.to_points()
        keep = keep & filter_grid_mask(pts0, keep, grid_res)
    cloud = cloud.replace(valid=keep)

    points = cloud.to_points()
    _, nn = radius_neighbors(points, points, r=nn_r, k=k,
                             valid_points=keep, valid_query=keep)
    weights = (nn >= 0).astype(depth.dtype)
    feats = neighborhood_features(points, nn, weights, dirs=cloud.dirs)
    mask = keep
    if eigval_bounds:
        mask = mask & filter_eigenvalues_mask(feats["eigvals"], eigval_bounds)
    if ratio_bounds:
        mask = mask & filter_eigenvalue_ratios_mask(feats["eigvals"], ratio_bounds)

    cloud = cloud.replace(
        inc_angles=feats["inc_angles"], normals=feats["normals"], mask=mask
    )
    corrected = model.apply(cloud)
    return corrected.to_points(), corrected.depth, feats["normals"], mask, keep


def _freeze_bounds(bounds):
    return tuple(tuple(b) for b in bounds) if bounds else ()


def correct_cloud(model, cloud: Cloud, cfg: Config, k: Optional[int] = None):
    """Pure API: correct one (padded) cloud; returns (points, depth, normals,
    mask, valid)."""
    k = k or cfg.nn_max_neighbors or 32
    return _correct_program(
        model,
        cloud.vps,
        cloud.dirs,
        cloud.depth,
        cloud.valid,
        k=int(k),
        nn_r=float(cfg.nn_r),
        min_depth=float(cfg.min_depth or 0.0),
        max_depth=float(cfg.max_depth or np.inf),
        grid_res=float(cfg.grid_res or 0.0),
        eigval_bounds=_freeze_bounds(cfg.eigenvalue_bounds),
        ratio_bounds=_freeze_bounds(cfg.eigenvalue_ratio_bounds),
    )


class CloudFilter:
    """Streaming depth + grid filter (the cloud_filter node equivalent,
    reference: scripts/cloud_filter:23-31): host-side filtering of raw scans
    to the preprocessed form the rest of the pipeline consumes."""

    def __init__(self, cfg: Config):
        self.cfg = cfg

    def process(self, scan: np.ndarray) -> np.ndarray:
        from .datasets.synthetic import make_structured
        from .preproc import filtered_cloud

        pts, vps, normals = filtered_cloud(scan, self.cfg)
        return make_structured(pts, normals=normals, vps=vps)


class DepthCorrector:
    """Host streaming wrapper around :func:`correct_cloud`.

    ``process(structured_scan) -> structured_scan`` with corrected x/y/z
    (+ normals, mask); scans older than ``max_age`` are dropped
    (reference: scripts/depth_correction:63-66).
    """

    def __init__(self, cfg: Config, model=None, max_age: float = float("inf"),
                 k: Optional[int] = None):
        self.cfg = cfg
        self.model = model if model is not None else load_model(cfg=cfg)
        self.max_age = max_age
        self.k = k or cfg.nn_max_neighbors or 32

    def process(self, scan: np.ndarray, stamp: Optional[float] = None):
        if stamp is not None and (time.time() - stamp) > self.max_age:
            return None  # stale scan dropped
        cloud = (
            Cloud.from_structured_array(scan, dtype=self.cfg.jax_float_type())
            if scan.dtype.names
            else Cloud.from_points(scan, dtype=self.cfg.jax_float_type())
        )
        cloud = cloud.pad(pad_size(cloud.size))
        points, depth, normals, mask, valid = correct_cloud(
            self.model, cloud, self.cfg, k=self.k
        )
        keep = np.asarray(valid)
        out = np.zeros(
            int(keep.sum()),
            dtype=[
                ("x", "f4"), ("y", "f4"), ("z", "f4"),
                ("normal_x", "f4"), ("normal_y", "f4"), ("normal_z", "f4"),
                ("mask", "u1"),
            ],
        )
        pts = np.asarray(points)[keep]
        nrm = np.asarray(normals)[keep]
        out["x"], out["y"], out["z"] = pts.T.astype(np.float32)
        out["normal_x"], out["normal_y"], out["normal_z"] = nrm.T.astype(np.float32)
        out["mask"] = np.asarray(mask)[keep].astype(np.uint8)
        return out
