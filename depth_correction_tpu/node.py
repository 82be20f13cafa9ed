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

Establishment engine (the per-scan neighbor search, the reference's cKDTree
per callback, depth_cloud.py / nearest_neighbors.py): small scans keep the
whole correction ONE fused XLA program around the tiled brute-force scan;
scans >= ``GRID_NN_MIN_POINTS`` (or ``cfg.nn_backend == 'grid'``) stage
through the grid-hash engine (ops/grid_hash.py) with pow2-rounded static
shapes, turning the O(N^2) scan into O(N * window) — the same engine
training prep uses at scale.
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
from .ops.grid_hash import GRID_NN_MIN_POINTS, grid_radius_neighbors
from .ops.knn import radius_neighbors
from .preproc import pad_size

__all__ = ["CloudFilter", "DepthCorrector", "correct_cloud"]


def _filter_impl(cloud: Cloud, min_depth, max_depth, grid_res):
    """Depth + voxel-grid filters -> keep mask (shared by both engines)."""
    keep = filter_depth_mask(cloud, min_depth, max_depth)
    if grid_res and grid_res > 0.0:
        pts0 = cloud.to_points()
        keep = keep & filter_grid_mask(pts0, keep, grid_res)
    return keep


def _apply_impl(model, cloud: Cloud, nn, eigval_bounds, ratio_bounds):
    """Features from an established neighbor table -> masked model apply."""
    points = cloud.to_points()
    weights = (nn >= 0).astype(cloud.depth.dtype)
    feats = neighborhood_features(points, nn, weights, dirs=cloud.dirs)
    mask = cloud.valid
    if eigval_bounds:
        mask = mask & filter_eigenvalues_mask(feats["eigvals"], eigval_bounds)
    if ratio_bounds:
        mask = mask & filter_eigenvalue_ratios_mask(feats["eigvals"],
                                                    ratio_bounds)
    cloud = cloud.replace(
        inc_angles=feats["inc_angles"], normals=feats["normals"], mask=mask
    )
    corrected = model.apply(cloud)
    return (corrected.to_points(), corrected.depth, feats["normals"], mask,
            cloud.valid)


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
    """One fused program: filters -> brute-force neighbors -> features ->
    masked model application -> corrected points (the online forward pass,
    reference: scripts/depth_correction:31-58). The small-scan path: one
    dispatch, no host round trips."""
    cloud = Cloud(vps=vps, dirs=dirs, depth=depth, valid=valid)
    keep = _filter_impl(cloud, min_depth, max_depth, grid_res)
    cloud = cloud.replace(valid=keep)
    points = cloud.to_points()
    _, nn = radius_neighbors(points, points, r=nn_r, k=k,
                             valid_points=keep, valid_query=keep)
    return _apply_impl(model, cloud, nn, eigval_bounds, ratio_bounds)


@partial(jax.jit, static_argnames=("min_depth", "max_depth", "grid_res"))
def _filter_program(vps, dirs, depth, valid, min_depth, max_depth, grid_res):
    cloud = Cloud(vps=vps, dirs=dirs, depth=depth, valid=valid)
    keep = _filter_impl(cloud, min_depth, max_depth, grid_res)
    return keep, cloud.replace(valid=keep).to_points()


@partial(jax.jit, static_argnames=("eigval_bounds", "ratio_bounds"))
def _apply_program(model, vps, dirs, depth, keep, nn, eigval_bounds,
                   ratio_bounds):
    cloud = Cloud(vps=vps, dirs=dirs, depth=depth, valid=keep)
    return _apply_impl(model, cloud, nn, eigval_bounds, ratio_bounds)


def _freeze_bounds(bounds):
    return tuple(tuple(b) for b in bounds) if bounds else ()


def correct_cloud(model, cloud: Cloud, cfg: Config, k: Optional[int] = None):
    """Pure API: correct one (padded) cloud; returns (points, depth, normals,
    mask, valid).

    Establishment routes like training prep (preproc.py:278-289): the
    grid-hash engine for big scans / ``cfg.nn_backend == 'grid'``, the fused
    brute-force program otherwise (``'brute'`` forces it)."""
    k = k or cfg.nn_max_neighbors or 32
    backend = getattr(cfg, "nn_backend", None)
    n = cloud.vps.shape[0]
    use_grid = backend == "grid" or (
        backend not in ("brute",) and n >= GRID_NN_MIN_POINTS
    )
    common = dict(
        min_depth=float(cfg.min_depth or 0.0),
        max_depth=float(cfg.max_depth or np.inf),
        grid_res=float(cfg.grid_res or 0.0),
    )
    bounds = dict(
        eigval_bounds=_freeze_bounds(cfg.eigenvalue_bounds),
        ratio_bounds=_freeze_bounds(cfg.eigenvalue_ratio_bounds),
    )
    if not use_grid:
        return _correct_program(
            model, cloud.vps, cloud.dirs, cloud.depth, cloud.valid,
            k=int(k), nn_r=float(cfg.nn_r), **common, **bounds,
        )
    keep, points = _filter_program(
        cloud.vps, cloud.dirs, cloud.depth, cloud.valid, **common
    )
    _, nn = grid_radius_neighbors(
        points, r=float(cfg.nn_r), k=int(k),
        valid_points=keep, valid_query=keep, static_shapes=True,
    )
    return _apply_program(
        model, cloud.vps, cloud.dirs, cloud.depth, keep, nn, **bounds
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
