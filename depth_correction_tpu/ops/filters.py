"""Point-cloud filters.

Mask-producing re-design of the reference filter bank
(reference: src/depth_correction/filters.py:8-309): on TPU, filters never
change array sizes — they AND boolean masks. The voxel-grid subsample, which
genuinely reduces the point count, runs host-side during dataset
preprocessing (as in the reference, where it is a CPU dict pass,
filters.py:24-82) and also ships a jittable masked variant for the online
correction path.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cloud import Cloud
from .features import dir_dispersion, mean_depth, mean_vp_dist, vp_dispersion

__all__ = [
    "within_bounds",
    "filter_depth_mask",
    "filter_grid_indices",
    "filter_grid_mask",
    "filter_valid_neighbors_mask",
    "filter_eigenvalues_mask",
    "filter_eigenvalue_ratios_mask",
    "filter_box_mask",
    "filter_shadow_mask",
    "ball_angle_to_distance",
    "global_cloud_mask",
]


def within_bounds(x: jax.Array, lo=None, hi=None, bounds=None) -> jax.Array:
    """Mask of lo <= x <= hi; None / non-finite bounds are open
    (reference: filters.py:85-113)."""
    if bounds is not None:
        lo, hi = bounds
    keep = jnp.ones(x.shape, dtype=bool)
    if lo is not None and lo == lo and lo > -float("inf"):  # lo==lo filters NaN
        keep = keep & (x >= lo)
    if hi is not None and hi == hi and hi < float("inf"):
        keep = keep & (x <= hi)
    return keep


def filter_depth_mask(cloud: Cloud, lo=None, hi=None) -> jax.Array:
    """Depth-bounds mask (reference: filters.py:116-141)."""
    return within_bounds(cloud.depth, lo, hi) & cloud.valid


def filter_grid_indices(
    points: np.ndarray,
    grid_res: float,
    keep: str = "random",
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Host-side voxel-grid subsample: indices of one point per cell.

    Matches the reference semantics (filters.py:24-82): voxel key =
    floor(x / res); the representative is the first / a seeded-random / the
    last point of the cell. Vectorized with lexsort instead of a Python dict.
    """
    assert keep in ("first", "random", "last")
    pts = np.asarray(points, dtype=np.float64)
    keys = np.floor(pts / grid_res).astype(np.int64)

    order = np.arange(len(keys))
    if keep == "first":
        rank = order
    elif keep == "last":
        rank = order[::-1].copy()
    else:
        rng = rng or np.random.default_rng(135)
        rank = rng.permutation(len(keys))

    # Group by voxel; within each voxel keep the entry with the lowest rank.
    # Unique voxel ids via lexsort over the 3 key columns.
    sort_idx = np.lexsort((rank, keys[:, 2], keys[:, 1], keys[:, 0]))
    k_sorted = keys[sort_idx]
    new_cell = np.ones(len(k_sorted), dtype=bool)
    new_cell[1:] = np.any(k_sorted[1:] != k_sorted[:-1], axis=1)
    return np.sort(sort_idx[new_cell])


def filter_grid_mask(
    points: jax.Array,
    valid: jax.Array,
    grid_res: float,
    seed: int = 135,
    table_size: Optional[int] = None,
) -> jax.Array:
    """Jittable voxel-grid subsample via hashed scatter-argmin.

    One winner per occupied voxel, chosen by a seeded per-point random rank
    (the masked analogue of ``keep='random'``). Collisions in the hash table
    can merge distinct voxels (losing at most one of the two points), which
    is acceptable for the online-correction path; size the table ~4x the
    point count to make collisions rare.
    """
    n = points.shape[0]
    if table_size is None:
        table_size = max(4 * n, 1024)
    cell = jnp.floor(points / grid_res).astype(jnp.int32)
    # 3-component integer hash (Teschner-style primes).
    h = (
        cell[:, 0] * jnp.int32(73856093)
        ^ cell[:, 1] * jnp.int32(19349663)
        ^ cell[:, 2] * jnp.int32(83492791)
    )
    slot = jnp.abs(h) % table_size
    rank = jax.random.uniform(jax.random.PRNGKey(seed), (n,))
    rank = jnp.where(valid, rank, jnp.inf)
    # Winner = the min-rank point of each occupied slot, found by a
    # (slot, rank) sort + first-of-run instead of a scatter-min table:
    # TPU scatters serialize (the .at[slot].min table build measured ~24 ms
    # of the node's 58 ms scan budget; two sorts are ~5 ms).
    iota = jnp.arange(n, dtype=jnp.int32)
    s_slot, s_rank, s_iota = jax.lax.sort(
        (slot, rank, iota), num_keys=2
    )
    first = jnp.concatenate(
        [jnp.ones((1,), bool), s_slot[1:] != s_slot[:-1]]
    )
    win = first & jnp.isfinite(s_rank)
    _, win_orig = jax.lax.sort_key_val(s_iota, win.astype(jnp.int32))
    return valid & (win_orig > 0)


def filter_valid_neighbors_mask(
    neighbors: jax.Array, weights: jax.Array, min_neighbors: int
) -> jax.Array:
    """Keep points with enough valid neighbors (reference: filters.py:184-193)."""
    count = jnp.sum(weights > 0, axis=-1)
    return count >= min_neighbors


def filter_eigenvalues_mask(eigvals: jax.Array, bounds) -> jax.Array:
    """AND of eigenvalue-bound masks (reference: filters.py:196-221).

    :param bounds: list of [eig_index, lo, hi]; NaN bounds are open.
    """
    eigvals = jax.lax.stop_gradient(eigvals)
    keep = jnp.ones(eigvals.shape[:-1], dtype=bool)
    for i, lo, hi in bounds or []:
        keep = keep & within_bounds(eigvals[..., i], lo, hi)
    return keep


def filter_eigenvalue_ratios_mask(eigvals: jax.Array, bounds) -> jax.Array:
    """AND of eigenvalue-ratio bound masks (reference: filters.py:224-254).

    :param bounds: list of [i, j, lo, hi] bounding eig_i / eig_j.
    """
    eigvals = jax.lax.stop_gradient(eigvals)
    keep = jnp.ones(eigvals.shape[:-1], dtype=bool)
    for i, j, lo, hi in bounds or []:
        ratio = eigvals[..., i] / jnp.maximum(eigvals[..., j], 1e-30)
        keep = keep & within_bounds(ratio, lo, hi)
    return keep


def filter_box_mask(points: jax.Array, box_size, box_T=None) -> jax.Array:
    """Axis-aligned (optionally posed) box crop (reference: filters.py:144-181)."""
    if box_T is not None:
        center = box_T[:3, 3]
        orient = box_T[:3, :3]
        points = (points - center) @ orient
    keep = jnp.ones(points.shape[:-1], dtype=bool)
    for a in range(3):
        keep = keep & within_bounds(points[..., a], -box_size[a] / 2, box_size[a] / 2)
    return keep


def ball_angle_to_distance(angle, radius: float = 1.0):
    """Chord length subtending ``angle`` on the unit sphere
    (reference: nearest_neighbors.py:13-19) — converts angular neighborhoods
    on direction vectors to euclidean radii."""
    angle = jnp.clip(jnp.asarray(angle), 0.0, jnp.pi)
    return radius * jnp.sqrt(2.0 * (1.0 - jnp.cos(angle)))


def filter_shadow_mask(
    cloud: Cloud,
    dir_neighbors: jax.Array,
    dir_weights: jax.Array,
    angle_bounds,
) -> jax.Array:
    """Shadow-point (veiling-point) removal (reference: filters.py:257-309).

    For each point x with viewpoint o and direction-space neighbors n:
    bound the angle between (o - x) and (n - x); points seen edge-on at
    depth discontinuities produce extreme angles and are dropped.
    """
    lo = angle_bounds[0] if angle_bounds and angle_bounds[0] == angle_bounds[0] else 0.0
    hi = (
        angle_bounds[1]
        if len(angle_bounds) > 1 and angle_bounds[1] == angle_bounds[1]
        else float(jnp.pi)
    )
    lo = max(lo or 0.0, 0.0)
    hi = min(hi if hi is not None else float(jnp.pi), float(jnp.pi))

    x = cloud.get_points()
    ox = cloud.vps - x  # (N, 3)
    nx = x[jnp.maximum(dir_neighbors, 0)] - x[:, None, :]  # (N, K, 3)
    cos = jnp.sum(ox[:, None, :] * nx, axis=-1)
    denom = jnp.linalg.norm(ox, axis=-1)[:, None] * jnp.linalg.norm(nx, axis=-1)
    cos = cos / jnp.maximum(denom, 1e-20)
    a = jnp.arccos(jnp.clip(cos, -1.0, 1.0))
    # Neutralize invalid neighbor slots at mid-bounds (filters.py:292-294).
    mid = (lo + hi) / 2.0
    a = jnp.where(dir_weights > 0, a, mid)
    return (jnp.min(a, axis=-1) >= lo) & (jnp.max(a, axis=-1) <= hi) & cloud.valid


def global_cloud_mask(
    cloud: Cloud,
    neighbors: jax.Array,
    weights: jax.Array,
    cfg,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Composite trainable-region mask of the global cloud
    (reference: src/depth_correction/preproc.py:122-164): valid-neighbor
    count, eigenvalue(-ratio) bounds, and viewpoint/direction dispersion
    trainability bounds, ANDed with any carried-over local mask.
    """
    if mask is None:
        mask = jnp.ones(cloud.size, dtype=bool)
    mask = mask & cloud.valid
    if cfg.min_valid_neighbors:
        mask = mask & filter_valid_neighbors_mask(
            neighbors, weights, cfg.min_valid_neighbors
        )
    if cfg.eigenvalue_bounds:
        mask = mask & filter_eigenvalues_mask(cloud.eigvals, cfg.eigenvalue_bounds)
    if cfg.eigenvalue_ratio_bounds:
        mask = mask & filter_eigenvalue_ratios_mask(
            cloud.eigvals, cfg.eigenvalue_ratio_bounds
        )
    if cfg.dir_dispersion_bounds:
        dd = dir_dispersion(cloud, neighbors, weights)
        mask = mask & within_bounds(dd, *cfg.dir_dispersion_bounds[:2])
    if cfg.vp_dispersion_bounds:
        vd = vp_dispersion(cloud, neighbors, weights)
        mask = mask & within_bounds(vd, *cfg.vp_dispersion_bounds[:2])
    if cfg.vp_dispersion_to_depth2_bounds:
        vd = vp_dispersion(cloud, neighbors, weights)
        md = mean_depth(cloud, neighbors, weights)
        ratio = vd / jnp.maximum(md, 1e-20) ** 2
        mask = mask & within_bounds(ratio, *cfg.vp_dispersion_to_depth2_bounds[:2])
    if cfg.vp_dist_to_depth_bounds:
        vp = mean_vp_dist(cloud, neighbors, weights)
        md = mean_depth(cloud, neighbors, weights)
        ratio = vp / jnp.maximum(md, 1e-20)
        mask = mask & within_bounds(ratio, *cfg.vp_dist_to_depth_bounds[:2])
    return mask
