"""Cloud preprocessing pipeline.

Re-design of the reference pipeline helpers
(reference: src/depth_correction/preproc.py:14-244) around static shapes:

- host-side: depth + voxel-grid subsampling of raw scans
  (:func:`filtered_cloud`), producing compact numpy arrays once per scan,
- device-side: per-scan feature clouds (:func:`local_feature_cloud`),
  batched sequences of padded scans (:class:`SequenceBatch`), the corrected
  +posed global cloud (:func:`global_cloud`), frozen neighborhood
  establishment (:func:`establish_neighborhoods`), and feature recomputation
  over frozen neighborhoods (:func:`compute_neighborhood_features`) — the
  hot path re-run every optimization step.

Scan sizes are padded to multiples of :data:`PAD_MULTIPLE` so XLA programs
are reused across scans of similar size.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .cloud import Cloud
from .config import Config, NeighborhoodType
from .ops.features import compute_features
from .ops.filters import (
    filter_eigenvalue_ratios_mask,
    filter_eigenvalues_mask,
    filter_grid_indices,
    filter_shadow_mask,
    ball_angle_to_distance,
    global_cloud_mask,
)
from .ops.grid_hash import GRID_NN_MIN_POINTS, grid_radius_neighbors
from .ops.knn import nearest_neighbors, radius_neighbors, suggest_k_max
from .ops.se3 import xyz_axis_angle_to_matrix, PPREC

__all__ = [
    "PAD_MULTIPLE",
    "SequenceBatch",
    "compute_neighborhood_features",
    "establish_neighborhoods",
    "filtered_cloud",
    "flatten_batch",
    "global_cloud",
    "global_cloud_mask",
    "local_feature_cloud",
    "offset_cloud",
    "pad_size",
    "sequence_batch",
]

PAD_MULTIPLE = 512


def pad_size(n: int, multiple: int = PAD_MULTIPLE) -> int:
    return max(multiple, -(-n // multiple) * multiple)


# ---------------------------------------------------------------------------
# Host-side raw-scan filtering (runs once per scan, like the reference's CPU
# preprocessing; reference: preproc.py:25-32).
# ---------------------------------------------------------------------------


def _split_structured(arr: np.ndarray):
    from numpy.lib.recfunctions import structured_to_unstructured as s2u

    names = arr.dtype.names or ()
    pts = s2u(arr[["x", "y", "z"]], dtype=np.float64) if names else np.asarray(arr)
    vps = s2u(arr[["vp_x", "vp_y", "vp_z"]], dtype=np.float64) if "vp_x" in names else None
    normals = (
        s2u(arr[["normal_x", "normal_y", "normal_z"]], dtype=np.float64)
        if "normal_x" in names
        else None
    )
    return pts, vps, normals


def filtered_cloud(
    cloud, cfg: Config
) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]:
    """Depth-bounds + seeded random voxel-grid subsample of a raw scan.

    Mirrors ``filtered_cloud`` (reference: preproc.py:25-32): a fresh
    generator seeded with ``cfg.random_seed`` per scan keeps the grid
    tie-breaks deterministic.

    :param cloud: structured array (x/y/z[/vp_*/normal_*]) or (N, 3) points.
    :return: (points, vps or None, normals or None) as numpy arrays.
    """
    if isinstance(cloud, np.ndarray) and cloud.dtype.names:
        pts, vps, normals = _split_structured(cloud)
    else:
        pts, vps, normals = np.asarray(cloud, dtype=np.float64), None, None

    depth = np.linalg.norm(pts - (vps if vps is not None else 0.0), axis=1)
    keep = np.ones(len(pts), dtype=bool)
    if cfg.min_depth is not None and cfg.min_depth > 0.0:
        keep &= depth >= cfg.min_depth
    if cfg.max_depth is not None and np.isfinite(cfg.max_depth):
        keep &= depth <= cfg.max_depth
    idx = np.flatnonzero(keep)

    if cfg.grid_res and cfg.grid_res > 0.0:
        rng = np.random.default_rng(cfg.random_seed)
        sub = filter_grid_indices(pts[idx], cfg.grid_res, keep="random", rng=rng)
        idx = idx[sub]

    return (
        pts[idx],
        vps[idx] if vps is not None else None,
        normals[idx] if normals is not None else None,
    )


# ---------------------------------------------------------------------------
# Per-scan feature clouds (reference: preproc.py:35-64).
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("scale",))
def _compute_features_jit(cloud: Cloud, neighbors, weights, scale):
    return compute_features(cloud, neighbors, weights, scale=scale)


def local_feature_cloud(
    cloud,
    cfg: Config,
    pad_to: Optional[int] = None,
    return_neighbors: bool = False,
) -> Cloud:
    """Build a per-scan feature cloud: neighbors + mean/cov/eigh/normals/
    incidence angles + eigenvalue masks.

    The resulting ``mask`` marks the locally-planar, correctable region the
    model is applied to (reference: preproc.py:53-62).

    :param return_neighbors: also return the per-scan (neighbors, weights)
        used for the features — the loss-offset path re-evaluates local
        features under the current model over these frozen neighborhoods
        (reference: preproc.py:67-77).
    """
    dtype = cfg.jax_float_type()
    if isinstance(cloud, np.ndarray) and cloud.dtype.names:
        pts, vps, normals = _split_structured(cloud)
        cloud = Cloud.from_points(pts, vps=vps, normals=normals, dtype=dtype)
    elif isinstance(cloud, (np.ndarray, jnp.ndarray)):
        cloud = Cloud.from_points(cloud, dtype=dtype)
    elif isinstance(cloud, tuple):
        pts, vps, normals = cloud
        cloud = Cloud.from_points(pts, vps=vps, normals=normals, dtype=dtype)
    assert isinstance(cloud, Cloud)
    cloud = cloud.astype(dtype)

    # Shadow-point removal over direction-space neighborhoods
    # (reference: preproc.py:45-47).
    if cfg.shadow_angle_bounds:
        r_dir = float(ball_angle_to_distance(cfg.shadow_neighborhood_angle))
        k_dir = suggest_k_max(cloud.dirs, r=r_dir, valid_points=cloud.valid)
        _, dir_nn = radius_neighbors(
            cloud.dirs, r=r_dir, k=k_dir, valid_points=cloud.valid
        )
        dir_w = (dir_nn >= 0).astype(dtype)
        shadow_ok = filter_shadow_mask(cloud, dir_nn, dir_w, cfg.shadow_angle_bounds)
        cloud = cloud.keep(np.asarray(shadow_ok))

    if pad_to is None:
        pad_to = pad_size(cloud.size)
    cloud = cloud.pad(pad_to)

    # Neighbors + features (reference: preproc.py:50 / depth_cloud.py:426-441).
    neighbors, weights = establish_scan_neighbors(cloud, cfg)
    # Jitted: one program dispatch per (shape, scale) instead of ~50 eager
    # ops — prep runs host-side, where per-op dispatch (especially through
    # a remote-device tunnel) dominates otherwise. NO Gaussian re-weighting
    # here: the reference applies cfg.nn_scale to the GLOBAL cloud only
    # (preproc.py:184, 216); its local path is update_all(k, r) unscaled
    # (preproc.py:50), so the planar masks and loss-offset locals must be
    # computed from unscaled covariances.
    cloud = _compute_features_jit(cloud, neighbors, weights, None)

    # Planar-region mask (reference: preproc.py:53-62).
    mask = cloud.valid
    if cfg.eigenvalue_bounds:
        mask = mask & filter_eigenvalues_mask(cloud.eigvals, cfg.eigenvalue_bounds)
    if cfg.eigenvalue_ratio_bounds:
        mask = mask & filter_eigenvalue_ratios_mask(
            cloud.eigvals, cfg.eigenvalue_ratio_bounds
        )
    out = cloud.replace(mask=mask)
    if return_neighbors:
        return out, neighbors, weights
    return out


def _host_neighbors(points, valid, cfg: Config, k_max: Optional[int] = None):
    """Host-side KD-tree neighbor path (prep alternative to the on-device
    tiled search): 'native' uses the C++ runtime (native/dc_native.cpp),
    'scipy' the reference's index (nearest_neighbors.py:22-80). Both return
    the same padded index/weight matrices that feed the on-device hot loop.
    """
    pts = np.asarray(points, np.float64)
    val = np.asarray(valid)
    n = len(pts)
    idx_valid = np.flatnonzero(val)

    use_native = False
    if cfg.nn_backend == "native":
        from .utils import native

        use_native = native.available()
        if not use_native:
            print("native backend unavailable, falling back to scipy")

    if use_native:
        from .utils.native import KDTree

        tree = KDTree(pts[idx_valid])
        if cfg.nn_k:
            _, ind = tree.query(
                pts, k=int(cfg.nn_k), distance_upper_bound=cfg.nn_r or -1.0
            )
            miss = ind < 0
            out = idx_valid[np.where(miss, 0, ind)]
            out[miss] = -1
        else:
            k = int(k_max or cfg.nn_max_neighbors or 0)
            if not k:
                # One counting pass to size K, then the real query.
                _, counts = tree.query_ball(pts[val], cfg.nn_r, 1)
                k = max(int(counts.max()), 1)
                k = -(-k // 8) * 8
            ind, _ = tree.query_ball(pts, cfg.nn_r, k)
            miss = ind < 0
            out = idx_valid[np.where(miss, 0, ind)]
            out[miss] = -1
    else:
        from scipy.spatial import cKDTree

        tree = cKDTree(pts[idx_valid])
        if cfg.nn_k:
            kw = {"distance_upper_bound": cfg.nn_r} if cfg.nn_r else {}
            _, ind = tree.query(pts, k=int(cfg.nn_k), workers=-1, **kw)
            # cKDTree.query returns (N,) for k=1; keep (N, k) throughout.
            ind = ind.reshape(n, -1)
            miss = ind == tree.n
            ind = np.where(miss, 0, ind)
            out = idx_valid[ind]
            out[miss] = -1
        else:
            balls = tree.query_ball_point(pts, cfg.nn_r, workers=-1)
            k = k_max or cfg.nn_max_neighbors or max(
                (len(b) for b, v in zip(balls, val) if v), default=1
            )
            out = np.full((n, int(k)), -1, np.int64)
            for i, b in enumerate(balls):
                if val[i]:
                    if len(b) > int(k):
                        # Keep the k NEAREST, like the device engines —
                        # query_ball_point's order is arbitrary, and an
                        # index-ordered cut would make the neighborhoods
                        # backend-dependent.
                        d2 = np.sum((pts[idx_valid[b]] - pts[i]) ** 2, axis=1)
                        b = [b[j] for j in np.argsort(d2, kind="stable")[: int(k)]]
                    out[i, : len(b)] = idx_valid[b]
    out[~val] = -1
    idx = jnp.asarray(out, jnp.int32)
    weights = (idx >= 0).astype(jnp.asarray(points).dtype)
    return idx, weights


def _device_radius_neighbors(points, r, k, valid, backend=None):
    """Pick the on-device radius engine: grid-hash for big clouds / when
    forced (``nn_backend == 'grid'``), tiled scan otherwise. Both are exact."""
    if backend == "grid" or (
        backend is None and points.shape[0] >= GRID_NN_MIN_POINTS
    ):
        return grid_radius_neighbors(
            points, r=r, k=int(k), valid_points=valid, valid_query=valid
        )
    return radius_neighbors(
        points, r=r, k=int(k), valid_points=valid, valid_query=valid
    )


def establish_scan_neighbors(cloud: Cloud, cfg: Config):
    """Neighbor graph of a single cloud per config (kNN or ball radius)."""
    points = cloud.get_points()
    if getattr(cfg, "nn_backend", None) in ("scipy", "native"):
        return _host_neighbors(points, cloud.valid, cfg)
    if cfg.nn_k:
        dist, idx = nearest_neighbors(
            points,
            points,
            k=int(cfg.nn_k),
            r=cfg.nn_r or None,
            valid_points=cloud.valid,
            valid_query=cloud.valid,
        )
    else:
        k = cfg.nn_max_neighbors or suggest_k_max(
            points, r=cfg.nn_r, valid_points=cloud.valid
        )
        dist, idx = _device_radius_neighbors(
            points, cfg.nn_r, k, cloud.valid, backend=cfg.nn_backend
        )
    weights = (idx >= 0).astype(points.dtype)
    return idx, weights


# ---------------------------------------------------------------------------
# Batched sequences and the global cloud (reference: preproc.py:80-119).
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SequenceBatch:
    """A sequence of S scans padded to a common width N.

    The TPU-first layout for training: one (S, N, ...) Cloud plus (S, 4, 4)
    poses. The reference iterates Python lists of per-scan clouds
    (preproc.py:110-118); here per-scan work is one batched program.
    """

    cloud: Cloud  # fields shaped (S, N, ...)
    poses: jax.Array  # (S, 4, 4)

    @property
    def num_scans(self) -> int:
        return self.poses.shape[0]


def sequence_batch(clouds: Sequence[Cloud], poses) -> SequenceBatch:
    """Stack per-scan clouds (padding to the widest) with their poses."""
    n = max(pad_size(c.size) for c in clouds)
    padded = [c.pad(n) for c in clouds]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *padded)
    poses = jnp.asarray(poses, dtype=stacked.vps.dtype)
    return SequenceBatch(cloud=stacked, poses=poses)


def flatten_batch(cloud: Cloud) -> Cloud:
    """(S, N, ...) cloud -> (S*N, ...) global cloud."""

    def flat(x):
        if x is None:
            return None
        return x.reshape((-1,) + x.shape[2:])

    return jax.tree_util.tree_map(flat, cloud)


def corrected_poses(poses: jax.Array, pose_deltas: Optional[jax.Array]) -> jax.Array:
    """poses @ delta(xyz_axis_angle) (reference: eval.py:68-82).

    ``pose_deltas`` may be (1, 6) (common/sequence correction, broadcast) or
    (S, 6) (per-pose correction).
    """
    if pose_deltas is None:
        return poses
    deltas = xyz_axis_angle_to_matrix(pose_deltas.astype(poses.dtype))
    if deltas.shape[0] == 1 and poses.shape[0] != 1:
        deltas = jnp.broadcast_to(deltas, poses.shape)
    # full-f32 passes: a bf16 pose product perturbs positions ~1 cm at
    # 20 m (ops/se3.py PPREC).
    return jnp.matmul(poses, deltas, precision=PPREC)


def global_cloud(
    batch: SequenceBatch,
    model=None,
    pose_deltas: Optional[jax.Array] = None,
) -> Cloud:
    """Depth-correct, pose-transform, and merge a sequence into one global
    cloud (reference: preproc.py:80-119). Fully batched: the model applies
    to the (S, N) depth/incidence arrays at once and the per-scan rigid
    transforms are one batched matmul.
    """
    cloud = batch.cloud
    if model is not None:
        cloud = model.apply(cloud)
    poses = corrected_poses(batch.poses, pose_deltas)
    # (S, 4, 4) poses broadcast against the (S, N, 3) cloud fields batchwise.
    transformed = cloud.transform(poses)
    return flatten_batch(transformed).with_points()


def offset_cloud(batch: SequenceBatch, model=None) -> Cloud:
    """Concatenated per-scan local clouds with model applied, for loss
    offsetting (reference: preproc.py:67-77)."""
    cloud = batch.cloud
    if model is not None:
        cloud = model.apply(cloud)
    return flatten_batch(cloud)


@jax.jit
def symmetrize_neighbors(neighbors) -> jnp.ndarray:
    """Keep only mutual pairs: (i, j) survives iff j lists i too.

    An uncapped radius graph is symmetric already (this is a no-op); capping
    at ``nn_max_neighbors`` truncates one-sidedly, which makes the transpose
    in-degree (and with it the analytic-backward gather) up to ~5x the
    forward width. Mutual trimming restores in-degree <= K.

    Runs on device: each neighbor's own row is gathered back and compared
    (chunked so the (C, K, K) block stays in VMEM-sized tiles) — no host
    pair tables, unlike the former numpy ``isin`` over all M*K keys.
    """
    nb = jnp.asarray(neighbors, jnp.int32)
    m, k = nb.shape
    chunk = min(512, m)
    g = -(-m // chunk)
    pad = g * chunk - m
    nb_p = (
        jnp.concatenate([nb, jnp.full((pad, k), -1, nb.dtype)]) if pad else nb
    )
    rows = jnp.arange(g * chunk, dtype=jnp.int32).reshape(g, chunk)
    nb_g = nb_p.reshape(g, chunk, k)

    def body(args):
        r, c = args  # (C,), (C, K)
        back = jnp.take(nb, jnp.maximum(c, 0), axis=0)  # (C, K, K)
        mutual = (back == r[:, None, None]).any(-1) & (c >= 0)
        return jnp.where(mutual, c, -1)

    out = jax.lax.map(body, (rows, nb_g))
    return out.reshape(g * chunk, k)[:m]


def _part1by2(x):
    """Spread 10 bits of each uint32 to every third bit (Morton helper)."""
    x = x & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0xFF0000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


@jax.jit
def spatial_sort_perm(points, valid, cell):
    """Morton (z-order) permutation of the point table.

    Sorting the merged global cloud by the Morton key of its coarse voxel
    puts every neighborhood's points in a bounded address range, so the
    per-step (Mq, K) position gathers read near-contiguous HBM rows instead
    of scan-major random ones. The permutation is frozen (computed from the
    establishment-time positions, like the neighborhoods themselves) and
    applied in-step by :func:`ops.features.permute_rows`, whose backward is
    the inverse gather — no scatter.

    The grid is clamped to 1024 cells per axis (30-bit keys in uint32);
    beyond that the cell auto-coarsens, which only widens the locality
    granularity. Invalid (padding) rows sort to the tail.

    :param points: (M, 3) establishment-time global positions.
    :param valid: (M,) validity mask.
    :param cell: target cell edge (m); e.g. 2*nn_r.
    :return: (perm, inv) int32 — ``sorted = x[perm]``, ``inv[orig] = pos``.
    """
    p = jnp.asarray(points)
    v = jnp.asarray(valid).reshape(-1)
    lo = jnp.min(jnp.where(v[:, None], p, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(v[:, None], p, -jnp.inf), axis=0)
    extent = jnp.maximum(jnp.max(hi - lo), 1e-6)
    cell = jnp.maximum(jnp.asarray(cell, p.dtype), extent / 1024.0)
    c = jnp.clip((p - lo) / cell, 0.0, 1023.0).astype(jnp.uint32)
    key = (
        (_part1by2(c[:, 0]) << 2)
        | (_part1by2(c[:, 1]) << 1)
        | _part1by2(c[:, 2])
    )
    key = jnp.where(v, key, jnp.uint32(0xFFFFFFFF))
    perm = jnp.argsort(key, stable=True).astype(jnp.int32)
    inv = jnp.argsort(perm, stable=True).astype(jnp.int32)
    return perm, inv


def establish_neighborhoods(
    gcloud: Cloud, cfg: Config, k_max: Optional[int] = None, mesh=None
):
    """Frozen neighborhoods of the global cloud (reference: preproc.py:168-191,
    ball type). Computed once per training run; the hot loop only re-gathers.

    :param mesh: optional 1-D ``jax.sharding.Mesh``; radius establishment
        then runs under shard_map with the query axis split across devices,
        so the (M, K) output tables are born sharded (the memory-scaling
        path for establishment; the grid tables themselves are O(M*3)).
    :return: (neighbors (M, K) int32, weights (M, K) float).
    """
    if cfg.nn_type == NeighborhoodType.plane:
        # RANSAC plane neighborhoods (reference: preproc.py:186-191).
        from .segmentation import fit_planes

        planes = fit_planes(
            gcloud,
            cfg.ransac_dist_thresh,
            min_support=cfg.min_valid_neighbors,
            max_iterations=cfg.num_ransac_iters,
            max_models=cfg.max_neighborhoods or 10,
            eps=2.0 * np.sqrt(3.0) * cfg.grid_res,
            seed=cfg.random_seed,
        )
        return planes.orient(gcloud.vps), None
    points = gcloud.get_points()
    # Mutual trimming below only applies to RADIUS graphs truncated by a
    # neighbor cap; pure kNN stays one-sided (reference semantics) even
    # when nn_max_neighbors is also set in the config.
    capped = bool((k_max or cfg.nn_max_neighbors) and not cfg.nn_k)
    if getattr(cfg, "nn_backend", None) in ("scipy", "native"):
        idx, weights = _host_neighbors(points, gcloud.valid, cfg, k_max=k_max)
    elif cfg.nn_k:
        if mesh is not None:
            from .ops.knn import nearest_neighbors_sharded

            _, idx = nearest_neighbors_sharded(
                points,
                points,
                k=int(cfg.nn_k),
                r=cfg.nn_r or None,
                valid_points=gcloud.valid,
                valid_query=gcloud.valid,
                mesh=mesh,
            )
        else:
            _, idx = nearest_neighbors(
                points,
                points,
                k=int(cfg.nn_k),
                r=cfg.nn_r or None,
                valid_points=gcloud.valid,
                valid_query=gcloud.valid,
            )
        # Pure kNN stays one-sided (reference semantics); only radius
        # searches truncated by nn_max_neighbors get mutual trimming.
        weights = None
    else:
        k = k_max or cfg.nn_max_neighbors or suggest_k_max(
            points, r=cfg.nn_r, valid_points=gcloud.valid
        )
        if mesh is not None:
            from .ops.grid_hash import grid_radius_neighbors_sharded

            _, idx = grid_radius_neighbors_sharded(
                points, r=cfg.nn_r, k=int(k), valid_points=gcloud.valid,
                valid_query=gcloud.valid, mesh=mesh,
            )
        else:
            _, idx = _device_radius_neighbors(
                points, cfg.nn_r, k, gcloud.valid, backend=cfg.nn_backend
            )
        weights = None
    if capped and getattr(cfg, "nn_symmetrize", True):
        # Truncated lists are one-sided; mutual trimming keeps the transpose
        # in-degree bounded by K (the analytic backward gathers over it).
        idx = symmetrize_neighbors(idx)
        weights = None
    if weights is None:
        weights = (idx >= 0).astype(points.dtype)
    return idx, weights


def compute_neighborhood_features(
    gcloud: Cloud,
    neighbors: jax.Array,
    weights: jax.Array,
    cfg: Config,
    compute_normals: bool = False,
    t_idx=None,
    t_slot=None,
    t_w=None,
) -> Cloud:
    """Recompute neighborhood statistics over frozen neighborhoods — the
    differentiable hot path (reference: preproc.py:195-217). Normals are
    skipped by default: the consistency losses consume eigenvalues only.
    Pass the transpose graph (t_idx, t_slot) for the scatter-free backward.
    """
    return compute_features(
        gcloud,
        neighbors,
        weights,
        scale=cfg.nn_scale,
        compute_normals=compute_normals,
        t_idx=t_idx,
        t_slot=t_slot,
        t_w=t_w,
    )
