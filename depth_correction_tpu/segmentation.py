"""Plane segmentation: vectorized RANSAC + voxel-graph clustering.

TPU-native replacement of the reference's PCL/Open3D plane-neighborhood
path (reference: src/depth_correction/segmentation.py:95-293): instead of a
sequential C++ RANSAC, ALL hypotheses are scored at once on the device —
plane-point distances are one (N, 3) @ (3, H) matmul that rides the MXU —
and the winner maximizes inlier count. The iterative fit-remove loop and
the DBSCAN-style contiguity filter (reference uses Open3D DBSCAN,
segmentation.py:166-178; here a voxel-connectivity union-find) stay on the
host, as they are control flow over a handful of models.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp

from .ops.se3 import PPREC
import numpy as np

from .cloud import Cloud

__all__ = ["Planes", "fit_planes", "fit_plane_ransac", "cluster_voxel_graph"]


@partial(jax.jit, static_argnames=("num_hypotheses",))
def _ransac_score(points, valid, key, thresh, num_hypotheses: int):
    """Sample plane hypotheses and count inliers, fully batched.

    :return: (best plane (4,), inlier mask (N,)).
    """
    n = points.shape[0]
    # 3-point samples per hypothesis. Collisions waste a hypothesis at most.
    idx = jax.random.randint(key, (num_hypotheses, 3), 0, n)
    tri = points[idx]  # (H, 3, 3)
    normal = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(norm, 1e-12)
    offset = -jnp.sum(normal * tri[:, 0], axis=-1)  # (H,)
    # Degenerate (collinear) samples score zero inliers.
    ok = (norm[:, 0] > 1e-9) & jnp.all(valid[idx], axis=-1)

    # Distances: one matmul on the MXU, (N, 3) @ (3, H).
    dist = jnp.abs(
        jnp.matmul(points, normal.T, precision=PPREC)
        + offset[None, :]
    )  # (N, H); full-f32 passes: bf16 would wobble cm-scale thresholds
    inlier = (dist <= thresh) & valid[:, None]
    counts = jnp.where(ok, jnp.sum(inlier, axis=0), -1)
    best = jnp.argmax(counts)
    plane = jnp.concatenate([normal[best], offset[best, None]])
    return plane, inlier[:, best], counts[best]


def fit_plane_ransac(
    points,
    valid=None,
    distance_threshold: float = 0.03,
    max_iterations: int = 1000,
    seed: int = 135,
):
    """Best plane by batched RANSAC (replaces fit_plane_pcl/open3d,
    reference: segmentation.py:127-163).

    :return: (plane (4,) [n, d], inlier index array).
    """
    points = jnp.asarray(points)
    if valid is None:
        valid = jnp.ones(points.shape[0], dtype=bool)
    key = jax.random.PRNGKey(seed)
    plane, mask, count = _ransac_score(
        points, valid, key, distance_threshold, int(max_iterations)
    )
    if int(count) <= 0:
        # Every hypothesis was degenerate/invalid (triples sample ALL rows,
        # so late iterations over a sparse remainder can strike out) —
        # argmax would fall back to hypothesis 0's unchecked inlier mask and
        # return a garbage plane with phantom support. Report no plane.
        return np.asarray(plane), np.empty(0, np.int64)
    support = np.flatnonzero(np.asarray(mask))
    return np.asarray(plane), support


def cluster_voxel_graph(points: np.ndarray, eps: float, min_points: int = 10):
    """Connected components over the eps-voxel adjacency graph — the
    contiguity filter standing in for DBSCAN (reference uses Open3D
    cluster_dbscan, segmentation.py:166-178). Points whose voxels touch
    (26-neighborhood at resolution eps) share a label.

    :return: (N,) labels, -1 for points in components below ``min_points``.
    """
    pts = np.asarray(points)
    keys = np.floor(pts / eps).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    m = len(uniq)
    parent = np.arange(m)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    lookup = {tuple(k): i for i, k in enumerate(uniq)}
    offsets = [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
        if (dx, dy, dz) != (0, 0, 0)
    ]
    for i, k in enumerate(uniq):
        for off in offsets:
            j = lookup.get((k[0] + off[0], k[1] + off[1], k[2] + off[2]))
            if j is not None:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[rb] = ra
    roots = np.array([find(i) for i in range(m)])
    labels = roots[inv]
    # Compact labels; suppress small components.
    uniq_labels, counts = np.unique(labels, return_counts=True)
    remap = {u: (li if c >= min_points else -1)
             for li, (u, c) in enumerate(zip(uniq_labels, counts))}
    return np.asarray([remap[l] for l in labels])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Planes:
    """Fitted plane set with padded member indices.

    Functional analogue of the reference ``Planes(Primitives)`` container
    (segmentation.py:95-123): ``params`` rows are [nx, ny, nz, d]; member
    points are fixed-shape (P, S) index matrices with -1 padding, so the
    per-plane feature recomputation stays jittable. Derived per-plane cov /
    eigvals are attached by ``compute_plane_features``.
    """

    params: jax.Array  # (P, 4)
    member_idx: jax.Array  # (P, S) int32, -1 padding
    member_weights: jax.Array  # (P, S) float
    cov: Optional[jax.Array] = None  # (P, 3, 3)
    eigvals: Optional[jax.Array] = None  # (P, 3)
    valid: Optional[jax.Array] = None  # (P,)
    mask: Optional[jax.Array] = None
    loss: Optional[jax.Array] = None

    @property
    def size(self):
        return self.params.shape[0]

    def __len__(self):
        return self.size

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    def distance(self, points: jax.Array) -> jax.Array:
        """Signed plane-point distances (segmentation.py:103-110):
        (N, 3) @ (3, P) + d."""
        return (
            jnp.matmul(points, self.params[:, :3].T,
                       precision=PPREC)
            + self.params[None, :, 3]
        )

    def orient(self, vps: jax.Array) -> "Planes":
        """Flip normals toward the mean viewpoint side
        (segmentation.py:113-119)."""
        mean_side = jnp.mean(
            jnp.sign(
                jnp.matmul(vps, self.params[:, :3].T,
                           precision=PPREC)
                + self.params[None, :, 3]
            ), axis=0
        )
        flip = jnp.where(mean_side < 0.0, -1.0, 1.0)
        return self.replace(params=self.params * flip[:, None])


def fit_planes(
    cloud,
    distance_threshold: float,
    min_support: int = 3,
    max_iterations: int = 1000,
    max_models: int = 10,
    eps: Optional[float] = None,
    seed: int = 135,
    verbose: int = 0,
) -> Planes:
    """Iterative fit-remove plane extraction
    (reference: segmentation.py:193-276): fit the best RANSAC plane on the
    remaining points, keep its largest contiguous cluster, remove it, repeat
    until support falls below ``min_support`` or ``max_models`` found.
    """
    if isinstance(cloud, Cloud):
        pts_all = np.asarray(cloud.get_points())
        valid_all = np.asarray(cloud.valid)
    else:
        pts_all = np.asarray(cloud, dtype=np.float64)
        valid_all = np.ones(len(pts_all), bool)
    pts_all = pts_all.astype(np.float32)

    remaining = valid_all.copy()
    planes: List[np.ndarray] = []
    supports: List[np.ndarray] = []
    for label in range(max_models):
        if remaining.sum() < min_support:
            break
        plane, support = fit_plane_ransac(
            pts_all,
            valid=jnp.asarray(remaining),
            distance_threshold=distance_threshold,
            max_iterations=max_iterations,
            seed=seed + label,
        )
        if len(support) < min_support:
            if verbose:
                print("Halt due to insufficient plane support.")
            break
        if eps:
            labels = cluster_voxel_graph(pts_all[support], eps, min_points=min(10, min_support))
            uniq, counts = np.unique(labels[labels >= 0], return_counts=True)
            if len(counts) == 0 or counts.max() < min_support:
                remaining[support] = False
                continue
            support = support[labels == uniq[counts.argmax()]]
        planes.append(plane)
        supports.append(support)
        remaining[support] = False
        if verbose:
            print(
                "Plane %d [%.3f %.3f %.3f %.3f], %d points."
                % (label, *plane, len(support))
            )

    if not planes:
        raise ValueError("No planes found with support >= %d" % min_support)

    s_max = max(len(s) for s in supports)
    s_max = -(-s_max // 8) * 8
    idx = np.full((len(planes), s_max), -1, np.int64)
    for i, s in enumerate(supports):
        idx[i, : len(s)] = s
    member_idx = jnp.asarray(idx, jnp.int32)
    weights = (member_idx >= 0).astype(jnp.float32)
    return Planes(
        params=jnp.asarray(np.stack(planes)),
        member_idx=member_idx,
        member_weights=weights,
        valid=jnp.ones(len(planes), bool),
    )


def plane_neighborhood_features(gcloud: Cloud, planes: Planes, model, cfg) -> Planes:
    """Differentiable plane-mode feature path (reference: preproc.py:218-243):
    member points take the PLANE normal for their incidence angle, the model
    corrects their depth, and the per-plane covariance/eigenvalues are
    recomputed from the corrected, posed points. One jittable program over
    the fixed-shape (P, S) member matrices.
    """
    from .ops.covs import weighted_cov
    from .ops.eigh3 import eigvals3
    from .ops.features import gather_neighbors

    idx = planes.member_idx
    vps = gather_neighbors(gcloud.vps, idx)  # (P, S, 3)
    dirs = gather_neighbors(gcloud.dirs, idx)
    depth = gather_neighbors(gcloud.depth, idx)
    normals = planes.params[:, None, :3]  # (P, 1, 3)
    cos = jnp.sum(dirs * normals, axis=-1)
    inc = jnp.arccos(jnp.clip(jnp.abs(cos), 0.0, 1.0))  # (P, S)
    if model is not None:
        depth = model.correct_depth(depth, inc)
    member_pts = vps + depth[..., None] * dirs
    cov = weighted_cov(member_pts, planes.member_weights)
    return planes.replace(cov=cov, eigvals=eigvals3(cov))


def compute_plane_features(planes: Planes, points: jax.Array) -> Planes:
    """Per-plane covariance and eigenvalues of member points
    (reference: preproc.py:218-243) — the plane-neighborhood analogue of the
    ball-neighborhood feature op; differentiable through ``points``.
    """
    from .ops.covs import weighted_cov
    from .ops.eigh3 import eigvals3
    from .ops.features import gather_neighbors

    member_pts = gather_neighbors(points, planes.member_idx)  # (P, S, 3)
    cov = weighted_cov(member_pts, planes.member_weights)
    return planes.replace(cov=cov, eigvals=eigvals3(cov))
