"""Synthetic datasets with known geometry and analytic normals.

These are the framework's integration-test fixtures, as in the reference
(reference: src/depth_correction/dataset.py:39-414): deterministic per-id
RNG, exact ground-truth normals, and simple scenes (ground plane, open box,
plane pair at a dihedral angle) whose map-consistency optimum is known.
"""
from __future__ import annotations

from copy import copy
from typing import Optional

import numpy as np
from numpy.lib.recfunctions import merge_arrays, unstructured_to_structured

from ..ops import se3

__all__ = [
    "AngleDataset",
    "BaseDataset",
    "GroundPlaneDataset",
    "OpenBoxDataset",
    "PlaneDataset",
    "box_point_cloud",
    "make_structured",
]


def make_structured(pts: np.ndarray, normals: Optional[np.ndarray] = None,
                    vps: Optional[np.ndarray] = None) -> np.ndarray:
    """Pack points (+ normals, viewpoints) into the structured-array
    interchange format."""
    parts = [unstructured_to_structured(np.asarray(pts, np.float64), names=["x", "y", "z"])]
    if vps is not None:
        parts.append(
            unstructured_to_structured(np.asarray(vps, np.float64),
                                       names=["vp_x", "vp_y", "vp_z"])
        )
    if normals is not None:
        parts.append(
            unstructured_to_structured(np.asarray(normals, np.float64),
                                       names=["normal_x", "normal_y", "normal_z"])
        )
    return merge_arrays(parts, flatten=True)


def transform_structured(T: np.ndarray, arr: np.ndarray) -> np.ndarray:
    """Rigid-transform x/y/z (+vp_*, Rt) and normal_* (R only) fields
    (reference: utils.py:220-238)."""
    from numpy.lib.recfunctions import structured_to_unstructured as s2u

    arr = arr.copy()
    names = arr.dtype.names
    for fields, op in [
        (["x", "y", "z"], "Rt"),
        (["vp_x", "vp_y", "vp_z"], "Rt"),
        (["normal_x", "normal_y", "normal_z"], "R"),
    ]:
        if fields[0] not in names:
            continue
        x = s2u(arr[fields])
        if op == "Rt":
            x = x @ T[:3, :3].T + T[:3, 3]
        else:
            x = x @ T[:3, :3].T
        arr[fields] = unstructured_to_structured(x, names=fields)
    return arr


def euler_matrix(ax: float, ay: float, az: float) -> np.ndarray:
    """4x4 homogeneous rotation from extrinsic xyz Euler angles."""
    from scipy.spatial.transform import Rotation

    T = np.eye(4)
    T[:3, :3] = Rotation.from_euler("xyz", [ax, ay, az]).as_matrix()
    return T


def box_point_cloud(
    size=(1.0, 1.0, 0.0), density: float = 100.0, rng: Optional[np.random.Generator] = None
) -> np.ndarray:
    """Uniform random points on an axis-aligned box patch centered at the
    origin; ``density`` points per unit area/volume of the nonzero extents.
    """
    rng = rng or np.random.default_rng(135)
    size = np.asarray(size, np.float64)
    measure = np.prod(size[size > 0.0]) if np.any(size > 0.0) else 1.0
    n = max(int(density * measure), 1)
    pts = size * (rng.uniform(size=(n, 3)) - 0.5)
    return pts


class _DatasetBase:
    """Shared protocol plumbing: ids, indexing, slicing, iteration."""

    ids: list

    def local_cloud(self, i) -> np.ndarray:
        raise NotImplementedError

    def cloud_pose(self, i) -> np.ndarray:
        raise NotImplementedError

    def __getitem__(self, i):
        if isinstance(i, (int, np.integer)):
            idx = self.ids[i]
            return self.local_cloud(idx), self.cloud_pose(idx)
        ds = copy(self)
        if isinstance(i, (list, tuple)):
            ds.ids = [self.ids[j] for j in i]
        else:
            ds.ids = self.ids[i]
        return ds

    def __len__(self):
        return len(self.ids)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def __str__(self):
        return type(self).__name__


class GroundPlaneDataset(_DatasetBase):
    """n viewpoints sliding along a ground plane
    (reference: dataset.py:39-103)."""

    def __init__(self, name=None, n=10, size=(5.0, 5.0, 0.0), step=1.0,
                 height=1.0, density=100.0, **_unused):
        if name:
            parts = name.split("/")
            if len(parts) == 2 and parts[0] == "ground_plane":
                n = int(parts[1])
        self.n = n
        self.size = size
        self.step = step
        self.height = height
        self.density = density
        self.ids = list(range(n))

    def local_cloud(self, i):
        rng = np.random.default_rng(i)
        pts = box_point_cloud(size=self.size, density=self.density, rng=rng)
        pts[:, 2] -= self.height
        normals = np.zeros_like(pts)
        normals[:, 2] = 1.0
        return make_structured(pts, normals)

    def cloud_pose(self, i):
        pose = np.eye(4)
        pose[0, 3] = i * self.step
        pose[2, 3] = self.height
        return pose


class OpenBoxDataset(_DatasetBase):
    """Three-walled box viewed from a circle of jittered poses
    (reference: dataset.py:106-237). Name-encoded parameters:
    ``open_box/n_6_size_10_10_5_height_1_density_25.0``.
    """

    def __init__(self, name=None, n=None, size=None, height=None, density=None,
                 **_unused):
        if name:
            parts = name.split("/")
            if len(parts) == 2 and parts[0] == "open_box":
                tokens = parts[1].split("_")
                if "n" in tokens:
                    n = int(tokens[tokens.index("n") + 1])
                if "size" in tokens:
                    i = tokens.index("size")
                    size = [float(s) for s in tokens[i + 1 : i + 4]]
                if "height" in tokens:
                    height = float(tokens[tokens.index("height") + 1])
                if "density" in tokens:
                    density = float(tokens[tokens.index("density") + 1])
        self.n = n if n is not None else 10
        self.size = tuple(size) if size is not None else (10.0, 10.0, 5.0)
        self.height = height if height is not None else 1.0
        self.density = density if density is not None else 100.0
        self.ids = list(range(self.n))

    def local_cloud(self, i):
        rng = np.random.default_rng(i)
        sx, sy, sz = self.size
        pts, normals = [], []
        # Ground plane + two walls (-y, -x), like the reference scene.
        for patch, offset, normal in [
            ((sx, sy, 0.0), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0)),
            ((sx, 0.0, sz), (0.0, -sy / 2, sz / 2), (0.0, 1.0, 0.0)),
            ((0.0, sy, sz), (-sx / 2, 0.0, sz / 2), (1.0, 0.0, 0.0)),
        ]:
            p = box_point_cloud(size=patch, density=self.density, rng=rng)
            p += np.asarray(offset)
            pts.append(p)
            normals.append(np.tile(np.asarray(normal), (len(p), 1)))
        arr = make_structured(np.concatenate(pts), np.concatenate(normals))
        T_inv = np.asarray(se3.transform_inv(self.cloud_pose(i)))
        return transform_structured(T_inv, arr)

    def cloud_pose(self, i):
        rng = np.random.default_rng(i)
        a = i * 2 * np.pi / self.n
        e = 0.1 * rng.uniform(size=3)
        e[2] += a
        pose = euler_matrix(*e)
        pose[:3, 3] = [
            np.cos(a) * self.size[0] / 3,
            np.sin(a) * self.size[1] / 3,
            self.height,
        ]
        pose[:3, 3] += 0.1 * rng.uniform(size=3)
        return pose

    def __str__(self):
        return "open_box/n_%i_size_%g_%g_%g_height_%g_density_%g" % (
            (self.n,) + self.size + (self.height, self.density)
        )


class BaseDataset(_DatasetBase):
    """A global random cloud subsampled per pose
    (reference: dataset.py:240-317)."""

    def __init__(self, name=None, n_pts=10_000, n_poses=5, height=2.0,
                 size=((-10.0, 10.0), (-10.0, 10.0), (-10.0, 10.0)), **_unused):
        self.name = name
        self.n_pts = n_pts
        self.n_poses = n_poses
        self.height = height
        self.size = size
        self.pts = None
        self.normals = None
        self.ids = list(range(n_poses))

    def local_cloud(self, i):
        assert self.pts is not None
        rng = np.random.default_rng(i)
        sel = rng.choice(self.n_pts, size=self.n_pts // self.n_poses, replace=False)
        arr = make_structured(self.pts[sel], self.normals[sel])
        T_inv = np.asarray(se3.transform_inv(self.cloud_pose(i)))
        return transform_structured(T_inv, arr)

    def cloud_pose(self, i):
        rng = np.random.default_rng(i)
        pose = np.eye(4)
        for axis in range(2):
            pose[axis, 3] = rng.uniform(
                0.6 * self.size[axis][0], 0.6 * self.size[axis][1]
            )
        pose[2, 3] = self.height
        return pose


class PlaneDataset(BaseDataset):
    """Two flat half-planes in z = 0 (reference: dataset.py:320-358)."""

    def __init__(self, name="plane", n_pts=10_000, n_poses=2,
                 size=((-10.0, 10.0), (-10.0, 10.0), (-10.0, 10.0)), seed=135,
                 **_unused):
        super().__init__(name=name, n_pts=n_pts, n_poses=n_poses, size=size)
        rng = np.random.default_rng(seed)
        pts = np.zeros((n_pts, 3))
        half = n_pts // 2
        pts[:half, :2] = rng.uniform(0, size[0][1], size=(half, 2))
        pts[half:, :2] = rng.uniform(0, size[1][1], size=(n_pts - half, 2)) + np.array(
            [size[0][0], 0.0]
        )
        normals = np.zeros_like(pts)
        normals[:, 2] = 1.0
        self.pts = pts
        self.normals = normals


class AngleDataset(PlaneDataset):
    """Two planes meeting at a dihedral angle (reference: dataset.py:361-414)."""

    def __init__(self, name="angle", n_pts=10_000, n_poses=5,
                 size=((-10.0, 10.0), (-10.0, 10.0), (-10.0, 10.0)),
                 degrees=60.0, seed=135, **_unused):
        if isinstance(name, str) and "/" in name:
            degrees = float(name.split("/")[1])
        super().__init__(name=name, n_pts=n_pts, n_poses=n_poses, size=size, seed=seed)
        self.degrees = degrees
        if degrees != 0.0:
            angle = np.deg2rad(degrees)
            R = np.array(
                [
                    [np.cos(angle), 0.0, np.sin(angle)],
                    [0.0, 1.0, 0.0],
                    [-np.sin(angle), 0.0, np.cos(angle)],
                ]
            )
            half = self.n_pts // 2
            self.pts[half:] = self.pts[half:] @ R.T
            self.normals[half:] = self.normals[half:] @ R.T
