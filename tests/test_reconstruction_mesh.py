"""TSDF + marching tetrahedra surface reconstruction and the 3-D viewer."""
import os

import numpy as np

from depth_correction_tpu.reconstruction import (
    cloud_to_mesh,
    marching_tetrahedra,
    save_mesh_obj,
    tsdf_from_cloud,
)


def sphere_cloud(n=4000, radius=1.0, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return radius * v, v  # points, outward normals


def test_marching_tetrahedra_on_analytic_sphere():
    """Analytic sphere SDF: extracted vertices sit on the radius."""
    res = 0.1
    ax = np.arange(-1.5, 1.5 + res, res)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    sdf = np.sqrt(gx**2 + gy**2 + gz**2) - 1.0
    verts, faces = marching_tetrahedra(sdf, None, np.full(3, ax[0]), res)
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=1)
    # First-order interpolation on a 0.1 grid: radius error well under res.
    assert abs(r.mean() - 1.0) < 0.02
    assert r.std() < 0.02
    assert faces.min() >= 0 and faces.max() < len(verts)


def test_marching_tetrahedra_winding_globally_consistent():
    """Every face normal (from winding) points OUTWARD on a sphere — the
    2-2 quad case included (winding-derived normals must be usable when the
    mesh feeds back into the renderer; reference depth_cloud.py:655-682
    delegates this guarantee to Open3D Poisson)."""
    res = 0.1
    ax = np.arange(-1.5, 1.5 + res, res)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    sdf = np.sqrt(gx**2 + gy**2 + gz**2) - 1.0
    verts, faces = marching_tetrahedra(sdf, None, np.full(3, ax[0]), res)
    tri = verts[faces]  # (F, 3, 3)
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    centroid = tri.mean(axis=1)  # outward direction on a centered sphere
    dots = np.sum(n * centroid, axis=1)
    assert (dots > 0).all(), "%d of %d faces wound inward" % (
        (dots <= 0).sum(), len(dots)
    )


def test_cloud_to_mesh_sphere():
    """Reconstruct a sphere from an oriented cloud (the to_mesh role)."""
    pts, normals = sphere_cloud()
    verts, faces = cloud_to_mesh(pts, normals, grid_res=0.12)
    assert len(faces) > 50
    r = np.linalg.norm(verts, axis=1)
    assert abs(np.median(r) - 1.0) < 0.06


def test_tsdf_signs():
    pts, normals = sphere_cloud()
    sdf, valid, origin = tsdf_from_cloud(pts, normals, grid_res=0.15)
    # A voxel near the centerline inside the sphere has negative sdf where
    # valid; outside positive.
    dims = sdf.shape
    centers = origin + 0.15 * np.stack(
        np.meshgrid(*[np.arange(d) for d in dims], indexing="ij"), -1
    )
    r = np.linalg.norm(centers.reshape(-1, 3), axis=1)
    s = sdf.ravel()
    v = valid.ravel()
    inside = v & (r < 0.9)
    outside = v & (r > 1.1)
    assert (s[inside] < 0).mean() > 0.95
    assert (s[outside] > 0).mean() > 0.95


def test_mesh_obj_roundtrip(tmp_path):
    """Saved OBJ loads through the mesh dataset IO."""
    from depth_correction_tpu.utils.mesh import load_mesh

    pts, normals = sphere_cloud(1500)
    verts, faces = cloud_to_mesh(pts, normals, grid_res=0.15)
    path = str(tmp_path / "sphere.obj")
    save_mesh_obj(path, verts, faces)
    v2, f2 = load_mesh(path)
    assert len(v2) == len(verts) and len(f2) == len(faces)
    np.testing.assert_allclose(v2, verts, rtol=1e-6)


def test_plot_cloud_poses(tmp_path):
    from depth_correction_tpu.visualization import plot_cloud_poses

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(3000, 3))
    poses = np.tile(np.eye(4), (4, 1, 1))
    poses[:, 0, 3] = np.arange(4)
    out = str(tmp_path / "view.png")
    plot_cloud_poses(pts, poses, path=out)
    assert os.path.getsize(out) > 10_000
