"""Mesh IO, surface sampling, and the mesh dataset."""
import numpy as np
import pytest

from depth_correction_tpu.utils.mesh import load_mesh, sample_points_from_mesh

CUBE_VERTS = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
     [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float
)
CUBE_FACES = np.array(
    [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
     [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
     [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]]
)


def write_obj(path):
    with open(path, "w") as f:
        for v in CUBE_VERTS:
            f.write("v %f %f %f\n" % tuple(v))
        for face in CUBE_FACES:
            f.write("f %d %d %d\n" % tuple(face + 1))


def write_ply_binary(path):
    import struct

    with open(path, "wb") as f:
        f.write(
            (
                "ply\nformat binary_little_endian 1.0\n"
                "element vertex 8\nproperty float x\nproperty float y\n"
                "property float z\nelement face 12\n"
                "property list uchar int vertex_indices\nend_header\n"
            ).encode()
        )
        f.write(CUBE_VERTS.astype("<f4").tobytes())
        for face in CUBE_FACES:
            f.write(struct.pack("<B3i", 3, *face))


@pytest.mark.parametrize("writer,ext", [(write_obj, "obj"), (write_ply_binary, "ply")])
def test_load_mesh_roundtrip(tmp_path, writer, ext):
    path = str(tmp_path / ("cube.%s" % ext))
    writer(path)
    verts, faces = load_mesh(path)
    np.testing.assert_allclose(verts, CUBE_VERTS)
    assert faces.shape == (12, 3)


def test_sampling_area_weighted_on_surface(tmp_path):
    path = str(tmp_path / "cube.obj")
    write_obj(path)
    verts, faces = load_mesh(path)
    pts, normals = sample_points_from_mesh(verts, faces, 5000,
                                           rng=np.random.default_rng(0))
    # On the unit-cube surface: each point has at least one coord at 0 or 1.
    on_face = np.isclose(pts, 0.0, atol=1e-9) | np.isclose(pts, 1.0, atol=1e-9)
    assert on_face.any(axis=1).all()
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-9)
    # Uniform area => each of the 6 faces gets ~1/6 of samples.
    for axis in range(3):
        for val in (0.0, 1.0):
            frac = np.isclose(pts[:, axis], val, atol=1e-9).mean()
            assert 0.1 < frac < 0.25


def test_mesh_dataset(tmp_path):
    path = str(tmp_path / "scene.obj")
    with open(path, "w") as f:
        # 20 x 20 ground plane at z = 0.
        f.write("v -10 -10 0\nv 10 -10 0\nv 10 10 0\nv -10 10 0\n")
        f.write("f 1 2 3\nf 1 3 4\n")

    from depth_correction_tpu.datasets import create_dataset, dataset_by_name
    from depth_correction_tpu.datasets.mesh import MeshDataset

    assert dataset_by_name(path) is MeshDataset
    from depth_correction_tpu.config import Config

    cfg = Config()
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.0, 100.0, 0.0
    cfg.dataset_kwargs = {"n_pts_to_sample": 20000, "n_poses": 4}
    cfg.depth_bias_model_kwargs = {"w": [0.0], "exponent": [4.0]}
    ds = create_dataset(path, cfg)
    assert len(ds) == 4
    cloud, pose = ds[0]
    assert len(cloud) > 1000
    assert "normal_x" in cloud.dtype.names
    assert pose.shape == (4, 4)
