"""Dataset aux tooling: PLY IO, kitti360 dynamic-object removal,
newer_college GT prior map — on synthetic fixtures (no downloads)."""
import os

import numpy as np
import pytest
from numpy.lib.recfunctions import (
    structured_to_unstructured as s2u,
    unstructured_to_structured as u2s,
)

from depth_correction_tpu.utils.ply import read_ply_structured, write_ply_points


@pytest.mark.parametrize("binary", [True, False])
def test_ply_roundtrip(binary, tmp_path):
    rng = np.random.default_rng(0)
    arr = np.zeros(
        50,
        np.dtype(
            [("x", "f4"), ("y", "f4"), ("z", "f4"), ("red", "u1"), ("semantic", "i4")]
        ),
    )
    arr["x"], arr["y"], arr["z"] = rng.normal(size=(3, 50)).astype(np.float32)
    arr["red"] = rng.integers(0, 255, 50)
    arr["semantic"] = rng.integers(0, 40, 50)
    path = str(tmp_path / "pts.ply")
    write_ply_points(path, arr, binary=binary)
    back = read_ply_structured(path)
    assert back.dtype.names == arr.dtype.names
    for name in arr.dtype.names:
        np.testing.assert_allclose(back[name], arr[name], rtol=1e-6)


def _fake_kitti360(tmp_path, n_scans=3, n_pts=200):
    """Minimal kitti360 layout: raw scans, identity-ish poses, calibration,
    and one dynamic window covering all frames."""
    from depth_correction_tpu.utils.ply import write_ply_points

    root = str(tmp_path / "kitti360")
    drive = "2013_05_28_drive_0000_sync"
    scan_dir = os.path.join(root, "data_3d_raw", drive, "velodyne_points", "data")
    os.makedirs(scan_dir)
    os.makedirs(os.path.join(root, "calibration"))
    os.makedirs(os.path.join(root, "data_poses", drive))
    # cam->velo identity calibration.
    np.savetxt(
        os.path.join(root, "calibration", "calib_cam_to_velo.txt"),
        np.eye(4)[:3].reshape(1, -1),
    )
    rng = np.random.default_rng(0)
    poses = []
    static_world = rng.uniform(3.0, 8.0, (n_scans, n_pts, 3))
    dynamic_world = rng.uniform(-8.0, -3.0, (40, 3))
    for i in range(n_scans):
        T = np.eye(4)
        T[:3, 3] = [0.1 * i, 0.0, 0.0]
        poses.append(np.concatenate([[i], T.reshape(-1)]))
        T_inv = np.linalg.inv(T)
        # Scan = static surface + a few dynamic points, in the lidar frame.
        world = np.concatenate([static_world[i], dynamic_world[:10] + 0.01 * i])
        local = world @ T_inv[:3, :3].T + T_inv[:3, 3]
        raw = np.concatenate(
            [local, np.ones((len(local), 1))], axis=1
        ).astype(np.float32)
        raw.tofile(os.path.join(scan_dir, "%010d.bin" % i))
    np.savetxt(os.path.join(root, "data_poses", drive, "cam0_to_world.txt"),
               np.stack(poses))
    # Dynamic window covering frames [0, n_scans).
    dyn_dir = os.path.join(root, "data_3d_semantics", "train", drive, "dynamic")
    os.makedirs(dyn_dir)
    arr = u2s(
        np.concatenate(
            [dynamic_world + 0.01 * i for i in range(n_scans)]
        ).astype(np.float32),
        names=["x", "y", "z"],
    )
    write_ply_points(
        os.path.join(dyn_dir, "%010d_%010d.ply" % (0, n_scans)), arr
    )
    return root


def test_kitti360_dynamic_object_removal(tmp_path):
    from depth_correction_tpu.datasets.kitti360 import (
        Dataset,
        dynamic_points_mask,
        remove_dynamic_objects,
    )

    root = _fake_kitti360(tmp_path)
    ds = Dataset("00", path=root, filter_ego_pts_depth=None)
    assert len(ds.ids) == 3

    dyn, ranges = ds.get_dynamic_points()
    assert len(dyn) == 1 and ranges == [[0, 3]]
    assert dyn[0].shape[1] == 3

    out = remove_dynamic_objects(ds, dist_th=0.2)
    for i in ds.ids:
        raw = np.fromfile(os.path.join(out, "%010d.bin" % i), np.float32)
        raw = raw.reshape(-1, 4)
        # All 10 dynamic points dropped, all 200 static kept.
        assert len(raw) == 200
        pose = ds.cloud_pose(i)
        world = raw[:, :3] @ pose[:3, :3].T + pose[:3, 3]
        assert not dynamic_points_mask(world, dyn[0], 0.2).any()

    # The loader's filtered_scans mode reads the output.
    ds_f = Dataset("00", path=root, filtered_scans=True, filter_ego_pts_depth=None)
    cloud, _ = ds_f[0]
    assert len(cloud) == 200


def test_kitti360_semantic_label_transfer(tmp_path):
    from depth_correction_tpu.datasets.kitti360 import (
        Dataset,
        transfer_semantic_labels,
    )
    from depth_correction_tpu.utils.ply import write_ply_points

    root = _fake_kitti360(tmp_path)
    ds = Dataset("00", path=root, filter_ego_pts_depth=None)

    # Static semantic window: the static surface points labeled semantic 11,
    # in the world frame of scan 0 (scan poses shift 0.1m/frame; dist_th
    # must absorb that for this fixture — use the scan-0 world points).
    rng = np.random.default_rng(0)
    static_world = rng.uniform(3.0, 8.0, (3, 200, 3))  # same seed as fixture
    drive = "2013_05_28_drive_0000_sync"
    stat_dir = os.path.join(root, "data_3d_semantics", "train", drive, "static")
    os.makedirs(stat_dir)
    pts = np.concatenate([static_world[i] for i in range(3)]).astype(np.float32)
    arr = np.zeros(
        len(pts), np.dtype([("x", "f4"), ("y", "f4"), ("z", "f4"),
                            ("semantic", "i4")])
    )
    arr["x"], arr["y"], arr["z"] = pts.T
    arr["semantic"] = 11
    write_ply_points(os.path.join(stat_dir, "%010d_%010d.ply" % (0, 3)), arr)

    out = transfer_semantic_labels(ds, dist_th=0.05)
    for k, i in enumerate(ds.ids):
        labels = np.fromfile(
            os.path.join(out, "labels", "%010d.label" % i), np.uint16
        )
        raw = np.fromfile(
            os.path.join(out, "velodyne", "%010d.bin" % i), np.float32
        ).reshape(-1, 4)
        assert len(labels) == len(raw) == 210
        # The 200 static points hit label 11; the 10 dynamic points stay 0.
        assert (labels[:200] == 11).all()
        assert (labels[200:] == 0).all()


def test_newer_college_gt_prior_map(tmp_path):
    from depth_correction_tpu.datasets import newer_college as nc
    from depth_correction_tpu.utils.ply import write_ply_points

    root = str(tmp_path / "newer_college")
    seq_dir = os.path.join(root, "01_short_experiment")
    os.makedirs(os.path.join(seq_dir, "ground_truth"))
    os.makedirs(os.path.join(root, "03_new_college_prior_map"))

    # Poses CSV: first pose translated by t0, identity rotation.
    t0 = np.asarray([2.0, -1.0, 0.5])
    rows = ["sec,nsec,x,y,z,qx,qy,qz,qw"]
    for i in range(3):
        rows.append("%d,%d,%g,%g,%g,0,0,0,1" % (i, 0, t0[0] + i, t0[1], t0[2]))
    with open(os.path.join(seq_dir, "ground_truth", "registered_poses.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")

    # Prior map: a dense line of points, duplicated within voxels.
    pts = np.repeat(np.linspace(0, 5, 30)[:, None], 2, axis=0) * [1, 0, 0]
    arr = u2s(np.asarray(pts, np.float32), names=["x", "y", "z"])
    write_ply_points(
        os.path.join(
            root, "03_new_college_prior_map",
            "new-college-29-01-2020-1cm-resolution-libpmfiltered.ply",
        ),
        arr,
    )

    monkey = nc.data_dir
    try:
        nc.data_dir = root
        ds = nc.Dataset("01_short_experiment", path=seq_dir)
        gt = ds.get_ground_truth_cloud(voxel_size=0.3)
    finally:
        nc.data_dir = monkey
    # Transformed into the first-pose frame: the map shifts by -t0.
    assert gt.shape[1] == 3
    assert abs(gt[:, 0].min() - (0 - t0[0])) < 0.2
    np.testing.assert_allclose(gt[:, 1], -t0[1], atol=1e-6)
    # Voxel downsampling removed the duplicates.
    assert len(gt) < 60
