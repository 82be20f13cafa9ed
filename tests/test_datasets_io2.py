"""kitti360 / newer_college loaders and the PCD reader."""
import numpy as np


def test_pcd_reader_ascii_and_binary(tmp_path):
    from depth_correction_tpu.utils.pcd import read_pcd

    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (20, 3)).astype(np.float32)
    header = (
        "# .PCD v0.7\nVERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
        "COUNT 1 1 1\nWIDTH 20\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS 20\n"
    )
    ascii_path = tmp_path / "a.pcd"
    with open(ascii_path, "w") as f:
        f.write(header + "DATA ascii\n")
        for p in pts:
            f.write("%.6f %.6f %.6f\n" % tuple(p))
    out = read_pcd(str(ascii_path))
    np.testing.assert_allclose(out["x"], pts[:, 0], atol=1e-5)

    bin_path = tmp_path / "b.pcd"
    with open(bin_path, "wb") as f:
        f.write((header + "DATA binary\n").encode())
        f.write(pts.tobytes())
    out = read_pcd(str(bin_path))
    np.testing.assert_allclose(out["z"], pts[:, 2])


def test_kitti360_loader(tmp_path, monkeypatch):
    import depth_correction_tpu.datasets.kitti360 as k3

    monkeypatch.setattr(k3, "data_dir", str(tmp_path))
    drive = "2013_05_28_drive_0000_sync"
    (tmp_path / "data_3d_raw" / drive / "velodyne_points" / "data").mkdir(parents=True)
    (tmp_path / "data_poses" / drive).mkdir(parents=True)
    (tmp_path / "calibration").mkdir(parents=True)
    # cam->velo calibration: a fixed rigid transform.
    T_c2v = np.eye(4)
    T_c2v[:3, 3] = [0.1, -0.2, 0.3]
    (tmp_path / "calibration" / "calib_cam_to_velo.txt").write_text(
        " ".join("%.9f" % x for x in T_c2v[:3].ravel())
    )
    rng = np.random.default_rng(3)
    rows = []
    for i in range(4):
        # Include ego points (|x|,|y| < 1) that must be dropped.
        far = rng.uniform(2, 10, (30, 4)).astype(np.float32)
        ego = np.asarray([[0.1, 0.1, 0.0, 1.0]], np.float32)
        np.concatenate([far, ego]).tofile(
            tmp_path / "data_3d_raw" / drive / "velodyne_points" / "data" / ("%010d.bin" % i)
        )
        T = np.eye(4)
        T[:3, 3] = [i, 0, 0]
        rows.append("%d %s" % (i, " ".join("%.9f" % x for x in T.ravel())))
    (tmp_path / "data_poses" / drive / "cam0_to_world.txt").write_text("\n".join(rows))

    ds = k3.Dataset("kitti360/00_start_1_end_3_step_1")
    assert len(ds) == 2
    cloud, pose = ds[0]
    assert len(cloud) == 30  # ego point removed
    # zero_origin (the reference default, kitti360.py:259-261): the
    # WINDOW's first pose is identity, the second is relative to it.
    np.testing.assert_allclose(pose, np.eye(4), atol=1e-7)
    world = [np.eye(4) for _ in range(2)]
    world[0][:3, 3] = [1, 0, 0]
    world[1][:3, 3] = [2, 0, 0]
    world = [w @ np.linalg.inv(T_c2v) for w in world]
    _, pose1 = ds[1]
    np.testing.assert_allclose(
        pose1, np.linalg.inv(world[0]) @ world[1], atol=1e-7
    )

    raw = k3.Dataset("kitti360/00_start_1_end_3_step_1", zero_origin=False)
    _, pose_raw = raw[0]
    np.testing.assert_allclose(pose_raw, world[0], atol=1e-7)


def test_newer_college_loader(tmp_path, monkeypatch):
    import depth_correction_tpu.datasets.newer_college as nc

    monkeypatch.setattr(nc, "data_dir", str(tmp_path))
    seq = tmp_path / "01_short_experiment"
    (seq / "raw_format" / "ouster_scan").mkdir(parents=True)
    (seq / "ground_truth").mkdir(parents=True)

    rng = np.random.default_rng(4)
    rows = ["sec,nsec,x,y,z,qx,qy,qz,qw"]
    for i in range(3):
        pts = rng.uniform(-8, 8, (25, 3)).astype(np.float32)
        path = seq / "raw_format" / "ouster_scan" / ("cloud_%d_%09d.pcd" % (100 + i, 5))
        header = (
            "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
            "WIDTH 25\nHEIGHT 1\nPOINTS 25\nDATA binary\n"
        )
        with open(path, "wb") as f:
            f.write(header.encode())
            f.write(pts.tobytes())
        rows.append("%d,%d,%f,%f,%f,0,0,0,1" % (100 + i, 5, i, 0.0, 0.0))
    (seq / "ground_truth" / "registered_poses.csv").write_text("\n".join(rows) + "\n")

    ds = nc.Dataset("newer_college/01_short_experiment/start_0_end_3_step_1")
    assert len(ds) == 3
    cloud, pose = ds[1]
    assert "vp_x" in cloud.dtype.names
    # Beam-origin viewpoints sit ~15.8 mm from the axis, radially in xy.
    vp_r = np.hypot(cloud["vp_x"], cloud["vp_y"])
    np.testing.assert_allclose(vp_r, nc.BEAM_ORIGIN_OFFSET, rtol=1e-3)
    np.testing.assert_allclose(pose[0, 3], 1.0, atol=1e-9)


def test_lzf_decompress_backreferences_and_literals():
    """Handcrafted LZF streams: literal runs, short matches, and the
    length-7 extension byte with an overlapping (RLE-style) reference."""
    from depth_correction_tpu.utils.pcd import lzf_decompress

    # literal "abc", then a 9-byte overlapping match from offset 0:
    # ctrl 0xE0 = (7 << 5), ext 0x00 -> length 7 + 0 + 2 = 9, offset low 0x02
    # -> ref = 3 - 2 - 1 = 0.
    stream = bytes([0x02]) + b"abc" + bytes([0xE0, 0x00, 0x02])
    assert lzf_decompress(stream, 12) == b"abcabcabcabc"

    # Short match (no extension): "xy" + 4-byte match of offset 2.
    # ctrl = (2 << 5) | 0 = 0x40, low byte 0x01 -> ref = 2 - 1 - 1 = 0,
    # length 2 + 2 = 4.
    stream = bytes([0x01]) + b"xy" + bytes([0x40, 0x01])
    assert lzf_decompress(stream, 6) == b"xyxyxy"

    # Truncated output is a hard error, not silent corruption.
    import pytest

    with pytest.raises(ValueError):
        lzf_decompress(bytes([0x02]) + b"abc", 12)


def test_pcd_reader_binary_compressed(tmp_path):
    """binary_compressed PCD: LZF stream over the field-major (SoA) body,
    COUNT>1 channels expanded — matches the PCL writeBinaryCompressed
    layout the reference reads via Open3D/PCL."""
    import struct

    from depth_correction_tpu.utils.pcd import read_pcd

    rng = np.random.default_rng(7)
    n = 50
    x = rng.uniform(-5, 5, n).astype(np.float32)
    y = rng.uniform(-5, 5, n).astype(np.float32)
    z = rng.uniform(-5, 5, n).astype(np.float32)
    rings = np.tile(np.arange(2, dtype=np.uint16), (n, 1))  # COUNT=2 channel
    body = x.tobytes() + y.tobytes() + z.tobytes() + rings.tobytes()

    # Literal-only LZF encoding (runs of <= 32 bytes) is a valid stream.
    comp = bytearray()
    for i in range(0, len(body), 32):
        run = body[i : i + 32]
        comp += bytes([len(run) - 1]) + run
    header = (
        "# .PCD v0.7\nVERSION 0.7\nFIELDS x y z ring\nSIZE 4 4 4 2\n"
        "TYPE F F F U\nCOUNT 1 1 1 2\nWIDTH %d\nHEIGHT 1\n"
        "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS %d\nDATA binary_compressed\n"
        % (n, n)
    )
    path = tmp_path / "c.pcd"
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(struct.pack("<II", len(comp), len(body)))
        f.write(bytes(comp))

    out = read_pcd(str(path))
    np.testing.assert_allclose(out["x"], x)
    np.testing.assert_allclose(out["z"], z)
    np.testing.assert_array_equal(out["ring_0"], rings[:, 0])
    np.testing.assert_array_equal(out["ring_1"], rings[:, 1])
