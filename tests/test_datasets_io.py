"""Real-data loader format parsing, against miniature fixture files."""
import os

import numpy as np
import pytest


def write_asl_fixture(root, name="mini", n_scans=3, n_pts=50):
    seq = root / name
    (seq / "csv_local").mkdir(parents=True)
    (seq / "csv_global").mkdir(parents=True)
    rng = np.random.default_rng(0)
    poses = []
    for i in range(n_scans):
        pts = rng.uniform(-5, 5, (n_pts, 3))
        with open(seq / "csv_local" / ("Hokuyo_%d.csv" % i), "w") as f:
            f.write("timestamp, x, y, z, intensity\n")
            for p in pts:
                f.write("%.3f, %.6f, %.6f, %.6f, 1.0\n" % (i, *p))
        T = np.eye(4)
        T[:3, 3] = [i, 0.5 * i, 0.0]
        poses.append(T)
    from depth_correction_tpu.datasets.asl_laser import write_poses

    write_poses(range(n_scans), poses, str(seq / "csv_global" / "pose_scanner_leica.csv"))
    return poses


def test_asl_laser_loader(tmp_path, monkeypatch):
    import depth_correction_tpu.datasets.asl_laser as asl

    monkeypatch.setattr(asl, "data_dir", str(tmp_path))
    poses = write_asl_fixture(tmp_path)

    ds = asl.Dataset("asl_laser/mini")
    assert len(ds) == 3
    cloud, pose = ds[0]
    assert cloud.dtype.names == ("x", "y", "z")
    assert len(cloud) == 50
    np.testing.assert_allclose(pose, poses[0], atol=1e-8)
    # _step_ suffix subsamples.
    ds2 = asl.Dataset("mini_step_2")
    assert len(ds2) == 2
    # Slicing keeps protocol.
    assert len(ds[1:]) == 2
    assert str(ds) == "asl_laser/mini"


def test_fee_corridor_loader(tmp_path, monkeypatch):
    import depth_correction_tpu.datasets.fee_corridor as fee

    monkeypatch.setattr(fee, "data_dir", str(tmp_path))
    seq = tmp_path / "sequences" / "seq1"
    (seq / "static_ouster_points").mkdir(parents=True)
    (seq / "poses").mkdir(parents=True)
    rng = np.random.default_rng(1)
    n = 4
    with open(seq / "poses" / "static_poses.csv", "w") as f:
        f.write("id, ts, " + ", ".join("T%d%d" % (i, j) for i in range(4) for j in range(4)) + "\n")
        for i in range(n):
            T = np.eye(4)
            T[:3, 3] = [0.2 * i, 0, 0]
            f.write("%d, %.3f, %s\n" % (i, i, ", ".join("%.9f" % x for x in T.ravel())))
    for i in range(n):
        pts = rng.uniform(-3, 3, (30, 3))
        cloud = np.zeros(30, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                                    ("vp_x", "f4"), ("vp_y", "f4"), ("vp_z", "f4")])
        cloud["x"], cloud["y"], cloud["z"] = pts.T
        np.savez(seq / "static_ouster_points" / ("%d.npz" % i), cloud=cloud)

    ds = fee.Dataset("fee_corridor/seq1_start_0_end_3_step_1")
    assert len(ds) == 3
    cloud, pose = ds[1]
    assert "vp_x" in cloud.dtype.names
    np.testing.assert_allclose(pose[0, 3], 0.2, atol=1e-9)
    # zero_origin rebases the first pose to identity.
    ds0 = fee.Dataset("seq1", zero_origin=True)
    np.testing.assert_allclose(ds0.cloud_pose(ds0.ids[0]), np.eye(4), atol=1e-12)


def test_semantic_kitti_loader(tmp_path, monkeypatch):
    import depth_correction_tpu.datasets.semantic_kitti as sk

    monkeypatch.setattr(sk, "data_dir", str(tmp_path))
    seq = tmp_path / "sequences" / "08"
    (seq / "velodyne").mkdir(parents=True)
    rng = np.random.default_rng(2)
    n = 5
    rows = []
    for i in range(n):
        pts = rng.uniform(-10, 10, (40, 4)).astype(np.float32)
        pts.tofile(seq / "velodyne" / ("%06d.bin" % i))
        T = np.eye(4)
        T[:3, 3] = [i, 0, 0]
        rows.append(" ".join("%.9f" % x for x in T[:3].ravel()))
    (seq / "poses.txt").write_text("\n".join(rows) + "\n")

    ds = sk.Dataset("semantic_kitti/08_start_1_end_4_step_1")
    assert len(ds) == 3
    cloud, pose = ds[0]
    assert cloud.dtype.names == ("x", "y", "z")
    assert len(cloud) == 40
    # Poses are zero-origined on the sliced window (reference:
    # semantic_kitti.py:218-221): the window's first pose is identity and
    # the next is relative to it, both in the velodyne frame.
    np.testing.assert_allclose(pose, np.eye(4), atol=1e-8)
    world = []
    for i in (1, 2):
        T = np.eye(4)
        T[:3, 3] = [i, 0, 0]
        world.append(T @ sk.T_CAM2_TO_VELO)
    _, pose1 = ds[1]
    np.testing.assert_allclose(
        pose1, np.linalg.inv(world[0]) @ world[1], atol=1e-8
    )

    calib = seq / "calib.txt"
    calib.write_text("Tr: " + " ".join("%.6f" % x for x in np.eye(4)[:3].ravel()) + "\n")
    c = sk.read_calibration(str(calib))
    np.testing.assert_allclose(c["Tr"], np.eye(4))


def test_factory_resolves_real_loaders(tmp_path, monkeypatch):
    import depth_correction_tpu.datasets.asl_laser as asl
    from depth_correction_tpu.datasets import create_dataset, dataset_by_name

    assert dataset_by_name("asl_laser/eth") is asl.Dataset
    monkeypatch.setattr(asl, "data_dir", str(tmp_path))
    write_asl_fixture(tmp_path)

    from depth_correction_tpu.config import Config

    cfg = Config()
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.0, 100.0, 0.0
    cfg.depth_bias_model_kwargs = {"w": [0.0], "exponent": [4.0]}
    ds = create_dataset("asl_laser/mini", cfg)
    cloud, pose = ds[0]
    assert len(cloud) == 50


def test_pathlock_concurrent_appends(tmp_path):
    import threading

    from depth_correction_tpu.utils.io import append

    path = str(tmp_path / "shared.csv")
    n_threads, n_writes = 8, 20

    def worker(tid):
        for i in range(n_writes):
            append(path, "t%d_%d\n" % (tid, i))

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    lines = open(path).read().strip().splitlines()
    assert len(lines) == n_threads * n_writes
    assert len(set(lines)) == n_threads * n_writes


@pytest.mark.slow
def test_asl_laser_end_to_end_training(tmp_path, monkeypatch):
    """Real-data-format path end to end: an asl_laser-format fixture (CSV
    scans + Leica pose file) of a planar scene with an injected bias flows
    loader -> wrappers -> trainer, and the recovered weight moves toward
    the injected value."""
    import jax.numpy as jnp

    import depth_correction_tpu.datasets.asl_laser as asl
    from depth_correction_tpu.config import Config
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.datasets.asl_laser import write_poses
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.train import make_loss_fn, make_optimizer, prepare_sequences

    monkeypatch.setattr(asl, "data_dir", str(tmp_path))

    # Planar scene sampled from 4 elevated, shifted viewpoints, stored in
    # the ASL on-disk format (sensor-frame CSV points, global pose file).
    rng = np.random.default_rng(0)
    seq = tmp_path / "plane"
    (seq / "csv_local").mkdir(parents=True)
    (seq / "csv_global").mkdir(parents=True)
    poses = []
    for i in range(4):
        world = np.stack(
            [rng.uniform(-4, 4, 900), rng.uniform(-4, 4, 900), np.zeros(900)],
            axis=1,
        )
        T = np.eye(4)
        T[:3, 3] = [0.7 * i, 0.4 * i, 1.6]
        local = (world - T[:3, 3]) @ T[:3, :3]
        with open(seq / "csv_local" / ("Hokuyo_%d.csv" % i), "w") as f:
            f.write("timestamp, x, y, z, intensity\n")
            for p in local:
                f.write("%.3f, %.6f, %.6f, %.6f, 1.0\n" % (i, *p))
        poses.append(T)
    write_poses(range(4), poses, str(seq / "csv_global" / "pose_scanner_leica.csv"))

    cfg = Config()
    cfg.float_type = "float32"
    cfg.dataset = "asl_laser"
    cfg.train_names = ["asl_laser/plane"]
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.5, 20.0, 0.2
    cfg.nn_r, cfg.nn_k = 0.4, 0
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = []
    cfg.min_valid_neighbors = 3
    cfg.depth_bias_model_kwargs = {"w": [-0.004], "exponent": [4.0]}
    cfg.loss_kwargs = {"sqrt": False, "normalization": False}
    cfg.lr = 4e-3

    ds = create_dataset(cfg.train_names[0], cfg)
    data = prepare_sequences([ds], cfg)
    loss_fn = make_loss_fn(cfg)
    params = {"model": ScaledPolynomial(w=jnp.zeros(1), exponent=jnp.asarray([4.0]))}
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    import jax
    import optax

    @jax.jit
    def step(params, opt_state, data):
        loss, grads = jax.value_and_grad(loss_fn)(params, data)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    l0 = float(loss_fn(params, data))
    for _ in range(40):
        loss, params, opt_state = step(params, opt_state, data)
    assert float(loss) < l0
    w = float(np.asarray(params["model"].w).ravel()[0])
    assert w < -1e-3  # moving toward the injected -0.004
