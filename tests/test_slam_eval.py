"""In-framework ICP alignment / odometry evaluation."""
import os

import pytest
import numpy as np
import jax.numpy as jnp

from depth_correction_tpu.config import Config
from depth_correction_tpu.datasets import create_dataset
from depth_correction_tpu.ops.se3 import xyz_axis_angle_to_matrix
from depth_correction_tpu.preproc import local_feature_cloud
from depth_correction_tpu.slam_eval import icp_align, perturb_odometry


def box_cfg():
    cfg = Config()
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.1, 30.0, 0.3
    cfg.nn_r, cfg.nn_k = 0.6, 0
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = []
    cfg.min_valid_neighbors = 3
    cfg.depth_bias_model_kwargs = {"w": [0.0], "exponent": [4.0]}
    return cfg


@pytest.mark.slow
def test_icp_align_recovers_known_offset():
    cfg = box_cfg()
    ds = create_dataset("open_box/n_4_size_10_10_5_height_1_density_60", cfg,
                        noisy=False)
    scan, pose = ds[0]
    cloud = local_feature_cloud(scan, cfg)
    target = cloud.transform(jnp.asarray(pose)).with_points()

    offset = xyz_axis_angle_to_matrix(
        jnp.asarray([0.05, -0.04, 0.03, 0.01, -0.008, 0.012])
    )
    T_true = jnp.asarray(pose) @ offset
    # Source: same scan, but its true world pose differs by `offset`;
    # start ICP from the unoffset pose and recover T_true.
    T_est, err = icp_align(cloud, target, T0=T_true, n_iters=0)
    # sanity: zero iterations keep the prior
    np.testing.assert_allclose(np.asarray(T_est), np.asarray(T_true), atol=1e-7)

    T_est, err = icp_align(cloud, target, T0=T_true, n_iters=8)
    # Aligning the identical geometry: estimate should converge to `pose`.
    delta = np.asarray(T_est) @ np.linalg.inv(np.asarray(pose))
    np.testing.assert_allclose(delta[:3, 3], 0.0, atol=0.02)
    np.testing.assert_allclose(delta[:3, :3], np.eye(3), atol=0.02)
    assert float(err) < 0.01


def test_slam_mapper_reduces_odometry_drift():
    """Scan-to-map ICP pulls a noisy odometry chain back toward ground
    truth (the norlab-mapper role, in-framework)."""
    from depth_correction_tpu.metrics import localization_errors
    from depth_correction_tpu.slam_eval import slam_mapper

    cfg = box_cfg()
    ds = create_dataset("open_box/n_6_size_10_10_5_height_1_density_80", cfg,
                        noisy=False)
    clouds, poses = [], []
    for scan, pose in ds:
        clouds.append(local_feature_cloud(scan, cfg))
        poses.append(np.asarray(pose))
    poses = np.stack(poses)
    odom = perturb_odometry(poses, [1e-5, 1e-5, 1e-5, 4e-3, 4e-3, 4e-3], seed=3)

    _, odom_t, _, _ = localization_errors(jnp.asarray(poses), jnp.asarray(odom))
    est = slam_mapper(clouds, odom, map_voxel=0.3, map_capacity=1 << 15)
    _, est_t, _, _ = localization_errors(jnp.asarray(poses), jnp.asarray(est))
    assert float(jnp.mean(est_t)) < 0.6 * float(jnp.mean(odom_t))


def test_eval_slam_mapper_csvs(tmp_path):
    """eval_slam with the default icp_mapper writes the reference-schema
    CSVs (scripts/robot_data:186-204)."""
    import os

    from depth_correction_tpu.config import slam_eval_csv, slam_poses_csv
    from depth_correction_tpu.slam_eval import eval_slam

    cfg = box_cfg()
    cfg.test_names = ["open_box/n_4_size_10_10_5_height_1_density_50"]
    cfg.odom_cov = [1e-6, 1e-6, 1e-6, 1e-4, 1e-4, 1e-4]
    cfg.log_dir = str(tmp_path)
    cfg.slam_eval_csv = slam_eval_csv(cfg.log_dir, cfg.slam)
    cfg.slam_poses_csv = slam_poses_csv(cfg.log_dir, "", cfg.slam)
    results = eval_slam(cfg, apply_correction=False)
    assert len(results) == 1
    stats = next(iter(results.values()))
    assert all(np.isfinite(s) for s in stats)
    rows = open(cfg.slam_eval_csv).read().strip().splitlines()
    assert len(rows) == 1 and len(rows[0].split()) == 5
    # Poses use the robot_data schema (poseId, timestamp, T00..T33) and
    # round-trip through read_poses (the PoseProvider axis input format).
    from depth_correction_tpu.datasets.asl_laser import read_poses

    pose_rows = open(cfg.slam_poses_csv).read().strip().splitlines()
    assert len(pose_rows) == 5  # header + 4 poses
    ids, est = read_poses(cfg.slam_poses_csv)
    assert len(est) == 4 and est[0].shape == (4, 4)


def test_eval_slam_external_subprocess(tmp_path):
    """cfg.slam=norlab_icp_mapper drives an external mapper binary end to
    end: corrected clouds export, subprocess launch, pose read-back, drift
    CSVs (reference: eval.py:234-259). The stub applies a known drift, so
    the reported translation error is exactly predictable."""
    import sys

    from depth_correction_tpu.config import slam_eval_csv
    from depth_correction_tpu.slam_eval import eval_slam

    stub = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "stub_slam_mapper.py")
    drift = 0.05
    cfg = box_cfg()
    cfg.test_names = ["open_box/n_4_size_10_10_5_height_1_density_50"]
    cfg.odom_cov = [0.0] * 6  # priors = GT, so error comes from drift only
    cfg.log_dir = str(tmp_path)
    cfg.slam = "norlab_icp_mapper"
    cfg.slam_command = (
        "%s %s {input_dir} {poses_csv} --drift %g" % (sys.executable, stub, drift)
    )
    cfg.slam_eval_csv = slam_eval_csv(cfg.log_dir, cfg.slam)
    results = eval_slam(cfg, apply_correction=False)
    (name, stats), = results.items()
    # abs translation error = mean_i |drift * i| over 4 scans = drift * 1.5
    np.testing.assert_allclose(stats[1], drift * 1.5, rtol=1e-6)
    rows = open(cfg.slam_eval_csv).read().strip().splitlines()
    assert len(rows) == 1 and len(rows[0].split()) == 5
    # Re-running reuses the export dir (stale scans are cleared first).
    results2 = eval_slam(cfg, apply_correction=False)
    np.testing.assert_allclose(next(iter(results2.values()))[1], drift * 1.5,
                               rtol=1e-6)


def test_stub_mapper_icp_mode(tmp_path):
    """The stub's default (Kabsch-refine) mode improves on noisy priors —
    the harness works with a mapper that actually registers."""
    import subprocess
    import sys

    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.datasets.asl_laser import read_poses
    from depth_correction_tpu.preproc import local_feature_cloud
    from depth_correction_tpu.slam_eval import perturb_odometry

    cfg = box_cfg()
    ds = create_dataset("open_box/n_4_size_10_10_5_height_1_density_50", cfg,
                        noisy=False)
    in_dir = str(tmp_path / "scans")
    os.makedirs(in_dir)
    poses = []
    for i, (scan, pose) in enumerate(ds):
        cloud = local_feature_cloud(scan, cfg)
        keep = np.asarray(cloud.valid)
        poses.append(np.asarray(pose))
        np.savez(
            os.path.join(in_dir, "scan_%04d.npz" % i),
            points=np.asarray(cloud.to_points())[keep],
            normals=np.asarray(cloud.normals)[keep],
            mask=keep[keep],
            prior=np.asarray(pose),
        )
    odom = perturb_odometry(np.stack(poses), [1e-6] * 3 + [1e-3] * 3, seed=5)
    for i in range(len(poses)):
        path = os.path.join(in_dir, "scan_%04d.npz" % i)
        data = dict(np.load(path))
        data["prior"] = odom[i]
        np.savez(path, **data)

    stub = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "stub_slam_mapper.py")
    out_csv = str(tmp_path / "poses.csv")
    subprocess.run([sys.executable, stub, in_dir, out_csv], check=True)
    _, est = read_poses(out_csv)
    assert len(est) == len(poses)
    err_prior = np.mean([np.linalg.norm((p - o)[:3, 3]) for p, o in zip(poses, odom)])
    err_est = np.mean([np.linalg.norm((p - e)[:3, 3]) for p, e in zip(poses, est)])
    assert err_est < err_prior


def test_perturb_odometry_statistics():
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4), (20, 1, 1))
    poses[:, 0, 3] = np.arange(20.0)
    noisy = perturb_odometry(poses, [0, 0, 0, 1e-4, 1e-4, 1e-4], seed=1)
    # First pose untouched; later poses drift.
    np.testing.assert_allclose(noisy[0], poses[0])
    drift = np.linalg.norm(noisy[-1][:3, 3] - poses[-1][:3, 3])
    assert 0 < drift < 1.0
    # Zero covariance = exact chain.
    clean = perturb_odometry(poses, [0.0] * 6, seed=1)
    np.testing.assert_allclose(clean, poses, atol=1e-12)


def test_eval_slam_multi_sequence_poses_per_file(tmp_path):
    """With several test sequences and one slam_poses_csv template, each
    sequence gets its OWN pose file (reference layout: per-sequence subdir,
    config.py:104-108) — a shared path would be overwritten per sequence."""
    from depth_correction_tpu.config import slam_poses_csv
    from depth_correction_tpu.datasets.asl_laser import read_poses
    from depth_correction_tpu.slam_eval import eval_slam

    cfg = box_cfg()
    cfg.test_names = [
        "open_box/n_3_size_10_10_5_height_1_density_40",
        "open_box/n_4_size_10_10_5_height_1_density_40",
    ]
    cfg.odom_cov = [1e-6, 1e-6, 1e-6, 1e-4, 1e-4, 1e-4]
    cfg.log_dir = str(tmp_path)
    cfg.slam_poses_csv = slam_poses_csv(cfg.log_dir, "", cfg.slam)
    results = eval_slam(cfg, apply_correction=False)
    assert len(results) == 2
    head, base = os.path.split(cfg.slam_poses_csv)
    lengths = {}
    for name in results:
        # Same nesting as the canonical slam_poses_csv(log_dir, name, slam)
        # helper, so PoseProvider consumers can locate the file.
        path = os.path.join(head, name, base)
        ids, est = read_poses(path)
        lengths[name] = len(est)
    assert sorted(lengths.values()) == [3, 4]
