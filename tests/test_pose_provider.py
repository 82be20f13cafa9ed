"""PoseProvider axis: SLAM-estimated pose sources end to end
(reference: main.py:249-313, config.py:76-93)."""
import os

import numpy as np

from depth_correction_tpu.config import Config, PoseProvider


def base_cfg(tmp_path):
    cfg = Config()
    cfg.out_dir = str(tmp_path / "gen")
    cfg.log_dir = str(tmp_path / "log")
    cfg.train_names = ["ground_plane/4"]
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.1, 20.0, 0.25
    cfg.nn_r, cfg.nn_k = 0.4, 0
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = []
    cfg.min_valid_neighbors = 3
    cfg.model_kwargs = {"w": [0.0], "exponent": [4.0]}
    cfg.depth_bias_model_kwargs = {"w": [-0.002], "exponent": [4.0]}
    cfg.loss_kwargs = {"sqrt": False, "normalization": False}
    cfg.odom_cov = [1e-6, 1e-6, 1e-6, 1e-4, 1e-4, 1e-4]
    return cfg


def test_override_poses_dataset(tmp_path):
    """create_dataset(poses_path=...) swaps in CSV poses (robot_data
    schema), leaving the clouds untouched."""
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.datasets.asl_laser import read_poses, write_poses

    cfg = base_cfg(tmp_path)
    ds_gt = create_dataset("ground_plane/4", cfg, noisy=False)
    gt = [np.asarray(p) for _, p in ds_gt]

    # Shift every pose by a known offset and write the CSV.
    offset = np.eye(4)
    offset[:3, 3] = [1.0, -2.0, 0.5]
    est = [offset @ p for p in gt]
    path = str(tmp_path / "slam_poses_test.csv")
    write_poses(list(range(len(est))), est, path)
    ids, back = read_poses(path)
    np.testing.assert_allclose(np.stack(back), np.stack(est), atol=1e-8)

    ds = create_dataset("ground_plane/4", cfg, noisy=False, poses_path=path)
    got = [np.asarray(p) for _, p in ds]
    np.testing.assert_allclose(np.stack(got), np.stack(est), atol=1e-8)
    # Clouds are unchanged.
    np.testing.assert_array_equal(ds[1][0]["x"], ds_gt[1][0]["x"])


def test_pose_provider_grid_end_to_end(tmp_path):
    """eval_slam_baselines writes slam_poses CSVs; train_and_eval_all with a
    non-ground-truth provider consumes them (per-pose correction, poses from
    the CSVs) and trains to completion."""
    import yaml

    from depth_correction_tpu.config import slam_poses_csv
    from depth_correction_tpu.main import eval_slam_baselines, train_and_eval_all

    cfg = base_cfg(tmp_path)
    cfg.eval_slams = ["icp_mapper"]
    cfg.n_opt_iters = 2
    cfg.lr = 1e-4

    eval_slam_baselines(cfg)
    poses_csv = slam_poses_csv(cfg.get_preproc_dir(), "ground_plane/4", "icp_mapper")
    assert os.path.exists(poses_csv), poses_csv

    cfg.eval_pose_providers = [PoseProvider.icp_mapper]
    cfg.eval_slams = []  # skip the slam half of train_and_eval for speed
    results = train_and_eval_all(
        cfg, models=["ScaledPolynomial"], losses=["min_eigval_loss"]
    )
    assert len(results) == 1
    (provider, model, loss, i_split), (best, _) = next(iter(results.items()))
    assert provider == PoseProvider.icp_mapper

    # The experiment config trained from the SLAM poses with per-pose
    # correction (reference: main.py:288-293).
    train_yaml = os.path.join(best.log_dir, "train.yaml")
    saved = yaml.safe_load(open(train_yaml))
    assert saved["pose_correction"] == "pose"
    assert saved["train_poses_path"] == [poses_csv]
    assert "icp_mapper" in best.log_dir  # provider in the experiment dir name


def test_create_dataset_npz_roundtrip(tmp_path):
    """The ROS-free dataset-creation script writes the FEE-Corridor npz
    layout, which loads back through the fee_corridor Dataset (counterpart
    of the reference's rosbag one-offs, scripts/create_fee_corridor)."""
    import importlib.util

    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "create_dataset_npz.py")
    spec = importlib.util.spec_from_file_location("create_dataset_npz", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = str(tmp_path / "my_seq")
    mod.main(["--source", "ground_plane/4", "--out", out])

    from depth_correction_tpu.datasets.fee_corridor import Dataset
    from depth_correction_tpu.preproc import local_feature_cloud

    ds = Dataset(path=out)
    assert len(ds) == 4
    scan, pose = ds[0]
    # Source schema passes through (ground_plane carries normals, no vp_*).
    assert set(scan.dtype.names) >= {"x", "y", "z"}
    assert pose.shape == (4, 4)

    cfg = base_cfg(tmp_path)
    fc = local_feature_cloud(scan, cfg)
    assert fc.normals is not None and int(np.asarray(fc.valid).sum()) > 100

    # Export-dir mode consumes run_external_slam / export_corrected npz.
    exp = tmp_path / "export"
    os.makedirs(str(exp))
    rng = np.random.default_rng(0)
    for i in range(2):
        np.savez(str(exp / ("scan_%04d.npz" % i)),
                 points=rng.normal(size=(50, 3)), prior=np.eye(4))
    out2 = str(tmp_path / "seq2")
    mod.main(["--source-dir", str(exp), "--out", out2])
    ds2 = Dataset(path=out2)
    assert len(ds2) == 2 and len(ds2.local_cloud(ds2.ids[0])) == 50


def test_eval_configs_glob(tmp_path, capsys):
    """eval_configs re-evaluates existing experiment configs by glob
    (reference: main.py:320-393)."""
    from depth_correction_tpu.config import loss_eval_csv
    from depth_correction_tpu.main import eval_configs

    cfg = base_cfg(tmp_path)
    cfg.test_names = ["ground_plane/4"]
    cfg.eval_losses = ["min_eigval_loss"]
    exp_dir = tmp_path / "exp0"
    os.makedirs(str(exp_dir))
    cfg.log_dir = str(exp_dir)
    cfg.to_yaml(str(exp_dir / "train.yaml"))

    out = eval_configs(base_cfg(tmp_path), str(tmp_path / "*" / "train.yaml"),
                       "loss_all")
    assert len(out) == 1
    csv = loss_eval_csv(str(exp_dir), "min_eigval_loss", "test")
    assert os.path.exists(csv)
    line = open(csv).read().split()
    assert line[0] == "ground_plane/4" and np.isfinite(float(line[1]))


def test_override_poses_aligns_by_id_or_raises(tmp_path):
    """A poses CSV longer than the dataset must align by pose id, never by
    position (a full-sequence CSV reused with a narrower slice would
    otherwise silently shift every pose by one scan)."""
    import numpy as np
    import pytest

    from depth_correction_tpu.config import Config
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.datasets.asl_laser import write_poses
    from depth_correction_tpu.datasets.wrappers import OverridePosesDataset

    cfg = Config()
    ds = create_dataset("ground_plane/3", cfg, noisy=False)
    ids = list(ds.ids)
    extra_ids = ids + [max(int(i) for i in ids) + 1, max(int(i) for i in ids) + 2]
    poses = [np.eye(4) + 0.0 for _ in extra_ids]
    for i, p in enumerate(poses):
        p[0, 3] = float(i)  # distinguishable translations
    path = str(tmp_path / "poses.csv")
    write_poses(extra_ids, np.stack(poses), path)

    wrapped = OverridePosesDataset(ds, path)
    for k in range(len(ds)):
        _, pose = wrapped[k]
        assert float(pose[0, 3]) == float(k)  # id-aligned, not truncated

    # Mismatched ids cannot align -> hard error, no silent assignment.
    bad = str(tmp_path / "bad.csv")
    write_poses([50, 51, 52, 53], np.stack(poses[:4]), bad)
    with pytest.raises(ValueError):
        OverridePosesDataset(ds, bad)
