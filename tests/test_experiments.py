"""Joint model+pose experiment harness (reference: scripts/model_poses_learning)."""
import pytest
import numpy as np

from depth_correction_tpu.config import Config, PoseCorrection
from depth_correction_tpu.datasets import create_dataset
from depth_correction_tpu.experiments import (
    joint_learning,
    synthetic_gt_map,
    synthetic_gt_positions,
)

NAME = "open_box/n_4_size_12_12_4_height_1_density_60"


def base_cfg(loss="trace_loss"):
    cfg = Config()
    cfg.float_type = "float32"
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.5, 20.0, 0.2
    cfg.nn_r, cfg.nn_k = 0.4, 0
    cfg.nn_max_neighbors = 32
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = []
    cfg.min_valid_neighbors = 3
    cfg.loss = loss
    cfg.loss_kwargs = {"sqrt": False, "normalization": False}
    cfg.model_class = "ScaledPolynomial"
    cfg.model_kwargs = {"w": [0.0], "exponent": [4.0]}
    cfg.depth_bias_model_kwargs = {"w": [-0.004], "exponent": [4.0]}
    cfg.lr = 2e-3
    cfg.n_opt_iters = 40
    return cfg


@pytest.mark.slow
def test_joint_learning_improves_map_accuracy(tmp_path):
    """Bias- and pose-noise-injected scans: joint training reduces the loss
    and the map error against the clean GT map; the recovered weight moves
    toward the injected bias; CSV written."""
    cfg = base_cfg(loss="min_eigval_loss")
    cfg.pose_correction = PoseCorrection.pose
    cfg.pose_noise = [0.0, 0.0, 0.0, 0.01, 0.01, 0.01]
    cfg.pose_noise_mode = "pose"
    cfg.lr = 4e-3
    cfg.n_opt_iters = 60
    ds = create_dataset(NAME, cfg)
    gt_map = synthetic_gt_map(NAME, cfg, density_mult=2.0)
    gt_xyz = synthetic_gt_positions(NAME, cfg)
    csv = str(tmp_path / "hist.csv")

    hist = joint_learning(
        cfg, datasets=[ds], gt_map=gt_map, gt_positions=gt_xyz,
        metrics_every=5, log_csv=csv,
    )
    assert hist.train_loss[-1] < hist.train_loss[0]
    assert np.isfinite(hist.map_accuracy).all()
    assert np.isfinite(hist.pose_l2).all()
    assert hist.map_accuracy[-1] < hist.map_accuracy[0]
    # Recovered bias weight moves toward the injected value (-0.004).
    w = float(np.asarray(hist.params["model"].w).ravel()[0])
    assert w < -1e-3
    rows = open(csv).read().strip().splitlines()
    assert rows[0].split() == ["iter", "train_loss", "pose_l2", "map_accuracy"]
    assert len(rows) > 3


def test_model_only_icp_learning():
    """scripts/model_learning equivalent: model-only ICP training runs and
    reduces the objective."""
    cfg = base_cfg(loss="icp_loss")
    cfg.pose_correction = PoseCorrection.none
    cfg.loss_kwargs = {"icp_point_to_plane": True, "icp_inlier_ratio": 0.8}
    cfg.n_opt_iters = 25
    ds = create_dataset(NAME, cfg)
    hist = joint_learning(cfg, datasets=[ds], metrics_every=8)
    assert hist.train_loss[-1] < hist.train_loss[0]
