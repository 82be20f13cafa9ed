"""Full train-state checkpoint/resume: an interrupted run continues the
exact trajectory (params + optimizer state + best-selection bookkeeping)."""
import os

import numpy as np
import pytest

from depth_correction_tpu.config import Config, PoseCorrection
from depth_correction_tpu.models import load_model
from depth_correction_tpu.train import train


def base_cfg(log_dir):
    cfg = Config()
    cfg.log_dir = str(log_dir)
    cfg.float_type = "float64"
    cfg.train_names = ["ground_plane/4"]
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.1, 20.0, 0.25
    cfg.nn_r, cfg.nn_k = 0.4, 0
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = []
    cfg.min_valid_neighbors = 3
    cfg.model_kwargs = {"w": [0.0], "exponent": [4.0]}
    cfg.depth_bias_model_kwargs = {"w": [-0.002], "exponent": [4.0]}
    cfg.loss_kwargs = {"sqrt": False, "normalization": False}
    cfg.lr = 2e-4
    cfg.n_opt_iters = 12
    cfg.pose_correction = PoseCorrection.pose
    cfg.pose_noise = [0.0, 0.0, 0.0, 0.005, 0.005, 0.005]
    cfg.pose_noise_mode = "pose"
    cfg.checkpoint_period = 5
    return cfg


def test_resume_reproduces_uninterrupted_run(tmp_path):
    # Reference run: 12 iterations straight through.
    cfg_a = base_cfg(tmp_path / "a")
    best_a = train(cfg_a)
    w_a = np.asarray(load_model(cfg=best_a).w)

    # Interrupted run: stop after 7 iterations (checkpoint lands at it=4),
    # then resume to 12.
    cfg_b = base_cfg(tmp_path / "b")
    cfg_b.n_opt_iters = 7
    train(cfg_b)
    assert os.path.isdir(os.path.join(cfg_b.log_dir, "train_state"))

    cfg_b2 = base_cfg(tmp_path / "b")
    cfg_b2.n_opt_iters = 12
    best_b = train(cfg_b2)
    w_b = np.asarray(load_model(cfg=best_b).w)

    np.testing.assert_allclose(w_b, w_a, rtol=1e-12)

    # History covers all 12 iterations after the resume.
    rows = open(os.path.join(cfg_b2.log_dir, "train_history.csv")).read()
    rows = rows.strip().splitlines()
    assert len(rows) == 13  # header + 12


def test_resume_returns_prior_best_when_not_beaten(tmp_path):
    """A resumed run that never improves on the restored minima still
    returns the pre-interruption best (read from best.yaml) instead of
    None."""
    cfg = base_cfg(tmp_path / "d")
    cfg.n_opt_iters = 6
    best_first = train(cfg)
    assert best_first is not None

    # Resume for zero additional improvement opportunity: same iteration
    # count means the loop body never runs again.
    cfg2 = base_cfg(tmp_path / "d")
    cfg2.n_opt_iters = 6
    best_resumed = train(cfg2)
    assert best_resumed is not None
    assert best_resumed.model_state_dict == best_first.model_state_dict


def test_resume_disabled_restarts(tmp_path):
    cfg = base_cfg(tmp_path / "c")
    cfg.n_opt_iters = 6
    train(cfg)
    cfg2 = base_cfg(tmp_path / "c")
    cfg2.n_opt_iters = 6
    cfg2.resume = False
    best = train(cfg2)  # runs from scratch without error
    assert best is not None
