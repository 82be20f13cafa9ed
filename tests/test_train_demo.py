"""train_demo observability: GT-cloud L2 / weight-error / pose-error curves
and the saved dashboard (reference scripts/train_demo:102-109, 201-236)."""
import importlib.util
import os

import numpy as np

from depth_correction_tpu.config import Config, PoseCorrection


def _load_demo():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "train_demo.py")
    spec = importlib.util.spec_from_file_location("train_demo", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_demo_callbacks_track_and_render(tmp_path):
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.models import load_model
    from depth_correction_tpu.train import train

    demo = _load_demo()

    cfg = Config()
    cfg.log_dir = str(tmp_path)
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
    cfg.lr, cfg.n_opt_iters = 1e-4, 6
    cfg.pose_noise = [0.0, 0.0, 0.0, 0.002, 0.002, 0.002]
    cfg.pose_noise_mode = "pose"
    cfg.pose_correction = PoseCorrection.pose

    gt_model = load_model(
        class_name=cfg.depth_bias_model_class,
        model_kwargs=dict(cfg.depth_bias_model_kwargs),
    )
    datasets = [create_dataset(n, cfg) for n in cfg.train_names]
    clean = [create_dataset(n, cfg, noisy=False) for n in cfg.train_names]
    gt_poses = [np.stack([np.asarray(p) for _, p in ds]) for ds in clean]

    cb = demo.DemoCallbacks(cfg, gt_model, datasets=datasets,
                            gt_poses=gt_poses, every=1)
    train(cfg, callbacks=cb, train_datasets=datasets)

    hist = np.asarray(cb.history)
    assert hist.shape == (6, 5)
    # All four tracked quantities are finite every iteration (every=1).
    assert np.isfinite(hist[:, 1:]).all()
    # The cloud-L2 metric measures residual bias in meters: with w=0 it
    # equals the injected bias magnitude and shrinks as w learns.
    assert hist[-1, 3] <= hist[0, 3]
    # Pose error is nonzero (noise was injected) and finite.
    assert hist[0, 4] > 0

    csv, fig = cb.save_outputs(str(tmp_path))
    assert os.path.exists(csv) and os.path.exists(fig)
    rows = open(csv).read().strip().splitlines()
    assert rows[0].split() == ["iter", "loss", "w_err", "cloud_l2", "pose_err"]
    assert len(rows) == 7
