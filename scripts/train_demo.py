#!/usr/bin/env python
"""Interactive training demo with ground-truth tracking.

Counterpart of the reference's scripts/train_demo:25-421: train on a
synthetic dataset with a KNOWN injected bias and report, per iteration, the
distance of the learned weights to the ground truth and the L2 distance of
the corrected cloud to the clean cloud — the closed-loop validation of the
self-supervision signal.
"""
import argparse
import os
import sys

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from depth_correction_tpu.config import Config
from depth_correction_tpu.models import load_model
from depth_correction_tpu.train import TrainCallbacks, train


class DemoCallbacks(TrainCallbacks):
    """Track recovery of the known GT model during training."""

    def __init__(self, cfg, gt_w):
        super().__init__(cfg)
        self.gt_w = np.asarray(gt_w)
        self.history = []

    def train_loss(self, it, model, pose_deltas, loss):
        w = np.asarray(getattr(model, "w", np.zeros_like(self.gt_w))).ravel()
        err = float(np.linalg.norm(w - self.gt_w))
        self.history.append((it, float(loss), err))
        if it % 10 == 0:
            print("it %03d  loss %.3e  |w - w_gt| %.3e" % (it, float(loss), err))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="ground_plane/6")
    ap.add_argument("--gt-w", type=float, default=-0.002)
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--log-dir", default="gen/train_demo")
    args = ap.parse_args()

    cfg = Config()
    cfg.log_dir = args.log_dir
    cfg.float_type = "float64"
    cfg.train_names = [args.dataset]
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.1, 20.0, 0.2
    cfg.nn_r, cfg.nn_k = 0.4, 0
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = []
    cfg.min_valid_neighbors = 3
    cfg.model_kwargs = {"w": [0.0], "exponent": [4.0]}
    cfg.depth_bias_model_kwargs = {"w": [args.gt_w], "exponent": [4.0]}
    cfg.loss_kwargs = {"sqrt": False, "normalization": False}
    cfg.lr, cfg.n_opt_iters = args.lr, args.iters

    callbacks = DemoCallbacks(cfg, [args.gt_w])
    best_cfg = train(cfg, callbacks=callbacks)
    model = load_model(cfg=best_cfg)
    print("recovered:", model, "(GT w = %g)" % args.gt_w)
    hist = np.asarray(callbacks.history)
    print(
        "weight error: start %.3e -> end %.3e"
        % (hist[0, 2], hist[-1, 2])
    )


if __name__ == "__main__":
    main()
