#!/usr/bin/env python
"""Grid search over model weights against a chosen loss.

Counterpart of the reference's scripts/weights_search:59-80, TPU-first: the
whole weight grid evaluates as one vmapped program via the loss-landscape
machinery instead of a Python loop.
"""
import argparse
import os
import sys

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from depth_correction_tpu.config import Config
from depth_correction_tpu.loss_landscape import loss_landscape


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="ground_plane/6")
    ap.add_argument("--loss", default="min_eigval_loss")
    ap.add_argument("--gt-w", type=float, default=-0.002)
    ap.add_argument("--w-min", type=float, default=-0.005)
    ap.add_argument("--w-max", type=float, default=0.005)
    ap.add_argument("--n", type=int, default=21)
    args = ap.parse_args()

    cfg = Config()
    cfg.float_type = "float64"
    cfg.train_names = [args.dataset]
    cfg.loss = args.loss
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.1, 20.0, 0.2
    cfg.nn_r, cfg.nn_k = 0.4, 0
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = []
    cfg.min_valid_neighbors = 3
    cfg.model_kwargs = {"w": [0.0], "exponent": [4.0]}
    cfg.depth_bias_model_kwargs = {"w": [args.gt_w], "exponent": [4.0]}
    cfg.loss_kwargs = {"sqrt": False, "normalization": False}

    w, losses = loss_landscape(cfg, weights=np.linspace(args.w_min, args.w_max, args.n))
    for wi, li in zip(w, losses):
        marker = " <- min" if li == losses.min() else ""
        print("w=%+.5f  loss=%.6e%s" % (wi, li, marker))
    print("best w: %+.5f (GT %+.5f)" % (w[np.argmin(losses)], args.gt_w))


if __name__ == "__main__":
    main()
