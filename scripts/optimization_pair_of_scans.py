"""Pair-of-scans ICP optimization demo.

TPU-native counterpart of the reference's pair-of-scans experiment
(reference: scripts/optimization_pair_of_scans:60-176): optimize a
depth-correction model on ONE consecutive scan pair with the
point-to-plane ICP objective, track a held-out validation pair, and save
the loss curves / top-down cloud views / model-curve dashboard the
reference shows interactively (saved figure + CSV here — no GUI).

Skips training pairs whose viewpoints are farther apart than
``--max-pose-dist`` (reference :94-97). Any named dataset works; the
default synthetic ground_plane sequence keeps the demo self-contained.

Usage:
  python scripts/optimization_pair_of_scans.py [--dataset NAME]
      [--train-pair I] [--val-pair J] [--iters N] [--out DIR]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_cfg(name):
    from depth_correction_tpu.config import Config

    cfg = Config()
    cfg.float_type = "float32"
    cfg.train_names = [name]
    cfg.min_depth, cfg.max_depth = 1.0, 25.0
    cfg.grid_res = 0.2
    cfg.nn_r, cfg.nn_k = 0.4, 0
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = []
    cfg.min_valid_neighbors = 3
    cfg.loss = "icp_loss"
    cfg.loss_kwargs = {"icp_point_to_plane": True, "icp_inlier_ratio": 0.5}
    cfg.lr = 2e-4
    return cfg


def pair_data(ds, i, cfg):
    """TrainData over scans (i, i+1) + the viewpoint distance."""
    from depth_correction_tpu.datasets.wrappers import Subscriptable
    from depth_correction_tpu.train import prepare_sequences

    pair = Subscriptable(ds)[i : i + 2]
    data = prepare_sequences([pair], cfg)
    poses = np.asarray(data.batches[0].poses)
    dist = float(np.linalg.norm(poses[0][:3, 3] - poses[1][:3, 3]))
    return data, dist


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="ground_plane/6")
    p.add_argument("--train-pair", type=int, default=0)
    p.add_argument("--val-pair", type=int, default=3)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--max-pose-dist", type=float, default=3.0)
    p.add_argument("--bias-w", type=float, default=-0.002,
                   help="synthetic injected bias (synthetic datasets)")
    p.add_argument("--out", default="gen/optimization_pair_of_scans")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.train import make_loss_fn

    cfg = make_cfg(args.dataset)
    if args.bias_w:
        cfg.depth_bias_model_kwargs = {"w": [args.bias_w], "exponent": [4.0]}
    ds = create_dataset(args.dataset, cfg)

    train_data, train_dist = pair_data(ds, args.train_pair, cfg)
    if train_dist > args.max_pose_dist:
        print("Distance between view points is too big: %.3f > %.1f m"
              % (train_dist, args.max_pose_dist))
        return None
    val_data, val_dist = pair_data(ds, args.val_pair, cfg)
    print("Train pair (%d, %d): pose dist %.3f m; val pair (%d, %d): %.3f m"
          % (args.train_pair, args.train_pair + 1, train_dist,
             args.val_pair, args.val_pair + 1, val_dist))

    loss_fn = make_loss_fn(cfg)
    params = {"model": ScaledPolynomial(w=jnp.zeros(1), exponent=jnp.asarray([4.0]))}
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, data):
        loss, grads = jax.value_and_grad(loss_fn)(params, data)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    val_eval = jax.jit(loss_fn)

    hist = []
    for it in range(args.iters):
        train_loss, params, opt_state = step(params, opt_state, train_data)
        val_loss = val_eval(params, val_data)
        hist.append((it, float(train_loss), float(val_loss)))
        if it % 50 == 0 or it == args.iters - 1:
            print("it %03d: train %.6e  val %.6e  w %.5e"
                  % (it, hist[-1][1], hist[-1][2],
                     float(np.asarray(params["model"].w)[0])))

    os.makedirs(args.out, exist_ok=True)
    hist_np = np.asarray(hist)
    np.savetxt(
        os.path.join(args.out, "pair_icp_history.csv"), hist_np,
        header="iter train_loss val_loss", comments="",
    )

    # Dashboard: loss deltas, top-down corrected clouds, model curve
    # (reference: scripts/optimization_pair_of_scans:135-172).
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from depth_correction_tpu.preproc import corrected_poses, global_cloud

        fig, axes = plt.subplots(2, 2, figsize=(14, 8), constrained_layout=True)
        fig.suptitle("ICP optimization (pair of scans)")
        axes[0, 0].plot(hist_np[:, 0], hist_np[:, 1] - hist_np[0, 1])
        axes[0, 0].set_xlabel("Iterations"); axes[0, 0].set_ylabel("ICP train loss delta")
        axes[0, 0].grid(True)
        axes[0, 1].plot(hist_np[:, 0], hist_np[:, 2] - hist_np[0, 2])
        axes[0, 1].set_xlabel("Iterations"); axes[0, 1].set_ylabel("ICP val loss delta")
        axes[0, 1].grid(True)

        model = params["model"]
        for ax, data, label in ((axes[1, 0], train_data, "train"),):
            gc = global_cloud(data.batches[0], model=model)
            pts = np.asarray(gc.get_points())[np.asarray(gc.valid)]
            sel = np.unique(np.linspace(0, len(pts) - 1, 5000, dtype=int))
            ax.plot(pts[sel, 0], pts[sel, 1], ".", markersize=2)
            ax.set_xlabel("x [m]"); ax.set_ylabel("%s cloud: y [m]" % label)
            ax.grid(True); ax.axis("equal")

        gamma = np.linspace(0, np.pi / 2, 100)
        d0 = np.ones_like(gamma)
        corrected = np.asarray(
            model.correct_depth(jnp.asarray(d0), jnp.asarray(gamma))
        )
        axes[1, 1].plot(np.degrees(gamma), corrected - d0)
        axes[1, 1].set_xlabel("incidence angle [deg]")
        axes[1, 1].set_ylabel("depth correction @ 1 m [m]")
        axes[1, 1].grid(True)
        fig.savefig(os.path.join(args.out, "pair_icp_dashboard.png"), dpi=110)
        plt.close(fig)
    except Exception as e:  # noqa: BLE001 - plotting is best-effort
        print("dashboard skipped: %s" % e)

    print("final model:", params["model"])
    return params["model"], hist_np


if __name__ == "__main__":
    main()
