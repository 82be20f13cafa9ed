#!/usr/bin/env python
"""Minimal map-consistency optimization example.

Counterpart of the reference's examples/optimization:18-78: build feature
clouds for a short sequence, establish frozen neighborhoods, then jointly
optimize the correction model and per-pose SE(3) deltas against the
min-eigenvalue map-consistency loss — all in one jitted step.

Runs on the synthetic open_box fixture by default (no downloads); pass a
real dataset name (e.g. ``asl_laser/eth``) with data under
``DEPTH_CORRECTION_DATA`` to reproduce the reference workflow.
"""
import os
import sys

import jax

# Honor JAX_PLATFORMS even when site configuration pre-set the platform list.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import optax

from depth_correction_tpu.config import Config, PoseCorrection
from depth_correction_tpu.datasets import create_dataset
from depth_correction_tpu.models import ScaledPolynomial
from depth_correction_tpu.train import (
    init_pose_deltas,
    make_loss_fn,
    prepare_sequences,
)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "open_box/n_4_size_10_10_5_height_1_density_50"

    cfg = Config()
    cfg.grid_res = 0.1
    cfg.min_depth = 1.0
    cfg.max_depth = 15.0
    cfg.nn_r = 0.4
    cfg.lr = 2e-4
    cfg.n_opt_iters = 100
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = []
    cfg.min_valid_neighbors = 3
    cfg.pose_correction = PoseCorrection.pose
    cfg.loss_kwargs = {"sqrt": False, "normalization": True}
    # Inject a known bias so there is something to recover.
    cfg.depth_bias_model_kwargs = {"w": [-0.002], "exponent": [4.0]}

    ds = create_dataset(name, cfg)
    data = prepare_sequences([ds], cfg)

    # Model d' = d * (1 - w * gamma^4), plus per-pose SE(3) deltas.
    params = {
        "model": ScaledPolynomial(w=jnp.zeros(1), exponent=jnp.asarray([4.0])),
        "pose_deltas": init_pose_deltas(data, cfg),
    }
    loss_fn = make_loss_fn(cfg)
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, data):
        loss, grads = jax.value_and_grad(loss_fn)(params, data)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    for it in range(cfg.n_opt_iters):
        loss, params, opt_state = step(params, opt_state, data)
        if it % 10 == 0:
            print("it %03d  loss %.3e  %s" % (it, float(loss), params["model"]))
    print("final:", params["model"])


if __name__ == "__main__":
    main()
