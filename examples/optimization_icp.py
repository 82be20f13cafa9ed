#!/usr/bin/env python
"""Pairwise ICP-loss optimization example.

Counterpart of the reference's examples/optimization_icp: correct two
neighboring scans with a ScaledPolynomial model trained against the
point-to-plane distance between them.
"""
import os
import sys

import jax

# Honor JAX_PLATFORMS even when site configuration pre-set the platform list.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
import optax

from depth_correction_tpu.config import Config
from depth_correction_tpu.datasets import create_dataset
from depth_correction_tpu.loss import point_to_plane_dist
from depth_correction_tpu.models import ScaledPolynomial
from depth_correction_tpu.preproc import local_feature_cloud


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "open_box/n_4_size_10_10_5_height_1_density_50"

    cfg = Config()
    cfg.grid_res = 0.1
    cfg.min_depth = 1.0
    cfg.max_depth = 15.0
    cfg.nn_r = 0.4
    cfg.lr = 2e-4
    cfg.eigenvalue_ratio_bounds = []
    cfg.depth_bias_model_kwargs = {"w": [-0.002], "exponent": [4.0]}

    ds = create_dataset(name, cfg)
    scan1, pose1 = ds[0]
    scan2, pose2 = ds[1]

    # Feature clouds (normals, incidence angles), posed into the world frame.
    cloud1 = local_feature_cloud(scan1, cfg).transform(jnp.asarray(pose1))
    cloud2 = local_feature_cloud(scan2, cfg).transform(jnp.asarray(pose2))

    def loss_fn(w, cloud1, cloud2):
        model = ScaledPolynomial(w=w, exponent=jnp.asarray([4.0]))
        c1 = model.apply(cloud1).with_points()
        c2 = model.apply(cloud2).with_points()
        return point_to_plane_dist([c1, c2], icp_inlier_ratio=0.5)

    w = jnp.zeros(1)
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(w)

    @jax.jit
    def step(w, opt_state, cloud1, cloud2):
        loss, g = jax.value_and_grad(loss_fn)(w, cloud1, cloud2)
        updates, opt_state = tx.update(g, opt_state, w)
        return loss, optax.apply_updates(w, updates), opt_state

    for it in range(100):
        loss, w, opt_state = step(w, opt_state, cloud1, cloud2)
        if it % 10 == 0:
            print("it %03d  p2p loss %.5f  w %.5f" % (it, float(loss), float(w[0])))
    print("final w:", np.asarray(w))


if __name__ == "__main__":
    main()
