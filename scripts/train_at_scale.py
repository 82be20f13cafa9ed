"""Production-scale training demo: ~1M-point global cloud on one chip.

Demonstrates the scale path end to end on the TPU: on-device grid-hash
neighborhood establishment (ops/grid_hash.py), query-row compaction,
bucketed-transpose analytic backward, and the jitted train step — the
"points per global cloud" scaling axis (SURVEY §5: the moral equivalent of
context parallelism) without any host KD-tree.

Usage: python scripts/train_at_scale.py [--density D] [--steps N]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--density", type=float, default=300.0,
                   help="open-box surface density")
    p.add_argument("--size", default="32_32_6",
                   help="box size WxLxH tokens (32_32_6 -> ~850k global "
                        "points after the 0.1 m grid)")
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args(argv)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jax_dctpu_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from depth_correction_tpu.config import Config
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.train import make_loss_fn, prepare_sequences

    t0 = time.perf_counter()

    cfg = Config()
    cfg.float_type = "float32"
    cfg.nn_backend = "grid"  # on-device establishment, no host KD-tree
    cfg.train_names = [
        "open_box/n_6_size_%s_height_1_density_%g"
        % (args.size, args.density)
    ]
    cfg.min_depth, cfg.max_depth = 1.0, 40.0
    cfg.grid_res = 0.1
    cfg.nn_r, cfg.nn_k = 0.25, 0
    cfg.nn_max_neighbors = 32
    cfg.min_valid_neighbors = 5
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = [[0, 1, 0, 0.25], [1, 2, 0.25, 1.0]]
    cfg.loss = "min_eigval_loss"
    cfg.loss_kwargs = {"sqrt": False, "normalization": True}
    cfg.depth_bias_model_kwargs = {"w": [-0.002], "exponent": [4.0]}
    cfg.lr = 2e-4
    # A/B knob: DC_MOMENTS_BACKEND=cellwin runs the cell-window engine
    # (uncapped reference-exact neighborhoods; nn_max_neighbors ignored).
    cfg.moments_backend = os.environ.get("DC_MOMENTS_BACKEND", "gather")

    ds = create_dataset(cfg.train_names[0], cfg)
    data = prepare_sequences([ds], cfg)
    n_global = int(np.asarray(data.batches[0].cloud.valid).sum())
    n_query = int(np.asarray(data.masks[0]).size)
    n_loss = int(np.asarray(data.masks[0]).sum())
    print(
        "[scale] %d global points, %d query rows (%d in loss), K=%d "
        "(prep %.0fs)"
        % (n_global, n_query, n_loss,
           int(np.asarray(data.neighbors[0]).shape[1]),
           time.perf_counter() - t0),
        flush=True,
    )

    loss_fn = make_loss_fn(cfg)
    from depth_correction_tpu.train import bind_cellwin_static

    # Cell-window graphs (if any) ride the closure (35-220x vs args).
    loss_fn, data = bind_cellwin_static(loss_fn, data)
    params = {"model": ScaledPolynomial(w=jnp.zeros(1), exponent=jnp.asarray([4.0]))}
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)
    # Freeze the exponent like train() does (trainable_mask) — otherwise
    # Adam drifts it and the recovered w is measured against a different
    # basis function than the injected {w, exponent=4} bias.
    from depth_correction_tpu.models import trainable_mask

    gmask = {"model": trainable_mask(params["model"])}

    @jax.jit
    def step(params, opt_state, data):
        loss, grads = jax.value_and_grad(loss_fn)(params, data)
        grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, gmask)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    for _ in range(3):
        loss, params, opt_state = step(params, opt_state, data)
    jax.block_until_ready(loss)

    t1 = time.perf_counter()
    for _ in range(args.steps):
        loss, params, opt_state = step(params, opt_state, data)
    final_loss = float(loss)
    dt = (time.perf_counter() - t1) / args.steps
    print(
        "[scale] %.1f ms/step, %.3g corrected points/sec/chip, "
        "final loss %.3e, w %.3e"
        % (dt * 1e3, n_global / dt, final_loss,
           float(np.asarray(params["model"].w)[0])),
        flush=True,
    )
    return dt * 1e3, n_global


if __name__ == "__main__":
    main()
