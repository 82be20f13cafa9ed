"""Bisect the cellwin TRAINING STEP: which layer costs 2.4 s when the
kernels in isolation cost 110 ms?

Loads the A/B workload cache (DC_CELLWIN_CACHE) and times, on the real
tables:

  1. cellwin_moments forward                (kernel + exception merge)
  2. grad of a scalar of cellwin_moments    (+ cotangent table + bwd kernel)
  3. loss_fn forward                        (+ permute, features, masks)
  4. value_and_grad(loss_fn)                (the step minus Adam)

Phantom-safe: every timing chains into a float() materialization.
"""
from __future__ import annotations

import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 5


def main():
    import jax
    import jax.numpy as jnp

    from depth_correction_tpu.config import Config
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.ops.cellwin import cellwin_moments
    from depth_correction_tpu.ops.features import permute_rows
    from depth_correction_tpu.preproc import global_cloud
    from depth_correction_tpu.train import make_loss_fn

    cache = os.environ.get("DC_CELLWIN_CACHE", "/tmp/cellwin_ab.pkl")
    with open(cache, "rb") as f:
        datas_np = pickle.load(f)
    data = jax.tree_util.tree_map(jnp.asarray, datas_np["cellwin"])
    dev = data.cellwin[0]
    assert dev is not None
    print("dims:", dev.dims, "n_exc:", dev.n_exc, file=sys.stderr)

    gcloud = global_cloud(data.batches[0])
    pts = gcloud.get_points()  # (M, 3)

    def timed(name, f, *args):
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = f(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
        ms = (time.perf_counter() - t0) / STEPS * 1e3
        print("%-28s %9.2f ms" % (name, ms))

    @jax.jit
    def fwd_moments(p):
        ps = permute_rows(p, dev.perm, dev.inv)
        mean, comps = cellwin_moments(ps, dev)
        return mean.sum() + sum(c.sum() for c in comps)

    timed("1 cellwin_moments fwd", fwd_moments, pts)

    g_moments = jax.jit(jax.grad(fwd_moments))
    timed("2 grad(cellwin_moments)", g_moments, pts)

    cfg = Config()
    cfg.float_type = "float32"
    cfg.nn_r, cfg.nn_k = 0.25, 0
    cfg.nn_max_neighbors = None
    cfg.min_valid_neighbors = 5
    cfg.eigenvalue_ratio_bounds = [[0, 1, 0, 0.25], [1, 2, 0.25, 1.0]]
    cfg.loss = "min_eigval_loss"
    cfg.loss_kwargs = {"sqrt": False, "normalization": True}
    cfg.moments_backend = "cellwin"
    loss_fn = make_loss_fn(cfg)
    params = {"model": ScaledPolynomial(w=jnp.zeros(1),
                                        exponent=jnp.asarray([4.0]))}

    loss_jit = jax.jit(lambda p: loss_fn(p, data))
    timed("3 loss_fn fwd", loss_jit, params)

    vg = jax.jit(lambda p: jax.value_and_grad(loss_fn)(p, data)[0])
    timed("4 value_and_grad(loss)", vg, params)


def main_arg_vs_const():
    """(5) data as jit ARGUMENT (the A/B's shape) vs the closure variants
    above, plus (6) the full Adam step replica — isolates why the full A/B
    measured 2356 ms while value_and_grad(loss) with closed-over data runs
    at 65 ms."""
    import jax
    import jax.numpy as jnp
    import optax

    from depth_correction_tpu.config import Config
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.train import make_loss_fn

    cache = os.environ.get("DC_CELLWIN_CACHE", "/tmp/cellwin_ab.pkl")
    with open(cache, "rb") as f:
        datas_np = pickle.load(f)
    data = jax.tree_util.tree_map(jnp.asarray, datas_np["cellwin"])

    cfg = Config()
    cfg.float_type = "float32"
    cfg.nn_r, cfg.nn_k = 0.25, 0
    cfg.nn_max_neighbors = None
    cfg.min_valid_neighbors = 5
    cfg.eigenvalue_ratio_bounds = [[0, 1, 0, 0.25], [1, 2, 0.25, 1.0]]
    cfg.loss = "min_eigval_loss"
    cfg.loss_kwargs = {"sqrt": False, "normalization": True}
    cfg.moments_backend = "cellwin"
    cfg.lr = 2e-4
    loss_fn = make_loss_fn(cfg)
    params = {"model": ScaledPolynomial(w=jnp.zeros(1),
                                        exponent=jnp.asarray([4.0]))}

    def timed(name, f, *args):
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = f(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
        print("%-28s %9.2f ms" % (name, (time.perf_counter() - t0) / STEPS * 1e3))

    vg_arg = jax.jit(lambda p, d: jax.value_and_grad(loss_fn)(p, d)[0])
    timed("5 vg, data as ARG", vg_arg, params, data)

    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, d):
        loss, grads = jax.value_and_grad(loss_fn)(params, d)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    loss, p2, o2 = step(params, opt_state, data)
    jax.block_until_ready((loss, p2))
    t0 = time.perf_counter()
    p, o = p2, o2
    for _ in range(STEPS):
        loss, p, o = step(p, o, data)
    print("6 full Adam step            %9.2f ms (loss %.6e)"
          % ((time.perf_counter() - t0) / STEPS * 1e3 - 0.0, float(loss)))


if __name__ == "__main__":
    if os.environ.get("DC_STEP_PARTS_ARG"):
        main_arg_vs_const()
    else:
        main()
