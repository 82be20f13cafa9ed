"""A/B the training step with/without the u16-packed gathers, decomposed.

Uses the DC_BENCH_CACHE workload (fast iteration) and float() materialized
timing (phantom-safe). Flips DC_GATHER16 between traces — the flag is read
at trace time, so re-jitting picks it up.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np


def timeit(fn, *args, steps=10, warmup=2):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / steps * 1e3


def build_step(cfg, data, mode: str):
    import jax
    import jax.numpy as jnp
    import optax

    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.train import make_loss_fn

    os.environ["DC_GATHER16"] = mode
    loss_fn = make_loss_fn(cfg)
    params = {"model": ScaledPolynomial(w=jnp.zeros(1), exponent=jnp.asarray([4.0]))}
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, data):
        loss, grads = jax.value_and_grad(loss_fn)(params, data)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    @jax.jit
    def fwd(params, data):
        return loss_fn(params, data)

    @jax.jit
    def fwdbwd(params, data):
        return jax.value_and_grad(loss_fn)(params, data)

    return step, fwd, fwdbwd, params, opt_state


def main():
    import jax

    sys.path.insert(0, "/root/repo")
    os.environ.setdefault("DC_BENCH_CACHE", "/tmp/bench_workload.pkl")
    from bench import build_workload, to_device

    cfg, data, _ = build_workload()
    device = jax.devices()[0]
    data = to_device(data, device)

    for mode, label in (("0", "f32"), ("fwd", "u16-fwd"), ("1", "u16-all")):
        step, fwd, fwdbwd, params, opt_state = build_step(cfg, data, mode)
        params = to_device(params, device)
        opt_state = to_device(opt_state, device)
        print("%s fwd:      %7.2f ms" % (label, timeit(fwd, params, data)))
        print("%s fwd+bwd:  %7.2f ms" % (label, timeit(fwdbwd, params, data)))
        print("%s step:     %7.2f ms" % (label, timeit(step, params, opt_state, data)))


if __name__ == "__main__":
    main()
