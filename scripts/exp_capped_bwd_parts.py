"""Attribute the capped-32 BACKWARD cost (VERDICT r4 item 2, continued).

exp_step_ab splits the 111 ms capped step into fwd 48.3 (7.4M gather
indices -> 6.5 ns/idx, matching the r3 cost model) and bwd 62.5 ms for
8.40M transpose pairs -> 7.4 ns/pair where r3's model says ~4 (~34 ms);
precision pinning (0.56 ms) and the 2M bucket split (-3.4 ms) are both
exonerated. This harness times value_and_grad of nested scalar targets on
the same graph so the extra ~28 ms lands on a specific stage:

  T1  sum(moments)        backward = transpose gathers only
  T2  sum(eigvals)        + eigh3 differentiation
  T3  full loss           + normalization/trim/offset tail

Usage: DC_BENCH_CACHE=/tmp/bench_workload.pkl python scripts/exp_capped_bwd_parts.py
"""
from __future__ import annotations

import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get("DC_BWD_STEPS", "10"))


def timed(name, fn, params, data):
    import dataclasses as dc

    import jax

    out = fn(params, data)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    tok = 0.0
    for _ in range(STEPS):
        out = fn(
            {"model": dc.replace(params["model"],
                                 w=params["model"].w + 0.0 * tok)},
            data,
        )
        tok = jax.tree_util.tree_leaves(out)[0]
    _ = float(np.asarray(tok).ravel()[0])
    ms = (time.perf_counter() - t0) / STEPS * 1e3
    print("%-34s %9.2f ms" % (name, ms), flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_dctpu_tpu"))
    print("[bwd-parts] backend:", jax.default_backend(), flush=True)

    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.ops.eigh3 import eigvals3_c
    from depth_correction_tpu.ops.features import (
        neighborhood_moments_bucketed,
    )
    from depth_correction_tpu.preproc import global_cloud
    from depth_correction_tpu.train import make_loss_fn

    cache = os.environ.get("DC_BENCH_CACHE", "/tmp/bench_workload.pkl")
    with open(cache + ".capped", "rb") as f:
        cfg, data_np, _full_nn = pickle.load(f)
    data = jax.tree_util.tree_map(jnp.asarray, data_np)
    params = {"model": ScaledPolynomial(w=jnp.zeros(1),
                                        exponent=jnp.asarray([4.0]))}

    def moments_of(p, data):
        gcloud = global_cloud(data.batches[0], model=p["model"],
                              pose_deltas=None)
        return neighborhood_moments_bucketed(
            gcloud.get_points(), data.neighbors[0], data.weights[0],
            data.t_neighbors[0],
        )

    @jax.jit
    def t1f(p, data):
        mean, comps = moments_of(p, data)
        return jnp.sum(mean) + sum(jnp.sum(c) for c in comps)

    @jax.jit
    def t1(p, data):
        def target(p):
            mean, comps = moments_of(p, data)
            return (jnp.sum(mean) + sum(jnp.sum(c) for c in comps)) * 1e-6
        return jax.value_and_grad(target)(p)

    @jax.jit
    def t2(p, data):
        def target(p):
            _mean, comps = moments_of(p, data)
            l1, l2, l3 = eigvals3_c(*comps)
            return (jnp.sum(l1) + jnp.sum(l2) + jnp.sum(l3)) * 1e-3
        return jax.value_and_grad(target)(p)

    loss_fn = make_loss_fn(cfg)

    @jax.jit
    def t3(p, data):
        return jax.value_and_grad(loss_fn)(p, data)

    ms_f = timed("F  moments fwd only", t1f, params, data)
    ms1 = timed("T1 sum(moments) fwd+bwd", t1, params, data)
    ms2 = timed("T2 sum(eigvals) fwd+bwd", t2, params, data)
    ms3 = timed("T3 full loss fwd+bwd", t3, params, data)
    print("\n[attribution] moments fwd %.2f; transpose-gather bwd ~ %.2f; "
          "eigh3 diff ~ %.2f; loss tail ~ %.2f"
          % (ms_f, ms1 - ms_f, ms2 - ms1, ms3 - ms2), flush=True)


if __name__ == "__main__":
    main()
