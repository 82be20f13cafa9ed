"""Isolated rate of the bucketed-transpose backward gather (capped graph).

The capped-32 step is fully accounted as fwd gathers (48.3 ms, 6.5 ns/idx)
plus the transpose backward (62.5 ms, 7.4 ns/pair over the 9-row cotangent
table) with eigh3/loss-tail/precision/bucket-split all measured <1 ms —
but r3's cost model put the backward at ~4 ns/pair. This probe times the
EXACT backward gather loop (features.py:_moments_bucketed_bwd) in
isolation on the real bucket tables, at table heights 3 / 9 / 16, so the
step number can be compared against the primitive's price today: if the
isolated 9-row rate matches 7.4 ns/pair, the step IS at today's gather
bound and the r3 model (not the step) is what changed.

Usage: DC_BENCH_CACHE=/tmp/bench_workload.pkl python scripts/exp_tgather_rate.py
"""
from __future__ import annotations

import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get("DC_TG_STEPS", "10"))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_dctpu_tpu"))
    print("[tgather] backend:", jax.default_backend(), flush=True)

    cache = os.environ.get("DC_BENCH_CACHE", "/tmp/bench_workload.pkl")
    with open(cache + ".capped", "rb") as f:
        cfg, data_np, _full_nn = pickle.load(f)
    data = jax.tree_util.tree_map(jnp.asarray, data_np)
    tg = data.t_neighbors[0]
    mq = int(np.asarray(data.masks[0]).size)
    pairs = sum(int(np.prod(np.asarray(b).shape)) for b in tg.idx)
    print("[tgather] %d buckets, %d padded pairs, %d query rows"
          % (len(tg.idx), pairs, mq), flush=True)

    rng = np.random.default_rng(0)

    for rows in (3, 9, 16):
        table = jax.device_put(jnp.asarray(
            rng.normal(size=(rows, mq)).astype(np.float32)))

        @jax.jit
        def bwd_loop(table):
            parts = []
            for idx_b, w_b in zip(tg.idx, tg.w):
                g = jnp.take(table, jnp.maximum(idx_b, 0).T, axis=1)
                parts.append(jnp.sum(g * w_b.T[None].astype(table.dtype),
                                     axis=1))
            zero_slot = jnp.zeros((table.shape[0], 1), table.dtype)
            sums_all = jnp.concatenate(parts + [zero_slot], axis=1)
            return jnp.take(sums_all, tg.inv, axis=1)

        out = bwd_loop(table)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        tok = out[0, 0]
        for _ in range(STEPS):
            out = bwd_loop(table + 0.0 * tok)
            tok = out[0, 0]
        _ = float(tok)
        ms = (time.perf_counter() - t0) / STEPS * 1e3
        print("table rows=%2d: %7.2f ms -> %.2f ns/pair (%.2f ns/byte)"
              % (rows, ms, ms * 1e6 / pairs,
                 ms * 1e6 / pairs / (rows * 4)), flush=True)


if __name__ == "__main__":
    main()
