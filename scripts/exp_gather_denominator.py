"""Stabilize the uncapped-gather A/B denominator (VERDICT r4 item 6).

The promoted cellwin engine's 8.7x headline divides its stable 57.4 ms by
ONE healthy gather measurement (496.5 ms; other runs in degraded tunnel
windows read 1.9-46.6 s). This harness re-times the SAME uncapped graph on
the gather engine N times in one process (fresh jit per run is pointless —
the binary is identical; what varied was the tunnel), each run = ``STEPS``
chained, float()-materialized steps, and prints median + spread.

Usage: DC_BENCH_CACHE=/tmp/bench_workload.pkl python scripts/exp_gather_denominator.py
"""
from __future__ import annotations

import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(os.environ.get("DC_DENOM_RUNS", "5"))
STEPS = int(os.environ.get("DC_DENOM_STEPS", "10"))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_dctpu_tpu"))
    print("[denom] backend:", jax.default_backend(), flush=True)

    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.train import make_loss_fn

    cache = os.environ.get("DC_BENCH_CACHE", "/tmp/bench_workload.pkl")
    with open(cache + ".uncapped", "rb") as f:
        cfg, data_np, _full_nn = pickle.load(f)
    data = jax.tree_util.tree_map(jnp.asarray, data_np)
    cfg = cfg.copy()
    cfg.moments_backend = "gather"  # the A/B denominator engine
    # The loss fn routes per-sequence on data.cellwin, NOT on cfg (a first
    # version of this harness set only cfg and silently re-measured the
    # cellwin engine): null the cellwin structures and rebuild the gather
    # backward's transpose graphs, which auto-cellwin prep skips.
    if any(cw is not None for cw in (getattr(data, "cellwin", ()) or ())):
        import dataclasses

        from depth_correction_tpu.ops.features import (
            build_bucketed_transpose_device,
        )

        new_t = []
        for i, nn in enumerate(data.neighbors):
            m = int(np.prod(np.asarray(data.batches[i].cloud.depth).shape))
            tg = build_bucketed_transpose_device(
                nn, num_points=m, weights=data.weights[i]
            )
            pairs = sum(int(np.prod(np.asarray(b).shape)) for b in tg.idx)
            print("[denom] seq %d: %d fwd indices, %d transpose pairs"
                  % (i, int(np.prod(np.asarray(nn).shape)), pairs),
                  flush=True)
            new_t.append(tg)
        data = dataclasses.replace(
            data,
            cellwin=(None,) * len(data.cellwin),
            t_neighbors=tuple(new_t),
            t_slots=(None,) * len(new_t),
        )
    loss_fn = make_loss_fn(cfg)
    params = {"model": ScaledPolynomial(w=jnp.zeros(1),
                                        exponent=jnp.asarray([4.0]))}
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, data):
        loss, grads = jax.value_and_grad(loss_fn)(params, data)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    # Warmup compile + one throwaway run.
    loss, p, o = step(params, opt_state, data)
    jax.block_until_ready(loss)
    print("[denom] loss(w=0) = %.6e" % float(loss), flush=True)

    per_run = []
    for run in range(RUNS):
        p, o = params, opt_state
        loss, p, o = step(p, o, data)
        float(loss)  # sync before the timed region
        t0 = time.perf_counter()
        for _ in range(STEPS):
            loss, p, o = step(p, o, data)
        _ = float(loss)
        ms = (time.perf_counter() - t0) / STEPS * 1e3
        per_run.append(ms)
        print("[denom] run %d: %.1f ms/step" % (run, ms), flush=True)

    per_run = np.asarray(per_run)
    print("GATHER DENOMINATOR: median %.1f ms, min %.1f, max %.1f, "
          "n=%d (steps/run=%d)"
          % (float(np.median(per_run)), per_run.min(), per_run.max(),
             RUNS, STEPS), flush=True)


if __name__ == "__main__":
    main()
