"""100-step w-trajectory parity on the bench graph (VERDICT r4 item 8).

bench.py documents the 6-step w rel err (1.06e-4) as f32 gradient rounding
and asserts convergence to the same optimum from small-scene tests; this
harness closes the gap on the bench workload itself: OUR f32 cellwin step
(TPU) vs the torch-f64 optimized baseline (CPU, bench.bench_torch_baseline)
for 100 Adam steps on the identical compacted uncapped graph, reporting the
final-w relative disagreement.

Usage: DC_BENCH_CACHE=/tmp/bench_workload.pkl python scripts/exp_w_parity_100.py
"""
from __future__ import annotations

import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get("DC_WPAR_STEPS", "100"))
# 'both' (default), 'ours' (TPU side only), or 'torch' (CPU side only —
# runs WITHOUT touching a TPU backend, so the ~1 h torch-f64 loop does not
# hold the single TPU process slot).
SIDE = os.environ.get("DC_WPAR_SIDE", "both")


def main():
    if SIDE == "torch":
        run_torch_side()
        return
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_dctpu_tpu"))
    print("[wpar] backend:", jax.default_backend(), flush=True)

    import bench
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.train import bind_cellwin_static, make_loss_fn

    cache = os.environ.get("DC_BENCH_CACHE", "/tmp/bench_workload.pkl")
    with open(cache + ".uncapped", "rb") as f:
        cfg, data_np, _full_nn = pickle.load(f)
    data = jax.tree_util.tree_map(jnp.asarray, data_np)

    loss_fn = make_loss_fn(cfg)
    loss_fn, bdata = bind_cellwin_static(loss_fn, data)
    params = {"model": ScaledPolynomial(w=jnp.zeros(1),
                                        exponent=jnp.asarray([4.0]))}
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params, bdata)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    t0 = time.perf_counter()
    p, o = params, opt_state
    traj = []
    for i in range(1 + STEPS):
        loss, p, o = step(p, o)
        if (i + 1) % 10 == 0 or i == 0:
            traj.append((i + 1, p["model"].w))
    w_ours = float(np.asarray(p["model"].w)[0])
    loss_ours = float(loss)
    print("[wpar] ours: %d steps in %.1f s, w=%.9e, loss=%.6e"
          % (1 + STEPS, time.perf_counter() - t0, w_ours, loss_ours),
          flush=True)
    for it, w in traj:
        print("[wpar]   ours w@%3d = %.9e" % (it, float(np.asarray(w)[0])),
              flush=True)
    if SIDE == "ours":
        print("OURS W %d STEPS: %.9e" % (1 + STEPS, w_ours), flush=True)
        return

    w_t = run_torch_side()
    rel = abs(w_ours - w_t) / max(abs(w_t), 1e-30)
    print("W PARITY 100 STEPS: ours %.9e vs torch-f64 %.9e -> rel err %.3e"
          % (w_ours, w_t, rel), flush=True)


def run_torch_side() -> float:
    """torch-f64 trajectory on the cached workload, numpy-only inputs
    (no JAX backend is initialized on this path)."""
    import bench

    cache = os.environ.get("DC_BENCH_CACHE", "/tmp/bench_workload.pkl")
    with open(cache + ".uncapped", "rb") as f:
        cfg, data_np, _full_nn = pickle.load(f)
    t0 = time.perf_counter()
    ms, _loss0_t, w_t = bench.bench_torch_baseline(cfg, data_np, steps=STEPS)
    print("[wpar] torch-f64: %d steps in %.1f s (%.0f ms/step)"
          % (1 + STEPS, time.perf_counter() - t0, ms), flush=True)
    print("TORCH W %d STEPS: %.9e" % (1 + STEPS, w_t), flush=True)
    return w_t


if __name__ == "__main__":
    main()
