"""Attribute the capped-32 step regression 79.8 -> 109.5 ms (VERDICT r4
item 2).

Round 4 pinned precision=HIGHEST on every position-critical contraction
(the bf16 find); the capped-32 continuity row then regressed 37% with only
a row-count hand-wave. This harness loads the capped cache and times the
SAME step graph under three precision policies by rebinding the shared
``PPREC`` module constants before tracing:

  1. HIGHEST everywhere (shipping default — r4's 109.5 ms condition)
  2. DEFAULT everywhere (the r3-era bf16 condition — values knowingly
     quantized; timing attribution only)
  3. DEFAULT only in ops.covs (weighted_cov is the per-step (M,K,3)
     contraction; isolates its share of the delta)

Prints loss rows + gather index counts so graph growth is attributed too.
"""
from __future__ import annotations

import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get("DC_AB_STEPS", "10"))


def time_step(cfg, data, label):
    import jax
    import jax.numpy as jnp
    import optax

    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.train import make_loss_fn

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

    loss, p, o = step(params, opt_state, data)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        loss, p, o = step(p, o, data)
    _ = float(loss)
    ms = (time.perf_counter() - t0) / STEPS * 1e3
    print("%-28s %8.2f ms/step (loss %.6e)" % (label, ms, float(loss)),
          flush=True)
    return ms


def set_pprec(prec, only=None):
    """Rebind the shared PPREC in every consuming module (trace-time
    lookup; fresh jit objects per variant)."""
    import jax

    import depth_correction_tpu.models as models
    import depth_correction_tpu.ops.covs as covs
    import depth_correction_tpu.ops.se3 as se3
    import depth_correction_tpu.preproc as preproc

    mods = {"se3": se3, "covs": covs, "preproc": preproc, "models": models}
    for name, m in mods.items():
        m.PPREC = (prec if only is None or name in only
                   else jax.lax.Precision.HIGHEST)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_dctpu_tpu"))
    print("[prec-ab] backend:", jax.default_backend(), flush=True)

    cache = os.environ.get("DC_BENCH_CACHE", "/tmp/bench_workload.pkl")
    with open(cache + ".capped", "rb") as f:
        cfg, data_np, _full_nn = pickle.load(f)
    data = jax.tree_util.tree_map(jnp.asarray, data_np)

    rows = sum(int(np.asarray(m).sum()) for m in data.masks)
    idx_fwd = sum(int(np.prod(np.asarray(nn).shape)) for nn in data.neighbors)
    pairs_t = sum(
        sum(int(np.prod(np.asarray(b).shape)) for b in tg.idx)
        for tg in data.t_neighbors if tg is not None
    )
    print("[prec-ab] capped graph: %d loss rows, %d fwd gather indices, "
          "%d transpose pairs" % (rows, idx_fwd, pairs_t), flush=True)

    set_pprec(jax.lax.Precision.HIGHEST)
    ms_high = time_step(cfg, data, "1 HIGHEST everywhere")
    set_pprec(jax.lax.Precision.DEFAULT)
    ms_def = time_step(cfg, data, "2 DEFAULT everywhere")
    set_pprec(jax.lax.Precision.DEFAULT, only={"covs"})
    ms_covs = time_step(cfg, data, "3 DEFAULT in covs only")
    set_pprec(jax.lax.Precision.HIGHEST)

    print("\nHIGHEST cost: %.2f ms total; weighted_cov share %.2f ms; "
          "rest (se3/preproc/models) %.2f ms"
          % (ms_high - ms_def, ms_high - ms_covs,
             ms_covs - ms_def), flush=True)


if __name__ == "__main__":
    main()
