"""Measure the training step (fwd / fwd+bwd / full) on the bench workload.

Uses the DC_BENCH_CACHE workload for fast iteration and float() materialized
timing (phantom-safe through the axon tunnel). The cached pickle carries
prebuilt transpose graphs; they are REBUILT here so the current bucket
ladder is what gets measured (and its index inflation printed).

History of measurements this harness family settled:
- u16-packed gathers: 2.3x faster isolated, 1.6x slower in-step (the
  16->32-bit recombination cannot fuse into the moments math) — rejected.
- arithmetic-by-8 bucket ladder: transpose-pair inflation 1.50x -> 1.20x,
  step 88.5 -> 79.8 ms — adopted.
- Morton point-table layout (cfg.spatial_sort): exact, but 82.9 vs
  79.7 ms — the XLA TPU gather cost is per-INDEX, not locality-bound
  (random vs establishment-coherent indices measure identically,
  exp_gather_variants) — kept as opt-in, default off.
- bf16 hi/lo split tables (2- and 3-way): gather 2.1x faster isolated but
  73/78 ms in the real moments vs 47 — the bf16->f32 convert forces the
  same vector relayout as u16 (exp_bf16_split) — rejected.
- Pallas VMEM-resident gather: Mosaic does not lower vector gathers on
  v5e (remote compiler crash; exp_pallas_gather*) — rejected.
- lax.gather with slice_sizes (9 cell-window slices instead of 32 row
  indices): 1700 ns/idx, 250x worse — XLA serializes sliced gathers
  (exp_slice_gather) — rejected.
- Conclusion: the step is gather-bound at ~6.7 ns/index fwd (~4 ns bwd);
  fwd+bwd move ~15.3M indices -> ~76 ms, i.e. the measured 79.7 ms step
  sits within ~1.3x (the transpose-pair inflation) of the per-index bound
  of XLA's TPU gather primitive.
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


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, "/root/repo")
    os.environ.setdefault("DC_BENCH_CACHE", "/tmp/bench_workload.pkl")
    from bench import build_workload, to_device
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.ops.features import build_bucketed_transpose
    from depth_correction_tpu.train import make_loss_fn

    # DC_STEP_AB_MODE=capped|uncapped (default capped: the gather-engine
    # continuity graph this harness family historically measured).
    uncapped = os.environ.get("DC_STEP_AB_MODE", "capped") == "uncapped"
    cfg, data, _ = build_workload(uncapped)

    new_t = []
    for i, nn in enumerate(data.neighbors):
        m = int(np.prod(np.asarray(data.batches[i].cloud.depth).shape))
        w = np.asarray(data.weights[i])
        tg = build_bucketed_transpose(np.asarray(nn), num_points=m, weights=w)
        pairs = sum(int(np.prod(b.shape)) for b in tg.idx)
        real = int((np.asarray(nn) >= 0).sum())
        print("seq %d: transpose pairs %d (real %d, inflation %.2fx, "
              "buckets %s)" % (i, pairs, real, pairs / max(real, 1),
                               [b.shape for b in tg.idx]))
        new_t.append(tg)
    data = dataclasses.replace(data, t_neighbors=tuple(new_t))

    device = jax.devices()[0]
    data = to_device(data, device)
    loss_fn = make_loss_fn(cfg)
    params = to_device(
        {"model": ScaledPolynomial(w=jnp.zeros(1), exponent=jnp.asarray([4.0]))},
        device,
    )
    tx = optax.adam(cfg.lr)
    opt_state = to_device(tx.init(params), device)

    @jax.jit
    def step(params, opt_state, data):
        loss, grads = jax.value_and_grad(loss_fn)(params, data)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    fwd = jax.jit(loss_fn)
    fwdbwd = jax.jit(lambda p, d: jax.value_and_grad(loss_fn)(p, d))

    print("fwd:      %7.2f ms" % timeit(fwd, params, data))
    print("fwd+bwd:  %7.2f ms" % timeit(fwdbwd, params, data))
    print("step:     %7.2f ms" % timeit(step, params, opt_state, data))


if __name__ == "__main__":
    main()
