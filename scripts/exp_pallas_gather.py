"""Does Mosaic lower a VECTOR gather from a VMEM-resident table — and how
fast is a fused gather+moments kernel vs the XLA gather path?

The step profile (scripts/profile_step.py) shows the (3, M) position gather
IS the step: 46 of 46.5 ms forward. The table is only ~5-13 MB padded —
VMEM-resident — so if Mosaic can gather with vector indices, the per-index
cost drops from HBM-latency-bound to on-chip.

Stages:
  1. lowering probe: tiny shapes, does pallas_call compile at all?
  2. timing: gather+reduce kernel vs jnp.take at bench scale.
"""
from __future__ import annotations

import sys
import time

import numpy as np


def timeit(fn, *args, steps=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("device:", jax.devices()[0])

    # ---- stage 1: lowering probe -----------------------------------------
    M, K, T = 16384, 32, 512

    def probe_kernel(pts_ref, idx_ref, out_ref):
        pts = pts_ref[...]  # (3, M)
        idx = idx_ref[...].reshape(-1)  # (T*K,)
        g = jnp.take(pts, idx, axis=1)  # vector gather from VMEM
        out_ref[...] = jnp.sum(g.reshape(3, T, K), axis=2)

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(3, M)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, M, (T, K)), jnp.int32)

    try:
        out = pl.pallas_call(
            probe_kernel,
            out_shape=jax.ShapeDtypeStruct((3, T), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(pts, idx)
        ref = jnp.sum(
            jnp.take(pts, idx.reshape(-1), axis=1).reshape(3, T, K), axis=2
        )
        err = float(jnp.max(jnp.abs(out - ref)))
        print("probe: lowered OK, max err %.2e" % err)
    except Exception as e:
        print("probe: FAILED to lower: %s" % str(e)[:500])
        return

    # ---- stage 2: bench-scale timing -------------------------------------
    M = 390144
    MQ = 223744
    K = 32
    T = 1024  # queries per grid step
    pts = jnp.asarray(rng.normal(size=(3, M)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, M, (MQ, K)), jnp.int32)
    w = jnp.asarray(rng.random((MQ, K)) > 0.1, jnp.float32)

    def moments_kernel(pts_ref, idx_ref, w_ref, mean_ref, comp_ref):
        pts_t = pts_ref[...]  # (3, M) resident
        idx_b = idx_ref[...]  # (T, K)
        w_b = w_ref[...]  # (T, K)
        g = jnp.take(pts_t, idx_b.reshape(-1), axis=1).reshape(3, T, K)
        wsum = jnp.maximum(jnp.sum(w_b, axis=-1), 1e-12)  # (T,)
        mean = jnp.sum(g * w_b[None], axis=2) / wsum  # (3, T)
        c = g - mean[:, :, None]
        cw = c * w_b[None]
        denom = jnp.maximum(wsum - 1.0, 1e-6)
        comp_ref[0] = jnp.sum(cw[0] * c[0], -1) / denom
        comp_ref[1] = jnp.sum(cw[1] * c[1], -1) / denom
        comp_ref[2] = jnp.sum(cw[2] * c[2], -1) / denom
        comp_ref[3] = jnp.sum(cw[0] * c[1], -1) / denom
        comp_ref[4] = jnp.sum(cw[0] * c[2], -1) / denom
        comp_ref[5] = jnp.sum(cw[1] * c[2], -1) / denom
        mean_ref[...] = mean

    grid = MQ // T
    fused = pl.pallas_call(
        moments_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((3, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, MQ), jnp.float32),
            jax.ShapeDtypeStruct((6, MQ), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    fused_j = jax.jit(fused)

    sys.path.insert(0, "/root/repo")
    from depth_correction_tpu.ops.features import _moments_impl

    xla_j = jax.jit(lambda p, i, ww: _moments_impl(p, i, ww)[:2])

    try:
        out = fused_j(pts, idx, w)
        mean_f = np.asarray(out[0])
        mean_x = np.asarray(xla_j(pts.T, idx, w)[0])
        print("fused kernel: max mean err %.2e"
              % float(np.max(np.abs(mean_f - mean_x))))
    except Exception as e:
        print("bench-scale kernel FAILED: %s" % str(e)[:500])
        return

    print("fused gather+moments: %7.2f ms" % timeit(fused_j, pts, idx, w))
    print("xla _moments_impl:    %7.2f ms" % timeit(xla_j, pts.T, idx, w))


if __name__ == "__main__":
    main()
