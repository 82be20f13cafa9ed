"""Measure neighbor-gather variants on the REAL bench workload arrays.

Each variant reduces its output to a scalar inside the jit and the timer
materializes that scalar with float() — through the axon tunnel
``block_until_ready`` can return before execution (phantom 0.02 ms
readings), a host read of the result cannot.
"""
from __future__ import annotations

import sys
import time

import numpy as np


def timeit(fn, *args, steps=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import build_workload, to_device
    from depth_correction_tpu.ops.features import _moments_impl

    cfg, data, _ = build_workload()
    device = jax.devices()[0]
    data = to_device(data, device)
    batch = data.batches[0]
    nn = data.neighbors[0]
    w = data.weights[0]
    mq, k = nn.shape
    m = int(np.prod(np.asarray(batch.cloud.depth).shape))
    rng = np.random.default_rng(0)
    pts = jax.device_put(
        jnp.asarray(rng.normal(size=(m, 3)).astype(np.float32)), device
    )
    idxT = jnp.maximum(nn, 0).T  # (K, Mq) real indices (spatially coherent)
    idxT = jax.device_put(idxT, device)
    print("sizes: M=%d Mq=%d K=%d -> %d indices" % (m, mq, k, mq * k))

    @jax.jit
    def g_f32(pts, idxT):
        return jnp.sum(jnp.take(pts.T, idxT, axis=1))

    @jax.jit
    def g_u16(pts, idxT):
        t = pts.T
        u32 = jax.lax.bitcast_convert_type(t, jnp.uint32)
        lo = (u32 & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        hi = (u32 >> jnp.uint32(16)).astype(jnp.uint16)
        packed = jnp.concatenate([lo, hi], axis=0)  # (6, M)
        g = jnp.take(packed, idxT, axis=1)  # (6, K, Mq)
        c = t.shape[0]
        out = jax.lax.bitcast_convert_type(
            (g[c:].astype(jnp.uint32) << jnp.uint32(16))
            | g[:c].astype(jnp.uint32),
            jnp.float32,
        )
        return jnp.sum(out)

    @jax.jit
    def g_bf16(pts, idxT):
        return jnp.sum(jnp.take(pts.T.astype(jnp.bfloat16), idxT, axis=1)
                       .astype(jnp.float32))

    @jax.jit
    def g_1row(pts, idxT):
        # Single-component gather: is the leading component axis free?
        return jnp.sum(jnp.take(pts[:, 0], idxT.ravel()))

    @jax.jit
    def g_rowmajor(pts, nn):
        # (Mq, K) index layout, rows of (M, 3): the layout the docstrings
        # call 10-30x slower; sanity-check that claim still holds.
        return jnp.sum(jnp.take(pts, jnp.maximum(nn, 0), axis=0))

    @jax.jit
    def moments(pts, nn, w):
        mean, comps, _ = _moments_impl(pts, nn, w)
        return sum(jnp.sum(c) for c in comps) + jnp.sum(mean)

    print("gather f32 (3,M)@(K,Mq): %7.2f ms" % timeit(g_f32, pts, idxT))
    print("gather u16-packed:       %7.2f ms" % timeit(g_u16, pts, idxT))
    print("gather bf16:             %7.2f ms" % timeit(g_bf16, pts, idxT))
    print("gather 1 component:      %7.2f ms" % timeit(g_1row, pts, idxT))
    print("moments fwd full:        %7.2f ms" % timeit(moments, pts, nn, w))
    try:
        print("gather row-major:        %7.2f ms" % timeit(g_rowmajor, pts, nn))
    except Exception as e:  # noqa: BLE001
        print("row-major failed: %s" % e)

    # Random (incoherent) indices: does locality matter?
    ridxT = jax.device_put(
        jnp.asarray(rng.integers(0, m, (k, mq)).astype(np.int32)), device
    )
    print("gather f32 random idx:   %7.2f ms" % timeit(g_f32, pts, ridxT))


if __name__ == "__main__":
    main()
