"""Experiment: 16-bit-packed gathers for the moments forward/backward.

TPU gathers run ~2.7x faster on 16-bit elements (measured round 1), but the
first packing attempt padded HBM badly with the (M, K) index layout. This
re-tests with the (K, M) lane layout used by the current moments kernel:
pack the f32 (C, M) table into u16 (2C, M), gather, recombine.
"""
from __future__ import annotations

import sys
import time

import numpy as np


def timeit(fn, *args, steps=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")

    rng = np.random.default_rng(0)
    m, mq, k = 390144, 66048, 32
    table = jnp.asarray(rng.normal(size=(3, m)).astype(np.float32))
    idxT = jnp.asarray(rng.integers(0, m, (k, mq)).astype(np.int32))

    @jax.jit
    def gather_f32(table, idxT):
        return jnp.take(table, idxT, axis=1)  # (3, K, Mq)

    def _u16_impl(table, idxT):
        c = table.shape[0]
        u32 = jax.lax.bitcast_convert_type(table, jnp.uint32)
        lo = (u32 & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        hi = (u32 >> jnp.uint32(16)).astype(jnp.uint16)
        packed = jnp.concatenate([lo, hi], axis=0)  # (2C, M)
        g = jnp.take(packed, idxT, axis=1)  # (2C, K, Mq)
        glo = g[:c].astype(jnp.uint32)
        ghi = g[c:].astype(jnp.uint32)
        return jax.lax.bitcast_convert_type(
            (ghi << jnp.uint32(16)) | glo, jnp.float32
        )

    gather_u16 = jax.jit(_u16_impl)

    t32 = timeit(gather_f32, table, idxT)
    t16 = timeit(gather_u16, table, idxT)
    print("f32 gather (3,%d)@(%d,%d): %.2f ms" % (m, k, mq, t32))
    print("u16-packed gather:          %.2f ms" % t16)

    out32 = gather_f32(table, idxT)
    out16 = gather_u16(table, idxT)
    print("identical:", bool(jnp.array_equal(out32, out16)))

    # Backward-style: (9, Mq) table gathered through (Kt, M) transpose idx.
    kt = 8
    table9 = jnp.asarray(rng.normal(size=(9, mq)).astype(np.float32))
    tidxT = jnp.asarray(rng.integers(0, mq, (kt, m)).astype(np.int32))
    t32b = timeit(gather_f32, table9, tidxT)
    t16b = timeit(jax.jit(_u16_impl), table9, tidxT)
    print("bwd f32 (9,%d)@(%d,%d): %.2f ms" % (mq, kt, m, t32b))
    print("bwd u16:                 %.2f ms" % t16b)


if __name__ == "__main__":
    main()
