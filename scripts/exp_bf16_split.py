"""Split-bf16 gather table in the REAL moments computation.

gather variants (exp_gather_variants) measured on the bench workload:
f32 (3,M) 46.1 ms, u16-packed 20.1 ms, bf16 22.3 ms — and the u16 path
was rejected in-step because the integer bit-reassembly forces a vector
relayout that cannot fuse. This experiment tests the FLOAT split instead:

  hi = bf16(x), lo = bf16(x - f32(hi)), x' = f32(hi) + f32(lo)

- one (6, M) bf16 gather (u16-shaped -> the fast path),
- recombination is two converts + one add (plain float elementwise),
- |x - x'| <= ~2^-17 |x| (~16-17 mantissa bits); a 3-way split (9, M)
  recovers ~24 bits (f32-exact to 1-2 ulp).

Measures the full moments forward (mean + 6 cov comps reduced to a
scalar) for f32 / bf16x2 / bf16x3, plus max deviation vs f32.
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
    nn = jax.device_put(data.neighbors[0], device)
    w = jax.device_put(data.weights[0], device)
    mq, k = nn.shape
    m = int(np.prod(np.asarray(data.batches[0].cloud.depth).shape))
    rng = np.random.default_rng(0)
    pts = jax.device_put(
        jnp.asarray(rng.uniform(-20, 20, (m, 3)).astype(np.float32)), device
    )

    def split2(ptsT):
        hi = ptsT.astype(jnp.bfloat16)
        lo = (ptsT - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([hi, lo], axis=0)  # (6, M) bf16

    def split3(ptsT):
        hi = ptsT.astype(jnp.bfloat16)
        r1 = ptsT - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([hi, mid, lo], axis=0)  # (9, M) bf16

    def moments_from_nbr(nbr, w):
        wT = w.T
        ww = wT[None]
        w_sum = jnp.maximum(jnp.sum(wT, axis=0), 1e-12)
        mean = jnp.sum(nbr * ww, axis=1) / w_sum
        c = nbr - mean[:, None, :]
        cw = c * ww
        denom = jnp.maximum(jnp.sum(wT, axis=0) - 1.0, 1e-6)

        def cc(a, b):
            return jnp.sum(cw[a] * c[b], axis=0) / denom

        comps = (cc(0, 0), cc(1, 1), cc(2, 2), cc(0, 1), cc(0, 2), cc(1, 2))
        return mean, comps

    @jax.jit
    def mom_f32(pts, nn, w):
        mean, comps, _ = _moments_impl(pts, nn, w)
        return sum(jnp.sum(c) for c in comps) + jnp.sum(mean)

    @jax.jit
    def mom_bf2(packed, nn, w):
        idxT = jnp.maximum(nn, 0).T
        g = jnp.take(packed, idxT, axis=1)  # (6, K, Mq)
        nbr = g[:3].astype(jnp.float32) + g[3:].astype(jnp.float32)
        mean, comps = moments_from_nbr(nbr, w)
        return sum(jnp.sum(c) for c in comps) + jnp.sum(mean)

    @jax.jit
    def mom_bf3(packed, nn, w):
        idxT = jnp.maximum(nn, 0).T
        g = jnp.take(packed, idxT, axis=1)  # (9, K, Mq)
        nbr = (
            g[:3].astype(jnp.float32)
            + g[3:6].astype(jnp.float32)
            + g[6:].astype(jnp.float32)
        )
        mean, comps = moments_from_nbr(nbr, w)
        return sum(jnp.sum(c) for c in comps) + jnp.sum(mean)

    # Accuracy probe (per-row comps, not the scalar): small slice.
    @jax.jit
    def comps_f32(pts, nn, w):
        _, comps, _ = _moments_impl(pts, nn, w)
        return jnp.stack(comps)

    from functools import partial

    @partial(jax.jit, static_argnames=("parts",))
    def comps_bf(packed, nn, w, parts):
        idxT = jnp.maximum(nn, 0).T
        g = jnp.take(packed, idxT, axis=1)
        nbr = sum(
            g[3 * i : 3 * (i + 1)].astype(jnp.float32) for i in range(parts)
        )
        _, comps = moments_from_nbr(nbr, w)
        return jnp.stack(comps)

    p2 = jax.device_put(split2(pts.T), device)
    p3 = jax.device_put(split3(pts.T), device)

    c_ref = np.asarray(comps_f32(pts, nn, w))
    scale = np.maximum(np.abs(c_ref), 1e-9)
    c2 = np.asarray(comps_bf(p2, nn, w, 2))
    c3 = np.asarray(comps_bf(p3, nn, w, 3))
    print("bf16x2 comps: max abs err %.3e  max rel %.3e"
          % (np.max(np.abs(c2 - c_ref)), np.max(np.abs(c2 - c_ref) / scale)))
    print("bf16x3 comps: max abs err %.3e  max rel %.3e"
          % (np.max(np.abs(c3 - c_ref)), np.max(np.abs(c3 - c_ref) / scale)))

    print("moments f32:    %7.2f ms" % timeit(mom_f32, pts, nn, w))
    print("moments bf16x2: %7.2f ms" % timeit(mom_bf2, p2, nn, w))
    print("moments bf16x3: %7.2f ms" % timeit(mom_bf3, p3, nn, w))


if __name__ == "__main__":
    main()
