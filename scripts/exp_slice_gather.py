"""Is XLA's TPU gather per-INDEX bound — and do wider slices amortize it?

Measured so far (bench workload, 7.16M indices): f32 (3,M) take 46 ms,
u16/bf16 packings win isolated but lose in-step (relayout), locality and
Pallas don't apply. Forward ~6.4 ns/index, backward ~4.0 ns/index despite
3x the bytes -> per-index overhead dominates, bytes are nearly free.

If true, replacing 32 single-row gathers per query with 9 contiguous
cell-window SLICES (lax.gather slice_sizes=(3, W)) cuts the index count
3.6x. This measures the primitive: same total useful volume, index count
/ slice width swept.
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
    from jax import lax

    rng = np.random.default_rng(0)
    m = 390144
    n_idx_base = 7159808  # bench forward index count
    pts = jnp.asarray(rng.normal(size=(3, m)).astype(np.float32))

    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def make_sliced(w):
        n = n_idx_base // w  # same useful volume

        idx = np.stack(
            [np.zeros(n, np.int32), rng.integers(0, m - w, n, endpoint=False).astype(np.int32)],
            axis=1,
        )
        idx_j = jnp.asarray(idx)

        @jax.jit
        def f(pts, idx_j):
            g = lax.gather(
                pts, idx_j, dnums, slice_sizes=(3, w),
                mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )  # (n, 3, w)
            return jnp.sum(g)

        return f, idx_j

    @jax.jit
    def take_ref(pts, idxT):
        return jnp.sum(jnp.take(pts, idxT, axis=1))

    idxT = jnp.asarray(
        rng.integers(0, m, (32, n_idx_base // 32)).astype(np.int32)
    )
    t = timeit(take_ref, pts, idxT)
    print("take single rows (%d idx):   %7.2f ms  (%.2f ns/idx)"
          % (n_idx_base, t, t * 1e6 / n_idx_base))

    for w in (4, 8, 16, 32, 64):
        f, idx_j = make_sliced(w)
        n = int(idx_j.shape[0])
        t = timeit(f, pts, idx_j)
        print("sliced gather W=%-3d (%d idx): %7.2f ms  (%.2f ns/idx)"
              % (w, n, t, t * 1e6 / n))


if __name__ == "__main__":
    main()
