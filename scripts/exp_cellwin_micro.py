"""Micro-benchmark of the cell-window kernels on synthetic tables.

Times the forward and backward pallas_calls alone (no training step) over
a parameter sweep of tile shapes, to pin down the machine constants the
cost model needs (per-DMA issue cost, VPU d2 throughput, streaming-matmul
rate) before running the full A/B. Synthetic structure: T tiles, 9 of NS
spans non-empty and full (span_cap), random positions with r2 tuned to a
plausible hit rate — the kernels' cost does not depend on the data values,
only the shapes.

Phantom-safe: each timed loop chains the kernel output into the next
input and ends in a float() materialization.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 10


def run_case(t1, r_cap, s_cap, label):
    import jax
    import jax.numpy as jnp

    from depth_correction_tpu.ops import cellwin as cw

    rng = np.random.default_rng(0)
    m_pad = t1 * r_cap  # point table sized like the row table
    # 9 live spans per tile (a single-y tile), random starts
    f_start = np.zeros((t1, cw.NS), np.int32)
    f_len = np.zeros((t1, cw.NS), np.int32)
    live = [0, 1, 2, 5, 6, 7, 10, 11, 12]
    f_start[:, live] = rng.integers(0, max(m_pad - s_cap, 1), (t1, 9))
    f_len[:, live] = s_cap
    f_ctr = np.zeros((t1, 3), np.float32)
    q_est = np.zeros((8, t1 * r_cap), np.float32)
    q_est[:3] = rng.standard_normal((3, t1 * r_cap)).astype(np.float32)
    est_sorted = np.zeros((8, m_pad), np.float32)
    est_sorted[:3] = rng.standard_normal((3, m_pad)).astype(np.float32)
    pts = jnp.asarray(rng.standard_normal((m_pad, 3)).astype(np.float32))
    r2 = 1.0  # ~hit rate vs standard-normal distances

    args = (
        jnp.asarray(q_est), jnp.asarray(est_sorted),
        jnp.asarray(f_start), jnp.asarray(f_len), jnp.asarray(f_ctr),
    )

    fwd = jax.jit(
        lambda p: cw._fwd_call(
            p, *args, t1=t1, r_cap=r_cap, s_cap=s_cap, r2=r2
        )
    )
    out = fwd(pts)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        # chain: feed a slice of the output back into the input points
        pts = pts + 1e-9 * out[0, 0]
        out = fwd(pts)
    _ = float(out[0, 0])
    ms = (time.perf_counter() - t0) / REPS * 1e3
    n_dma = t1 * 9
    pairs = t1 * 9 * s_cap * r_cap
    print(
        "[micro] %-22s T=%5d R=%3d S=%4d: %7.3f ms  "
        "(%5.0f ns/DMA if DMA-bound, %5.2f ns/pair if pair-bound)"
        % (label, t1, r_cap, s_cap, ms, ms * 1e6 / n_dma,
           ms * 1e6 / pairs * 1e3)
    )
    return ms


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(
            "~/.cache/jax_dctpu_tpu"
            if jax.default_backend() == "tpu"
            else "~/.cache/jax_dctpu_cpu"
        ),
    )
    print("[micro] backend:", jax.default_backend(), file=sys.stderr)
    # bench-like shape, then sweeps that separate DMA count from pair count
    run_case(3200, 256, 512, "bench-like")
    run_case(3200, 256, 256, "half-window")
    run_case(6400, 128, 512, "half-rows")
    run_case(6400, 128, 256, "half-both")
    run_case(1600, 256, 512, "half-tiles")


if __name__ == "__main__":
    main()
