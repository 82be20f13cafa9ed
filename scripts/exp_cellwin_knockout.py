"""Knock-out profile of the cellwin forward kernel (r5).

The roofline showed the fwd kernel at ~21 ms with DMA ~free and the
stacked-dot change flat — so the cost is in-kernel compute/overhead, but
WHICH part? This probe re-times the real-table forward kernel with pieces
disabled one at a time (trace-time switches; each variant is a separate
Pallas program):

  full       parity with the shipping kernel
  dot1       one plain DEFAULT dot (no mantissa splits)
  no_dot     matmul removed           (d2 + masks + feats remain)
  no_d2      membership test removed  (wm = span mask broadcast)
  no_feats   feats = constant ones    (d2 + masks + dot remain)
  no_mask    col-iota/lead-len masking removed (UNSAFE numerically;
             timing attribution only)
  empty      body = copy q to out     (grid + DMA + block overhead floor)

Usage: DC_BENCH_CACHE=/tmp/bench_workload.pkl python scripts/exp_cellwin_knockout.py
"""
from __future__ import annotations

import os
import pickle
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("DC_KO_REPS", "10"))


def make_kernel(ns: int, s_cap: int, r2: float, mode: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from depth_correction_tpu.ops.cellwin import (
        _moment_dot,
        _span_iota,
        _span_iota_col,
    )

    def kernel(start_ref, lead_ref, len_ref, ctr_ref, c_ref, q_ref, out_ref,
               win_ref, sems):
        t = pl.program_id(0)
        for s in range(ns):
            @pl.when(len_ref[t * ns + s] > 0)
            def _(s=s):
                pltpu.make_async_copy(
                    c_ref.at[
                        :,
                        pl.ds(pl.multiple_of(start_ref[t * ns + s], 128),
                              s_cap),
                    ],
                    win_ref.at[s],
                    sems.at[s],
                ).start()

        q = q_ref[:]
        dt = q.dtype
        if mode == "empty":
            for s in range(ns):
                @pl.when(len_ref[t * ns + s] > 0)
                def _(s=s):
                    pltpu.make_async_copy(
                        c_ref.at[
                            :,
                            pl.ds(pl.multiple_of(start_ref[t * ns + s], 128),
                                  s_cap),
                        ],
                        win_ref.at[s],
                        sems.at[s],
                    ).wait()
            out_ref[:] = jnp.concatenate([q, q], axis=0)
            return
        cx = ctr_ref[t * 3 + 0].astype(dt)
        cy = ctr_ref[t * 3 + 1].astype(dt)
        cz = ctr_ref[t * 3 + 2].astype(dt)
        qx = q[0:1, :] - cx
        qy = q[1:2, :] - cy
        qz = q[2:3, :] - cz

        acc = jnp.zeros((16, q.shape[1]), dt)
        feats_k = []
        wm_k = []
        for s in range(ns):
            ln = len_ref[t * ns + s]
            lead = lead_ref[t * ns + s]

            @pl.when(ln > 0)
            def _(s=s):
                pltpu.make_async_copy(
                    c_ref.at[
                        :,
                        pl.ds(pl.multiple_of(start_ref[t * ns + s], 128),
                              s_cap),
                    ],
                    win_ref.at[s],
                    sems.at[s],
                ).wait()
            w8 = win_ref[s]
            col = _span_iota_col(s_cap)
            sl = (col >= lead) & (col < lead + ln)
            if mode == "no_d2":
                wm = jnp.where(sl, jnp.asarray(1.0, dt),
                               jnp.asarray(0.0, dt)) * jnp.ones(
                    (s_cap, q.shape[1]), dt)
            else:
                ex = (w8[3:4, :] - cx).reshape(s_cap, 1)
                ey = (w8[4:5, :] - cy).reshape(s_cap, 1)
                ez = (w8[5:6, :] - cz).reshape(s_cap, 1)
                dx = ex - qx
                dy = ey - qy
                dz = ez - qz
                d2 = dx * dx + dy * dy + dz * dz
                if mode == "no_mask":
                    wm = jnp.where(d2 <= r2, jnp.asarray(1.0, dt),
                                   jnp.asarray(0.0, dt))
                else:
                    wm = jnp.where((d2 <= r2) & sl, jnp.asarray(1.0, dt),
                                   jnp.asarray(0.0, dt))
            if mode == "no_feats":
                feats = jnp.ones((16, s_cap), dt)
            else:
                x0 = w8[0:1, :] - cx
                x1 = w8[1:2, :] - cy
                x2 = w8[2:3, :] - cz
                one = jnp.ones_like(x0)
                zero = jnp.zeros_like(x0)
                feats = jnp.concatenate(
                    [one, x0, x1, x2, x0 * x0, x1 * x1, x2 * x2,
                     x0 * x1, x0 * x2, x1 * x2,
                     zero, zero, zero, zero, zero, zero],
                    axis=0,
                )
                if mode != "no_mask":
                    row = _span_iota(s_cap)
                    feats = jnp.where((row >= lead) & (row < lead + ln),
                                      feats, 0.0)
            if mode == "no_dot":
                acc = acc + feats[:, : q.shape[1]] + wm[0:16, :]
            elif mode == "dot1":
                acc = acc + jnp.dot(feats, wm, preferred_element_type=dt)
            elif mode in ("kcat1", "kcat3"):
                feats_k.append(feats)
                wm_k.append(wm)
            else:
                acc = acc + _moment_dot(feats, wm, dt)
        if mode in ("kcat1", "kcat3"):
            # K-concatenation: the per-span dots are pipeline-FILL bound
            # (~225 cycles for 16 streamed rows); concatenating the spans
            # along K pays the fill once per tile.
            fk = jnp.concatenate(feats_k, axis=1)  # (16, ns*S)
            wk = jnp.concatenate(wm_k, axis=0)  # (ns*S, R)
            if mode == "kcat1":
                acc = jnp.dot(fk, wk, preferred_element_type=dt)
            else:
                acc = _moment_dot(fk, wk, dt)
        out_ref[:] = acc

    return kernel


def run_variant(mode, dev, pts_sorted, reps=REPS):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t1, r_cap, s_cap, ns_f, t2, p_cap, sr_cap, ns_b, r2 = dev.dims
    m_pad = pts_sorted.shape[0]
    dt = pts_sorted.dtype
    mq_pad = dev.q_est.shape[1]

    def call(p):
        sentinel = jnp.full((3, s_cap), 1e15, dt)
        c_tab = jnp.concatenate(
            [
                jnp.concatenate([p.T, jnp.zeros((3, s_cap), dt)], 1),
                jnp.concatenate([dev.est_sorted[:3].astype(dt), sentinel], 1),
                jnp.zeros((2, m_pad + s_cap), dt),
            ],
            axis=0,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(t1,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((8, r_cap), lambda t, *_: (0, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((16, r_cap), lambda t, *_: (0, t),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((ns_f, 8, s_cap), dt),
                pltpu.SemaphoreType.DMA((ns_f,)),
            ],
        )
        return pl.pallas_call(
            make_kernel(ns_f, s_cap, r2, mode),
            out_shape=jax.ShapeDtypeStruct((16, mq_pad), dt),
            grid_spec=grid_spec,
        )(dev.f_start.reshape(-1), dev.f_lead.reshape(-1),
          dev.f_len.reshape(-1), dev.f_ctr.reshape(-1), c_tab,
          dev.q_est.astype(dt))

    run = jax.jit(lambda tok: call(pts_sorted + 0.0 * tok))
    out = run(jnp.zeros(()))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    tok = out[0, 0]
    for _ in range(reps):
        out = run(tok)
        tok = out[0, 0]
    _ = float(tok)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print("%-10s %9.2f ms" % (mode, ms), flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_dctpu_tpu"))
    print("[knockout] backend:", jax.default_backend(), flush=True)

    from depth_correction_tpu.ops.features import permute_rows
    from depth_correction_tpu.preproc import global_cloud

    cache = os.environ.get("DC_BENCH_CACHE", "/tmp/bench_workload.pkl")
    with open(cache + ".uncapped", "rb") as f:
        cfg, data_np, _full_nn = pickle.load(f)
    data = jax.tree_util.tree_map(jnp.asarray, data_np)
    dev = data.cellwin[0]
    assert dev is not None
    gcloud = global_cloud(data.batches[0])
    pts_sorted = permute_rows(gcloud.get_points(), dev.perm, dev.inv)
    pts_sorted = jax.device_put(pts_sorted)

    import sys as _sys

    modes = (_sys.argv[1].split(",") if len(_sys.argv) > 1 else
             ("full", "dot1", "no_dot", "no_d2", "no_feats", "no_mask",
              "kcat1", "kcat3", "empty"))
    for mode in modes:
        run_variant(mode, dev, pts_sorted)


if __name__ == "__main__":
    main()
