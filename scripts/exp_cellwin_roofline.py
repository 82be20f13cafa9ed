"""Roofline accounting of the promoted cellwin step (VERDICT r4 item 3).

Loads the bench prep cache (DC_BENCH_CACHE=<path>, '.uncapped' suffix added)
and attributes the ~57 ms step on the REAL mini-span structure:

  A. fwd kernel, real tables            (DMAs + compute + grid overhead)
  B. fwd kernel, f_len := 0             (every span DMA skipped — the
     compute is unconditional and mask-selected, so A - B isolates the
     DMA issue+wait cost on the true span layout)
  C. bwd kernel, real tables / D. bwd kernel, b_len := 0
  E. cellwin_moments fwd (kernels + permute + exception merge)
  F. value_and_grad(loss)  G. full Adam step

plus the paper roofline (HBM bytes at ~819 GB/s, MXU flops) for the same
work, so the accounting states how far each term sits from light speed.

Phantom-safe: every timed loop chains the output into the next input and
ends in a float() materialization (see CLAUDE.md TPU timing rules).
"""
from __future__ import annotations

import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("DC_ROOFLINE_REPS", "10"))


def timed(name, fn, chain, reps=REPS):
    """fn(tok) -> (out_pytree, tok'); times reps chained calls."""
    import jax
    import jax.numpy as jnp

    out, tok = fn(jnp.zeros(()))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out, tok = fn(tok)
    _ = float(tok)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print("%-44s %9.2f ms" % (name, ms), flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(
            "~/.cache/jax_dctpu_tpu" if jax.default_backend() == "tpu"
            else "~/.cache/jax_dctpu_cpu"),
    )
    print("[roofline] backend:", jax.default_backend(), flush=True)

    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.ops import cellwin as cw
    from depth_correction_tpu.ops.features import (
        _cotangent_table,
        permute_rows,
    )
    from depth_correction_tpu.preproc import global_cloud
    from depth_correction_tpu.train import bind_cellwin_static, make_loss_fn

    cache = os.environ.get("DC_BENCH_CACHE", "/tmp/bench_workload.pkl")
    with open(cache + ".uncapped", "rb") as f:
        cfg, data_np, _full_nn = pickle.load(f)
    data = jax.tree_util.tree_map(jnp.asarray, data_np)
    dev = data.cellwin[0]
    assert dev is not None, "cache has no cellwin structure"
    t1, r_cap, s_cap, ns_f, t2, p_cap, sr_cap, ns_b, r2 = dev.dims
    n_dma_f = int(np.count_nonzero(np.asarray(dev.f_len)))
    n_dma_b = int(np.count_nonzero(np.asarray(dev.b_len)))
    print("[roofline] fwd: %d tiles x %d spans (R=%d S=%d), %d live DMAs"
          % (t1, ns_f, r_cap, s_cap, n_dma_f), flush=True)
    print("[roofline] bwd: %d tiles x %d spans (P=%d SR=%d), %d live DMAs"
          % (t2, ns_b, p_cap, sr_cap, n_dma_b), flush=True)

    gcloud = global_cloud(data.batches[0])
    pts = gcloud.get_points()
    pts_sorted = permute_rows(pts, dev.perm, dev.inv)

    f_tabs = (dev.q_est, dev.est_sorted, dev.f_start, dev.f_lead, dev.f_ctr)
    zero_flen = jnp.zeros_like(dev.f_len)
    zero_blen = jnp.zeros_like(dev.b_len)

    def make_fwd(f_len):
        q_est, est_sorted, f_start, f_lead, f_ctr = f_tabs

        @jax.jit
        def run(tok):
            p = pts_sorted + 0.0 * tok
            raw = cw._fwd_call(p, q_est, est_sorted, f_start, f_lead,
                               f_len, f_ctr, t1=t1, r_cap=r_cap,
                               s_cap=s_cap, ns_f=ns_f, r2=r2)
            return raw, raw[0, 0]
        return run

    ms_fwd = timed("A fwd kernel (real spans)", make_fwd(dev.f_len), None)
    ms_fwd0 = timed("B fwd kernel (f_len=0: no DMAs)", make_fwd(zero_flen),
                    None)

    # Backward with a synthetic-but-real-shaped cotangent table.
    raw = jax.jit(make_fwd(dev.f_len))(jnp.zeros(()))[0]
    mean, w_sum = raw[0:3], raw[9]
    cot = (jnp.ones_like(mean),
           tuple(jnp.ones_like(raw[0]) for _ in range(6)))
    table9 = _cotangent_table(mean, w_sum, cot)

    def make_bwd(b_len):
        @jax.jit
        def run(tok):
            p = pts_sorted + 0.0 * tok
            g = cw._bwd_call(p, dev.q_est, dev.est_sorted, table9,
                             dev.b_start, dev.b_lead, b_len, dev.b_ctr,
                             t2=t2, p_cap=p_cap, sr_cap=sr_cap, ns_b=ns_b,
                             r2=r2)
            return g, g[0, 0]
        return run

    ms_bwd = timed("C bwd kernel (real spans)", make_bwd(dev.b_len), None)
    ms_bwd0 = timed("D bwd kernel (b_len=0: no DMAs)", make_bwd(zero_blen),
                    None)

    @jax.jit
    def moments(tok):
        p = pts + 0.0 * tok
        ps = permute_rows(p, dev.perm, dev.inv)
        mean, comps = cw.cellwin_moments(ps, dev)
        return mean, mean[0, 0]

    ms_mom = timed("E cellwin_moments fwd (+permute +exc)", moments, None)

    loss_fn = make_loss_fn(cfg)
    loss_fn, bdata = bind_cellwin_static(loss_fn, data)
    params = {"model": ScaledPolynomial(w=jnp.zeros(1),
                                        exponent=jnp.asarray([4.0]))}

    @jax.jit
    def vg(tok):
        p = jax.tree_util.tree_map(lambda x: x + 0.0 * tok, params)
        loss, grads = jax.value_and_grad(loss_fn)(p, bdata)
        return loss, loss
    ms_vg = timed("F value_and_grad(loss)", vg, None)

    import optax
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(p, o, tok):
        p = jax.tree_util.tree_map(lambda x: x + 0.0 * tok, p)
        loss, grads = jax.value_and_grad(loss_fn)(p, bdata)
        updates, o = tx.update(grads, o, p)
        return loss, optax.apply_updates(p, updates), o

    p, o = params, opt_state
    loss, p, o = step_fn(p, o, jnp.zeros(()))
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    tok = loss
    for _ in range(REPS):
        loss, p, o = step_fn(p, o, tok)
        tok = loss
    _ = float(tok)
    ms_step = (time.perf_counter() - t0) / REPS * 1e3
    print("%-44s %9.2f ms" % ("G full Adam step", ms_step), flush=True)

    # ---- accounting ----
    dma_f = ms_fwd - ms_fwd0
    dma_b = ms_bwd - ms_bwd0
    print("\n[accounting]")
    print("fwd : %6.2f ms = %6.2f compute/overhead + %6.2f DMA "
          "(%d DMAs -> %.0f ns/DMA)"
          % (ms_fwd, ms_fwd0, dma_f, n_dma_f, dma_f * 1e6 / max(n_dma_f, 1)))
    print("bwd : %6.2f ms = %6.2f compute/overhead + %6.2f DMA "
          "(%d DMAs -> %.0f ns/DMA)"
          % (ms_bwd, ms_bwd0, dma_b, n_dma_b, dma_b * 1e6 / max(n_dma_b, 1)))
    print("E-A-C (permute + exception merge) : %6.2f ms"
          % (ms_mom - ms_fwd))
    print("F-E-C (loss graph around moments) : %6.2f ms"
          % (ms_vg - ms_mom - ms_bwd))
    print("G-F   (Adam)                      : %6.2f ms" % (ms_step - ms_vg))

    # ---- paper roofline ----
    hbm_gbs = 819.0  # v5e
    fwd_bytes = (n_dma_f * 8 * s_cap + t1 * (8 + 16) * r_cap) * 4
    bwd_bytes = (n_dma_b * 16 * sr_cap + t2 * (8 + 8) * p_cap) * 4
    # 3 mantissa-split MXU passes of (16, S) @ (S, R) per span slot
    fwd_flops = 3 * 2 * 16 * s_cap * r_cap * t1 * ns_f
    bwd_flops = 3 * 2 * 16 * sr_cap * p_cap * t2 * ns_b
    mxu_tflops = 197e12 / 2  # f32-ish effective on v5e bf16 passes
    print("\n[roofline] fwd HBM %.1f MB -> %.2f ms at %.0f GB/s; "
          "MXU %.1f GFLOP -> %.2f ms"
          % (fwd_bytes / 1e6, fwd_bytes / hbm_gbs / 1e6, hbm_gbs,
             fwd_flops / 1e9, fwd_flops / mxu_tflops * 1e3))
    print("[roofline] bwd HBM %.1f MB -> %.2f ms; MXU %.1f GFLOP -> %.2f ms"
          % (bwd_bytes / 1e6, bwd_bytes / hbm_gbs / 1e6,
             bwd_flops / 1e9, bwd_flops / mxu_tflops * 1e3))


if __name__ == "__main__":
    main()
