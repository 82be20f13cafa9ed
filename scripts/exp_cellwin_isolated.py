"""Time the REAL cellwin forward/backward pallas calls in isolation.

The whole-step A/B measured 3586 ms/step with split3 dots while a
structural replica (exp_mosaic_dot_probe4.py, variant J) lowers at
~11 ms/512 tiles — this harness times the actual ``_fwd_call`` /
``_bwd_call`` on synthetic tables at the exact bench dimensions to tell
whether the slow path is the kernels themselves or the surrounding step.

DC_CELLWIN_PREC selects the dot mode (default: split3).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T1 = 2965  # row tiles (bench scale)
T2 = 2965  # point tiles
R_CAP = 128
P_CAP = 128
S_CAP = 640
SR_CAP = 512
NSPAN_NONEMPTY = 9
R2 = 0.0625
STEPS = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jax_dctpu_tpu"),
    )
    from depth_correction_tpu.ops.cellwin import NS, _bwd_call, _fwd_call

    print("backend: %s, prec=%s" % (
        jax.default_backend(), os.environ.get("DC_CELLWIN_PREC", "split3")),
        file=sys.stderr)

    rng = np.random.default_rng(0)
    m_pad = T2 * P_CAP
    mq_pad = T1 * R_CAP

    pts_sorted = rng.normal(scale=5.0, size=(m_pad, 3)).astype(np.float32)
    est_sorted = np.zeros((8, m_pad), np.float32)
    est_sorted[:3] = pts_sorted.T
    q_est = np.zeros((8, mq_pad), np.float32)
    q_est[:3] = rng.normal(scale=5.0, size=(3, mq_pad)).astype(np.float32)

    def span_tables(t, cap):
        starts = np.zeros((t, NS), np.int64)
        leads = np.zeros((t, NS), np.int64)
        lens = np.zeros((t, NS), np.int64)
        nz = rng.integers(0, NS, size=(t, NSPAN_NONEMPTY))
        for i in range(t):
            for s in set(nz[i].tolist()):
                starts[i, s] = int(rng.integers(0, m_pad // 128)) * 128
                leads[i, s] = int(rng.integers(0, 128))
                lens[i, s] = int(rng.integers(1, cap - 128))
        ctr = rng.normal(scale=5.0, size=(t, 3)).astype(np.float32)
        return (jnp.asarray(starts, jnp.int32), jnp.asarray(leads, jnp.int32),
                jnp.asarray(lens, jnp.int32), jnp.asarray(ctr))

    f_start, f_lead, f_len, f_ctr = span_tables(T1, S_CAP)
    b_start, b_lead, b_len, b_ctr = span_tables(T2, SR_CAP)

    pts = jnp.asarray(pts_sorted)
    est = jnp.asarray(est_sorted)
    qe = jnp.asarray(q_est)

    fwd = jax.jit(lambda p: _fwd_call(
        p, qe, est, f_start, f_lead, f_len, f_ctr,
        t1=T1, r_cap=R_CAP, s_cap=S_CAP, r2=R2))
    out = fwd(pts)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fwd(pts)
    float(jnp.sum(out))
    print("fwd  %8.2f ms/call (%d tiles)" % (
        (time.perf_counter() - t0) / STEPS * 1e3, T1))

    table9 = jnp.asarray(
        rng.normal(size=(9, mq_pad)).astype(np.float32))
    bwd = jax.jit(lambda p, t9: _bwd_call(
        p, qe, est, t9, b_start, b_lead, b_len, b_ctr,
        t2=T2, p_cap=P_CAP, sr_cap=SR_CAP, r2=R2))
    g = bwd(pts, table9)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        g = bwd(pts, table9)
    float(jnp.sum(g))
    print("bwd  %8.2f ms/call (%d tiles)" % (
        (time.perf_counter() - t0) / STEPS * 1e3, T2))


if __name__ == "__main__":
    main()
