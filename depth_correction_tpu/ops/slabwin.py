"""Slab-window moments — the streaming (per-scan) neighborhood engine.

The online corrector must establish fresh within-r neighborhoods for every
incoming scan. Per-query gather windows (ops/grid_hash.py) are exact but
gather-bound on TPU (~5 ns/index; the first fused node program measured
611 ms/scan at 131k points). This module re-instantiates the cell-window
training engine's design (ops/cellwin.py: contiguous span fetches + dense
masked moment matmuls, reference objective src/depth_correction/
depth_cloud.py covariance/eigen features via query_ball_point) in PURE XLA
with fully traced establishment, so it runs per scan with zero host prep:

1. :func:`grid_hash.grid_sort_colpad_traced` cell-sorts the scan with the
   LONGEST grid axis major and every major-axis column 128-aligned, so
   each 128-query tile lives in ONE major column;
2. each tile's within-r candidates live in THREE contiguous ranges of the
   sorted table — the tile's second-axis (y) window [ylo-1, yhi+1] inside
   each of the 3 major slabs x-1, x, x+1 (every within-r neighbor of a
   tile row has |Δcell| <= 1 on both sorted axes, cell >= r). The first
   engine generation sliced the 3 WHOLE slabs as one range; wall-parallel
   surfaces packed entire walls into one slab (measured width 16384 — 53
   of the 113 ms/scan), where the y-window cuts the same tiles to ~1k;
3. a ``lax.scan`` over tiles does three ``dynamic_slice`` fetches (no
   gather), builds (W, 128) membership masks from exact d2 <= r2, and
   accumulates the 10-row moment matrix on the MXU at ``PPREC`` — the
   same one-pass tile-center-shifted moments the cellwin kernels compute
   (f32-exact to ~2^-24 relative; see ops/cellwin.py epilogue). Tiles
   with no valid rows (column-padding tail) skip all work via
   ``lax.cond``.

A tile that DOES straddle columns (only possible on a non-column-aligned
layout) falls back to one whole-slab range covering [x_lo-1, x_hi+1] —
exactness is layout-independent; only the width (and hence the retry
escalation) depends on it.

The only data-dependent static is the span width ``w_slab``; the true
maximum rides out as a scalar so streaming callers verify coverage in the
same fetch as the outputs and retry wider once (node.py pattern). No K cap
anywhere: the moments are the reference's uncapped query_ball_point
objective exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .se3 import PPREC

__all__ = ["slab_window_moments", "TILE"]

TILE = 128


def slab_window_moments(pts_T, valid, ids_sorted, dims, r2, w_slab: int,
                        sentinel: int):
    """Within-r neighborhood moments for every sorted slot.

    :param pts_T: (3, N) cell-sorted positions (N a multiple of 128);
        column-aligned layouts (grid_sort_colpad_traced) give tight
        windows, any sorted layout gives correct ones.
    :param valid: (N,) bool; invalid/padding slots never contribute.
    :param ids_sorted: (N,) int32 non-decreasing linear cell ids; invalid
        slots carry ``sentinel`` (or their block's pad id).
    :param dims: (3,) traced grid dims in id axis order (major first).
    :param r2: squared radius (python float or traced scalar).
    :param w_slab: static span width (candidates per fetched range).
    :param sentinel: the invalid-row id (== n_cells_pad of the sort).
    :return: (mean (3, N), comps 6-tuple of (N,), w_sum (N,),
        widths (T,) int32) — comps are the covariance components
        (c00, c11, c22, c01, c02, c12); a tile's moments are exact iff
        its width <= w_slab (max over tiles = the caller's retry signal).
    """
    n = pts_T.shape[1]
    assert n % TILE == 0, n
    t = n // TILE
    dt = pts_T.dtype
    nx, ny, nz = dims[0], dims[1], dims[2]
    dimyz = ny * nz

    ids2 = ids_sorted.reshape(t, TILE)
    v2 = valid.reshape(t, TILE)
    has = jnp.any(v2, axis=1)
    big = jnp.asarray(sentinel, ids_sorted.dtype)
    id_lo = jnp.min(jnp.where(v2, ids2, big), axis=1)
    id_hi = jnp.max(jnp.where(v2, ids2, 0), axis=1)
    x_lo = id_lo // dimyz
    x_hi = id_hi // dimyz
    y2 = (ids2 // nz) % ny
    ylo = jnp.min(jnp.where(v2, y2, ny), axis=1)
    yhi = jnp.max(jnp.where(v2, y2, 0), axis=1)
    y0 = jnp.maximum(ylo - 1, 0)
    y1 = jnp.minimum(yhi + 1, ny - 1)
    single = (x_lo == x_hi) & has

    klo = []
    khi = []
    for dx in (-1, 0, 1):
        xk = x_lo + dx
        ok = single & (xk >= 0) & (xk < nx)
        klo.append(jnp.where(ok, xk * dimyz + y0 * nz, 0))
        khi.append(jnp.where(ok, xk * dimyz + (y1 + 1) * nz, 0))
    # Column-straddling fallback (non-aligned layouts only): one range of
    # whole slabs [x_lo-1, x_hi+1]; spans 1 and 2 stay empty.
    cross = has & ~single
    klo[0] = jnp.where(cross, jnp.maximum(x_lo - 1, 0) * dimyz, klo[0])
    khi[0] = jnp.where(cross, jnp.minimum(x_hi + 2, nx) * dimyz, khi[0])
    klo = jnp.stack(klo, axis=1)  # (T, 3)
    khi = jnp.stack(khi, axis=1)
    lo = jnp.searchsorted(ids_sorted, klo).astype(jnp.int32)
    hi = jnp.searchsorted(ids_sorted, khi).astype(jnp.int32)
    width3 = jnp.maximum(hi - lo, 0)  # (T, 3)
    widths = jnp.max(width3, axis=1)

    # Candidate table with a w_slab zero tail so every slice is in bounds;
    # row 3 carries validity (positions are finite everywhere, so masked
    # zero-weight columns contribute exact zeros through the matmul).
    tab = jnp.concatenate(
        [
            jnp.concatenate([pts_T, jnp.zeros((3, w_slab), dt)], axis=1),
            jnp.concatenate(
                [valid.astype(dt)[None], jnp.zeros((1, w_slab), dt)], axis=1
            ),
        ],
        axis=0,
    )  # (4, N + w_slab)

    q3 = pts_T.reshape(3, t, TILE).transpose(1, 0, 2)  # (T, 3, TILE)
    qv = v2
    r2 = jnp.asarray(r2, dt)

    def make_body(w_pass):
        col = jnp.arange(w_pass, dtype=jnp.int32)[:, None]  # (W, 1)

        def body(_, xs):
            lo_t, w_t, q, qv_t, run_t = xs
            return None, _tile_moments(
                tab, col, r2, w_pass, lo_t, w_t, q, qv_t, run_t, dt)

        return body

    def _tile_moments(tab, col, r2, w_pass, lo_t, w_t, q, qv_t, has_t, dt):
        def live(_):
            # Tile-center shift (conditioning; exactness of the one-pass
            # moments at f32 — same trick as the cellwin kernels).
            qs = jnp.sum(qv_t.astype(dt))
            ctr = jnp.sum(jnp.where(qv_t[None, :], q, 0.0), axis=1) / (
                jnp.maximum(qs, 1.0)
            )  # (3,)
            qx = q[0][None, :] - ctr[0]  # (1, TILE)
            qy = q[1][None, :] - ctr[1]
            qz = q[2][None, :] - ctr[2]

            acc = jnp.zeros((10, TILE), dt)
            for i in range(3):
                win = jax.lax.dynamic_slice(
                    tab, (jnp.zeros((), lo_t.dtype), lo_t[i]), (4, w_pass))
                wx = (win[0] - ctr[0])[:, None]  # (W, 1) shifted
                wy = (win[1] - ctr[1])[:, None]
                wz = (win[2] - ctr[2])[:, None]
                wv = win[3][:, None] > 0.5
                dx = wx - qx  # (W, TILE) — identical per-pair arithmetic
                dy = wy - qy  # to the gather engines, so membership is
                dz = wz - qz  # bit-compatible
                d2 = dx * dx + dy * dy + dz * dz
                ok = (d2 <= r2) & (col < w_t[i]) & wv & qv_t[None, :]
                wm = jnp.where(ok, jnp.asarray(1.0, dt),
                               jnp.asarray(0.0, dt))
                x0 = (win[0] - ctr[0])[None, :]  # (1, W)
                x1 = (win[1] - ctr[1])[None, :]
                x2 = (win[2] - ctr[2])[None, :]
                one = jnp.ones_like(x0)
                feats = jnp.concatenate(
                    [one, x0, x1, x2, x0 * x0, x1 * x1, x2 * x2,
                     x0 * x1, x0 * x2, x1 * x2],
                    axis=0,
                )  # (10, W)
                acc = acc + jnp.matmul(feats, wm, precision=PPREC)

            s0 = acc[0:1]
            s0c = jnp.maximum(s0, 1e-12)
            m0 = acc[1:2] / s0c
            m1 = acc[2:3] / s0c
            m2 = acc[3:4] / s0c
            denom = jnp.maximum(s0 - 1.0, 1e-6)
            return jnp.concatenate(
                [
                    m0 + ctr[0], m1 + ctr[1], m2 + ctr[2],
                    (acc[4:5] - s0 * m0 * m0) / denom,
                    (acc[5:6] - s0 * m1 * m1) / denom,
                    (acc[6:7] - s0 * m2 * m2) / denom,
                    (acc[7:8] - s0 * m0 * m1) / denom,
                    (acc[8:9] - s0 * m0 * m2) / denom,
                    (acc[9:10] - s0 * m1 * m2) / denom,
                    jnp.maximum(s0, 0.0),
                ],
                axis=0,
            )  # (10, TILE)

        return jax.lax.cond(
            has_t, live, lambda _: jnp.zeros((10, TILE), dt), None
        )

    # TWO width classes: the width distribution is long-tailed (bench scan:
    # p50 147, p99 890, max 2503 with w_slab 4096 — dense columns next to
    # sparse ones legitimately need wide spans), so one static width makes
    # EVERY tile pay the max. Tiles whose widest span fits w_slab // 4 run
    # a narrow scan; only the tail runs the full-width scan (each scan
    # cond-skips the other class, so per-class work is proportional).
    # unroll: the scan body is latency-bound (three dynamic_slice fetches
    # + a small matmul per 128-query tile); unrolling lets XLA overlap
    # consecutive tiles' fetches with compute.
    w_small = max(-(-(w_slab // 4) // 128) * 128, 128)
    if w_small >= w_slab:
        _, ys = jax.lax.scan(make_body(w_slab), None,
                             (lo, width3, q3, qv, has), unroll=8)
    else:
        small = has & (widths <= w_small)
        big = has & ~small
        _, ys_s = jax.lax.scan(make_body(w_small), None,
                               (lo, width3, q3, qv, small), unroll=8)
        _, ys_b = jax.lax.scan(make_body(w_slab), None,
                               (lo, width3, q3, qv, big), unroll=4)
        ys = jnp.where(small[:, None, None], ys_s, ys_b)
    ys = ys.transpose(1, 0, 2).reshape(10, n)
    mean = ys[0:3]
    comps = (ys[3], ys[4], ys[5], ys[6], ys[7], ys[8])
    return mean, comps, ys[9], widths
