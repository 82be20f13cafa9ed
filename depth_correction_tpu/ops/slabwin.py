"""Slab-window moments — the streaming (per-scan) neighborhood engine.

The online corrector must establish fresh within-r neighborhoods for every
incoming scan. Per-query gather windows (ops/grid_hash.py) are exact but
gather-bound on TPU (~5 ns/index; the first fused node program measured
611 ms/scan at 131k points because its static candidate window fetched
~75M gathered slots). This module re-instantiates the cell-window training
engine's design (ops/cellwin.py: contiguous span fetches + dense masked
moment matmuls, reference objective src/depth_correction/depth_cloud.py
covariance/eigen features via query_ball_point) in PURE XLA with fully
traced establishment, so it runs per scan with zero host prep:

1. :func:`grid_sort_traced` cell-sorts the scan (ids major axis = the
   LONGEST grid axis, so slabs are as thin as possible);
2. each tile of 128 consecutive sorted queries takes its candidates from
   ONE contiguous range of the sorted table — the 3 major-axis slabs
   around the tile (every within-r neighbor lives there, because slabs
   are >= r thick and sorted contiguously);
3. a ``lax.scan`` over tiles does one ``dynamic_slice`` (no gather),
   builds the (W, 128) membership mask from exact d2 <= r2, and
   accumulates the 16-row moment matrix on the MXU at ``PPREC`` — the
   same one-pass tile-center-shifted moments the cellwin kernels compute
   (f32-exact to ~2^-24 relative; see ops/cellwin.py epilogue).

The only data-dependent static is the slab-range width ``w_slab``; the
true maximum rides out as a scalar so streaming callers verify coverage
in the same fetch as the outputs and retry wider once (node.py pattern).
No K cap anywhere: the moments are the reference's uncapped
query_ball_point objective exactly.
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

    :param pts_T: (3, N) cell-sorted positions (N a multiple of 128).
    :param valid: (N,) bool, sorted (invalid rows sorted to the end).
    :param ids_sorted: (N,) int32 linear cell ids; invalid = ``sentinel``.
    :param dims: (3,) traced grid dims in id axis order (major first).
    :param r2: squared radius (python float or traced scalar).
    :param w_slab: static slab-range width (candidates per tile).
    :param sentinel: the invalid-row id (== n_cells_pad of the sort).
    :return: (mean (3, N), comps 6-tuple of (N,), w_sum (N,),
        widths (T,) int32) — comps are the covariance components
        (c00, c11, c22, c01, c02, c12); a tile's moments are exact iff
        its width <= w_slab (the caller's per-tile coverage / overflow
        signal — two-pass callers select per query on it).
    """
    n = pts_T.shape[1]
    assert n % TILE == 0, n
    t = n // TILE
    dt = pts_T.dtype
    dimyz = dims[1] * dims[2]

    ids2 = ids_sorted.reshape(t, TILE)
    v2 = valid.reshape(t, TILE)
    has = jnp.any(v2, axis=1)
    big = jnp.asarray(sentinel, ids_sorted.dtype)
    id_lo = jnp.min(jnp.where(v2, ids2, big), axis=1)
    id_hi = jnp.max(jnp.where(v2, ids2, 0), axis=1)
    x_lo = id_lo // dimyz
    x_hi = id_hi // dimyz
    blo = jnp.maximum(x_lo - 1, 0) * dimyz
    bhi = jnp.minimum((x_hi + 2) * dimyz, big)  # excludes the sentinel run
    lo = jnp.searchsorted(ids_sorted, blo).astype(jnp.int32)
    hi = jnp.searchsorted(ids_sorted, bhi).astype(jnp.int32)
    lo = jnp.where(has, lo, 0)
    width = jnp.where(has, hi - lo, 0)

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
    col = jnp.arange(w_slab, dtype=jnp.int32)[:, None]  # (W, 1)

    def body(_, xs):
        lo_t, w_t, q, qv_t, has_t = xs
        win = jax.lax.dynamic_slice(
            tab, (jnp.zeros((), lo_t.dtype), lo_t), (4, w_slab))
        wx = win[0][:, None]  # (W, 1)
        wy = win[1][:, None]
        wz = win[2][:, None]
        wv = win[3][:, None] > 0.5
        qx = q[0][None, :]  # (1, TILE)
        qy = q[1][None, :]
        qz = q[2][None, :]
        dx = wx - qx  # (W, TILE) — identical per-pair arithmetic to the
        dy = wy - qy  # gather engines, so membership is bit-compatible
        dz = wz - qz
        d2 = dx * dx + dy * dy + dz * dz
        ok = (d2 <= r2) & (col < w_t) & wv & qv_t[None, :]
        wm = jnp.where(ok, jnp.asarray(1.0, dt), jnp.asarray(0.0, dt))

        # Tile-center shift (conditioning; exactness of the one-pass
        # moments at f32 — same trick as the cellwin kernels).
        qs = jnp.sum(qv_t.astype(dt))
        ctr = jnp.sum(jnp.where(qv_t[None, :], q, 0.0), axis=1) / (
            jnp.maximum(qs, 1.0)
        )  # (3,)
        x0 = (win[0] - ctr[0])[None, :]  # (1, W)
        x1 = (win[1] - ctr[1])[None, :]
        x2 = (win[2] - ctr[2])[None, :]
        one = jnp.ones_like(x0)
        feats = jnp.concatenate(
            [one, x0, x1, x2, x0 * x0, x1 * x1, x2 * x2,
             x0 * x1, x0 * x2, x1 * x2],
            axis=0,
        )  # (10, W)
        acc = jnp.matmul(feats, wm, precision=PPREC)  # (10, TILE)

        s0 = acc[0:1]
        s0c = jnp.maximum(s0, 1e-12)
        m0 = acc[1:2] / s0c
        m1 = acc[2:3] / s0c
        m2 = acc[3:4] / s0c
        denom = jnp.maximum(s0 - 1.0, 1e-6)
        out = jnp.concatenate(
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
        return None, out

    _, ys = jax.lax.scan(body, None, (lo, width, q3, qv, has))
    ys = ys.transpose(1, 0, 2).reshape(10, n)
    mean = ys[0:3]
    comps = (ys[3], ys[4], ys[5], ys[6], ys[7], ys[8])
    return mean, comps, ys[9], width
