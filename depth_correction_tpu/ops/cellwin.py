"""Cell-window neighborhood moments — a Pallas TPU kernel that replaces
per-index gathers with contiguous span DMAs + dense MXU matmuls.

The gather-based moments path (ops/features.py: neighborhood_moments) is
bound by XLA's per-index TPU gather cost (~4-6.7 ns/index measured): the
frozen (Mq, K) neighbor matrix moves ~15M indices per step (forward +
analytic backward). This module exploits the *spatial* structure of radius
neighborhoods instead (reference semantics: every neighbor of a query lies
within r, i.e. inside the 3x3x3 cell window around the query's grid cell —
reference: src/depth_correction/nearest_neighbors.py:22-80 query_ball_point):

1. points and query rows are sorted by grid cell (cell >= r) and padded
   into fixed-size tiles;
2. each tile's candidate window is <= NS *contiguous spans* of the sorted
   point table (3x3 columns x a clamped z-run) — fetched with async DMA,
   not gathers;
3. membership is recomputed inside the kernel from the STATIC
   establishment-time positions: w_ij = [d2(q_est_i, x_est_j) <= r2],
   evaluated as one (R, 3) @ (3, S) MXU matmul per span plus norms;
4. the weighted moment sums are dense masked matmuls
   (R, S) @ (S, 16) accumulating [S0, S1, S2] per query row.

Exactness: this reproduces the frozen graph bit-for-bit only when the graph
is the UNCAPPED within-r graph (no top-k truncation, no mutual trimming) —
which is exactly the reference's query_ball_point semantics. Pairs whose
squared distance sits within a conservative epsilon of r2 (where f32
rounding could flip the in-kernel test), and any row where the f64 window
simulation disagrees with the frozen graph at all, are flagged at build
time; those few rows are recomputed through the ordinary gather path and
merged, so the composed op is exact regardless (and autodiff routes their
gradients through the gather branch automatically).

The backward pass is the symmetric kernel: point tiles windowed over the
cell-sorted ROW table, accumulating the analytic per-row cotangent rows
(S, u of ops/features._cotangent_table) with the same membership matmul —
scatter-free, like the bucketed-transpose backward it replaces.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

__all__ = [
    "CellWinGraph",
    "build_cellwin_graph",
    "cellwin_moments",
]


# Static caps. NS = 3 * (Y_MAX + 2) window spans per tile: a tile may merge
# up to Y_MAX consecutive y-columns of one x-column; its window then covers
# (x-1..x+1) x (y_lo-1..y_hi+1) columns, each contributing one contiguous
# z-run of the cell-sorted table.
Y_MAX = 3
NS = 3 * (Y_MAX + 2)


@dataclasses.dataclass(frozen=True)
class CellWinGraph:
    """Static cell-window graph (host-built once per frozen neighborhood).

    Point layout: the merged point table is permuted into cell-sorted order
    and PADDED into T2 tiles of P slots (``m_pad = T2 * P``); ``perm``
    maps padded slots to original point indices (0 on padding; padding est
    positions are a far sentinel so membership never selects them).

    Row layout: valid query rows are cell-sorted and padded into T tiles of
    R slots (``mq_pad = T * R``); ``row_map`` maps padded slots to the
    original compacted-row index (-1 on padding).
    """

    # geometry
    r2: float
    # forward (row-tile) side
    n_row_tiles: int
    row_cap: int  # R
    span_cap: int  # S
    ns_f: int  # mini-span slots per row tile
    f_span_start: np.ndarray  # (T, ns_f) int32 into the padded point axis
    f_span_len: np.ndarray  # (T, ns_f) int32
    f_tile_ctr: np.ndarray  # (T, 3) float32
    q_est: np.ndarray  # (8, mq_pad) float32 rows [est x,y,z, 0, ...]
    row_map: np.ndarray  # (mq_pad,) int32 -> original compacted row / -1
    # backward (point-tile) side
    n_pt_tiles: int
    pt_cap: int  # P
    rspan_cap: int  # SR
    ns_b: int  # mini-span slots per point tile
    b_span_start: np.ndarray  # (T2, ns_b) int32 into the padded row axis
    b_span_len: np.ndarray  # (T2, ns_b) int32
    b_tile_ctr: np.ndarray  # (T2, 3) float32
    # padded point layout
    perm: np.ndarray  # (m_pad,) int32 -> original point index (0 on pad)
    perm_valid: np.ndarray  # (m_pad,) bool
    inv: np.ndarray  # (n_orig,) int32 original -> padded slot
    est_sorted: np.ndarray  # (8, m_pad) float32 rows [est x,y,z, 0...]
    # exception rows (recomputed via the gather path)
    exc_slots: np.ndarray  # (E,) int32 padded-row slots; possibly empty
    exc_nn: np.ndarray  # (E, K) int32 neighbors in PADDED point indices
    # diagnostics
    n_rows: int
    n_exc: int

    @property
    def mq_pad(self) -> int:
        return self.n_row_tiles * self.row_cap

    @property
    def m_pad(self) -> int:
        return self.n_pt_tiles * self.pt_cap


def _cell_grid(pts: np.ndarray, valid: np.ndarray, cell: float,
               max_cells: int = 1 << 24):
    """Cell coords/linear ids in f64; auto-coarsens past ``max_cells``."""
    v = pts[valid]
    if v.size == 0:
        v = np.zeros((1, 3))
    lo, hi = v.min(0), v.max(0)
    while True:
        mins = np.floor(lo / cell) * cell
        dims = np.floor((hi - mins) / cell).astype(np.int64) + 1
        if int(dims.prod()) <= max_cells:
            break
        cell *= 2.0
    cc = np.floor((pts - mins) / cell).astype(np.int64)
    cc = np.clip(cc, 0, dims[None] - 1)
    lin = (cc[:, 0] * dims[1] + cc[:, 1]) * dims[2] + cc[:, 2]
    return cc, lin, mins, dims, cell


def _build_tiles(cc_sorted: np.ndarray, cap: int, span_budget_probe,
                 z_max: Optional[int] = None):
    """Greedy tiles over cell-sorted items.

    A tile is a run of consecutive sorted items sharing one x-column, with
    a y-span of at most Y_MAX columns, a z-extent of at most ``z_max``
    cells (None = unlimited; small z_max trades window size — dense-pair
    work — for more tiles — DMA issue overhead), at most ``cap`` items,
    and whose window spans (checked via
    ``span_budget_probe(cx, ylo, yhi, zlo, zhi)`` -> max span length) stay
    within the caller's budget. Returns a list of (start, end) item ranges
    plus each tile's (cx, ylo, yhi, zlo, zhi).
    """
    n = cc_sorted.shape[0]
    # Plain Python ints once: per-item numpy scalar indexing dominates the
    # loop otherwise (measured 610k probes -> 21 s at bench scale).
    xs, ys, zs = (cc_sorted[:, c].tolist() for c in range(3))
    tiles = []
    i = 0
    while i < n:
        cx, cy = xs[i], ys[i]
        j = i + 1
        ylo = yhi = cy
        zlo = zhi = zs[i]
        ok_bounds = None  # last PROBE-APPROVED (yhi, zlo, zhi)
        while j < n and (j - i) < cap:
            x2, y2, z2 = xs[j], ys[j], zs[j]
            if x2 != cx or (y2 - ylo) >= Y_MAX:
                break
            ny2 = y2 if y2 > yhi else yhi
            nzlo = z2 if z2 < zlo else zlo
            nzhi = z2 if z2 > zhi else zhi
            if z_max is not None and nzhi - nzlo + 1 > z_max:
                break
            cand = (ny2, nzlo, nzhi)
            if cand != ok_bounds:
                # The window only changes when a bound expands; bounds the
                # probe already approved need no re-probe (items are
                # cell-sorted, so most extensions keep the bounds). The
                # FIRST extension always probes (nothing approved yet).
                if not span_budget_probe(cx, ylo, ny2, nzlo, nzhi):
                    break
                ok_bounds = cand
            yhi, zlo, zhi = cand
            j += 1
        tiles.append((i, j, cx, ylo, yhi, zlo, zhi))
        i = j
    return tiles


def _window_spans(starts, dims, cx, ylo, yhi, zlo, zhi):
    """(NS,) span (start, length) pairs over a dense cell-start table.

    Window columns: (cx-1..cx+1) x (ylo-1..yhi+1); z-run clamped to the
    grid. Out-of-range columns produce empty spans. ``starts`` has
    ``n_cells + 1`` entries (cumulative counts of the sorted layout the
    spans index into).
    """
    nx, ny, nz = int(dims[0]), int(dims[1]), int(dims[2])
    z0 = max(int(zlo) - 1, 0)
    z1 = min(int(zhi) + 1, nz - 1)
    out_start = np.zeros(NS, np.int64)
    out_len = np.zeros(NS, np.int64)
    s = 0
    for dx in (-1, 0, 1):
        x = int(cx) + dx
        for y in range(int(ylo) - 1, int(ylo) - 1 + (Y_MAX + 2)):
            if s >= NS:
                break
            if 0 <= x < nx and 0 <= y < ny and y <= int(yhi) + 1:
                base = (x * ny + y) * nz
                a = starts[base + z0]
                b = starts[base + z1 + 1]
                out_start[s] = a
                out_len[s] = b - a
            s += 1
    return out_start, out_len


def _window_spans_max(starts, dims, cx, ylo, yhi, zlo, zhi) -> int:
    """Max span length of :func:`_window_spans`, vectorized (probe path)."""
    nx, ny, nz = int(dims[0]), int(dims[1]), int(dims[2])
    z0 = max(int(zlo) - 1, 0)
    z1 = min(int(zhi) + 1, nz - 1)
    x = np.arange(int(cx) - 1, int(cx) + 2)
    y = np.arange(int(ylo) - 1, int(yhi) + 2)
    x = x[(x >= 0) & (x < nx)]
    y = y[(y >= 0) & (y < ny)]
    if x.size == 0 or y.size == 0:
        return 0
    base = (x[:, None] * ny + y[None, :]).ravel() * nz
    return int((starts[base + z1 + 1] - starts[base + z0]).max(initial=0))


def _decompose_minispans(st: np.ndarray, ln: np.ndarray,
                         budget: Optional[int] = None):
    """Raw window spans -> 128-col MINI-SPAN tables.

    Every output entry satisfies ``start % 128 + len <= 128``, so the
    kernels' span caps become exactly 128 lanes: the dense per-slot
    d2/matmul work shrinks to the data actually present (the raw geometric
    spans average ~61 of a 640-cap on the bench graph — ~90% of the dense
    compute was masked padding). Mini-spans of one tile stay ascending and
    disjoint (the audit's searchsorted relies on it).

    :param budget: max mini-spans per tile; tiles needing more get ALL
        their spans zeroed (the exactness audit then routes their rows
        through the gather path). None = size to the densest tile.
    :return: (starts, lens, n_slots, n_over_budget).
    """
    t_dim = st.shape[0]
    per_tile = []
    for t in range(t_dim):
        mini = []
        for s in range(st.shape[1]):
            length = int(ln[t, s])
            if length <= 0:
                continue
            start = int(st[t, s])
            first = 128 - start % 128
            mini.append((start, min(length, first)))
            off = first
            while off < length:
                mini.append((start + off, min(length - off, 128)))
                off += 128
        per_tile.append(mini)
    max_nb = max((len(m) for m in per_tile), default=1)
    nb = max_nb if budget is None else min(max_nb, budget)
    nb = max(nb, 1)
    starts = np.zeros((t_dim, nb), np.int64)
    lens = np.zeros((t_dim, nb), np.int64)
    n_over = 0
    for t, mini in enumerate(per_tile):
        if len(mini) > nb:
            n_over += 1
            continue
        for j, (s0, l0) in enumerate(mini):
            starts[t, j] = s0
            lens[t, j] = l0
    return starts, lens, nb, n_over


def _note(msg: str) -> None:
    """Build-time diagnostic (stderr) under DC_CELLWIN_DEBUG=1."""
    import os
    import sys

    if os.environ.get("DC_CELLWIN_DEBUG"):
        print("[cellwin] %s" % msg, file=sys.stderr)


def _dense_starts(lin_sorted: np.ndarray, n_cells: int) -> np.ndarray:
    """Cumulative bucket starts (n_cells + 1) of a sorted linear-id array
    (ids >= n_cells — the invalid-item sentinel — fall past the end)."""
    return np.searchsorted(lin_sorted, np.arange(n_cells + 1)).astype(np.int64)


def build_cellwin_graph(
    est_points: np.ndarray,
    valid: np.ndarray,
    qrows: np.ndarray,
    nn: np.ndarray,
    r: float,
    row_cap: int = 128,
    pt_cap: int = 128,
    span_limit: int = 512,
    eps_rel: float = 2e-5,
    max_exc_frac: float = 0.05,
    z_max: Optional[int] = None,
    f_slot_budget: int = 16,
) -> Optional[CellWinGraph]:
    """Build the static cell-window graph, or None when ineligible.

    :param est_points: (M, 3) establishment-time global positions (f64).
    :param valid: (M,) validity of the merged table.
    :param qrows: (Mq0,) compacted query rows (original indices, -1 pad).
    :param nn: (Mq0, K) frozen UNCAPPED within-r graph (original indices,
        -1 pad), aligned with ``qrows``.
    :param r: neighborhood radius (the graph must be within-r exact).
    :param span_limit: max window span length; scenes whose densest 3-cell
        z-run exceeds it are ineligible (the dense window would not fit
        VMEM).
    :param max_exc_frac: give up (return None) when more than this fraction
        of rows needs the gather fallback — the kernel would win nothing.
    :param eps_rel: boundary-ambiguity margin, relative to r^2. The kernels
        classify membership in f32 difference form (error a few ulps of
        ~r^2, i.e. ~1e-7 relative); 2e-5 gives two orders of margin while
        keeping the exception-row fraction low on dense graphs.
    :param z_max: tile z-extent limit in cells (see _build_tiles).
    :param f_slot_budget: max forward mini-spans per row tile; over-budget
        tiles degrade to the gather exception path (p99 of the bench
        distribution is 16, so the default exceptions ~1% of rows).
    """
    est_points = np.asarray(est_points, np.float64)
    # The kernels read establishment positions quantized to float32 at
    # GLOBAL magnitude (q_est / est_sorted are f32 tables); the exactness
    # audit below must therefore simulate membership on the same rounded
    # values — the quantization error scales with |coordinate| (~|x| *
    # 2^-24 * 2r on d2), which can exceed the eps band on large scenes,
    # while the kernels' remaining f32 arithmetic error on tile-shifted
    # (small) coordinates stays orders below eps.
    est_f32 = est_points.astype(np.float32).astype(np.float64)
    valid = np.asarray(valid, bool)
    qrows = np.asarray(qrows, np.int64)
    nn = np.asarray(nn, np.int64)
    m0 = est_points.shape[0]
    r2 = float(r) * float(r)

    cc, lin, mins, dims, cell = _cell_grid(est_points, valid, float(r))
    n_cells = int(dims.prod())
    # Invalid points sort past every real cell and never enter a span.
    lin_pts = np.where(valid, lin, n_cells)

    # ---- padded point layout (bwd tiles) ----
    p_order = np.argsort(lin_pts, kind="stable")
    lin_p_sorted = lin_pts[p_order]
    nvalid = int(valid.sum())
    order_valid = p_order[:nvalid]
    cc_pts = cc[order_valid]

    pt_starts = _dense_starts(lin_p_sorted[:nvalid], n_cells)

    # Probe uses the unpadded sorted layout; the padded span lengths can
    # only grow by the padding of tiles fully inside the window, bounded
    # below by construction (padding inflates a span by < pt_cap per tile
    # inside it) — so tiles are built against a conservative budget and
    # spans are recomputed over the padded layout afterwards.
    def probe_pts(cx, ylo, yhi, zlo, zhi):
        return (
            _window_spans_max(pt_starts, dims, cx, ylo, yhi, zlo, zhi)
            <= span_limit
        )

    pt_tiles = _build_tiles(cc_pts, pt_cap, probe_pts, z_max=z_max)
    t2 = len(pt_tiles)
    m_pad = t2 * pt_cap

    perm = np.zeros(m_pad, np.int64)
    perm_valid = np.zeros(m_pad, bool)
    lin_padded = np.full(m_pad, n_cells, np.int64)
    for t, (a, b, cx, ylo, yhi, zlo, zhi) in enumerate(pt_tiles):
        k = b - a
        sl = slice(t * pt_cap, t * pt_cap + k)
        perm[sl] = order_valid[a:b]
        perm_valid[sl] = True
        lin_padded[sl] = lin_pts[order_valid[a:b]]
        # padding slots inherit the tile's last cell id to keep the padded
        # layout sorted (their est positions are sentinels below)
        lin_padded[t * pt_cap + k : (t + 1) * pt_cap] = lin_padded[
            t * pt_cap + max(k - 1, 0)
        ]
    inv = np.zeros(m0, np.int64)
    inv[perm[perm_valid]] = np.flatnonzero(perm_valid)

    est_sorted = np.zeros((8, m_pad), np.float32)
    # Opposite-sign sentinels: padding POINTS sit at +1e15 and padding
    # ROWS at -1e15, so sentinel-sentinel pairs are far apart too (a
    # shared sentinel would have distance zero and pass membership) and
    # squared magnitudes stay finite in float32.
    est_sorted[:3, :] = np.where(
        perm_valid[None, :], est_points[perm].T, 1e15
    ).astype(np.float32)

    pt_starts_padded = _dense_starts(lin_padded, n_cells)

    # ---- row layout (fwd tiles) ----
    rows = qrows[qrows >= 0]
    mq_real = rows.shape[0]
    if mq_real == 0:
        return None
    lin_rows = lin[rows]
    r_order = np.argsort(lin_rows, kind="stable")
    rows_sorted = rows[r_order]
    cc_rows = cc[rows_sorted]

    def probe_rows(cx, ylo, yhi, zlo, zhi):
        return (
            _window_spans_max(
                pt_starts_padded, dims, cx, ylo, yhi, zlo, zhi
            )
            <= span_limit
        )

    row_tiles = _build_tiles(cc_rows, row_cap, probe_rows, z_max=z_max)
    t1 = len(row_tiles)
    mq_pad = t1 * row_cap

    row_map = np.full(mq_pad, -1, np.int64)
    lin_rows_padded = np.full(mq_pad, n_cells, np.int64)
    f_span_start = np.zeros((t1, NS), np.int64)
    f_span_len = np.zeros((t1, NS), np.int64)
    f_tile_ctr = np.zeros((t1, 3), np.float64)
    # r_order position (into rows_sorted) per padded slot, for bookkeeping
    slot_of_sorted_row = np.full(mq_real, -1, np.int64)
    for t, (a, b, cx, ylo, yhi, zlo, zhi) in enumerate(row_tiles):
        k = b - a
        sl = slice(t * row_cap, t * row_cap + k)
        row_map[sl] = r_order[a:b]
        slot_of_sorted_row[a:b] = np.arange(t * row_cap, t * row_cap + k)
        lin_rows_padded[sl] = lin_rows[r_order[a:b]]
        lin_rows_padded[t * row_cap + k : (t + 1) * row_cap] = (
            lin_rows_padded[t * row_cap + max(k - 1, 0)]
        )
        st, ln = _window_spans(
            pt_starts_padded, dims, cx, ylo, yhi, zlo, zhi
        )
        if ln.max(initial=0) > span_limit:
            # Over-budget window (an irreducibly dense single-row tile, or
            # tile padding pushed a span over): degrade gracefully — leave
            # the tile's spans empty so the exactness audit routes its rows
            # through the gather path (every frozen neighbor reads as
            # missing) instead of declining the whole graph.
            continue
        f_span_start[t] = st
        f_span_len[t] = ln
        f_tile_ctr[t] = mins + cell * np.array(
            [cx + 0.5, (ylo + yhi + 1) * 0.5, (zlo + zhi + 1) * 0.5]
        )

    q_est = np.zeros((8, mq_pad), np.float32)
    sel = row_map >= 0
    q_est[:3, sel] = est_points[rows[np.maximum(row_map[sel], 0)]].T.astype(
        np.float32
    )
    q_est[:3, ~sel] = -1e15

    # 128-col mini-spans: every slot's dense work is one (128, R) tile
    # instead of a span_limit-wide window that averaged ~10% occupancy.
    # Over-budget row tiles (needing > f_block_budget slots; ~1% on the
    # bench graph) zero out and their rows route through the gather path.
    f_span_start, f_span_len, ns_f, n_over_f = _decompose_minispans(
        f_span_start, f_span_len, budget=f_slot_budget
    )
    # Lane-aligned span cap (128 by construction: mini-spans satisfy
    # start % 128 + len <= 128; Mosaic needs 128-divisible dynamic DMA
    # offsets, so the kernels DMA from start - start % 128 and mask the
    # lead — the cap holds lead + length).
    span_cap = int(max((f_span_start % 128 + f_span_len).max(initial=1), 1))
    span_cap = -(-span_cap // 128) * 128

    # ---- backward span tables: point tiles windowed over padded rows ----
    row_starts_padded = _dense_starts(lin_rows_padded, n_cells)
    b_span_start = np.zeros((t2, NS), np.int64)
    b_span_len = np.zeros((t2, NS), np.int64)
    b_tile_ctr = np.zeros((t2, 3), np.float64)
    for t, (a, b, cx, ylo, yhi, zlo, zhi) in enumerate(pt_tiles):
        st, ln = _window_spans(
            row_starts_padded, dims, cx, ylo, yhi, zlo, zhi
        )
        b_span_start[t] = st
        b_span_len[t] = ln
        b_tile_ctr[t] = mins + cell * np.array(
            [cx + 0.5, (ylo + yhi + 1) * 0.5, (zlo + zhi + 1) * 0.5]
        )
    # Backward mini-spans are sized to the densest point tile (a point's
    # gradient cannot route through exceptions, so no budget) — decline
    # only on a pathological slot count.
    b_span_start, b_span_len, ns_b, _ = _decompose_minispans(
        b_span_start, b_span_len, budget=None
    )
    if ns_b > 40:
        _note("declined: ns_b=%d > 40 (pathological backward slot count)"
              % ns_b)
        return None
    rspan_cap = int(max((b_span_start % 128 + b_span_len).max(initial=1), 1))
    rspan_cap = -(-rspan_cap // 128) * 128

    # ---- exactness audit: simulate the kernel membership in f64 ----
    # For every row, membership over its tile window must equal the frozen
    # graph exactly, with no pair within eps of the r2 boundary. Rows that
    # fail either test fall back to the gather path.
    exc = np.zeros(mq_real, bool)  # indexed by sorted-row position
    eps = eps_rel * r2
    # frozen pair sets in padded point indices, grouped by sorted row
    nn_sorted = nn[r_order]  # (Mq_real, K)
    nn_padded = np.where(nn_sorted >= 0, inv[np.maximum(nn_sorted, 0)], -1)
    k_dim = nn_padded.shape[1]
    for t, (a, b, cx, ylo, yhi, zlo, zhi) in enumerate(row_tiles):
        st, ln = f_span_start[t], f_span_len[t]
        w_idx = np.concatenate(
            [np.arange(st[s], st[s] + ln[s]) for s in range(ns_f) if ln[s] > 0]
        ) if ln.max(initial=0) > 0 else np.zeros(0, np.int64)
        q = est_f32[rows_sorted[a:b]]  # (kk, 3) f32-rounded, f64 math
        if w_idx.size:
            x = est_f32[perm[w_idx]]  # (W, 3); sentinels excluded
            xv = perm_valid[w_idx]
            d2 = (
                (q * q).sum(1)[:, None]
                + (x * x).sum(1)[None, :]
                - 2.0 * (q @ x.T)
            )
            member = (d2 <= r2) & xv[None, :]
            near = np.abs(d2 - r2) <= eps
            exc[a:b] |= (near & xv[None, :]).any(1)
            # Compare with the frozen graph, vectorized: the window indices
            # are globally ascending (spans are listed in increasing
            # linear-cell order and are disjoint), so set equality is
            # "member count == frozen count AND every frozen pair is a
            # member" (frozen sets have no duplicates).
            fr = nn_padded[a:b]  # (kk, K) padded point indices, -1 pad
            pos = np.searchsorted(w_idx, np.maximum(fr, 0))
            posc = np.clip(pos, 0, w_idx.size - 1)
            in_win = (pos < w_idx.size) & (
                w_idx[posc] == np.maximum(fr, 0)
            )
            in_member = np.take_along_axis(
                member, np.clip(posc, 0, member.shape[1] - 1), axis=1
            )
            frozen_ok = np.where(fr >= 0, in_win & in_member, True).all(1)
            row_ok = frozen_ok & (member.sum(1) == (fr >= 0).sum(1))
            exc[a:b] |= ~row_ok
        else:
            # no window at all: every frozen neighbor is missing
            exc[a:b] |= (nn_padded[a:b] >= 0).any(1)

    n_exc = int(exc.sum())
    if n_exc > max_exc_frac * mq_real:
        _note(
            "declined: %d/%d exception rows (%.2f%% > %.2f%%); "
            "%d over-budget row tiles" % (
                n_exc, mq_real, 100.0 * n_exc / mq_real,
                100.0 * max_exc_frac, n_over_f,
            )
        )
        return None
    if n_exc:
        exc_slots = slot_of_sorted_row[exc]
        exc_nn = nn_padded[exc]
    else:
        exc_slots = np.zeros(0, np.int64)
        exc_nn = np.zeros((0, k_dim), np.int64)

    return CellWinGraph(
        r2=r2,
        n_row_tiles=t1,
        row_cap=row_cap,
        span_cap=span_cap,
        ns_f=ns_f,
        f_span_start=f_span_start.astype(np.int32),
        f_span_len=f_span_len.astype(np.int32),
        f_tile_ctr=f_tile_ctr.astype(np.float32),
        q_est=q_est,
        row_map=row_map.astype(np.int32),
        n_pt_tiles=t2,
        pt_cap=pt_cap,
        rspan_cap=rspan_cap,
        ns_b=ns_b,
        b_span_start=b_span_start.astype(np.int32),
        b_span_len=b_span_len.astype(np.int32),
        b_tile_ctr=b_tile_ctr.astype(np.float32),
        perm=perm.astype(np.int32),
        perm_valid=perm_valid,
        inv=inv.astype(np.int32),
        est_sorted=est_sorted,
        exc_slots=exc_slots.astype(np.int32),
        exc_nn=exc_nn.astype(np.int32),
        n_rows=mq_real,
        n_exc=n_exc,
    )


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Pallas interpret mode off-TPU (CPU tests / virtual-device meshes)."""
    return jax.default_backend() != "tpu"


def _kcat() -> bool:
    """K-concatenate the per-span moment dots into ONE dot per tile.

    The per-span (16, S) @ (S, R) dots are pipeline-FILL bound (~225
    cycles for 16 streamed rows at K=S=128); concatenating the spans'
    feature operands along K (and the membership operands along rows)
    pays the fill once per tile. Measured on the bench tables (v5e,
    knockout probe): 16.8-17.5 ms vs 19.7 for one plain per-span dot —
    and the fused dot subsumes the 3 mantissa-split passes at ~no extra
    cost. DC_CELLWIN_KCAT=0 restores the per-span loop.
    """
    import os

    return os.environ.get("DC_CELLWIN_KCAT", "1") != "0"


def _dot_mode() -> str:
    """Precision mode for the moment matmuls (static at trace time).

    The membership weight matrix is exact {0, 1} (bf16-representable), but
    a default bf16 MXU pass rounds the FEATURE operand to 8 mantissa bits —
    ~2e-3 relative moment error vs the f64 oracle, far beyond the
    1e-5-class parity target (BASELINE.md); on the bench scene that bf16
    noise inflated the loss itself 3.5x. Mosaic lowers only DEFAULT and
    HIGHEST dot precisions, and HIGHEST measured 9810 ms/step (100x) on
    v5e — so the default here is a manual SPLIT: the feature operand is
    decomposed into bf16 components (hi + lo [+ lo2]) and each component
    takes one DEFAULT bf16 pass against the EXACT weight matrix. Error
    after k splits ~2^(-9k) relative (k=3 is below f32 rounding) at ~k
    bf16-pass cost. DC_CELLWIN_PREC={default,split2,split3,highest}.
    """
    import os

    return os.environ.get("DC_CELLWIN_PREC", "split3").lower()


def _moment_dot(a, b, dt):
    """a @ b with f32-class accuracy on the MXU (see :func:`_dot_mode`).

    ``b`` must be exactly bf16-representable (the {0,1} membership matrix);
    only ``a`` is split.
    """
    mode = _dot_mode()
    if mode == "default":
        return jnp.dot(a, b, preferred_element_type=dt)
    if mode == "highest":
        return jnp.dot(a, b, preferred_element_type=dt,
                       precision=jax.lax.Precision.HIGHEST)
    n_split = {"split2": 2, "split3": 3}[mode]

    def hi_bits(x):
        # bf16-truncation via integer mantissa masking: rem = x - hi is
        # exact, and hi is exactly bf16-representable so the MXU's bf16
        # pass rounds it losslessly. Mosaic lowers the integer ops cheaply
        # where its f32<->bf16 casts measured pathologically slow.
        if dt != jnp.float32:
            return x.astype(jnp.bfloat16).astype(dt)  # interpret/f64 tests
        return jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(x, jnp.int32) & jnp.int32(-65536),
            jnp.float32,
        )

    # Loop of separate dots ON PURPOSE: M-stacking the split components
    # into one (3*16, S) dot measured 110 ms vs 21 ms for this kernel on
    # v5e (the concat/select interaction defeats Mosaic's fast lowering —
    # same cliff class as the pl.when rule above), while the loop form's
    # three fills pipeline across the unrolled span iterations.
    out = None
    rem = a
    for _ in range(n_split - 1):
        hi = hi_bits(rem)
        part = jnp.dot(hi, b, preferred_element_type=dt)
        out = part if out is None else out + part
        rem = rem - hi
    # The MXU's own bf16 rounding of the final remainder IS the error term.
    return out + jnp.dot(rem, b, preferred_element_type=dt)


def _span_iota(s, dtype=jnp.int32):
    return jax.lax.broadcasted_iota(dtype, (1, s), 1)


def _span_iota_col(s, dtype=jnp.int32):
    """(S, 1) column iota. Mosaic lowers a column-form broadcasted_iota but
    NOT a boolean (1, S) -> (S, 1) reshape (probed on v5e,
    scripts/exp_mosaic_probe.py) — so column masks must be built in column
    form from the start."""
    return jax.lax.broadcasted_iota(dtype, (s, 1), 0)


def _fwd_kernel(ns: int, s_cap: int, r2: float):
    """Forward moments kernel body factory (static NS, span cap, r2).

    MXU geometry: the moment accumulation runs as (16, S) @ (S, R) — the
    16 feature rows STREAM through the systolic array (M is the streaming
    dimension; K = S and N = R stay full), so nothing pads to 128. The
    membership d2 is built on the VPU in difference form ((S, 1) vs
    (1, R) broadcasts): an MXU cross-term would pad K=3 to 128 (43x
    waste), and the difference form is also numerically tighter than the
    norm expansion.
    """

    def kernel(start_ref, lead_ref, len_ref, ctr_ref, c_ref, q_ref, out_ref,
               win_ref, sems):
        t = pl.program_id(0)
        # Launch every non-empty span DMA up front; waits interleave with
        # compute. Empty spans (clipped window columns on grid edges) skip
        # both the start and the wait; their stale window content is
        # zero-masked in compute. Source offsets are pre-aligned to 128
        # lanes (graph_to_device); the true span occupies
        # [lead, lead + len) of the window buffer.
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

        q = q_ref[:]  # (8, R)
        dt = q.dtype
        cx = ctr_ref[t * 3 + 0].astype(dt)
        cy = ctr_ref[t * 3 + 1].astype(dt)
        cz = ctr_ref[t * 3 + 2].astype(dt)
        qx = q[0:1, :] - cx  # (1, R) shifted est query coords
        qy = q[1:2, :] - cy
        qz = q[2:3, :] - cz

        # Only the DMA *wait* is conditional (waiting a never-started copy
        # would hang); the dense d2/matmul runs UNCONDITIONALLY with empty
        # spans (ln == 0) mask-selected to exact zeros. Conditional
        # (pl.when-guarded) matmul regions defeat Mosaic's fast lowering
        # of every f32-accuracy dot variant — measured on v5e: HIGHEST
        # 9810 ms/step, hi/lo splits 5.3-47 s/step under pl.when vs
        # probe-parity (~a few ms) unconditional
        # (scripts/exp_mosaic_dot_probe*.py).
        kcat = _kcat()
        feats_k = []
        wm_k = []
        acc = jnp.zeros((16, q.shape[1]), dt)
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
            w8 = win_ref[s]  # (8, S): cur(3), est(3), 0, 0
            col = _span_iota_col(s_cap)
            sl = (col >= lead) & (col < lead + ln)  # (S, 1); empty if ln=0
            # (S, 1) shifted est window coords for the broadcast d2
            ex = (w8[3:4, :] - cx).reshape(s_cap, 1)
            ey = (w8[4:5, :] - cy).reshape(s_cap, 1)
            ez = (w8[5:6, :] - cz).reshape(s_cap, 1)
            dx = ex - qx  # (S, R)
            dy = ey - qy
            dz = ez - qz
            d2 = dx * dx + dy * dy + dz * dz
            wm = jnp.where(
                (d2 <= r2) & sl,
                jnp.asarray(1.0, dt),
                jnp.asarray(0.0, dt),
            )  # (S, R); stale-window NaN/inf d2 compares False -> 0
            x0 = w8[0:1, :] - cx  # (1, S) shifted CURRENT coords
            x1 = w8[1:2, :] - cy
            x2 = w8[2:3, :] - cz
            one = jnp.ones_like(x0)
            zero = jnp.zeros_like(x0)
            feats = jnp.concatenate(
                [one, x0, x1, x2, x0 * x0, x1 * x1, x2 * x2,
                 x0 * x1, x0 * x2, x1 * x2,
                 zero, zero, zero, zero, zero, zero],
                axis=0,
            )  # (16, S)
            # Zero the feature columns outside [lead, lead + len): stale
            # window content (skipped DMAs, previous tiles, lead slots)
            # can hold sentinels or uninitialized bits, and 0 * inf = NaN
            # would poison acc even through a zero weight row (selects,
            # unlike multiplies, stop NaN).
            row = _span_iota(s_cap)
            feats = jnp.where((row >= lead) & (row < lead + ln),
                              feats, 0.0)
            if kcat:
                feats_k.append(feats)
                wm_k.append(wm)
            else:
                acc = acc + _moment_dot(feats, wm, dt)
        if kcat:
            # One fill for the whole tile (see _kcat).
            acc = _moment_dot(jnp.concatenate(feats_k, axis=1),
                              jnp.concatenate(wm_k, axis=0), dt)
        s0 = acc[0:1, :]  # (1, R)
        s0c = jnp.maximum(s0, 1e-12)
        m0 = acc[1:2, :] / s0c  # shifted mean components
        m1 = acc[2:3, :] / s0c
        m2 = acc[3:4, :] / s0c
        denom = jnp.maximum(s0 - 1.0, 1e-6)
        c00 = (acc[4:5, :] - s0 * m0 * m0) / denom
        c11 = (acc[5:6, :] - s0 * m1 * m1) / denom
        c22 = (acc[6:7, :] - s0 * m2 * m2) / denom
        c01 = (acc[7:8, :] - s0 * m0 * m1) / denom
        c02 = (acc[8:9, :] - s0 * m0 * m2) / denom
        c12 = (acc[9:10, :] - s0 * m1 * m2) / denom
        zero_r = jnp.zeros_like(s0)
        out_ref[:] = jnp.concatenate(
            [m0 + cx, m1 + cy, m2 + cz,
             c00, c11, c22, c01, c02, c12, jnp.maximum(s0, 1e-12),
             zero_r, zero_r, zero_r, zero_r, zero_r, zero_r],
            axis=0,
        )

    return kernel


def _bwd_kernel(ns: int, sr_cap: int, r2: float):
    """Backward kernel body factory: per point tile, accumulate the
    referencing rows' analytic cotangent rows (S, u) through the same
    membership test, then grad_j = S_j x_j + u_j. Same geometry as the
    forward: (16, SR) @ (SR, P) streaming matmul, VPU difference-form d2.
    """

    def kernel(start_ref, lead_ref, len_ref, ctr_ref, rt_ref, c_ref, out_ref,
               win_ref, sems):
        t = pl.program_id(0)
        for s in range(ns):
            @pl.when(len_ref[t * ns + s] > 0)
            def _(s=s):
                pltpu.make_async_copy(
                    rt_ref.at[
                        :,
                        pl.ds(pl.multiple_of(start_ref[t * ns + s], 128),
                              sr_cap),
                    ],
                    win_ref.at[s],
                    sems.at[s],
                ).start()

        x = c_ref[:]  # (8, P): cur(3), est(3)
        dt = x.dtype
        cx = ctr_ref[t * 3 + 0].astype(dt)
        cy = ctr_ref[t * 3 + 1].astype(dt)
        cz = ctr_ref[t * 3 + 2].astype(dt)
        ex = x[3:4, :] - cx  # (1, P) shifted est point coords
        ey = x[4:5, :] - cy
        ez = x[5:6, :] - cz

        # Conditional wait, UNCONDITIONAL masked compute — see the forward
        # kernel's comment (pl.when-guarded matmuls defeat Mosaic's fast
        # lowering of the f32-accuracy dot variants).
        kcat = _kcat()
        rt_k = []
        wm_k = []
        acc = jnp.zeros((16, x.shape[1]), dt)
        for s in range(ns):
            ln = len_ref[t * ns + s]
            lead = lead_ref[t * ns + s]

            @pl.when(ln > 0)
            def _(s=s):
                pltpu.make_async_copy(
                    rt_ref.at[
                        :,
                        pl.ds(pl.multiple_of(start_ref[t * ns + s], 128),
                              sr_cap),
                    ],
                    win_ref.at[s],
                    sems.at[s],
                ).wait()
            rt = win_ref[s]  # (16, SR): qest(3), s6(6), u(3), 0...
            col = _span_iota_col(sr_cap)
            sl = (col >= lead) & (col < lead + ln)  # (SR, 1)
            qx = (rt[0:1, :] - cx).reshape(sr_cap, 1)
            qy = (rt[1:2, :] - cy).reshape(sr_cap, 1)
            qz = (rt[2:3, :] - cz).reshape(sr_cap, 1)
            dx = qx - ex  # (SR, P)
            dy = qy - ey
            dz = qz - ez
            d2 = dx * dx + dy * dy + dz * dz
            wm = jnp.where(
                (d2 <= r2) & sl,
                jnp.asarray(1.0, dt),
                jnp.asarray(0.0, dt),
            )  # (SR, P)
            row = _span_iota(sr_cap)
            rt_m = jnp.where(
                (row >= lead) & (row < lead + ln), rt, 0.0
            )  # (16, SR)
            if kcat:
                rt_k.append(rt_m)
                wm_k.append(wm)
            else:
                acc = acc + _moment_dot(rt_m, wm, dt)
        if kcat:
            acc = _moment_dot(jnp.concatenate(rt_k, axis=1),
                              jnp.concatenate(wm_k, axis=0), dt)
        # acc rows follow RT rows: 0-2 (qest sums, unused), 3-8 = S
        # components (s00, s11, s22, s01, s02, s12), 9-11 = u.
        x0 = x[0:1, :]  # CURRENT global coords (1, P)
        x1 = x[1:2, :]
        x2 = x[2:3, :]
        g0 = acc[3:4] * x0 + acc[6:7] * x1 + acc[7:8] * x2 + acc[9:10]
        g1 = acc[6:7] * x0 + acc[4:5] * x1 + acc[8:9] * x2 + acc[10:11]
        g2 = acc[7:8] * x0 + acc[8:9] * x1 + acc[5:6] * x2 + acc[11:12]
        zero_p = jnp.zeros_like(g0)
        out_ref[:] = jnp.concatenate(
            [g0, g1, g2, zero_p, zero_p, zero_p, zero_p, zero_p], axis=0
        )

    return kernel


def _fwd_call(pts_sorted, q_est, est_sorted, f_start, f_lead, f_len, f_ctr,
              *, t1, r_cap, s_cap, ns_f, r2):
    """Run the forward kernel: returns the raw (16, mq_pad) output."""
    m_pad = pts_sorted.shape[0]
    dt = pts_sorted.dtype
    sentinel = jnp.full((3, s_cap), 1e15, dt)
    c_tab = jnp.concatenate(
        [
            jnp.concatenate([pts_sorted.T, jnp.zeros((3, s_cap), dt)], 1),
            jnp.concatenate([est_sorted[:3].astype(dt), sentinel], 1),
            jnp.zeros((2, m_pad + s_cap), dt),
        ],
        axis=0,
    )  # (8, m_pad + S)
    mq_pad = q_est.shape[1]
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
        _fwd_kernel(ns_f, s_cap, r2),
        out_shape=jax.ShapeDtypeStruct((16, mq_pad), dt),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(f_start.reshape(-1), f_lead.reshape(-1), f_len.reshape(-1),
      f_ctr.reshape(-1), c_tab, q_est.astype(dt))


def _bwd_call(pts_sorted, q_est, est_sorted, table9, b_start, b_lead, b_len,
              b_ctr, *, t2, p_cap, sr_cap, ns_b, r2):
    """Run the backward kernel: (m_pad, 3) gradient wrt current points."""
    m_pad = pts_sorted.shape[0]
    dt = pts_sorted.dtype
    mq_pad = q_est.shape[1]
    rt = jnp.concatenate(
        [
            jnp.concatenate(
                [q_est[:3].astype(dt), jnp.full((3, sr_cap), -1e15, dt)], 1
            ),
            jnp.concatenate(
                [table9.astype(dt), jnp.zeros((9, sr_cap), dt)], 1
            ),
            jnp.zeros((4, mq_pad + sr_cap), dt),
        ],
        axis=0,
    )  # (16, mq_pad + SR)
    c_blocks = jnp.concatenate(
        [pts_sorted.T, est_sorted[:3].astype(dt),
         jnp.zeros((2, m_pad), dt)],
        axis=0,
    )  # (8, m_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(t2,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, p_cap), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, p_cap), lambda t, *_: (0, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ns_b, 16, sr_cap), dt),
            pltpu.SemaphoreType.DMA((ns_b,)),
        ],
    )
    out = pl.pallas_call(
        _bwd_kernel(ns_b, sr_cap, r2),
        out_shape=jax.ShapeDtypeStruct((8, m_pad), dt),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(b_start.reshape(-1), b_lead.reshape(-1), b_len.reshape(-1),
      b_ctr.reshape(-1), rt, c_blocks)
    return out[:3].T  # (m_pad, 3)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(11,))
def _cellwin_core(pts_sorted, q_est, est_sorted, f_start, f_lead, f_len,
                  f_ctr, b_start, b_lead, b_len, b_ctr, dims):
    """(mean (3, mq_pad), comps 6-tuple, w_sum) over the padded row tiles.

    ``dims`` is the static
    (t1, r_cap, s_cap, ns_f, t2, p_cap, sr_cap, ns_b, r2) tuple.
    """
    t1, r_cap, s_cap, ns_f, t2, p_cap, sr_cap, ns_b, r2 = dims
    raw = _fwd_call(pts_sorted, q_est, est_sorted, f_start, f_lead, f_len,
                    f_ctr, t1=t1, r_cap=r_cap, s_cap=s_cap, ns_f=ns_f,
                    r2=r2)
    mean = raw[0:3]
    comps = (raw[3], raw[4], raw[5], raw[6], raw[7], raw[8])
    return mean, comps, raw[9]


def _cellwin_core_fwd(pts_sorted, q_est, est_sorted, f_start, f_lead, f_len,
                      f_ctr, b_start, b_lead, b_len, b_ctr, dims):
    out = _cellwin_core(pts_sorted, q_est, est_sorted, f_start, f_lead,
                        f_len, f_ctr, b_start, b_lead, b_len, b_ctr, dims)
    mean, _comps, w_sum = out
    res = (pts_sorted, q_est, est_sorted, mean, w_sum,
           b_start, b_lead, b_len, b_ctr)
    return out, res


def _cellwin_core_bwd(dims, res, cot):
    from .features import _cotangent_table

    t1, r_cap, s_cap, ns_f, t2, p_cap, sr_cap, ns_b, r2 = dims
    (pts_sorted, q_est, est_sorted, mean, w_sum,
     b_start, b_lead, b_len, b_ctr) = res
    g_mean, g_comps, _g_wsum = cot
    table9 = _cotangent_table(mean, w_sum, (g_mean, g_comps))
    grad = _bwd_call(pts_sorted, q_est, est_sorted, table9,
                     b_start, b_lead, b_len, b_ctr,
                     t2=t2, p_cap=p_cap, sr_cap=sr_cap, ns_b=ns_b,
                     r2=r2)
    return (grad, None, None, None, None, None, None, None, None, None,
            None)


_cellwin_core.defvjp(_cellwin_core_fwd, _cellwin_core_bwd)


# ---------------------------------------------------------------------------
# Device-side graph + public op
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CellWinDevice:
    """Device-resident cell-window graph (pytree; shapes static).

    ``dims`` = (t1, r_cap, s_cap, ns_f, t2, p_cap, sr_cap, ns_b, r2)
    static metadata.
    ``perm``/``inv`` map the ORIGINAL merged point table into the padded
    cell-sorted layout the kernels consume (use with
    ops.features.permute_rows; padding slots read row 0 and their
    gradients are dropped by the inverse gather).
    """

    q_est: object
    est_sorted: object
    f_start: object  # 128-aligned span starts (see f_lead)
    f_lead: object  # start % 128 — true span occupies [lead, lead + len)
    f_len: object
    f_ctr: object
    b_start: object
    b_lead: object
    b_len: object
    b_ctr: object
    perm: object
    inv: object
    row_map: object  # (mq_pad,) int32 -> original compacted row / -1
    exc_slots: object
    exc_nn: object
    exc_w: object
    exc_tg: object  # BucketedTranspose or None
    dims: tuple = dataclasses.field(metadata=dict(static=True), default=())
    n_exc: int = dataclasses.field(metadata=dict(static=True), default=0)


jax.tree_util.register_dataclass(
    CellWinDevice,
    data_fields=[
        "q_est", "est_sorted", "f_start", "f_lead", "f_len", "f_ctr",
        "b_start", "b_lead", "b_len", "b_ctr", "perm", "inv", "row_map",
        "exc_slots", "exc_nn", "exc_w", "exc_tg",
    ],
    meta_fields=["dims", "n_exc"],
)


def graph_to_device(g: CellWinGraph) -> CellWinDevice:
    """Upload the host graph; builds the exception-path transpose."""
    exc_tg = None
    exc_w = jnp.zeros((0, 1), jnp.float32)
    exc_nn = jnp.zeros((0, 1), jnp.int32)
    exc_slots = jnp.zeros((0,), jnp.int32)
    if g.n_exc:
        from .features import build_bucketed_transpose

        exc_w_np = (g.exc_nn >= 0).astype(np.float32)
        exc_tg = build_bucketed_transpose(
            g.exc_nn, num_points=g.m_pad, weights=exc_w_np
        )
        exc_w = jnp.asarray(exc_w_np)
        exc_nn = jnp.asarray(g.exc_nn)
        exc_slots = jnp.asarray(g.exc_slots)
    # Span starts are 128-aligned here (Mosaic requires provably aligned
    # dynamic lane-dim DMA offsets); the kernels mask off the lead slots.
    # The graph keeps RAW starts so the build-time audit stays layout-free.
    f_lead = g.f_span_start % 128
    b_lead = g.b_span_start % 128
    return CellWinDevice(
        q_est=jnp.asarray(g.q_est),
        est_sorted=jnp.asarray(g.est_sorted),
        f_start=jnp.asarray(g.f_span_start - f_lead),
        f_lead=jnp.asarray(f_lead),
        f_len=jnp.asarray(g.f_span_len),
        f_ctr=jnp.asarray(g.f_tile_ctr),
        b_start=jnp.asarray(g.b_span_start - b_lead),
        b_lead=jnp.asarray(b_lead),
        b_len=jnp.asarray(g.b_span_len),
        b_ctr=jnp.asarray(g.b_tile_ctr),
        perm=jnp.asarray(g.perm),
        inv=jnp.asarray(g.inv),
        row_map=jnp.asarray(g.row_map),
        exc_slots=exc_slots,
        exc_nn=exc_nn,
        exc_w=exc_w,
        exc_tg=exc_tg,
        dims=(g.n_row_tiles, g.row_cap, g.span_cap, g.ns_f,
              g.n_pt_tiles, g.pt_cap, g.rspan_cap, g.ns_b, g.r2),
        n_exc=g.n_exc,
    )


def cellwin_moments(pts_sorted, dev: CellWinDevice):
    """Weighted neighborhood moments over the padded row tiles.

    :param pts_sorted: (m_pad, 3) CURRENT positions in the padded
        cell-sorted layout (permute the merged table with ``dev.perm``).
    :return: (mean (3, mq_pad), comps 6-tuple of (mq_pad,)).

    Exception rows (boundary-ambiguous membership) are recomputed through
    the ordinary gather path and merged; autodiff consequently routes their
    gradients through that branch and the kernels' (arbitrary) verdicts on
    them never reach the loss.
    """
    mean, comps, _w_sum = _cellwin_core(
        pts_sorted, dev.q_est, dev.est_sorted, dev.f_start, dev.f_lead,
        dev.f_len, dev.f_ctr, dev.b_start, dev.b_lead, dev.b_len,
        dev.b_ctr, dev.dims,
    )
    if dev.n_exc:
        from .features import neighborhood_moments_bucketed

        em, ec = neighborhood_moments_bucketed(
            pts_sorted, dev.exc_nn, dev.exc_w, dev.exc_tg
        )
        mean = mean.at[:, dev.exc_slots].set(em)
        comps = tuple(
            c.at[dev.exc_slots].set(e) for c, e in zip(comps, ec)
        )
    return mean, comps


def cellwin_features(pts_sorted, dev: CellWinDevice):
    """Feature dict over the padded rows (the loss-path tail of
    ops.features.neighborhood_features' analytic fast path)."""
    from .eigh3 import eigvals3_c

    mean, comps = cellwin_moments(pts_sorted, dev)
    a00, a11, a22, a01, a02, a12 = comps
    l1, l2, l3 = eigvals3_c(*comps)
    return {
        "mean": mean.T,
        "trace": a00 + a11 + a22,
        "eigvals": jnp.stack([l1, l2, l3], axis=-1),
    }
