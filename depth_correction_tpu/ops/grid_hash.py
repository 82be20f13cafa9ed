"""Grid-hash (voxel-bucket) radius neighbor search — the scalable engine.

The tiled brute-force scan (:mod:`.knn`) is exact but O(N*Q): at 10^6
points the global-cloud establishment costs ~10^12 distance ops. This
module buckets points into voxels of side >= r so each query only examines
the 27 cells that can contain a within-r neighbor (reference equivalent:
the CPU cKDTree in src/depth_correction/nearest_neighbors.py:22-80):

1. cell coords = floor(points / cell_size) (shifted to start at 0),
2. linearized ids, one argsort to bucket points by cell id,
3. per query: 27 ``searchsorted`` bucket lookups + a fixed-occupancy
   window of ``bucket_cap`` candidate slots per cell,
4. distance filter + ``top_k`` -> up to K nearest within r, -1 padded.

Everything after sizing runs on the device inside one jitted program with
static shapes; XLA lowers the (Q, 27*B) candidate pipeline as lane-axis
gathers + a batched sort, no scatter. Out-of-range neighbor cells are
masked out (columns by a bounds check, the z-window by clamping into the
valid z range), so the search is exact whenever ``cell_size >= r`` and
``bucket_cap`` covers the fullest cell (the default sizing pass guarantees
it) — including thin-slab scenes where a grid axis has <= 2 cells.

Sizing (`bucket_cap`, cell-grid extents) is host-side metadata computed
once; establishment runs once per training (reference train.py:166-175),
so the host sync is off the hot path.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "grid_radius_neighbors",
    "grid_radius_neighbors_sharded",
    "grid_neighbor_counts",
    "grid_occupancy",
    "grid_establish_traced",
    "grid_sort_traced",
]

_QUERY_CHUNK = 32768
# Below this size the O(N*Q) tiled scan beats the grid's sort/searchsorted
# setup; shared by the establishment router and suggest_k_max.
GRID_NN_MIN_POINTS = 65536
# Dense per-cell bucket-start table (one gather instead of a binary search
# per neighbor column) up to this many cells; 2^23 entries = 32 MB HBM.
_DENSE_STARTS_MAX_CELLS = 1 << 23


@partial(jax.jit, static_argnames=("cell_size",))
def _cell_ids(points, mins, dims, cell_size):
    """Linearized voxel id per point; invalid coords clamp into range."""
    c = jnp.floor((points - mins) / cell_size).astype(jnp.int32)
    c = jnp.clip(c, 0, dims[None] - 1)
    return (c[:, 0] * dims[1] + c[:, 1]) * dims[2] + c[:, 2], c


@jax.jit
def _minmax(points, valid):
    """Masked per-axis min/max — computed ON DEVICE so sizing pulls six
    scalars instead of the whole point array (the naive np.asarray(points)
    cost ~seconds per call through a remote-device tunnel)."""
    big = jnp.asarray(jnp.inf, points.dtype)
    lo = jnp.min(jnp.where(valid[:, None], points, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], points, -big), axis=0)
    return lo, hi


def _grid_meta(points, valid, cell_size):
    """Sizing: per-axis mins, cell-grid dims, final cell size. Only six
    scalars cross to the host.

    Scenes whose extent would need >= 2^31 cells auto-coarsen: the cell
    doubles until the linearized ids fit int32. Exactness is preserved
    (coverage only needs ``cell >= r``); bigger cells just widen the
    candidate windows, degrading speed gracefully instead of raising.
    """
    if valid is None:
        valid = jnp.ones(points.shape[0], bool)
    lo, hi = _minmax(jnp.asarray(points), jnp.asarray(valid))
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    if not np.isfinite(lo).all():  # no valid points
        lo = hi = np.zeros(3)
    while True:
        mins = np.floor(lo / cell_size) * cell_size
        dims = np.floor((hi - mins) / cell_size).astype(np.int64) + 1
        if int(dims[0]) * int(dims[1]) * int(dims[2]) < 2**31:
            return mins, dims.astype(np.int32), float(cell_size)
        cell_size = 2.0 * cell_size


def grid_occupancy(ids_sorted: jax.Array) -> jax.Array:
    """Maximum bucket occupancy of a sorted id array (device-side)."""
    n = ids_sorted.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    start = jnp.concatenate(
        [jnp.ones(1, bool), ids_sorted[1:] != ids_sorted[:-1]]
    )
    run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(start, pos, 0))
    return jnp.max(pos - run_start) + 1


def _grid_query_chunk_impl(
    q_pts,  # (Q, 3)
    q_valid,  # (Q,)
    pts_sorted_T,  # (3, N) points in bucket order
    valid_sorted,  # (N,) validity in bucket order
    ids_sorted,  # (N,)
    order,  # (N,) bucket order -> original index
    mins,  # (3,)
    dims,  # (3,) int32
    r2,
    k: int,
    bucket_cap: int,
    cell_size,  # python float (eager callers) or traced scalar (fused node)
    cell_starts=None,  # (num_cells + 1,) dense bucket starts, or None
):
    n = ids_sorted.shape[0]
    q = q_pts.shape[0]
    cq = jnp.floor((q_pts - mins) / cell_size).astype(jnp.int32)  # (Q, 3)

    # The three z-neighbor cells of each (dx, dy) column have CONTIGUOUS
    # linear ids, so one searchsorted per column + a 3*bucket_cap window
    # covers them: 9 binary searches instead of 27. Out-of-range (dx, dy)
    # columns are masked out (col_ok) and the z-window is clamped to the
    # valid z range — unclamped ids would alias OTHER real cells, and when
    # any grid axis has <= 2 cells (thin slabs) the aliased cells coincide
    # with other searched columns, double-counting their points (duplicates
    # evict true neighbors from top-k).
    offs = jnp.asarray(
        [[dx, dy] for dx in (-1, 0, 1) for dy in (-1, 0, 1)], jnp.int32
    )  # (9, 2)
    cc = cq[:, None, :2] + offs[None]  # (Q, 9, 2)
    col_ok = (
        (cc[..., 0] >= 0)
        & (cc[..., 0] < dims[0])
        & (cc[..., 1] >= 0)
        & (cc[..., 1] < dims[1])
    )  # (Q, 9)
    zlo = jnp.clip(cq[:, 2] - 1, 0, dims[2] - 1)  # (Q,)
    zhi = jnp.clip(cq[:, 2] + 1, 0, dims[2] - 1)
    base = (cc[..., 0] * dims[1] + cc[..., 1]) * dims[2]  # (Q, 9)
    lo = base + zlo[:, None]
    # Clamp column ids of masked columns into range so gathers/searches stay
    # well-defined; their results are discarded via col_ok.
    n_cells_total = dims[0] * dims[1] * dims[2]
    lo = jnp.clip(lo, 0, n_cells_total - 1)

    if cell_starts is not None:
        # Dense start table: the EXACT window [starts[lo], starts[lo+zlen])
        # per column — two clamped (Q, 9) gathers replace both the binary
        # search and the (W, Q) id-membership gathers. Invalid points carry a
        # sentinel id past n_cells, so they sit beyond starts[n_cells] and
        # never land in a window: no validity gather either.
        n_cells = cell_starts.shape[0] - 1
        zlen = (zhi - zlo + 1)[:, None]  # (Q, 1) in [1, 3]
        start = jnp.take(cell_starts, jnp.clip(lo, 0, n_cells))  # (Q, 9)
        end = jnp.take(cell_starts, jnp.clip(lo + zlen, 0, n_cells))
        length = jnp.where(col_ok, end - start, 0)
        win = bucket_cap  # max 3-cell run (sized in _build_grid)
        slots_raw = (
            start.T[:, None, :] + jnp.arange(win, dtype=jnp.int32)[None, :, None]
        ).reshape(9 * win, q)  # (W, Q)
        slots = jnp.minimum(slots_raw, n - 1)
        in_window = (
            jnp.arange(win, dtype=jnp.int32)[None, :, None]
            < length.T[:, None, :]
        ).reshape(9 * win, q)
    else:
        start = jnp.searchsorted(ids_sorted, lo)  # (Q, 9)
        win = 3 * bucket_cap
        # (W=9*win, Q) slot layout: indices and gather outputs keep the long
        # axis off the minor dim only for the index table; outputs ride lanes.
        slots_raw = (
            start.T[:, None, :] + jnp.arange(win, dtype=jnp.int32)[None, :, None]
        ).reshape(9 * win, q)  # (W, Q)
        # Slots past the array end clamp for the gather but MUST be masked
        # out: the clamped last slot would otherwise pass the id-window
        # check once per overflowing position (duplicates eat top-k slots).
        slots = jnp.minimum(slots_raw, n - 1)
        ids_c = jnp.take(ids_sorted, slots)  # (W, Q)
        lo_w = jnp.repeat(lo.T, win, axis=0)  # (W, Q)
        hi_w = jnp.repeat((base + zhi[:, None]).T, win, axis=0)
        ok_w = jnp.repeat(col_ok.T, win, axis=0)
        in_window = (
            (ids_c >= lo_w)
            & (ids_c <= hi_w)
            & ok_w
            & (slots_raw < n)
            & jnp.take(valid_sorted, slots)
        )

    cand = jnp.take(pts_sorted_T, slots, axis=1)  # (3, W, Q)
    diff = cand - q_pts.T[:, None, :]
    d2 = jnp.sum(diff * diff, axis=0)  # (W, Q)
    big = jnp.asarray(jnp.inf, d2.dtype)
    d2 = jnp.where(in_window & (d2 <= r2) & q_valid[None, :], d2, big)

    if k == 0:  # counts-only mode
        return jnp.sum(~jnp.isinf(d2), axis=0, dtype=jnp.int32)

    # Drop-in contract with radius_neighbors: any k is accepted — when k
    # exceeds the candidate width W (possible on sparse clouds where the
    # window floors at 8), the extra columns pad with -1/inf.
    k_eff = min(k, d2.shape[0])
    neg_top, arg = jax.lax.top_k(-d2.T, k_eff)  # (Q, k); one (W, Q) relayout
    best_d2 = -neg_top
    best_slot = jnp.take_along_axis(slots.T, arg, axis=1)
    idx = jnp.take(order, best_slot)
    missing = jnp.isinf(best_d2)
    idx = jnp.where(missing, -1, idx)
    d = jnp.sqrt(jnp.where(missing, 0.0, best_d2))
    d = jnp.where(missing, big, d)
    if k_eff < k:
        pad = k - k_eff
        d = jnp.concatenate([d, jnp.full((d.shape[0], pad), big, d.dtype)], 1)
        idx = jnp.concatenate(
            [idx, jnp.full((idx.shape[0], pad), -1, idx.dtype)], 1
        )
    return d, idx


_grid_query_chunk = partial(
    jax.jit, static_argnames=("k", "bucket_cap", "cell_size")
)(_grid_query_chunk_impl)


def grid_establish_traced(points, valid, r: float, n_cells_pad: int):
    """Grid build with ALL data-dependent work traced — zero host syncs.

    :func:`_build_grid` sizes the grid on the host (six-scalar bbox pull,
    window-width readback): fine for once-per-training establishment, but a
    streaming caller (node.py) pays ~1 tunnel RTT per sync per scan. This
    variant keeps everything on device so establishment + query + features
    fuse into ONE XLA program:

    - bbox min/max: traced reductions;
    - cell side: starts at ``r`` and doubles until the cell count fits the
      static ``n_cells_pad`` dense-starts table — chosen by a feasibility
      scan over 32 candidate doublings (log2-sum test with a conservative
      margin, so f32 rounding can only over-coarsen, never overflow the
      table). Exactness only needs ``cell >= r``;
    - dense starts: ``searchsorted`` over a static ``n_cells_pad + 1``
      arange; invalid points carry the sentinel id ``n_cells_pad`` so they
      sort past every real cell and the padded table tail reads empty;
    - ``true_win``: the max 3-cell-run width, returned ON DEVICE so the
      caller can verify its static window width covered the scan (fetched
      alongside the outputs it reads anyway — no extra round trip).

    Returns ``(pts_sorted_T, valid_sorted, ids_sorted, order, mins, dims,
    cell, cell_starts, true_win)`` — the :func:`_grid_query_chunk_impl`
    operand set plus the width check.
    """
    (pts_sorted_T, valid_sorted, ids_sorted, order, mins, dims,
     cell) = grid_sort_traced(points, valid, r, n_cells_pad)
    cell_starts = jnp.searchsorted(
        ids_sorted, jnp.arange(n_cells_pad + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    true_win = jnp.max(cell_starts[3:] - cell_starts[:-3])
    return (pts_sorted_T, valid_sorted, ids_sorted, order, mins, dims, cell,
            cell_starts, true_win)


def grid_sort_traced(points, valid, r: float, n_cells_pad: int,
                     sort_axes: bool = False):
    """The traced grid SORT shared by the establishment variants: bbox,
    in-program cell coarsening (see :func:`grid_establish_traced`), cell
    ids with the ``n_cells_pad`` sentinel on invalid rows, one argsort.

    :param sort_axes: relabel the grid axes (a traced (3,) permutation of
        dims and of the id mixed radix — point coordinates are untouched)
        so slab-range consumers (ops/slabwin.py) slice thin slabs:
        ``'major'``/True puts the LONGEST extent first; ``'second'`` puts
        the second-longest first (the complementary pass — any plane is
        thin along at least one of the two).
    Returns (pts_sorted_T, valid_sorted, ids_sorted, order, mins, dims,
    cell); ``dims`` is in the (possibly relabeled) id axis order.
    """
    points = jnp.asarray(points)
    if valid is None:
        valid = jnp.ones(points.shape[0], bool)
    big = jnp.asarray(jnp.inf, points.dtype)
    lo = jnp.min(jnp.where(valid[:, None], points, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], points, -big), axis=0)
    has_pts = jnp.isfinite(lo).all()
    lo = jnp.where(has_pts, lo, 0.0)
    hi = jnp.where(has_pts, hi, 0.0)

    cells = jnp.asarray(r, points.dtype) * (
        2.0 ** jnp.arange(32, dtype=points.dtype)
    )  # (32,)
    mins_c = jnp.floor(lo[None] / cells[:, None]) * cells[:, None]  # (32, 3)
    dims_c = (
        jnp.floor((hi[None] - mins_c) / cells[:, None]).astype(jnp.int32) + 1
    )  # (32, 3)
    log_cells = jnp.sum(jnp.log2(dims_c.astype(points.dtype)), axis=1)
    feasible = log_cells <= (float(np.log2(n_cells_pad)) - 1e-3)
    ji = jnp.argmax(feasible)  # feasibility is monotone in the doubling index
    cell = cells[ji]
    mins = mins_c[ji]
    dims = dims_c[ji]

    c = jnp.floor((points - mins) / cell).astype(jnp.int32)
    c = jnp.clip(c, 0, dims[None] - 1)
    if sort_axes:
        perm = jnp.argsort(-dims)  # traced (3,) axis relabeling
        if sort_axes == "second":
            perm = jnp.take(perm, jnp.asarray([1, 0, 2]))
        dims = jnp.take(dims, perm)
        c = jnp.take(c, perm, axis=1)
    lin = (c[:, 0] * dims[1] + c[:, 1]) * dims[2] + c[:, 2]
    ids = jnp.where(valid, lin, jnp.asarray(n_cells_pad, jnp.int32))
    order = jnp.argsort(ids).astype(jnp.int32)
    ids_sorted = jnp.take(ids, order)
    pts_sorted_T = jnp.take(points.T, order, axis=1)
    valid_sorted = jnp.take(valid, order)
    return pts_sorted_T, valid_sorted, ids_sorted, order, mins, dims, cell


def grid_sort_colpad_traced(points, valid, r: float, n_cells_pad: int,
                            x_cols_pad: int = 512):
    """Column-aligned traced sort for the slab engine (ops/slabwin.py).

    Like :func:`grid_sort_traced` with the LONGEST axis major, but every
    major-axis column's sorted run starts at a 128-multiple slot — so the
    slab engine's fixed 128-query tiles never cross a column and their
    per-tile second-axis (y) windows stay tight (a tile straddling two
    columns would otherwise see y wrap from ny-1 back to 0 and widen its
    window to the whole slab; measured w_slab 16384 vs ~1k on the bench
    scan). The feasibility scan additionally bounds the major dim to
    ``x_cols_pad`` columns (over-coarsening pencil-shaped scenes keeps
    exactness: only ``cell >= r`` matters).

    :return: ``(pts_pad_T (3, n_pad), valid_pad, ids_pad, slot_of_orig,
        mins, dims, cell, dims0_ideal)`` with ``n_pad = N + 128 *
        x_cols_pad`` (static); ``slot_of_orig`` maps each ORIGINAL row to
        its padded slot (no second argsort needed to unsort). ``ids_pad``
        is globally non-decreasing (padding slots inherit the last id of
        their column block; tail slots carry the sentinel), so
        ``searchsorted`` span queries remain valid; padding slots are
        invalid with sentinel positions. ``dims0_ideal`` is the major dim
        the COUNT-only feasibility would pick — streaming callers size
        ``x_cols_pad`` to it (a too-small bound silently over-coarsens
        the grid, which stays exact but widens the spans; a too-large one
        pays dead padding tiles).
    """
    points = jnp.asarray(points)
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones(n, bool)
    big = jnp.asarray(jnp.inf, points.dtype)
    lo = jnp.min(jnp.where(valid[:, None], points, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], points, -big), axis=0)
    has_pts = jnp.isfinite(lo).all()
    lo = jnp.where(has_pts, lo, 0.0)
    hi = jnp.where(has_pts, hi, 0.0)

    cells = jnp.asarray(r, points.dtype) * (
        2.0 ** jnp.arange(32, dtype=points.dtype)
    )
    mins_c = jnp.floor(lo[None] / cells[:, None]) * cells[:, None]
    dims_c = (
        jnp.floor((hi[None] - mins_c) / cells[:, None]).astype(jnp.int32) + 1
    )
    log_cells = jnp.sum(jnp.log2(dims_c.astype(points.dtype)), axis=1)
    count_ok = log_cells <= (float(np.log2(n_cells_pad)) - 1e-3)
    feasible = count_ok & (jnp.max(dims_c, axis=1) <= x_cols_pad)
    ji = jnp.argmax(feasible)
    cell = cells[ji]
    mins = mins_c[ji]
    dims = dims_c[ji]
    dims0_ideal = jnp.max(dims_c[jnp.argmax(count_ok)])

    c = jnp.floor((points - mins) / cell).astype(jnp.int32)
    c = jnp.clip(c, 0, dims[None] - 1)
    perm = jnp.argsort(-dims)  # longest axis major
    dims = jnp.take(dims, perm)
    c = jnp.take(c, perm, axis=1)
    dimyz = dims[1] * dims[2]
    lin = (c[:, 0] * dims[1] + c[:, 1]) * dims[2] + c[:, 2]
    ids = jnp.where(valid, lin, jnp.asarray(n_cells_pad, jnp.int32))
    order = jnp.argsort(ids).astype(jnp.int32)
    ids_sorted = jnp.take(ids, order)
    # Sentinel rows must land in the virtual overflow column regardless of
    # dimyz (id // dimyz of the sentinel can alias a real column when the
    # grid is yz-heavy).
    xcol_sorted = jnp.where(
        ids_sorted >= jnp.asarray(n_cells_pad, jnp.int32),
        jnp.asarray(x_cols_pad, jnp.int32),
        jnp.minimum(ids_sorted // dimyz, x_cols_pad),
    )

    # Per-column counts / first-positions via searchsorted over the
    # ASCENDING xcol_sorted (TPU scatters and segment sums serialize; the
    # scatter-based first version of this function measured 34.5 ms
    # against ~5 ms for the plain sort it wraps).
    col_first_all = jnp.searchsorted(
        xcol_sorted, jnp.arange(x_cols_pad + 1, dtype=jnp.int32)
    ).astype(jnp.int32)  # (x_cols_pad + 1,)
    counts = col_first_all[1:] - col_first_all[:-1]  # valid rows per column
    col_first = col_first_all[:-1]
    padded_counts = -(-counts // 128) * 128
    ends_pad = jnp.cumsum(padded_counts)  # (x_cols_pad,) block ends
    starts_pad = ends_pad - padded_counts
    used = ends_pad[-1]
    n_valid = col_first_all[-1]  # sentinels sort past every real column

    j = jnp.arange(n, dtype=jnp.int32)
    rank = j - jnp.take(col_first, jnp.minimum(xcol_sorted, x_cols_pad - 1))
    dest = jnp.where(
        xcol_sorted < x_cols_pad,
        jnp.take(starts_pad, jnp.minimum(xcol_sorted, x_cols_pad - 1)) + rank,
        used + (j - n_valid),  # invalid rows: sequential tail slots
    ).astype(jnp.int32)

    # The slot -> sorted-row inverse follows ARITHMETICALLY from the block
    # structure (a scatter-table inverse measured 34.5 ms, a full
    # searchsorted(dest, arange(n_pad)) 51.7 — both dominated the sort):
    # slot s of column block c holds sorted row col_first[c] +
    # (s - starts_pad[c]) when that offset is below the column's real
    # count; tail slots continue the invalid run. Only the 513-entry
    # block-bounds searchsorted remains (shared with the pad-id below).
    n_pad = n + 128 * x_cols_pad
    slot_iota = jnp.arange(n_pad, dtype=jnp.int32)
    # method='sort': the default binary scan issues ~log2(n) serialized
    # gathers per key (~10 ms for these 194k keys); one co-sort is ~4 ms.
    col_of_slot = jnp.searchsorted(
        ends_pad, slot_iota, side="right", method="sort"
    ).astype(jnp.int32)
    in_cols = col_of_slot < x_cols_pad
    colc = jnp.minimum(col_of_slot, x_cols_pad - 1)
    off = slot_iota - jnp.take(starts_pad, colc)
    j_of_slot = jnp.where(
        in_cols,
        jnp.take(col_first, colc) + off,
        n_valid + (slot_iota - used),  # the invalid tail run
    )
    has_src = jnp.where(in_cols, off < jnp.take(counts, colc),
                        j_of_slot < n)
    jj = jnp.clip(j_of_slot, 0, n - 1)
    pts_pad_T = jnp.where(
        has_src[None, :],
        jnp.take(jnp.take(points.T, order, axis=1), jj, axis=1),
        jnp.asarray(1e15, points.dtype),
    )
    valid_pad = has_src & jnp.take(jnp.take(valid, order), jj)
    # Padding ids: block c's padding inherits (c+1)*dimyz - 1 (>= every id
    # in column c, <= every id in column c+1 — monotone); past the used
    # region (and the invalid tail) the sentinel keeps searchsorted keys
    # below every padding slot.
    pad_id = jnp.where(
        col_of_slot < x_cols_pad,
        (jnp.minimum(col_of_slot, x_cols_pad - 1) + 1) * dimyz - 1,
        jnp.asarray(n_cells_pad, jnp.int32),
    )
    ids_pad = jnp.where(has_src, jnp.take(ids_sorted, jj), pad_id)
    # orig -> padded slot without a scatter: sort (order, dest) by order.
    _, slot_of_orig = jax.lax.sort_key_val(order, dest)
    return (pts_pad_T, valid_pad, ids_pad, slot_of_orig, mins, dims, cell,
            dims0_ideal)


def grid_radius_neighbors(
    points: jax.Array,
    query: Optional[jax.Array] = None,
    r: float = 1.0,
    k: int = 32,
    valid_points: Optional[jax.Array] = None,
    valid_query: Optional[jax.Array] = None,
    bucket_cap: Optional[int] = None,
    cell_size: Optional[float] = None,
    static_shapes: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Up to ``k`` nearest neighbors within ``r`` via voxel buckets.

    Drop-in for :func:`depth_correction_tpu.ops.knn.radius_neighbors`
    (same -1/inf padding; same semantics as the reference's
    ``query_ball_point`` + pad-to-rectangular, nearest_neighbors.py:51-73)
    with O(Q * 27 * bucket_cap) distance work instead of O(Q * N).

    :param bucket_cap: static max points per voxel; default = measured
        occupancy (exact). Lower values trade exactness for speed.
    :param cell_size: voxel side, must be >= r for exactness; default r.
    :param static_shapes: pow2-round the data-dependent shapes (window
        width, dense-starts length) so streaming callers stop recompiling
        after a few scans; results are identical.
    """
    grid, bucket_cap = _build_grid(points, valid_points, r, cell_size,
                                   bucket_cap, static_shapes=static_shapes)
    outs = _run_chunks(grid, bucket_cap, points, query, valid_query, r, k)
    d = jnp.concatenate([o[0] for o in outs])
    idx = jnp.concatenate([o[1] for o in outs])
    nq = (points if query is None else query).shape[0]
    return d[:nq], idx[:nq]


def grid_radius_neighbors_sharded(
    points: jax.Array,
    query: Optional[jax.Array] = None,
    r: float = 1.0,
    k: int = 32,
    valid_points: Optional[jax.Array] = None,
    valid_query: Optional[jax.Array] = None,
    mesh=None,
    bucket_cap: Optional[int] = None,
    cell_size: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """:func:`grid_radius_neighbors` with the QUERY axis sharded over a mesh.

    Establishment is the one O(N)-output step of training prep; under
    shard_map each device searches its 1/D slice of the queries against the
    replicated grid (the sorted position/id tables are O(N * 3) floats — the
    (Q, K) outputs, the big tables, are born sharded and never replicate).
    Results are bitwise identical to the single-device engine.

    :param mesh: 1-D ``jax.sharding.Mesh``; its first axis shards queries.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    assert mesh is not None and len(mesh.axis_names) == 1, mesh
    axis = mesh.axis_names[0]
    n_dev = int(np.prod(mesh.devices.shape))

    grid, width = _build_grid(points, valid_points, r, cell_size, bucket_cap)
    (pts_sorted_T, valid_sorted, ids_sorted, order, mins, dims, cell,
     cell_starts) = grid

    q = jnp.asarray(points if query is None else query)
    nq = q.shape[0]
    if valid_query is None:
        valid_query = jnp.ones(nq, bool)
    # Pad so each device holds a whole number of query chunks.
    pad = (-nq) % (n_dev * _QUERY_CHUNK)
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, 3), q.dtype)])
        valid_query = jnp.concatenate([valid_query, jnp.zeros(pad, bool)])
    r2 = jnp.asarray(r, pts_sorted_T.dtype) ** 2

    # Grid tables ride as explicit replicated ARGUMENTS (closure constants
    # get literal-pooled into the program — see CLAUDE.md).
    def body(q_s, qv_s, pts_T, val_s, ids_s, ordr, starts):
        outs = [
            _grid_query_chunk(
                q_s[i : i + _QUERY_CHUNK],
                qv_s[i : i + _QUERY_CHUNK],
                pts_T,
                val_s,
                ids_s,
                ordr,
                mins,
                dims,
                r2,
                k,
                width,
                cell,
                starts,
            )
            for i in range(0, q_s.shape[0], _QUERY_CHUNK)
        ]
        return (
            jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]),
        )

    ps = PartitionSpec(axis)
    pr = PartitionSpec()
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(ps, ps, pr, pr, pr, pr, pr),
        out_specs=(ps, ps),
        check_vma=False,
    )
    qs = jax.device_put(q, NamedSharding(mesh, ps))
    qvs = jax.device_put(valid_query, NamedSharding(mesh, ps))
    d, idx = sharded(qs, qvs, pts_sorted_T, valid_sorted, ids_sorted, order,
                     cell_starts)
    return d[:nq], idx[:nq]


def grid_neighbor_counts(
    points: jax.Array,
    query: Optional[jax.Array] = None,
    r: float = 1.0,
    valid_points: Optional[jax.Array] = None,
    valid_query: Optional[jax.Array] = None,
    bucket_cap: Optional[int] = None,
    cell_size: Optional[float] = None,
) -> jax.Array:
    """Number of valid points within ``r`` of each query (grid-accelerated
    equivalent of :func:`depth_correction_tpu.ops.knn.neighbor_counts`)."""
    grid, bucket_cap = _build_grid(points, valid_points, r, cell_size, bucket_cap)
    outs = _run_chunks(grid, bucket_cap, points, query, valid_query, r, 0)
    nq = (points if query is None else query).shape[0]
    return jnp.concatenate(outs)[:nq]


def _ceil_pow2(n: int) -> int:
    return 1 << max(int(n - 1).bit_length(), 0)


def _build_grid(points, valid_points, r, cell_size, bucket_cap,
                static_shapes: bool = False):
    points = jnp.asarray(points)
    cell = float(cell_size if cell_size is not None else r)
    if cell < r:
        raise ValueError("cell_size %g < r %g breaks 27-cell coverage" % (cell, r))
    if valid_points is None:
        valid_points = jnp.ones(points.shape[0], bool)

    mins_np, dims_np, cell = _grid_meta(points, valid_points, cell)
    mins = jnp.asarray(mins_np, points.dtype)
    dims = jnp.asarray(dims_np)

    ids, _ = _cell_ids(points, mins, dims, cell)
    # Invalid (padding) points get an id past every real cell so they sort to
    # the end and never match a searched bucket.
    last = jnp.asarray(
        int(dims_np[0]) * int(dims_np[1]) * int(dims_np[2]), jnp.int32
    )
    ids = jnp.where(valid_points, ids, last)
    order = jnp.argsort(ids).astype(jnp.int32)
    ids_sorted = jnp.take(ids, order)

    pts_sorted_T = jnp.take(points.T, order, axis=1)
    valid_sorted = jnp.take(valid_points, order)

    n_cells = int(dims_np[0]) * int(dims_np[1]) * int(dims_np[2])
    cell_starts = None
    if n_cells <= _DENSE_STARTS_MAX_CELLS:
        # Dense bucket-start table: cell_starts[c] = first sorted slot with
        # id >= c. Gives exact per-column windows (no binary search, no
        # membership gathers) and the true max 3-cell-run width.
        cell_starts = jnp.searchsorted(
            ids_sorted, jnp.arange(n_cells + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
        if n_cells >= 3:
            win = int(jnp.max(cell_starts[3:] - cell_starts[:-3]))
        else:
            win = int(cell_starts[-1] - cell_starts[0])
        if bucket_cap is not None:
            win = min(win, 3 * int(bucket_cap))
        # The chunk kernel uses this directly as the window width.
        width = max(int(-(-max(win, 1) // 8) * 8), 8)
    elif bucket_cap is None:
        # Occupancy of real cells only (the invalid-id run may be longer):
        # invalid slots get distinct negative ids, i.e. runs of length 1.
        occ = int(grid_occupancy(jnp.where(ids_sorted >= last, -jnp.arange(
            ids_sorted.shape[0], dtype=jnp.int32) - 1, ids_sorted)))
        width = max(int(-(-occ // 8) * 8), 8)
    else:
        width = int(bucket_cap)

    if static_shapes:
        # Streaming callers (node.py) see a NEW data-dependent width and
        # cell_starts length every scan — each a fresh compile of the chunk
        # kernel. Round both up to powers of two so the set of compiled
        # programs saturates after a handful of scans. Exactness is
        # unaffected: a wider window only adds masked-out slots, and the
        # padded cell_starts tail repeats the last real entry (the first
        # invalid slot), so out-of-range cells read empty windows.
        width = _ceil_pow2(width)
        if cell_starts is not None:
            padded = _ceil_pow2(n_cells) + 1
            if padded > cell_starts.shape[0]:
                cell_starts = jnp.concatenate([
                    cell_starts,
                    jnp.full(padded - cell_starts.shape[0],
                             cell_starts[-1], cell_starts.dtype),
                ])

    grid = (pts_sorted_T, valid_sorted, ids_sorted, order, mins, dims, cell,
            cell_starts)
    return grid, width


def _run_chunks(grid, bucket_cap, points, query, valid_query, r, k):
    (pts_sorted_T, valid_sorted, ids_sorted, order, mins, dims, cell,
     cell_starts) = grid
    q = points if query is None else jnp.asarray(query)
    if valid_query is None:
        valid_query = jnp.ones(q.shape[0], bool)
    r2 = jnp.asarray(r, pts_sorted_T.dtype) ** 2

    pad = (-q.shape[0]) % _QUERY_CHUNK
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, 3), q.dtype)])
        valid_query = jnp.concatenate([valid_query, jnp.zeros(pad, bool)])
    return [
        _grid_query_chunk(
            q[i : i + _QUERY_CHUNK],
            valid_query[i : i + _QUERY_CHUNK],
            pts_sorted_T,
            valid_sorted,
            ids_sorted,
            order,
            mins,
            dims,
            r2,
            k,
            bucket_cap,
            cell,
            cell_starts,
        )
        for i in range(0, q.shape[0], _QUERY_CHUNK)
    ]
