"""Fused neighborhood feature computation.

One pure function replaces the reference's mutation chain
``update_points -> update_neighbors -> update_mean -> update_weights ->
update_cov -> update_eig -> update_normals -> update_incidence_angles``
(reference: src/depth_correction/depth_cloud.py:426-441): a single XLA
graph of gather -> weighted mean/cov -> closed-form 3x3 eigh -> oriented
normals -> incidence angles, with no host round-trips (the reference bounces
to CPU for both the KD-tree and LAPACK eigh).

Neighborhoods are (N, K) int32 index matrices with -1 padding and (N, K)
weights (0 weight on padding), produced once by the neighbor engine and kept
frozen across optimization iterations, exactly like the reference training
loop (train.py:166-226).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..cloud import Cloud
from .covs import weighted_cov, weighted_mean, trace3
from .eigh3 import eigh3

__all__ = [
    "BucketedTranspose",
    "build_bucketed_transpose",
    "build_bucketed_transpose_device",
    "build_transpose_graph",
    "build_transpose_graph_device",
    "gather_neighbors",
    "gather_neighbors_transposed",
    "neighborhood_features",
    "permute_rows",
    "compute_features",
    "vp_dispersion",
    "dir_dispersion",
    "mean_depth",
]


@jax.custom_vjp
def permute_rows(x: jax.Array, perm: jax.Array, inv: jax.Array) -> jax.Array:
    """Row permutation ``x[perm]`` with an exact gather backward.

    ``jnp.take``'s generic VJP is a scatter-add (serialized on TPU); a
    permutation is a bijection, so its transpose is just the gather through
    the inverse permutation. Used to lay the global point table out in
    spatial (Morton) order for gather locality without paying a scatter in
    the backward pass.
    """
    return jnp.take(x, perm, axis=0)


def _permute_rows_fwd(x, perm, inv):
    return jnp.take(x, perm, axis=0), inv


def _permute_rows_bwd(inv, g):
    return jnp.take(g, inv, axis=0), None, None


permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def gather_neighbors(values: jax.Array, neighbors: jax.Array) -> jax.Array:
    """Gather per-point values for each neighbor slot.

    Gathers along the LAST axis of the transposed (D, N) layout: on TPU a
    lane-axis gather vectorizes (measured ~10-30x faster than gathering
    (N, D) rows, which serializes element-by-element).

    :param values: (N, D) or (N,) per-point values.
    :param neighbors: (M, K) int32 indices, -1 = missing (clamped to 0; the
        corresponding weight must be zero).
    :return: (M, K, D) or (M, K).
    """
    idx = jnp.maximum(neighbors, 0)
    if values.ndim == 1:
        return jnp.take(values, idx, axis=0)
    out = jnp.take(values.T, idx, axis=1)  # (D, M, K)
    return jnp.moveaxis(out, 0, -1)


def build_transpose_graph(neighbors, num_points: Optional[int] = None,
                          weights=None):
    """Transpose of a padded neighbor graph, for scatter-free backward.

    For each point j, lists the (query row i, slot k) pairs with
    neighbors[i, k] == j, padded to the max in-degree. XLA lowers the
    backward of a gather as a serialized scatter-add — measured ~10x the
    forward gather on TPU for the training workload — while gathering over
    the precomputed transpose costs in the forward-gather class. Built once
    per frozen neighborhood (host-side numpy).

    :param neighbors: (Mq, K) int, -1 padding; entries index [0, num_points).
    :param num_points: size of the point axis (default: Mq).
    :param weights: optional (Mq, K) weights; returns the transposed weights
        too (w_ij looked up per transpose pair), for analytic backward
        passes that fold the weight in without runtime big-table gathers.
    :return: (t_idx (num_points, Kt), t_slot (num_points, Kt)[, t_w]).
    """
    import numpy as np

    nb = np.asarray(neighbors)
    mq, k = nb.shape
    m = int(num_points) if num_points is not None else mq
    i = np.repeat(np.arange(mq, dtype=np.int64), k)
    kk = np.tile(np.arange(k, dtype=np.int64), mq)
    j = nb.ravel().astype(np.int64)
    keep = j >= 0
    i, kk, j = i[keep], kk[keep], j[keep]
    order = np.argsort(j, kind="stable")
    i, kk, j = i[order], kk[order], j[order]
    counts = np.bincount(j, minlength=m)
    kt = int(counts.max()) if len(j) else 1
    kt = max(-(-kt // 8) * 8, 8)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(len(j)) - starts[j]
    t_idx = np.full((m, kt), -1, np.int64)
    t_slot = np.full((m, kt), -1, np.int64)
    t_idx[j, within] = i
    t_slot[j, within] = kk
    out = (jnp.asarray(t_idx, jnp.int32), jnp.asarray(t_slot, jnp.int32))
    if weights is not None:
        w = np.asarray(weights)
        t_w = np.zeros((m, kt), w.dtype)
        t_w[j, within] = w[i, kk]
        out = out + (jnp.asarray(t_w),)
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BucketedTranspose:
    """Transpose neighbor graph bucketed by in-degree.

    A flat (M, Kt_max) transpose table pads every point to the MAXIMUM
    in-degree; on the training workload that is ~6x more gather indices than
    real (query, point) pairs (mean in-degree ~5 vs Kt 32), and the padded
    gather dominates the whole step. Bucketing rows by in-degree into
    power-of-two widths bounds padding at 2x, so the analytic backward costs
    the same gather class as the forward.

    Fields (all static, built once per frozen neighborhood):
    - ``idx[b]``: (Mb, Ktb) query-row indices, -1 padded.
    - ``w[b]``: (Mb, Ktb) transposed weights (0 on padding).
    - ``inv``: (M,) position of point j in the concatenated bucket rows, or
      Mr (a zero slot) for points never referenced by any query.
    """

    idx: tuple  # tuple of (Mb, Ktb) int32
    w: tuple  # tuple of (Mb, Ktb) float
    inv: jax.Array  # (M,) int32


def build_bucketed_transpose(
    neighbors,
    num_points: Optional[int] = None,
    weights=None,
    min_width: int = 8,
) -> BucketedTranspose:
    """Bucketed transpose of a padded neighbor graph (host-side numpy).

    :param neighbors: (Mq, K) int neighbor matrix, -1 padding; entries index
        the global point axis [0, num_points).
    :param weights: (Mq, K) weights; defaults to (neighbors >= 0).
    :return: :class:`BucketedTranspose`.
    """
    import numpy as np

    nb = np.asarray(neighbors)
    mq, k = nb.shape
    m = int(num_points) if num_points is not None else mq
    i = np.repeat(np.arange(mq, dtype=np.int64), k)
    j = nb.ravel().astype(np.int64)
    if weights is None:
        w_pairs = (j >= 0).astype(np.float32)
    else:
        w_pairs = np.asarray(weights).ravel()
    keep = j >= 0
    i, j, w_pairs = i[keep], j[keep], w_pairs[keep]

    deg = np.bincount(j, minlength=m)
    order = np.argsort(j, kind="stable")
    i, j, w_pairs = i[order], j[order], w_pairs[order]
    starts = np.concatenate([[0], np.cumsum(deg)[:-1]])
    within = np.arange(len(j)) - starts[j]

    # Bucket width per point: smallest ladder width >= deg (the ladder is
    # shared with the device builder via _pair_widths so the two cannot
    # drift — tests/test_transpose_gather.py enforces bitwise parity).
    max_deg = int(deg.max()) if len(j) else 1
    widths = _pair_widths(max(max_deg, 1), min_width)
    widths_arr = np.asarray(widths)
    # width index for each point with deg > 0
    width_of = np.searchsorted(widths_arr, np.maximum(deg, 1))

    idx_parts = []
    w_parts = []
    offset = 0
    pos_in_concat = np.full(m, -1, np.int64)
    for b, ktb in enumerate(widths):
        rows_all = np.flatnonzero((width_of == b) & (deg > 0))
        for rows_b in _bucket_row_parts(rows_all, ktb):
            if len(rows_b) == 0:
                continue
            mb = len(rows_b)
            pos_in_bucket = np.full(m, -1, np.int64)
            pos_in_bucket[rows_b] = np.arange(mb)
            sel = pos_in_bucket[j] >= 0
            t_idx_b = np.full((mb, ktb), -1, np.int32)
            t_w_b = np.zeros((mb, ktb), w_pairs.dtype)
            t_idx_b[pos_in_bucket[j[sel]], within[sel]] = i[sel].astype(np.int32)
            t_w_b[pos_in_bucket[j[sel]], within[sel]] = w_pairs[sel]
            idx_parts.append(jnp.asarray(t_idx_b))
            w_parts.append(jnp.asarray(t_w_b))
            pos_in_concat[rows_b] = offset + np.arange(mb)
            offset += mb

    mr = offset
    inv = np.where(pos_in_concat >= 0, pos_in_concat, mr).astype(np.int32)
    return BucketedTranspose(idx=tuple(idx_parts), w=tuple(w_parts),
                             inv=jnp.asarray(inv))


# ---------------------------------------------------------------------------
# Device-side transpose construction. The host builders above move the whole
# (Mq*K) pair table through numpy several times (argsort + bincount + fancy
# indexing — at production sizes, gigabytes of host RAM and the dominant prep
# phase after on-device establishment). The device path does one argsort +
# gathers on-chip and pulls only the (M,) in-degree vector to host (bucket
# shapes are data-dependent, so sizing stays a host decision).
# ---------------------------------------------------------------------------


def _pair_widths(max_deg: int, min_width: int = 8):
    """The bucket-width ladder shared by host and device builders: steps of
    8 up to 64, then 16 up to 128, then doubling (the 64->128 gap holds most
    points of an uncapped radius graph — mean degree ~123 on the bench
    workload — and a straight doubling there cost 1.6x pair padding)."""
    widths = []
    wd = min_width
    while wd < max_deg:
        widths.append(wd)
        wd = wd + 8 if wd < 64 else (wd + 16 if wd < 128 else wd * 2)
    widths.append(max(wd, min_width))
    return widths


# Buckets larger than this many PADDED pairs are split into same-width parts.
# XLA materializes a big bucket's backward gather in its natural
# (pairs, 9) index-major order with the 9-wide minor dim lane-padded to 128
# (observed on v5e: one 45M-pair bucket became a 23 GB buffer and OOMed the
# chip); parts at the few-M-pair scale fuse like the capped-graph buckets
# that measured at the gather bound. DC_BUCKET_PAIRS_MAX overrides (A/B
# knob: the split trades per-part overhead against materialization risk).
import os as _os

_BUCKET_PAIRS_MAX = int(_os.environ.get("DC_BUCKET_PAIRS_MAX", 2_000_000))


def _bucket_row_parts(rows_b, ktb):
    """Split one bucket's rows into parts of at most _BUCKET_PAIRS_MAX
    padded pairs (shared by the host and device builders so their outputs
    stay identical)."""
    import numpy as np

    max_rows = max(_BUCKET_PAIRS_MAX // int(ktb), 1)
    return [rows_b[i : i + max_rows] for i in range(0, len(rows_b), max_rows)]


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("mq", "k", "num_points"))
def _transpose_pairs_sized(j, weights, mq, k, num_points=None):
    """Transpose pairs sorted by target point, built on device.

    Sorting the Mq*K pair keys once (stable, padding keyed past every real
    point) yields, for each target j, a contiguous run of its referencing
    (query row i, slot k) pairs, in the same order as the host builders'
    stable numpy argsort — downstream tables are bitwise identical.

    :return: (i_s, k_s, w_s, start, deg) — pair query rows / slots /
        weights sorted by target; ``start``/``deg`` give each target's run.
    """
    m = int(num_points) if num_points is not None else mq
    j = jnp.where(j >= 0, j, m)  # padding sorts to the tail
    order = jnp.argsort(j, stable=True).astype(jnp.int32)
    j_s = jnp.take(j, order)
    i_s = (order // k).astype(jnp.int32)
    k_s = (order % k).astype(jnp.int32)
    if weights is None:
        w_s = (j_s < m).astype(jnp.float32)
    else:
        w_s = jnp.take(weights.reshape(-1), order)
    bounds = jnp.searchsorted(
        j_s, jnp.arange(m + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    start = bounds[:-1]
    deg = bounds[1:] - bounds[:-1]
    return i_s, k_s, w_s, start, deg


@jax.jit
def _fill_rows_device(rows_b, start, deg, i_s, w_s, cols):
    """Gather one bucket's (Mb, Ktb) transpose tables from the sorted pairs
    (pure gathers — no scatter, so this lowers on TPU)."""
    s = jnp.take(start, rows_b)
    d = jnp.take(deg, rows_b)
    pos = s[:, None] + cols[None, :]
    valid = cols[None, :] < d[:, None]
    pos = jnp.minimum(pos, i_s.shape[0] - 1)
    t_idx = jnp.where(valid, jnp.take(i_s, pos), -1)
    t_w = jnp.where(valid, jnp.take(w_s, pos), jnp.zeros((), w_s.dtype))
    return t_idx, t_w


@jax.jit
def _fill_slots_device(start, deg, i_s, k_s, cols):
    """Flat (m, Kt) pair-level transpose tables from the sorted pairs."""
    pos = start[:, None] + cols[None, :]
    valid = cols[None, :] < deg[:, None]
    pos = jnp.minimum(pos, i_s.shape[0] - 1)
    t_idx = jnp.where(valid, jnp.take(i_s, pos), -1)
    t_slot = jnp.where(valid, jnp.take(k_s, pos), -1)
    return t_idx, t_slot


def build_bucketed_transpose_device(
    neighbors,
    num_points: Optional[int] = None,
    weights=None,
    min_width: int = 8,
) -> BucketedTranspose:
    """:func:`build_bucketed_transpose` computed on device.

    Identical output (same stable pair order, same bucket ladder); host
    involvement is the (M,) in-degree pull that sizes the buckets. Use when
    ``neighbors`` already lives on an accelerator (post-establishment prep).
    """
    import numpy as np

    mq, k = neighbors.shape
    m = int(num_points) if num_points is not None else mq
    j = jnp.asarray(neighbors).reshape(-1).astype(jnp.int32)
    i_s, _k_s, w_s, start, deg = _transpose_pairs_sized(
        j, weights, mq, k, num_points=m
    )
    deg_np = np.asarray(deg)

    max_deg = int(deg_np.max()) if deg_np.size else 1
    widths = _pair_widths(max(max_deg, 1), min_width)
    width_of = np.searchsorted(np.asarray(widths), np.maximum(deg_np, 1))

    idx_parts = []
    w_parts = []
    offset = 0
    pos_in_concat = np.full(m, -1, np.int64)
    for b, ktb in enumerate(widths):
        rows_all = np.flatnonzero((width_of == b) & (deg_np > 0))
        for rows_b in _bucket_row_parts(rows_all, ktb):
            if len(rows_b) == 0:
                continue
            cols = jnp.arange(ktb, dtype=jnp.int32)
            t_idx_b, t_w_b = _fill_rows_device(
                jnp.asarray(rows_b, jnp.int32), start, deg, i_s, w_s, cols
            )
            idx_parts.append(t_idx_b)
            w_parts.append(t_w_b)
            pos_in_concat[rows_b] = offset + np.arange(len(rows_b))
            offset += len(rows_b)

    inv = np.where(pos_in_concat >= 0, pos_in_concat, offset).astype(np.int32)
    return BucketedTranspose(idx=tuple(idx_parts), w=tuple(w_parts),
                             inv=jnp.asarray(inv))


def build_transpose_graph_device(neighbors, num_points: Optional[int] = None,
                                 weights=None):
    """:func:`build_transpose_graph` computed on device (one argsort +
    gathers; the only host transfer is the scalar max in-degree that sizes
    the static Kt)."""
    mq, k = neighbors.shape
    m = int(num_points) if num_points is not None else mq
    j = jnp.asarray(neighbors).reshape(-1).astype(jnp.int32)
    i_s, k_s, w_s, start, deg = _transpose_pairs_sized(
        j, weights, mq, k, num_points=m
    )
    kt = max(int(deg.max()), 1)
    kt = max(-(-kt // 8) * 8, 8)
    cols = jnp.arange(kt, dtype=jnp.int32)
    t_idx, t_slot = _fill_slots_device(start, deg, i_s, k_s, cols)
    if weights is not None:
        _, t_w = _fill_rows_device(
            jnp.arange(m, dtype=jnp.int32), start, deg, i_s, w_s, cols
        )
        return t_idx, t_slot, t_w
    return t_idx, t_slot


@jax.custom_vjp
def gather_neighbors_transposed(values, neighbors, t_idx, t_slot):
    """Neighbor gather with a scatter-free backward.

    Forward is the lane-axis gather of :func:`gather_neighbors`; the VJP for
    ``values`` gathers the cotangent through the transpose graph instead of
    scatter-adding: grad_values[j] = sum over (i, k) in transpose[j] of
    g[i, k]. Both directions are lane-axis gathers — XLA's native scatter-add
    backward measured ~7x the forward gather on TPU.
    """
    return gather_neighbors(values, neighbors)


def _gather_t_fwd(values, neighbors, t_idx, t_slot):
    return gather_neighbors(values, neighbors), (neighbors, t_idx, t_slot)


def _gather_t_bwd(res, g):
    neighbors, t_idx, t_slot = res
    k = neighbors.shape[1]
    # The forward supports (N,) values (cotangent (M, K)); normalize to a
    # trailing D=1 axis so one path serves both.
    squeeze = g.ndim == 2
    if squeeze:
        g = g[..., None]
    # Zero cotangents on padding slots (their forward read was a clamped
    # dummy; weights already zero them downstream, but be exact here).
    g = jnp.where((neighbors >= 0)[..., None], g, 0.0)
    # (M, K, D) -> (D, M*K); backward gather also rides the lane axis.
    flat = jnp.moveaxis(g, -1, 0).reshape(g.shape[-1], -1)
    lin = jnp.maximum(t_idx, 0) * k + jnp.maximum(t_slot, 0)
    contrib = jnp.take(flat, lin, axis=1)  # (D, M, Kt)
    contrib = jnp.where((t_idx >= 0)[None], contrib, 0.0)
    out = contrib.sum(axis=-1).T
    return (out[:, 0] if squeeze else out), None, None, None


gather_neighbors_transposed.defvjp(_gather_t_fwd, _gather_t_bwd)


@jax.custom_vjp
def _gather_T(values, neighbors, t_idx, t_slot):
    """Lane-axis gather in component layout: (M, D) -> (D, M, K).

    Stays in (D, M, K) so neither direction pays a 150 MB relayout; the
    backward gathers the cotangent through the transpose graph (scatter-free).
    """
    return jnp.take(values.T, jnp.maximum(neighbors, 0), axis=1)


def _gather_T_fwd(values, neighbors, t_idx, t_slot):
    return _gather_T(values, neighbors, t_idx, t_slot), (neighbors, t_idx, t_slot)


def _gather_T_bwd(res, g):
    neighbors, t_idx, t_slot = res
    k = neighbors.shape[1]
    g = jnp.where((neighbors >= 0)[None], g, 0.0)  # (D, M, K)
    flat = g.reshape(g.shape[0], -1)  # (D, M*K)
    lin = jnp.maximum(t_idx, 0) * k + jnp.maximum(t_slot, 0)
    contrib = jnp.take(flat, lin, axis=1)  # (D, M, Kt)
    contrib = jnp.where((t_idx >= 0)[None], contrib, 0.0)
    return contrib.sum(axis=-1).T, None, None, None


_gather_T.defvjp(_gather_T_fwd, _gather_T_bwd)


# Row-chunk the forward moments past this many (Mq * K) pairs: XLA fuses
# the capped bench graph (7.2M pairs) at the gather bound, but on much
# larger graphs it can materialize the gather in natural index-major order
# — (pairs, 3) with the 3-wide minor dim lane-padded to 128 (the same v5e
# failure mode as the bucketed backward, see _BUCKET_PAIRS_MAX).
_FWD_PAIRS_MAX = 16_000_000


def _moments_impl(points, neighbors, weights):
    """Weighted neighborhood moments (row-chunked when very large).

    :return: (mean (3, Mq), comps 6-tuple of (Mq,), w_sum (Mq,)).
    """
    mq, k = neighbors.shape
    if mq * k <= _FWD_PAIRS_MAX:
        return _moments_impl_block(points, neighbors, weights)
    chunk = max(((_FWD_PAIRS_MAX // k) // 512) * 512, 512)
    pad = (-mq) % chunk
    nb = jnp.pad(neighbors, ((0, pad), (0, 0)), constant_values=-1)
    w = jnp.pad(weights, ((0, pad), (0, 0)))
    n = nb.shape[0] // chunk

    def body(args):
        nb_c, w_c = args
        return _moments_impl_block(points, nb_c, w_c)

    mean, comps, w_sum = jax.lax.map(
        body, (nb.reshape(n, chunk, k), w.reshape(n, chunk, k))
    )
    mean = jnp.moveaxis(mean, 1, 0).reshape(3, -1)[:, :mq]
    comps = tuple(c.reshape(-1)[:mq] for c in comps)
    return mean, comps, w_sum.reshape(-1)[:mq]


def _moments_impl_block(points, neighbors, weights):
    """One row block of weighted neighborhood moments in (C, K, M) layout.

    The neighbor axis K sits second-to-last and the batch M last, so none of
    the big intermediates carries a narrow trailing dim (TPU pads the minor
    dim to 128 lanes — a trailing K=32 costs 4x, a trailing 3x3 costs 42x).
    """
    idxT = jnp.maximum(neighbors, 0).T  # (K, Mq)
    # Plain f32 take with the (K, Mq) index layout. A u16-packed gather
    # (_take16-style bitcast) runs 2.3x faster ISOLATED (46.2 -> 20.3 ms,
    # 7.1M indices) but 1.6x SLOWER in the real step (fwd 47 -> 74 ms):
    # the 16->32-bit recombination cannot fuse into the moments math and
    # pays ~85 MB of relayout vector work (measured, scripts/exp_step_ab).
    nbr = jnp.take(points.T, idxT, axis=1)  # (3, K, Mq)
    wT = weights.T  # (K, Mq)
    w = wT[None]
    w_sum = jnp.maximum(jnp.sum(wT, axis=0), 1e-12)  # (Mq,)
    mean = jnp.sum(nbr * w, axis=1) / w_sum  # (3, Mq)
    c = nbr - mean[:, None, :]
    cw = c * w
    denom = jnp.maximum(jnp.sum(wT, axis=0) - 1.0, 1e-6)

    def cc(a, b):
        return jnp.sum(cw[a] * c[b], axis=0) / denom

    comps = (cc(0, 0), cc(1, 1), cc(2, 2), cc(0, 1), cc(0, 2), cc(1, 2))
    return mean, comps, w_sum


@jax.custom_vjp
def neighborhood_moments(points, neighbors, weights, t_idx, t_w):
    """Weighted mean + covariance components with an ANALYTIC backward.

    Autodiff through gather->cov spends ~90% of the step in a serialized
    scatter-add (or a large transpose gather of per-pair cotangents). The
    analytic gradient needs only 9 per-NEIGHBORHOOD values: with cotangents
    g_pq for the six covariance components and Gm for the mean,

        d a_pq / d x_m,r = (w_m/d)(delta_rp c_q + delta_rq c_p)
        =>  grad_j = (sum_{i in T(j)} w_ij S_i) x_j + sum_{i in T(j)} w_ij u_i

    with S_i the symmetric matrix of g components / d_i and
    u_i = Gm_i / W_i - S_i mu_i (the mu-term inside cov cancels exactly
    because sum w (x - mu) = 0). The backward is nine gathers from
    (Mq,)-sized tables — the same cost class as the forward gather. Weights
    must be frozen (they are: neighborhoods are established once, reference
    train.py:166-226) because w_ij rides the precomputed transpose (t_w).

    :param points: (M, 3) global positions (differentiable).
    :param neighbors: (Mq, K) query rows, indices into points, -1 padded.
    :param weights: (Mq, K) frozen weights.
    :param t_idx: (M, Kt) transpose rows (into Mq), -1 padded.
    :param t_w: (M, Kt) transposed weights (0 on padding).
    :return: (mean (3, Mq), comps (a00, a11, a22, a01, a02, a12) of (Mq,)).
    """
    mean, comps, _ = _moments_impl(points, neighbors, weights)
    return mean, comps


def _moments_fwd(points, neighbors, weights, t_idx, t_w):
    mean, comps, w_sum = _moments_impl(points, neighbors, weights)
    return (mean, comps), (points, mean, w_sum, t_idx, t_w)


def _cotangent_table(mean, w_sum, cotangents):
    """(9, Mq) per-query backward table: S (symmetric, /denom) and u rows.

    S_rq assembles grad_r = sum_{p<=q} g_pq (delta_rp c_q + delta_rq c_p):
    diagonal components pick up both delta terms (factor 2).
    """
    g_mean, g_comps = cotangents
    g00, g11, g22, g01, g02, g12 = g_comps
    denom = jnp.maximum(w_sum - 1.0, 1e-6)
    s00, s11, s22 = 2.0 * g00 / denom, 2.0 * g11 / denom, 2.0 * g22 / denom
    s01, s02, s12 = g01 / denom, g02 / denom, g12 / denom
    mux, muy, muz = mean[0], mean[1], mean[2]
    u0 = g_mean[0] / w_sum - (s00 * mux + s01 * muy + s02 * muz)
    u1 = g_mean[1] / w_sum - (s01 * mux + s11 * muy + s12 * muz)
    u2 = g_mean[2] / w_sum - (s02 * mux + s12 * muy + s22 * muz)
    return jnp.stack([s00, s11, s22, s01, s02, s12, u0, u1, u2], axis=0)


def _grad_from_sums(points, sums):
    """grad_j = S_j x_j + u_j from the (9, M) per-point accumulated sums."""
    S00, S11, S22, S01, S02, S12, U0, U1, U2 = sums
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    return jnp.stack(
        [
            S00 * x + S01 * y + S02 * z + U0,
            S01 * x + S11 * y + S12 * z + U1,
            S02 * x + S12 * y + S22 * z + U2,
        ],
        axis=-1,
    )


def _moments_bwd(res, cotangents):
    points, mean, w_sum, t_idx, t_w = res
    table = _cotangent_table(mean, w_sum, cotangents)

    # Chunk along M only when the monolithic (9, Kt, M) gather output would
    # pressure HBM (large in-degree padding Kt on dense scenes); the scan
    # costs ~1.5x in launch overhead when memory is not a concern.
    m = t_idx.shape[0]
    kt_dim = t_idx.shape[1]
    if 9 * kt_dim * m * 4 < 1_500_000_000:
        g = jnp.take(table, jnp.maximum(t_idx, 0).T, axis=1)  # (9, Kt, M)
        sums = jnp.sum(g * t_w.T[None], axis=1)  # (9, M)
        return _grad_from_sums(points, sums), None, None, None, None

    chunk = 65536
    pad = (-m) % chunk
    tiT = jnp.pad(t_idx, ((0, pad), (0, 0)), constant_values=-1).T  # (Kt, Mp)
    twT = jnp.pad(t_w, ((0, pad), (0, 0))).T
    n_chunks = tiT.shape[1] // chunk
    kt = tiT.shape[0]

    def one_chunk(args):
        ti_c, tw_c = args  # (Kt, chunk)
        g = jnp.take(table, jnp.maximum(ti_c, 0), axis=1)  # (9, Kt, chunk)
        return jnp.sum(g * tw_c[None], axis=1)  # (9, chunk)

    sums = jax.lax.map(
        one_chunk,
        (
            tiT.reshape(kt, n_chunks, chunk).swapaxes(0, 1),
            twT.reshape(kt, n_chunks, chunk).swapaxes(0, 1),
        ),
    )  # (n_chunks, 9, chunk)
    sums = jnp.moveaxis(sums, 1, 0).reshape(9, -1)[:, :m]
    return _grad_from_sums(points, sums), None, None, None, None


neighborhood_moments.defvjp(_moments_fwd, _moments_bwd)


@jax.custom_vjp
def neighborhood_moments_bucketed(points, neighbors, weights, tg: BucketedTranspose):
    """Weighted mean + covariance components with the analytic backward over
    a :class:`BucketedTranspose` graph.

    Identical math to :func:`neighborhood_moments`; the backward gathers the
    (9, Mq) cotangent table through per-in-degree buckets (<=2x padding
    instead of max-in-degree padding) and assembles the per-point sums with
    one (M,)-index gather through ``tg.inv`` — scatter-free, and ~the
    forward's gather volume (measured ~6x fewer backward indices on the
    training workload).
    """
    mean, comps, _ = _moments_impl(points, neighbors, weights)
    return mean, comps


def _moments_bucketed_fwd(points, neighbors, weights, tg):
    mean, comps, w_sum = _moments_impl(points, neighbors, weights)
    return (mean, comps), (points, mean, w_sum, tg)


def _moments_bucketed_bwd(res, cotangents):
    points, mean, w_sum, tg = res
    table = _cotangent_table(mean, w_sum, cotangents)
    parts = []
    for idx_b, w_b in zip(tg.idx, tg.w):
        g = jnp.take(table, jnp.maximum(idx_b, 0).T, axis=1)  # (9, Ktb, Mb)
        parts.append(jnp.sum(g * w_b.T[None].astype(table.dtype), axis=1))
    zero_slot = jnp.zeros((9, 1), table.dtype)
    sums_all = jnp.concatenate(parts + [zero_slot], axis=1)  # (9, Mr + 1)
    sums = jnp.take(sums_all, tg.inv, axis=1)  # (9, M)
    return _grad_from_sums(points, sums), None, None, None


neighborhood_moments_bucketed.defvjp(_moments_bucketed_fwd, _moments_bucketed_bwd)


def neighborhood_features(
    points: jax.Array,
    neighbors: jax.Array,
    weights: jax.Array,
    dirs: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    compute_normals: bool = True,
    t_idx: Optional[jax.Array] = None,
    t_slot: Optional[jax.Array] = None,
    t_w: Optional[jax.Array] = None,
    query_rows: Optional[jax.Array] = None,
):
    """Weighted neighborhood statistics for each query point.

    :param points: (N, 3) global cloud positions.
    :param neighbors: (N, K) neighbor indices with -1 padding.
    :param weights: (N, K) neighbor weights (0 on padding slots).
    :param dirs: (N, 3) view directions for normal orientation / incidence
        angles; None skips those outputs.
    :param scale: optional Gaussian re-weighting by distance from the mean
        (reference: depth_cloud.py:356-364).
    :param compute_normals: skip the eigenvector path when False (the
        min-eigval / trace losses only need eigenvalues).
    :param t_idx, t_slot: optional transpose graph
        (:func:`build_transpose_graph`) enabling the scatter-free backward.
    :param query_rows: (Mq,) indices of each query row's own position in
        ``points`` (-1 on padding rows), required by ``scale`` when the
        query rows are compacted/sharded (Mq != N); ignored otherwise.
    :return: dict with mean, cov, eigvals, trace and optionally eigvecs,
        normals, inc_angles.
    """
    if weights.ndim == 3:
        weights = weights[..., 0]

    # Fast path: analytic-backward fused moments (frozen weights, no
    # Gaussian re-weighting) — lane-axis gathers each way, everything in
    # component form (no padded 3x3 / trailing-K tiles).
    if (
        scale is None
        and (isinstance(t_idx, BucketedTranspose) or (t_idx is not None and t_w is not None))
    ):
        from .eigh3 import eigvals3_c

        if isinstance(t_idx, BucketedTranspose):
            mean, comps = neighborhood_moments_bucketed(
                points, neighbors, weights, t_idx
            )
        else:
            mean, comps = neighborhood_moments(points, neighbors, weights, t_idx, t_w)
        a00, a11, a22, a01, a02, a12 = comps
        l1, l2, l3 = eigvals3_c(*comps)
        out = {
            "mean": mean.T,
            "weights": weights,
            "trace": a00 + a11 + a22,
            "eigvals": jnp.stack([l1, l2, l3], axis=-1),
        }
        if compute_normals and dirs is not None:
            from .eigh3 import _eigvec_c

            vx, vy, vz = _eigvec_c(*comps, jax.lax.stop_gradient(l1))
            cos = dirs[..., 0] * vx + dirs[..., 1] * vy + dirs[..., 2] * vz
            sign = -jnp.sign(cos)
            out["normals"] = jnp.stack([vx * sign, vy * sign, vz * sign], -1)
            out["inc_angles"] = jnp.arccos(jnp.clip(jnp.abs(cos), 0.0, 1.0))
        return out

    # Component layout (D, M, K) end to end: lane-axis gathers keep the
    # component axis free and the covariance reduces over the trailing K
    # lanes without ever materializing an (M, K, 3) relayout.
    if (
        t_idx is not None
        and t_slot is not None
        and not isinstance(t_idx, BucketedTranspose)
    ):
        nbr = _gather_T(points, neighbors, t_idx, t_slot)  # (3, M, K)
    else:
        nbr = jnp.take(points.T, jnp.maximum(neighbors, 0), axis=1)
    w = weights[None]  # (1, M, K)

    w_sum = jnp.maximum(jnp.sum(weights, axis=-1), 1e-12)  # (M,)
    mean_T = jnp.sum(nbr * w, axis=-1) / w_sum  # (3, M)

    if scale is not None:
        # Reference update_weights(scale): w *= exp(-(|x - mean| / scale)^2)
        # with x the *query* point (depth_cloud.py:362-363). Compacted or
        # sharded query rows carry their own position via ``query_rows``
        # (a (Mq,) gather into the point table); the full-table layout
        # (Mq == N) reads positions directly.
        if query_rows is not None:
            qpts = jnp.take(points, jnp.maximum(query_rows, 0), axis=0)
        elif neighbors.shape[0] == points.shape[0]:
            qpts = points
        else:
            raise ValueError(
                "nn_scale needs query positions: got %d query rows over a "
                "%d-point table; pass query_rows"
                % (neighbors.shape[0], points.shape[0])
            )
        dist2 = jnp.sum((qpts - mean_T.T) ** 2, axis=-1)  # (Mq,)
        weights = weights * jnp.exp(-(dist2 / scale**2))[:, None]
        w = weights[None]
        w_sum = jnp.maximum(jnp.sum(weights, axis=-1), 1e-12)
        mean_T = jnp.sum(nbr * w, axis=-1) / w_sum

    c = nbr - mean_T[..., None]  # (3, M, K) centered
    cw = c * w
    denom = jnp.maximum(jnp.sum(weights, axis=-1) - 1.0, 1e-6)  # Bessel

    def cc(a, b):
        return jnp.sum(cw[a] * c[b], axis=-1) / denom

    a00, a11, a22 = cc(0, 0), cc(1, 1), cc(2, 2)
    a01, a02, a12 = cc(0, 1), cc(0, 2), cc(1, 2)
    cov = jnp.stack(
        [
            jnp.stack([a00, a01, a02], axis=-1),
            jnp.stack([a01, a11, a12], axis=-1),
            jnp.stack([a02, a12, a22], axis=-1),
        ],
        axis=-2,
    )
    mean = mean_T.T
    out = {"mean": mean, "cov": cov, "weights": weights,
           "trace": a00 + a11 + a22}
    return _finish_features(out, cov, dirs, compute_normals)


def _finish_features(out, cov, dirs, compute_normals):
    """Shared feature tail: eigendecomposition, normals, incidence angles."""
    if compute_normals and dirs is not None:
        eigvals, eigvecs = eigh3(cov)
        out["eigvals"] = eigvals
        out["eigvecs"] = eigvecs
        # Normal = eigenvector of the smallest eigenvalue, oriented against
        # the view direction (reference: depth_cloud.py:401-415).
        normals = eigvecs[..., :, 0]
        cos = jnp.sum(dirs * normals, axis=-1)
        normals = -jnp.sign(cos)[..., None] * normals
        out["normals"] = normals
        # Incidence angle = arccos |dirs . n| (depth_cloud.py:417-424).
        inc = jnp.arccos(jnp.clip(jnp.abs(cos), 0.0, 1.0))
        out["inc_angles"] = inc
    else:
        from .eigh3 import eigvals3

        out["eigvals"] = eigvals3(cov)

    return out


def compute_features(
    cloud: Cloud,
    neighbors: jax.Array,
    weights: jax.Array,
    scale: Optional[float] = None,
    compute_normals: bool = True,
    t_idx: Optional[jax.Array] = None,
    t_slot: Optional[jax.Array] = None,
    t_w: Optional[jax.Array] = None,
) -> Cloud:
    """Cloud-level wrapper: returns a new Cloud with derived fields set
    (the pure equivalent of ``update_all(keep_neighbors=True)``,
    reference: depth_cloud.py:435-441 / preproc.py:216).
    """
    points = cloud.get_points()
    feats = neighborhood_features(
        points,
        neighbors,
        weights,
        dirs=cloud.dirs,
        scale=scale,
        compute_normals=compute_normals,
        t_idx=t_idx,
        t_slot=t_slot,
        t_w=t_w,
    )
    return cloud.replace(
        points=points,
        mean=feats["mean"],
        cov=feats.get("cov"),
        eigvals=feats["eigvals"],
        eigvecs=feats.get("eigvecs"),
        normals=feats.get("normals", cloud.normals),
        inc_angles=feats.get("inc_angles", cloud.inc_angles),
        trace=feats["trace"],
    )


def vp_dispersion(cloud: Cloud, neighbors: jax.Array, weights: jax.Array) -> jax.Array:
    """Total variation of neighbor viewpoints — trainability filter
    (reference: depth_cloud.py:314-319).
    """
    vps = gather_neighbors(cloud.vps, neighbors)
    return trace3(weighted_cov(vps, weights))


def dir_dispersion(cloud: Cloud, neighbors: jax.Array, weights: jax.Array) -> jax.Array:
    """Total variation of neighbor view directions (depth_cloud.py:321-326)."""
    dirs = gather_neighbors(cloud.dirs, neighbors)
    return trace3(weighted_cov(dirs, weights))


def mean_depth(cloud: Cloud, neighbors: jax.Array, weights: jax.Array) -> jax.Array:
    """Weighted mean neighbor depth (reference: depth_cloud.py:328-334)."""
    d = gather_neighbors(cloud.depth, neighbors)
    w_sum = jnp.maximum(jnp.sum(weights, axis=-1), 1e-12)
    return jnp.sum(weights * d, axis=-1) / w_sum


def mean_vp_dist(cloud: Cloud, neighbors: jax.Array, weights: jax.Array) -> jax.Array:
    """Weighted mean distance of neighbor viewpoints from their mean —
    trainability statistic (reference: depth_cloud.py:336-346)."""
    vps = gather_neighbors(cloud.vps, neighbors)  # (N, K, 3)
    w_sum = jnp.maximum(jnp.sum(weights, axis=-1), 1e-12)
    mean_vp = jnp.sum(weights[..., None] * vps, axis=-2) / w_sum[..., None]
    vp_dists = jnp.linalg.norm(vps - mean_vp[..., None, :], axis=-1)
    return jnp.sum(weights * vp_dists, axis=-1) / w_sum
