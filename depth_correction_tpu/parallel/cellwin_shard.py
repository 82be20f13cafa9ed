"""Sharded cell-window moments: the Pallas span-DMA engine under shard_map.

The single-device engine (ops/cellwin.py) computes the uncapped within-r
moments as span DMAs + dense masked MXU matmuls over a cell-sorted point
table. Row tiles are mutually independent in the forward pass and point
tiles are mutually independent in the backward pass, so the engine shards
cleanly over a 1-D data mesh (reference scaling axis: SURVEY §5 point
scaling; the torch reference has no intra-step parallelism at all —
src/depth_correction/train.py:90-216 is a single-process hot loop):

- the FORWARD shards by ROW TILE: each device runs the forward kernel on
  its t1/D row tiles against the full (replicated in-body) cell-sorted
  point table — the same (M, 3) xyz table the sharded gather path already
  all_gathers transiently (parallel/sharding.py), so sharding the engine
  adds no new point-table traffic;
- the BACKWARD shards by POINT TILE: the per-row analytic cotangent table
  (16, mq_pad; ~64 B/row) is all_gather-ed inside the custom VJP, then
  each device's backward kernel produces COMPLETE gradients for its own
  t2/D point tiles (a point's referencing rows are all present in the
  gathered table). Each device embeds its slice into a zeros-elsewhere
  full gradient; the downstream all_gather/replicated-input transpose
  rules psum those partials into the exact global gradient — the same
  mechanism the sharded gather path relies on;
- EXCEPTION rows (boundary-ambiguous membership, routed through the
  gather path on a single device) split by row shard and ride per-shard
  stacked transpose tables (ops/features.neighborhood_moments), because
  the ragged BucketedTranspose cannot be a uniform SPMD operand.

Per-device compute is exactly 1/D of the single-device kernels (no
duplicated tiles); the added communication per step is one (16, mq_pad)
all_gather in the backward. Tile counts pad to device multiples with
empty tiles (zero spans, sentinel rows) whose outputs are masked.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "CellWinShards", "shard_cellwin_device", "cellwin_shard_specs",
    "cellwin_moments_sharded", "cellwin_features_sharded",
]


@dataclasses.dataclass(frozen=True)
class CellWinShards:
    """Mesh-resident cell-window graph (pytree; born sharded).

    Sharding layout (1-D data mesh, D devices):

    - row-tile axis (forward): ``f_start/f_lead/f_len`` (t1p, ns_f),
      ``f_ctr`` (t1p, 3) split along the tile axis; ``q_est``
      (8, mq_pad_p) and ``row_map`` (mq_pad_p,) split along the padded
      row axis.
    - point-tile axis (backward): ``b_start/b_lead/b_len`` (t2p, ns_b),
      ``b_ctr`` (t2p, 3) split along the tile axis.
    - replicated: ``est_sorted`` (8, m_pad_p) (forward DMA source — spans
      reach anywhere), ``perm``/``inv`` (padded-layout permutation).
    - exceptions (row-sharded): ``exc_slots`` (D*E, ) LOCAL padded-row
      slots (== mq_local on padding, dropped by mode='drop'), ``exc_nn`` /
      ``exc_w`` (D*E, K) neighbor rows in PADDED point indices, and the
      per-shard stacked transpose ``exc_t_idx``/``exc_t_w``
      (D*m_pad_p, Kt) for the analytic moments VJP.

    ``dims`` = (t1_local, r_cap, s_cap, ns_f, t2_local, p_cap, sr_cap,
    ns_b, r2) — the PER-DEVICE kernel dims; ``axis`` is the mesh axis
    name; ``n_exc`` the global exception count (0 = no exception path).
    """

    q_est: object
    est_sorted: object
    f_start: object
    f_lead: object
    f_len: object
    f_ctr: object
    b_start: object
    b_lead: object
    b_len: object
    b_ctr: object
    perm: object
    inv: object
    row_map: object
    exc_slots: object
    exc_nn: object
    exc_w: object
    exc_t_idx: object
    exc_t_w: object
    dims: tuple = dataclasses.field(metadata=dict(static=True), default=())
    axis: str = dataclasses.field(metadata=dict(static=True), default="data")
    n_exc: int = dataclasses.field(metadata=dict(static=True), default=0)


jax.tree_util.register_dataclass(
    CellWinShards,
    data_fields=[
        "q_est", "est_sorted", "f_start", "f_lead", "f_len", "f_ctr",
        "b_start", "b_lead", "b_len", "b_ctr", "perm", "inv", "row_map",
        "exc_slots", "exc_nn", "exc_w", "exc_t_idx", "exc_t_w",
    ],
    meta_fields=["dims", "axis", "n_exc"],
)


def _born_sharded(parts, mesh, spec):
    """Stack per-device numpy blocks into one global array, each block
    placed directly on its device (no device ever holds the full array)."""
    from jax.sharding import NamedSharding

    devices = list(mesh.devices.reshape(-1))
    sharding = NamedSharding(mesh, spec)
    shape = (len(parts) * parts[0].shape[0],) + parts[0].shape[1:]
    shards = [
        jax.device_put(jnp.asarray(p), d) for p, d in zip(parts, devices)
    ]
    return jax.make_array_from_single_device_arrays(shape, sharding, shards)


def shard_cellwin_device(dev, mesh, axis: str = "data") -> CellWinShards:
    """Split a single-device :class:`ops.cellwin.CellWinDevice` over a
    1-D mesh (see the class docstring for the layout).

    Tile counts pad to device multiples with EMPTY tiles: zero spans (the
    kernels' mask-selects turn them into exact zero contributions),
    sentinel est/query positions, row_map = -1. The padded point slots
    extend ``perm`` with index 0 (gradients there are dropped by the
    inverse permutation) and ``est_sorted`` with the far sentinel.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.features import build_transpose_graph_device

    d_count = int(np.prod(mesh.devices.shape))
    t1, r_cap, s_cap, ns_f, t2, p_cap, sr_cap, ns_b, r2 = dev.dims
    t1p = -(-t1 // d_count) * d_count
    t2p = -(-t2 // d_count) * d_count
    mq_pad, mq_pad_p = t1 * r_cap, t1p * r_cap
    m_pad, m_pad_p = t2 * p_cap, t2p * p_cap

    def pad_rows(x, rows, fill=0):
        x = np.asarray(x)
        if rows == x.shape[0]:
            return x
        return np.pad(x, ((0, rows - x.shape[0]),) + ((0, 0),) * (x.ndim - 1),
                      constant_values=fill)

    f_start = pad_rows(dev.f_start, t1p)
    f_lead = pad_rows(dev.f_lead, t1p)
    f_len = pad_rows(dev.f_len, t1p)
    f_ctr = pad_rows(dev.f_ctr, t1p)
    b_start = pad_rows(dev.b_start, t2p)
    b_lead = pad_rows(dev.b_lead, t2p)
    b_len = pad_rows(dev.b_len, t2p)
    b_ctr = pad_rows(dev.b_ctr, t2p)

    q_est = np.asarray(dev.q_est)
    if mq_pad_p != mq_pad:
        pad = np.zeros((8, mq_pad_p - mq_pad), q_est.dtype)
        pad[:3] = -1e15  # matches the builder's invalid-row sentinel
        q_est = np.concatenate([q_est, pad], axis=1)
    row_map = pad_rows(np.asarray(dev.row_map), mq_pad_p, fill=-1)

    est_sorted = np.asarray(dev.est_sorted)
    if m_pad_p != m_pad:
        pad = np.zeros((8, m_pad_p - m_pad), est_sorted.dtype)
        pad[:3] = 1e15  # far sentinel: membership never selects pads
        est_sorted = np.concatenate([est_sorted, pad], axis=1)
    perm = pad_rows(np.asarray(dev.perm), m_pad_p, fill=0)

    # ---- exceptions: split by owning row shard, uniform widths ----
    mq_local = mq_pad_p // d_count
    n_exc = int(dev.n_exc)
    exc_parts = []
    if n_exc:
        slots = np.asarray(dev.exc_slots)
        nn = np.asarray(dev.exc_nn)
        k = nn.shape[1]
        by_shard = [
            np.flatnonzero((slots >= s * mq_local) & (slots < (s + 1) * mq_local))
            for s in range(d_count)
        ]
        e_max = max(max(len(ix) for ix in by_shard), 1)
        for s, ix in enumerate(by_shard):
            sl = np.full(e_max, mq_local, np.int32)  # OOB => mode='drop'
            sn = np.full((e_max, k), -1, np.int32)
            sl[: len(ix)] = slots[ix] - s * mq_local
            sn[: len(ix)] = nn[ix]
            sw = (sn >= 0).astype(np.float32)
            # Per-shard stacked transpose over the PADDED point table for
            # the analytic moments VJP (ragged BucketedTranspose cannot be
            # a uniform SPMD operand).
            t_idx, _slot, t_w = build_transpose_graph_device(
                jnp.asarray(sn), num_points=m_pad_p, weights=jnp.asarray(sw)
            )
            exc_parts.append((sl, sn, sw, np.asarray(t_idx), np.asarray(t_w)))
        kt = max(p[3].shape[1] for p in exc_parts)
        exc_parts = [
            (
                sl,
                sn,
                sw,
                np.pad(ti, ((0, 0), (0, kt - ti.shape[1])), constant_values=-1),
                np.pad(tw, ((0, 0), (0, kt - tw.shape[1]))),
            )
            for (sl, sn, sw, ti, tw) in exc_parts
        ]

    def split(x, n_rows):
        x = np.asarray(x)
        per = n_rows // d_count
        return [x[s * per:(s + 1) * per] for s in range(d_count)]

    def split_cols(x):
        per = x.shape[1] // d_count
        return [x[:, s * per:(s + 1) * per] for s in range(d_count)]

    row2 = P(axis, None)
    row1 = P(axis)
    replicated = NamedSharding(mesh, P())

    out = CellWinShards(
        q_est=_born_cols(split_cols(q_est), mesh, axis),
        est_sorted=jax.device_put(jnp.asarray(est_sorted), replicated),
        f_start=_born_sharded(split(f_start, t1p), mesh, row2),
        f_lead=_born_sharded(split(f_lead, t1p), mesh, row2),
        f_len=_born_sharded(split(f_len, t1p), mesh, row2),
        f_ctr=_born_sharded(split(f_ctr, t1p), mesh, row2),
        b_start=_born_sharded(split(b_start, t2p), mesh, row2),
        b_lead=_born_sharded(split(b_lead, t2p), mesh, row2),
        b_len=_born_sharded(split(b_len, t2p), mesh, row2),
        b_ctr=_born_sharded(split(b_ctr, t2p), mesh, row2),
        perm=jax.device_put(jnp.asarray(perm), replicated),
        inv=jax.device_put(jnp.asarray(dev.inv), replicated),
        row_map=_born_sharded(split(row_map, mq_pad_p), mesh, row1),
        exc_slots=_born_sharded([p[0] for p in exc_parts], mesh, row1)
        if n_exc else None,
        exc_nn=_born_sharded([p[1] for p in exc_parts], mesh, row2)
        if n_exc else None,
        exc_w=_born_sharded([p[2] for p in exc_parts], mesh, row2)
        if n_exc else None,
        exc_t_idx=_born_sharded([p[3] for p in exc_parts], mesh, row2)
        if n_exc else None,
        exc_t_w=_born_sharded([p[4] for p in exc_parts], mesh, row2)
        if n_exc else None,
        dims=(t1p // d_count, r_cap, s_cap, ns_f, t2p // d_count, p_cap,
              sr_cap, ns_b, r2),
        axis=axis,
        n_exc=n_exc,
    )
    return out


def _born_cols(parts, mesh, axis):
    """Column-split variant of :func:`_born_sharded` ((R, C/D) blocks)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    devices = list(mesh.devices.reshape(-1))
    sharding = NamedSharding(mesh, P(None, axis))
    shape = parts[0].shape[:1] + (len(parts) * parts[0].shape[1],)
    shards = [
        jax.device_put(jnp.asarray(np.ascontiguousarray(p)), d)
        for p, d in zip(parts, devices)
    ]
    return jax.make_array_from_single_device_arrays(shape, sharding, shards)


# ---------------------------------------------------------------------------
# In-body (shard_map) op
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(11,))
def _core_sharded(pts_full, q_local, est_full, f_start, f_lead, f_len,
                  f_ctr, b_start, b_lead, b_len, b_ctr, dims_ax):
    """Per-device moments over the LOCAL row tiles (runs inside shard_map).

    ``pts_full``/``est_full`` are the full padded-sorted tables
    (replicated in-body); ``q_local`` and the f/b tables are this device's
    shards. Returns (mean (3, mq_local), comps 6x(mq_local,), w_sum).
    """
    from ..ops.cellwin import _fwd_call

    (t1_l, r_cap, s_cap, ns_f, _t2_l, _p_cap, _sr_cap, _ns_b, r2,
     _axis) = dims_ax
    raw = _fwd_call(pts_full, q_local, est_full, f_start, f_lead, f_len,
                    f_ctr, t1=t1_l, r_cap=r_cap, s_cap=s_cap, ns_f=ns_f,
                    r2=r2)
    mean = raw[0:3]
    comps = (raw[3], raw[4], raw[5], raw[6], raw[7], raw[8])
    return mean, comps, raw[9]


def _core_sharded_fwd(pts_full, q_local, est_full, f_start, f_lead, f_len,
                      f_ctr, b_start, b_lead, b_len, b_ctr, dims_ax):
    out = _core_sharded(pts_full, q_local, est_full, f_start, f_lead,
                        f_len, f_ctr, b_start, b_lead, b_len, b_ctr,
                        dims_ax)
    mean, _comps, w_sum = out
    res = (pts_full, q_local, est_full, mean, w_sum,
           b_start, b_lead, b_len, b_ctr)
    return out, res


def _core_sharded_bwd(dims_ax, res, cot):
    from ..ops.cellwin import _bwd_call
    from ..ops.features import _cotangent_table

    (_t1_l, _r_cap, _s_cap, _ns_f, t2_l, p_cap, sr_cap, ns_b, r2,
     axis) = dims_ax
    (pts_full, q_local, est_full, mean, w_sum,
     b_start, b_lead, b_len, b_ctr) = res
    g_mean, g_comps, _g_wsum = cot
    table9_local = _cotangent_table(mean, w_sum, (g_mean, g_comps))
    # (12, mq_local) -> (12, mq_pad) in ONE collective: the backward
    # kernel's spans index the GLOBAL row axis (a point's referencing rows
    # live on any shard), so the 9 cotangent rows and the 3 query-position
    # rows it consumes all_gather together (tiled concat = global order,
    # shards are contiguous row ranges).
    t12_local = jnp.concatenate([q_local[:3].astype(table9_local.dtype),
                                 table9_local], axis=0)
    t12_full = jax.lax.all_gather(t12_local, axis, axis=1, tiled=True)
    q_full3 = t12_full[:3]
    table9_full = t12_full[3:]
    # _bwd_call builds the row table from q_est rows 0-2 + table9; feed the
    # gathered 3-row q_est (rows 3-7 of q_est are zeros by construction).
    q_full = jnp.concatenate(
        [q_full3, jnp.zeros((5, q_full3.shape[1]), q_full3.dtype)], axis=0
    )
    # This device's point-tile slice of the sorted tables (blocked inputs).
    m_local = t2_l * p_cap
    start = jax.lax.axis_index(axis) * m_local
    pts_local = jax.lax.dynamic_slice_in_dim(pts_full, start, m_local, 0)
    est_local = jax.lax.dynamic_slice_in_dim(est_full, start, m_local, 1)
    grad_local = _bwd_call(pts_local, q_full, est_local, table9_full,
                           b_start, b_lead, b_len, b_ctr,
                           t2=t2_l, p_cap=p_cap, sr_cap=sr_cap, ns_b=ns_b,
                           r2=r2)
    # COMPLETE gradient for my point tiles, zeros elsewhere; the partials
    # psum downstream (all_gather / replicated-input transpose rules).
    grad_full = jnp.zeros_like(pts_full)
    grad_full = jax.lax.dynamic_update_slice_in_dim(grad_full, grad_local,
                                                    start, 0)
    return (grad_full, None, None, None, None, None, None, None, None,
            None, None)


_core_sharded.defvjp(_core_sharded_fwd, _core_sharded_bwd)


def cellwin_shard_specs(sh: CellWinShards):
    """The shard_map in_spec pytree matching ``sh`` (identical treedef:
    static fields copied verbatim, array leaves replaced by specs)."""
    from jax.sharding import PartitionSpec as P

    ax = sh.axis
    has_exc = sh.n_exc > 0
    return CellWinShards(
        q_est=P(None, ax),
        est_sorted=P(),
        f_start=P(ax, None), f_lead=P(ax, None), f_len=P(ax, None),
        f_ctr=P(ax, None),
        b_start=P(ax, None), b_lead=P(ax, None), b_len=P(ax, None),
        b_ctr=P(ax, None),
        perm=P(), inv=P(),
        row_map=P(ax),
        exc_slots=P(ax) if has_exc else None,
        exc_nn=P(ax, None) if has_exc else None,
        exc_w=P(ax, None) if has_exc else None,
        exc_t_idx=P(ax, None) if has_exc else None,
        exc_t_w=P(ax, None) if has_exc else None,
        dims=sh.dims, axis=sh.axis, n_exc=sh.n_exc,
    )


def cellwin_moments_sharded(pts_full, sh: CellWinShards):
    """Per-device weighted moments over the local padded row tiles.

    Runs INSIDE shard_map: ``sh``'s array fields are the device-local
    blocks (pass the global :class:`CellWinShards` through shard_map with
    :func:`cellwin_shard_specs`); ``pts_full`` is the full padded
    cell-sorted CURRENT positions (replicated in-body, differentiable).
    Exception rows merge through the gather path exactly like the
    single-device op (ops/cellwin.py: cellwin_moments).
    """
    dims_ax = sh.dims + (sh.axis,)
    mean, comps, _w = _core_sharded(
        pts_full, sh.q_est, sh.est_sorted,
        sh.f_start, sh.f_lead, sh.f_len, sh.f_ctr,
        sh.b_start, sh.b_lead, sh.b_len, sh.b_ctr, dims_ax,
    )
    if sh.n_exc:
        from ..ops.features import neighborhood_moments

        em, ec = neighborhood_moments(pts_full, sh.exc_nn, sh.exc_w,
                                      sh.exc_t_idx, sh.exc_t_w)
        mean = mean.at[:, sh.exc_slots].set(em, mode="drop")
        comps = tuple(
            c.at[sh.exc_slots].set(e, mode="drop")
            for c, e in zip(comps, ec)
        )
    return mean, comps


def cellwin_features_sharded(pts_full, sh: CellWinShards):
    """Per-device loss features (trace / eigvals) over the local rows."""
    from ..ops.eigh3 import eigvals3_c

    _mean, comps = cellwin_moments_sharded(pts_full, sh)
    a00, a11, a22, a01, a02, a12 = comps
    l1, l2, l3 = eigvals3_c(*comps)
    return {
        "trace": a00 + a11 + a22,
        "eigvals": jnp.stack([l1, l2, l3], axis=-1),
    }
