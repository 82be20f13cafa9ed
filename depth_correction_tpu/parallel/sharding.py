"""Point-sharded training step over a device mesh.

The reference scales by host multiprocessing (one OS process per experiment,
lock-file CSVs; reference: src/depth_correction/main.py:140-157, io.py:24-65)
and has no intra-step parallelism. Here the *step itself* is SPMD, and the
layout scales MEMORY with the mesh, not just compute:

- every per-point table is sharded: the scan batches (vps / dirs / depth /
  incidence angles / masks — the point table's source fields) split along
  the padded scan-point axis N, and the query-row tables (neighbors /
  weights / transpose graphs / masks) split along the query axis,
- each device corrects + poses ITS 1/D slice of every scan; only the
  (M, 3) xyz position table is transiently ``all_gather``-ed for the
  neighbor gather (12 B/point over ICI — the stored tables, which cost
  ~100+ B/point with K=32 neighborhoods, never replicate). The backward of
  that all_gather is a ``psum_scatter`` of the position cotangents back to
  the owning shard,
- the scalar loss is a pair of ``psum``s (masked sum + count), so the
  backward pass's collectives ride the ICI.

This is the moral equivalent of context parallelism for point clouds:
"sequence length" = points per global cloud; both FLOPs and resident bytes
scale linearly with chips (SURVEY §5's first-class scaling axis).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config, PoseCorrection
from ..ops.features import neighborhood_features

__all__ = [
    "make_mesh", "make_multihost_mesh", "shard_train_data",
    "make_sharded_loss_fn",
]

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS,
              devices=None) -> Mesh:
    """1-D data mesh over the first ``n_devices`` devices.

    :param devices: optional explicit device list (e.g. the global,
        process-spanning ``jax.devices()`` after ``jax.distributed``
        initialization — see :func:`make_multihost_mesh`); defaults to this
        process's view of ``jax.devices()``.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                "mesh wants %d devices, %d available" % (n_devices, len(devices))
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_multihost_mesh(
    n_devices: Optional[int] = None,
    axis: str = DATA_AXIS,
    *,
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> Mesh:
    """Process-spanning 1-D data mesh: ICI within a host's slice, DCN across.

    Initializes ``jax.distributed`` (idempotent: skipped when the client is
    already connected) and builds the mesh over the GLOBAL device list, so
    the point-axis sharding in :func:`shard_train_data` spans every host's
    chips. Collectives inside one slice ride the ICI; the scalar psum pair
    and the establishment all_gathers cross hosts over DCN — the layout
    keeps per-point tables host-local, so DCN traffic stays O(points/D)
    positions per step, not O(tables).

    Launch one process per host with identical code and::

        mesh = make_multihost_mesh(
            coordinator_address="host0:8476",
            num_processes=N, process_id=rank)

    (or set cfg.dist_coordinator/-num_processes/-process_id and let
    ``train()`` call this). Single-process fallback: with no coordinator the
    call is exactly :func:`make_mesh`.

    Untested on real multi-host DCN in this sandbox (one chip); the
    construction path is covered by a single-process ``jax.distributed``
    integration test (tests/test_parallel.py).
    """
    if coordinator_address is not None:
        from jax._src import distributed as _dist

        already = getattr(_dist.global_state, "client", None) is not None
        if not already:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
                local_device_ids=local_device_ids,
            )
    return make_mesh(n_devices, axis, devices=jax.devices())


def mesh_from_config(cfg) -> Optional[Mesh]:
    """The training/eval mesh a config asks for, or None (single device).

    ``cfg.mesh_shape`` sizes the 1-D data mesh ({'data': N} or a plain N;
    N <= 1 means no mesh). ``cfg.dist_coordinator`` upgrades it to a
    process-spanning multi-host mesh (see :func:`make_multihost_mesh`), in
    which case N counts GLOBAL devices (None/'all' = every device of every
    host).
    """
    shape = getattr(cfg, "mesh_shape", None)
    dist = getattr(cfg, "dist_coordinator", None)
    if not shape and not dist:
        return None
    if isinstance(shape, dict):
        n_dev = shape.get("data", 1)
    else:
        n_dev = shape
    n_dev = None if n_dev in (None, "all") else int(n_dev)
    if dist:
        return make_multihost_mesh(
            n_dev,
            coordinator_address=dist,
            num_processes=getattr(cfg, "dist_num_processes", None),
            process_id=getattr(cfg, "dist_process_id", None),
        )
    if n_dev is not None and n_dev <= 1:
        return None
    return make_mesh(n_dev)


def _stacked_shard_transposes(neighbors, num_points: int, mesh: Mesh,
                              weights=None):
    """Per-device transpose graphs, stacked to (D * M, Kt) and BORN SHARDED.

    The query rows are split into D contiguous shards; each shard's
    transpose (point j -> its query rows WITHIN the shard) is built
    independently, padded to the common in-degree width, and placed
    directly on its mesh device (``make_array_from_single_device_arrays``)
    — no device ever materializes the full stack, so prep memory stays
    mesh-scaled. shard_map slices off each device's (M, Kt) block; the
    per-point gradient sums are linear in the transpose pairs, so
    shard-local partial gradients psum (via shard_map's replicated-input
    transpose rule) to the exact global gradient.

    Built ON DEVICE (one argsort + gathers per shard,
    ``ops.features.build_transpose_graph_device``); host transfer is one
    scalar (max in-degree) per shard, which sizes the static Kt.

    :param weights: with frozen weights, returns (t_idx, t_w) for the
        analytic moments VJP. Without (nn_scale, whose weights recompute
        in-step), returns the PAIR-level (t_idx, t_slot) tables for the
        scatter-free gather VJP (``ops.features._gather_T``) — the same
        design the single-device nn_scale path uses.
    """
    from ..ops.features import build_transpose_graph_device

    devices = list(mesh.devices.reshape(-1))
    n_devices = len(devices)
    mq = neighbors.shape[0]
    assert mq % n_devices == 0, (mq, n_devices)
    qs = mq // n_devices
    neighbors = jnp.asarray(neighbors)
    if weights is not None:
        weights = jnp.asarray(weights)
    parts = []
    for d in range(n_devices):
        sl = slice(d * qs, (d + 1) * qs)
        out = build_transpose_graph_device(
            neighbors[sl],
            num_points=num_points,
            weights=None if weights is None else weights[sl],
        )
        # (t_idx, t_slot) without weights; (t_idx, t_slot, t_w) with.
        parts.append((out[0], out[2] if weights is not None else out[1]))
    kt = max(p[0].shape[1] for p in parts)
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def assemble(xs, fill):
        shards = [
            jax.device_put(
                jnp.pad(x, ((0, 0), (0, kt - x.shape[1])),
                        constant_values=fill),
                devices[d],
            )
            for d, x in enumerate(xs)
        ]
        return jax.make_array_from_single_device_arrays(
            (n_devices * num_points, kt), sharding, shards
        )

    t_idx = assemble([p[0] for p in parts], -1)
    second = assemble([p[1] for p in parts], 0 if weights is not None else -1)
    return t_idx, second


def batch_specs(batch):
    """PartitionSpec pytree for a :class:`SequenceBatch`: cloud fields split
    along the padded scan-point axis N (axis 1), the (S, 4, 4) poses and any
    non-point leaf replicate."""
    n = batch.cloud.depth.shape[1]

    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 2 and x.shape[1] == n:
            return P(None, DATA_AXIS)
        return P()

    return jax.tree_util.tree_map(spec, batch)


def shard_train_data(data, mesh: Mesh, analytic_vjp: bool = True,
                     shard_points: bool = True, pair_transposes: bool = False):
    """Place the training tables on the mesh, sharded along their point axes.

    With ``shard_points`` (default), the scan batches themselves — the
    source of the global point table — shard along the padded scan-point
    axis, so each device holds ~1/D of every per-point array (memory scales
    with the mesh). ``shard_points=False`` keeps the round-2 layout
    (replicated batches; compute scales, memory does not).

    Point counts are padded to multiples of 512 (preproc.pad_size), which
    divides typical mesh sizes; shard_map requires exact divisibility.

    With ``analytic_vjp`` (default), per-device transpose graphs are built so
    the sharded backward uses the scatter-free analytic moments VJP
    (ops/features.py) instead of XLA's serialized scatter-add; ICP
    correspondences shard along the per-pair point axis.

    With ``pair_transposes`` (for nn_scale, whose in-step reweighting rules
    out the frozen-weight moments VJP), PAIR-level (t_idx, t_slot) shard
    transposes make the neighbor gather's backward scatter-free instead.
    """
    if any(p is not None for p in (getattr(data, "point_perm", ()) or ())):
        raise ValueError(
            "spatial_sort is a single-device layout; prepare the data with "
            "prepare_sequences(..., mesh=mesh) (or via cfg.mesh_shape, "
            "which disables the sort) before sharding"
        )
    # Cell-window graphs shard instead of dropping (second generation):
    # forward by row tile, backward by point tile — see
    # parallel/cellwin_shard.py. Sequences carrying a sharded graph skip
    # the generic row-table sharding below (the engine brings its own
    # padded row layout whose length need not divide the mesh before
    # padding).
    cw_shards = [None] * len(data.batches)
    cw_in = list(getattr(data, "cellwin", ()) or ())
    if any(c is not None for c in cw_in):
        from .cellwin_shard import shard_cellwin_device

        for i, c in enumerate(cw_in):
            if c is not None:
                cw_shards[i] = shard_cellwin_device(c, mesh, axis=DATA_AXIS)
    if any(o is not None for o in (getattr(data, "offsets", ()) or ())):
        raise NotImplementedError(
            "static TrainData.offsets are not consumed by the sharded loss; "
            "use cfg.loss_offset (the dynamic offset), which is"
        )
    point_sharded = NamedSharding(mesh, P(DATA_AXIS))
    pair_point_sharded = NamedSharding(mesh, P(None, DATA_AXIS))
    replicated = NamedSharding(mesh, P())
    n_dev = int(np.prod(mesh.devices.shape))

    def place(x, sharding):
        return jax.device_put(x, sharding)

    def place_batch(batch):
        if not shard_points:
            return jax.tree_util.tree_map(lambda x: place(x, replicated), batch)
        specs = batch_specs(batch)
        return jax.tree_util.tree_map(
            lambda x, s: place(x, NamedSharding(mesh, s)), batch, specs
        )

    import dataclasses

    def place_planes(planes):
        """Planes shard along the SUPPORT axis: member matrices split, the
        small per-plane fields replicate. S pads to a device multiple."""
        import dataclasses as dc

        idx = np.asarray(planes.member_idx)
        w = np.asarray(planes.member_weights)
        pad = (-idx.shape[1]) % n_dev
        if pad:
            idx = np.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
            w = np.pad(w, ((0, 0), (0, pad)))
        w = np.where(idx >= 0, w, 0.0)
        return dc.replace(
            planes,
            member_idx=place(jnp.asarray(idx), pair_point_sharded),
            member_weights=place(jnp.asarray(w), pair_point_sharded),
            params=place(planes.params, replicated),
            valid=place(planes.valid, replicated)
            if planes.valid is not None
            else None,
            cov=None,
            eigvals=None,
            mask=None,
            loss=None,
        )

    t_neighbors = []
    t_slots = []
    t_weights = []
    off_nn = []
    off_w = []
    off_t = []
    off_tw = []
    for i, nn in enumerate(data.neighbors):
        # Cell-window sequences carry their own kernels + exception
        # transposes; the generic stacked transposes would be dead weight.
        plain = (nn is not None and not hasattr(nn, "member_idx")
                 and cw_shards[i] is None)
        if plain and pair_transposes:
            m = int(np.prod(data.batches[i].cloud.depth.shape))
            t_idx, t_slot = _stacked_shard_transposes(nn, m, mesh)
            t_neighbors.append(t_idx)  # born sharded
            t_slots.append(t_slot)
            t_weights.append(None)
        elif plain and analytic_vjp:
            m = int(np.prod(data.batches[i].cloud.depth.shape))
            t_idx, t_w = _stacked_shard_transposes(
                nn, m, mesh, weights=data.weights[i]
            )
            t_neighbors.append(t_idx)  # born sharded
            t_slots.append(None)
            t_weights.append(t_w)
        else:
            t_neighbors.append(None)
            t_slots.append(None)
            t_weights.append(None)
        onn = data.off_neighbors[i] if data.off_neighbors else None
        if onn is None:
            off_nn.append(None)
            off_w.append(None)
            off_t.append(None)
            off_tw.append(None)
            continue
        # Dynamic loss_offset: shard the local neighborhoods like the global
        # ones, with their own per-shard transposes. The offset features are
        # UNSCALED (reference semantics; see train._local_offset), so the
        # frozen-weight moments VJP always applies here, nn_scale or not.
        m = int(np.prod(data.batches[i].cloud.depth.shape))
        ow = jnp.asarray(data.off_weights[i])
        onn = jnp.asarray(onn)
        if cw_shards[i] is not None:
            # Offset rows live in the cell-window padded tile layout
            # (re-indexed at prepare time); pad to the SHARDED layout's
            # device-multiple row count before splitting.
            rows_p = int(cw_shards[i].row_map.shape[0])
            grow = rows_p - onn.shape[0]
            if grow:
                onn = jnp.pad(onn, ((0, grow), (0, 0)), constant_values=-1)
                ow = jnp.pad(ow, ((0, grow), (0, 0)))
        ot_idx, ot_w = _stacked_shard_transposes(onn, m, mesh, weights=ow)
        off_nn.append(place(jnp.asarray(onn), point_sharded))
        off_w.append(place(ow, point_sharded))
        off_t.append(ot_idx)  # born sharded
        off_tw.append(ot_w)

    return dataclasses.replace(
        data,
        batches=tuple(place_batch(b) for b in data.batches),
        query_rows=tuple(
            place(q, point_sharded)
            if q is not None and cw_shards[j] is None
            else None
            for j, q in enumerate(
                data.query_rows or (None,) * len(data.batches)
            )
        ),
        # Cell-window sequences: the frozen row tables (neighbors /
        # weights / masks) are subsumed by the sharded graph (its row_map
        # carries the mask); their pre-padding row counts need not divide
        # the mesh, so they are dropped rather than placed.
        neighbors=tuple(
            place_planes(n)
            if n is not None and hasattr(n, "member_idx")
            else (
                place(n, point_sharded)
                if n is not None and cw_shards[j] is None
                else None
            )
            for j, n in enumerate(data.neighbors)
        ),
        weights=tuple(
            place(w, point_sharded)
            if w is not None and cw_shards[j] is None
            else None
            for j, w in enumerate(data.weights)
        ),
        masks=tuple(
            None
            if m is None or cw_shards[j] is not None
            else (
                place(m, replicated)
                if n is not None and hasattr(n, "member_idx")
                else place(m, point_sharded)
            )
            for j, (m, n) in enumerate(zip(data.masks, data.neighbors))
        ),
        cellwin=tuple(cw_shards),
        t_neighbors=tuple(t_neighbors),
        t_slots=tuple(t_slots),
        t_weights=tuple(t_weights),
        off_neighbors=tuple(off_nn),
        off_weights=tuple(off_w),
        off_transpose=tuple(zip(off_t, off_tw)) if any(
            t is not None for t in off_t
        ) else tuple(None for _ in off_t),
        icp_idx=tuple(
            place(x, pair_point_sharded) if x is not None else None
            for x in data.icp_idx
        ),
        icp_w=tuple(
            place(x, pair_point_sharded) if x is not None else None
            for x in data.icp_w
        ),
    )


def _batch_point_sharded(batch) -> bool:
    """True when the batch's cloud fields were placed split along the
    scan-point axis (``shard_train_data(..., shard_points=True)``)."""
    s = getattr(batch.cloud.depth, "sharding", None)
    return s is not None and not s.is_fully_replicated


def _global_points_from_shard(batch, model, delta, points_sharded: bool):
    """Corrected + posed global positions inside a shard_map body.

    Each device corrects and poses its (S, N/D) slice of every scan — the
    expensive per-point work is sharded — then all_gathers ONLY the (S, N, 3)
    xyz table for the neighbor gather (the stored per-point tables stay
    1/D-resident). The all_gather's transpose is a psum_scatter of the
    position cotangents back to the owning shard, so gradients stay exact.
    """
    from ..preproc import corrected_poses

    cloud = batch.cloud if model is None else model.apply(batch.cloud)
    poses = corrected_poses(batch.poses, delta)
    tc = cloud.transform(poses)
    pts = tc.to_points()  # (S, N[/D], 3)
    if points_sharded:
        pts = jax.lax.all_gather(pts, DATA_AXIS, axis=1, tiled=True)
    return pts.reshape(-1, pts.shape[-1])


def make_sharded_loss_fn(data, cfg: Config, mesh: Mesh):
    """Sharded analogue of ``train.make_loss_fn``.

    Consistency losses: each device corrects + poses its 1/D slice of the
    scan batch, all_gathers the xyz position table, and runs the O(M*K)
    neighborhood gather + covariance + eigendecomposition on its query-row
    shard; the backward uses the analytic moments VJP over per-shard
    transpose graphs when ``shard_train_data`` built them (shard-local
    partial gradients psum to the exact global gradient); reduction is a
    psum pair.

    ICP loss: correspondences shard along the per-pair point axis; each
    device reduces its slice of the pair sums, one psum per reduction.
    """
    if cfg.loss == "icp_loss":
        return _make_sharded_icp_loss_fn(data, cfg, mesh)
    if cfg.loss not in ("min_eigval_loss", "trace_loss"):
        raise NotImplementedError(
            "sharded step supports the consistency losses and icp_loss"
        )
    from ..config import NeighborhoodType

    if cfg.nn_type == NeighborhoodType.plane:
        return _make_sharded_plane_loss_fn(data, cfg, mesh)
    with_scale = cfg.nn_scale is not None
    kwargs = dict(cfg.loss_kwargs or {})
    normalization = bool(kwargs.get("normalization", False))
    use_trace = cfg.loss == "trace_loss"
    sqrt = bool(kwargs.get("sqrt", False))
    inlier_ratio = float(kwargs.get("inlier_ratio", 1.0))
    inlier_loss_mult = float(kwargs.get("inlier_loss_mult", 1.0))
    inlier_max_loss = kwargs.get("inlier_max_loss")
    only_finite = bool(kwargs.get("only_finite", False))
    skip_nans = bool(kwargs.get("skip_nans", False))
    reduction = str(kwargs.get("reduction", "mean"))
    if reduction not in ("mean", "sum"):
        raise NotImplementedError(
            "sharded loss supports reduction mean/sum, got %r" % reduction
        )
    mode = cfg.pose_correction

    def _pointwise_of(feats):
        if use_trace:
            return feats["trace"]
        eigvals = feats["eigvals"]
        pw = eigvals[..., 0]
        if normalization:
            pw = pw / jnp.maximum(jnp.sum(eigvals, -1), 1e-6)
        return pw

    def _offset_pointwise(model, batch, off_nn, off_w, off_t, off_tw,
                          off_slot, qr, points_sharded):
        """Pointwise loss of the frozen LOCAL neighborhoods under the
        CURRENT model (dynamic loss offset; reference: preproc.py:67-77).
        Unscaled like the single-device _local_offset: the reference's
        offset eigenvalues come from the unscaled local features."""
        local = model.apply(batch.cloud) if model is not None else batch.cloud
        lpts = local.to_points()  # (S, N[/D], 3)
        if points_sharded:
            lpts = jax.lax.all_gather(lpts, DATA_AXIS, axis=1, tiled=True)
        lpts = lpts.reshape(-1, lpts.shape[-1])
        off_feats = neighborhood_features(
            lpts, off_nn, off_w, scale=None,
            compute_normals=False, t_idx=off_t, t_slot=off_slot,
            t_w=off_tw, query_rows=qr,
        )
        return _pointwise_of(off_feats)

    def _tail(pointwise, mask, off_pw):
        """Trim -> offset -> relu/sqrt -> finite masks -> psum pair (the
        shared reduction tail of the gather and cell-window bodies)."""
        # Inlier-quantile trim over the GLOBAL distribution: the sharded
        # pointwise losses all_gather (Mq floats — a few hundred KB over
        # ICI), the threshold replicates (reference: loss.py:256-273).
        if inlier_ratio < 1.0 or inlier_max_loss is not None:
            from ..ops.reduce import masked_quantile

            thr = inlier_max_loss
            if inlier_ratio < 1.0:
                pw_all = jax.lax.all_gather(pointwise, DATA_AXIS, tiled=True)
                m_all = jax.lax.all_gather(mask, DATA_AXIS, tiled=True)
                q = masked_quantile(pw_all, m_all, inlier_ratio)
                if inlier_loss_mult != 1.0:
                    q = inlier_loss_mult * q
                thr = q if thr is None else jnp.minimum(
                    jnp.asarray(thr, q.dtype), q
                )
            mask = mask & (pointwise <= thr)

        if off_pw is not None:
            pointwise = pointwise - off_pw

        pointwise = jax.nn.relu(pointwise)
        if sqrt:
            pointwise = jnp.sqrt(pointwise)
        # only_finite / skip_nans fold into the mask exactly like the
        # single-device reduce_loss (reference: loss.py:125-150).
        if only_finite:
            mask = mask & jnp.isfinite(pointwise)
        elif skip_nans:
            mask = mask & ~jnp.isnan(pointwise)
        s = jax.lax.psum(jnp.sum(jnp.where(mask, pointwise, 0.0)), DATA_AXIS)
        c = jax.lax.psum(jnp.sum(mask), DATA_AXIS)
        return s, c

    def seq_loss(params, batch, neighbors, weights, mask, t_idx, t_w,
                 t_slot=None, off_nn=None, off_w=None, off_t=None,
                 off_tw=None, off_slot=None, qr=None, points_sharded=False):
        """Masked (sum, count) of the pointwise loss, psum-reduced."""
        model = params["model"]
        # loss_fn below narrows pose_deltas to a 1-tuple holding this
        # sequence's (or the shared) correction.
        deltas = params.get("pose_deltas")
        delta = deltas[0] if deltas is not None else None
        points = _global_points_from_shard(batch, model, delta, points_sharded)
        # Sharded: features of my point shard only; the analytic backward
        # rides this shard's transpose graph (scatter-free: the moments VJP
        # via (t_idx, t_w), or the pair-level gather VJP via (t_idx, t_slot)
        # under nn_scale), and shard_map's replicated-input transpose psums
        # the partial point gradients.
        feats = neighborhood_features(
            points, neighbors, weights, scale=cfg.nn_scale,
            compute_normals=False, t_idx=t_idx, t_slot=t_slot, t_w=t_w,
            query_rows=qr,
        )
        pointwise = _pointwise_of(feats)
        off_pw = None
        if off_nn is not None:
            off_pw = _offset_pointwise(model, batch, off_nn, off_w, off_t,
                                       off_tw, off_slot, qr, points_sharded)
        return _tail(pointwise, mask, off_pw)

    def seq_loss_cw(params, batch, shl, off_nn=None, off_w=None, off_t=None,
                    off_tw=None, off_slot=None, points_sharded=False):
        """Cell-window engine body: moments from the sharded span-DMA
        kernels (parallel/cellwin_shard.py) — forward over this device's
        row tiles, backward over its point tiles — on the same transiently
        all_gather-ed position table the gather body uses."""
        from ..ops.features import permute_rows
        from .cellwin_shard import cellwin_features_sharded

        model = params["model"]
        deltas = params.get("pose_deltas")
        delta = deltas[0] if deltas is not None else None
        points = _global_points_from_shard(batch, model, delta, points_sharded)
        pts_sorted = permute_rows(points, shl.perm, shl.inv)
        feats = cellwin_features_sharded(pts_sorted, shl)
        pointwise = _pointwise_of(feats)
        mask = shl.row_map >= 0
        off_pw = None
        if off_nn is not None:
            # Offset graphs were re-indexed into the padded tile layout at
            # prepare time (train.prepare_sequences); rows align with the
            # cell-window feature rows.
            off_pw = _offset_pointwise(model, batch, off_nn, off_w, off_t,
                                       off_tw, off_slot, None, points_sharded)
        return _tail(pointwise, mask, off_pw)

    _cache = {}

    def _sharded(with_t: bool, pair: bool, with_off: bool, pair_off: bool,
                 with_qr: bool, ps: bool, batch):
        """shard_map wrapper per arg combination (specs must match arity).

        ``pair``/``pair_off``: the second transpose table is (int32) slots
        for the pair-level gather VJP (nn_scale) rather than transposed
        weights for the moments VJP.
        """
        key = (with_t, pair, with_off, pair_off, with_qr, ps,
               jax.tree_util.tree_structure(batch))
        if key in _cache:
            return _cache[key]
        bspec = batch_specs(batch) if ps else P()
        specs = [P(), bspec, P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)]
        if with_t:
            specs += [P(DATA_AXIS), P(DATA_AXIS)]
        if with_off:
            specs += [P(DATA_AXIS)] * 4
        if with_qr:
            specs += [P(DATA_AXIS)]

        def body(params, batch, nn, w, mask, *rest):
            j = 0
            t_i = t_w_ = t_s = None
            if with_t:
                t_i = rest[0]
                if pair:
                    t_s = rest[1]
                else:
                    t_w_ = rest[1]
                j = 2
            off_nn_ = off_w_ = off_t_ = off_tw_ = off_s_ = None
            if with_off:
                off_nn_, off_w_, off_t_ = rest[j], rest[j + 1], rest[j + 2]
                if pair_off:
                    off_s_ = rest[j + 3]
                else:
                    off_tw_ = rest[j + 3]
                j += 4
            qr = rest[j] if with_qr else None
            return seq_loss(params, batch, nn, w, mask, t_i, t_w_, t_slot=t_s,
                            off_nn=off_nn_, off_w=off_w_, off_t=off_t_,
                            off_tw=off_tw_, off_slot=off_s_,
                            qr=qr, points_sharded=ps)

        fn = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=tuple(specs),
            out_specs=(P(), P()),
            check_vma=False,
        )
        _cache[key] = fn
        return fn

    def _sharded_cw(with_off: bool, pair_off: bool, ps: bool, batch, sh):
        """shard_map wrapper for the cell-window body: the CellWinShards
        pytree passes through with its matching spec pytree
        (cellwin_shard.cellwin_shard_specs)."""
        from .cellwin_shard import cellwin_shard_specs

        key = ("cw", with_off, pair_off, ps, sh.dims, sh.n_exc,
               jax.tree_util.tree_structure(batch))
        if key in _cache:
            return _cache[key]
        bspec = batch_specs(batch) if ps else P()
        specs = [P(), bspec, cellwin_shard_specs(sh)]
        if with_off:
            specs += [P(DATA_AXIS)] * 4

        def body(params, batch, shl, *rest):
            off_nn_ = off_w_ = off_t_ = off_tw_ = off_s_ = None
            if with_off:
                off_nn_, off_w_, off_t_ = rest[0], rest[1], rest[2]
                if pair_off:
                    off_s_ = rest[3]
                else:
                    off_tw_ = rest[3]
            return seq_loss_cw(params, batch, shl, off_nn=off_nn_,
                               off_w=off_w_, off_t=off_t_, off_tw=off_tw_,
                               off_slot=off_s_, points_sharded=ps)

        fn = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=tuple(specs),
            out_specs=(P(), P()),
            check_vma=False,
        )
        _cache[key] = fn
        return fn

    bound_data = data
    ps_flags = tuple(_batch_point_sharded(b) for b in data.batches)

    def loss_fn(params, data=None):
        if data is None:
            data = bound_data
        total = 0.0
        count = 0.0
        deltas = params.get("pose_deltas")
        for i, batch in enumerate(data.batches):
            p = dict(params)
            if deltas is not None and mode in (
                PoseCorrection.sequence,
                PoseCorrection.pose,
            ):
                p["pose_deltas"] = (deltas[i],)
            cw = (
                data.cellwin[i]
                if getattr(data, "cellwin", ()) and i < len(data.cellwin)
                else None
            )
            if cw is not None:
                onn = data.off_neighbors[i] if data.off_neighbors else None
                ot = data.off_transpose[i] if data.off_transpose else None
                with_off = onn is not None and isinstance(ot, tuple)
                pair_off = with_off and jnp.issubdtype(
                    ot[1].dtype, jnp.integer
                )
                args = [p, batch, cw]
                if with_off:
                    args += [onn, data.off_weights[i], ot[0], ot[1]]
                s, c = _sharded_cw(with_off, pair_off, ps_flags[i], batch,
                                   cw)(*args)
                total = total + s
                count = count + c
                continue
            t_idx = data.t_neighbors[i] if data.t_neighbors else None
            t_w = data.t_weights[i] if data.t_weights else None
            t_slot = data.t_slots[i] if data.t_slots else None
            # Sharded transposes are plain stacked arrays; a BucketedTranspose
            # here means the data was not prepared by shard_train_data. The
            # Gaussian re-weighting (nn_scale) recomputes weights in-step, so
            # the frozen-weight analytic moments backward does not apply —
            # under nn_scale the PAIR-level (t_idx, t_slot) tables (built by
            # shard_train_data(pair_transposes=True)) make the neighbor
            # gather's backward scatter-free instead.
            plain_t = t_idx is not None and not hasattr(t_idx, "idx")
            moments_t = not with_scale and plain_t and t_w is not None
            pair_t = with_scale and plain_t and t_slot is not None
            use_t = moments_t or pair_t
            onn = data.off_neighbors[i] if data.off_neighbors else None
            ot = data.off_transpose[i] if data.off_transpose else None
            with_off = onn is not None and isinstance(ot, tuple)
            pair_off = with_off and jnp.issubdtype(ot[1].dtype, jnp.integer)
            qr = data.query_rows[i] if (with_scale and data.query_rows) else None
            # Placement is a property of the BOUND data (decided at
            # make_sharded_loss_fn time — inside jit the leaves are tracers).
            ps = ps_flags[i]
            args = [p, batch, data.neighbors[i], data.weights[i], data.masks[i]]
            if use_t:
                args += [t_idx, t_slot if pair_t else t_w]
            if with_off:
                args += [onn, data.off_weights[i], ot[0], ot[1]]
            if qr is not None:
                args += [qr]
            s, c = _sharded(use_t, pair_t, with_off, pair_off,
                            qr is not None, ps, batch)(*args)
            total = total + s
            count = count + c
        if reduction == "sum":
            return total
        return total / jnp.maximum(count, 1)

    return loss_fn


def _make_sharded_plane_loss_fn(data, cfg: Config, mesh: Mesh):
    """Plane-neighborhood mode sharded along the SUPPORT-point axis.

    Planes are few (P <= max_neighborhoods) but their member sets are large;
    each device holds an S/D slice of every plane's (P, S) member matrices,
    computes partial weighted moments of the corrected, posed member points,
    and three psums ((P,), (P, 3), (P, 3, 3) — tiny) assemble the exact
    per-plane covariance (reference semantics: preproc.py:218-243 with the
    plane normal supplying the incidence angles).
    """
    from ..ops.eigh3 import eigvals3
    from ..ops.features import gather_neighbors
    from ..ops.reduce import masked_quantile

    kwargs = dict(cfg.loss_kwargs or {})
    normalization = bool(kwargs.get("normalization", False))
    use_trace = cfg.loss == "trace_loss"
    sqrt = bool(kwargs.get("sqrt", False))
    inlier_ratio = float(kwargs.get("inlier_ratio", 1.0))
    inlier_loss_mult = float(kwargs.get("inlier_loss_mult", 1.0))
    inlier_max_loss = kwargs.get("inlier_max_loss")
    only_finite = bool(kwargs.get("only_finite", False))
    skip_nans = bool(kwargs.get("skip_nans", False))
    reduction = str(kwargs.get("reduction", "mean"))
    if reduction not in ("mean", "sum"):
        raise NotImplementedError(
            "sharded loss supports reduction mean/sum, got %r" % reduction
        )
    mode = cfg.pose_correction

    def seq_loss(params, batch, plane_params, member_idx, member_w, valid,
                 points_sharded=False):
        from ..preproc import corrected_poses

        model = params["model"]
        deltas = params.get("pose_deltas")
        delta = deltas[0] if deltas is not None else None
        poses = corrected_poses(batch.poses, delta)
        tc = batch.cloud.transform(poses)

        def full(x):  # (S, N[/D], ...) -> (S*N, ...)
            if points_sharded:
                x = jax.lax.all_gather(x, DATA_AXIS, axis=1, tiled=True)
            return x.reshape((-1,) + x.shape[2:])

        idx = member_idx  # (P, S_support/D)
        vps = gather_neighbors(full(tc.vps), idx)
        dirs = gather_neighbors(full(tc.dirs), idx)
        depth = gather_neighbors(full(tc.depth), idx)
        normals = plane_params[:, None, :3]
        cos = jnp.sum(dirs * normals, axis=-1)
        inc = jnp.arccos(jnp.clip(jnp.abs(cos), 0.0, 1.0))
        if model is not None:
            depth = model.correct_depth(depth, inc)
        pts = vps + depth[..., None] * dirs  # (P, S/D, 3)

        w = member_w.astype(pts.dtype)
        sw = jax.lax.psum(jnp.sum(w, axis=-1), DATA_AXIS)  # (P,)
        sx = jax.lax.psum(jnp.sum(w[..., None] * pts, axis=1), DATA_AXIS)
        mean = sx / jnp.maximum(sw, 1e-12)[..., None]
        c = pts - mean[:, None, :]
        xx = jax.lax.psum(
            jnp.einsum("psi,psj->pij", c * w[..., None], c), DATA_AXIS
        )
        cov = xx / jnp.maximum(sw - 1.0, 1e-6)[..., None, None]
        eigvals = eigvals3(cov)
        if use_trace:
            pw = cov[..., 0, 0] + cov[..., 1, 1] + cov[..., 2, 2]
        else:
            pw = eigvals[..., 0]
            if normalization:
                pw = pw / jnp.maximum(jnp.sum(eigvals, -1), 1e-6)
        mask = valid
        # Inlier trim BEFORE relu/sqrt, like the single-device
        # _consistency_loss (reference: loss.py:256-273); the plane axis is
        # replicated after the psums, so the quantile needs no collective.
        if inlier_ratio < 1.0 or inlier_max_loss is not None:
            thr = inlier_max_loss
            if inlier_ratio < 1.0:
                q = masked_quantile(pw, mask, inlier_ratio)
                if inlier_loss_mult != 1.0:
                    q = inlier_loss_mult * q
                thr = q if thr is None else jnp.minimum(
                    jnp.asarray(thr, q.dtype), q
                )
            mask = mask & (pw <= thr)
        pw = jax.nn.relu(pw)
        if sqrt:
            pw = jnp.sqrt(pw)
        if only_finite:
            mask = mask & jnp.isfinite(pw)
        elif skip_nans:
            mask = mask & ~jnp.isnan(pw)
        # Plane axis is replicated after the psums: plain masked sums.
        return jnp.sum(jnp.where(mask, pw, 0.0)), jnp.sum(mask)

    _cache = {}

    def _sharded(ps: bool, batch):
        key = (ps, jax.tree_util.tree_structure(batch))
        if key not in _cache:
            bspec = batch_specs(batch) if ps else P()

            def body(params, batch, plane_params, member_idx, member_w, valid):
                return seq_loss(params, batch, plane_params, member_idx,
                                member_w, valid, points_sharded=ps)

            _cache[key] = jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(), bspec, P(), P(None, DATA_AXIS),
                          P(None, DATA_AXIS), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )
        return _cache[key]

    bound_data = data
    ps_flags = tuple(_batch_point_sharded(b) for b in data.batches)

    def loss_fn(params, data=None):
        if data is None:
            data = bound_data
        total = 0.0
        count = 0.0
        deltas = params.get("pose_deltas")
        for i, batch in enumerate(data.batches):
            p = dict(params)
            if deltas is not None and mode in (
                PoseCorrection.sequence,
                PoseCorrection.pose,
            ):
                p["pose_deltas"] = (deltas[i],)
            planes = data.neighbors[i]
            s, c = _sharded(ps_flags[i], batch)(
                p, batch, planes.params, planes.member_idx,
                planes.member_weights, planes.valid,
            )
            total = total + s
            count = count + c
        if reduction == "sum":
            return total
        return total / jnp.maximum(count, 1)

    return loss_fn


def _make_sharded_icp_loss_fn(data, cfg: Config, mesh: Mesh):
    """Point-sharded ICP objective (reference: loss.py:373-403 semantics,
    frozen correspondences like train.py:179-210).

    Each device holds an N/D slice of every pair's correspondence rows; it
    slices the matching rows of the replicated source scan (by
    ``axis_index``), gathers targets from the full replicated next scan, and
    psums the per-pair weighted sums.
    """
    from ..loss import icp_pair_loss_batched
    from ..preproc import corrected_poses

    p2plane = bool((cfg.loss_kwargs or {}).get("icp_point_to_plane", True))
    mode = cfg.pose_correction
    n_dev = int(np.prod(mesh.devices.shape))

    def seq_loss(params, batch, idx, w, points_sharded=False):
        model = params["model"]
        deltas = params.get("pose_deltas")
        delta = deltas[0] if deltas is not None else None
        cloud = model.apply(batch.cloud) if model is not None else batch.cloud
        poses = corrected_poses(batch.poses, delta)
        tc = cloud.transform(poses)
        pts_local = tc.to_points()  # (S, N[/D], 3)
        nrm_local = tc.normals

        # My slice of the source rows; targets gather from the FULL scans
        # (xyz/normal tables all_gather transiently when the batch shards).
        if points_sharded:
            points = jax.lax.all_gather(pts_local, DATA_AXIS, axis=1, tiled=True)
            p1 = pts_local[:-1]
            n1 = nrm_local[:-1] if nrm_local is not None else None
            normals = (
                jax.lax.all_gather(nrm_local, DATA_AXIS, axis=1, tiled=True)
                if (p2plane and nrm_local is not None)
                else nrm_local
            )
        else:
            points = pts_local
            normals = nrm_local
            n = points.shape[1]
            shard = n // n_dev
            start = jax.lax.axis_index(DATA_AXIS) * shard
            p1 = jax.lax.dynamic_slice_in_dim(points[:-1], start, shard, axis=1)
            if p2plane:
                n1 = jax.lax.dynamic_slice_in_dim(
                    normals[:-1], start, shard, axis=1
                )
        gi = jnp.maximum(idx, 0)[..., None]
        q2 = jnp.take_along_axis(points[1:], gi, axis=1)  # (P, shard, 3)
        wf = w.astype(points.dtype)
        w_sum = jax.lax.psum(jnp.sum(wf, axis=-1), DATA_AXIS)
        w_sum = jnp.maximum(w_sum, 1.0)
        if p2plane:
            n2 = jnp.take_along_axis(normals[1:], gi, axis=1)
            d12 = jax.lax.psum(
                jnp.sum(jnp.abs(jnp.sum(n1 * (q2 - p1), -1)) * wf, -1), DATA_AXIS
            ) / w_sum
            d21 = jax.lax.psum(
                jnp.sum(jnp.abs(jnp.sum(n2 * (p1 - q2), -1)) * wf, -1), DATA_AXIS
            ) / w_sum
            pair = 0.5 * (d12 + d21)
        else:
            d = jnp.sqrt(jnp.sum((q2 - p1) ** 2, axis=-1))
            pair = jax.lax.psum(jnp.sum(d * wf, -1), DATA_AXIS) / w_sum
        return jnp.mean(pair)

    _cache = {}

    def _sharded(ps: bool, batch):
        key = (ps, jax.tree_util.tree_structure(batch))
        if key not in _cache:
            bspec = batch_specs(batch) if ps else P()

            def body(params, batch, idx, w):
                return seq_loss(params, batch, idx, w, points_sharded=ps)

            _cache[key] = jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(), bspec, P(None, DATA_AXIS), P(None, DATA_AXIS)),
                out_specs=P(),
                check_vma=False,
            )
        return _cache[key]

    bound_data = data
    ps_flags = tuple(_batch_point_sharded(b) for b in data.batches)

    def loss_fn(params, data=None):
        if data is None:
            data = bound_data
        total = 0.0
        deltas = params.get("pose_deltas")
        for i, batch in enumerate(data.batches):
            p = dict(params)
            if deltas is not None and mode in (
                PoseCorrection.sequence,
                PoseCorrection.pose,
            ):
                p["pose_deltas"] = (deltas[i],)
            total = total + _sharded(ps_flags[i], batch)(
                p, batch, data.icp_idx[i], data.icp_w[i]
            )
        return total / max(len(data.batches), 1)

    return loss_fn
