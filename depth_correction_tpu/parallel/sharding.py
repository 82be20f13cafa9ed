"""Point-sharded training step over a device mesh.

The reference scales by host multiprocessing (one OS process per experiment,
lock-file CSVs; reference: src/depth_correction/main.py:140-157, io.py:24-65)
and has no intra-step parallelism. Here the *step itself* is SPMD:

- the global-cloud point axis — the natural data axis, since per-point
  neighborhood features and pointwise losses are independent
  (reference loss.py:181-213 is embarrassingly parallel) — is sharded
  across the mesh,
- each device gathers/reduces features for its point shard against a
  replicated copy of the (small, O(M * 3)) merged point array,
- the scalar loss is a pair of ``psum``s (masked sum + count), so the
  backward pass's collectives ride the ICI.

This is the moral equivalent of context parallelism for point clouds:
"sequence length" = points per global cloud, scaling linearly with chips.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config, PoseCorrection
from ..ops.features import neighborhood_features
from ..preproc import global_cloud

__all__ = ["make_mesh", "shard_train_data", "make_sharded_loss_fn"]

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_train_data(data, mesh: Mesh):
    """Place per-point arrays (neighbors/weights/masks) on the mesh, sharded
    along the point axis; sequence batches are replicated.

    Point counts are padded to multiples of 512 (preproc.pad_size), which
    divides typical mesh sizes; shard_map requires exact divisibility.
    """
    point_sharded = NamedSharding(mesh, P(DATA_AXIS))
    replicated = NamedSharding(mesh, P())

    def place(x, sharding):
        return jax.device_put(x, sharding)

    import dataclasses

    return dataclasses.replace(
        data,
        batches=jax.tree_util.tree_map(lambda x: place(x, replicated), data.batches),
        neighbors=tuple(place(n, point_sharded) for n in data.neighbors),
        weights=tuple(place(w, point_sharded) for w in data.weights),
        masks=tuple(place(m, point_sharded) for m in data.masks),
    )


def make_sharded_loss_fn(data, cfg: Config, mesh: Mesh):
    """Sharded analogue of ``train.make_loss_fn`` for the consistency losses.

    Model/pose application is replicated (O(M) elementwise — negligible);
    the O(M*K) neighborhood gather + covariance + eigendecomposition runs on
    point shards; reduction is psum.
    """
    if cfg.loss not in ("min_eigval_loss", "trace_loss"):
        raise NotImplementedError("sharded step supports the consistency losses")
    kwargs = dict(cfg.loss_kwargs or {})
    normalization = bool(kwargs.get("normalization", False))
    use_trace = cfg.loss == "trace_loss"
    sqrt = bool(kwargs.get("sqrt", False))
    mode = cfg.pose_correction

    def seq_loss(params, batch, neighbors, weights, mask):
        """Masked (sum, count) of the pointwise loss, psum-reduced."""
        model = params["model"]
        # loss_fn below narrows pose_deltas to a 1-tuple holding this
        # sequence's (or the shared) correction.
        deltas = params.get("pose_deltas")
        delta = deltas[0] if deltas is not None else None
        # Replicated: correct + pose + merge (full cloud on each device).
        gcloud = global_cloud(batch, model=model, pose_deltas=delta)
        points = gcloud.get_points()
        # Sharded: features of my point shard only.
        feats = neighborhood_features(
            points, neighbors, weights, scale=cfg.nn_scale, compute_normals=False
        )
        if use_trace:
            pointwise = feats["trace"]
        else:
            eigvals = feats["eigvals"]
            pointwise = eigvals[..., 0]
            if normalization:
                pointwise = pointwise / jnp.maximum(jnp.sum(eigvals, -1), 1e-6)
        pointwise = jax.nn.relu(pointwise)
        if sqrt:
            pointwise = jnp.sqrt(pointwise)
        s = jax.lax.psum(jnp.sum(jnp.where(mask, pointwise, 0.0)), DATA_AXIS)
        c = jax.lax.psum(jnp.sum(mask), DATA_AXIS)
        return s, c

    sharded_seq_loss = jax.shard_map(
        seq_loss,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
    )

    bound_data = data

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
            s, c = sharded_seq_loss(
                p, batch, data.neighbors[i], data.weights[i], data.masks[i]
            )
            total = total + s
            count = count + c
        return total / jnp.maximum(count, 1)

    return loss_fn
