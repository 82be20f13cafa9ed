"""On-device neighbor search over fixed-shape padded point arrays.

Replaces the reference's per-call CPU ``scipy.spatial.cKDTree`` round-trip
(reference: src/depth_correction/nearest_neighbors.py:22-80) with a tiled
brute-force search that runs entirely on the TPU inside the XLA graph:

- kNN (optionally radius-bounded, like cKDTree's ``distance_upper_bound``),
- radius search returning up to ``k`` nearest neighbors within ``r``
  (equivalent to ``query_ball_point`` + pad-to-rectangular when ``k`` is at
  least the maximum neighbor count — see :func:`neighbor_counts`).

Output conventions match the reference: missing neighbors are index ``-1``
with distance ``inf`` (the reference uses NaN for radius fills; ``inf``
composes better with masking and top-k).

The search runs as a ``lax.scan`` over point tiles, keeping a running top-k
per query row. Distances are computed by direct (query - point) differences
rather than the ||q||^2 - 2qp + ||p||^2 expansion: global clouds span ~100 m
and float32 cancellation in the expanded form corrupts membership decisions
at the radius boundary.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "nearest_neighbors",
    "radius_neighbors",
    "neighbor_counts",
    "suggest_k_max",
]

_TILE = 2048  # point-tile size for the scan


def _pad_rows(x: jax.Array, multiple: int, fill: float) -> jax.Array:
    n = x.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], fill, dtype=x.dtype)], axis=0
    )


@partial(jax.jit, static_argnames=("k", "tile"))
def _knn_tiled(
    points: jax.Array,
    query: jax.Array,
    valid_points: jax.Array,
    k: int,
    tile: int = _TILE,
) -> Tuple[jax.Array, jax.Array]:
    """Running top-k scan over point tiles.

    :param points: (N, 3) padded reference points.
    :param query: (Q, 3) query points.
    :param valid_points: (N,) bool validity of reference points.
    :return: (d2 (Q, k) squared distances ascending, idx (Q, k) int32).
    """
    n = points.shape[0]
    n_tiles = n // tile
    pts = points.reshape(n_tiles, tile, 3)
    valid = valid_points.reshape(n_tiles, tile)

    q = query
    big = jnp.asarray(jnp.inf, dtype=q.dtype)

    def body(carry, inp):
        best_d2, best_i = carry
        tile_pts, tile_valid, tile_start = inp
        # (Q, T) squared distances via direct differences (precision-safe).
        diff = q[:, None, :] - tile_pts[None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        d2 = jnp.where(tile_valid[None, :], d2, big)
        idx = tile_start + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        # Merge with running best and re-select k smallest.
        cat_d2 = jnp.concatenate([best_d2, d2], axis=1)
        cat_i = jnp.concatenate([best_i, idx], axis=1)
        neg_top, arg = jax.lax.top_k(-cat_d2, k)
        new_d2 = -neg_top
        new_i = jnp.take_along_axis(cat_i, arg, axis=1)
        return (new_d2, new_i), None

    init = (
        jnp.full((q.shape[0], k), big, dtype=q.dtype),
        jnp.full((q.shape[0], k), -1, dtype=jnp.int32),
    )
    starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    (d2, idx), _ = jax.lax.scan(body, init, (pts, valid, starts))
    idx = jnp.where(jnp.isinf(d2), -1, idx)
    return d2, idx


def _prepare(points, query, valid_points, valid_query, tile):
    points = jnp.asarray(points)
    query = points if query is None else jnp.asarray(query)
    # Mixed-precision callers (e.g. f64 poses transforming f32 clouds) must
    # not change the scan carry dtype mid-body.
    common = jnp.result_type(points.dtype, query.dtype)
    points = points.astype(common)
    query = query.astype(common)
    if valid_points is None:
        valid_points = jnp.ones(points.shape[0], dtype=bool)
    n = points.shape[0]
    pad_points = _pad_rows(points, tile, 0.0)
    pad_valid = _pad_rows(valid_points.astype(jnp.float32), tile, 0.0) > 0.5
    return pad_points, query, pad_valid, valid_query, n


# Queries are processed in fixed-size chunks so the (Q_chunk, TILE) distance
# buffer stays small regardless of cloud size; every chunk reuses one
# compiled program.
_QUERY_CHUNK = 8192


def _chunked(fn, query, *args, **kwargs):
    q = _pad_rows(query, _QUERY_CHUNK, 0.0)
    outs = [
        fn(q[i : i + _QUERY_CHUNK], *args, **kwargs)
        for i in range(0, q.shape[0], _QUERY_CHUNK)
    ]
    n = query.shape[0]
    if isinstance(outs[0], tuple):
        return tuple(jnp.concatenate(parts)[:n] for parts in zip(*outs))
    return jnp.concatenate(outs)[:n]


def nearest_neighbors(
    points: jax.Array,
    query: Optional[jax.Array] = None,
    k: int = 1,
    r: Optional[float] = None,
    valid_points: Optional[jax.Array] = None,
    valid_query: Optional[jax.Array] = None,
    tile: int = _TILE,
) -> Tuple[jax.Array, jax.Array]:
    """k nearest neighbors of ``query`` in ``points``.

    Mirrors ``nearest_neighbors(points, query, k, r)`` of the reference
    (nearest_neighbors.py:22-80): with ``r`` set, neighbors farther than
    ``r`` are dropped (index -1, distance inf), like cKDTree's
    ``distance_upper_bound``.

    :return: (dist (Q, k) ascending, ind (Q, k) int32 with -1 padding).
    """
    pad_points, query, pad_valid, valid_query, _ = _prepare(
        points, query, valid_points, valid_query, tile
    )
    d2, idx = _chunked(
        lambda q: _knn_tiled(pad_points, q, pad_valid, k, tile), query
    )
    return _finish_knn(d2, idx, r, valid_query)


def _finish_knn(d2, idx, r, valid_query):
    """Shared kNN postprocessing (single-device and sharded paths): radius
    cut, invalid-query masking, inf-safe sqrt."""
    if r is not None:
        within = d2 <= jnp.asarray(r, d2.dtype) ** 2
        idx = jnp.where(within, idx, -1)
        d2 = jnp.where(within, d2, jnp.inf)
    if valid_query is not None:
        idx = jnp.where(valid_query[:, None], idx, -1)
        d2 = jnp.where(valid_query[:, None], d2, jnp.inf)
    # XLA's sqrt(inf) can yield NaN; keep padding distances at inf explicitly.
    missing = jnp.isinf(d2)
    d = jnp.sqrt(jnp.where(missing, 0.0, d2))
    return jnp.where(missing, jnp.inf, d), idx


def nearest_neighbors_sharded(
    points: jax.Array,
    query: Optional[jax.Array] = None,
    k: int = 1,
    r: Optional[float] = None,
    valid_points: Optional[jax.Array] = None,
    valid_query: Optional[jax.Array] = None,
    mesh=None,
    tile: int = _TILE,
) -> Tuple[jax.Array, jax.Array]:
    """:func:`nearest_neighbors` with the QUERY axis sharded over a mesh.

    Each device scans its 1/D query slice against the replicated (N, 3)
    point table (O(N*3) floats — the (Q, k) outputs, the big tables, are
    born sharded and never replicate), the kNN analogue of
    ``grid_hash.grid_radius_neighbors_sharded``. Results are bitwise
    identical to the single-device scan.

    :param mesh: 1-D ``jax.sharding.Mesh``; its first axis shards queries.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    assert mesh is not None and len(mesh.axis_names) == 1, mesh
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    pad_points, q, pad_valid, valid_query, _ = _prepare(
        points, query, valid_points, valid_query, tile
    )
    nq = q.shape[0]
    if valid_query is None:
        valid_query = jnp.ones(nq, bool)
    # Pad so each device holds a whole number of query chunks.
    pad = (-nq) % (n_dev * _QUERY_CHUNK)
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, 3), q.dtype)])
        valid_query = jnp.concatenate([valid_query, jnp.zeros(pad, bool)])

    # Point tables ride as explicit replicated ARGUMENTS (closure constants
    # get literal-pooled into the program — see CLAUDE.md).
    def body(q_s, qv_s, pts, val):
        outs = [
            _knn_tiled(pts, q_s[i : i + _QUERY_CHUNK], val, k, tile)
            for i in range(0, q_s.shape[0], _QUERY_CHUNK)
        ]
        d2 = jnp.concatenate([o[0] for o in outs])
        idx = jnp.concatenate([o[1] for o in outs])
        return _finish_knn(d2, idx, r, qv_s)

    ps = PartitionSpec(axis)
    pr = PartitionSpec()
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(ps, ps, pr, pr),
        out_specs=(ps, ps),
        check_vma=False,
    )
    qs = jax.device_put(q, NamedSharding(mesh, ps))
    qvs = jax.device_put(valid_query, NamedSharding(mesh, ps))
    d, idx = sharded(qs, qvs, pad_points, pad_valid)
    return d[:nq], idx[:nq]


def radius_neighbors(
    points: jax.Array,
    query: Optional[jax.Array] = None,
    r: float = 1.0,
    k: int = 32,
    valid_points: Optional[jax.Array] = None,
    valid_query: Optional[jax.Array] = None,
    tile: int = _TILE,
) -> Tuple[jax.Array, jax.Array]:
    """Up to ``k`` nearest neighbors within radius ``r``.

    Equivalent to the reference's ``query_ball_point`` + pad-to-rectangular
    (nearest_neighbors.py:51, 69-73) whenever ``k`` >= the true maximum
    neighbor count (validate with :func:`neighbor_counts`); neighborhood
    *sets* then match exactly, which is what the downstream covariance needs.
    """
    return nearest_neighbors(
        points,
        query,
        k=k,
        r=r,
        valid_points=valid_points,
        valid_query=valid_query,
        tile=tile,
    )


@partial(jax.jit, static_argnames=("tile",))
def _counts_tiled(points, query, valid_points, r2, tile=_TILE):
    n = points.shape[0]
    n_tiles = n // tile
    pts = points.reshape(n_tiles, tile, 3)
    valid = valid_points.reshape(n_tiles, tile)

    def body(carry, inp):
        tile_pts, tile_valid = inp
        diff = query[:, None, :] - tile_pts[None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        inside = (d2 <= r2) & tile_valid[None, :]
        return carry + jnp.sum(inside, axis=1, dtype=jnp.int32), None

    counts, _ = jax.lax.scan(body, jnp.zeros(query.shape[0], jnp.int32), (pts, valid))
    return counts


def neighbor_counts(
    points: jax.Array,
    query: Optional[jax.Array] = None,
    r: float = 1.0,
    valid_points: Optional[jax.Array] = None,
    tile: int = _TILE,
) -> jax.Array:
    """Number of points within ``r`` of each query (for choosing static K)."""
    pad_points, query, pad_valid, _, _ = _prepare(
        points, query, valid_points, None, tile
    )
    r2 = jnp.asarray(r, pad_points.dtype) ** 2
    return _chunked(
        lambda q: _counts_tiled(pad_points, q, pad_valid, r2, tile), query
    )


def suggest_k_max(
    points,
    query=None,
    r: float = 1.0,
    valid_points=None,
    cap: Optional[int] = None,
    multiple: int = 8,
    quantile: float = 1.0,
) -> int:
    """Host-side helper: smallest K (rounded up to ``multiple``) that holds
    every radius neighborhood, optionally capped.

    The result is a static Python int suitable for shaping jitted
    neighborhoods.

    Default policy: exact (``quantile=1.0``, ``cap=None``) — every
    neighborhood fits, matching the reference's ragged ``query_ball_point``
    semantics (nearest_neighbors.py:69-73). For memory-bound runs where one
    dense blob would inflate every row's gather width, either pass ``cap``
    or size by a high ``quantile`` (e.g. 0.999) of the count distribution;
    both truncate the over-K neighborhoods (a documented parity deviation —
    see ``Config.nn_max_neighbors``).
    """
    from .grid_hash import GRID_NN_MIN_POINTS, grid_neighbor_counts

    if np.asarray(points).shape[0] >= GRID_NN_MIN_POINTS:
        # The O(N*Q) brute-force count is minutes beyond ~131k points; the
        # grid engine counts the same balls exactly (ops/grid_hash.py), and
        # auto-coarsens its cells past the int32 id ceiling (_grid_meta),
        # so no fallback is needed.
        counts = np.asarray(
            grid_neighbor_counts(points, query, r=r, valid_points=valid_points)
        )
    else:
        counts = np.asarray(neighbor_counts(points, query, r, valid_points))
    if counts.size == 0:
        k = 1
    elif quantile >= 1.0:
        k = int(counts.max())
    else:
        k = int(np.quantile(counts, quantile))
    k = max(k, 1)
    k = int(-(-k // multiple) * multiple)
    if cap is not None:
        k = min(k, cap)
    return k
