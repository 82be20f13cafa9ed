"""Batched ray-triangle casting (Moller-Trumbore).

The lidar-simulation primitive behind the rendered-mesh dataset. The
reference composes pytorch3d perspective rasterizations
(reference: dataset.py:1073-1130); here rays intersect triangles directly —
an (R, F) broadcast of closed-form intersection tests that vectorizes on
the VPU, chunked over rays to bound memory.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["raycast_mesh"]


@partial(jax.jit, static_argnames=("chunk",))
def raycast_mesh(
    origins: jax.Array,
    dirs: jax.Array,
    verts: jax.Array,
    faces: jax.Array,
    t_max: float = 1e9,
    chunk: int = 8192,
):
    """Closest-hit ray casting against a triangle mesh.

    :param origins: (R, 3) ray origins.
    :param dirs: (R, 3) unit ray directions.
    :param verts: (V, 3) mesh vertices.
    :param faces: (F, 3) int triangle indices.
    :return: (t (R,) hit distances (inf = miss), tri (R,) triangle index
        (-1 = miss)).
    """
    tri = verts[faces]  # (F, 3, 3)
    v0 = tri[:, 0]
    e1 = tri[:, 1] - v0  # (F, 3)
    e2 = tri[:, 2] - v0
    eps = 1e-9

    r = origins.shape[0]
    pad = (-r) % chunk
    o = jnp.pad(origins, ((0, pad), (0, 0)))
    d = jnp.pad(dirs, ((0, pad), (0, 0)))
    n_chunks = o.shape[0] // chunk

    def one_chunk(args):
        oc, dc = args  # (C, 3)
        # Moller-Trumbore, broadcast (C, F).
        h = jnp.cross(dc[:, None, :], e2[None, :, :])  # (C, F, 3)
        a = jnp.sum(e1[None] * h, axis=-1)  # (C, F)
        parallel = jnp.abs(a) < eps
        f = 1.0 / jnp.where(parallel, 1.0, a)
        s = oc[:, None, :] - v0[None, :, :]  # (C, F, 3)
        u = f * jnp.sum(s * h, axis=-1)
        q = jnp.cross(s, e1[None, :, :])
        v = f * jnp.sum(dc[:, None, :] * q, axis=-1)
        t = f * jnp.sum(e2[None] * q, axis=-1)
        ok = (
            ~parallel
            & (u >= -eps)
            & (v >= -eps)
            & (u + v <= 1.0 + eps)
            & (t > eps)
            & (t <= t_max)
        )
        t = jnp.where(ok, t, jnp.inf)
        best = jnp.argmin(t, axis=-1)  # (C,)
        t_best = jnp.take_along_axis(t, best[:, None], axis=-1)[:, 0]
        tri_best = jnp.where(jnp.isinf(t_best), -1, best)
        return t_best, tri_best

    ts, tris = jax.lax.map(
        one_chunk,
        (o.reshape(n_chunks, chunk, 3), d.reshape(n_chunks, chunk, 3)),
    )
    return ts.reshape(-1)[:r], tris.reshape(-1)[:r]
