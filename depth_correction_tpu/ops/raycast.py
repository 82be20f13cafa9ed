"""Batched ray-triangle casting (Moller-Trumbore).

The lidar-simulation primitive behind the rendered-mesh dataset. The
reference composes pytorch3d perspective rasterizations
(reference: dataset.py:1073-1130); here rays intersect triangles directly —
closed-form intersection tests in COMPONENT form (every intermediate is a
(rays, faces) 2-D block — no trailing xyz dim to lane-pad on TPU), chunked
over BOTH rays and faces so peak memory is O(chunk * face_chunk)
regardless of mesh size.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["raycast_mesh"]


@partial(jax.jit, static_argnames=("chunk", "face_chunk"))
def raycast_mesh(
    origins: jax.Array,
    dirs: jax.Array,
    verts: jax.Array,
    faces: jax.Array,
    t_max: float = 1e9,
    chunk: int = 4096,
    face_chunk: int = 2048,
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

    # Face blocks: padded triangles are all-zero (e1 = e2 = 0 -> parallel
    # -> miss), so padding cannot produce phantom hits.
    f_total = faces.shape[0]
    fpad = (-f_total) % face_chunk
    v0p = jnp.pad(v0, ((0, fpad), (0, 0)))
    e1p = jnp.pad(e1, ((0, fpad), (0, 0)))
    e2p = jnp.pad(e2, ((0, fpad), (0, 0)))
    nf = v0p.shape[0] // face_chunk
    # Component-major (3, nf, FC): every hot intermediate below is a plain
    # (C, FC) block, never a trailing-3 tensor.
    v0c = v0p.T.reshape(3, nf, face_chunk)
    e1c = e1p.T.reshape(3, nf, face_chunk)
    e2c = e2p.T.reshape(3, nf, face_chunk)
    f_off = jnp.arange(nf, dtype=jnp.int32) * face_chunk

    r = origins.shape[0]
    pad = (-r) % chunk
    o = jnp.pad(origins, ((0, pad), (0, 0)))
    d = jnp.pad(dirs, ((0, pad), (0, 0)))
    n_chunks = o.shape[0] // chunk
    big = jnp.asarray(jnp.inf, origins.dtype)

    def one_chunk(args):
        oc, dc = args  # (C, 3)
        ox, oy, oz = oc[:, 0:1], oc[:, 1:2], oc[:, 2:3]  # (C, 1)
        dx, dy, dz = dc[:, 0:1], dc[:, 1:2], dc[:, 2:3]

        def face_block(carry, blk):
            t_best, tri_best = carry
            (v0x, v0y, v0z), (e1x, e1y, e1z), (e2x, e2y, e2z), off = blk
            # Moller-Trumbore over the (C, FC) block, component form.
            hx = dy * e2z[None] - dz * e2y[None]
            hy = dz * e2x[None] - dx * e2z[None]
            hz = dx * e2y[None] - dy * e2x[None]
            a = e1x[None] * hx + e1y[None] * hy + e1z[None] * hz
            parallel = jnp.abs(a) < eps
            f = 1.0 / jnp.where(parallel, 1.0, a)
            sx, sy, sz = ox - v0x[None], oy - v0y[None], oz - v0z[None]
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z[None] - sz * e1y[None]
            qy = sz * e1x[None] - sx * e1z[None]
            qz = sx * e1y[None] - sy * e1x[None]
            v = f * (dx * qx + dy * qy + dz * qz)
            t = f * (e2x[None] * qx + e2y[None] * qy + e2z[None] * qz)
            ok = (
                ~parallel
                & (u >= -eps)
                & (v >= -eps)
                & (u + v <= 1.0 + eps)
                & (t > eps)
                & (t <= t_max)
            )
            t = jnp.where(ok, t, big)
            best = jnp.argmin(t, axis=-1)  # (C,)
            tb = jnp.take_along_axis(t, best[:, None], axis=-1)[:, 0]
            trib = jnp.where(jnp.isinf(tb), -1, best + off).astype(jnp.int32)
            # Strict '<' keeps the FIRST (lowest-index) face on exact ties,
            # matching the unchunked argmin.
            better = tb < t_best
            return (
                jnp.where(better, tb, t_best),
                jnp.where(better, trib, tri_best),
            ), None

        init = (
            jnp.full((oc.shape[0],), big, origins.dtype),
            jnp.full((oc.shape[0],), -1, jnp.int32),
        )
        (t_best, tri_best), _ = jax.lax.scan(
            face_block,
            init,
            (
                (v0c[0], v0c[1], v0c[2]),
                (e1c[0], e1c[1], e1c[2]),
                (e2c[0], e2c[1], e2c[2]),
                f_off,
            ),
        )
        return t_best, tri_best

    ts, tris = jax.lax.map(
        one_chunk,
        (o.reshape(n_chunks, chunk, 3), d.reshape(n_chunks, chunk, 3)),
    )
    return ts.reshape(-1)[:r], tris.reshape(-1)[:r]
