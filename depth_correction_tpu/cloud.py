"""Immutable point-cloud pytree.

TPU-native re-design of the reference's mutable ``DepthCloud``
(reference: src/depth_correction/depth_cloud.py:18-93). Same core
parameterization — points = vps + depth * dirs, so per-point depth is the
differentiable scalar the correction model edits (depth_cloud.py:122-124) —
but as a frozen dataclass of fixed-shape SoA arrays:

- no lazy mutation: derived features are produced by pure functions
  (see :mod:`depth_correction_tpu.ops.features`) and threaded back in with
  ``replace``; a cloud value is a snapshot by construction,
- no boolean fancy indexing: ``valid`` marks padding, ``mask`` marks the
  trainable region; filters AND masks instead of shrinking arrays,
- concatenation pads to a common width, keeping shapes static per trace.

Registered as a pytree, so Clouds pass through jit/grad/vmap/shard_map.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .ops.se3 import transform_points

__all__ = ["Cloud"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Cloud:
    """Fixed-shape depth cloud: points = vps + depth[..., None] * dirs.

    All arrays share the leading point axis N (optionally with leading batch
    axes). Optional fields are ``None`` until computed.
    """

    vps: jax.Array  # (..., N, 3) viewpoints
    dirs: jax.Array  # (..., N, 3) unit view directions
    depth: jax.Array  # (..., N) depths
    valid: jax.Array  # (..., N) bool, False = padding
    # Derived / optional.
    points: Optional[jax.Array] = None  # (..., N, 3)
    normals: Optional[jax.Array] = None  # (..., N, 3)
    inc_angles: Optional[jax.Array] = None  # (..., N)
    mask: Optional[jax.Array] = None  # (..., N) bool trainable region
    mean: Optional[jax.Array] = None  # (..., N, 3)
    cov: Optional[jax.Array] = None  # (..., N, 3, 3)
    eigvals: Optional[jax.Array] = None  # (..., N, 3) ascending
    eigvecs: Optional[jax.Array] = None  # (..., N, 3, 3) columns
    trace: Optional[jax.Array] = None  # (..., N)
    loss: Optional[jax.Array] = None  # (..., N)

    # ------------------------------------------------------------------
    @property
    def size(self) -> int:
        return self.depth.shape[-1]

    def __len__(self) -> int:
        return self.size

    def replace(self, **kwargs) -> "Cloud":
        return dataclasses.replace(self, **kwargs)

    # ------------------------------------------------------------------
    def to_points(self) -> jax.Array:
        """points = vps + depth * dirs (reference: depth_cloud.py:122-124)."""
        return self.vps + self.depth[..., None] * self.dirs

    def with_points(self) -> "Cloud":
        return self.replace(points=self.to_points())

    def get_points(self) -> jax.Array:
        return self.points if self.points is not None else self.to_points()

    # ------------------------------------------------------------------
    def transform(self, T: jax.Array) -> "Cloud":
        """Rigid transform of vps/dirs (+normals); depth is invariant
        (reference: depth_cloud.py:135-152). Derived geometry is dropped.
        """
        from .ops.se3 import PPREC

        # PPREC: the TPU's default bf16 matmul passes would quantize the
        # rotated positions by ~1 cm at 20 m (see ops/se3.py).
        R = T[..., :3, :3]
        Rt = jnp.swapaxes(R, -1, -2)
        t = T[..., :3, 3]
        vps = jnp.matmul(self.vps, Rt, precision=PPREC) + t[..., None, :]
        dirs = jnp.matmul(self.dirs, Rt, precision=PPREC)
        normals = (
            jnp.matmul(self.normals, Rt, precision=PPREC)
            if self.normals is not None
            else None
        )
        return Cloud(
            vps=vps,
            dirs=dirs,
            depth=self.depth,
            valid=self.valid,
            normals=normals,
            inc_angles=self.inc_angles,
            mask=self.mask,
        )

    # ------------------------------------------------------------------
    def astype(self, dtype) -> "Cloud":
        def cast(x):
            if x is not None and jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
                return jnp.asarray(x, dtype)
            return x

        return jax.tree_util.tree_map(cast, self)

    # ------------------------------------------------------------------
    @staticmethod
    def from_points(
        pts,
        vps=None,
        normals=None,
        valid=None,
        dtype=None,
        pad_to: Optional[int] = None,
    ) -> "Cloud":
        """Build a cloud from (N, 3) points and optional viewpoints
        (reference: depth_cloud.py:592-638), optionally padding to a static
        size. Zero-depth points get a zero direction and stay valid, like
        the reference's guarded normalization (depth_cloud.py:626-627).
        """
        pts = jnp.asarray(pts, dtype=dtype)
        n = pts.shape[0]
        vps = jnp.zeros_like(pts) if vps is None else jnp.asarray(vps, dtype=pts.dtype)
        if vps.shape != pts.shape:
            vps = jnp.broadcast_to(vps, pts.shape)
        rays = pts - vps
        depth = jnp.linalg.norm(rays, axis=-1)
        dirs = rays / jnp.maximum(depth[..., None], 1e-20)
        dirs = jnp.where(depth[..., None] > 0.0, dirs, 0.0)
        if valid is None:
            valid = jnp.ones(n, dtype=bool)
        else:
            valid = jnp.asarray(valid, dtype=bool)
        if normals is not None:
            normals = jnp.asarray(normals, dtype=pts.dtype)

        cloud = Cloud(vps=vps, dirs=dirs, depth=depth, valid=valid, normals=normals)
        if pad_to is not None and pad_to != n:
            cloud = cloud.pad(pad_to)
        return cloud

    @staticmethod
    def from_structured_array(arr: np.ndarray, dtype=None, pad_to=None) -> "Cloud":
        """From a numpy structured array with x/y/z (+vp_*, +normal_*)
        fields — the dataset interchange format (depth_cloud.py:577-590).
        """
        from numpy.lib.recfunctions import structured_to_unstructured as s2u

        pts = s2u(arr[["x", "y", "z"]], dtype=dtype)
        names = arr.dtype.names
        vps = s2u(arr[["vp_x", "vp_y", "vp_z"]], dtype=dtype) if "vp_x" in names else None
        normals = (
            s2u(arr[["normal_x", "normal_y", "normal_z"]], dtype=dtype)
            if "normal_x" in names
            else None
        )
        return Cloud.from_points(pts, vps=vps, normals=normals, dtype=dtype, pad_to=pad_to)

    # ------------------------------------------------------------------
    def pad(self, n: int) -> "Cloud":
        """Pad the point axis to static size ``n`` (invalid slots)."""
        cur = self.size
        if n < cur:
            raise ValueError("pad target %d < current size %d" % (n, cur))
        if n == cur:
            return self
        extra = n - cur

        def pad_field(x, fill):
            if x is None:
                return None
            widths = [(0, 0)] * x.ndim
            axis = self.depth.ndim - 1  # the point axis
            widths[axis] = (0, extra)
            return jnp.pad(x, widths, constant_values=fill)

        return Cloud(
            vps=pad_field(self.vps, 0.0),
            dirs=pad_field(self.dirs, 0.0),
            depth=pad_field(self.depth, 0.0),
            valid=pad_field(self.valid, False),
            points=pad_field(self.points, 0.0),
            normals=pad_field(self.normals, 0.0),
            inc_angles=pad_field(self.inc_angles, 0.0),
            mask=pad_field(self.mask, False),
            mean=pad_field(self.mean, 0.0),
            cov=pad_field(self.cov, 0.0),
            eigvals=pad_field(self.eigvals, 0.0),
            eigvecs=pad_field(self.eigvecs, 0.0),
            trace=pad_field(self.trace, 0.0),
            loss=pad_field(self.loss, 0.0),
        )

    def compact(self) -> "Cloud":
        """Host-side: drop invalid (padding) points. Not jittable."""
        keep = np.asarray(self.valid)

        def take(x):
            return None if x is None else jnp.asarray(np.asarray(x)[keep])

        return Cloud(
            vps=take(self.vps),
            dirs=take(self.dirs),
            depth=take(self.depth),
            valid=take(self.valid),
            points=take(self.points),
            normals=take(self.normals),
            inc_angles=take(self.inc_angles),
            mask=take(self.mask),
            mean=take(self.mean),
            cov=take(self.cov),
            eigvals=take(self.eigvals),
            eigvecs=take(self.eigvecs),
            trace=take(self.trace),
            loss=take(self.loss),
        )

    def keep(self, mask) -> "Cloud":
        """Host-side boolean filtering (reference: cloud[mask]). Not jittable."""
        keep = np.asarray(mask)

        def take(x):
            return None if x is None else jnp.asarray(np.asarray(x)[keep])

        return dataclasses.replace(
            self,
            **{
                f.name: take(getattr(self, f.name))
                for f in dataclasses.fields(self)
            },
        )

    # ------------------------------------------------------------------
    @staticmethod
    def concatenate(clouds: Sequence["Cloud"]) -> "Cloud":
        """Concatenate source fields along the point axis
        (reference: depth_cloud.py:536-575). Optional fields are kept only
        when present in every cloud.
        """
        def cat_axis(name, axis):
            xs = [getattr(c, name) for c in clouds]
            if any(x is None for x in xs):
                return None
            return jnp.concatenate(xs, axis=axis)

        return Cloud(
            vps=cat_axis("vps", 0),
            dirs=cat_axis("dirs", 0),
            depth=cat_axis("depth", 0),
            valid=cat_axis("valid", 0),
            points=cat_axis("points", 0),
            normals=cat_axis("normals", 0),
            inc_angles=cat_axis("inc_angles", 0),
            mask=cat_axis("mask", 0),
            mean=cat_axis("mean", 0),
            cov=cat_axis("cov", 0),
            eigvals=cat_axis("eigvals", 0),
            eigvecs=cat_axis("eigvecs", 0),
            trace=cat_axis("trace", 0),
            loss=cat_axis("loss", 0),
        )
