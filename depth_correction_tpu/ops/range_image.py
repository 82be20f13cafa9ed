"""Range-image projection.

Equivalent of the reference's depth-denoising projection utilities
(reference: scripts/depth_denoising:18-23, 44-91): project a lidar scan
into an (H, W) range image over azimuth x elevation bins, and unproject
back to rays. Fixed shapes; scatter-min resolves bin collisions.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["project_range_image", "unproject_range_image"]


@partial(jax.jit, static_argnames=("height", "width"))
def project_range_image(
    points: jax.Array,
    valid: jax.Array,
    height: int = 128,
    width: int = 1024,
    fov_up: float = 0.3927,  # 22.5 deg
    fov_down: float = -0.3927,
) -> Tuple[jax.Array, jax.Array]:
    """Project (N, 3) sensor-frame points to an (H, W) range image.

    Azimuth spans [-pi, pi) across width; elevation spans
    [fov_down, fov_up] across height (row 0 = fov_up, lidar convention).
    Collisions keep the closest return (scatter-min).

    :return: (range image (H, W), hit mask (H, W)); empty bins hold 0.
    """
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    depth = jnp.linalg.norm(points, axis=-1)
    ok = valid & (depth > 1e-6)

    azimuth = jnp.arctan2(y, x)  # [-pi, pi)
    elevation = jnp.arcsin(jnp.clip(z / jnp.maximum(depth, 1e-9), -1.0, 1.0))

    u = (azimuth + jnp.pi) / (2.0 * jnp.pi) * width
    v = (fov_up - elevation) / (fov_up - fov_down) * height
    ui = jnp.clip(u.astype(jnp.int32), 0, width - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, height - 1)
    # Inclusive bottom edge: a beam at EXACTLY fov_down projects to
    # v == height and belongs in row height-1 (vi clips it there), like
    # the top edge v == 0 stays in row 0 — otherwise the common
    # linspace(fov_down, fov_up, H) beam layout loses its whole bottom row.
    inside = ok & (v >= 0) & (v <= height)

    flat = vi * width + ui
    big = jnp.asarray(jnp.inf, depth.dtype)
    img = jnp.full((height * width,), big, depth.dtype)
    img = img.at[jnp.where(inside, flat, 0)].min(jnp.where(inside, depth, big))
    img = img.reshape(height, width)
    hit = jnp.isfinite(img)
    return jnp.where(hit, img, 0.0), hit


@partial(jax.jit, static_argnames=("height", "width"))
def unproject_range_image(
    image: jax.Array,
    hit: jax.Array,
    height: int = 128,
    width: int = 1024,
    fov_up: float = 0.3927,
    fov_down: float = -0.3927,
) -> Tuple[jax.Array, jax.Array]:
    """Inverse of :func:`project_range_image` at bin centers.

    :return: ((H*W, 3) points, (H*W,) valid mask).
    """
    vi, ui = jnp.meshgrid(
        jnp.arange(height, dtype=image.dtype),
        jnp.arange(width, dtype=image.dtype),
        indexing="ij",
    )
    azimuth = (ui + 0.5) / width * 2.0 * jnp.pi - jnp.pi
    elevation = fov_up - (vi + 0.5) / height * (fov_up - fov_down)
    d = image
    cos_e = jnp.cos(elevation)
    pts = jnp.stack(
        [
            d * cos_e * jnp.cos(azimuth),
            d * cos_e * jnp.sin(azimuth),
            d * jnp.sin(elevation),
        ],
        axis=-1,
    )
    return pts.reshape(-1, 3), hit.reshape(-1)
