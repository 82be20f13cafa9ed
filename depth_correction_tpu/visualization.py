"""Visualization helpers (host-side, optional matplotlib).

Re-design of the reference's plotting utilities (reference: src/depth_correction/
visualization.py:9-74, utils.py:23-51): incidence-angle histograms and
colormapping. 3-D interactive viewing (the reference uses Open3D) is out of
scope for the core; clouds export to structured arrays for external viewers.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = ["map_colors", "visualize_incidence_angles", "plot_model_curve"]


def map_colors(values, colormap=None, min_value=None, max_value=None):
    """Scale values to [0, 1] and map through a colormap
    (reference: utils.py:23-51). ``colormap`` may be a matplotlib colormap
    or an (C, 3) array of anchor colors (2 anchors interpolate).
    """
    values = np.asarray(values, dtype=np.float64).ravel()
    lo = np.nanmin(values) if min_value is None else min_value
    hi = np.nanmax(values) if max_value is None else max_value
    scale = hi - lo
    a = (values - lo) / scale if scale > 0 else values - lo
    a = np.clip(a, 0.0, 1.0)
    if colormap is None:
        from matplotlib import cm

        colormap = cm.gist_rainbow
    if callable(colormap):
        return np.asarray(colormap(a))[:, :3]
    colormap = np.asarray(colormap)
    if len(colormap) == 2:
        return (1 - a[:, None]) * colormap[0] + a[:, None] * colormap[1]
    idx = np.round(a * (len(colormap) - 1)).astype(int)
    return colormap[idx]


def visualize_incidence_angles(clouds: Sequence, bins: int = 36, ax=None,
                               labels: Optional[Sequence[str]] = None,
                               show: bool = False):
    """Histogram grid of incidence angles per cloud
    (reference: visualization.py:9-48)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    n = len(clouds)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 3), squeeze=False)
    for i, cloud in enumerate(clouds):
        inc = np.asarray(cloud.inc_angles).ravel()
        if getattr(cloud, "valid", None) is not None:
            inc = inc[np.asarray(cloud.valid).ravel()]
        axes[0, i].hist(np.degrees(inc), bins=bins, range=(0, 90))
        axes[0, i].set_xlabel("Incidence angle [deg]")
        if labels:
            axes[0, i].set_title(labels[i])
    fig.tight_layout()
    if show:  # pragma: no cover - interactive
        plt.show()
    return fig


def plot_model_curve(model, max_angle_deg: float = 89.0, depth: float = 1.0,
                     n: int = 100, ax=None):
    """Corrected depth vs incidence angle for a model
    (reference: model.py:100-109)."""
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    angles = np.linspace(0.0, np.radians(max_angle_deg), n)
    corrected = np.asarray(
        model.correct_depth(jnp.full(n, depth), jnp.asarray(angles))
    )
    if ax is None:
        _, ax = plt.subplots()
    ax.plot(np.degrees(angles), corrected, label=str(model))
    ax.set_xlabel("Incidence Angle [deg]")
    ax.set_ylabel("Depth [m]")
    ax.legend()
    return ax
