"""Decompose grid-hash establishment time at 1M points: build (sort +
starts) vs query chunks. Phantom-safe timing (float() materialization)."""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from depth_correction_tpu.ops import grid_hash as gh

    rng = np.random.default_rng(0)
    n = 1048576
    side = (n * (4.0 / 3.0) * np.pi / 25.0) ** (1.0 / 3.0) * 0.25
    pts = jnp.asarray(rng.uniform(0, side, (n, 3)).astype(np.float32))
    r, k = 0.25, 48

    def mat(x):
        # One element via a device-side slice: a full np.asarray would pull
        # hundreds of MB through the tunnel and swamp the measurement.
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(leaf.ravel()[0])

    # Warm everything once.
    d, i = gh.grid_radius_neighbors(pts, r=r, k=k)
    mat(i)

    t0 = time.perf_counter()
    grid, width = gh._build_grid(pts, None, r, None, None)
    mat(grid[2])  # ids_sorted
    t_build = time.perf_counter() - t0
    print("build (meta+sort+starts+win): %.0f ms  width=%d" % (t_build * 1e3, width))

    t0 = time.perf_counter()
    outs = gh._run_chunks(grid, width, pts, None, None, r, k)
    mat(outs[-1][1])
    t_query = time.perf_counter() - t0
    print("query chunks:                 %.0f ms" % (t_query * 1e3))

    t0 = time.perf_counter()
    d, i = gh.grid_radius_neighbors(pts, r=r, k=k)
    mat(i)
    print("total end-to-end:             %.0f ms" % ((time.perf_counter() - t0) * 1e3))

    # Counts-only mode (k=0) isolates candidate testing from top_k.
    t0 = time.perf_counter()
    outs = gh._run_chunks(grid, width, pts, None, None, r, 0)
    mat(outs[-1])
    print("query counts-only (no top_k): %.0f ms" % ((time.perf_counter() - t0) * 1e3))


if __name__ == "__main__":
    main()
