"""Neighbor-engine scaling: grid-hash vs tiled scan vs host scipy cKDTree.

Establishment-at-scale check (VERDICT #6): on-device radius search must beat
the host KD-tree at >= 500k points. Run on the TPU: python scripts/bench_knn.py
"""
from __future__ import annotations

import sys
import time

import numpy as np


def timeit(fn, reps=3):
    def mat(out):
        # Host read of ONE result element (device-side slice first!):
        # block_until_ready can return before execution through the axon
        # tunnel (phantom timings), while np.asarray(full_array) would drag
        # the whole 200 MB result through the tunnel (~10 s of pure
        # transfer that is NOT establishment time).
        return int(out[1][0, 0])

    out = fn()
    mat(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
        mat(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from depth_correction_tpu.ops.grid_hash import grid_radius_neighbors
    from depth_correction_tpu.ops.knn import radius_neighbors

    rng = np.random.default_rng(0)
    for n in (131072, 524288, 1048576):
        # ~Indoor-map density after grid filtering: box scaled so the
        # expected per-ball neighbor count is ~25 regardless of N.
        side = (n * (4.0 / 3.0) * np.pi / 25.0) ** (1.0 / 3.0) * 0.25
        pts = rng.uniform(0, side, (n, 3)).astype(np.float32)
        r, k = 0.25, 48
        dev = jnp.asarray(pts)

        t_grid, (dg, ig) = timeit(lambda: grid_radius_neighbors(dev, r=r, k=k))
        row = "N=%8d  grid %8.1f ms" % (n, t_grid * 1e3)
        print(row, flush=True)

        if n <= 131072:  # the O(N*Q) scan is minutes beyond this
            t_scan, (dt, it) = timeit(
                lambda: radius_neighbors(dev, r=r, k=k), reps=1
            )
            row += "  scan %8.1f ms" % (t_scan * 1e3)
            same = (
                np.sort(np.asarray(ig), axis=1) == np.sort(np.asarray(it), axis=1)
            ).all()
            row += "  sets_equal=%s" % same

        from scipy.spatial import cKDTree

        t0 = time.perf_counter()
        tree = cKDTree(pts)
        balls = tree.query_ball_point(pts[: min(n, n)], r, workers=-1)
        t_scipy = time.perf_counter() - t0
        row += "  scipy %8.1f ms" % (t_scipy * 1e3)
        counts = np.array([len(b) for b in balls])
        row += "  (mean |ball| %.1f, max %d)" % (counts.mean(), counts.max())
        print(row)


if __name__ == "__main__":
    main()
