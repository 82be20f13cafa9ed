"""Rigid alignment of two trajectories (SLAM path vs tracker path).

ROS-free reproduction of the reference's paths-alignment tool
(reference: scripts/paths_alignment:166-233): estimate the SE(3) transform
aligning a source path to a target path with Kabsch/Umeyama
(``absolute_orientation``), optionally iterating nearest-point
correspondences when the paths are unsynchronized (small trajectory ICP),
and report pre/post residuals.

Inputs: two CSVs of positions (rows ``x y z`` or ``t x y z``); without
arguments a synthetic demo runs.

Usage: python scripts/paths_alignment.py [--source CSV --target CSV]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def align_paths(source: np.ndarray, target: np.ndarray, iters: int = 10,
                paired: bool = None):
    """SE(3) aligning ``source`` onto ``target``.

    :param paired: rows correspond 1:1 (default: True when equal length).
        Unpaired paths iterate nearest-neighbor correspondences.
    :return: (T (4, 4), rms_before, rms_after).
    """
    import jax.numpy as jnp

    from depth_correction_tpu.ops.se3 import absolute_orientation

    source = np.asarray(source, np.float64)
    target = np.asarray(target, np.float64)
    if paired is None:
        paired = len(source) == len(target)

    def rms(a, b):
        return float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=1))))

    if paired:
        T = np.asarray(
            absolute_orientation(jnp.asarray(source.T), jnp.asarray(target.T))
        )
        aligned = source @ T[:3, :3].T + T[:3, 3]
        return T, rms(source, target), rms(aligned, target)

    from scipy.spatial import cKDTree

    tree = cKDTree(target)
    T = np.eye(4)
    cur = source.copy()
    before = float(np.sqrt(np.mean(tree.query(cur, k=1, workers=-1)[0] ** 2)))
    for _ in range(iters):
        d, idx = tree.query(cur, k=1, workers=-1)
        T_step = np.asarray(
            absolute_orientation(jnp.asarray(cur.T), jnp.asarray(target[idx].T))
        )
        cur = cur @ T_step[:3, :3].T + T_step[:3, 3]
        T = T_step @ T
    after = float(np.sqrt(np.mean(tree.query(cur, k=1, workers=-1)[0] ** 2)))
    return T, before, after


def _load(path):
    rows = np.atleast_2d(np.genfromtxt(path))
    return rows[:, -3:]  # x y z (skip a leading time column if present)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", default=None)
    p.add_argument("--target", default=None)
    args = p.parse_args(argv)

    if args.source and args.target:
        source, target = _load(args.source), _load(args.target)
    else:
        print("no input CSVs; running the synthetic demo")
        rng = np.random.default_rng(0)
        t = np.linspace(0, 4 * np.pi, 200)
        target = np.stack([np.cos(t) * 3, np.sin(t) * 3, 0.2 * t], axis=1)
        ang = 0.7
        R = np.asarray(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0],
             [0, 0, 1]]
        )
        source = (target - [1.0, 2.0, 0.5]) @ R  # misaligned copy
        source += 0.01 * rng.normal(size=source.shape)

    T, before, after = align_paths(source, target)
    print("alignment transform:\n", np.array_str(T, precision=4))
    print("RMS residual: %.4g m -> %.4g m" % (before, after))
    return T, before, after


if __name__ == "__main__":
    main()
