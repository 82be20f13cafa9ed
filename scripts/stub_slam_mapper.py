"""Minimal external-SLAM stand-in for the subprocess parity harness.

Implements the contract `slam_eval.run_external_slam` drives (the role the
reference delegates to the norlab_icp_mapper roslaunch pipeline,
reference: src/depth_correction/eval.py:234-259): read per-scan npz exports
(corrected points/normals + odometry prior pose) from an input directory,
estimate world poses, write them as a robot_data-schema CSV.

This stub "estimates" by refining each odometry prior with one rigid
point-to-point Kabsch alignment of the scan against the previous scan
placed at its estimate (a 1-iteration ICP with nearest-point matching in
numpy — deliberately dependency-free). Pass ``--drift t`` to instead apply
a known per-scan translation drift to the priors, which integration tests
use to verify the read-back path end to end.

Usage:
    python stub_slam_mapper.py <input_dir> <poses_csv> [--drift T]
"""
import argparse
import glob
import os
import sys

import numpy as np


def read_scans(input_dir):
    files = sorted(glob.glob(os.path.join(input_dir, "scan_*.npz")))
    scans = []
    for f in files:
        data = np.load(f)
        scans.append((data["points"], data["prior"]))
    return scans


def kabsch(p, q):
    """Rigid transform aligning points p onto q (rotation + translation)."""
    cp, cq = p.mean(0), q.mean(0)
    H = (p - cp).T @ (q - cq)
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    R = Vt.T @ np.diag([1.0, 1.0, d]) @ U.T
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = cq - R @ cp
    return T


def refine(prev_world, cur_local, prior):
    """One nearest-point Kabsch refinement of the prior pose."""
    cur = cur_local @ prior[:3, :3].T + prior[:3, 3]
    # Subsample for the O(N*M) nearest-point search.
    idx = np.linspace(0, len(cur) - 1, min(len(cur), 500)).astype(int)
    cur_s = cur[idx]
    d2 = ((cur_s[:, None, :] - prev_world[None]) ** 2).sum(-1)
    nn = prev_world[d2.argmin(1)]
    keep = d2.min(1) <= np.quantile(d2.min(1), 0.8)
    delta = kabsch(cur_s[keep], nn[keep])
    return delta @ prior


def write_poses_csv(poses, path):
    with open(path, "w") as f:
        f.write(
            "poseId, timestamp, T00, T01, T02, T03, T10, T11, T12, T13, "
            "T20, T21, T22, T23, T30, T31, T32, T33\n"
        )
        for i, T in enumerate(poses):
            f.write(
                "%d, %.9f, %s\n"
                % (i, float(i), ", ".join("%.9f" % x for x in T.ravel()))
            )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("input_dir")
    ap.add_argument("poses_csv")
    ap.add_argument("--drift", type=float, default=None,
                    help="skip ICP; apply this +x translation per scan index")
    args = ap.parse_args(argv)

    scans = read_scans(args.input_dir)
    if not scans:
        print("no scans in %s" % args.input_dir, file=sys.stderr)
        return 1
    poses = []
    if args.drift is not None:
        for i, (_, prior) in enumerate(scans):
            D = np.eye(4)
            D[0, 3] = args.drift * i
            poses.append(D @ prior)
    else:
        poses.append(scans[0][1])
        prev_world = scans[0][0] @ poses[0][:3, :3].T + poses[0][:3, 3]
        for pts, prior in scans[1:]:
            T = refine(prev_world, pts, prior)
            poses.append(T)
            prev_world = pts @ T[:3, :3].T + T[:3, 3]
    write_poses_csv(poses, args.poses_csv)
    return 0


if __name__ == "__main__":
    sys.exit(main())
