"""npz <-> norlab_icp_mapper bridge for the external-SLAM runner.

Speaks the ``run_external_slam`` contract (depth_correction_tpu/slam_eval.py):
reads ``scan_%04d.npz`` files (``points`` / ``normals`` in the sensor
frame, ``prior`` odometry pose) from ``--input-dir``, feeds each scan to
``norlab_icp_mapper`` with the prior as the pose guess, and writes the
mapper's estimated poses to ``--poses-csv`` in the robot_data schema the
framework reads back.

Requires the norlab stack in THIS interpreter's environment:
``pypointmatcher`` (libpointmatcher Python bindings) and the
``norlab_icp_mapper`` Python bindings — the same components the reference
launches through ROS (reference: launch/slam.launch:42-80). Build the
command line (and the ICP/filter/mapper YAMLs) with
``depth_correction_tpu.slam_norlab.norlab_slam_command``.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--icp-config", required=True)
    p.add_argument("--input-filters-config", required=True)
    p.add_argument("--mapper-config", required=True)
    p.add_argument("--input-dir", required=True)
    p.add_argument("--poses-csv", required=True)
    return p.parse_args(argv)


def read_mapper_params(path: str) -> dict:
    """Parse the flat mapper.yaml written by slam_norlab (scalars only)."""
    params = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or ":" not in line:
                continue
            k, v = line.split(":", 1)
            v = v.strip()
            if v in ("true", "false"):
                params[k.strip()] = v == "true"
            else:
                try:
                    params[k.strip()] = float(v) if "." in v else int(v)
                except ValueError:
                    params[k.strip()] = v
    return params


def make_datapoints(pm, points: np.ndarray, normals: np.ndarray):
    """(N, 3) arrays -> a libpointmatcher DataPoints with normals."""
    dp = pm.DataPoints()
    n = points.shape[0]
    feat_labels = pm.DataPoints.Labels()
    for name in ("x", "y", "z", "pad"):
        feat_labels.append(pm.DataPoints.Label(name, 1))
    desc_labels = pm.DataPoints.Labels()
    desc_labels.append(pm.DataPoints.Label("normals", 3))
    feats = np.ones((4, n))
    feats[:3] = points.T
    return pm.DataPoints(feats, feat_labels, normals.T, desc_labels)


def run(args) -> int:
    try:
        from pypointmatcher import pointmatcher
        import norlab_icp_mapper
    except ImportError as e:  # pragma: no cover - depends on target env
        print(
            "norlab_mapper_driver: missing the norlab stack (%s).\n"
            "Install pypointmatcher + norlab_icp_mapper Python bindings in "
            "this interpreter, or point cfg.slam_command at an environment "
            "that has them." % e,
            file=sys.stderr,
        )
        return 2

    pm = pointmatcher.PointMatcher
    params = read_mapper_params(args.mapper_config)
    mapper = norlab_icp_mapper.Mapper(
        args.icp_config,
        args.input_filters_config,
        params.get("map_update_condition", "overlap"),
        params.get("map_update_overlap", 0.9),
        params.get("map_update_delay", 0.0),
        params.get("map_update_distance", 0.0),
        params.get("min_dist_new_point", 0.1),
        params.get("sensor_max_range", 25.0),
        params.get("prior_dynamic", 0.6),
        params.get("threshold_dynamic", 0.9),
        params.get("beam_half_angle", 0.01),
        params.get("epsilon_a", 0.01),
        params.get("epsilon_d", 0.01),
        params.get("alpha", 0.8),
        params.get("beta", 0.99),
        params.get("is_3D", True),
        params.get("is_online", True),
        params.get("compute_prob_dynamic", True),
        params.get("is_mapping", True),
        params.get("save_map_cells_on_hard_drive", False),
    )

    scans = sorted(glob.glob(os.path.join(args.input_dir, "scan_*.npz")))
    if not scans:
        print("no scan_*.npz in %s" % args.input_dir, file=sys.stderr)
        return 1
    ids, stamps, est = [], [], []
    for i, path in enumerate(scans):
        with np.load(path) as z:
            pts = np.asarray(z["points"], np.float64)
            normals = (
                np.asarray(z["normals"], np.float64)
                if "normals" in z
                else np.zeros_like(pts)
            )
            prior = np.asarray(z["prior"], np.float64)
        dp = make_datapoints(pm, pts, normals)
        mapper.processInput(dp, prior, float(i))
        est.append(np.asarray(mapper.getPose(), np.float64))
        ids.append(i)
        stamps.append(float(i))

    write_poses_csv(args.poses_csv, ids, stamps, est)
    return 0


def write_poses_csv(path, ids, stamps, poses):
    """robot_data pose schema (matches datasets/asl_laser.py read_poses)."""
    with open(path, "w") as f:
        f.write(
            "poseId, timestamp, T00, T01, T02, T03, T10, T11, T12, T13, "
            "T20, T21, T22, T23, T30, T31, T32, T33\n"
        )
        for i, t, pose in zip(ids, stamps, poses):
            f.write(
                "%s, %.9f, %s\n"
                % (i, t, ", ".join("%.9f" % x for x in np.asarray(pose).ravel()))
            )


if __name__ == "__main__":
    sys.exit(run(parse_args()))
