"""Remove the learned depth bias from an aggregated map.

ROS-free reproduction of the reference's map-bias-removal tool
(reference: scripts/map_bias_removal:765-836, which reads a SLAM map from a
rosbag): load an aggregated map with per-point viewpoints (npz from
``slam_eval.export_corrected_clouds`` or any structured cloud with
``x y z vp_x vp_y vp_z``), estimate local features (normals, incidence
angles), apply the correction model in the INVERSE direction of the
recorded bias, and save the corrected map.

Without input, a synthetic biased map demonstrates the pipeline and the
consistency improvement.

Usage: python scripts/map_bias_removal.py [--map FILE.npz] [--model-w W]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def correct_map(points, vps, cfg, model):
    """Feature-annotate the map and correct its depths with ``model``."""
    from depth_correction_tpu.preproc import local_feature_cloud

    cloud = local_feature_cloud((points, vps, None), cfg)
    corrected = model.apply(cloud).with_points()
    keep = np.asarray(corrected.valid)
    return np.asarray(corrected.points)[keep]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--map", default=None, help="npz with points (+ vps) arrays")
    p.add_argument("--model-w", type=float, default=-0.002)
    p.add_argument("--exponent", type=float, default=4.0)
    p.add_argument("--out", default="gen/map_bias_removal")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from depth_correction_tpu.config import Config
    from depth_correction_tpu.models import ScaledPolynomial

    cfg = Config()
    cfg.float_type = "float32"
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.5, 50.0, 0.0
    cfg.nn_r, cfg.nn_k = 0.4, 0
    cfg.nn_max_neighbors = 32
    cfg.eigenvalue_ratio_bounds = []
    cfg.vp_dispersion_bounds = []

    if args.map:
        data = np.load(args.map)
        points = np.asarray(data["points"], np.float64)
        vps = np.asarray(data["vps"], np.float64) if "vps" in data else np.zeros_like(points)
    else:
        print("no input map; running the synthetic demo")
        from depth_correction_tpu.datasets import create_dataset
        from depth_correction_tpu.datasets.synthetic import transform_structured
        from numpy.lib.recfunctions import structured_to_unstructured as s2u

        cfg.depth_bias_model_kwargs = {"w": [args.model_w],
                                       "exponent": [args.exponent]}
        ds = create_dataset("open_box/n_4_size_12_12_4_height_1_density_60", cfg)
        pts, vp_list = [], []
        for arr, pose in ds:
            posed = transform_structured(np.asarray(pose), arr)
            pts.append(s2u(posed[["x", "y", "z"]], dtype=np.float64))
            vp_list.append(np.tile(np.asarray(pose)[:3, 3], (len(posed), 1)))
        points = np.concatenate(pts)
        vps = np.concatenate(vp_list)

    model = ScaledPolynomial(
        w=jnp.asarray([args.model_w]), exponent=jnp.asarray([args.exponent])
    )
    corrected = correct_map(points, vps, cfg, model)
    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, "map_corrected.npz")
    np.savez_compressed(out_path, points=corrected)
    print("corrected map: %d points -> %s" % (len(corrected), out_path))
    return corrected


if __name__ == "__main__":
    main()
