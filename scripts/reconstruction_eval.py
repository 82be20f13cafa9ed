"""Reconstruction (map) quality against a ground-truth cloud.

ROS-free reproduction of the reference's reconstruction_eval node
(reference: scripts/reconstruction_eval:16-60): instead of subscribing to a
live SLAM map topic, aggregate the (optionally depth-corrected) dataset map
and compare it to the ground-truth cloud with the one-sided chamfer
distance, before and after correction. Appends
``reconstruction_eval.csv`` rows ``"<dataset> <chamfer_raw> <chamfer_corr>"``.

Runs on newer_college (GT prior map) when the data is present, otherwise on
a synthetic open-box stand-in with an injected bias.

Usage: python scripts/reconstruction_eval.py [--dataset NAME] [--out DIR]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate_map(datasets, cfg, model=None):
    """Corrected, GT-posed, merged map points (the reference aggregates the
    SLAM map; here the map is the GT-posed merge, the quantity
    mapping_accuracy uses, scripts/mapping_accuracy:91-99)."""
    import jax.numpy as jnp

    from depth_correction_tpu.preproc import global_cloud, sequence_batch, local_feature_cloud

    parts = []
    for ds in datasets:
        clouds, poses = [], []
        for scan, pose in ds:
            clouds.append(local_feature_cloud(scan, cfg))
            poses.append(np.asarray(pose))
        batch = sequence_batch(clouds, np.stack(poses))
        g = global_cloud(batch, model=model)
        pts = np.asarray(g.get_points())[np.asarray(g.valid)]
        parts.append(pts)
    return np.concatenate(parts)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="newer_college/01_short_experiment")
    p.add_argument("--out", default="gen/reconstruction_eval")
    p.add_argument("--model-w", type=float, default=-0.002)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from depth_correction_tpu.config import Config
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.metrics import chamfer_distance
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.utils.io import append

    cfg = Config()
    cfg.float_type = "float32"
    cfg.grid_res = 0.2
    cfg.min_depth, cfg.max_depth = 1.0, 20.0
    cfg.nn_r, cfg.nn_k = 0.4, 0
    cfg.nn_max_neighbors = 32
    cfg.eigenvalue_ratio_bounds = []

    name = args.dataset
    from depth_correction_tpu.datasets.newer_college import data_dir

    if name.startswith("newer_college") and os.path.isdir(data_dir):
        from depth_correction_tpu.datasets.newer_college import Dataset

        ds = create_dataset(name, cfg)
        gt = Dataset(name).get_ground_truth_cloud(voxel_size=cfg.grid_res)
    else:
        from depth_correction_tpu.experiments import synthetic_gt_map

        name = "open_box/n_4_size_12_12_4_height_1_density_60"
        cfg.min_depth = 0.5
        cfg.depth_bias_model_kwargs = {"w": [args.model_w], "exponent": [4.0]}
        print("newer_college data not found; running the synthetic stand-in")
        ds = create_dataset(name, cfg)
        gt = synthetic_gt_map(name, cfg, density_mult=2.0)

    model = ScaledPolynomial(
        w=jnp.asarray([args.model_w]), exponent=jnp.asarray([4.0])
    )
    map_raw = aggregate_map([ds], cfg, model=None)
    map_corr = aggregate_map([ds], cfg, model=model)
    gt_j = jnp.asarray(gt, jnp.float32)
    ch_raw = float(chamfer_distance(jnp.asarray(map_raw, jnp.float32), gt_j))
    ch_corr = float(chamfer_distance(jnp.asarray(map_corr, jnp.float32), gt_j))
    print(
        "chamfer vs GT: raw %.6g m, corrected %.6g m (%s)"
        % (ch_raw, ch_corr, name)
    )
    os.makedirs(args.out, exist_ok=True)
    append(
        os.path.join(args.out, "reconstruction_eval.csv"),
        "%s %.9g %.9g\n" % (name, ch_raw, ch_corr),
    )
    return ch_raw, ch_corr


if __name__ == "__main__":
    main()
