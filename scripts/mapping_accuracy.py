#!/usr/bin/env python
"""Map accuracy before/after depth correction against a ground-truth map.

Counterpart of the reference's scripts/mapping_accuracy:72-118: aggregate
(corrected) scans into a map and measure the inlier-trimmed point-to-point
distance to the ground-truth map for a bank of models.
"""
import argparse
import os
import sys

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from depth_correction_tpu.cloud import Cloud
from depth_correction_tpu.config import Config
from depth_correction_tpu.datasets import create_dataset
from depth_correction_tpu.metrics import mapping_accuracy
from depth_correction_tpu.models import load_model
from depth_correction_tpu.preproc import local_feature_cloud

# The only concrete trained-model numbers published in the reference repo
# (FEE Corridor, exponent 4; reference: scripts/mapping_accuracy:72-80).
REFERENCE_MODELS = [
    ("ScaledPolynomial", [-0.00068]),
    ("ScaledPolynomial", [-0.00110]),
    ("ScaledPolynomial", [-0.00096]),
    ("ScaledPolynomial", [-0.00035]),
    ("Polynomial", [-0.001227]),
    ("Polynomial", [-0.001375]),
    ("Polynomial", [-0.001376]),
    ("Polynomial", [-0.001159]),
]


def aggregate_map(ds, cfg, model=None):
    clouds = []
    for scan, pose in ds:
        cloud = local_feature_cloud(scan, cfg)
        if model is not None:
            cloud = model.apply(cloud)
        clouds.append(cloud.transform(jnp.asarray(pose)).with_points())
    merged = Cloud.concatenate(clouds)
    return merged.get_points(), merged.valid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="fee_corridor/seq1")
    ap.add_argument("--gt-map", default=None, help="npz with 'cloud' or (N,3)")
    ap.add_argument("--inlier-ratio", type=float, default=0.8)
    args = ap.parse_args()

    cfg = Config()
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 1.0, 25.0, 0.2
    cfg.nn_r = 0.4
    cfg.depth_bias_model_kwargs = {"w": [0.0], "exponent": [4.0]}

    ds = create_dataset(args.dataset, cfg)
    if args.gt_map:
        data = np.load(args.gt_map)
        gt = data["cloud"] if "cloud" in getattr(data, "files", []) else np.asarray(data)
        if gt.dtype.names:
            from numpy.lib.recfunctions import structured_to_unstructured

            gt = structured_to_unstructured(gt[["x", "y", "z"]])
    else:
        # Fall back to the dataset's own GT map when available.
        gt = ds.global_cloud()  # fee_corridor exposes map_5cm_alligned.npz
        from numpy.lib.recfunctions import structured_to_unstructured

        gt = structured_to_unstructured(gt[["x", "y", "z"]])
    gt = jnp.asarray(np.asarray(gt, np.float32))

    pts, valid = aggregate_map(ds, cfg, model=None)
    before = float(mapping_accuracy(pts, gt, args.inlier_ratio, valid_cloud=valid))
    print("uncorrected map accuracy: %.4f m" % before)

    for cls, w in REFERENCE_MODELS:
        model = load_model(class_name=cls, model_kwargs={"w": w, "exponent": [4.0]})
        pts, valid = aggregate_map(ds, cfg, model=model)
        after = float(mapping_accuracy(pts, gt, args.inlier_ratio, valid_cloud=valid))
        print("%s(w=%s): %.4f m (%+.2f%%)" % (cls, w, after, 100 * (after - before) / before))


if __name__ == "__main__":
    main()
