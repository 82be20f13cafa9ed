#!/usr/bin/env python
"""Write dynamic-object-filtered KITTI-360 scans to the data_3d_filtered
layout (reference: scripts/generate_scans_wo_dynamic_objects_kitti360) —
the CLI wrapper over ``datasets.kitti360.remove_dynamic_objects``.

Usage:
    python scripts/generate_scans_wo_dynamic_objects_kitti360.py \
        <dataset name, e.g. kitti360/00_start_100_end_150_step_1> \
        [--out-dir DIR] [--dist-th 0.2]
"""
import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("name", help="kitti360/<slice> dataset name")
    parser.add_argument("--out-dir", default=None)
    parser.add_argument("--dist-th", type=float, default=0.2,
                        help="drop points within this distance [m] of a "
                             "dynamic semantic point")
    args = parser.parse_args()

    from depth_correction_tpu.datasets.kitti360 import (
        Dataset,
        remove_dynamic_objects,
    )

    ds = Dataset(args.name.split("/", 1)[-1])
    out = remove_dynamic_objects(ds, out_dir=args.out_dir,
                                 dist_th=args.dist_th)
    print("Filtered scans written to %s" % out)
    print("Load them with Dataset(..., filtered_scans=True).")


if __name__ == "__main__":
    main()
