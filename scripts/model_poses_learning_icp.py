"""Joint model + pose optimization trained on the ICP objective.

Reproduction of the reference experiment (reference:
scripts/model_poses_learning_icp): identical protocol to
scripts/model_poses_learning.py but the training objective is the symmetric
point-to-plane ICP loss over consecutive scan pairs (frozen precomputed
correspondences, reference train.py:179-210), with the same map/pose
accuracy probes.

Usage: python scripts/model_poses_learning_icp.py [--out DIR]
"""
from __future__ import annotations

import sys

from model_poses_learning import main as _main


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    if "--loss" not in argv:
        argv = ["--loss", "icp_loss"] + argv
    if "--out" not in argv:
        argv += ["--out", "gen/model_poses_learning_icp"]
    return _main(argv)


if __name__ == "__main__":
    main()
