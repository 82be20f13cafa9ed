"""Model-only training on static scans with the ICP objective.

Reproduction of the reference experiment (reference:
scripts/model_learning:1-232): optimize the depth-correction model alone
(no pose deltas) on static stop-and-scan pairs with the point-to-plane ICP
loss, tracking mapping accuracy against the GT map.

Usage: python scripts/model_learning.py [--loss icp_loss] [--out DIR]
"""
from __future__ import annotations

import sys

from model_poses_learning import main as _main


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    if "--loss" not in argv:
        argv = ["--loss", "icp_loss"] + argv
    if "--out" not in argv:
        argv += ["--out", "gen/model_learning"]
    # Model-only: disable pose correction via a one-off cfg hook.
    import model_poses_learning as mpl
    from depth_correction_tpu.config import PoseCorrection

    orig = mpl.make_cfg

    def make_cfg(loss):
        cfg = orig(loss)
        cfg.pose_correction = PoseCorrection.none
        return cfg

    mpl.make_cfg = make_cfg
    try:
        return _main(argv)
    finally:
        mpl.make_cfg = orig


if __name__ == "__main__":
    main()
