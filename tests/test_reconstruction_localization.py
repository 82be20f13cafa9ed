"""Reconstruction-eval and localization-accuracy harnesses
(reference: scripts/reconstruction_eval:16-60, scripts/localization_accuracy)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from depth_correction_tpu.metrics import static_intervals, tracker_position_error


def test_static_intervals():
    times = np.arange(20, dtype=float)
    pos = np.zeros((20, 3))
    pos[8:14, 0] = np.linspace(0, 1, 6)  # moving segment
    pos[14:, 0] = 1.0
    got = static_intervals(times, pos, min_duration=2.0, max_motion=0.01)
    assert got == [(0, 9), (13, 20)] or got == [(0, 8), (14, 20)], got


def test_static_intervals_none_when_always_moving():
    times = np.arange(10, dtype=float)
    pos = np.cumsum(np.ones((10, 3)) * 0.5, axis=0)
    assert static_intervals(times, pos, max_motion=0.01) == []


def test_tracker_position_error():
    T = np.tile(np.eye(4), (3, 1, 1))
    T[:, :3, 3] = [[0, 0, 0], [1, 0, 0], [0, 2, 0]]
    xyz = np.asarray([[0, 0, 0], [1, 0, 0], [0, 0, 0]])
    err = float(tracker_position_error(T, xyz))
    np.testing.assert_allclose(err, 2.0 / 3.0, rtol=1e-6)


def test_localization_accuracy_script():
    import localization_accuracy as la

    err = la.main(["--out", "/tmp/loc_acc_test"])
    assert err is not None and err < 0.05


def test_reconstruction_eval_script(tmp_path):
    import reconstruction_eval as re_

    ch_raw, ch_corr = re_.main(["--out", str(tmp_path)])
    # Correcting with the injected-bias weight must improve the map.
    assert ch_corr < ch_raw
    assert os.path.exists(str(tmp_path / "reconstruction_eval.csv"))
