"""Config system round-trips (reference: config.py:465-484, configurable test)."""
import math

from depth_correction_tpu.config import Config
from depth_correction_tpu.configurable import Configurable


def test_from_dict_and_args():
    cfg = Config()
    cfg.from_dict({"nn_k": 5, "grid_res": 0.5})
    assert cfg.nn_k == 5 and cfg.grid_res == 0.5
    rest = cfg.from_args(["--nn-k", "10"])
    assert cfg.nn_k == 10 and rest == []
    cfg.from_args(["--nn-r", ".inf"])
    assert cfg.nn_r == float("inf")


def test_yaml_roundtrip(tmp_path):
    cfg = Config()
    cfg.eigenvalue_bounds = [[0, None, 1.0], [1, 1.0, float("inf")]]
    cfg.lr = 0.123
    path = str(tmp_path / "cfg.yaml")
    cfg.to_yaml(path)
    cfg2 = Config()
    cfg2.from_yaml(path)
    assert cfg2.lr == 0.123
    assert cfg2.eigenvalue_bounds == [[0, None, 1.0], [1, 1.0, float("inf")]]


def test_sanitize_bounds():
    cfg = Config()
    cfg.eigenvalue_bounds = [[0, None, 1.0], [1, 1.0, float("inf")], ["x", 0, 1]]
    cfg.sanitize()
    assert len(cfg.eigenvalue_bounds) == 2
    assert math.isnan(cfg.eigenvalue_bounds[0][1])  # open bound -> nan
    assert cfg.eigenvalue_bounds[0][2] == 1.0
    # YAML-string bounds are coerced.
    cfg.vp_dispersion_bounds = "[0.36, .inf]"
    cfg.sanitize()
    assert cfg.vp_dispersion_bounds[0] == 0.36


def test_non_default_diff_copy():
    cfg = Config()
    cfg.lr = 0.5
    nd = cfg.non_default()
    assert nd.get("lr") == 0.5 and "nn_r" not in nd
    cp = cfg.copy()
    assert cp.lr == 0.5
    cp.lr = 0.7
    assert cfg.lr == 0.5  # deep enough for scalars
    assert cfg.diff(cp)["lr"] == 0.5


def test_exp_naming():
    cfg = Config()
    desc = cfg.get_exp_desc()
    assert "ScaledPolynomial" in desc and "min_eigval_loss" in desc
    assert cfg.get_preproc_desc().startswith(cfg.dataset)


def test_value_enum():
    from depth_correction_tpu.config import Loss, PoseCorrection

    assert "min_eigval_loss" in Loss
    assert list(PoseCorrection) == ["none", "common", "sequence", "pose"]
