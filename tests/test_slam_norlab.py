"""norlab_icp_mapper adapter: generated configs + command-line contract.

The real norlab stack is not installed in this sandbox; these tests pin
OUR half of the contract: the generated YAMLs carry the reference's knob
set (reference config/slam/icp.yaml, input_filters.yaml,
launch/slam.launch:44-80), the command template fills the
run_external_slam placeholders, and the driver script — run against a
FAKE pypointmatcher/norlab_icp_mapper pair — round-trips scans to a
robot_data poses CSV.
"""
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from depth_correction_tpu.slam_norlab import (
    DEFAULT_ICP,
    norlab_slam_command,
    write_norlab_configs,
)

FAKE_NORLAB = """
import numpy as np

class Mapper:
    def __init__(self, icp_config, input_filters_config, *params):
        assert len(params) == 18, len(params)
        # the config files must exist and parse as YAML-ish text
        for p in (icp_config, input_filters_config):
            assert open(p).read().strip()
        self._pose = np.eye(4)

    def processInput(self, dp, prior, stamp):
        # echo the prior with a fixed, recognizable drift
        drift = np.eye(4); drift[0, 3] = 0.125
        self._pose = np.asarray(prior) @ drift

    def getPose(self):
        return self._pose
"""

FAKE_PM = """
import numpy as np

class _Label:
    def __init__(self, name, span):
        self.name, self.span = name, span

class _Labels(list):
    def append(self, x):
        list.append(self, x)

class _DataPoints:
    Labels = _Labels
    Label = _Label
    def __init__(self, feats=None, flabels=None, desc=None, dlabels=None):
        self.features = feats
        self.descriptors = desc

class PointMatcher:
    DataPoints = _DataPoints

class pointmatcher:
    PointMatcher = PointMatcher
"""


def test_generated_yaml_matches_reference_knobs(tmp_path):
    icp_p, filt_p, map_p = write_norlab_configs(str(tmp_path))
    icp = yaml.safe_load(open(icp_p))
    assert icp["matcher"]["KDTreeMatcher"]["knn"] == 3
    assert icp["outlierFilters"][0]["TrimmedDistOutlierFilter"]["ratio"] == 0.8
    assert "PointToPlaneErrorMinimizer" in icp["errorMinimizer"]
    filt = yaml.safe_load(open(filt_p))
    assert filt[0]["SurfaceNormalDataPointsFilter"]["knn"] == 9
    mp = yaml.safe_load(open(map_p))
    assert mp["sensor_max_range"] == 25.0 and mp["is_3D"] is True


def test_command_template_fills_runner_placeholders(tmp_path):
    cmd = norlab_slam_command(str(tmp_path))
    assert "{input_dir}" in cmd and "{poses_csv}" in cmd
    filled = cmd.format(input_dir="/in", poses_csv="/out.csv")
    assert "--input-dir /in" in filled and "--poses-csv /out.csv" in filled
    assert os.path.exists(os.path.join(str(tmp_path), "icp.yaml"))


def test_driver_against_fake_norlab_stack(tmp_path):
    # fake modules on PYTHONPATH
    fake = tmp_path / "fakemods"
    (fake / "pypointmatcher").mkdir(parents=True)
    (fake / "pypointmatcher" / "__init__.py").write_text(
        "from . import pointmatcher\n"
    )
    (fake / "pypointmatcher" / "pointmatcher.py").write_text(FAKE_PM)
    (fake / "norlab_icp_mapper.py").write_text(FAKE_NORLAB)

    in_dir = tmp_path / "scans"
    in_dir.mkdir()
    rng = np.random.default_rng(0)
    priors = []
    for i in range(3):
        T = np.eye(4)
        T[:3, 3] = rng.normal(size=3)
        priors.append(T)
        np.savez(
            in_dir / ("scan_%04d.npz" % i),
            points=rng.normal(size=(50, 3)),
            normals=rng.normal(size=(50, 3)),
            prior=T,
        )

    cmd = norlab_slam_command(str(tmp_path / "cfgs"))
    poses_csv = str(tmp_path / "poses.csv")
    filled = cmd.format(input_dir=str(in_dir), poses_csv=poses_csv)
    env = dict(os.environ)
    env["PYTHONPATH"] = str(fake) + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        filled, shell=True, env=env, capture_output=True, text=True,
        timeout=120,
    )
    assert out.returncode == 0, (out.stdout, out.stderr)

    from depth_correction_tpu.datasets.asl_laser import read_poses

    ids, est = read_poses(poses_csv)
    assert ids == [0, 1, 2]
    drift = np.eye(4)
    drift[0, 3] = 0.125
    for T, e in zip(priors, est):
        np.testing.assert_allclose(e, T @ drift, atol=1e-8)


def test_driver_exits_cleanly_without_norlab(tmp_path):
    """No norlab stack installed -> actionable error, exit code 2."""
    cmd = norlab_slam_command(str(tmp_path / "cfgs"))
    filled = cmd.format(
        input_dir=str(tmp_path), poses_csv=str(tmp_path / "p.csv")
    )
    out = subprocess.run(
        filled, shell=True, capture_output=True, text=True, timeout=120
    )
    if out.returncode == 0:  # norlab actually installed here
        pytest.skip("real norlab stack present")
    assert out.returncode == 2
    assert "pypointmatcher" in out.stderr