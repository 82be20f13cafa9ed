"""SLAM-style evaluation without ROS.

The reference evaluates localization drift by spinning a roslaunch pipeline
(robot_data replayer -> filters -> correction node -> norlab_icp_mapper C++
SLAM -> TF lookback; reference: src/depth_correction/eval.py:214-263,
scripts/robot_data:123-205). This module replaces that with:

- an in-process scan-to-map ICP odometry (point-to-plane, on-device kNN
  correspondences) run over corrected clouds — the localization-drift
  metric without an external SLAM stack,
- odometry noise injection mirroring robot_data's perturbed odometry
  (scripts/robot_data:123-151),
- CSV outputs with the reference schemas
  (``slam_eval_<slam>.csv``: "<name> <r_angle> <t_norm> <rel_angle>
  <rel_offset>"; ``slam_poses_<slam>.csv``: 4x4 rows),
- an export harness writing corrected clouds + poses to disk for parity
  runs with the real external SLAM elsewhere.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .cloud import Cloud
from .config import Config, slam_eval_csv, slam_poses_csv
from .metrics import localization_errors
from .models import load_model
from .ops.knn import nearest_neighbors
from .ops.reduce import masked_mean, masked_quantile
from .ops.se3 import (
    PPREC,
    delta_transform,
    transform_inv,
    transform_points,
    xyz_axis_angle_to_matrix,
)
from .preproc import local_feature_cloud
from .utils.io import append

__all__ = ["icp_align", "slam_odometry", "slam_mapper", "eval_slam",
           "export_corrected_clouds", "run_external_slam"]


def _icp_step(src_pts, src_valid, tgt_pts, tgt_normals, tgt_valid, inlier_ratio):
    """One Gauss-Newton point-to-plane step: solve J^T J dx = J^T r for the
    6-DoF twist (standard small-angle linearization)."""
    dists, idx = nearest_neighbors(tgt_pts, src_pts, k=1, valid_points=tgt_valid)
    d = dists[:, 0]
    i = jnp.maximum(idx[:, 0], 0)
    ok = (idx[:, 0] >= 0) & src_valid
    thr = masked_quantile(d, ok, inlier_ratio)
    w = (ok & (d <= thr)).astype(src_pts.dtype)

    q = tgt_pts[i]
    n = tgt_normals[i]
    r = jnp.sum(n * (q - src_pts), axis=-1)  # residual along target normal
    J = jnp.concatenate([jnp.cross(src_pts, n), n], axis=-1)  # (N, 6)
    Jw = J * w[:, None]
    # Normal equations at full f32 (bf16 passes destabilize the 6x6 solve).
    H = jnp.matmul(Jw.T, J, precision=PPREC) \
        + 1e-9 * jnp.eye(6, dtype=src_pts.dtype)
    g = jnp.matmul(Jw.T, r, precision=PPREC)
    dx = jnp.linalg.solve(H, g)
    # Twist -> SE(3): [rot, trans] ordering in J => [trans, rot] for our 6-vec.
    delta = xyz_axis_angle_to_matrix(jnp.concatenate([dx[3:], dx[:3]]))
    err = masked_mean(jnp.abs(r), w > 0)
    return delta, err


from functools import partial


@partial(jax.jit, static_argnames=("n_iters",))
def _icp_align_jit(src_pts, src_valid, tgt_pts, tgt_normals, tgt_valid,
                   T0, n_iters, inlier_ratio):
    def body(T, _):
        cur = transform_points(T, src_pts)
        delta, err = _icp_step(cur, src_valid, tgt_pts, tgt_normals, tgt_valid,
                               inlier_ratio)
        return jnp.matmul(delta, T, precision=PPREC), err
    if n_iters == 0:
        return T0, jnp.asarray(jnp.inf, T0.dtype)
    T, errs = jax.lax.scan(body, T0, None, length=n_iters)
    return T, errs[-1]


def icp_align(source: Cloud, target: Cloud, T0=None, n_iters: int = 10,
              inlier_ratio: float = 0.8):
    """Align source onto target (point-to-plane ICP). Target needs normals.

    :return: (T (4, 4) world transform of source, final inlier error).
    """
    assert target.normals is not None
    dtype = jnp.result_type(source.depth.dtype, target.get_points().dtype)
    T0 = jnp.eye(4, dtype=dtype) if T0 is None else jnp.asarray(T0, dtype)
    return _icp_align_jit(
        source.get_points().astype(dtype),
        source.valid,
        target.get_points().astype(dtype),
        target.normals.astype(dtype),
        target.valid,
        T0,
        n_iters,
        inlier_ratio,
    )


def perturb_odometry(poses: np.ndarray, cov_diag, seed: int = 135) -> np.ndarray:
    """Noisy odometry chain: perturb consecutive increments with Gaussian
    noise of the given 6-vector variance (rx ry rz tx ty tz), then re-chain
    (reference: scripts/robot_data:123-151)."""
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(seed)
    std = np.sqrt(np.asarray(cov_diag, np.float64))
    out = [poses[0]]
    for i in range(1, len(poses)):
        inc = np.asarray(delta_transform(jnp.asarray(poses[i - 1]), jnp.asarray(poses[i])))
        noise_vec = std * rng.normal(size=6)
        N = np.eye(4)
        N[:3, :3] = Rotation.from_euler("xyz", noise_vec[:3]).as_matrix()
        N[:3, 3] = noise_vec[3:]
        out.append(out[-1] @ inc @ N)
    return np.stack(out)


def slam_odometry(clouds: Sequence[Cloud], init_poses: np.ndarray,
                  n_iters: int = 8, inlier_ratio: float = 0.8):
    """Scan-to-previous-scan ICP odometry over (corrected) feature clouds.

    Each scan is registered against the previous one starting from the
    odometry prior; the chained transforms are the SLAM trajectory estimate.
    """
    est = [np.asarray(init_poses[0])]
    for i in range(1, len(clouds)):
        prior = est[-1] @ np.asarray(
            delta_transform(jnp.asarray(init_poses[i - 1]), jnp.asarray(init_poses[i]))
        )
        # Register scan i against scan i-1 placed at its estimate.
        target = clouds[i - 1].transform(jnp.asarray(est[-1])).with_points()
        T, _ = icp_align(clouds[i], target, T0=prior, n_iters=n_iters,
                         inlier_ratio=inlier_ratio)
        est.append(np.asarray(T))
    return np.stack(est)


def slam_mapper(clouds: Sequence[Cloud], init_poses: np.ndarray,
                n_iters: int = 8, inlier_ratio: float = 0.8,
                map_voxel: float = 0.1, map_capacity: int = 1 << 19):
    """Scan-to-MAP ICP with a maintained voxel map — the role of the
    reference's external ``norlab_icp_mapper`` (launch/slam.launch:42-80),
    in-framework: each scan registers against the accumulated downsampled
    map (drift grows much slower than scan-to-previous odometry), then
    merges into it (first-in-voxel points win, like a mapper's static map).

    The registration target pads to the CURRENT map's pad_size width
    (capped at ``map_capacity``): the program recompiles only when the map
    steps up to a new width, and each registration pays for the map that
    exists rather than the full capacity.

    :return: (S, 4, 4) estimated world poses.
    """
    import warnings

    from .ops.filters import filter_grid_indices
    from .preproc import pad_size

    def merge(map_pts, map_normals, new_pts, new_normals, center):
        pts = np.concatenate([map_pts, new_pts])
        normals = np.concatenate([map_normals, new_normals])
        keep = np.asarray(filter_grid_indices(pts, map_voxel, keep="first"))
        pts, normals = pts[keep], normals[keep]
        if len(pts) > map_capacity:
            # Voxel-level eviction, not truncation: keep the capacity voxels
            # NEAREST the current sensor position (a maintained local map —
            # the norlab mapper's role). New nearby geometry always
            # survives; only far-away map evicts, so registration against
            # the local neighborhood keeps working on long sequences.
            warnings.warn(
                "slam_mapper map at capacity (%d voxels at %.2g m); "
                "evicting voxels farthest from the sensor"
                % (map_capacity, map_voxel)
            )
            d2 = np.sum((pts - np.asarray(center)[None]) ** 2, axis=1)
            nearest = np.argpartition(d2, map_capacity - 1)[:map_capacity]
            pts, normals = pts[nearest], normals[nearest]
        return pts, normals

    def as_target(map_pts, map_normals, dtype):
        n = len(map_pts)
        # Pad to the pad_size granularity of the CURRENT map, not the full
        # capacity: registrations only pay for the map that exists (a few
        # recompiles as the buffer steps up through sizes).
        width = min(pad_size(max(n, 1)), map_capacity)
        pad = width - n
        pts = np.concatenate([map_pts, np.zeros((pad, 3))])
        normals = np.concatenate([map_normals, np.zeros((pad, 3))])
        valid = np.zeros(width, bool)
        valid[:n] = True
        return Cloud(
            vps=jnp.zeros((width, 3), dtype),
            dirs=jnp.asarray(normals, dtype),  # unused by ICP target
            depth=jnp.zeros(width, dtype),
            valid=jnp.asarray(valid),
            points=jnp.asarray(pts, dtype),
            normals=jnp.asarray(normals, dtype),
        )

    def scan_arrays(cloud, T):
        posed = cloud.transform(jnp.asarray(T)).with_points()
        keep = np.asarray(posed.valid)
        return (
            np.asarray(posed.points)[keep],
            np.asarray(posed.normals)[keep],
        )

    dtype = clouds[0].depth.dtype
    est = [np.asarray(init_poses[0])]
    first_pts, first_normals = scan_arrays(clouds[0], est[0])
    map_pts, map_normals = merge(
        np.zeros((0, 3)), np.zeros((0, 3)), first_pts, first_normals,
        est[0][:3, 3],
    )

    for i in range(1, len(clouds)):
        prior = est[-1] @ np.asarray(
            delta_transform(jnp.asarray(init_poses[i - 1]),
                            jnp.asarray(init_poses[i]))
        )
        target = as_target(map_pts, map_normals, dtype)
        T, _ = icp_align(clouds[i], target, T0=prior, n_iters=n_iters,
                         inlier_ratio=inlier_ratio)
        est.append(np.asarray(T))
        new_pts, new_normals = scan_arrays(clouds[i], est[-1])
        map_pts, map_normals = merge(map_pts, map_normals, new_pts,
                                     new_normals, est[-1][:3, 3])
    return np.stack(est)


def eval_slam(cfg: Config, test_datasets: Optional[Sequence] = None,
              apply_correction: bool = True):
    """Localization-drift evaluation (replaces the roslaunch pipeline,
    reference: eval.py:214-263): replay scans with noisy odometry, run ICP
    odometry over (corrected) clouds, compare against ground truth, append
    the reference-schema CSVs.

    :return: dict name -> (mean_r_angle, mean_t_norm, mean_rel_angle,
        mean_rel_offset).
    """
    from .datasets import create_dataset
    from .train import _pose_path

    if not test_datasets:
        test_datasets = [
            create_dataset(
                n, cfg,
                poses_path=_pose_path(cfg.test_poses_path, i, cfg.test_names or []),
            )
            for i, n in enumerate(cfg.test_names or [])
        ]
    model = load_model(cfg=cfg) if apply_correction else None

    results = {}
    for ds in test_datasets:
        name = str(ds)
        clouds, gt_poses = [], []
        for scan, pose in ds:
            if model is not None:
                # Re-derive normals from the CORRECTED geometry over the
                # same local neighborhoods: model.apply only moves points
                # along their rays, and point-to-plane registration with
                # pre-correction plane orientations would blunt the drift
                # metric's sensitivity to the correction under evaluation
                # (the reference's external mapper likewise estimates
                # normals from the corrected clouds it is fed).
                from .ops.features import compute_features

                cloud, lnn, lw = local_feature_cloud(
                    scan, cfg, return_neighbors=True
                )
                cloud = compute_features(model.apply(cloud), lnn, lw)
            else:
                cloud = local_feature_cloud(scan, cfg)
            clouds.append(cloud)
            gt_poses.append(np.asarray(pose))
        gt_poses = np.stack(gt_poses)
        odom = perturb_odometry(gt_poses, cfg.odom_cov, seed=cfg.random_seed)
        from .config import SLAM

        if cfg.slam == SLAM.icp_odometry:
            est = slam_odometry(clouds, odom)
        elif cfg.slam == SLAM.icp_mapper:
            est = slam_mapper(clouds, odom, map_voxel=cfg.grid_res or 0.1)
        elif cfg.slam == SLAM.norlab_icp_mapper:
            # External mapper: export corrected clouds + odometry priors,
            # spawn the configured command, read the estimated poses back
            # (the reference's roslaunch loop, eval.py:234-259).
            est = run_external_slam(cfg, name, clouds, odom)
        else:
            raise NotImplementedError("cfg.slam=%s" % cfg.slam)

        abs_a, abs_t, rel_a, rel_t = localization_errors(
            jnp.asarray(gt_poses), jnp.asarray(est)
        )
        stats = (
            float(jnp.mean(abs_a)),
            float(jnp.mean(abs_t)),
            float(jnp.mean(rel_a)),
            float(jnp.mean(rel_t)),
        )
        results[name] = stats

        if cfg.slam_eval_csv:
            append(cfg.slam_eval_csv, "%s %.9f %.9f %.9f %.9f\n" % ((name,) + stats))
        if cfg.slam_poses_csv:
            # Reference robot_data schema (poseId, timestamp, T00..T33;
            # scripts/robot_data:196-204) so the file round-trips through
            # read_poses / OverridePosesDataset (the PoseProvider axis).
            from .datasets.asl_laser import write_poses

            poses_path = cfg.slam_poses_csv
            if len(test_datasets) > 1:
                # One file per sequence — a shared path would be overwritten
                # by each later sequence. The nesting matches the canonical
                # slam_poses_csv(log_dir, name, slam) layout (config.py:
                # 104-108) so PoseProvider consumers find the file.
                head, base = os.path.split(poses_path)
                poses_path = os.path.join(head, name, base)
            os.makedirs(os.path.dirname(poses_path) or ".", exist_ok=True)
            write_poses(list(range(len(est))), est, poses_path)
    return results


def run_external_slam(cfg: Config, name: str, clouds: Sequence[Cloud],
                      prior_poses: np.ndarray) -> np.ndarray:
    """Drive an external SLAM binary over exported corrected clouds — the
    subprocess half the reference runs via roslaunch (eval.py:234-259,
    scripts/robot_data:153-205).

    Contract (``cfg.slam_command`` format template):

    - ``{input_dir}``: directory of per-scan ``scan_%04d.npz`` files with
      ``points`` / ``normals`` / ``mask`` (sensor frame, corrected) and
      ``prior`` (the (4, 4) noisy-odometry pose prior — the reference feeds
      SLAM the same perturbed odometry TF),
    - ``{poses_csv}``: path where the mapper must write its estimated world
      poses, robot_data CSV schema (``poseId, timestamp, T00..T33``).

    :return: (S, 4, 4) estimated poses read back from the mapper's CSV.
    """
    import shlex
    import subprocess

    from .datasets.asl_laser import read_poses

    if not cfg.slam_command:
        raise ValueError(
            "cfg.slam=norlab_icp_mapper needs cfg.slam_command (a template "
            "with {input_dir} and {poses_csv}); see scripts/stub_slam_mapper.py"
        )
    in_dir = os.path.join(cfg.log_dir or ".", "external_slam",
                          name.replace("/", "_"))
    os.makedirs(in_dir, exist_ok=True)
    # Clear stale scans from a previous (possibly longer) run — the mapper
    # globs scan_*.npz, so leftovers would corrupt its input sequence.
    import glob as _glob

    for stale in _glob.glob(os.path.join(in_dir, "scan_*.npz")):
        os.remove(stale)
    for i, cloud in enumerate(clouds):
        keep = np.asarray(cloud.valid)
        np.savez_compressed(
            os.path.join(in_dir, "scan_%04d.npz" % i),
            points=np.asarray(cloud.to_points())[keep],
            normals=np.asarray(cloud.normals)[keep]
            if cloud.normals is not None
            else np.zeros((int(keep.sum()), 3)),
            mask=np.asarray(cloud.mask)[keep]
            if cloud.mask is not None
            else np.ones(int(keep.sum()), bool),
            prior=np.asarray(prior_poses[i]),
            # Frame the prior poses are expressed in (reference publishes
            # clouds/paths in cfg.world_frame, ros.py:51-53).
            frame=np.asarray(cfg.world_frame),
        )
    poses_csv = os.path.join(in_dir, "slam_poses_external.csv")
    cmd = cfg.slam_command.format(input_dir=in_dir, poses_csv=poses_csv)
    print("Running external SLAM: %s" % cmd)
    subprocess.run(shlex.split(cmd), check=True)
    if not os.path.exists(poses_csv):
        raise RuntimeError("external SLAM wrote no poses: %s" % poses_csv)
    _, est = read_poses(poses_csv)
    if len(est) != len(clouds):
        raise RuntimeError(
            "external SLAM returned %d poses for %d scans"
            % (len(est), len(clouds))
        )
    return np.stack(est)


def export_corrected_clouds(cfg: Config, out_dir: str,
                            test_datasets: Optional[Sequence] = None):
    """Write corrected clouds + GT poses to npz for external SLAM parity
    runs (the framework-side half of the reference's eval_slam)."""
    from .datasets import create_dataset

    if not test_datasets:
        test_datasets = [create_dataset(n, cfg) for n in (cfg.test_names or [])]
    model = load_model(cfg=cfg)
    os.makedirs(out_dir, exist_ok=True)
    manifest = []
    for ds in test_datasets:
        name = str(ds).replace("/", "_")
        for i, (scan, pose) in enumerate(ds):
            cloud = local_feature_cloud(scan, cfg)
            corrected = model.apply(cloud)
            keep = np.asarray(corrected.valid)
            path = os.path.join(out_dir, "%s_%04d.npz" % (name, i))
            np.savez_compressed(
                path,
                points=np.asarray(corrected.to_points())[keep],
                normals=np.asarray(corrected.normals)[keep],
                mask=np.asarray(corrected.mask)[keep],
                pose=np.asarray(pose),
                frame=np.asarray(cfg.world_frame),
            )
            manifest.append(path)
    return manifest
