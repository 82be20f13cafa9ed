"""Loss evaluation harness.

Re-design of the reference evaluator (reference: src/depth_correction/
eval.py:31-211): evaluate a trained model's map-consistency losses on test
sequences and append results to CSVs with the reference schemas
(``loss_eval_<loss>[_<subset>].csv`` rows ``"<names> <loss>"``,
reference: eval.py:182-186, config.py:96-103).

SLAM-in-the-loop evaluation (reference: eval.py:214-263, a roslaunch
pipeline) is replaced by (a) in-framework localization/mapping metrics
(:mod:`depth_correction_tpu.metrics`) and (b) a corrected-cloud export
harness (:mod:`depth_correction_tpu.slam_export`) for external SLAM parity.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .config import Config, PoseCorrection, loss_eval_csv
from .loss import create_loss
from .models import load_model
from .train import (TrainData, _pose_path, init_pose_deltas, make_loss_fn,
                    prepare_sequences)
from .utils.io import append

__all__ = ["eval_loss", "eval_loss_all", "eval_slam_all", "eval_icp",
           "initialize_pose_corrections"]


def initialize_pose_corrections(data: TrainData, cfg: Config):
    """Zero-initialized pose deltas per correction mode
    (reference: eval.py:31-65)."""
    return init_pose_deltas(data, cfg)


def eval_loss(
    cfg: Config,
    test_datasets: Optional[Sequence] = None,
    model=None,
    loss_fun=None,
    test_data: Optional[TrainData] = None,
    return_data: bool = False,
):
    """Evaluate the configured loss on test sequences
    (reference: eval.py:115-191).

    :return: scalar loss (and the prepared TrainData when ``return_data``).
    """
    from .datasets import create_dataset

    if test_datasets:
        test_names = [str(ds) for ds in test_datasets]
    else:
        test_names = list(cfg.test_names or [])
        test_datasets = [
            create_dataset(
                name, cfg,
                poses_path=_pose_path(cfg.test_poses_path, i, test_names),
            )
            for i, name in enumerate(test_names)
        ]
    if not test_datasets:
        raise ValueError("No test data: set cfg.test_names or pass test_datasets.")

    if model is None:
        model = load_model(cfg=cfg)
    custom_loss = loss_fun is not None
    loss_fun = loss_fun or create_loss(cfg)

    # Multi-chip evaluation (cfg.mesh_shape, as in train()): establishment,
    # the point tables, and the loss all shard over the 1-D mesh. A
    # caller-provided test_data keeps its own placement (single-device path).
    mesh = None
    if (cfg.mesh_shape or getattr(cfg, "dist_coordinator", None)) \
            and test_data is None:
        from .parallel.sharding import mesh_from_config

        mesh = mesh_from_config(cfg)

    if test_data is None:
        # Forward-only evaluation: no VJP, so no transpose graphs.
        test_data = prepare_sequences(
            test_datasets, cfg, mesh=mesh, for_grad=False
        )
        if mesh is not None:
            from .parallel import shard_train_data

            test_data = shard_train_data(
                test_data, mesh, analytic_vjp=False, pair_transposes=False
            )

    params = {"model": model}
    # Pose deltas: loaded from checkpoint or zero-initialized
    # (reference: eval.py:163-168).
    if cfg.pose_correction != PoseCorrection.none:
        if cfg.test_pose_deltas:
            from .utils.checkpoint import load_pytree

            loaded = load_pytree(cfg.test_pose_deltas)
            # Tuple indices round-trip as digit strings: sort numerically,
            # or '10' lands between '1' and '2' (11+ sequences would get
            # each other's corrections).
            try:
                keys = sorted(loaded, key=int)
            except ValueError:
                keys = sorted(loaded)
            params["pose_deltas"] = tuple(jnp.asarray(loaded[k]) for k in keys)
        else:
            params["pose_deltas"] = init_pose_deltas(test_data, cfg)

    import jax

    # cfg.device pins data + params to an explicit backend, mirroring
    # train() (reference: config.py:180). Ignored under mesh_shape.
    device = cfg.jax_device() if mesh is None else None
    if device is not None:
        test_data = jax.device_put(test_data, device)
        params = jax.device_put(params, device)

    if mesh is not None:
        from .parallel import make_sharded_loss_fn

        if custom_loss:
            raise NotImplementedError(
                "a custom loss_fun cannot be sharded; unset cfg.mesh_shape "
                "or configure the loss via cfg.loss/loss_kwargs"
            )
        loss_fn = make_sharded_loss_fn(test_data, cfg, mesh)
    else:
        from .train import bind_cellwin_static

        loss_fn = make_loss_fn(cfg, loss_fun=loss_fun)
        # Cell-window graphs ride the closure (35-220x vs jit arguments).
        loss_fn, test_data = bind_cellwin_static(loss_fn, test_data)
    value = float(jax.jit(loss_fn)(params, test_data))

    print("Test loss on %s: %.9f" % (", ".join(test_names), value))
    if cfg.loss_eval_csv:
        append(cfg.loss_eval_csv, "%s %.9f\n" % (",".join(test_names), value))

    if return_data:
        return value, test_data
    return value


def eval_loss_all(cfg: Config):
    """Evaluate every configured loss on train/val/test subsets with
    ground-truth poses (reference: eval.py:194-211)."""
    results = {}
    for names, suffix in zip(
        [cfg.train_names, cfg.val_names, cfg.test_names], ["train", "val", "test"]
    ):
        if not names:
            continue
        for loss in cfg.eval_losses:
            eval_cfg = cfg.copy()
            eval_cfg.test_names = list(names)
            eval_cfg.train_poses_path = []
            eval_cfg.val_poses_path = []
            eval_cfg.test_poses_path = []
            eval_cfg.loss = loss
            eval_cfg.loss_eval_csv = loss_eval_csv(cfg.log_dir, loss, suffix)
            if loss == "icp_loss":
                # ICP eval runs over per-scan normals + consecutive pairs
                # (reference: eval.py:194-211 includes icp in the loss matrix).
                results[(suffix, loss)] = eval_icp(eval_cfg)
            else:
                results[(suffix, loss)] = eval_loss(eval_cfg)
    return results


def eval_slam_all(cfg: Config):
    """Evaluate every configured SLAM pipeline on train/val/test subsets
    with ground-truth pose priors (reference: eval.py:266-290): per (subset,
    slam) pair, run ``slam_eval.eval_slam`` and append
    ``slam_eval_<slam>_<subset>.csv`` with the reference schema."""
    from .config import slam_eval_csv
    from .slam_eval import eval_slam

    results = {}
    for names, suffix in zip(
        [cfg.train_names, cfg.val_names, cfg.test_names], ["train", "val", "test"]
    ):
        if not names:
            continue
        for slam in cfg.eval_slams:
            eval_cfg = cfg.copy()
            eval_cfg.test_names = list(names)
            eval_cfg.train_poses_path = []
            eval_cfg.val_poses_path = []
            eval_cfg.test_poses_path = []
            eval_cfg.slam = slam
            eval_cfg.slam_eval_csv = slam_eval_csv(cfg.log_dir, slam, suffix)
            eval_cfg.slam_poses_csv = ""
            results[(suffix, slam)] = eval_slam(eval_cfg)
    return results


def eval_icp(cfg: Config, test_datasets: Optional[Sequence] = None):
    """ICP point-to-plane/point loss on test sequences with ground-truth
    poses — the consistency metric over consecutive scan pairs
    (reference: eval.py:100-104 icp branch)."""
    from .datasets import create_dataset
    from .loss import icp_loss
    from .preproc import local_feature_cloud

    if test_datasets:
        names = [str(ds) for ds in test_datasets]
    else:
        names = list(cfg.test_names or [])
        test_datasets = [
            create_dataset(
                n, cfg,
                poses_path=_pose_path(cfg.test_poses_path, i, names),
            )
            for i, n in enumerate(names)
        ]
    model = load_model(cfg=cfg)
    seqs = []
    poses_all = []
    for ds in test_datasets:
        clouds, poses = [], []
        for scan, pose in ds:
            clouds.append(local_feature_cloud(scan, cfg))
            poses.append(np.asarray(pose))
        seqs.append(clouds)
        poses_all.append(jnp.asarray(np.stack(poses), dtype=cfg.jax_float_type()))
    value, _ = icp_loss(
        seqs,
        poses=poses_all,
        model=model,
        icp_point_to_plane=bool(cfg.loss_kwargs.get("icp_point_to_plane", True)),
        icp_inlier_ratio=float(cfg.loss_kwargs.get("icp_inlier_ratio", 0.3)),
    )
    value = float(value)
    print("ICP loss on %s: %.9f" % (", ".join(names), value))
    # Same flat-file schema as the consistency losses
    # (reference: eval.py:182-186).
    if cfg.loss_eval_csv:
        append(cfg.loss_eval_csv, "%s %.9f\n" % (",".join(names), value))
    return value
