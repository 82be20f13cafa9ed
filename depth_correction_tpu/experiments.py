"""Joint model + pose-correction experiment harness.

Reproduces the reference's FEE-corridor experiment scripts
(reference: scripts/model_poses_learning:56-195, model_poses_learning_icp,
model_learning, mapping_accuracy:100-118) as one library routine:

- joint (model, pose-delta) optimization on static scans under any
  configured objective (map-consistency or ICP),
- per-iteration experiment metrics: pose accuracy against ground-truth
  scanner positions (Leica tracker for fee_corridor,
  reference: model_poses_learning:138-140) and mapping accuracy against a
  ground-truth map (inlier-trimmed point-to-point 1-NN distance,
  reference: mapping_accuracy:100-118),
- CSV history for plots / aggregation.

The TPU shape: the optimization step is one jitted program (loss + grads +
update); the metric probes are separate jitted programs run every
``metrics_every`` iterations so the hot loop never syncs on them.
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence

import numpy as np

__all__ = ["ExperimentHistory", "joint_learning", "synthetic_gt_map",
           "synthetic_gt_positions"]


@dataclasses.dataclass
class ExperimentHistory:
    iters: List[int]
    train_loss: List[float]
    pose_l2: List[float]  # NaN when no GT positions
    map_accuracy: List[float]  # NaN when no GT map
    params: dict = None  # final params pytree

    def to_csv(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write("iter train_loss pose_l2 map_accuracy\n")
            for row in zip(self.iters, self.train_loss, self.pose_l2,
                           self.map_accuracy):
                f.write("%i %.9g %.9g %.9g\n" % row)


def synthetic_gt_map(name: str, cfg, density_mult: float = 4.0) -> np.ndarray:
    """Ground-truth map for a synthetic scene: the clean (un-biased,
    un-noised) dataset merged at GT poses, densified — the stand-in for the
    fee_corridor scanner map (datasets/fee_corridor.py:129-131)."""
    from .datasets import create_dataset
    from .datasets.synthetic import transform_structured
    from numpy.lib.recfunctions import structured_to_unstructured as s2u

    clean_cfg = cfg.copy()
    clean_cfg.depth_bias_model_kwargs = {}
    clean_cfg.pose_noise = 0.0
    clean_cfg.depth_noise = 0.0
    if name.startswith("open_box") and "density" in name:
        head, dens = name.rsplit("density_", 1)
        name = head + "density_%g" % (float(dens) * density_mult)
    ds = create_dataset(name, clean_cfg, noisy=False)
    parts = []
    for arr, pose in ds:
        parts.append(s2u(transform_structured(np.asarray(pose), arr)[["x", "y", "z"]]))
    return np.concatenate(parts).astype(np.float64)


def synthetic_gt_positions(name: str, cfg) -> np.ndarray:
    """GT scanner positions of the clean dataset (the synthetic 'Leica')."""
    from .datasets import create_dataset

    clean_cfg = cfg.copy()
    clean_cfg.pose_noise = 0.0
    ds = create_dataset(name, clean_cfg, noisy=False)
    return np.stack([np.asarray(p)[:3, 3] for _, p in ds])


def joint_learning(
    cfg,
    datasets: Optional[Sequence] = None,
    gt_map: Optional[np.ndarray] = None,
    gt_positions: Optional[np.ndarray] = None,
    metrics_every: int = 10,
    log_csv: Optional[str] = None,
    callbacks=None,
) -> ExperimentHistory:
    """Jointly optimize (model, pose deltas) and track experiment metrics.

    :param cfg: full config; ``cfg.loss`` picks the objective (consistency
        or icp), ``cfg.pose_correction`` the pose-delta granularity
        (``none`` reproduces scripts/model_learning's model-only run).
    :param gt_map: (G, 3) ground-truth map points for mapping accuracy.
    :param gt_positions: (S, 3) GT scanner positions for pose accuracy
        (first sequence; reference: model_poses_learning:138-140).
    :return: :class:`ExperimentHistory` with the final params attached.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from .datasets import create_dataset
    from .loss import create_loss
    from .metrics import mapping_accuracy
    from .models import load_model
    from .preproc import corrected_poses, global_cloud
    from .train import (
        _delta_for_seq,
        _grad_mask,
        init_pose_deltas,
        make_loss_fn,
        make_optimizer,
        prepare_sequences,
    )

    if datasets is None:
        datasets = [create_dataset(n, cfg) for n in (cfg.train_names or [])]
    data = prepare_sequences(datasets, cfg)

    params = {"model": load_model(cfg=cfg)}
    deltas = init_pose_deltas(data, cfg)
    if deltas is not None:
        params["pose_deltas"] = deltas

    loss_fn = make_loss_fn(cfg, loss_fun=create_loss(cfg))
    from .train import bind_cellwin_static

    # Cell-window graphs (if any) ride the closure (35-220x vs arguments).
    loss_fn, data = bind_cellwin_static(loss_fn, data)
    tx = make_optimizer(cfg)
    gmask = _grad_mask(params, cfg)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, data):
        loss, grads = jax.value_and_grad(loss_fn)(params, data)
        grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, gmask)
        updates, opt_state = tx.update(
            grads, opt_state, params,
            value=loss, grad=grads, value_fn=lambda p: loss_fn(p, data),
        )
        return loss, optax.apply_updates(params, updates), opt_state

    gt_map_j = None if gt_map is None else jnp.asarray(gt_map, cfg.jax_float_type())
    gt_xyz_j = (
        None if gt_positions is None else jnp.asarray(gt_positions,
                                                      cfg.jax_float_type())
    )

    # GT references flow through the jit boundary as ARGUMENTS (the 5 cm
    # scanner map is millions of points; a closure constant would be
    # literal-pooled into the HLO — CLAUDE.md).
    @jax.jit
    def probe(params, data, gt_map_a, gt_xyz_a):
        """Experiment metrics under the current params."""
        model = params["model"]
        pose_deltas = params.get("pose_deltas")
        batch = data.batches[0]
        delta = _delta_for_seq(pose_deltas, 0, cfg.pose_correction)
        poses = corrected_poses(batch.poses, delta)
        pose_l2 = (
            jnp.linalg.norm(poses[:, :3, 3] - gt_xyz_a, axis=1).mean()
            if gt_xyz_a is not None
            else jnp.nan
        )
        if gt_map_a is not None:
            g = global_cloud(batch, model=model, pose_deltas=delta)
            map_acc = mapping_accuracy(
                g.get_points(), gt_map_a, icp_inlier_ratio=0.8,
                valid_cloud=g.valid,
            )
        else:
            map_acc = jnp.nan
        return pose_l2, map_acc

    hist = ExperimentHistory([], [], [], [])
    for it in range(cfg.n_opt_iters):
        loss, new_params, opt_state = step(params, opt_state, data)
        if it % max(metrics_every, 1) == 0 or it == cfg.n_opt_iters - 1:
            # The FINAL row probes the post-update params — those are what
            # hist.params holds and the caller saves/returns.
            probed = new_params if it == cfg.n_opt_iters - 1 else params
            pose_l2, map_acc = probe(probed, data, gt_map_j, gt_xyz_j)
            hist.iters.append(it)
            hist.train_loss.append(float(loss))
            hist.pose_l2.append(float(pose_l2))
            hist.map_accuracy.append(float(map_acc))
            if callbacks is not None:
                callbacks(it, params, float(loss), float(pose_l2), float(map_acc))
            print(
                "It. %03i: loss %.6g, pose L2 %.4g m, map acc %.4g m"
                % (it, float(loss), float(pose_l2), float(map_acc))
            )
        params = new_params

    hist.params = params
    if log_csv:
        hist.to_csv(log_csv)
    return hist
