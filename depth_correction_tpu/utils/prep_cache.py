"""Disk cache of prepared (frozen) training graphs.

The reference amortizes neighborhood establishment WITHIN one run by
freezing the neighborhoods before the hot loop (reference:
src/depth_correction/train.py:166-226). This module extends the same
amortization ACROSS runs: ``prepare_sequences`` consults a content-addressed
disk cache keyed by a fingerprint of (dataset content, establishment knobs),
so a second ``train()`` on identical data — or a grid experiment that
differs only in model / optimizer / loss reduction — reloads the frozen
graphs (neighbor tables, transpose graphs, cell-window structure) in seconds
instead of re-paying the establishment build (~minutes at bench scale).

Design:

- The fingerprint hashes the SCAN CONTENT actually consumed (structured
  bytes + poses), not dataset names, so pose providers / noise wrappers /
  splits are covered by construction; plus every config field that can
  influence ``prepare_sequences`` output. Fields are selected by an
  EXCLUDE-list (``_PREP_IRRELEVANT``): a newly added config field changes
  the fingerprint by default — conservative staleness, never silent reuse.
- Entries are per SEQUENCE (one dataset), so train/val splits and grid
  experiments share entries whenever the underlying (data, knobs) pair
  matches.
- Values are numpy-converted pytrees (SequenceBatch / BucketedTranspose /
  CellWinDevice are registered dataclasses) pickled to a temp file and
  atomically renamed — concurrent grid jobs may race to create the same
  entry; both produce identical bytes and the rename keeps reads whole.
"""
from __future__ import annotations

import hashlib
import os
import pickle
import sys
import tempfile
from typing import Optional

import numpy as np

__all__ = ["sequence_fingerprint", "load_record", "save_record"]

# Bump when the TrainData record layout changes incompatibly.
CACHE_VERSION = 1

# Config fields that cannot change what prepare_sequences RETURNS for a
# given, already-materialized scan sequence. Everything NOT listed here is
# folded into the fingerprint (so unknown/new fields invalidate, not alias).
#
# - dataset-shaping fields (dataset*, data_*, *_noise*, depth_bias_model_*,
#   *_names, *_poses_path, pose_provider) act through create_dataset and are
#   covered by the scan-content hash;
# - model/optimizer/loop fields act after preparation;
# - orchestration/IO fields never touch the math;
# - mesh/dist fields are summarized by the explicit ``mesh`` flag argument
#   (establishment values are device-count invariant; only the presence of
#   a mesh changes which auxiliary graphs are built);
# - ``loss``/``loss_kwargs`` are folded separately as the icp-mode bits
#   (the only parts preparation reads), so min_eigval/trace experiments on
#   the same graph share entries.
_PREP_IRRELEVANT = frozenset(
    {
        # dataset identity (covered by content hash)
        "dataset", "dataset_args", "dataset_kwargs",
        "data_start", "data_step", "data_stop",
        "depth_bias_model_args", "depth_bias_model_class",
        "depth_bias_model_kwargs",
        "depth_noise", "pose_noise", "pose_noise_mode",
        "train_names", "val_names", "test_names",
        "train_poses_path", "val_poses_path", "test_poses_path",
        "pose_provider",
        # model / optimizer / loop
        "model_class", "model_args", "model_kwargs", "model_state_dict",
        "optimizer", "optimizer_args", "optimizer_kwargs", "lr",
        "n_opt_iters", "optimize_model", "pose_correction",
        "train_pose_deltas", "test_pose_deltas",
        # loss (folded separately as icp bits)
        "loss", "loss_kwargs",
        # orchestration / IO / observability
        "log_dir", "out_dir", "pkg_dir", "loss_eval_csv", "slam_eval_csv",
        "slam_poses_csv", "show_results", "force", "launch_prefix",
        "num_jobs", "items_per_job", "eval_losses", "eval_pose_providers",
        "eval_slams", "plot_period", "log_filters", "profile_dir",
        "checkpoint_period", "resume", "world_frame",
        # external SLAM / replay
        "slam", "slam_command", "odom_cov",
        # distribution (summarized by the mesh flag)
        "mesh_shape", "dist_coordinator", "dist_num_processes",
        "dist_process_id",
        # placement only
        "device",
        # the cache knob itself
        "prep_cache_dir",
    }
)


def _hash_update_array(h, a: np.ndarray) -> None:
    a = np.asarray(a)
    h.update(str(a.dtype.descr if a.dtype.names else a.dtype.str).encode())
    h.update(str(a.shape).encode())
    h.update(np.ascontiguousarray(a).tobytes())


def sequence_fingerprint(scans, cfg, mesh_active: bool, for_grad: bool) -> str:
    """Content fingerprint of one sequence's preparation inputs.

    :param scans: list of ``(structured_scan, pose4x4)`` as consumed by
        ``prepare_sequences`` (i.e. already filtered/noised/biased by the
        dataset wrappers).
    """
    h = hashlib.sha256()
    h.update(b"dctpu-prep-v%d" % CACHE_VERSION)
    for scan, pose in scans:
        _hash_update_array(h, scan)
        _hash_update_array(h, np.asarray(pose, np.float64))
    knobs = {
        k: v
        for k, v in sorted(vars(cfg).items())
        if k not in _PREP_IRRELEVANT
    }
    # The only preparation-relevant parts of the loss config.
    knobs["__icp_mode"] = cfg.loss == "icp_loss"
    if knobs["__icp_mode"]:
        knobs["__icp_inlier_ratio"] = float(
            (cfg.loss_kwargs or {}).get("icp_inlier_ratio", 0.5)
        )
    knobs["__mesh"] = bool(mesh_active)
    knobs["__for_grad"] = bool(for_grad)
    h.update(repr(knobs).encode())
    return h.hexdigest()[:32]


def _entry_path(cache_dir: str, fp: str) -> str:
    return os.path.join(cache_dir, "prep_%s.pkl" % fp)


def load_record(cache_dir: str, fp: str) -> Optional[dict]:
    """Load one per-sequence record; None on miss/corruption."""
    path = _entry_path(cache_dir, fp)
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            rec_np = pickle.load(f)
    except Exception as e:  # partial/corrupt entry: treat as a miss
        print("[prep-cache] unreadable entry %s (%s); rebuilding"
              % (path, e), file=sys.stderr)
        return None
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, rec_np)


def save_record(cache_dir: str, fp: str, rec: dict) -> None:
    """Atomically persist one per-sequence record (numpy-converted)."""
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    rec_np = jax.tree_util.tree_map(np.asarray, rec)
    fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(rec_np, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, _entry_path(cache_dir, fp))
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
