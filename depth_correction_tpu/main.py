"""Experiment orchestration CLI.

Re-design of the reference orchestrator (reference: src/depth_correction/
main.py:44-500):

    python -m depth_correction_tpu.main [--key value ...] -- <verb>

Verbs: ``print_config``, ``train``, ``eval_loss``, ``train_and_eval``,
``train_and_eval_all``, ``eval_loss_baselines``, ``bench``.

``train_and_eval_all`` runs the experiment grid
product(pose corrections, models, losses, dataset splits)
(reference: main.py:249-313), with per-experiment config dirs derived from
semantic descriptors, skip-if-exists resume (main.py:133-135), and optional
``launch_prefix`` subprocess fan-out for cluster schedulers
(main.py:140-157).
"""
from __future__ import annotations

import itertools
import os
import subprocess
import sys
from typing import List, Sequence

from .config import Config, Loss, Model, PoseCorrection, loss_eval_csv

__all__ = ["main", "create_splits"]


def create_splits(names: Sequence[str], num_splits: int = 4) -> List[dict]:
    """Rotating k-fold train/val/test splits over sequence names
    (reference: main.py:44-67): each fold uses one name as val, the next as
    test, the rest for training.
    """
    names = list(names)
    n = len(names)
    if n < 3:
        return [{"train_names": names, "val_names": names, "test_names": names}]
    splits = []
    step = max(n // num_splits, 1)
    for i in range(0, min(num_splits * step, n), step):
        val = [names[i % n]]
        test = [names[(i + 1) % n]]
        train = [x for x in names if x not in val + test]
        splits.append({"train_names": train, "val_names": val, "test_names": test})
    return splits


def eval_loss_baselines(cfg: Config):
    """Consistency losses of the *uncorrected* data on all subsets
    (reference: main.py:70-160): BaseModel, ground-truth poses."""
    from .eval import eval_loss_all

    base = cfg.copy()
    base.model_class = "BaseModel"
    base.model_state_dict = ""
    base.pose_correction = PoseCorrection.none
    return eval_loss_all(base)


def train_and_eval_all(cfg: Config, pose_corrections=None, models=None, losses=None):
    """Experiment grid (reference: main.py:240-313)."""
    from .train_and_eval import train_and_eval

    pose_corrections = pose_corrections or [cfg.pose_correction]
    models = models or list(Model)
    losses = losses or [l for l in Loss if l != "icp_loss"]
    names = cfg.train_names or cfg.test_names or cfg.val_names
    splits = create_splits(names)

    results = {}
    for i_exp, (pc, model, loss, (i_split, split)) in enumerate(
        itertools.product(pose_corrections, models, losses, enumerate(splits))
    ):
        exp_cfg = cfg.copy()
        exp_cfg.pose_correction = pc
        exp_cfg.model_class = model
        exp_cfg.loss = loss
        exp_cfg.from_dict(split)
        exp_cfg.log_dir = os.path.join(
            exp_cfg.get_exp_dir(), "split_%i" % i_split
        )

        done_marker = os.path.join(exp_cfg.log_dir, "best.yaml")
        if os.path.exists(done_marker) and not cfg.force:
            print("Experiment %s exists, skipping." % exp_cfg.log_dir)
            continue

        if cfg.launch_prefix:
            # Fan out as an independent job (reference: main.py:140-157).
            os.makedirs(exp_cfg.log_dir, exist_ok=True)
            cfg_path = os.path.join(exp_cfg.log_dir, "config.yaml")
            exp_cfg.to_yaml(cfg_path)
            launch_args = cfg.launch_prefix.format(
                log_dir=exp_cfg.log_dir, name="exp_%i" % i_exp
            ).split()
            cmd = launch_args + [
                sys.executable,
                "-m",
                "depth_correction_tpu.main",
                "--from-yaml",
                cfg_path,
                "--",
                "train_and_eval",
            ]
            print("Launching: %s" % " ".join(cmd))
            subprocess.run(cmd, check=True)
        else:
            results[(pc, model, loss, i_split)] = train_and_eval(exp_cfg)
    return results


def print_config(cfg: Config):
    print(cfg.to_yaml())


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" in argv:
        split_at = argv.index("--")
        cfg_args, verbs = argv[:split_at], argv[split_at + 1 :]
    else:
        cfg_args, verbs = argv, ["print_config"]

    cfg = Config()
    # --from-yaml loads a base config before the remaining overrides.
    if "--from-yaml" in cfg_args:
        i = cfg_args.index("--from-yaml")
        cfg.from_yaml(cfg_args[i + 1])
        cfg_args = cfg_args[:i] + cfg_args[i + 2 :]
    rest = cfg.from_args(cfg_args)
    if rest:
        print("Ignored arguments: %s" % rest, file=sys.stderr)
    cfg.sanitize()

    for verb in verbs:
        if verb == "print_config":
            print_config(cfg)
        elif verb == "train":
            from .train import train

            train(cfg)
        elif verb == "eval_loss":
            from .eval import eval_loss

            eval_loss(cfg)
        elif verb == "eval_loss_all":
            from .eval import eval_loss_all

            eval_loss_all(cfg)
        elif verb == "train_and_eval":
            from .train_and_eval import train_and_eval

            train_and_eval(cfg)
        elif verb == "train_and_eval_all":
            train_and_eval_all(cfg)
        elif verb == "eval_loss_baselines":
            eval_loss_baselines(cfg)
        elif verb == "eval_slam":
            from .config import slam_eval_csv
            from .slam_eval import eval_slam

            if not cfg.slam_eval_csv:
                cfg.slam_eval_csv = slam_eval_csv(cfg.log_dir, cfg.slam)
            eval_slam(cfg)
        elif verb == "eval_slam_baselines":
            from .config import slam_eval_csv
            from .slam_eval import eval_slam

            base = cfg.copy()
            base.model_class = "BaseModel"
            base.model_state_dict = ""
            if not base.slam_eval_csv:
                base.slam_eval_csv = slam_eval_csv(cfg.log_dir, cfg.slam)
            eval_slam(base, apply_correction=False)
        elif verb == "export_corrected":
            from .slam_eval import export_corrected_clouds

            export_corrected_clouds(cfg, os.path.join(cfg.log_dir, "corrected"))
        elif verb == "render_meshes":
            # Pre-render every rendered_mesh dataset's scans into the disk
            # cache (reference: main.py:396-453 fans this out as jobs).
            from .datasets import create_dataset

            names = [
                n
                for n in (cfg.train_names or [])
                + (cfg.val_names or [])
                + (cfg.test_names or [])
                if "rendered_mesh" in n or n.endswith((".obj", ".ply"))
            ]
            cache = os.path.join(cfg.out_dir, "cache", "rendered_mesh")
            for name in names:
                kw = (
                    {}
                    if "cache_dir" in (cfg.dataset_kwargs or {})
                    else {"cache_dir": cache}
                )
                ds = create_dataset(name, cfg, noisy=False, **kw)
                n = ds.render_all() if hasattr(ds, "render_all") else 0
                print("rendered %d scans for %s -> %s" % (n, name, cache))
        elif verb == "bench":
            import runpy

            runpy.run_path(
                os.path.join(os.path.dirname(__file__), "..", "bench.py"),
                run_name="__main__",
            )
        else:
            raise SystemExit("Unknown verb: %s" % verb)


if __name__ == "__main__":
    main()
