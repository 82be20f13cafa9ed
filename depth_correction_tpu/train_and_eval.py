"""Train then evaluate the best model (reference: src/depth_correction/
train_and_eval.py:8-30)."""
from __future__ import annotations

from .config import Config
from .eval import eval_loss_all
from .train import train

__all__ = ["train_and_eval"]


def train_and_eval(cfg: Config):
    """train -> eval_loss_all(best); returns (best_cfg, eval results)."""
    best_cfg = train(cfg)
    if best_cfg is None:
        best_cfg = cfg
    results = eval_loss_all(best_cfg)
    return best_cfg, results
