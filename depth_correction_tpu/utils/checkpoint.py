"""Pytree checkpointing.

Best-model checkpoints hold (model params, pose deltas, updated poses)
like the reference's ``torch.save`` triple (reference: train.py:244-259),
stored as a compressed ``.npz`` of flattened pytree leaves plus a structure
descriptor — dependency-free and readable from plain numpy.
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree"]


def _flatten_with_paths(tree: Any):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(
            str(getattr(p, "name", getattr(p, "key", getattr(p, "idx", p))))
            for p in path
        )
        out[key or "value"] = np.asarray(leaf)
    return out


def save_pytree(path: str, tree: Any) -> str:
    """Save leaves as npz; nested dict/dataclass paths become flat keys."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves = _flatten_with_paths(tree)
    np.savez_compressed(path, **leaves)
    return path


def load_pytree(path: str) -> dict:
    """Load a checkpoint as a flat {path: array} dict.

    Consumers (e.g. ``models.load_model``) match keys by trailing name, so
    a checkpoint written from a dataclass restores into constructor kwargs.
    """
    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as data:
        return {k.split("/")[-1]: data[k] for k in data.files}


def save_json(path: str, obj: Any) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, default=float)
    return path
