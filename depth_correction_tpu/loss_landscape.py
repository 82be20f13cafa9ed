"""Loss-landscape sweeps over model parameters.

Re-design of the reference's landscape probe (reference: src/depth_correction/
loss_landscape.py:102-217): sweep a model weight over a grid with FROZEN
neighborhoods and evaluate the loss at every value. TPU-first: the whole
sweep is ONE vmap'd program — all grid points evaluate in a single launch
instead of a Python loop re-entering the pipeline per value.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .train import TrainData, make_loss_fn, prepare_sequences

__all__ = ["loss_landscape", "sweep_weight"]


def sweep_weight(
    cfg: Config,
    data: TrainData,
    weights: Sequence[float],
    exponent: Optional[Sequence[float]] = None,
    weight_index: int = 0,
):
    """Loss at each scalar weight value, one vmapped evaluation.

    :param weights: grid of values for w[weight_index] (the reference sweeps
        e.g. 21 points in +-0.005, loss_landscape.py:132).
    :return: (weights, losses) numpy arrays.
    """
    from .models import load_model
    import dataclasses

    base = load_model(cfg=cfg)
    exponent = jnp.asarray(
        exponent if exponent is not None else np.asarray(base.exponent)
    )
    w0 = jnp.asarray(np.asarray(base.w), dtype=cfg.jax_float_type())
    loss_fn = make_loss_fn(cfg)
    from .train import bind_cellwin_static

    # Cell-window graphs (if any) ride the closure (35-220x vs arguments).
    loss_fn, data = bind_cellwin_static(loss_fn, data)

    def at(w_scalar, d):
        w = w0.at[weight_index].set(w_scalar)
        model = dataclasses.replace(base, w=w, exponent=exponent)
        return loss_fn({"model": model}, d)

    grid = jnp.asarray(np.asarray(weights), dtype=cfg.jax_float_type())
    # The (gather) TrainData tables flow through the jit boundary as
    # ARGUMENTS — captured as closure constants they get literal-pooled
    # into the HLO (~7000x slower on TPU, HTTP 413 from the remote
    # compiler; CLAUDE.md).
    losses = jax.jit(
        lambda g, d: jax.vmap(lambda w: at(w, d))(g)
    )(grid, data)
    return np.asarray(grid), np.asarray(losses)


def loss_landscape(
    cfg: Config,
    datasets=None,
    weights: Optional[Sequence[float]] = None,
    **sweep_kwargs,
):
    """Prepare data (frozen neighborhoods) and sweep; returns (w, loss).

    The sanity property this probes (reference: loss_landscape.py:148-209):
    with a known injected bias the loss minimum should sit at the GT weight.
    """
    from .datasets import create_dataset

    if datasets is None:
        datasets = [create_dataset(n, cfg) for n in cfg.train_names]
    data = prepare_sequences(datasets, cfg)
    if weights is None:
        weights = np.linspace(-0.005, 0.005, 21)
    return sweep_weight(cfg, data, weights, **sweep_kwargs)
