"""Depth-correction model families.

Functional re-design of the reference's ``torch.nn.Module`` models
(reference: src/depth_correction/model.py:70-354): each model is a small
frozen-dataclass *pytree of parameters* with pure methods

- ``bias(inc_angles)``      -> per-point depth bias,
- ``correct_depth(d, inc)`` -> corrected depth,
- ``inverse(d, inc)``       -> un-corrected depth (used to inject synthetic
  bias into datasets, reference: dataset.py:850-873),
- ``apply(cloud)``          -> new Cloud with corrected depth, applied only
  where ``cloud.mask`` holds (reference masks the correction to planar
  regions, model.py:250-261).

Because models are pytrees, they flow straight through jit/grad/optax; the
``trainable_mask`` companion marks which leaves the optimizer may update
(e.g. exponents are frozen unless ``learnable_exponents``).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.se3 import PPREC

from ..cloud import Cloud

__all__ = [
    "BaseModel",
    "InvCos",
    "Linear",
    "Polynomial",
    "ScaledInvCos",
    "ScaledPolynomial",
    "load_model",
    "model_by_name",
    "trainable_mask",
]


def _apply_masked(cloud: Cloud, depth_corr: jax.Array) -> Cloud:
    """New cloud with corrected depth on masked points only."""
    if cloud.mask is not None:
        depth_corr = jnp.where(cloud.mask, depth_corr, cloud.depth)
    return cloud.replace(depth=depth_corr, points=None)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BaseModel:
    """Identity correction (reference: model.py:70-98)."""

    def bias(self, inc_angles: jax.Array) -> jax.Array:
        return jnp.zeros_like(inc_angles)

    def correct_depth(self, depth: jax.Array, inc_angles: jax.Array) -> jax.Array:
        return depth

    def inverse_depth(self, depth: jax.Array, inc_angles: jax.Array) -> jax.Array:
        return depth

    def apply(self, cloud: Cloud) -> Cloud:
        return _apply_masked(
            cloud, self.correct_depth(cloud.depth, cloud.inc_angles)
        )

    def inverse(self, cloud: Cloud) -> Cloud:
        return _apply_masked(
            cloud, self.inverse_depth(cloud.depth, cloud.inc_angles)
        )

    def __call__(self, cloud: Cloud) -> Cloud:
        return self.apply(cloud)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Linear(BaseModel):
    """depth' = w0 * depth + w1 * inc_angle + b (reference: model.py:113-146)."""

    w0: jax.Array = dataclasses.field(default_factory=lambda: jnp.asarray(1.0))
    w1: jax.Array = dataclasses.field(default_factory=lambda: jnp.asarray(0.0))
    b: jax.Array = dataclasses.field(default_factory=lambda: jnp.asarray(0.0))

    def correct_depth(self, depth, inc_angles):
        return self.w0 * depth + self.w1 * inc_angles + self.b

    def inverse_depth(self, depth, inc_angles):
        return (depth - self.w1 * inc_angles - self.b) / self.w0

    def __str__(self):
        return "Linear(%.6g, %.6g, %.6g)" % (
            float(self.w0),
            float(self.w1),
            float(self.b),
        )


def _poly_bias(
    w: jax.Array,
    exponent: jax.Array,
    inc_angles: jax.Array,
    learnable_exponents: bool = False,
) -> jax.Array:
    """bias = sum_i w_i * gamma^e_i (reference: model.py:172-177).

    Shapes: w, exponent (E,), inc_angles (..., N) -> (..., N). The powers ->
    weights contraction is a matmul, so it lands on the MXU for large N.
    Exponents are stop-gradient unless learnable (reference freezes them by
    default, model.py:170) so plain optimizers cannot drift them.
    """
    if not learnable_exponents:
        exponent = jax.lax.stop_gradient(exponent)
    x = jnp.power(inc_angles[..., None], exponent)  # (..., N, E)
    # Full-f32 passes: the bias is the QUANTITY BEING ESTIMATED (1e-3
    # scale); a default bf16 pass would quantize it to ~8 mantissa bits
    # (ops/se3.py PPREC).
    return jnp.matmul(x, w, precision=PPREC)  # (..., N)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Polynomial(BaseModel):
    """depth' = depth - sum_i w_i * gamma^e_i (reference: model.py:149-215)."""

    w: jax.Array = dataclasses.field(default_factory=lambda: jnp.zeros(2))
    exponent: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray([2.0, 4.0])
    )
    learnable_exponents: bool = dataclasses.field(
        default=False, metadata={"static": True}
    )

    def bias(self, inc_angles):
        return _poly_bias(
            self.w, self.exponent, inc_angles, self.learnable_exponents
        )

    def correct_depth(self, depth, inc_angles):
        return depth - self.bias(inc_angles)

    def inverse_depth(self, depth, inc_angles):
        # Exact inverse of the subtractive correction. (The reference's
        # unmasked Polynomial.inverse divides by (1 - bias) — model.py:197 —
        # which is ScaledPolynomial's inverse; we keep the algebraically
        # correct form, matching its masked branch, model.py:202.)
        return depth + self.bias(inc_angles)

    def __str__(self):
        return "Polynomial(%s)" % ", ".join(
            "%.6gx^%.6g" % (float(w), float(e))
            for w, e in zip(jnp.ravel(self.w), jnp.ravel(self.exponent))
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScaledPolynomial(BaseModel):
    """depth' = depth * (1 - sum_i w_i * gamma^e_i) (reference: model.py:218-286)."""

    w: jax.Array = dataclasses.field(default_factory=lambda: jnp.zeros(2))
    exponent: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray([2.0, 4.0])
    )
    learnable_exponents: bool = dataclasses.field(
        default=False, metadata={"static": True}
    )

    def bias(self, inc_angles):
        return _poly_bias(
            self.w, self.exponent, inc_angles, self.learnable_exponents
        )

    def correct_depth(self, depth, inc_angles):
        return depth * (1.0 - self.bias(inc_angles))

    def inverse_depth(self, depth, inc_angles):
        return depth / (1.0 - self.bias(inc_angles))

    def __str__(self):
        return "ScaledPolynomial(%s)" % ", ".join(
            "%.6gx^%.6g" % (float(w), float(e))
            for w, e in zip(jnp.ravel(self.w), jnp.ravel(self.exponent))
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class InvCos(BaseModel):
    """depth' = depth - p0 / cos(gamma) (reference: model.py:289-313)."""

    p0: jax.Array = dataclasses.field(default_factory=lambda: jnp.asarray(0.0))

    def bias(self, inc_angles):
        return self.p0 / jnp.cos(inc_angles)

    def correct_depth(self, depth, inc_angles):
        return depth - self.bias(inc_angles)

    def inverse_depth(self, depth, inc_angles):
        return depth + self.bias(inc_angles)

    def __str__(self):
        return "InvCos(%.6g)" % float(self.p0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScaledInvCos(BaseModel):
    """depth' = depth * (1 - p0 / |cos(gamma)|) (reference: model.py:316-349)."""

    p0: jax.Array = dataclasses.field(default_factory=lambda: jnp.asarray(0.0))

    def bias(self, inc_angles):
        return self.p0 / jnp.abs(jnp.cos(inc_angles))

    def correct_depth(self, depth, inc_angles):
        return depth * (1.0 - self.bias(inc_angles))

    def inverse_depth(self, depth, inc_angles):
        return depth / (1.0 - self.bias(inc_angles))

    def __str__(self):
        return "ScaledInvCos(%.6g)" % float(self.p0)


_MODELS = {
    "BaseModel": BaseModel,
    "Linear": Linear,
    "InvCos": InvCos,
    "Polynomial": Polynomial,
    "ScaledInvCos": ScaledInvCos,
    "ScaledPolynomial": ScaledPolynomial,
}


def model_by_name(name: str):
    """Whitelisted model lookup (reference: model.py:352-354)."""
    if name not in _MODELS:
        raise ValueError("Unknown model: %s" % name)
    return _MODELS[name]


def _coerce(cls, kwargs: dict, dtype=None):
    """Normalize constructor kwargs (lists -> arrays, legacy p0/p1)."""
    kwargs = dict(kwargs)
    kwargs.pop("device", None)
    if cls in (Polynomial, ScaledPolynomial):
        # Legacy two-term form: p0, p1 with exponents (2, 4)
        # (reference: model.py:151-160).
        p0 = kwargs.pop("p0", None)
        p1 = kwargs.pop("p1", None)
        if "exponent" not in kwargs and (p0 is not None or p1 is not None):
            kwargs["w"] = [p0 or 0.0, p1 or 0.0]
            kwargs["exponent"] = [2.0, 4.0]
        if "w" in kwargs and kwargs["w"] is not None:
            w = kwargs["w"]
            if isinstance(w, float):
                w = [w]
            kwargs["w"] = jnp.asarray(w, dtype=dtype).ravel()
        if "exponent" in kwargs and kwargs["exponent"] is not None:
            kwargs["exponent"] = jnp.asarray(kwargs["exponent"], dtype=dtype).ravel()
            if kwargs.get("w") is None or "w" not in kwargs:
                kwargs["w"] = jnp.zeros_like(kwargs["exponent"])
    for k in ("w0", "w1", "b", "p0"):
        if k in kwargs and kwargs[k] is not None:
            kwargs[k] = jnp.asarray(kwargs[k], dtype=dtype)
    return {k: v for k, v in kwargs.items() if v is not None}


def load_model(
    class_name: Optional[str] = None,
    model_args: Optional[Sequence] = None,
    model_kwargs: Optional[dict] = None,
    state_dict=None,
    cfg=None,
    dtype=None,
):
    """Construct a model from config and/or a saved state
    (reference: model.py:19-67). ``state_dict`` may be a path to a saved
    checkpoint (see :mod:`depth_correction_tpu.utils.checkpoint`) or a dict
    of parameter arrays.
    """
    if cfg is not None:
        class_name = class_name or cfg.model_class
        if model_args is None:
            model_args = list(cfg.model_args or [])
        if model_kwargs is None:
            model_kwargs = dict(cfg.model_kwargs or {})
        if state_dict is None:
            state_dict = cfg.model_state_dict
        if dtype is None:
            dtype = cfg.jax_float_type()
    cls = model_by_name(class_name)
    model = cls(*(model_args or []), **_coerce(cls, model_kwargs or {}, dtype))

    if isinstance(state_dict, str) and state_dict:
        from ..utils.checkpoint import load_pytree

        state_dict = load_pytree(state_dict)
    if state_dict:
        model = dataclasses.replace(
            model, **_coerce(cls, dict(state_dict), dtype)
        )
    return model


def trainable_mask(model) -> "BaseModel":
    """Pytree of booleans marking optimizer-updatable leaves.

    Exponents stay frozen unless ``learnable_exponents``
    (reference: model.py:170, 241).
    """
    def leaf_mask(path, leaf):
        name = path[-1].name if path else ""
        if name == "exponent":
            return bool(getattr(model, "learnable_exponents", False))
        return True

    return jax.tree_util.tree_map_with_path(leaf_mask, model)
