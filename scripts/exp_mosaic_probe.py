"""Probe which vector ops Mosaic (Pallas TPU) lowers on this chip.

Each probe is one tiny pallas_call compiled (and run) on the real TPU via
the remote compiler; failures print the Mosaic error head instead of
crashing the sweep. Used to shape the cellwin kernel rewrite (the
interpret-mode CPU tests cannot see lowering failures).
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, R = 512, 128


def run(name, kernel, out_shape):
    try:
        fn = pl.pallas_call(kernel, out_shape=out_shape)
        x = jnp.arange(8 * S, dtype=jnp.float32).reshape(8, S)
        r = np.asarray(jax.jit(fn)(x))
        print("OK   %s  (sum %.3e)" % (name, float(r.sum())))
    except Exception as e:
        msg = str(e).split("\n")
        head = next((l for l in msg if "tpu." in l or "error" in l.lower()), msg[0])
        print("FAIL %s: %s" % (name, head[:200]))


o_sr = jax.ShapeDtypeStruct((S, R), jnp.float32)
o_s8 = jax.ShapeDtypeStruct((S, 8), jnp.float32)


def k_reshape_f32(x_ref, o_ref):
    row = x_ref[0:1, :]  # (1, S) f32
    col = row.reshape(S, 1)
    o_ref[:] = col + jnp.zeros((S, R), jnp.float32)


def k_iota_col(x_ref, o_ref):
    ln = x_ref[0, 0].astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    m = (col < ln).astype(jnp.float32)  # (S, 1) via column iota, no reshape
    o_ref[:] = m + jnp.zeros((S, R), jnp.float32)


def k_iota_col_full(x_ref, o_ref):
    ln = x_ref[0, 0].astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, R), 0)
    o_ref[:] = (col < ln).astype(jnp.float32)


def k_bool_reshape(x_ref, o_ref):
    ln = x_ref[0, 0].astype(jnp.int32)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1) < ln  # (1, S) i1
    col = row.reshape(S, 1)
    o_ref[:] = col.astype(jnp.float32) + jnp.zeros((S, R), jnp.float32)


def k_dot_tlhs(x_ref, o_ref):
    a = x_ref[:, :]  # (8, S)
    b = jnp.ones((8, R), jnp.float32)
    # contract dim 0 of both: aT @ b -> (S, R)
    o_ref[:] = jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)


def k_transpose_f32(x_ref, o_ref):
    o_ref[:] = x_ref[:, :].T  # (8, S) -> (S, 8)


def k_broadcast_row_to_col(x_ref, o_ref):
    # jnp.broadcast_to a (1, S) row into (R, S), then transpose -> (S, R)
    row = x_ref[0:1, :]
    o_ref[:] = jnp.broadcast_to(row, (R, S)).T


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    run("f32 (1,S)->(S,1) reshape", k_reshape_f32, o_sr)
    run("i32 column iota (S,1) + bcast", k_iota_col, o_sr)
    run("i32 column iota full (S,R)", k_iota_col_full, o_sr)
    run("bool (1,S)->(S,1) reshape", k_bool_reshape, o_sr)
    run("dot_general transposed lhs (8,S)x(8,R)->(S,R)", k_dot_tlhs, o_sr)
    run("f32 (8,S)->(S,8) transpose", k_transpose_f32, o_s8)
    run("f32 (1,S) bcast (R,S) -> T (S,R)", k_broadcast_row_to_col, o_sr)


if __name__ == "__main__":
    main()
