"""Probe which dynamic-gather forms Mosaic accepts, and whether the index
space is the full array (global lookup) or tile-local."""
from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)

    def try_case(name, kernel, out_shape, *args):
        try:
            out = pl.pallas_call(
                kernel,
                out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*args)
            return np.asarray(out)
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print("%-34s FAIL  %s" % (name, msg))
            return None

    # A: same-shape take_along_axis over lanes, small (8, 256)
    x = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 256, (8, 256)), jnp.int32)

    def kA(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    out = try_case("A lanes same-shape (8,256)", kA,
                   jax.ShapeDtypeStruct((8, 256), jnp.float32), x, idx)
    if out is not None:
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
        print("A lanes same-shape (8,256)         OK  err %.1e"
              % np.max(np.abs(out - ref)))

    # B: same-shape along lanes, BIG lane dim (8, 131072) — is the index
    # space the whole lane axis (multi-tile)?
    n = 131072
    x = jnp.asarray(rng.normal(size=(8, n)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (8, n)), jnp.int32)
    out = try_case("B lanes same-shape (8,128k)", kA,
                   jax.ShapeDtypeStruct((8, n), jnp.float32), x, idx)
    if out is not None:
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
        print("B lanes same-shape (8,128k)        OK  err %.1e"
              % np.max(np.abs(out - ref)))

    # C: same-shape along sublanes (take_along_axis axis=0), (8, 256)
    x = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 8, (8, 256)), jnp.int32)

    def kC(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

    out = try_case("C sublanes same-shape (8,256)", kC,
                   jax.ShapeDtypeStruct((8, 256), jnp.float32), x, idx)
    if out is not None:
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=0)
        print("C sublanes same-shape (8,256)      OK  err %.1e"
              % np.max(np.abs(out - ref)))

    # D: DIFFERENT output width along lanes: x (8, 1024), idx (8, 256)
    x = jnp.asarray(rng.normal(size=(8, 1024)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 1024, (8, 256)), jnp.int32)
    out = try_case("D lanes narrow-out (1024->256)", kA,
                   jax.ShapeDtypeStruct((8, 256), jnp.float32), x, idx)
    if out is not None:
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
        print("D lanes narrow-out (1024->256)     OK  err %.1e"
              % np.max(np.abs(out - ref)))

    # E: 1-D lookup jnp.take(x (n,), idx (n,))
    n = 2048
    x1 = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    i1 = jnp.asarray(rng.integers(0, n, (n,)), jnp.int32)

    def kE(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take(x_ref[...], i_ref[...])

    out = try_case("E 1-D take (2048,)", kE,
                   jax.ShapeDtypeStruct((n,), jnp.float32), x1, i1)
    if out is not None:
        ref = np.asarray(x1)[np.asarray(i1)]
        print("E 1-D take (2048,)                 OK  err %.1e"
              % np.max(np.abs(out - ref)))


if __name__ == "__main__":
    main()
