"""Probe 3: bisect WHICH structural factor of the real cellwin forward
kernel defeats Mosaic's fast lowering of the split-precision dots.

probe2 (plain refs, unconditional compute, split3_bits) ran at probe
speed; the real kernel with the same dot code measured 3586 ms/step. The
candidate factors, added one at a time on top of the probe2 baseline:

  A  baseline          probe2 structure (refs in VMEM via BlockSpec)
  B  +scalar prefetch  PrefetchScalarGridSpec with i32 span tables
  C  +ANY + DMA        big table in memory_space=ANY, spans DMA'd into a
                       VMEM scratch with pl.when-guarded start/wait
  D  +epilogue         the division/concat epilogue on the acc
  E  +all              C + B + D together (the real kernel's shape)

Each kernel does NS split3_bits dots of (16, S) @ (S, R) per grid step.
"""
from __future__ import annotations

import sys
import time

import numpy as np

T1 = 512
NS = 5
S = 640
R = 128
STEPS = 20


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.default_backend(), file=sys.stderr)

    def bits_hi(x):
        return jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(x, jnp.int32) & jnp.int32(-65536),
            jnp.float32,
        )

    def split3_dot(a, b):
        hi = bits_hi(a)
        rem = a - hi
        mid = bits_hi(rem)
        acc = jnp.dot(hi, b, preferred_element_type=jnp.float32)
        acc += jnp.dot(mid, b, preferred_element_type=jnp.float32)
        acc += jnp.dot(rem - mid, b, preferred_element_type=jnp.float32)
        return acc

    def compute(w8s, q, ln):
        """The real kernel's per-span compute on (NS, 8, S) windows."""
        qx = q[0:1, :]
        qy = q[1:2, :]
        qz = q[2:3, :]
        acc = jnp.zeros((16, R), jnp.float32)
        for s in range(NS):
            w8 = w8s[s]
            col = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
            sl = col < ln
            ex = w8[3:4, :].reshape(S, 1)
            ey = w8[4:5, :].reshape(S, 1)
            ez = w8[5:6, :].reshape(S, 1)
            d2 = (ex - qx) ** 2 + (ey - qy) ** 2 + (ez - qz) ** 2
            wm = jnp.where((d2 <= 0.0625) & sl, jnp.float32(1.0),
                           jnp.float32(0.0))
            x0 = w8[0:1, :]
            x1 = w8[1:2, :]
            x2 = w8[2:3, :]
            one = jnp.ones_like(x0)
            zero = jnp.zeros_like(x0)
            feats = jnp.concatenate(
                [one, x0, x1, x2, x0 * x0, x1 * x1, x2 * x2,
                 x0 * x1, x0 * x2, x1 * x2,
                 jnp.concatenate([zero] * 6, axis=0)],
                axis=0,
            )
            row = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
            feats = jnp.where(row < ln, feats, 0.0)
            acc = acc + split3_dot(feats, wm)
        return acc

    def epilogue(acc):
        s0 = jnp.maximum(acc[0:1, :], 1e-12)
        m0 = acc[1:2, :] / s0
        m1 = acc[2:3, :] / s0
        m2 = acc[3:4, :] / s0
        den = jnp.maximum(acc[0:1, :] - 1.0, 1e-6)
        c00 = (acc[4:5, :] - s0 * m0 * m0) / den
        c11 = (acc[5:6, :] - s0 * m1 * m1) / den
        c22 = (acc[6:7, :] - s0 * m2 * m2) / den
        z = jnp.zeros_like(s0)
        return jnp.concatenate(
            [m0, m1, m2, c00, c11, c22, acc[7:8], acc[8:9], acc[9:10], s0,
             z, z, z, z, z, z], axis=0)

    rng = np.random.default_rng(0)
    win_np = rng.normal(scale=0.2, size=(NS, 8, S)).astype(np.float32)
    q_np = rng.normal(scale=0.2, size=(8, R)).astype(np.float32)
    big_np = rng.normal(scale=0.2, size=(8, T1 * 256 + S)).astype(np.float32)
    starts_np = (rng.integers(0, T1 * 2, T1 * NS) * 128).astype(np.int32)
    lens_np = np.full(T1 * NS, S - 37, np.int32)

    win = jnp.asarray(win_np)
    q = jnp.asarray(q_np)
    big = jnp.asarray(big_np)
    starts = jnp.asarray(starts_np)
    lens = jnp.asarray(lens_np)

    results = {}

    def bench(name, f, args):
        try:
            out = f(*args)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(STEPS):
                out = f(*args)
            float(jnp.asarray(out).sum())
            ms = (time.perf_counter() - t0) / STEPS * 1e3
            results[name] = ms
            print("%-18s %9.3f ms/call" % (name, ms))
        except Exception as e:
            print("%-18s FAILED: %s" % (name, str(e).split("\n")[0][:140]))

    # A: baseline (probe2 structure)
    def kA(win_ref, q_ref, o_ref):
        o_ref[:] = compute(win_ref[:], q_ref[:], jnp.int32(S - 37))

    fA = jax.jit(pl.pallas_call(
        kA, out_shape=jax.ShapeDtypeStruct((16, R), jnp.float32),
        grid=(T1,)))
    bench("A_baseline", fA, (win, q))

    # B: + scalar prefetch grid spec
    def kB(len_ref, win_ref, q_ref, o_ref):
        t = pl.program_id(0)
        o_ref[:] = compute(win_ref[:], q_ref[:], len_ref[t * NS])

    gsB = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(T1,),
        in_specs=[pl.BlockSpec((NS, 8, S), lambda t, l: (0, 0, 0)),
                  pl.BlockSpec((8, R), lambda t, l: (0, 0))],
        out_specs=pl.BlockSpec((16, R), lambda t, l: (0, 0)),
    )
    fB = jax.jit(pl.pallas_call(
        kB, out_shape=jax.ShapeDtypeStruct((16, R), jnp.float32),
        grid_spec=gsB))
    bench("B_scalar_prefetch", fB, (lens, win, q))

    # C: + ANY memory space + DMA'd scratch windows
    def kC(start_ref, len_ref, big_ref, q_ref, o_ref, win_ref, sems):
        t = pl.program_id(0)
        for s in range(NS):
            @pl.when(len_ref[t * NS + s] > 0)
            def _(s=s):
                pltpu.make_async_copy(
                    big_ref.at[:, pl.ds(
                        pl.multiple_of(start_ref[t * NS + s], 128), S)],
                    win_ref.at[s], sems.at[s],
                ).start()
        for s in range(NS):
            @pl.when(len_ref[t * NS + s] > 0)
            def _(s=s):
                pltpu.make_async_copy(
                    big_ref.at[:, pl.ds(
                        pl.multiple_of(start_ref[t * NS + s], 128), S)],
                    win_ref.at[s], sems.at[s],
                ).wait()
        o_ref[:] = compute(win_ref[:], q_ref[:], len_ref[t * NS])

    gsC = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(T1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((8, R), lambda t, a, b: (0, 0))],
        out_specs=pl.BlockSpec((16, R), lambda t, a, b: (0, 0)),
        scratch_shapes=[pltpu.VMEM((NS, 8, S), jnp.float32),
                        pltpu.SemaphoreType.DMA((NS,))],
    )
    fC = jax.jit(pl.pallas_call(
        kC, out_shape=jax.ShapeDtypeStruct((16, R), jnp.float32),
        grid_spec=gsC))
    bench("C_any_dma", fC, (starts, lens, big, q))

    # D: baseline + epilogue
    def kD(win_ref, q_ref, o_ref):
        o_ref[:] = epilogue(compute(win_ref[:], q_ref[:], jnp.int32(S - 37)))

    fD = jax.jit(pl.pallas_call(
        kD, out_shape=jax.ShapeDtypeStruct((16, R), jnp.float32),
        grid=(T1,)))
    bench("D_epilogue", fD, (win, q))

    # E: everything (C + epilogue)
    def kE(start_ref, len_ref, big_ref, q_ref, o_ref, win_ref, sems):
        t = pl.program_id(0)
        for s in range(NS):
            @pl.when(len_ref[t * NS + s] > 0)
            def _(s=s):
                pltpu.make_async_copy(
                    big_ref.at[:, pl.ds(
                        pl.multiple_of(start_ref[t * NS + s], 128), S)],
                    win_ref.at[s], sems.at[s],
                ).start()
        for s in range(NS):
            @pl.when(len_ref[t * NS + s] > 0)
            def _(s=s):
                pltpu.make_async_copy(
                    big_ref.at[:, pl.ds(
                        pl.multiple_of(start_ref[t * NS + s], 128), S)],
                    win_ref.at[s], sems.at[s],
                ).wait()
        o_ref[:] = epilogue(
            compute(win_ref[:], q_ref[:], len_ref[t * NS]))

    fE = jax.jit(pl.pallas_call(
        kE, out_shape=jax.ShapeDtypeStruct((16, R), jnp.float32),
        grid_spec=gsC))
    bench("E_all", fE, (starts, lens, big, q))


if __name__ == "__main__":
    main()
