"""Probe 4: continue the probe-3 bisection toward the REAL cellwin forward
kernel. On top of probe3's E (ANY+DMA+scalar-prefetch+epilogue), add:

  F  moving blocks     q/out BlockSpecs index per-tile ((0, t)) instead of
                       revisiting block (0, 0)
  G  ctr broadcasts    per-tile scalar prefetch values broadcast into the
                       vector compute (cx/cy/cz shifts, like the kernel)
  H  lead masks        two-sided (col >= lead) & (col < lead + ln) masks
                       from a second prefetch table
  I  NS=15             the real span-slot count
  J  all of the above  == the real forward kernel modulo data

Each kernel does NS split3_bits dots of (16, S) @ (S, R) per grid step.
"""
from __future__ import annotations

import sys
import time

import numpy as np

T1 = 512
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

    def make_variant(ns, moving, ctr_bcast, lead_mask):
        def kernel(start_ref, lead_ref, len_ref, ctr_ref, big_ref, q_ref,
                   o_ref, win_ref, sems):
            t = pl.program_id(0)
            for s in range(ns):
                @pl.when(len_ref[t * ns + s] > 0)
                def _(s=s):
                    pltpu.make_async_copy(
                        big_ref.at[:, pl.ds(
                            pl.multiple_of(start_ref[t * ns + s], 128), S)],
                        win_ref.at[s], sems.at[s],
                    ).start()

            q = q_ref[:]
            if ctr_bcast:
                cx = ctr_ref[t * 3 + 0].astype(jnp.float32)
                cy = ctr_ref[t * 3 + 1].astype(jnp.float32)
                cz = ctr_ref[t * 3 + 2].astype(jnp.float32)
            else:
                cx = cy = cz = jnp.float32(0.0)
            qx = q[0:1, :] - cx
            qy = q[1:2, :] - cy
            qz = q[2:3, :] - cz

            acc = jnp.zeros((16, R), jnp.float32)
            for s in range(ns):
                ln = len_ref[t * ns + s]
                lead = lead_ref[t * ns + s]

                @pl.when(ln > 0)
                def _(s=s):
                    pltpu.make_async_copy(
                        big_ref.at[:, pl.ds(
                            pl.multiple_of(start_ref[t * ns + s], 128), S)],
                        win_ref.at[s], sems.at[s],
                    ).wait()
                w8 = win_ref[s]
                col = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
                if lead_mask:
                    sl = (col >= lead) & (col < lead + ln)
                else:
                    sl = col < ln
                ex = (w8[3:4, :] - cx).reshape(S, 1)
                ey = (w8[4:5, :] - cy).reshape(S, 1)
                ez = (w8[5:6, :] - cz).reshape(S, 1)
                d2 = (ex - qx) ** 2 + (ey - qy) ** 2 + (ez - qz) ** 2
                wm = jnp.where((d2 <= 0.0625) & sl, jnp.float32(1.0),
                               jnp.float32(0.0))
                x0 = w8[0:1, :] - cx
                x1 = w8[1:2, :] - cy
                x2 = w8[2:3, :] - cz
                one = jnp.ones_like(x0)
                feats = jnp.concatenate(
                    [one, x0, x1, x2, x0 * x0, x1 * x1, x2 * x2,
                     x0 * x1, x0 * x2, x1 * x2,
                     jnp.zeros((6, S), jnp.float32)],
                    axis=0,
                )
                row = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
                if lead_mask:
                    feats = jnp.where((row >= lead) & (row < lead + ln),
                                      feats, 0.0)
                else:
                    feats = jnp.where(row < ln, feats, 0.0)
                acc = acc + split3_dot(feats, wm)
            o_ref[:] = epilogue(acc)

        if moving:
            q_spec = pl.BlockSpec((8, R), lambda t, *_: (0, t),
                                  memory_space=pltpu.VMEM)
            o_spec = pl.BlockSpec((16, R), lambda t, *_: (0, t),
                                  memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((16, T1 * R), jnp.float32)
        else:
            q_spec = pl.BlockSpec((8, R), lambda t, *_: (0, 0),
                                  memory_space=pltpu.VMEM)
            o_spec = pl.BlockSpec((16, R), lambda t, *_: (0, 0),
                                  memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((16, R), jnp.float32)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4, grid=(T1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), q_spec],
            out_specs=o_spec,
            scratch_shapes=[pltpu.VMEM((ns, 8, S), jnp.float32),
                            pltpu.SemaphoreType.DMA((ns,))],
        )
        return pl.pallas_call(kernel, out_shape=out_shape, grid_spec=gs), ns

    rng = np.random.default_rng(0)
    big = jnp.asarray(
        rng.normal(scale=0.2, size=(8, T1 * 256 + S)).astype(np.float32))

    def run(name, ns, moving, ctr_bcast, lead_mask):
        starts = jnp.asarray(
            (rng.integers(0, T1 * 2, T1 * ns) * 128).astype(np.int32))
        leads = jnp.asarray(
            (rng.integers(0, 1, T1 * ns) * 0).astype(np.int32))
        lens = jnp.asarray(np.full(T1 * ns, S - 37, np.int32))
        ctrs = jnp.asarray(
            rng.normal(scale=0.1, size=T1 * 3).astype(np.float32))
        qw = (8, T1 * R) if moving else (8, R)
        q = jnp.asarray(rng.normal(scale=0.2, size=qw).astype(np.float32))
        try:
            call, _ = make_variant(ns, moving, ctr_bcast, lead_mask)
            f = jax.jit(call)
            out = f(starts, leads, lens, ctrs, big, q)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(STEPS):
                out = f(starts, leads, lens, ctrs, big, q)
            float(jnp.asarray(out).sum())
            ms = (time.perf_counter() - t0) / STEPS * 1e3
            print("%-22s %9.3f ms/call" % (name, ms))
        except Exception as e:
            print("%-22s FAILED: %s" % (name, str(e).split("\n")[0][:140]))

    run("E_base(ns5)", 5, False, False, False)
    run("F_moving_blocks", 5, True, False, False)
    run("G_ctr_broadcast", 5, False, True, False)
    run("H_lead_masks", 5, False, False, True)
    run("I_ns15", 15, False, False, False)
    run("J_all", 15, True, True, True)


if __name__ == "__main__":
    main()
