"""Probe 2: the real-kernel interaction — weight matrix CONSTRUCTED
in-kernel (difference-form d2 + selects, like cellwin's forward), then the
moment dot in each precision variant.

exp_mosaic_dot_probe.py (operands straight from refs) measured default
SLOW (20 ms) and highest/splits FAST (1-2 ms) — the inverse of the real
kernel (default 97 ms/step vs highest 9810 ms/step). This probe rebuilds
the real kernel's dataflow shape to find which construct flips the cost.
"""
from __future__ import annotations

import sys
import time

import numpy as np

T1 = 512
NS = 5
S = 640
R = 128
STEPS = 30
R2 = 0.0625


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    print("backend:", jax.default_backend(), file=sys.stderr)

    def bits_hi(x):
        return jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(x, jnp.int32) & jnp.int32(-65536),
            jnp.float32,
        )

    def make_kernel(variant):
        def kernel(win_ref, q_ref, len_ref, o_ref):
            q = q_ref[:]  # (8, R)
            qx = q[0:1, :]
            qy = q[1:2, :]
            qz = q[2:3, :]
            acc = jnp.zeros((16, R), jnp.float32)
            for s in range(NS):
                w8 = win_ref[s]  # (8, S)
                ln = len_ref[s, 0]
                col = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
                sl = col < ln
                ex = w8[3:4, :].reshape(S, 1)
                ey = w8[4:5, :].reshape(S, 1)
                ez = w8[5:6, :].reshape(S, 1)
                dx = ex - qx
                dy = ey - qy
                dz = ez - qz
                d2 = dx * dx + dy * dy + dz * dz  # (S, R)
                wm = jnp.where(
                    (d2 <= R2) & sl, jnp.float32(1.0), jnp.float32(0.0)
                )
                cx = w8[0:1, :]
                cy = w8[1:2, :]
                cz = w8[2:3, :]
                one = jnp.ones_like(cx)
                feats = jnp.concatenate(
                    [one, cx, cy, cz, cx * cx, cy * cy, cz * cz,
                     cx * cy, cx * cz, cy * cz,
                     jnp.zeros((6, S), jnp.float32)],
                    axis=0,
                )  # (16, S)
                row = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
                feats = jnp.where(row < ln, feats, 0.0)
                if variant == "default":
                    acc += jnp.dot(feats, wm,
                                   preferred_element_type=jnp.float32)
                elif variant == "highest":
                    acc += jnp.dot(
                        feats, wm, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                elif variant == "split2_bits":
                    hi = bits_hi(feats)
                    acc += jnp.dot(hi, wm,
                                   preferred_element_type=jnp.float32)
                    acc += jnp.dot(feats - hi, wm,
                                   preferred_element_type=jnp.float32)
                elif variant == "split3_bits":
                    hi = bits_hi(feats)
                    rem = feats - hi
                    mid = bits_hi(rem)
                    acc += jnp.dot(hi, wm,
                                   preferred_element_type=jnp.float32)
                    acc += jnp.dot(mid, wm,
                                   preferred_element_type=jnp.float32)
                    acc += jnp.dot(rem - mid, wm,
                                   preferred_element_type=jnp.float32)
                elif variant == "wm_bits_split3":
                    # split the FEATURES; wm is exact {0,1} already
                    hi = bits_hi(feats)
                    rem = feats - hi
                    mid = bits_hi(rem)
                    lo = rem - mid
                    acc += jnp.dot(hi + mid + lo, wm,
                                   preferred_element_type=jnp.float32)
                else:
                    raise ValueError(variant)
            o_ref[:] = acc

        return kernel

    rng = np.random.default_rng(0)
    win_np = rng.normal(scale=0.2, size=(NS, 8, S)).astype(np.float32)
    q_np = rng.normal(scale=0.2, size=(8, R)).astype(np.float32)
    len_np = np.full((NS, 1), S - 37, np.int32)
    win = jnp.asarray(win_np)
    q = jnp.asarray(q_np)
    ln = jnp.asarray(len_np)

    for variant in ("default", "highest", "split2_bits", "split3_bits",
                    "wm_bits_split3"):
        try:
            fn = pl.pallas_call(
                make_kernel(variant),
                out_shape=jax.ShapeDtypeStruct((16, R), jnp.float32),
                grid=(T1,),
            )
            f = jax.jit(fn)
            out = f(win, q, ln)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(STEPS):
                out = f(win, q, ln)
            float(jnp.sum(out))
            ms = (time.perf_counter() - t0) / STEPS * 1e3
            print("%-16s %8.3f ms/call" % (variant, ms))
        except Exception as e:
            head = str(e).split("\n")[0][:160]
            print("%-16s FAILED: %s" % (variant, head))


if __name__ == "__main__":
    main()
