"""Probe Mosaic (v5e) lowering COST of precision-recovery variants for the
cellwin moment matmul.

The cellwin kernels need f32-class accuracy from (16, S) @ (S, R) f32
matmuls whose RHS is exact {0,1}. Mosaic lowers only DEFAULT (bf16 pass,
fast, 8-bit mantissa) and HIGHEST (measured 100x slower in the real
kernel). This probe times, on one chip, a kernel shaped like the real
forward loop (NS span dots accumulating into one acc tile) for:

- default: one bf16 pass (accuracy floor),
- highest: precision=HIGHEST on the dot,
- split2_cast: hi = x.astype(bf16).astype(f32); dot(hi) + dot(x - hi),
- split2_bits: hi = bitcast(bitcast(x, i32) & 0xFFFF0000, f32) — the same
  split via integer mantissa masking (no bf16 cast op; Mosaic's f32<->bf16
  casts may be the pathology, not the extra pass),
- split3_bits: three bitmask terms (f32-exact).

Prints ms per grid iteration for each variant; accuracy is checked against
an f64 host oracle on the same data.
"""
from __future__ import annotations

import sys
import time

import numpy as np

T1 = 512  # grid size (tiles)
NS = 5  # dots per tile (non-empty spans in the real kernel)
S = 640
R = 128
STEPS = 30


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    print("backend:", jax.default_backend(), file=sys.stderr)

    def bits_hi(x):
        return jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(x, jnp.int32)
            & jnp.int32(-65536),
            jnp.float32,
        )

    def make_kernel(variant):
        def kernel(a_ref, b_ref, o_ref):
            acc = jnp.zeros((16, R), jnp.float32)
            for s in range(NS):
                a = a_ref[s]
                b = b_ref[s]
                if variant == "default":
                    acc += jnp.dot(a, b, preferred_element_type=jnp.float32)
                elif variant == "highest":
                    acc += jnp.dot(
                        a, b, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                elif variant == "split2_cast":
                    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
                    acc += jnp.dot(hi, b, preferred_element_type=jnp.float32)
                    acc += jnp.dot(a - hi, b,
                                   preferred_element_type=jnp.float32)
                elif variant == "split2_bits":
                    hi = bits_hi(a)
                    acc += jnp.dot(hi, b, preferred_element_type=jnp.float32)
                    acc += jnp.dot(a - hi, b,
                                   preferred_element_type=jnp.float32)
                elif variant == "split3_bits":
                    hi = bits_hi(a)
                    rem = a - hi
                    mid = bits_hi(rem)
                    acc += jnp.dot(hi, b, preferred_element_type=jnp.float32)
                    acc += jnp.dot(mid, b, preferred_element_type=jnp.float32)
                    acc += jnp.dot(rem - mid, b,
                                   preferred_element_type=jnp.float32)
                else:
                    raise ValueError(variant)
            o_ref[:] = acc

        return kernel

    rng = np.random.default_rng(0)
    a_np = rng.normal(size=(NS, 16, S)).astype(np.float32)
    b_np = (rng.random((NS, S, R)) < 0.3).astype(np.float32)
    a = jnp.asarray(a_np)
    b = jnp.asarray(b_np)
    oracle = np.einsum(
        "sfi,sir->fr", a_np.astype(np.float64), b_np.astype(np.float64)
    )

    for variant in ("default", "highest", "split2_cast", "split2_bits",
                    "split3_bits"):
        try:
            fn = pl.pallas_call(
                make_kernel(variant),
                out_shape=jax.ShapeDtypeStruct((16, R), jnp.float32),
                grid=(T1,),
            )
            f = jax.jit(fn)
            out = np.asarray(f(a, b))
            rel = np.abs(out - oracle).max() / np.abs(oracle).max()
            # timed: T1 grid iterations per call
            t0 = time.perf_counter()
            for _ in range(STEPS):
                out_d = f(a, b)
            float(jnp.sum(out_d))
            ms = (time.perf_counter() - t0) / STEPS * 1e3
            print(
                "%-12s %8.3f ms/call (%d tiles x %d dots)  max rel err %.2e"
                % (variant, ms, T1, NS, rel)
            )
        except Exception as e:
            head = str(e).split("\n")[0][:160]
            print("%-12s FAILED: %s" % (variant, head))


if __name__ == "__main__":
    main()
