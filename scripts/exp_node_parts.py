"""Attribute the online corrector's per-scan latency (node.py slab path).

bench.py r5 measured the fused slab program at 113.7 ms/scan (48.8k kept
points) — 6.4x over the reference callback where VERDICT item 1 asks for
>=20x. This harness times the program's stages in isolation on the SAME
scan (the cached bench node scan) so the redesign targets the dominant
term instead of guessing:

  P1 filter program              (depth + voxel masks)
  P2 grid_sort_traced, one pass  (bbox + coarsen + argsort + takes)
  P3 slab_window_moments         (the lax.scan over 128-query tiles)
  P4 unsort (argsort(order) + take of the packed (11, N) table)
  P5 feature tail + model apply  (_apply_from_moments)
  P0 full program                (reference point; 2 passes of P2+P3+P4)

Phantom-safe: chained dependent calls, one float() materialization per
timed loop (CLAUDE.md TPU timing rules).

Usage: DC_BENCH_CACHE=/tmp/bench_workload.pkl python scripts/exp_node_parts.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("DC_NODE_PARTS_REPS", "10"))


def timed(name, fn, reps=REPS):
    """fn(tok) -> (out, tok'); times reps chained calls."""
    import jax
    import jax.numpy as jnp

    out, tok = fn(jnp.zeros((), jnp.float32))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out, tok = fn(tok)
    _ = float(tok)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print("%-44s %9.2f ms" % (name, ms), flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(
            "~/.cache/jax_dctpu_tpu" if jax.default_backend() == "tpu"
            else "~/.cache/jax_dctpu_cpu"),
    )
    print("[node-parts] backend:", jax.default_backend(), flush=True)

    import bench
    from depth_correction_tpu.cloud import Cloud
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.node import (
        NODE_N_CELLS_PAD,
        _apply_from_moments,
        _filter_program,
        _slab_correct_program,
    )
    from depth_correction_tpu.ops.slabwin import slab_window_moments
    from depth_correction_tpu.preproc import pad_size

    cfg, scan = bench.build_node_scan()
    model = ScaledPolynomial(w=jnp.asarray([-0.002]),
                             exponent=jnp.asarray([4.0]))
    cloud = Cloud.from_structured_array(scan, dtype=jnp.float32)
    cloud = cloud.pad(pad_size(cloud.size))
    n = cloud.vps.shape[0]
    print("[node-parts] scan: %d raw -> %d padded" % (len(scan), n),
          flush=True)

    statics = dict(
        n_cells_pad=NODE_N_CELLS_PAD,
        nn_r=float(cfg.nn_r), min_depth=float(cfg.min_depth or 0.0),
        max_depth=float(cfg.max_depth or np.inf),
        grid_res=float(cfg.grid_res or 0.0),
        min_valid=int(cfg.min_valid_neighbors or 1),
        eigval_bounds=tuple(tuple(b) for b in (cfg.eigenvalue_bounds or [])),
        ratio_bounds=tuple(
            tuple(b) for b in (cfg.eigenvalue_ratio_bounds or [])),
    )
    args = jax.device_put((model, cloud.vps, cloud.dirs, cloud.depth,
                           cloud.valid))
    mdl, vps, dirs, depth, valid = args

    # Find the width/columns the stream settled on (warms the program too).
    from depth_correction_tpu.node import (
        _WIDTH_CACHE,
        _XCOLS_CACHE,
        correct_cloud,
    )

    outs = correct_cloud(mdl, cloud, cfg)
    jax.block_until_ready(outs)
    w_slab = max(_WIDTH_CACHE.values())
    xcols = max(_XCOLS_CACHE.values())
    print("[node-parts] settled w_slab = %d, x_cols = %d"
          % (w_slab, xcols), flush=True)

    # P0 full program
    def p0(tok):
        out = _slab_correct_program(
            mdl, vps, dirs, depth + 0.0 * tok, valid,
            w_slab=w_slab, x_cols_pad=xcols, **statics)
        return out, out[1][0]
    ms0 = timed("P0 full slab program", p0)

    # P1 filter
    def p1(tok):
        keep, pts = _filter_program(
            vps, dirs, depth + 0.0 * tok, valid,
            min_depth=statics["min_depth"], max_depth=statics["max_depth"],
            grid_res=statics["grid_res"])
        return keep, pts[0, 0]
    ms1 = timed("P1 filter program (depth + voxel)", p1)

    # Fixed filtered inputs for the establishment stages.
    keep, points = _filter_program(
        vps, dirs, depth, valid, min_depth=statics["min_depth"],
        max_depth=statics["max_depth"], grid_res=statics["grid_res"])
    keep, points = jax.device_put((keep, points))

    # P2 the column-aligned traced sort (v2+)
    from depth_correction_tpu.ops.grid_hash import grid_sort_colpad_traced

    @jax.jit
    def p2(tok):
        out = grid_sort_colpad_traced(points + 0.0 * tok, keep,
                                      statics["nn_r"], NODE_N_CELLS_PAD,
                                      x_cols_pad=xcols)
        return out, out[0][0, 0]
    ms2 = timed("P2 grid_sort_colpad_traced", p2)

    sorted_tabs = jax.jit(
        lambda: grid_sort_colpad_traced(points, keep, statics["nn_r"],
                                        NODE_N_CELLS_PAD,
                                        x_cols_pad=xcols)
    )()
    (pts_T, valid_s, ids_s, slot_of_orig, mins, dims, cell,
     _d0) = jax.device_put(sorted_tabs)

    # P3 slab moments over sorted tables
    @jax.jit
    def p3(tok):
        mean, comps, wsum, widths = slab_window_moments(
            pts_T + 0.0 * tok, valid_s, ids_s, dims,
            float(cfg.nn_r) ** 2, w_slab, NODE_N_CELLS_PAD)
        return (mean, wsum), mean[0, 0]
    ms3 = timed("P3 slab_window_moments (scan over tiles)", p3)

    mean, comps, wsum, widths = jax.jit(
        lambda: slab_window_moments(pts_T, valid_s, ids_s, dims,
                                    float(cfg.nn_r) ** 2, w_slab,
                                    NODE_N_CELLS_PAD)
    )()
    wid = np.asarray(widths)
    live = wid[wid > 0]
    print("[node-parts] widths: live tiles %d/%d, p50 %d, p90 %d, p99 %d, "
          "max %d (w_slab %d)"
          % (live.size, wid.size, *np.percentile(live, [50, 90, 99]).astype(
              int), live.max(initial=0), w_slab), flush=True)

    # P4 unsort of the packed table (scatter-built inverse, no argsort)
    @jax.jit
    def p4(tok):
        packed = jnp.concatenate(
            [mean + 0.0 * tok, jnp.stack(comps), wsum[None]], 0)
        out = jnp.take(packed, slot_of_orig, axis=1)
        return out, out[0, 0]
    ms4 = timed("P4 unsort (take by slot_of_orig)", p4)

    # P5 feature tail + masked apply (on the unsorted, original-order
    # moments — the padded tables live in the column-aligned layout)
    cloud_f = Cloud(vps=vps, dirs=dirs, depth=depth, valid=keep)
    packed0 = jax.jit(lambda: jnp.take(
        jnp.concatenate([mean, jnp.stack(comps), wsum[None]], 0),
        slot_of_orig, axis=1))()

    @jax.jit
    def p5(tok):
        pk = packed0 + 0.0 * tok
        out = _apply_from_moments(
            mdl, cloud_f, pk[0:3],
            (pk[3], pk[4], pk[5], pk[6], pk[7], pk[8]), pk[9],
            statics["eigval_bounds"], statics["ratio_bounds"],
            min_valid=statics["min_valid"])
        return out, out[1][0]
    ms5 = timed("P5 feature tail + model apply", p5)

    print("\n[accounting] P0 %.2f vs P1+P2+P3+P4+P5 = %.2f ms"
          % (ms0, ms1 + ms2 + ms3 + ms4 + ms5), flush=True)
    print("[accounting] sort %.2f + moments %.2f + unsort %.2f"
          % (ms2, ms3, ms4), flush=True)


if __name__ == "__main__":
    main()
