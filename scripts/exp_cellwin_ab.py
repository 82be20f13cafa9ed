"""A/B: cell-window Pallas moments engine vs the gather engine, same graph.

Measures the full jitted training step (loss + grad + Adam) on the bench
workload with BOTH moments backends over the SAME uncapped within-r graph
(the gather engine also runs uncapped here, so the comparison isolates the
engine, not the graph). Phantom-safe timing: steps chain through the
params/opt-state dependency and the loop ends in a float() sync.

Run on the TPU (no env overrides) or on CPU with
  JAX_PLATFORMS=cpu python scripts/exp_cellwin_ab.py      # interpret mode

DC_CELLWIN_CACHE=<path> caches the prepared workloads for iteration.
"""
from __future__ import annotations

import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 20
WARMUP = 3


def main():
    import jax

    # sitecustomize force-registers the axon TPU plugin; the env var alone
    # does not stick — force the platform via config (CLAUDE.md).
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    if not os.environ.get("DC_NO_COMPILE_CACHE"):
        # DC_NO_COMPILE_CACHE=1 forces fresh compiles — Mosaic lowering of
        # the cellwin kernels measured BIMODAL (the same MLIR compiled
        # either ~4 ms or ~8 s per 512 tiles across runs), and the
        # persistent cache would pin whichever binary the first run got.
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser(
                "~/.cache/jax_dctpu_tpu"
                if jax.default_backend() == "tpu"
                else "~/.cache/jax_dctpu_cpu"
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from depth_correction_tpu.config import Config
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.train import make_loss_fn, prepare_sequences

    def bench_cfg(backend):
        cfg = Config()
        cfg.float_type = "float32"
        cfg.dataset = "open_box"
        cfg.train_names = ["open_box/n_6_size_20_20_5_height_1_density_400"]
        cfg.min_depth, cfg.max_depth = 1.0, 25.0
        cfg.grid_res = 0.1
        cfg.nn_r, cfg.nn_k = 0.25, 0
        cfg.nn_backend = "grid"
        # SAME graph for both engines: uncapped within-r (what cellwin
        # requires; the bench's usual nn_max_neighbors=32 cap is off).
        cfg.nn_max_neighbors = None
        cfg.min_valid_neighbors = 5
        cfg.vp_dispersion_bounds = []
        cfg.eigenvalue_ratio_bounds = [[0, 1, 0, 0.25], [1, 2, 0.25, 1.0]]
        cfg.loss = "min_eigval_loss"
        cfg.loss_kwargs = {"sqrt": False, "normalization": True}
        cfg.depth_bias_model_kwargs = {"w": [-0.002], "exponent": [4.0]}
        cfg.lr = 2e-4
        cfg.moments_backend = backend
        zm = os.environ.get("DC_CELLWIN_ZMAX")
        cfg.cellwin_z_max = int(zm) if zm else None
        cfg.cellwin_row_cap = int(os.environ.get("DC_CELLWIN_ROWCAP", "128"))
        cfg.cellwin_pt_cap = int(os.environ.get("DC_CELLWIN_PTCAP", "128"))
        return cfg

    cache = os.environ.get("DC_CELLWIN_CACHE")
    datas = {}
    cache_dirty = False
    if cache and os.path.exists(cache):
        import dataclasses as _dc

        from depth_correction_tpu.ops.cellwin import CellWinDevice

        with open(cache, "rb") as f:
            datas_np = pickle.load(f)
        if "cellwin" in datas_np:
            cw = (datas_np["cellwin"].cellwin or (None,))[0]
            stale = cw is not None and (
                any(
                    not hasattr(cw, fld.name)
                    for fld in _dc.fields(CellWinDevice)
                )
                # dims is static metadata; an arity change (e.g. the
                # mini-span ns_f/ns_b fields) means a different kernel
                # generation built this graph.
                or len(getattr(cw, "dims", ())) != 9
            )
            if stale or os.environ.get("DC_REBUILD_CELLWIN"):
                # Drop the stale device graph BEFORE the pytree walk:
                # graphs pickled by an older builder may lack fields the
                # registered dataclass now declares (tree_map would crash).
                datas_np["cellwin"] = _dc.replace(
                    datas_np["cellwin"], cellwin=(None,)
                )
        datas = {
            k: jax.tree_util.tree_map(jnp.asarray, v)
            for k, v in datas_np.items()
        }
        print("[ab] workloads loaded from %s" % cache, file=sys.stderr)
        if (
            "cellwin" in datas
            and (datas["cellwin"].cellwin or (None,))[0] is None
        ):
            # Kernel-layout changes (e.g. the 128-aligned span starts)
            # invalidate cached CellWinDevice graphs; rebuild from the
            # cached establishment (the expensive part is reused).
            import dataclasses as _dc

            from depth_correction_tpu.ops.cellwin import (
                build_cellwin_graph, graph_to_device,
            )
            from depth_correction_tpu.preproc import global_cloud

            d = datas.get("cellwin")
            if d is not None:
                t0 = time.perf_counter()
                cfgc = bench_cfg("cellwin")
                gcloud = global_cloud(d.batches[0])
                g = None
                for span_limit in (512, 1024):
                    g = build_cellwin_graph(
                        np.asarray(gcloud.get_points(), np.float64),
                        np.asarray(gcloud.valid),
                        np.asarray(d.query_rows[0]),
                        np.asarray(d.neighbors[0]),
                        float(cfgc.nn_r),
                        row_cap=cfgc.cellwin_row_cap,
                        pt_cap=cfgc.cellwin_pt_cap,
                        span_limit=span_limit,
                        z_max=cfgc.cellwin_z_max,
                    )
                    if g is not None:
                        break
                assert g is not None, (
                    "cellwin rebuild declined — the cached workload is "
                    "likely stale (its frozen graph no longer matches the "
                    "current transform code, e.g. after a precision "
                    "change). Delete %s and re-prep fresh; "
                    "DC_CELLWIN_DEBUG=1 prints the decline reason."
                    % cache
                )
                datas["cellwin"] = _dc.replace(
                    d, cellwin=(graph_to_device(g),)
                )
                cache_dirty = True
                print(
                    "[ab] cellwin graph rebuilt: %d tiles x %d (span %d/%d),"
                    " %d exc, %.0f s"
                    % (g.n_row_tiles, g.row_cap, g.span_cap, g.rspan_cap,
                       g.n_exc, time.perf_counter() - t0),
                    file=sys.stderr,
                )
        if os.environ.get("DC_REBUILD_TRANSPOSE"):
            # The cached gather workload embeds transpose tables from the
            # builder version that prepared it; rebuild them (cheap next to
            # full prep) so bucket-ladder changes take effect.
            import dataclasses as _dc

            from depth_correction_tpu.ops.features import (
                build_bucketed_transpose_device,
            )

            d = datas.get("gather")
            if d is not None and d.t_neighbors and d.t_neighbors[0] is not None:
                t0 = time.perf_counter()
                m_total = d.batches[0].cloud.depth.size
                tg = build_bucketed_transpose_device(
                    d.neighbors[0], num_points=m_total, weights=d.weights[0]
                )
                datas["gather"] = _dc.replace(
                    d, t_neighbors=(tg,), t_slots=(None,)
                )
                cache_dirty = True
                print(
                    "[ab] gather transpose rebuilt: %d buckets, %.0f s"
                    % (len(tg.idx), time.perf_counter() - t0),
                    file=sys.stderr,
                )
        if cache_dirty:
            # Persist rebuilt graphs so later runs skip the rebuild.
            with open(cache, "wb") as f:
                pickle.dump(
                    {
                        k: jax.tree_util.tree_map(np.asarray, v)
                        for k, v in datas.items()
                    },
                    f,
                )
            print("[ab] cache re-saved", file=sys.stderr)
    else:
        for backend in ("gather", "cellwin"):
            t0 = time.perf_counter()
            cfg = bench_cfg(backend)
            ds = create_dataset(cfg.train_names[0], cfg)
            datas[backend] = prepare_sequences([ds], cfg)
            print(
                "[ab] %s prep: %.0f s" % (backend, time.perf_counter() - t0),
                file=sys.stderr,
            )
        if cache:
            with open(cache, "wb") as f:
                pickle.dump(
                    {
                        k: jax.tree_util.tree_map(np.asarray, v)
                        for k, v in datas.items()
                    },
                    f,
                )

    if os.environ.get("DC_CELLWIN_PREP_ONLY"):
        print("[ab] prep-only mode: workloads cached, exiting", file=sys.stderr)
        return

    # DC_CELLWIN_ONLY=cellwin (or gather, or "cellwin,gather" for order)
    # limits/reorders the measured backends: the uncapped gather step OOMs
    # on a 16 GB chip without chunking, so the engines are often measured
    # in separate runs.
    which = os.environ.get("DC_CELLWIN_ONLY", "gather,cellwin").split(",")
    for backend in which:
        cfg = bench_cfg(backend)
        data = datas[backend]
        if backend == "cellwin":
            assert data.cellwin[0] is not None, "cellwin build declined"
        device = jax.devices()[0]
        data = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, device), data
        )
        loss_fn = make_loss_fn(cfg)
        from depth_correction_tpu.train import bind_cellwin_static

        # Cell-window graphs ride the closure (35-220x vs jit arguments).
        loss_fn, data = bind_cellwin_static(loss_fn, data)
        params = {
            "model": ScaledPolynomial(
                w=jnp.zeros(1), exponent=jnp.asarray([4.0])
            )
        }
        tx = optax.adam(cfg.lr)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, data):
            loss, grads = jax.value_and_grad(loss_fn)(params, data)
            updates, opt_state = tx.update(grads, opt_state, params)
            return loss, optax.apply_updates(params, updates), opt_state

        for _ in range(WARMUP):
            loss, params, opt_state = step(params, opt_state, data)
        jax.block_until_ready((loss, params))
        t0 = time.perf_counter()
        for _ in range(STEPS):
            loss, params, opt_state = step(params, opt_state, data)
        final = float(loss)
        ms = (time.perf_counter() - t0) / STEPS * 1e3
        n_rows = int(np.asarray(data.masks[0]).sum())
        print(
            "[ab] %-7s %.3f ms/step  (loss %.4e, %d loss rows)"
            % (backend, ms, final, n_rows)
        )


if __name__ == "__main__":
    main()
