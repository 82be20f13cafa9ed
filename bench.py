"""Benchmark: self-supervised training step, TPU (this framework) vs the
reference-style CPU loop.

Workload mirrors the canonical parity configuration (BASELINE.md): a
multi-view sequence, ball neighborhoods at nn_r, normalized min-eigenvalue
map-consistency loss, ScaledPolynomial model, Adam — with frozen
neighborhoods, exactly the amortization the reference training loop uses
(reference: train.py:166-226).

Measured quantity: wall time of ONE full optimization step
(model apply -> pose transform -> merge -> neighborhood mean/cov ->
eigendecomposition -> masked loss -> backward -> Adam update).

- Ours: a single jitted XLA program on the TPU chip, timed as a pipelined
  training loop (steps chained through the params/opt-state dependency,
  one device sync at the end) — how a real training loop runs; a per-step
  host sync would only measure the host<->device round trip (~28 ms through
  the axon tunnel on this host, >> the device step).
- Baseline (reference semantics): torch float64 on CPU doing the work the
  reference's loop does per iteration — neighborhood features for EVERY
  point of the global cloud (reference preproc.py:195-244 recomputes all,
  masking only at the loss reduction), LAPACK eigh, autograd re-entered
  from Python — but vectorized (no Python per-cloud loops), which is
  already generous. Median over steps; this host's single contended core
  makes the reading noisy (see README).
- Also printed: an "optimized torch" variant that additionally reuses OUR
  query-row compaction (~6x less feature work than the reference does) —
  a stricter, beyond-reference comparison point.

Prints ONE JSON line:
  {"metric": "train_step_ms", "value": <ours>, "unit": "ms",
   "vs_baseline": <baseline_ms / ours_ms>}
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

STEPS = 20
WARMUP = 3
T0 = time.perf_counter()


def n_query_full(full_nn):
    return int(np.asarray(full_nn).shape[0])


def _devices_or_retry():
    """First device touch, resilient to transient tunnel failures.

    The TPU tunnel can refuse with ``Unable to initialize backend ...
    UNAVAILABLE`` for stretches of minutes-to-hours (observed: outages
    exceeding 2 h; each failed attempt itself takes ~25 min to detect, so
    the default budget spans ~5 h). JAX caches the failed backend for
    the process lifetime, so an in-process retry would return the same
    error instantly — instead re-exec this script (still ONE TPU process
    at any time) after a pause, up to DC_BENCH_BACKEND_RETRIES times.
    """
    import os

    import jax

    try:
        return jax.devices()
    except RuntimeError as e:
        # Only UNAVAILABLE is transient; NOT_FOUND / INVALID_ARGUMENT etc.
        # are permanent configuration errors — surface them immediately.
        if "UNAVAILABLE" not in str(e):
            raise
        attempt = int(os.environ.get("DC_BENCH_BACKEND_ATTEMPT", "0"))
        max_att = int(os.environ.get("DC_BENCH_BACKEND_RETRIES", "10"))
        if attempt >= max_att:
            raise
        delay = int(os.environ.get("DC_BENCH_BACKEND_DELAY_S", "240"))
        print(
            "[bench] TPU backend unavailable (attempt %d/%d) — re-exec in %d s"
            % (attempt + 1, max_att, delay),
            file=sys.stderr,
        )
        time.sleep(delay)
        os.environ["DC_BENCH_BACKEND_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def build_workload():
    """Synthetic multi-view sequence at ASL-laser-like scale after
    preprocessing: ~25k points/scan x 6 scans, r = 0.25 m neighborhoods.

    Preprocessing (one-time, not the measured quantity) dogfoods the
    framework's own scalable path: neighborhood establishment runs the
    on-device grid-hash engine (ops/grid_hash.py) — the same engine
    production prep uses — instead of bouncing to a host KD-tree (which
    cost ~70 s of host time for the same graph).
    """
    import os
    import pickle

    import jax

    # Persistent compile cache: prep compiles ~a dozen programs (features,
    # grid engine, transpose builders); repeat runs on the same host reuse
    # the serialized executables instead of re-paying the (remote) compiler.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jax_dctpu_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _devices_or_retry()
    import jax.numpy as jnp

    from depth_correction_tpu.config import Config
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.train import prepare_sequences

    # Optional prep cache (DC_BENCH_CACHE=<path>) for fast iteration on the
    # measured step; the canonical driver run builds from scratch.
    cache = os.environ.get("DC_BENCH_CACHE")
    want_sort = bool(int(os.environ.get("DC_SPATIAL_SORT", "0")))
    want_backend = os.environ.get("DC_MOMENTS_BACKEND", "gather")
    if cache and os.path.exists(cache):
        with open(cache, "rb") as f:
            cfg, data_np, full_nn = pickle.load(f)
        # The cached workload embeds the A/B knobs it was built with; a
        # knob change must rebuild, not silently measure the stale layout.
        if (bool(cfg.spatial_sort) != want_sort
                or getattr(cfg, "moments_backend", "gather") != want_backend):
            print(
                "[bench] cache %s was built with spatial_sort=%s backend=%s"
                " != requested (%s, %s); rebuilding"
                % (cache, cfg.spatial_sort,
                   getattr(cfg, "moments_backend", "gather"),
                   want_sort, want_backend),
                file=sys.stderr,
            )
        else:
            data = jax.tree_util.tree_map(jnp.asarray, data_np)
            print("[bench] workload loaded from %s" % cache, file=sys.stderr)
            return cfg, data, jnp.asarray(full_nn)

    cfg = Config()
    cfg.nn_backend = "grid"
    cfg.float_type = "float32"
    # A/B knob: Morton-ordered point table (see cfg.spatial_sort).
    cfg.spatial_sort = bool(int(os.environ.get("DC_SPATIAL_SORT", "0")))
    # A/B knob: moments engine ('gather' | 'cellwin', see
    # cfg.moments_backend; cellwin implies uncapped establishment).
    cfg.moments_backend = os.environ.get("DC_MOMENTS_BACKEND", "gather")
    cfg.dataset = "open_box"
    cfg.train_names = ["open_box/n_6_size_20_20_5_height_1_density_400"]
    cfg.min_depth, cfg.max_depth = 1.0, 25.0
    cfg.grid_res = 0.1
    cfg.nn_r, cfg.nn_k = 0.25, 0
    cfg.nn_max_neighbors = 32
    cfg.min_valid_neighbors = 5
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = [[0, 1, 0, 0.25], [1, 2, 0.25, 1.0]]
    cfg.loss = "min_eigval_loss"
    cfg.loss_kwargs = {"sqrt": False, "normalization": True}
    cfg.depth_bias_model_kwargs = {"w": [-0.002], "exponent": [4.0]}
    cfg.lr = 2e-4

    ds = create_dataset(cfg.train_names[0], cfg)
    print("[bench] dataset ready (t=%.0fs)" % (time.perf_counter() - T0), file=sys.stderr)
    print("[bench] prep device: %s" % jax.devices()[0], file=sys.stderr)
    data = prepare_sequences([ds], cfg)
    # Full-cloud neighbor matrix for the reference-semantics baseline
    # (the reference computes features for every point each iteration;
    # prepare_sequences compacts to the loss rows for OUR step).
    from depth_correction_tpu.preproc import establish_neighborhoods, global_cloud

    gcloud = global_cloud(data.batches[0])
    full_nn, _ = establish_neighborhoods(gcloud, cfg)
    print("[bench] sequences prepared (t=%.0fs)" % (time.perf_counter() - T0), file=sys.stderr)
    if cache:
        with open(cache, "wb") as f:
            pickle.dump(
                (cfg, jax.tree_util.tree_map(np.asarray, data),
                 np.asarray(full_nn)),
                f,
            )
        print("[bench] workload cached to %s" % cache, file=sys.stderr)
    return cfg, data, full_nn


def to_device(data, device):
    import jax

    return jax.tree_util.tree_map(lambda x: jax.device_put(x, device), data)


def bench_ours(cfg, data) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.train import make_loss_fn

    device = jax.devices()[0]
    print("[bench] step device: %s" % device, file=sys.stderr)
    data = to_device(data, device)
    loss_fn = make_loss_fn(cfg)
    params = {"model": ScaledPolynomial(w=jnp.zeros(1), exponent=jnp.asarray([4.0]))}
    params = to_device(params, device)
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

    # Pipelined loop: each step consumes the previous step's params/opt
    # state, so the device executes STEPS sequential steps; the host only
    # syncs once at the end (final loss materialization).
    t0 = time.perf_counter()
    for _ in range(STEPS):
        loss, params, opt_state = step(params, opt_state, data)
    final_loss = float(loss)
    total = time.perf_counter() - t0
    print(
        "[bench] ours: final loss %.3e, w %.3e" % (final_loss,
        float(np.asarray(params["model"].w)[0])),
        file=sys.stderr,
    )
    return float(total / STEPS * 1e3)


def bench_torch_baseline(cfg, data, steps: int = 5, full_nn=None) -> float:
    """Reference-semantics step in torch float64 on CPU.

    With ``full_nn``: neighborhood features for EVERY global-cloud point
    per iteration — what the reference's loop actually computes
    (preproc.py:195-244), vectorized (already generous: the reference adds
    Python per-cloud loops). Without it: the stricter 'optimized torch'
    variant that reuses OUR query compaction. Median over steps.
    """
    import torch

    batch = data.batches[0]
    pp = data.point_perm[0] if getattr(data, "point_perm", None) else None
    perm = (
        torch.as_tensor(np.asarray(pp[0]), dtype=torch.long)
        if pp is not None and full_nn is None
        else None
    )
    if full_nn is not None:
        nn_np = np.asarray(full_nn)
        nn = torch.as_tensor(nn_np, dtype=torch.long)
        w8 = torch.as_tensor((nn_np >= 0).astype(np.float64))
        # Reference semantics: features everywhere, mask at reduction only.
        mask = torch.as_tensor((nn_np >= 0).sum(1) >= cfg.min_valid_neighbors)
    else:
        nn = torch.as_tensor(np.asarray(data.neighbors[0]), dtype=torch.long)
        w8 = torch.as_tensor(np.asarray(data.weights[0]), dtype=torch.float64)
        mask = torch.as_tensor(np.asarray(data.masks[0]))
    nn = nn.clamp(min=0)

    vps = torch.as_tensor(np.asarray(batch.cloud.vps), dtype=torch.float64)
    dirs = torch.as_tensor(np.asarray(batch.cloud.dirs), dtype=torch.float64)
    depth0 = torch.as_tensor(np.asarray(batch.cloud.depth), dtype=torch.float64)
    inc = torch.as_tensor(np.asarray(batch.cloud.inc_angles), dtype=torch.float64)
    lmask = torch.as_tensor(np.asarray(batch.cloud.mask))
    poses = torch.as_tensor(np.asarray(batch.poses), dtype=torch.float64)

    w = torch.zeros(1, dtype=torch.float64, requires_grad=True)
    opt = torch.optim.Adam([w], lr=cfg.lr)

    def step():
        bias = inc.pow(4.0) * w
        depth = torch.where(lmask, depth0 * (1.0 - bias), depth0)
        pts = vps + depth.unsqueeze(-1) * dirs
        R = poses[:, :3, :3]
        t = poses[:, :3, 3]
        gpts = torch.einsum("snj,sij->sni", pts, R) + t[:, None, :]
        gpts = gpts.reshape(-1, 3)
        if perm is not None:
            gpts = gpts[perm]  # sorted-space tables (cfg.spatial_sort)
        nbr = gpts[nn]  # (M, K, 3)
        wsum = w8.sum(dim=1, keepdim=True)
        mean = (w8.unsqueeze(-1) * nbr).sum(dim=1) / wsum.clamp(min=1e-12)
        xc = (nbr - mean[:, None, :]) * w8.unsqueeze(-1).sqrt()
        cov = torch.einsum("mki,mkj->mij", xc, xc) / (wsum - 1).clamp(min=1e-6)[..., None]
        eigvals = torch.linalg.eigvalsh(cov)
        loss_pw = eigvals[:, 0] / eigvals.sum(dim=1).clamp(min=1e-6)
        loss = loss_pw[mask].mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        return loss

    step()  # warmup / sanity
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3)


def main():
    cfg, data, full_nn = build_workload()
    # Report the three sizes separately (they are different things): the
    # merged global cloud the model corrects, the compacted query rows whose
    # neighborhoods are recomputed every step, and the masked rows reduced
    # into the loss.
    n_global = int(np.asarray(data.batches[0].cloud.valid).sum())
    n_query = int(np.asarray(data.masks[0]).size)
    n_masked = int(np.asarray(data.masks[0]).sum())
    print(
        "[bench] workload: %d corrected global points; %d query rows "
        "(%d in loss), K=%d"
        % (n_global, n_query, n_masked, int(np.asarray(data.neighbors[0]).shape[1])),
        file=sys.stderr,
    )

    ours_ms = bench_ours(cfg, data)
    print("[bench] ours: %.3f ms/step" % ours_ms, file=sys.stderr)

    baseline_ms = bench_torch_baseline(cfg, data, full_nn=full_nn)
    print(
        "[bench] torch-cpu float64 baseline, reference semantics "
        "(all %d rows; median): %.3f ms/step" % (n_query_full(full_nn), baseline_ms),
        file=sys.stderr,
    )
    opt_ms = bench_torch_baseline(cfg, data)
    print(
        "[bench] torch-cpu float64 optimized variant (our compaction, "
        "%d rows; median): %.3f ms/step" % (n_query, opt_ms),
        file=sys.stderr,
    )

    pts_per_sec = n_global / (ours_ms / 1e3)
    print("[bench] corrected points/sec/chip: %.3g" % pts_per_sec, file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "train_step_ms",
                "value": round(ours_ms, 3),
                "unit": "ms",
                "vs_baseline": round(baseline_ms / ours_ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
