"""Benchmark: self-supervised training step, TPU (this framework) vs the
reference-style CPU loop.

HEADLINE workload (reported in the JSON line): the reference's ACTUAL
objective — UNCAPPED within-r neighborhoods (query_ball_point semantics,
reference nearest_neighbors.py:40-52; mean degree ~123 on this scene) over
a multi-view sequence, normalized min-eigenvalue map-consistency loss,
ScaledPolynomial model, Adam, frozen neighborhoods (exactly the
amortization the reference training loop uses; reference train.py:166-226).
Our step runs the promoted cell-window Pallas engine (ops/cellwin.py; auto
on TPU). A SECONDARY capped-32 workload (nn_max_neighbors=32, gather
engine) is also measured for continuity with earlier rounds.

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
  query-row compaction (~40% less feature work than the reference does) —
  a stricter, beyond-reference comparison point.
- PARITY (not just speed): both sides start from w=0 on the SAME graph;
  the stderr log and JSON carry the relative loss disagreement at w=0
  (ours f32-TPU vs torch f64-CPU — pure numeric agreement of the
  objective; ~1e-6 class) and the relative w disagreement after 6
  identical Adam steps (BASELINE.md north star: >=20x AND loss parity).
  Interpretation of the w metric: at f64 the two gradients agree to 12
  significant digits (verified on CPU), so the w gap measures f32
  GRADIENT rounding under the objective's near-cancellation at w=0
  (~1e-1 class on small scenes), not a semantic difference; both
  trajectories converge to the same optimum (bias-recovery tests land
  within 2% of ground truth).

Prints ONE JSON line:
  {"metric": "train_step_ms", "value": <ours, uncapped>, "unit": "ms",
   "vs_baseline": <uncapped reference-torch ms / ours ms>, ...parity and
   capped-continuity fields}
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

STEPS = 20
WARMUP = 3
TORCH_STEPS = 5  # timed torch steps (1 warmup before them)
T0 = time.perf_counter()

# Chunk the torch baselines' per-row feature work past this many (rows * K)
# pairs: the uncapped graph's dense (M, K, 3) float64 intermediates would
# otherwise not fit host RAM (autograd keeps them alive until backward).
TORCH_PAIRS_CHUNK = 24_000_000


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


def bench_config(uncapped: bool):
    """Synthetic multi-view sequence at ASL-laser-like scale after
    preprocessing: ~25k points/scan x 6 scans, r = 0.25 m neighborhoods."""
    import os

    from depth_correction_tpu.config import Config

    cfg = Config()
    cfg.nn_backend = "grid"
    cfg.float_type = "float32"
    cfg.dataset = "open_box"
    # DC_BENCH_DATASET overrides for smoke tests (e.g. a low-density box
    # on CPU); the canonical driver run uses the default scene.
    cfg.train_names = [
        os.environ.get(
            "DC_BENCH_DATASET",
            "open_box/n_6_size_20_20_5_height_1_density_400",
        )
    ]
    cfg.min_depth, cfg.max_depth = 1.0, 25.0
    cfg.grid_res = 0.1
    cfg.nn_r, cfg.nn_k = 0.25, 0
    cfg.min_valid_neighbors = 5
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = [[0, 1, 0, 0.25], [1, 2, 0.25, 1.0]]
    cfg.loss = "min_eigval_loss"
    cfg.loss_kwargs = {"sqrt": False, "normalization": True}
    cfg.depth_bias_model_kwargs = {"w": [-0.002], "exponent": [4.0]}
    cfg.lr = 2e-4
    if uncapped:
        # Reference query_ball_point semantics: every neighbor within r.
        cfg.nn_max_neighbors = None
        # 'auto' -> the cell-window Pallas engine on TPU (measured 5.1x
        # over gather at these semantics); DC_MOMENTS_BACKEND overrides
        # for A/B runs.
        cfg.moments_backend = os.environ.get("DC_MOMENTS_BACKEND", "auto")
    else:
        # Continuity row: the K=32-capped graph earlier rounds measured.
        cfg.nn_max_neighbors = 32
        cfg.moments_backend = "gather"
        # A/B knob: Morton-ordered point table (see cfg.spatial_sort).
        cfg.spatial_sort = bool(int(os.environ.get("DC_SPATIAL_SORT", "0")))
    return cfg


def build_workload(uncapped: bool):
    """(cfg, TrainData, full-cloud neighbor matrix) for one graph mode.

    Preprocessing (one-time, not the measured quantity) dogfoods the
    framework's own scalable path: neighborhood establishment runs the
    on-device grid-hash engine (ops/grid_hash.py) — the same engine
    production prep uses — instead of bouncing to a host KD-tree (which
    cost ~70 s of host time for the same graph).
    """
    import os
    import pickle

    import jax
    import jax.numpy as jnp

    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.train import prepare_sequences

    mode = "uncapped" if uncapped else "capped"
    cfg = bench_config(uncapped)

    # Optional prep cache (DC_BENCH_CACHE=<path>) for fast iteration on the
    # measured step; the canonical driver run builds from scratch.
    cache = os.environ.get("DC_BENCH_CACHE")
    cache = cache + "." + mode if cache else None
    if cache and os.path.exists(cache):
        with open(cache, "rb") as f:
            ccfg, data_np, full_nn = pickle.load(f)
        # The cached workload embeds the A/B knobs it was built with; a
        # knob change must rebuild, not silently measure the stale layout.
        same = (
            bool(ccfg.spatial_sort) == bool(cfg.spatial_sort)
            and getattr(ccfg, "moments_backend", "auto") == cfg.moments_backend
            and ccfg.nn_max_neighbors == cfg.nn_max_neighbors
        )
        if not same:
            print(
                "[bench] cache %s knobs differ from requested; rebuilding"
                % cache,
                file=sys.stderr,
            )
        else:
            data = jax.tree_util.tree_map(jnp.asarray, data_np)
            print("[bench] %s workload loaded from %s" % (mode, cache),
                  file=sys.stderr)
            return ccfg, data, jnp.asarray(full_nn)

    ds = create_dataset(cfg.train_names[0], cfg)
    print("[bench] dataset ready (t=%.0fs)" % (time.perf_counter() - T0),
          file=sys.stderr)
    print("[bench] prep device: %s" % jax.devices()[0], file=sys.stderr)
    data = prepare_sequences([ds], cfg)
    # Full-cloud neighbor matrix for the reference-semantics baseline
    # (the reference computes features for every point each iteration;
    # prepare_sequences compacts to the loss rows for OUR step).
    from depth_correction_tpu.preproc import (
        establish_neighborhoods,
        global_cloud,
    )

    gcloud = global_cloud(data.batches[0])
    est_cfg = cfg
    if uncapped:
        est_cfg = cfg.copy()
        est_cfg.nn_max_neighbors = None
        est_cfg.nn_symmetrize = False
    full_nn, _ = establish_neighborhoods(gcloud, est_cfg)
    print("[bench] %s sequences prepared (t=%.0fs)"
          % (mode, time.perf_counter() - T0), file=sys.stderr)
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


def bench_ours(cfg, data):
    """(ms/step, loss at w=0, w after 6 steps, final loss).

    The parity probes ride the same pipelined loop: the step-6 params
    pytree is stashed by REFERENCE mid-loop (no host sync) and
    materialized after the timed region.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.train import make_loss_fn

    from depth_correction_tpu.train import bind_cellwin_static

    device = jax.devices()[0]
    print("[bench] step device: %s" % device, file=sys.stderr)
    data = to_device(data, device)
    loss_fn = make_loss_fn(cfg)
    # Cell-window graphs ride the closure (35-220x vs jit arguments).
    loss_fn, data = bind_cellwin_static(loss_fn, data)
    params = {"model": ScaledPolynomial(w=jnp.zeros(1),
                                        exponent=jnp.asarray([4.0]))}
    params = to_device(params, device)
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, data):
        loss, grads = jax.value_and_grad(loss_fn)(params, data)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    loss0 = None
    probe_params = None
    n_done = 0
    for _ in range(WARMUP):
        loss, params, opt_state = step(params, opt_state, data)
        if loss0 is None:
            loss0 = loss  # loss evaluated at the w=0 input params
        n_done += 1
    jax.block_until_ready((loss, params))

    # Pipelined loop: each step consumes the previous step's params/opt
    # state, so the device executes STEPS sequential steps; the host only
    # syncs once at the end (final loss materialization).
    t0 = time.perf_counter()
    for _ in range(STEPS):
        loss, params, opt_state = step(params, opt_state, data)
        n_done += 1
        if n_done == 1 + TORCH_STEPS:
            probe_params = params  # reference only; materialized later
    final_loss = float(loss)
    total = time.perf_counter() - t0
    w6 = (
        float(np.asarray(probe_params["model"].w)[0])
        if probe_params is not None
        else float("nan")
    )
    print(
        "[bench] ours: loss %.6e (w=0) -> %.3e final, w %.3e"
        % (float(loss0), final_loss,
           float(np.asarray(params["model"].w)[0])),
        file=sys.stderr,
    )
    return float(total / STEPS * 1e3), float(loss0), w6, final_loss


def bench_torch_baseline(cfg, data, steps: int = TORCH_STEPS, full_nn=None):
    """Reference-semantics step in torch float64 on CPU.

    With ``full_nn``: neighborhood features for EVERY global-cloud point
    per iteration — what the reference's loop actually computes
    (preproc.py:195-244), vectorized (already generous: the reference adds
    Python per-cloud loops). Without it: the stricter 'optimized torch'
    variant that reuses OUR query compaction. Past TORCH_PAIRS_CHUNK
    dense pairs the per-row feature work is row-chunked with per-chunk
    backward (identical math; dense uncapped intermediates exceed host
    RAM otherwise).

    :return: (median ms/step, loss at w=0, w after 1+steps steps).
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
        mask = torch.as_tensor(
            (nn_np >= 0).sum(1) >= cfg.min_valid_neighbors
        )
    else:
        nn = torch.as_tensor(np.asarray(data.neighbors[0]), dtype=torch.long)
        w8 = torch.as_tensor(np.asarray(data.weights[0]),
                             dtype=torch.float64)
        mask = torch.as_tensor(np.asarray(data.masks[0]))
    nn = nn.clamp(min=0)

    vps = torch.as_tensor(np.asarray(batch.cloud.vps), dtype=torch.float64)
    dirs = torch.as_tensor(np.asarray(batch.cloud.dirs), dtype=torch.float64)
    depth0 = torch.as_tensor(np.asarray(batch.cloud.depth),
                             dtype=torch.float64)
    inc = torch.as_tensor(np.asarray(batch.cloud.inc_angles),
                          dtype=torch.float64)
    lmask = torch.as_tensor(np.asarray(batch.cloud.mask))
    poses = torch.as_tensor(np.asarray(batch.poses), dtype=torch.float64)

    w = torch.zeros(1, dtype=torch.float64, requires_grad=True)
    opt = torch.optim.Adam([w], lr=cfg.lr)

    m_rows, k = nn.shape
    n_masked = int(mask.sum())
    chunk = m_rows
    if m_rows * k > TORCH_PAIRS_CHUNK:
        chunk = max(TORCH_PAIRS_CHUNK // k, 1024)

    def row_loss(gpts, nn_c, w8_c, mask_c):
        nbr = gpts[nn_c]  # (m, K, 3)
        wsum = w8_c.sum(dim=1, keepdim=True)
        mean = (w8_c.unsqueeze(-1) * nbr).sum(dim=1) / wsum.clamp(min=1e-12)
        xc = (nbr - mean[:, None, :]) * w8_c.unsqueeze(-1).sqrt()
        cov = torch.einsum("mki,mkj->mij", xc, xc) / (
            wsum - 1
        ).clamp(min=1e-6)[..., None]
        eigvals = torch.linalg.eigvalsh(cov)
        loss_pw = eigvals[:, 0] / eigvals.sum(dim=1).clamp(min=1e-6)
        return loss_pw[mask_c].sum()

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
        opt.zero_grad()
        if chunk >= m_rows:
            loss = row_loss(gpts, nn, w8, mask) / max(n_masked, 1)
            loss.backward()
            loss_val = float(loss)
        else:
            # Row-chunked: per-chunk backward (retain the shared gpts
            # prefix) frees each chunk's dense intermediates; grads and
            # the scalar loss accumulate identically to the fused form.
            loss_val = 0.0
            for i in range(0, m_rows, chunk):
                part = row_loss(
                    gpts, nn[i : i + chunk], w8[i : i + chunk],
                    mask[i : i + chunk],
                ) / max(n_masked, 1)
                part.backward(retain_graph=i + chunk < m_rows)
                loss_val += float(part)
        opt.step()
        return loss_val

    loss0 = step()  # warmup / sanity; loss evaluated at w=0
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    w_end = float(w.detach()[0])
    return float(np.median(times) * 1e3), float(loss0), w_end


def build_node_scan():
    """One realistic raw scan (~130k points) + the node config.

    The training-bench datasets are voxel-filtered by the factory; the node
    receives RAW sensor scans and does its own filtering in-program
    (reference: scripts/depth_correction:31-58 filters per callback), so the
    scan comes straight from the dataset class.
    """
    import os

    from depth_correction_tpu.datasets.synthetic import OpenBoxDataset

    cfg = bench_config(True)
    cfg.nn_backend = "slab"
    density = int(os.environ.get("DC_BENCH_NODE_DENSITY", "215"))
    # The raw-scan build is ~10 min of host work; cache it next to the
    # bench workload cache for fast step-time iteration (same contract as
    # DC_BENCH_CACHE: the canonical driver run builds fresh).
    cache = os.environ.get("DC_BENCH_CACHE")
    cache = cache + ".nodescan%d.npy" % density if cache else None
    if cache and os.path.exists(cache):
        print("[bench] node scan loaded from %s" % cache, file=sys.stderr)
        return cfg, np.load(cache)
    ds = OpenBoxDataset(
        name="open_box/n_6_size_20_20_5_height_1_density_%d" % density
    )
    scan = ds.local_cloud(0)
    if cache:
        np.save(cache, scan)
    return cfg, scan


def bench_node(cfg, scan, reps: int = 10, chip_reps: int = 20):
    """Per-scan latency of the online corrector (node.py), two numbers:

    - CHIP: the fused one-dispatch program (_grid_correct_program) timed
      with device-resident inputs, ``chip_reps`` chained dependent calls
      (each call's depth carries a dependency on the previous call's
      output so the device can't overlap or elide them), one float()
      materialization at the end. This is the deployable per-callback
      latency on co-hosted hardware — the number comparable to the
      reference's per-callback timer (scripts/depth_correction:39-53).
    - E2E: host structured scan -> corrected host arrays through the
      public API. In this sandbox the axon tunnel adds ~28 ms RTT per
      host<->device sync, so e2e is an upper bound a co-hosted deployment
      would not pay.

    :return: dict with chip/e2e ms, n_kept, K, width.
    """
    import jax
    import jax.numpy as jnp

    from depth_correction_tpu.cloud import Cloud
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.node import (
        NODE_N_CELLS_PAD,
        _slab_correct_program,
        correct_cloud,
    )
    from depth_correction_tpu.preproc import pad_size

    model = ScaledPolynomial(w=jnp.asarray([-0.002]),
                             exponent=jnp.asarray([4.0]))

    def one_call():
        cloud = Cloud.from_structured_array(scan, dtype=jnp.float32)
        cloud = cloud.pad(pad_size(cloud.size))
        outs = correct_cloud(model, cloud, cfg)
        return jax.device_get(outs)  # one batched fetch

    from depth_correction_tpu.node import _filter_program

    cloud = Cloud.from_structured_array(scan, dtype=jnp.float32)
    cloud = cloud.pad(pad_size(cloud.size))
    keep, points = _filter_program(
        cloud.vps, cloud.dirs, cloud.depth, cloud.valid,
        min_depth=float(cfg.min_depth or 0.0),
        max_depth=float(cfg.max_depth or np.inf),
        grid_res=float(cfg.grid_res or 0.0),
    )
    n_kept = int(np.asarray(keep).sum())
    print("[bench] node scan: %d raw -> %d kept points (slab engine: "
          "uncapped within-r, no K)" % (len(scan), n_kept), file=sys.stderr)

    outs = one_call()  # warmup: compiles + verifies the stream's width
    from depth_correction_tpu.node import _WIDTH_CACHE, _XCOLS_CACHE
    width = max(_WIDTH_CACHE.values())
    xcols = max(_XCOLS_CACHE.values())
    k = 0  # slab engine is K-free

    # --- CHIP: chained dependent program calls, device-resident inputs ---
    statics = dict(
        w_slab=int(width), x_cols_pad=int(xcols),
        n_cells_pad=NODE_N_CELLS_PAD,
        nn_r=float(cfg.nn_r), min_depth=float(cfg.min_depth or 0.0),
        max_depth=float(cfg.max_depth or np.inf),
        grid_res=float(cfg.grid_res or 0.0),
        min_valid=int(cfg.min_valid_neighbors or 1),
        eigval_bounds=tuple(tuple(b) for b in (cfg.eigenvalue_bounds or [])),
        ratio_bounds=tuple(
            tuple(b) for b in (cfg.eigenvalue_ratio_bounds or [])),
    )
    dev_args = jax.device_put((model, cloud.vps, cloud.dirs, cloud.depth,
                               cloud.valid))
    mdl, vps, dirs, depth, valid = dev_args
    prev = _slab_correct_program(mdl, vps, dirs, depth, valid, **statics)
    jax.block_until_ready(prev)
    chip_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        tok = prev[-1]
        for _ in range(chip_reps):
            prev = _slab_correct_program(
                mdl, vps, dirs, depth + 0.0 * tok.astype(depth.dtype),
                valid, **statics)
            tok = prev[-1]
        sync = float(prev[1][0]) + float(tok)  # dependent materialization
        chip_times.append((time.perf_counter() - t0) / chip_reps)
    del sync
    chip_ms = float(np.median(chip_times) * 1e3)
    print("[bench] node CHIP per-scan: median %.2f ms (batches: %s)"
          % (chip_ms, ["%.2f" % (t * 1e3) for t in chip_times]),
          file=sys.stderr)

    # --- E2E through the tunnel (upper bound) ---
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = one_call()
        times.append(time.perf_counter() - t0)
    del outs
    ms = float(np.median(times) * 1e3)
    print("[bench] node e2e per-scan: median %.1f ms over %d calls "
          "(spread %.1f-%.1f)" % (ms, reps, min(times) * 1e3,
                                  max(times) * 1e3), file=sys.stderr)
    return dict(chip_ms=chip_ms, e2e_ms=ms, n_kept=n_kept, k=k,
                width=int(width))


def bench_node_torch_baseline(cfg, scan, reps: int = 3):
    """Reference per-callback cost on CPU: the work the reference node does
    per message (scripts/depth_correction:31-58, timed by its own
    timing()/timer wrappers, utils.py:54-64) — depth+voxel filters, fresh
    cKDTree ball query, torch-f64 neighborhood features (mean/cov/eigh,
    normals, incidence angles), model apply. Vectorized (generous: the
    reference's feature path loops in Python).
    """
    import torch
    from scipy.spatial import cKDTree

    x = np.stack([scan["x"], scan["y"], scan["z"]], 1).astype(np.float64)
    vp = (
        np.stack([scan["vp_x"], scan["vp_y"], scan["vp_z"]], 1).astype(
            np.float64)
        if "vp_x" in (scan.dtype.names or ())
        else np.zeros_like(x)
    )
    r = float(cfg.nn_r)
    gres = float(cfg.grid_res or 0.0)

    def callback():
        depth = np.linalg.norm(x - vp, axis=1)
        keep = (depth >= (cfg.min_depth or 0.0)) & (
            depth <= (cfg.max_depth or np.inf))
        if gres > 0.0:
            ids = np.floor(x[keep] / gres).astype(np.int64)
            lin = (ids[:, 0] * 2_000_003 + ids[:, 1]) * 2_000_003 + ids[:, 2]
            _, first = np.unique(lin, return_index=True)
            sel = np.zeros(keep.sum(), bool)
            sel[first] = True
            idx = np.flatnonzero(keep)[sel]
        else:
            idx = np.flatnonzero(keep)
        pts = x[idx]
        tree = cKDTree(pts)
        nbr_lists = tree.query_ball_point(pts, r)
        kmax = max((len(l) for l in nbr_lists), default=1)
        nn = np.zeros((len(pts), kmax), np.int64)
        w8 = np.zeros((len(pts), kmax), np.float64)
        for i, l in enumerate(nbr_lists):
            nn[i, : len(l)] = l
            w8[i, : len(l)] = 1.0
        tp = torch.as_tensor(pts)
        tnn = torch.as_tensor(nn)
        tw = torch.as_tensor(w8)
        nbr = tp[tnn]  # (m, K, 3)
        wsum = tw.sum(dim=1, keepdim=True)
        mean = (tw.unsqueeze(-1) * nbr).sum(dim=1) / wsum.clamp(min=1e-12)
        xc = (nbr - mean[:, None, :]) * tw.unsqueeze(-1).sqrt()
        cov = torch.einsum("mki,mkj->mij", xc, xc) / (
            wsum - 1).clamp(min=1e-6)[..., None]
        evals, evecs = torch.linalg.eigh(cov)
        normals = evecs[..., 0]
        view = torch.as_tensor(vp[idx]) - tp
        view = view / view.norm(dim=1, keepdim=True).clamp(min=1e-12)
        flip = (normals * view).sum(1, keepdim=True) < 0
        normals = torch.where(flip, -normals, normals)
        inc = torch.arccos(
            (normals * view).sum(1).abs().clamp(max=1.0))
        bias = inc.pow(4.0) * (-0.002)
        depth_t = torch.as_tensor(depth[idx])
        corrected = tp + ((depth_t * (1.0 - bias)) - depth_t).unsqueeze(-1) * (
            -view)
        return np.asarray(corrected)

    callback()  # warmup (BLAS thread pools etc.)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        callback()
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times) * 1e3)
    print("[bench] node torch-cpu reference callback: median %.1f ms over "
          "%d calls" % (ms, reps), file=sys.stderr)
    return ms


def run_node_mode():
    cfg, scan = build_node_scan()
    st = bench_node(cfg, scan)
    ref_ms = bench_node_torch_baseline(cfg, scan)
    pts_per_sec = st["n_kept"] / (st["chip_ms"] / 1e3)
    print("[bench] node corrected points/sec/chip: %.3g "
          "(chip vs_baseline %.1fx, e2e-through-tunnel %.1fx)"
          % (pts_per_sec, ref_ms / st["chip_ms"], ref_ms / st["e2e_ms"]),
          file=sys.stderr)
    return {
        "node_ms": st["chip_ms"],
        "node_e2e_ms": st["e2e_ms"],
        "node_ref_ms": ref_ms,
        "node_points": st["n_kept"],
        "node_k": st["k"],
    }


def _sizes(data):
    n_global = int(np.asarray(data.batches[0].cloud.valid).sum())
    n_query = int(np.asarray(data.masks[0]).size)
    n_masked = int(np.asarray(data.masks[0]).sum())
    k = int(np.asarray(data.neighbors[0]).shape[1])
    return n_global, n_query, n_masked, k


def run_mode(uncapped: bool):
    """Measure one graph mode end to end; returns the stderr-logged stats."""
    mode = "uncapped" if uncapped else "capped"
    cfg, data, full_nn = build_workload(uncapped)
    n_global, n_query, n_masked, k = _sizes(data)
    engine = (
        "cellwin"
        if any(c is not None for c in (getattr(data, "cellwin", ()) or ()))
        else "gather"
    )
    print(
        "[bench] %s workload: %d corrected global points; %d query rows "
        "(%d in loss), K=%d, engine=%s"
        % (mode, n_global, n_query, n_masked, k, engine),
        file=sys.stderr,
    )

    ours_ms, loss0_ours, w6_ours, _final = bench_ours(cfg, data)
    print("[bench] %s ours: %.3f ms/step" % (mode, ours_ms), file=sys.stderr)

    n_full = int(np.asarray(full_nn).shape[0])
    ref_ms, _loss0_full, _w6_full = bench_torch_baseline(cfg, data,
                                                         full_nn=full_nn)
    print(
        "[bench] %s torch-cpu f64 baseline, reference semantics "
        "(all %d rows; median): %.3f ms/step"
        % (mode, n_full, ref_ms),
        file=sys.stderr,
    )
    opt_ms, loss0_ref, w6_ref = bench_torch_baseline(cfg, data)
    print(
        "[bench] %s torch-cpu f64 optimized variant (our compaction, "
        "%d rows; median): %.3f ms/step" % (mode, n_query, opt_ms),
        file=sys.stderr,
    )

    # Parity on the measured workload, from the OPTIMIZED torch variant:
    # it consumes the same compacted rows, weights, and masks as our step
    # (the reference-semantics baseline masks only by neighbor count, so
    # its row set differs by the eigenvalue-ratio mask), making its f64
    # w=0 loss the oracle for ours (f32 TPU). w after 6 identical
    # Adam(2e-4) steps probes gradient agreement through the optimizer.
    loss_rel = abs(loss0_ours - loss0_ref) / max(abs(loss0_ref), 1e-30)
    w_rel = abs(w6_ours - w6_ref) / max(abs(w6_ref), 1e-30)
    print(
        "[bench] %s parity: loss(w=0) ours %.8e vs torch-f64 %.8e "
        "(rel %.2e); w after %d steps ours %.6e vs %.6e (rel %.2e)"
        % (mode, loss0_ours, loss0_ref, loss_rel, 1 + TORCH_STEPS,
           w6_ours, w6_ref, w_rel),
        file=sys.stderr,
    )

    pts_per_sec = n_global / (ours_ms / 1e3)
    print("[bench] %s corrected points/sec/chip: %.3g" % (mode, pts_per_sec),
          file=sys.stderr)
    return {
        "ours_ms": ours_ms,
        "ref_ms": ref_ms,
        "opt_ms": opt_ms,
        "loss_rel": loss_rel,
        "w_rel": w_rel,
        "engine": engine,
        "k": k,
    }


def main():
    import os

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

    modes = os.environ.get("DC_BENCH_MODES", "uncapped,capped,node").split(",")
    stats = {}
    node_stats = None
    for m in modes:
        if m == "node":
            node_stats = run_node_mode()
        else:
            stats[m] = run_mode(m == "uncapped")

    u = stats.get("uncapped") or (
        next(iter(stats.values())) if stats else None
    )
    out = {}
    if u is not None:
        out = {
            "metric": "train_step_ms",
            "value": round(u["ours_ms"], 3),
            "unit": "ms",
            "vs_baseline": round(u["ref_ms"] / u["ours_ms"], 2),
            "graph": "uncapped_r0.25" if "uncapped" in stats else "capped32",
            "engine": u["engine"],
            "vs_optimized_torch": round(u["opt_ms"] / u["ours_ms"], 2),
            "loss_rel_err_w0": round(u["loss_rel"], 9),
            "w_rel_err_6steps": round(u["w_rel"], 9),
        }
    elif node_stats is not None:
        out = {
            "metric": "node_scan_ms",
            "value": round(node_stats["node_ms"], 3),
            "unit": "ms",
            "vs_baseline": round(
                node_stats["node_ref_ms"] / node_stats["node_ms"], 2),
        }
    c = stats.get("capped")
    if c is not None:
        out["capped32_ms"] = round(c["ours_ms"], 3)
        out["capped32_vs_baseline"] = round(c["ref_ms"] / c["ours_ms"], 2)
    if node_stats is not None:
        out["node_ms"] = round(node_stats["node_ms"], 3)
        out["node_vs_baseline"] = round(
            node_stats["node_ref_ms"] / node_stats["node_ms"], 2)
        out["node_points"] = node_stats["node_points"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
