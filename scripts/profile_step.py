"""Stage-by-stage timing of the benchmark training step on the live chip.

Each stage is timed with a dependent scalar materialization (float(sum(...)))
per the verify-skill guidance: block_until_ready alone can return phantom
timings through the axon tunnel.

Run:  nohup python scripts/profile_step.py > /tmp/profile_step.log 2>&1 &
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import build_workload, to_device  # noqa: E402


def timeit(name, fn, *args, reps=10):
    import jax
    import jax.numpy as jnp

    for _ in range(3):
        r = fn(*args)
        jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        leaf = jax.tree_util.tree_leaves(r)[0]
        _ = float(jnp.sum(leaf) if leaf.ndim else leaf)
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts) * 1e3)
    print("%-34s %8.3f ms" % (name, med), flush=True)
    return med


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.ops.features import neighborhood_features
    from depth_correction_tpu.preproc import global_cloud
    from depth_correction_tpu.train import make_loss_fn

    cfg, data = build_workload()
    device = jax.devices()[0]
    print("device:", device, flush=True)
    data = to_device(data, device)

    batch = data.batches[0]
    nn, w = data.neighbors[0], data.weights[0]
    t_nn, t_sl, t_w = data.t_neighbors[0], data.t_slots[0], data.t_weights[0]
    mask = data.masks[0]
    m_global = int(np.prod(np.asarray(batch.cloud.depth.shape)))
    print(
        "shapes: global M=%d  query Mq=%d K=%d  transpose Mt=%d Kt=%d "
        "(pairs fwd=%d bwd_padded=%d, bwd real=%d)"
        % (
            m_global,
            nn.shape[0],
            nn.shape[1],
            t_nn.shape[0],
            t_nn.shape[1],
            nn.size,
            t_nn.size,
            int(np.asarray((t_nn >= 0).sum())),
        ),
        flush=True,
    )

    params = {"model": ScaledPolynomial(w=jnp.zeros(1), exponent=jnp.asarray([4.0]))}
    params = to_device(params, device)
    loss_fn = make_loss_fn(cfg)
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    @jax.jit
    def full_step(params, opt_state, data):
        loss, grads = jax.value_and_grad(loss_fn)(params, data)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    @jax.jit
    def fwd_loss(params, data):
        return loss_fn(params, data)

    @jax.jit
    def gcloud_points(params, batch):
        return global_cloud(batch, model=params["model"]).get_points()

    pts = jax.block_until_ready(gcloud_points(params, batch))

    @jax.jit
    def moments_fwd(pts, nn, w, t_nn, t_sl, t_w):
        f = neighborhood_features(
            pts, nn, w, compute_normals=False, t_idx=t_nn, t_slot=t_sl, t_w=t_w
        )
        return f["eigvals"]

    @jax.jit
    def moments_grad(pts, nn, w, t_nn, t_sl, t_w):
        def surrogate(p):
            f = neighborhood_features(
                p, nn, w, compute_normals=False, t_idx=t_nn, t_slot=t_sl, t_w=t_w
            )
            return jnp.sum(f["trace"])  # skips eigh entirely

        return jax.grad(surrogate)(pts)

    @jax.jit
    def loss_from_points_grad(pts, nn, w, t_nn, t_sl, t_w, mask):
        def fn(p):
            f = neighborhood_features(
                p, nn, w, compute_normals=False, t_idx=t_nn, t_slot=t_sl, t_w=t_w
            )
            ev = f["eigvals"]
            pw = ev[..., 0] / jnp.maximum(jnp.sum(ev, -1), 1e-6)
            return jnp.sum(jnp.where(mask, pw, 0.0)) / jnp.maximum(jnp.sum(mask), 1)

        return jax.grad(fn)(pts)

    @jax.jit
    def gcloud_grad(params, batch, cot):
        def fn(p):
            return jnp.vdot(gcloud_points(p, batch), cot)

        return jax.grad(fn)(params)

    cot = jnp.ones_like(pts)

    t_full = timeit("full step", full_step, params, opt_state, data)
    t_fwd = timeit("forward loss", fwd_loss, params, data)
    t_gc = timeit("global_cloud fwd", gcloud_points, params, batch)
    t_mom = timeit("moments fwd (gather+cov+eigvals)", moments_fwd, pts, nn, w, t_nn, t_sl, t_w)
    t_momg = timeit("moments fwd+bwd (trace surrogate)", moments_grad, pts, nn, w, t_nn, t_sl, t_w)
    t_lg = timeit("loss fwd+bwd from points", loss_from_points_grad, pts, nn, w, t_nn, t_sl, t_w, mask)
    t_gcg = timeit("global_cloud fwd+bwd", gcloud_grad, params, batch, cot)

    print(
        "\nderived: backward-of-moments ~%.2f ms; eigh+loss tail fwd ~%.2f ms; "
        "full-step overhead vs (loss fwd+bwd + gcloud bwd) ~%.2f ms"
        % (t_momg - t_mom, t_fwd - t_gc - t_mom, t_full - t_lg - t_gcg),
        flush=True,
    )

    mem = full_step.lower(params, opt_state, data).compile().memory_analysis()
    print("memory: temp=%.0f MiB args=%.0f MiB output=%.0f MiB" % (
        mem.temp_size_in_bytes / 2**20,
        mem.argument_size_in_bytes / 2**20,
        mem.output_size_in_bytes / 2**20,
    ), flush=True)


if __name__ == "__main__":
    main()
