"""Decompose the training-step time on the real chip.

Times, separately: full step (fwd+bwd+adam), forward-only loss, the
neighborhood moments forward, the moments forward+backward, eigvals-only,
and the global_cloud chain — to locate the remaining headroom.
"""
from __future__ import annotations

import sys
import time

import numpy as np


def _materialize(out):
    """Force a device->host read of a dependent scalar: through the axon
    tunnel ``block_until_ready`` can return before the computation ran
    (phantom timings); a float() of a result element cannot."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def timeit(fn, *args, steps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _materialize(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _materialize(out)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, "/root/repo")
    from bench import build_workload, to_device
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.train import make_loss_fn
    from depth_correction_tpu.preproc import global_cloud
    from depth_correction_tpu.ops.features import neighborhood_moments_bucketed, _moments_impl
    from depth_correction_tpu.ops.eigh3 import eigvals3_c

    cfg, data, _full_nn = build_workload()
    device = jax.devices()[0]
    data = to_device(data, device)
    params = {"model": ScaledPolynomial(w=jnp.zeros(1), exponent=jnp.asarray([4.0]))}
    params = to_device(params, device)

    loss_fn = make_loss_fn(cfg)
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, data):
        loss, grads = jax.value_and_grad(loss_fn)(params, data)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    print("full step:         %.2f ms" % timeit(step, params, opt_state, data))

    fwd = jax.jit(loss_fn)
    print("loss forward:      %.2f ms" % timeit(fwd, params, data))

    # global_cloud chain alone
    @jax.jit
    def gc(params, data):
        return global_cloud(data.batches[0], model=params["model"]).get_points()

    print("global_cloud fwd:  %.2f ms" % timeit(gc, params, data))

    pts = gc(params, data)
    nn, w, tg = data.neighbors[0], data.weights[0], data.t_neighbors[0]

    mom_fwd = jax.jit(lambda p: _moments_impl(p, nn, w)[:2])
    print("moments fwd:       %.2f ms" % timeit(mom_fwd, pts))

    @jax.jit
    def mom_vjp(p):
        def f(p):
            mean, comps = neighborhood_moments_bucketed(p, nn, w, tg)
            l1, l2, l3 = eigvals3_c(*comps)
            return jnp.sum(l1 / jnp.maximum(l1 + l2 + l3, 1e-6))

        return jax.value_and_grad(f)(p)

    print("moments+eig f+b:   %.2f ms" % timeit(mom_vjp, pts))

    @jax.jit
    def mom_fwd_eig(p):
        mean, comps = neighborhood_moments_bucketed(p, nn, w, tg)
        l1, l2, l3 = eigvals3_c(*comps)
        return jnp.sum(l1 / jnp.maximum(l1 + l2 + l3, 1e-6))

    print("moments+eig fwd:   %.2f ms" % timeit(mom_fwd_eig, pts))

    # full loss fwd+bwd without adam
    @jax.jit
    def vg(params, data):
        return jax.value_and_grad(loss_fn)(params, data)

    print("loss fwd+bwd:      %.2f ms" % timeit(vg, params, data))

    n_global = int(np.asarray(data.batches[0].cloud.valid).sum())
    mq, k = np.asarray(data.neighbors[0]).shape
    kt = sum(int(np.asarray(i).shape[0]) * int(np.asarray(i).shape[1]) for i in tg.idx)
    print("sizes: global=%d padded=%d query=%d K=%d transpose_pairs=%d"
          % (n_global, np.asarray(data.batches[0].cloud.depth).size, mq, k, kt))


if __name__ == "__main__":
    main()
