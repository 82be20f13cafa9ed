"""Multi-chip sharding on the 8-virtual-device CPU mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from depth_correction_tpu.models import ScaledPolynomial


def _setup():
    import __graft_entry__ as ge

    return ge._tiny_setup()


@pytest.mark.slow
def test_sharded_loss_matches_single_device():
    from depth_correction_tpu.parallel import (
        make_mesh,
        make_sharded_loss_fn,
        shard_train_data,
    )
    from depth_correction_tpu.train import make_loss_fn

    cfg, data, model = _setup()
    params = {"model": ScaledPolynomial(w=jnp.asarray([-0.001]), exponent=jnp.asarray([4.0]))}

    ref = float(make_loss_fn(data, cfg)({**params}))

    mesh = make_mesh(8)
    sharded = shard_train_data(data, mesh)
    got = float(make_sharded_loss_fn(sharded, cfg, mesh)(params))
    np.testing.assert_allclose(got, ref, rtol=1e-6)

    # Gradients agree too.
    def w_loss_single(w):
        p = {"model": ScaledPolynomial(w=w, exponent=jnp.asarray([4.0]))}
        return make_loss_fn(data, cfg)(p)

    def w_loss_sharded(w):
        p = {"model": ScaledPolynomial(w=w, exponent=jnp.asarray([4.0]))}
        return make_sharded_loss_fn(sharded, cfg, mesh)(p)

    w0 = jnp.asarray([-0.001])
    g_ref = np.asarray(jax.grad(w_loss_single)(w0))
    g_got = np.asarray(jax.grad(w_loss_sharded)(w0))
    np.testing.assert_allclose(g_got, g_ref, rtol=1e-5)


def test_sharded_analytic_vjp_used_and_exact():
    """shard_train_data builds per-shard transpose graphs; the sharded
    value_and_grad matches the single-device analytic path to 1e-6."""
    from depth_correction_tpu.parallel import (
        make_mesh,
        make_sharded_loss_fn,
        shard_train_data,
    )
    from depth_correction_tpu.train import make_loss_fn

    cfg, data, model = _setup()
    mesh = make_mesh(8)
    sharded = shard_train_data(data, mesh)
    assert sharded.t_neighbors[0] is not None
    assert not hasattr(sharded.t_neighbors[0], "idx")  # stacked arrays
    assert sharded.t_neighbors[0].shape[0] % 8 == 0

    def single(w):
        p = {"model": ScaledPolynomial(w=w, exponent=jnp.asarray([4.0]))}
        return make_loss_fn(data, cfg)(p)

    def multi(w):
        p = {"model": ScaledPolynomial(w=w, exponent=jnp.asarray([4.0]))}
        return make_sharded_loss_fn(sharded, cfg, mesh)(p)

    w0 = jnp.asarray([-0.002])
    v_ref, g_ref = jax.value_and_grad(single)(w0)
    v_got, g_got = jax.jit(jax.value_and_grad(multi))(w0)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-5)


def test_sharded_loss_offset_matches_single_device():
    """Dynamic loss_offset rides the sharded step: value and grad match the
    single-device path."""
    import __graft_entry__ as ge

    from depth_correction_tpu.parallel import (
        make_mesh,
        make_sharded_loss_fn,
        shard_train_data,
    )
    from depth_correction_tpu.train import make_loss_fn, prepare_sequences
    from depth_correction_tpu.datasets import create_dataset

    cfg, _, _ = ge._tiny_setup({"loss_offset": True})
    ds = create_dataset(cfg.train_names[0], cfg)
    data = prepare_sequences([ds], cfg)
    assert data.off_neighbors[0] is not None
    mesh = make_mesh(8)
    sharded = shard_train_data(data, mesh)
    assert isinstance(sharded.off_transpose[0], tuple)

    def single(w):
        p = {"model": ScaledPolynomial(w=w, exponent=jnp.asarray([4.0]))}
        return make_loss_fn(data, cfg)(p)

    def multi(w):
        p = {"model": ScaledPolynomial(w=w, exponent=jnp.asarray([4.0]))}
        return make_sharded_loss_fn(sharded, cfg, mesh)(p)

    w0 = jnp.asarray([-0.0015])
    v_ref, g_ref = jax.value_and_grad(single)(w0)
    v_got, g_got = jax.jit(jax.value_and_grad(multi))(w0)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-5)


def test_sharded_inlier_trim_matches_single_device():
    """Global inlier-quantile trim (all_gather + replicated threshold)."""
    import __graft_entry__ as ge

    from depth_correction_tpu.parallel import (
        make_mesh,
        make_sharded_loss_fn,
        shard_train_data,
    )
    from depth_correction_tpu.train import make_loss_fn, prepare_sequences
    from depth_correction_tpu.datasets import create_dataset

    cfg, _, _ = ge._tiny_setup(
        {"loss_kwargs": {"sqrt": False, "normalization": True,
                         "inlier_ratio": 0.8}}
    )
    ds = create_dataset(cfg.train_names[0], cfg)
    data = prepare_sequences([ds], cfg)
    mesh = make_mesh(8)
    sharded = shard_train_data(data, mesh)

    w0 = jnp.asarray([-0.001])
    p = {"model": ScaledPolynomial(w=w0, exponent=jnp.asarray([4.0]))}
    v_ref = float(make_loss_fn(data, cfg)(p))
    v_got = float(jax.jit(make_sharded_loss_fn(sharded, cfg, mesh))(p))
    np.testing.assert_allclose(v_got, v_ref, rtol=1e-6)


def test_sharded_icp_loss_matches_single_device():
    """Point-sharded ICP objective: loss and gradient match the
    single-device batched path."""
    import __graft_entry__ as ge

    from depth_correction_tpu.parallel import (
        make_mesh,
        make_sharded_loss_fn,
        shard_train_data,
    )
    from depth_correction_tpu.train import make_loss_fn, prepare_sequences
    from depth_correction_tpu.datasets import create_dataset

    cfg, _, _ = ge._tiny_setup(
        {"loss": "icp_loss",
         "loss_kwargs": {"icp_point_to_plane": True, "icp_inlier_ratio": 0.8}}
    )
    ds = create_dataset(cfg.train_names[0], cfg)
    data = prepare_sequences([ds], cfg)
    mesh = make_mesh(8)
    sharded = shard_train_data(data, mesh)
    assert sharded.icp_idx[0] is not None

    def single(w):
        p = {"model": ScaledPolynomial(w=w, exponent=jnp.asarray([4.0]))}
        return make_loss_fn(data, cfg)(p)

    def multi(w):
        p = {"model": ScaledPolynomial(w=w, exponent=jnp.asarray([4.0]))}
        return make_sharded_loss_fn(sharded, cfg, mesh)(p)

    w0 = jnp.asarray([-0.001])
    v_ref, g_ref = jax.value_and_grad(single)(w0)
    v_got, g_got = jax.jit(jax.value_and_grad(multi))(w0)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-5)


def test_sharded_plane_mode_matches_single_device():
    """Plane-neighborhood mode sharded along the support axis: value + grad
    match the single-device path."""
    import __graft_entry__ as ge

    from depth_correction_tpu.parallel import (
        make_mesh,
        make_sharded_loss_fn,
        shard_train_data,
    )
    from depth_correction_tpu.train import make_loss_fn, prepare_sequences
    from depth_correction_tpu.datasets import create_dataset

    # trace_loss first: no eigenvalue cancellation, so the split support-axis
    # reduction must agree tightly. min_eigval after: lambda_1 of a
    # near-planar covariance amplifies summation-order noise by
    # |cov|/lambda_1 (~1e7 here), so only a loose check is meaningful
    # (verified: float64 grads agree to 1e-7).
    for loss, v_rtol, g_rtol in (
        ("trace_loss", 1e-6, 1e-5),
        ("min_eigval_loss", 1e-3, 1e-3),
    ):
        cfg, _, _ = ge._tiny_setup(
            {"nn_type": "plane", "loss": loss,
             "loss_kwargs": {"sqrt": False, "normalization": False}}
        )
        cfg.max_neighborhoods = 4
        ds = create_dataset(cfg.train_names[0], cfg)
        data = prepare_sequences([ds], cfg)
        assert hasattr(data.neighbors[0], "member_idx")
        mesh = make_mesh(8)
        sharded = shard_train_data(data, mesh)
        assert sharded.neighbors[0].member_idx.shape[1] % 8 == 0

        def single(w):
            p = {"model": ScaledPolynomial(w=w, exponent=jnp.asarray([4.0]))}
            return make_loss_fn(data, cfg)(p)

        def multi(w):
            p = {"model": ScaledPolynomial(w=w, exponent=jnp.asarray([4.0]))}
            return make_sharded_loss_fn(sharded, cfg, mesh)(p)

        w0 = jnp.asarray([-0.002])
        v_ref, g_ref = jax.value_and_grad(single)(w0)
        v_got, g_got = jax.jit(jax.value_and_grad(multi))(w0)
        np.testing.assert_allclose(float(v_got), float(v_ref), rtol=v_rtol)
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_ref), rtol=g_rtol
        )


def test_point_table_sharded_placement():
    """Memory scaling: the scan batch (point table source), the query-row
    tables, and the transpose graphs are SPLIT across the mesh — each device
    holds ~1/D rows; nothing big replicates."""
    from depth_correction_tpu.parallel import (
        make_mesh,
        make_sharded_loss_fn,
        shard_train_data,
    )
    from depth_correction_tpu.train import make_loss_fn

    cfg, data, model = _setup()
    mesh = make_mesh(8)
    sharded = shard_train_data(data, mesh)

    depth = sharded.batches[0].cloud.depth  # (S, N)
    assert not depth.sharding.is_fully_replicated
    assert depth.addressable_shards[0].data.shape[1] * 8 == depth.shape[1]
    vps = sharded.batches[0].cloud.vps  # (S, N, 3)
    assert vps.addressable_shards[0].data.shape[1] * 8 == vps.shape[1]
    assert sharded.batches[0].poses.sharding.is_fully_replicated
    nn = sharded.neighbors[0]
    assert nn.addressable_shards[0].data.shape[0] * 8 == nn.shape[0]

    # Parity against the single-device path with the point table sharded.
    params = {"model": ScaledPolynomial(w=jnp.asarray([-0.001]),
                                        exponent=jnp.asarray([4.0]))}
    ref = float(make_loss_fn(data, cfg)(params))
    got = float(jax.jit(make_sharded_loss_fn(sharded, cfg, mesh))(params))
    np.testing.assert_allclose(got, ref, rtol=1e-6)

    # Replicated-batch legacy layout still works (compute-only scaling).
    legacy = shard_train_data(data, mesh, shard_points=False)
    assert legacy.batches[0].cloud.depth.sharding.is_fully_replicated
    got2 = float(jax.jit(make_sharded_loss_fn(legacy, cfg, mesh))(params))
    np.testing.assert_allclose(got2, ref, rtol=1e-6)


def test_sharded_nn_scale_matches_single_device():
    """Gaussian re-weighting (nn_scale) trains compacted AND sharded: the
    sharded value/grad match the single-device compacted path."""
    import __graft_entry__ as ge

    from depth_correction_tpu.parallel import (
        make_mesh,
        make_sharded_loss_fn,
        shard_train_data,
    )
    from depth_correction_tpu.train import make_loss_fn, prepare_sequences
    from depth_correction_tpu.datasets import create_dataset

    cfg, _, _ = ge._tiny_setup({"nn_scale": 0.3})
    ds = create_dataset(cfg.train_names[0], cfg)
    data = prepare_sequences([ds], cfg)
    assert data.query_rows[0] is not None
    mesh = make_mesh(8)
    sharded = shard_train_data(data, mesh)

    def single(w):
        p = {"model": ScaledPolynomial(w=w, exponent=jnp.asarray([4.0]))}
        return make_loss_fn(data, cfg)(p)

    def multi(w):
        p = {"model": ScaledPolynomial(w=w, exponent=jnp.asarray([4.0]))}
        return make_sharded_loss_fn(sharded, cfg, mesh)(p)

    w0 = jnp.asarray([-0.001])
    v_ref, g_ref = jax.value_and_grad(single)(w0)
    v_got, g_got = jax.jit(jax.value_and_grad(multi))(w0)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-5)

    # Pair-level shard transposes (what train()/eval_loss() build under
    # nn_scale): scatter-free gather backward, same value and gradient.
    paired = shard_train_data(data, mesh, analytic_vjp=False,
                              pair_transposes=True)
    assert paired.t_slots[0] is not None and paired.t_weights[0] is None

    def multi_pair(w):
        p = {"model": ScaledPolynomial(w=w, exponent=jnp.asarray([4.0]))}
        return make_sharded_loss_fn(paired, cfg, mesh)(p)

    v_p, g_p = jax.jit(jax.value_and_grad(multi_pair))(w0)
    np.testing.assert_allclose(float(v_p), float(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_ref), rtol=1e-5)


def test_sharded_grid_establishment_matches_single_device():
    """Radius establishment under shard_map: identical neighbor sets, and
    the (Q, K) output tables are born sharded across the mesh."""
    from depth_correction_tpu.ops.grid_hash import (
        grid_radius_neighbors,
        grid_radius_neighbors_sharded,
    )
    from depth_correction_tpu.parallel import make_mesh

    rng = np.random.default_rng(21)
    pts = rng.uniform(-4, 4, (3000, 3)).astype(np.float32)
    r, k = 0.3, 24
    d1, i1 = grid_radius_neighbors(pts, r=r, k=k)
    mesh = make_mesh(8)
    d8, i8 = grid_radius_neighbors_sharded(pts, r=r, k=k, mesh=mesh)
    sets1 = [set(int(j) for j in row if j >= 0) for row in np.asarray(i1)]
    sets8 = [set(int(j) for j in row if j >= 0) for row in np.asarray(i8)]
    assert sets1 == sets8

    # establish_neighborhoods(mesh=...) routes the radius branch through it.
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from depth_correction_tpu.cloud import Cloud
    from depth_correction_tpu.preproc import establish_neighborhoods

    cfg, _, _ = ge._tiny_setup()
    cloud = Cloud.from_points(jnp.asarray(pts), pad_to=3072)
    nn_1, _ = establish_neighborhoods(cloud, cfg)
    nn_8, _ = establish_neighborhoods(cloud, cfg, mesh=mesh)
    s1 = [set(int(j) for j in row if j >= 0) for row in np.asarray(nn_1)]
    s8 = [set(int(j) for j in row if j >= 0) for row in np.asarray(nn_8)]
    assert s1 == s8


def test_sharded_knn_establishment_matches_single_device():
    """kNN establishment under shard_map (cfg.nn_k > 0): bitwise-identical
    neighbor lists, outputs born sharded across the mesh."""
    from depth_correction_tpu.ops.knn import (
        nearest_neighbors,
        nearest_neighbors_sharded,
    )
    from depth_correction_tpu.parallel import make_mesh

    rng = np.random.default_rng(22)
    pts = rng.uniform(-4, 4, (2500, 3)).astype(np.float32)
    d1, i1 = nearest_neighbors(pts, pts, k=12, r=0.8)
    mesh = make_mesh(8)
    d8, i8 = nearest_neighbors_sharded(pts, pts, k=12, r=0.8, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i8))
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d8), rtol=0, atol=0
    )
    # (Born-sharded placement of the big tables is asserted by
    # test_point_table_sharded_placement after shard_train_data; the final
    # un-pad slice of a tiny output can legally land on one device.)

    # establish_neighborhoods(mesh=...) routes the nn_k branch through it.
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from depth_correction_tpu.cloud import Cloud
    from depth_correction_tpu.preproc import establish_neighborhoods

    cfg, _, _ = ge._tiny_setup()
    cfg.nn_k, cfg.nn_r = 10, None
    cloud = Cloud.from_points(jnp.asarray(pts), pad_to=2560)
    nn_1, _ = establish_neighborhoods(cloud, cfg)
    nn_8, _ = establish_neighborhoods(cloud, cfg, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(nn_1), np.asarray(nn_8))


def test_train_honors_mesh_shape(tmp_path):
    """cfg.mesh_shape drives train() end to end: data shards over the mesh,
    the sharded step trains, and the it-0 loss matches the single-device
    run (same establishment, same reduction semantics)."""
    from depth_correction_tpu.config import Config
    from depth_correction_tpu.train import train

    def base(log_dir):
        cfg = Config()
        cfg.log_dir = str(log_dir)
        cfg.float_type = "float32"
        cfg.train_names = ["ground_plane/4"]
        cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.1, 20.0, 0.25
        cfg.nn_r, cfg.nn_k = 0.4, 0
        cfg.vp_dispersion_bounds = []
        cfg.eigenvalue_ratio_bounds = []
        cfg.min_valid_neighbors = 3
        cfg.loss = "min_eigval_loss"
        cfg.loss_kwargs = {"sqrt": False, "normalization": True}
        cfg.depth_bias_model_kwargs = {"w": [-0.002], "exponent": [4.0]}
        cfg.lr, cfg.n_opt_iters = 1e-3, 6
        return cfg

    def history(log_dir):
        rows = np.loadtxt(log_dir / "train_history.csv", skiprows=1, ndmin=2)
        return rows[:, 1]

    cfg_s = base(tmp_path / "single")
    best_s = train(cfg_s)
    loss_s = history(tmp_path / "single")

    cfg_m = base(tmp_path / "mesh")
    cfg_m.mesh_shape = {"data": 8}
    best_m = train(cfg_m)
    loss_m = history(tmp_path / "mesh")

    assert best_s is not None and best_m is not None
    np.testing.assert_allclose(loss_m[0], loss_s[0], rtol=1e-5)
    assert loss_m[-1] < loss_m[0]
    np.testing.assert_allclose(loss_m[-1], loss_s[-1], rtol=1e-3)


def test_eval_loss_honors_mesh_shape(tmp_path):
    """cfg.mesh_shape shards evaluation too; the value matches the
    single-device eval to reduction tolerance."""
    from depth_correction_tpu.config import Config
    from depth_correction_tpu.eval import eval_loss

    def base():
        cfg = Config()
        cfg.log_dir = str(tmp_path / "log")
        cfg.test_names = ["ground_plane/4"]
        cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.1, 20.0, 0.25
        cfg.nn_r, cfg.nn_k = 0.4, 0
        cfg.vp_dispersion_bounds = []
        cfg.eigenvalue_ratio_bounds = []
        cfg.min_valid_neighbors = 3
        cfg.model_kwargs = {"w": [-0.001], "exponent": [4.0]}
        cfg.loss_kwargs = {"sqrt": False, "normalization": True}
        return cfg

    ref = eval_loss(base())
    cfg = base()
    cfg.mesh_shape = {"data": 8}
    got = eval_loss(cfg)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    val = jax.jit(fn)(*args)
    assert np.isfinite(float(val))


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_pose_correction_grads_match_single_device():
    """Joint model+pose training sharded: value AND gradients w.r.t. the
    per-scan pose deltas match the single-device path (the deltas enter
    inside the shard body via corrected_poses; their grads psum)."""
    import __graft_entry__ as ge

    from depth_correction_tpu.config import PoseCorrection
    from depth_correction_tpu.parallel import (
        make_mesh,
        make_sharded_loss_fn,
        shard_train_data,
    )
    from depth_correction_tpu.train import make_loss_fn

    cfg, data, _ = ge._tiny_setup({"pose_correction": PoseCorrection.pose})
    n_scans = data.batches[0].num_scans
    mesh = make_mesh(8)
    sharded = shard_train_data(data, mesh)

    single_fn = make_loss_fn(data, cfg)
    multi_fn = make_sharded_loss_fn(sharded, cfg, mesh)

    def value(fn, w, deltas):
        p = {
            "model": ScaledPolynomial(w=w, exponent=jnp.asarray([4.0])),
            "pose_deltas": (deltas,),
        }
        return fn(p)

    w0 = jnp.asarray([-0.001])
    rng = np.random.default_rng(5)
    d0 = jnp.asarray(rng.normal(0, 1e-3, (n_scans, 6)), jnp.float32)

    v_ref, (gw_ref, gd_ref) = jax.value_and_grad(
        lambda w, d: value(single_fn, w, d), argnums=(0, 1)
    )(w0, d0)
    v_got, (gw_got, gd_got) = jax.jit(
        jax.value_and_grad(lambda w, d: value(multi_fn, w, d), argnums=(0, 1))
    )(w0, d0)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_got), np.asarray(gw_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gd_got), np.asarray(gd_ref), rtol=1e-4, atol=1e-9
    )
    assert float(jnp.abs(gd_ref).max()) > 0  # pose grads actually flow


def test_sharded_plane_inlier_trim_and_finite_kwargs():
    """Sharded plane mode honors the inlier-trim / only_finite loss kwargs
    the single-device path applies — with trimming active the two values
    must still agree (trim happens pre-relu, quantile over valid planes)."""
    import __graft_entry__ as ge

    from depth_correction_tpu.parallel import (
        make_mesh,
        make_sharded_loss_fn,
        shard_train_data,
    )
    from depth_correction_tpu.train import make_loss_fn, prepare_sequences
    from depth_correction_tpu.datasets import create_dataset

    cfg, _, _ = ge._tiny_setup(
        {"nn_type": "plane", "loss": "trace_loss",
         "train_names": ["open_box/n_4_size_10_10_5_height_1_density_60"],
         "min_depth": 0.1, "max_depth": 30.0, "grid_res": 0.3, "nn_r": 0.6,
         "loss_kwargs": {"sqrt": False, "normalization": False,
                         "inlier_ratio": 0.6, "only_finite": True}}
    )
    cfg.max_neighborhoods = 6
    ds = create_dataset(cfg.train_names[0], cfg)
    data = prepare_sequences([ds], cfg)
    mesh = make_mesh(8)
    sharded = shard_train_data(data, mesh)

    w0 = jnp.asarray([-0.002])
    p = {"model": ScaledPolynomial(w=w0, exponent=jnp.asarray([4.0]))}
    v_ref = float(make_loss_fn(data, cfg)(p))
    v_got = float(jax.jit(make_sharded_loss_fn(sharded, cfg, mesh))(p))
    np.testing.assert_allclose(v_got, v_ref, rtol=1e-6)

    # Trim must actually change the objective vs the untrimmed config.
    cfg2 = cfg.copy()
    cfg2.loss_kwargs = {"sqrt": False, "normalization": False}
    v_untrimmed = float(jax.jit(make_sharded_loss_fn(sharded, cfg2, mesh))(p))
    assert v_got < v_untrimmed


def test_make_mesh_accepts_explicit_devices():
    """The multi-host seam: the mesh builder must take a pre-initialized
    (process-spanning) device list instead of re-deriving its own."""
    from depth_correction_tpu.parallel import make_mesh

    devs = jax.devices()
    mesh = make_mesh(devices=devs)
    assert list(mesh.devices.ravel()) == list(devs)
    mesh4 = make_mesh(4, devices=devs)
    assert list(mesh4.devices.ravel()) == list(devs[:4])
    import pytest

    with pytest.raises(ValueError, match="available"):
        make_mesh(len(devs) + 1, devices=devs)


def test_mesh_from_config_variants():
    from depth_correction_tpu.config import Config
    from depth_correction_tpu.parallel.sharding import mesh_from_config

    cfg = Config()
    assert mesh_from_config(cfg) is None
    cfg.mesh_shape = {"data": 1}
    assert mesh_from_config(cfg) is None
    cfg.mesh_shape = {"data": 8}
    assert mesh_from_config(cfg).devices.size == 8
    cfg.mesh_shape = 4
    assert mesh_from_config(cfg).devices.size == 4


def test_multihost_mesh_via_jax_distributed():
    """make_multihost_mesh initializes jax.distributed and builds the mesh
    over the GLOBAL device list. Real DCN needs multiple hosts; here one
    process with 8 virtual devices exercises the full initialize ->
    global-devices -> mesh -> collective path in a subprocess (the client
    must connect before any backend exists, so it cannot run in-process).
    """
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
from depth_correction_tpu.parallel import make_multihost_mesh
mesh = make_multihost_mesh(
    coordinator_address="localhost:18476", num_processes=1, process_id=0)
assert mesh.devices.size == 8, mesh
assert jax.process_count() == 1
# a collective over the mesh actually runs
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
x = jax.device_put(jnp.arange(16.0), NamedSharding(mesh, P("data")))
s = jax.jit(lambda v: v.sum())(x)
assert float(s) == 120.0, s
# idempotent: a second call reuses the live client
mesh2 = make_multihost_mesh(
    coordinator_address="localhost:18476", num_processes=1, process_id=0)
assert mesh2.devices.size == 8
print("MULTIHOST_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=300,
        cwd=str(__import__("pathlib").Path(__file__).resolve().parents[1]),
    )
    assert "MULTIHOST_OK" in out.stdout, (out.stdout, out.stderr)
