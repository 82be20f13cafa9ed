"""End-to-end: inject a known depth bias, train, recover the weight.

The framework's golden integration test, mirroring the reference's tier-3
verification strategy (SURVEY.md section 4: synthetic dataset + DepthBias
injection + train_demo-style GT-weight recovery).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from depth_correction_tpu.config import Config, PoseCorrection
from depth_correction_tpu.datasets import create_dataset
from depth_correction_tpu.loss import min_eigval_loss
from depth_correction_tpu.models import ScaledPolynomial
from depth_correction_tpu.train import (
    init_pose_deltas,
    make_loss_fn,
    make_optimizer,
    prepare_sequences,
    train,
)

GT_W = -0.002


def base_cfg(tmp_path):
    cfg = Config()
    cfg.log_dir = str(tmp_path / "log")
    cfg.float_type = "float64"
    cfg.dataset = "ground_plane"
    cfg.train_names = ["ground_plane/6"]
    cfg.val_names = []
    cfg.min_depth = 0.1
    cfg.max_depth = 20.0
    cfg.grid_res = 0.2
    cfg.nn_r = 0.4
    cfg.nn_k = 0
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = []
    cfg.min_valid_neighbors = 3
    cfg.model_class = "ScaledPolynomial"
    cfg.model_kwargs = {"w": [0.0], "exponent": [4.0]}
    cfg.depth_bias_model_class = "ScaledPolynomial"
    cfg.depth_bias_model_kwargs = {"w": [GT_W], "exponent": [4.0]}
    cfg.loss = "min_eigval_loss"
    cfg.loss_kwargs = {"sqrt": False, "normalization": False}
    cfg.lr = 2e-4
    cfg.n_opt_iters = 60
    cfg.optimizer = "adam"
    cfg.pose_correction = PoseCorrection.none
    return cfg


@pytest.mark.slow
def test_dataset_pipeline_shapes(tmp_path):
    cfg = base_cfg(tmp_path)
    ds = create_dataset("ground_plane/6", cfg)
    assert len(ds) == 6
    cloud, pose = ds[0]
    assert cloud.dtype.names is not None
    assert pose.shape == (4, 4)
    data = prepare_sequences([ds], cfg)
    assert len(data.batches) == 1
    batch = data.batches[0]
    assert batch.poses.shape == (6, 4, 4)
    assert batch.cloud.depth.ndim == 2
    nn = data.neighbors[0]
    assert nn.ndim == 2
    # Some points must be trainable.
    assert int(np.asarray(data.masks[0]).sum()) > 100


@pytest.mark.slow
def test_biased_loss_higher_than_clean(tmp_path):
    """Injected bias must raise the map-consistency loss; the GT model must
    bring it back down (the loss-landscape sanity probe, reference:
    loss_landscape.py:148-209)."""
    cfg = base_cfg(tmp_path)
    ds_clean = create_dataset("ground_plane/6", cfg, noisy=False)
    ds_biased = create_dataset("ground_plane/6", cfg)

    data_clean = prepare_sequences([ds_clean], cfg)
    data_biased = prepare_sequences([ds_biased], cfg)

    identity = ScaledPolynomial(w=jnp.zeros(1), exponent=jnp.asarray([4.0]))
    gt = ScaledPolynomial(w=jnp.asarray([GT_W]), exponent=jnp.asarray([4.0]))

    fn_clean = make_loss_fn(data_clean, cfg)
    fn_biased = make_loss_fn(data_biased, cfg)

    loss_clean = float(fn_clean({"model": identity}))
    loss_biased = float(fn_biased({"model": identity}))
    loss_corrected = float(fn_biased({"model": gt}))

    assert loss_biased > 2 * loss_clean, (loss_biased, loss_clean)
    # GT correction recovers most of the inflation.
    assert loss_corrected < 0.25 * loss_biased, (loss_corrected, loss_biased)


def test_training_recovers_injected_bias(tmp_path):
    """Full train(): the optimized w must approach the injected GT weight."""
    cfg = base_cfg(tmp_path)
    cfg.n_opt_iters = 150
    cfg.lr = 1e-4
    best_cfg = train(cfg)
    assert best_cfg is not None

    from depth_correction_tpu.models import load_model

    model = load_model(cfg=best_cfg)
    w = float(np.asarray(model.w).ravel()[0])
    # Injected bias is ScaledPolynomial.inverse (d / (1 - w g^4)); correcting
    # with weight w removes it exactly. Require most of the bias learned.
    assert w == pytest.approx(GT_W, abs=0.4 * abs(GT_W)), w
    # And the checkpointing artifacts exist.
    import os

    assert os.path.exists(os.path.join(cfg.log_dir, "best.yaml"))
    hist_path = os.path.join(cfg.log_dir, "train_history.csv")
    assert os.path.exists(hist_path)
    # Observability: per-step wall time in the history, TB events emitted
    # (scalars + grads + pose-delta histograms; reference train.py:271-297).
    rows = open(hist_path).read().strip().splitlines()
    assert rows[0].split() == ["iter", "train_loss", "val_loss", "step_ms"]
    assert float(rows[1].split()[3]) > 0.0
    import glob

    assert glob.glob(os.path.join(cfg.log_dir, "events.out.tfevents.*"))


def test_train_observability_pose_mode_and_profiler(tmp_path):
    """train() with pose correction: pose-delta histograms + grads hit the
    TB writer branch; cfg.profile_dir captures a device trace."""
    import glob
    import os

    cfg = base_cfg(tmp_path)
    cfg.n_opt_iters = 8
    cfg.pose_correction = PoseCorrection.pose
    cfg.profile_dir = str(tmp_path / "trace")
    best = train(cfg)
    assert best is not None
    # Trace dir was produced and holds profiler artifacts.
    assert glob.glob(os.path.join(cfg.profile_dir, "**", "*.pb*"), recursive=True) or \
        glob.glob(os.path.join(cfg.profile_dir, "**", "*.trace*"), recursive=True) or \
        glob.glob(os.path.join(cfg.profile_dir, "**", "*.json*"), recursive=True)
    assert glob.glob(os.path.join(cfg.log_dir, "events.out.tfevents.*"))


def test_pose_correction_modes_compile(tmp_path):
    """Pose co-optimization: loss decreases and deltas move for mode=pose."""
    import jax
    import optax

    cfg = base_cfg(tmp_path)
    cfg.pose_noise = 0.01
    cfg.pose_noise_mode = "pose"
    cfg.depth_bias_model_kwargs = {"w": [0.0], "exponent": [4.0]}
    cfg.pose_correction = PoseCorrection.pose
    ds = create_dataset("ground_plane/6", cfg)
    data = prepare_sequences([ds], cfg)
    params = {
        "model": ScaledPolynomial(w=jnp.zeros(1), exponent=jnp.asarray([4.0])),
        "pose_deltas": init_pose_deltas(data, cfg),
    }
    loss_fn = make_loss_fn(data, cfg)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    l0 = float(loss_fn(params))

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    for _ in range(30):
        loss, params, opt_state = step(params, opt_state)
    assert float(loss) < l0
    deltas = np.asarray(params["pose_deltas"][0])
    assert np.any(deltas != 0.0)
