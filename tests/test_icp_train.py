"""ICP-loss training end to end (reference: train.py:179-210, loss.py:373-565).

The reference's third training objective: symmetric point-to-plane distance
over consecutive scan pairs with frozen precomputed correspondences. Inject a
known depth bias, train with icp_loss, and assert the objective decreases and
the recovered weight moves toward the ground truth.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from depth_correction_tpu.config import Config, PoseCorrection
from depth_correction_tpu.datasets import create_dataset
from depth_correction_tpu.models import ScaledPolynomial
from depth_correction_tpu.train import make_loss_fn, prepare_sequences

GT_W = -0.004


def icp_cfg(tmp_path):
    cfg = Config()
    cfg.log_dir = str(tmp_path / "log")
    cfg.float_type = "float64"
    cfg.dataset = "ground_plane"
    cfg.train_names = ["ground_plane/4"]
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
    cfg.loss = "icp_loss"
    cfg.loss_kwargs = {"icp_point_to_plane": True, "icp_inlier_ratio": 0.5}
    cfg.lr = 5e-4
    cfg.n_opt_iters = 40
    cfg.optimizer = "adam"
    cfg.pose_correction = PoseCorrection.none
    return cfg


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    cfg = icp_cfg(tmp_path_factory.mktemp("icp"))
    ds = create_dataset(cfg.train_names[0], cfg)
    data = prepare_sequences([ds], cfg)
    return cfg, data


def test_icp_data_prepared(prepared):
    cfg, data = prepared
    assert len(data.icp_idx) == 1
    s = data.batches[0].poses.shape[0]
    n = data.batches[0].cloud.depth.shape[1]
    assert data.icp_idx[0].shape == (s - 1, n)
    assert data.icp_w[0].shape == (s - 1, n)
    # About icp_inlier_ratio of valid points should be inliers.
    n_valid = float(np.asarray(data.batches[0].cloud.valid[:-1]).sum())
    frac = float(np.asarray(data.icp_w[0]).sum()) / n_valid
    assert 0.3 < frac < 0.7
    # Per-scan normals must survive preparation (point-to-plane needs them).
    assert data.batches[0].cloud.normals is not None


def test_icp_loss_fn_grad(prepared):
    """d(icp)/dw is finite and nonzero at w=0 under injected bias."""
    cfg, data = prepared
    loss_fn = make_loss_fn(cfg)
    params = {
        "model": ScaledPolynomial(
            w=jnp.zeros(1, jnp.float64), exponent=jnp.asarray([4.0], jnp.float64)
        )
    }
    val, grads = jax.value_and_grad(loss_fn)(params, data)
    assert np.isfinite(float(val)) and float(val) > 0
    gw = float(np.asarray(grads["model"].w)[0])
    assert np.isfinite(gw) and gw != 0.0


def test_icp_training_recovers_bias(prepared):
    """Training with icp_loss reduces the pairwise point-to-plane error and
    moves w toward the injected bias (reference scripts/model_learning)."""
    cfg, data = prepared
    loss_fn = make_loss_fn(cfg)
    params = {
        "model": ScaledPolynomial(
            w=jnp.zeros(1, jnp.float64), exponent=jnp.asarray([4.0], jnp.float64)
        )
    }
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, data):
        loss, grads = jax.value_and_grad(loss_fn)(params, data)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    loss0 = None
    for it in range(cfg.n_opt_iters):
        loss, params, opt_state = step(params, opt_state, data)
        if loss0 is None:
            loss0 = float(loss)
    loss_end = float(loss)
    w_end = float(np.asarray(params["model"].w)[0])

    assert loss_end < 0.7 * loss0, (loss0, loss_end)
    # w moved in the right direction, meaningfully.
    assert w_end < 0.3 * GT_W, w_end  # at least 30% of the way, right sign


def test_icp_train_entrypoint(tmp_path):
    """The full train() harness runs with icp_loss and checkpoints a model."""
    import os

    from depth_correction_tpu.train import train

    cfg = icp_cfg(tmp_path)
    cfg.n_opt_iters = 8
    best = train(cfg)
    assert best is not None
    assert os.path.exists(os.path.join(cfg.log_dir, "best.yaml"))


@pytest.mark.slow
def test_eval_loss_all_includes_icp(tmp_path):
    """eval_loss_all writes the ICP row like the consistency losses
    (reference: eval.py:194-211)."""
    import os

    from depth_correction_tpu.eval import eval_loss_all

    cfg = icp_cfg(tmp_path)
    cfg.loss = "min_eigval_loss"
    cfg.loss_kwargs = {"sqrt": False, "normalization": False}
    cfg.eval_losses = ["min_eigval_loss", "icp_loss"]
    cfg.test_names = list(cfg.train_names)
    results = eval_loss_all(cfg)
    assert ("train", "icp_loss") in results
    assert np.isfinite(results[("train", "icp_loss")])
    csvs = [f for f in os.listdir(cfg.log_dir) if f.startswith("loss_eval_icp")]
    assert csvs, os.listdir(cfg.log_dir)


def test_optimization_pair_of_scans_script(tmp_path):
    """Pair-of-scans ICP demo recovers the injected bias and saves the
    dashboard (reference scripts/optimization_pair_of_scans:60-176)."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "optimization_pair_of_scans.py")
    spec = importlib.util.spec_from_file_location("pair_icp", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = mod.main(["--iters", "30", "--val-pair", "2",
                    "--out", str(tmp_path)])
    assert out is not None
    model, hist = out
    assert hist[-1, 1] < hist[0, 1]  # train pair loss decreases
    assert hist[-1, 2] < hist[0, 2]  # held-out pair improves too
    w = float(np.asarray(model.w)[0])
    assert -0.0030 < w < -0.0010  # moves toward the injected -0.002
    assert (tmp_path / "pair_icp_history.csv").exists()
