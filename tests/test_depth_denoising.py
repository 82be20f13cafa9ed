"""depth_denoising: external-denoiser command contract (stub-driven)."""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import depth_denoising as dd  # noqa: E402


def test_external_denoiser_roundtrip(tmp_path):
    """The contract (range npz in, denoised npz out) round-trips through
    the stub denoiser, and the kernel only touches hit pixels."""
    img = jnp.asarray(
        np.where(np.eye(4, dtype=bool), 2.0, np.inf), jnp.float32
    )
    hit = jnp.asarray(np.eye(4, dtype=bool))
    cmd = "%s %s --input {input_npz} --output {output_npz} --scale 0.5" % (
        sys.executable,
        os.path.join(ROOT, "scripts", "stub_denoiser.py"),
    )
    out = dd.external_denoise_range_image(img, hit, cmd, str(tmp_path))
    out = np.asarray(out)
    assert np.allclose(out[np.eye(4, dtype=bool)], 1.0)
    assert np.isinf(out[~np.eye(4, dtype=bool)]).all()
    assert os.path.exists(tmp_path / "range_0000_in.npz")


def test_external_denoiser_missing_output(tmp_path):
    img = jnp.zeros((2, 2), jnp.float32)
    hit = jnp.ones((2, 2), bool)
    cmd = "%s -c pass" % sys.executable  # succeeds but writes nothing
    with pytest.raises(RuntimeError, match="no output"):
        dd.external_denoise_range_image(img, hit, cmd, str(tmp_path))


@pytest.mark.slow
def test_denoising_harness_end_to_end(tmp_path):
    """Full comparison run with the stub denoiser: corrected beats raw, and
    the external column lands in the CSV."""
    cmd = "%s %s --input {input_npz} --output {output_npz} --scale 1.0" % (
        sys.executable,
        os.path.join(ROOT, "scripts", "stub_denoiser.py"),
    )
    loss_raw, loss_den, loss_corr = dd.main(
        [
            "--dataset", "open_box/n_4_size_12_12_4_height_1_density_40",
            "--out", str(tmp_path),
            "--denoiser-command", cmd,
        ]
    )
    assert loss_corr < loss_raw  # the model removes the injected bias
    # scale 1.0 stub = identity denoiser: its cloud matches raw's loss class
    assert np.isfinite(loss_den)
    csv = (tmp_path / "depth_denoising.csv").read_text()
    assert "open_box" in csv and len(csv.split()) == 4
