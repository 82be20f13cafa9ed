"""paths_alignment and bias_estimation utilities
(reference: scripts/paths_alignment:166-233, scripts/bias_estimation:28-60)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_align_paths_paired():
    from paths_alignment import align_paths

    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * np.pi, 100)
    target = np.stack([np.cos(t), np.sin(t), 0.1 * t], axis=1)
    ang = 0.5
    R = np.asarray(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    )
    source = (target - [0.3, -0.7, 0.2]) @ R
    T, before, after = align_paths(source, target)
    assert after < 1e-9 < before
    aligned = source @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(aligned, target, atol=1e-9)


def test_align_paths_unpaired_icp():
    from paths_alignment import align_paths

    t = np.linspace(0, 2 * np.pi, 300)
    target = np.stack([np.cos(t) * 2, np.sin(t) * 2, 0.05 * t], axis=1)
    # Subsampled, slightly misaligned source with different row count.
    src = target[::3] + [0.05, -0.03, 0.02]
    T, before, after = align_paths(src, target, paired=False)
    assert after < 0.5 * before


def test_bias_estimation_recovers_and_flattens():
    import jax.numpy as jnp

    from bias_estimation import estimate_bias, synthetic_board_scans
    from depth_correction_tpu.models import ScaledPolynomial

    scans = synthetic_board_scans(w_bias=-0.003)
    inc, nd, fits = estimate_bias(scans)
    # Raw scans show an angle-dependent trend.
    assert abs(fits[1][1]) > 1e-5
    model = ScaledPolynomial(w=jnp.asarray([-0.003]), exponent=jnp.asarray([4.0]))
    _, _, fits_c = estimate_bias(scans, model=model)
    # The matching correction flattens it by orders of magnitude.
    assert abs(fits_c[1][1]) < 1e-2 * abs(fits[1][1])
