"""Range-image projection roundtrip."""
import numpy as np
import jax.numpy as jnp

from depth_correction_tpu.ops.range_image import (
    project_range_image,
    unproject_range_image,
)


def test_project_unproject_roundtrip():
    rng = np.random.default_rng(0)
    n = 2000
    azim = rng.uniform(-np.pi, np.pi, n)
    elev = rng.uniform(-0.35, 0.35, n)
    depth = rng.uniform(2.0, 20.0, n)
    pts = np.stack(
        [
            depth * np.cos(elev) * np.cos(azim),
            depth * np.cos(elev) * np.sin(azim),
            depth * np.sin(elev),
        ],
        axis=1,
    )
    valid = np.ones(n, bool)
    img, hit = project_range_image(jnp.asarray(pts), jnp.asarray(valid),
                                   height=64, width=512)
    img, hit = np.asarray(img), np.asarray(hit)
    assert hit.sum() > 0.8 * n * 0.5  # most bins occupied at most once
    assert np.all(img[hit] >= 2.0 - 1e-6) and np.all(img[hit] <= 20.0 + 1e-6)
    assert np.all(img[~hit] == 0.0)

    back, back_valid = unproject_range_image(jnp.asarray(img), jnp.asarray(hit),
                                             height=64, width=512)
    back, back_valid = np.asarray(back), np.asarray(back_valid)
    # Unprojected ranges match the image exactly.
    d = np.linalg.norm(back[back_valid], axis=1)
    np.testing.assert_allclose(d, img[hit.astype(bool)].ravel(), rtol=1e-5)
    # Each unprojected point lies within one bin of an input point: nearest
    # input distance bounded by bin angular size * depth.
    from scipy.spatial import cKDTree

    dist, _ = cKDTree(pts).query(back[back_valid], k=1)
    max_bin = 20.0 * (2 * np.pi / 512 + 0.7854 / 64)
    assert np.quantile(dist, 0.95) < max_bin


def test_collisions_keep_closest():
    # Two points in the same bin: image keeps the nearer one.
    pts = np.array([[10.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    img, hit = project_range_image(jnp.asarray(pts), jnp.asarray([True, True]),
                                   height=8, width=16)
    img = np.asarray(img)
    assert np.isclose(img[np.asarray(hit)], 5.0).all()
