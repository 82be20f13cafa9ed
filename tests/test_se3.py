"""SE(3) ops vs scipy.spatial.transform oracles."""
import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from depth_correction_tpu.ops import se3


def random_aa(rng, n, scale=2.0):
    return scale * rng.standard_normal((n, 3))


def test_axis_angle_to_matrix_matches_scipy():
    rng = np.random.default_rng(0)
    aa = random_aa(rng, 64)
    R = np.asarray(se3.axis_angle_to_matrix(jnp.asarray(aa)))
    R_ref = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-12)


def test_axis_angle_small_angles_stable():
    aa = np.array([[0.0, 0.0, 0.0], [1e-9, -1e-9, 1e-10], [1e-5, 0.0, 0.0]])
    R = np.asarray(se3.axis_angle_to_matrix(jnp.asarray(aa)))
    R_ref = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-12)
    # Differentiable at zero: gradient of R[0,0] wrt aa is finite.
    import jax

    g = jax.jacobian(lambda a: se3.axis_angle_to_matrix(a))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_xyz_axis_angle_matrix_roundtrip():
    rng = np.random.default_rng(1)
    x = np.concatenate([rng.standard_normal((32, 3)), random_aa(rng, 32, 1.5)], axis=1)
    T = se3.xyz_axis_angle_to_matrix(jnp.asarray(x))
    x2 = se3.matrix_to_xyz_axis_angle(T)
    # Axis-angle is only unique modulo 2*pi wraps (the roundtrip returns the
    # canonical |angle| <= pi representative), so compare the transforms.
    T2 = np.asarray(se3.xyz_axis_angle_to_matrix(x2))
    np.testing.assert_allclose(T2, np.asarray(T), atol=1e-9)
    # Translations are unique and exact.
    np.testing.assert_allclose(np.asarray(x2)[:, :3], x[:, :3], atol=1e-12)
    # Canonical angles roundtrip exactly.
    small = np.linalg.norm(x[:, 3:], axis=1) < np.pi
    np.testing.assert_allclose(np.asarray(x2)[small], x[small], atol=1e-9)


def test_matrix_to_quaternion_all_quadrants():
    # Near-pi rotations around each axis stress every Shepperd branch.
    rng = np.random.default_rng(2)
    aa = np.concatenate(
        [
            3.1 * np.eye(3),
            -3.1 * np.eye(3),
            random_aa(rng, 16, 3.0),
        ]
    )
    R = Rotation.from_rotvec(aa).as_matrix()
    q = np.asarray(se3.matrix_to_quaternion(jnp.asarray(R)))
    q_ref = Rotation.from_matrix(R).as_quat()  # (x, y, z, w)
    q_ref = np.concatenate([q_ref[:, 3:], q_ref[:, :3]], axis=1)
    q_ref *= np.where(q_ref[:, :1] < 0, -1.0, 1.0)
    np.testing.assert_allclose(np.abs(np.sum(q * q_ref, axis=1)), 1.0, atol=1e-9)


def test_transform_inverse_and_delta():
    rng = np.random.default_rng(3)
    x = np.concatenate([rng.standard_normal((8, 3)), random_aa(rng, 8, 1.0)], axis=1)
    T = np.asarray(se3.xyz_axis_angle_to_matrix(jnp.asarray(x)))
    Ti = np.asarray(se3.transform_inv(jnp.asarray(T)))
    np.testing.assert_allclose(Ti @ T, np.broadcast_to(np.eye(4), T.shape), atol=1e-10)
    D = np.asarray(se3.delta_transform(jnp.asarray(T[0]), jnp.asarray(T[1])))
    np.testing.assert_allclose(T[0] @ D, T[1], atol=1e-10)


def test_rotation_angle_translation_norm():
    aa = np.array([[0.3, 0.0, 0.0]])
    x = np.concatenate([[[1.0, 2.0, 2.0]], aa], axis=1)
    T = se3.xyz_axis_angle_to_matrix(jnp.asarray(x))[0]
    assert abs(float(se3.rotation_angle(T)) - 0.3) < 1e-9
    assert abs(float(se3.translation_norm(T)) - 3.0) < 1e-9


def test_absolute_orientation_recovers_transform():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, 50))
    aa = np.array([0.2, -0.4, 0.1])
    R = Rotation.from_rotvec(aa).as_matrix()
    t = np.array([[1.0], [-2.0], [0.5]])
    y = R @ x + t
    T = np.asarray(se3.absolute_orientation(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-9)
    np.testing.assert_allclose(T[:3, 3:], t, atol=1e-9)


def test_transform_points():
    rng = np.random.default_rng(5)
    pts = rng.standard_normal((20, 3))
    x = np.concatenate([rng.standard_normal(3), np.array([0.1, 0.2, -0.3])])
    T = np.asarray(se3.xyz_axis_angle_to_matrix(jnp.asarray(x)))
    out = np.asarray(se3.transform_points(jnp.asarray(T), jnp.asarray(pts)))
    ref = pts @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(out, ref, atol=1e-12)
