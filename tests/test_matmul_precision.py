"""Position-critical contractions pin full-f32 matmul precision.

TPU matmuls default to bfloat16 passes; on the bench cloud that quantized
rotated positions by mean 9.6 mm / max 84 mm — swamping the mm-scale
depth biases the framework estimates and breaking parity with the f64
reference. CPU matmuls are f32-exact, so value tests cannot catch a
regression here; these tests assert the HIGHEST-precision attribute in
the traced jaxprs instead (platform-independent).
"""
import numpy as np
import jax
import jax.numpy as jnp


def _has_highest_dot(jaxpr_str: str) -> bool:
    return "Precision.HIGHEST" in jaxpr_str


def _no_default_dot(jaxpr_str: str) -> bool:
    """No dot_general left at DEFAULT precision (DEFAULT prints with NO
    precision attribute; pinned dots print ``precision=(Precision...``)."""
    for seg in jaxpr_str.split("dot_general[")[1:]:
        # The attribute block ends at the '] a b' operand line; precision,
        # when set, always appears inside it.
        attrs = seg.split("\n    ]")[0]
        if "Precision.HIGHEST" not in attrs:
            return False
    return True


def test_cloud_transform_precision():
    from depth_correction_tpu.cloud import Cloud

    c = Cloud(
        vps=jnp.zeros((2, 8, 3)),
        dirs=jnp.ones((2, 8, 3)),
        depth=jnp.ones((2, 8)),
        valid=jnp.ones((2, 8), bool),
    )
    T = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    s = str(jax.make_jaxpr(lambda t: c.transform(t).get_points())(T))
    assert _has_highest_dot(s) and _no_default_dot(s), s


def test_se3_transform_points_precision():
    from depth_correction_tpu.ops import se3

    T = jnp.eye(4)
    pts = jnp.zeros((16, 3))
    s = str(jax.make_jaxpr(se3.transform_points)(T, pts))
    assert _has_highest_dot(s) and _no_default_dot(s), s
    s = str(jax.make_jaxpr(se3.absolute_orientation)(pts.T, pts.T))
    assert _no_default_dot(s), s


def test_training_step_has_no_default_precision_dots():
    """The FULL jitted training loss (gather engine) must not contain any
    DEFAULT-precision contraction: on TPU those run bf16 and corrupt the
    positions feeding the moments."""
    import __graft_entry__ as ge

    fn, (params, data) = ge.entry()
    s = str(jax.make_jaxpr(lambda p: jax.value_and_grad(fn)(p, data))(params))
    assert _no_default_dot(s), "DEFAULT-precision dot_general in the step"


def test_pose_composition_precision():
    from depth_correction_tpu.preproc import corrected_poses

    poses = jnp.broadcast_to(jnp.eye(4), (3, 4, 4))
    deltas = jnp.zeros((3, 6))
    s = str(jax.make_jaxpr(corrected_poses)(poses, deltas))
    assert _no_default_dot(s), s
