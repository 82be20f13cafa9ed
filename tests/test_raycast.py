"""Ray casting and the rendered-mesh lidar simulator."""
import pytest
import numpy as np
import jax.numpy as jnp

from depth_correction_tpu.ops.raycast import raycast_mesh


def room_mesh(half=5.0, height=4.0):
    """An inward-facing box room centered at origin (floor z=0)."""
    v = []
    f = []

    def quad(a, b, c, d):
        base = len(v)
        v.extend([a, b, c, d])
        f.append([base, base + 1, base + 2])
        f.append([base, base + 2, base + 3])

    h = half
    quad([-h, -h, 0], [h, -h, 0], [h, h, 0], [-h, h, 0])  # floor
    quad([-h, -h, height], [h, -h, height], [h, h, height], [-h, h, height])
    quad([-h, -h, 0], [-h, h, 0], [-h, h, height], [-h, -h, height])  # -x wall
    quad([h, -h, 0], [h, h, 0], [h, h, height], [h, -h, height])  # +x wall
    quad([-h, -h, 0], [h, -h, 0], [h, -h, height], [-h, -h, height])  # -y
    quad([-h, h, 0], [h, h, 0], [h, h, height], [-h, h, height])  # +y
    return np.asarray(v, np.float32), np.asarray(f, np.int64)


def test_raycast_known_distances():
    verts, faces = room_mesh()
    origins = np.tile([[0.0, 0.0, 2.0]], (4, 1)).astype(np.float32)
    dirs = np.asarray(
        [[1, 0, 0], [0, 1, 0], [0, 0, -1], [0, 0, 1]], np.float32
    )
    t, tri = raycast_mesh(jnp.asarray(origins), jnp.asarray(dirs),
                          jnp.asarray(verts), jnp.asarray(faces))
    np.testing.assert_allclose(np.asarray(t), [5.0, 5.0, 2.0, 2.0], rtol=1e-5)
    assert np.all(np.asarray(tri) >= 0)


def test_raycast_miss_returns_inf(tmp_path):
    verts, faces = room_mesh()
    # Ray starting outside the room pointing away.
    t, tri = raycast_mesh(
        jnp.asarray([[20.0, 0.0, 2.0]], jnp.float32),
        jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32),
        jnp.asarray(verts), jnp.asarray(faces),
    )
    assert np.isinf(float(t[0])) and int(tri[0]) == -1


def test_rendered_mesh_dataset(tmp_path):
    verts, faces = room_mesh()
    path = str(tmp_path / "room.obj")
    with open(path, "w") as f:
        for v in verts:
            f.write("v %f %f %f\n" % tuple(v))
        for face in faces:
            f.write("f %d %d %d\n" % tuple(face + 1))

    from depth_correction_tpu.datasets import dataset_by_name
    from depth_correction_tpu.datasets.rendered_mesh import RenderedMeshDataset

    assert dataset_by_name("rendered_mesh/foo.obj") is RenderedMeshDataset
    ds = RenderedMeshDataset(path, n_poses=4, radius=2.0, height=1.5,
                             h_beams=48, v_beams=16)
    assert len(ds) == 4
    cloud, pose = ds[0]
    assert len(cloud) > 300  # most beams hit the room
    assert "normal_x" in cloud.dtype.names
    # All ranges bounded by room size; all points inside the room (world).
    from numpy.lib.recfunctions import structured_to_unstructured as s2u

    pts = s2u(cloud[["x", "y", "z"]])
    world = pts @ pose[:3, :3].T + pose[:3, 3]
    assert np.all(np.abs(world[:, :2]) <= 5.0 + 1e-3)
    assert np.all((world[:, 2] >= -1e-3) & (world[:, 2] <= 4.0 + 1e-3))
    # Normals are unit and axis-aligned for a box room.
    n = s2u(cloud[["normal_x", "normal_y", "normal_z"]])
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)
    # Scan caching: second access is the same object.
    assert ds.local_cloud(0) is ds.local_cloud(0)


def test_rendered_mesh_disk_cache(tmp_path):
    """render_all populates the disk cache (reference: dataset.py:669-683);
    a fresh dataset instance reloads scans from it bit-exactly."""
    import os

    verts, faces = room_mesh()
    path = str(tmp_path / "room.obj")
    with open(path, "w") as f:
        for v in verts:
            f.write("v %f %f %f\n" % tuple(v))
        for face in faces:
            f.write("f %d %d %d\n" % tuple(face + 1))

    from depth_correction_tpu.datasets.rendered_mesh import RenderedMeshDataset

    cache = str(tmp_path / "cache")
    kw = dict(n_poses=3, radius=2.0, height=1.5, h_beams=32, v_beams=12,
              cache_dir=cache)
    ds = RenderedMeshDataset(path, **kw)
    assert ds.render_all() == 3
    files = []
    for root, _, names in os.walk(cache):
        files += [n for n in names if n.endswith(".npz")]
    assert len(files) == 3

    ds2 = RenderedMeshDataset(path, **kw)
    c1, c2 = ds.local_cloud(1), ds2.local_cloud(1)
    assert len(c1) == len(c2)
    for name in c1.dtype.names:
        np.testing.assert_array_equal(c1[name], c2[name])


@pytest.mark.slow
def test_rendered_mesh_training_recovers_bias(tmp_path):
    """Full simulated-lidar loop: render scans from a mesh, inject a known
    bias, train, recover the weight (the reference's tier-3/4 strategy:
    RenderedMeshDataset + DepthBiasDataset + train_demo)."""
    import jax
    import jax.numpy as jnp
    import optax

    from depth_correction_tpu.config import Config
    from depth_correction_tpu.datasets import create_dataset
    from depth_correction_tpu.models import ScaledPolynomial
    from depth_correction_tpu.train import make_loss_fn, prepare_sequences

    verts, faces = room_mesh()
    path = str(tmp_path / "room.obj")
    with open(path, "w") as f:
        for v in verts:
            f.write("v %f %f %f\n" % tuple(v))
        for face in faces:
            f.write("f %d %d %d\n" % tuple(face + 1))

    gt_w = -0.01
    cfg = Config()
    cfg.float_type = "float64"
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.3, 30.0, 0.15
    cfg.nn_r, cfg.nn_k = 0.5, 0
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = []
    cfg.min_valid_neighbors = 3
    cfg.dataset_kwargs = {"n_poses": 4, "radius": 2.0, "height": 1.5,
                          "h_beams": 96, "v_beams": 24}
    cfg.depth_bias_model_kwargs = {"w": [gt_w], "exponent": [4.0]}
    cfg.loss_kwargs = {"sqrt": False, "normalization": False}

    ds = create_dataset("rendered_mesh/%s" % path, cfg)
    data = prepare_sequences([ds], cfg)
    loss_fn = make_loss_fn(cfg)
    params = {"model": ScaledPolynomial(w=jnp.zeros(1), exponent=jnp.asarray([4.0]))}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, data):
        loss, grads = jax.value_and_grad(loss_fn)(params, data)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    l0 = None
    for i in range(60):
        loss, params, opt_state = step(params, opt_state, data)
        if l0 is None:
            l0 = float(loss)
    w = float(jnp.ravel(params["model"].w)[0])
    # Beam sampling sets a high loss floor at this coarse test resolution,
    # so assert the self-supervision signal exists and points the right way
    # (full weight recovery is covered by the ground_plane e2e tests).
    assert float(loss) < l0
    assert w < -2e-4, w
