"""Golden parity against the ACTUAL reference implementation.

Imports ``/root/reference/src/depth_correction/{loss,utils,depth_cloud,
nearest_neighbors}`` (torch, float64 — the reference's native regime,
reference config.py:179-180) with ``sys.modules`` stubs for its heavy
runtime deps (ros_numpy / sensor_msgs / open3d / pytorch3d), and asserts
<=1e-5 agreement of the JAX pipeline on fixed fixtures with IDENTICAL
neighborhoods. This is the BASELINE.md north-star parity check
("map-consistency loss parity to 1e-5") run against the reference's own
code, not a re-derived oracle.
"""
import os
import sys
import types

import numpy as np
import pytest

REF_SRC = "/root/reference/src"

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")


def _stub(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


@pytest.fixture(scope="module")
def ref(request):
    """The reference package with its ROS/pytorch3d/open3d imports stubbed."""
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference not mounted")

    # The reference targets numpy<1.24 (`np.object`, nearest_neighbors.py:69);
    # restore the alias for the duration of this module.
    if not hasattr(np, "object"):
        np.object = object
        request.addfinalizer(lambda: delattr(np, "object"))

    def _unavailable(*a, **k):  # pragma: no cover - must never be hit
        raise RuntimeError("stubbed dependency called during parity test")

    _stub("ros_numpy", msgify=_unavailable, numpify=_unavailable)
    sensor_msgs = _stub("sensor_msgs")
    sensor_msgs.msg = _stub("sensor_msgs.msg", PointCloud2=object)
    _stub("open3d", geometry=types.SimpleNamespace(), utility=types.SimpleNamespace())
    p3d = _stub("pytorch3d")
    p3d.ops = _stub("pytorch3d.ops")
    p3d.ops.knn = _stub("pytorch3d.ops.knn", knn_points=_unavailable)
    p3d.io = _stub("pytorch3d.io", load_ply=_unavailable, load_obj=_unavailable)
    p3d.structures = _stub("pytorch3d.structures", Meshes=object)
    p3d.transforms = _stub(
        "pytorch3d.transforms",
        axis_angle_to_matrix=_unavailable,
        matrix_to_axis_angle=_unavailable,
    )

    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    import depth_correction.loss as ref_loss
    import depth_correction.nearest_neighbors as ref_nn
    import depth_correction.utils as ref_utils
    from depth_correction.depth_cloud import DepthCloud

    return types.SimpleNamespace(
        loss=ref_loss, utils=ref_utils, nn=ref_nn, DepthCloud=DepthCloud
    )


def _fixture_points(n=400, seed=0):
    """Noisy two-plane scene with a few viewpoints (float64)."""
    rng = np.random.default_rng(seed)
    n1 = n // 2
    p1 = np.stack(
        [
            rng.uniform(-2, 2, n1),
            rng.uniform(-2, 2, n1),
            rng.normal(0.0, 0.01, n1),
        ],
        axis=-1,
    )
    n2 = n - n1
    p2 = np.stack(
        [
            rng.normal(2.0, 0.01, n2),
            rng.uniform(-2, 2, n2),
            rng.uniform(0, 2, n2),
        ],
        axis=-1,
    )
    pts = np.concatenate([p1, p2], axis=0)
    vp_bank = np.array([[0.0, 0.0, 1.5], [0.5, -1.0, 1.0], [-1.0, 1.0, 2.0]])
    vps = vp_bank[rng.integers(0, len(vp_bank), n)]
    rays = pts - vps
    depth = np.linalg.norm(rays, axis=-1)
    dirs = rays / depth[:, None]
    return pts, vps, dirs, depth


def _ref_cloud_with_features(ref, pts, vps, dirs, depth, r):
    dc = ref.DepthCloud(
        vps=torch.as_tensor(vps, dtype=torch.float64),
        dirs=torch.as_tensor(dirs, dtype=torch.float64),
        depth=torch.as_tensor(depth[:, None], dtype=torch.float64),
    )
    dc.update_all(r=r)
    return dc


def _our_cloud_with_features(pts, vps, neighbors):
    from depth_correction_tpu.cloud import Cloud
    from depth_correction_tpu.ops.features import compute_features

    cloud = Cloud.from_points(
        jnp.asarray(pts, jnp.float64), vps=jnp.asarray(vps, jnp.float64)
    )
    nb = jnp.asarray(np.asarray(neighbors), jnp.int32)
    weights = (nb >= 0).astype(jnp.float64)
    return compute_features(cloud, nb, weights)


def test_covs_parity(ref):
    """Our weighted_cov vs reference utils.covs (utils.py:109-149)."""
    from depth_correction_tpu.ops.covs import weighted_cov

    rng = np.random.default_rng(1)
    x = rng.normal(size=(64, 9, 3))
    w = (rng.uniform(size=(64, 9, 1)) > 0.3).astype(np.float64)
    w[:, 0, 0] = 1.0  # at least one valid neighbor per row

    ref_cov = ref.utils.covs(torch.as_tensor(x), weights=torch.as_tensor(w)).numpy()
    ours = np.asarray(weighted_cov(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(ours, ref_cov, atol=1e-12)


def test_eigh3_parity(ref):
    """Our closed-form eigh3 vs reference eigh3_deledalle (loss.py:39-103)."""
    from depth_correction_tpu.ops.eigh3 import eigh3

    rng = np.random.default_rng(2)
    a = rng.normal(size=(128, 3, 3))
    spd = a @ np.swapaxes(a, -1, -2) + 1e-3 * np.eye(3)

    ref_vals, ref_vecs = ref.loss.eigh3(torch.as_tensor(spd))
    vals, vecs = eigh3(jnp.asarray(spd))
    np.testing.assert_allclose(np.asarray(vals), ref_vals.numpy(), atol=1e-8)
    # Eigenvectors compare sign-agnostically (reference test_eigh3 does the
    # same, loss.py:714-735).
    dots = np.abs(np.einsum("nij,nij->nj", np.asarray(vecs), ref_vecs.numpy()))
    np.testing.assert_allclose(dots, 1.0, atol=1e-6)


@pytest.fixture(scope="module")
def pipeline(ref):
    """Both pipelines on the same fixture with IDENTICAL neighborhoods."""
    pts, vps, dirs, depth = _fixture_points()
    r = 0.35
    dc = _ref_cloud_with_features(ref, pts, vps, dirs, depth, r)
    ours = _our_cloud_with_features(pts, vps, dc.neighbors.numpy())
    return types.SimpleNamespace(ref_cloud=dc, our_cloud=ours)


def test_feature_parity(ref, pipeline):
    """mean / cov / eigvals / incidence angles match the reference's
    update_all chain (depth_cloud.py:426-441) to float64 precision."""
    dc, ours = pipeline.ref_cloud, pipeline.our_cloud
    np.testing.assert_allclose(np.asarray(ours.mean), dc.mean.numpy(), atol=1e-10)
    np.testing.assert_allclose(np.asarray(ours.cov), dc.cov.numpy(), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(ours.eigvals), dc.eigvals.numpy(), atol=1e-7
    )
    # The smallest eigenvector (=> normal => incidence angle) is only
    # well-defined where the two smallest eigenvalues are separated; tiny
    # neighborhoods give lambda1 ~= lambda2 and LAPACK vs the closed form
    # legitimately pick different basis vectors there.
    ev = dc.eigvals.numpy()
    well_defined = (ev[:, 1] - ev[:, 0]) > 1e-8
    assert well_defined.sum() > 350
    np.testing.assert_allclose(
        np.asarray(ours.inc_angles)[well_defined],
        dc.inc_angles.numpy()[well_defined, 0],
        atol=1e-4,  # eigvec of a near-degenerate pair is the loosest quantity
    )


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(sqrt=False, normalization=False),
        dict(sqrt=False, normalization=True),
        dict(sqrt=True, normalization=True),
        dict(sqrt=False, normalization=True, inlier_ratio=0.8),
    ],
)
def test_min_eigval_loss_parity(ref, pipeline, kwargs):
    """End-to-end min_eigval_loss parity <=1e-5 (reference loss.py:216-294)."""
    from depth_correction_tpu.loss import min_eigval_loss

    ref_val, _ = ref.loss.min_eigval_loss(pipeline.ref_cloud, **kwargs)
    ours_val, _ = min_eigval_loss(pipeline.our_cloud, **kwargs)
    assert abs(float(ours_val) - float(ref_val)) <= 1e-5 * max(
        1.0, abs(float(ref_val))
    ), (float(ours_val), float(ref_val))
    # Tighter than the north star in practice: float64 end to end.
    np.testing.assert_allclose(float(ours_val), float(ref_val), rtol=1e-6)


@pytest.mark.parametrize("sqrt", [False, True])
def test_trace_loss_parity(ref, pipeline, sqrt):
    """End-to-end trace_loss parity <=1e-5 (reference loss.py:297-370)."""
    from depth_correction_tpu.loss import trace_loss

    ref_val, _ = ref.loss.trace_loss(pipeline.ref_cloud, sqrt=sqrt)
    ours_val, _ = trace_loss(pipeline.our_cloud, sqrt=sqrt)
    np.testing.assert_allclose(float(ours_val), float(ref_val), rtol=1e-6)


def test_nearest_neighbors_parity(ref):
    """Our on-device radius search returns the reference's neighbor SETS
    (reference nearest_neighbors.py:22-80: cKDTree query_ball_point with -1
    rectangular padding)."""
    from depth_correction_tpu.ops.knn import radius_neighbors

    pts, _, _, _ = _fixture_points(n=300, seed=3)
    r = 0.4
    _, ref_ind = ref.nn.nearest_neighbors(
        torch.as_tensor(pts), torch.as_tensor(pts), r=r
    )
    ref_ind = ref_ind.numpy()
    k = ref_ind.shape[1] + 4
    _, ours_ind = radius_neighbors(jnp.asarray(pts), r=r, k=k)
    ours_ind = np.asarray(ours_ind)
    for i in range(len(pts)):
        a = set(ref_ind[i][ref_ind[i] >= 0].tolist())
        b = set(ours_ind[i][ours_ind[i] >= 0].tolist())
        assert a == b, f"row {i}: {sorted(a ^ b)}"


def _two_scan_fixture(seed=5, n=500):
    """Two overlapping noisy-plane scans with analytic unit normals."""
    rng = np.random.default_rng(seed)
    def scan(shift):
        pts = np.stack(
            [
                rng.uniform(-2, 2, n) + shift,
                rng.uniform(-2, 2, n),
                rng.normal(0.0, 0.02, n),
            ],
            axis=-1,
        )
        normals = np.tile([0.0, 0.0, 1.0], (n, 1))
        # Tilt a fraction of the normals so both directions matter.
        normals[: n // 3] = [0.0, np.sin(0.2), np.cos(0.2)]
        return pts, normals

    return scan(0.0), scan(0.15)


@pytest.mark.parametrize("ratio", [1.0, 0.5])
def test_point_to_plane_parity(ref, ratio):
    """Symmetric point-to-plane ICP distance vs reference loss.py:406-488
    (cKDTree correspondences, inlier quantile, symmetric plane distance)."""
    from depth_correction_tpu.cloud import Cloud
    from depth_correction_tpu.loss import point_to_plane_dist

    (p1, n1), (p2, n2) = _two_scan_fixture()

    def ref_cloud(p, nrm):
        dc = ref.DepthCloud.from_points(torch.as_tensor(p, dtype=torch.float64))
        dc.update_points()
        dc.normals = torch.as_tensor(nrm, dtype=torch.float64)
        return dc

    ref_val = ref.loss.point_to_plane_dist(
        [ref_cloud(p1, n1), ref_cloud(p2, n2)],
        icp_inlier_ratio=ratio,
        differentiable=False,
    )

    def our_cloud(p, nrm):
        return Cloud.from_points(
            jnp.asarray(p, jnp.float64)
        ).replace(normals=jnp.asarray(nrm, jnp.float64)).with_points()

    ours_val = point_to_plane_dist(
        [our_cloud(p1, n1), our_cloud(p2, n2)], icp_inlier_ratio=ratio
    )
    # The reference computes correspondences/distances in float32
    # (loss.py:436-437 casts to torch.float); boundary points at the
    # quantile threshold can flip, so parity is to the north-star 1e-5 on
    # the full-inlier case and slightly looser with trimming.
    tol = 1e-5 if ratio == 1.0 else 5e-4
    np.testing.assert_allclose(float(ours_val), float(ref_val), rtol=tol)


@pytest.mark.parametrize("ratio", [1.0, 0.5])
def test_point_to_point_parity(ref, ratio):
    """Point-to-point ICP distance vs reference loss.py:491-565."""
    from depth_correction_tpu.cloud import Cloud
    from depth_correction_tpu.loss import point_to_point_dist

    (p1, n1), (p2, n2) = _two_scan_fixture(seed=7)

    def ref_cloud(p):
        dc = ref.DepthCloud.from_points(torch.as_tensor(p, dtype=torch.float64))
        dc.update_points()
        return dc

    ref_val = ref.loss.point_to_point_dist(
        [ref_cloud(p1), ref_cloud(p2)],
        icp_inlier_ratio=ratio,
        differentiable=False,
    )

    def our_cloud(p):
        return Cloud.from_points(jnp.asarray(p, jnp.float64)).with_points()

    ours_val = point_to_point_dist(
        [our_cloud(p1), our_cloud(p2)], icp_inlier_ratio=ratio
    )
    tol = 1e-5 if ratio == 1.0 else 5e-4
    np.testing.assert_allclose(float(ours_val), float(ref_val), rtol=tol)


@pytest.mark.parametrize(
    "cls,kwargs",
    [
        ("Polynomial", dict(w=[-0.01, 0.002], exponent=[2.0, 4.0])),
        ("ScaledPolynomial", dict(w=[-0.01], exponent=[4.0])),
        ("InvCos", dict(p0=0.02)),
        ("ScaledInvCos", dict(p0=0.002)),
        ("Linear", dict(w0=1.01, w1=-0.02, b=0.005)),
    ],
)
def test_model_parity(ref, cls, kwargs):
    """Model algebra vs the reference model classes (model.py:113-349):
    corrected depth agrees on a (depth, angle) grid; inverse() inverts."""
    import importlib

    import depth_correction.model as ref_model

    import depth_correction_tpu.models as our_models

    depth = np.linspace(1.0, 20.0, 40)
    angles = np.linspace(0.0, 1.4, 40)

    # Scalar params as float64 tensors: torch.as_tensor(1.01) would make
    # float32 parameters and shift results ~1e-8.
    rm = getattr(ref_model, cls)(
        **{
            k: list(v)
            if isinstance(v, list)
            else torch.as_tensor(v, dtype=torch.float64)
            for k, v in kwargs.items()
        }
    )
    dc = ref.DepthCloud(
        vps=torch.zeros(40, 3, dtype=torch.float64),
        dirs=torch.ones(40, 3, dtype=torch.float64)
        / torch.sqrt(torch.tensor(3.0, dtype=torch.float64)),
        depth=torch.as_tensor(depth[:, None], dtype=torch.float64),
    )
    dc.inc_angles = torch.as_tensor(angles[:, None], dtype=torch.float64)
    ref_out = rm(dc).depth.detach().numpy().ravel()

    om = getattr(our_models, cls)(
        **{
            k: jnp.asarray(v, jnp.float64)
            if isinstance(v, list)
            else jnp.asarray(v, jnp.float64)
            for k, v in kwargs.items()
        }
    )
    our_out = np.asarray(
        om.correct_depth(jnp.asarray(depth, jnp.float64),
                         jnp.asarray(angles, jnp.float64))
    )
    # transcendentals (cos) differ in final ULPs across libraries
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-9)

    # Inverse round-trip (reference model.py:263-274 uses inverse to
    # synthesize bias; correct(inverse(d)) == d).
    inv = np.asarray(
        om.inverse_depth(jnp.asarray(depth, jnp.float64),
                         jnp.asarray(angles, jnp.float64))
    ) if hasattr(om, "inverse_depth") else None
    if inv is not None:
        back = np.asarray(
            om.correct_depth(jnp.asarray(inv), jnp.asarray(angles, jnp.float64))
        )
        np.testing.assert_allclose(back, depth, rtol=1e-9)


def test_filter_depth_parity(ref):
    """Depth-bounds filter vs reference filters.py:116-141."""
    import depth_correction.filters as ref_filters

    from depth_correction_tpu.ops.filters import filter_depth_mask

    pts, vps, dirs, depth = _fixture_points(n=300, seed=11)
    dc = ref.DepthCloud(
        vps=torch.as_tensor(vps, dtype=torch.float64),
        dirs=torch.as_tensor(dirs, dtype=torch.float64),
        depth=torch.as_tensor(depth[:, None], dtype=torch.float64),
    )
    from depth_correction_tpu.cloud import Cloud

    lo, hi = 1.0, 3.0
    ref_kept = ref_filters.filter_depth(dc, min=lo, max=hi, log=False)
    our_cloud = Cloud.from_points(
        jnp.asarray(pts, jnp.float64), vps=jnp.asarray(vps, jnp.float64)
    )
    ours = np.asarray(filter_depth_mask(our_cloud, lo, hi))
    assert int(ours.sum()) == len(ref_kept)
    # Same surviving depth multiset.
    np.testing.assert_allclose(
        np.sort(depth[ours]), np.sort(ref_kept.depth.numpy().ravel())
    )


@pytest.mark.parametrize("keep", ["first", "last"])
def test_filter_grid_parity(ref, keep):
    """Voxel-grid subsample vs reference filters.py:24-82: identical KEPT
    POINT SETS for the deterministic first/last-in-cell policies."""
    import depth_correction.filters as ref_filters

    from depth_correction_tpu.ops.filters import filter_grid_indices

    pts, _, _, _ = _fixture_points(n=400, seed=12)
    res = 0.3
    ref_idx = ref_filters.filter_grid(
        torch.as_tensor(pts, dtype=torch.float64), res, only_mask=True,
        keep=keep,
    )
    ref_set = {tuple(np.round(pts[i], 9)) for i in np.asarray(ref_idx)}
    our_idx = np.asarray(filter_grid_indices(pts, res, keep=keep))
    our_set = {tuple(np.round(pts[i], 9)) for i in our_idx}
    assert our_set == ref_set


def test_shadow_filter_parity(ref):
    """filter_shadow_points vs ours on IDENTICAL direction-space
    neighborhoods (reference: filters.py:257-309): same kept point set."""
    import depth_correction.filters as ref_filters

    from depth_correction_tpu.cloud import Cloud
    from depth_correction_tpu.ops.filters import (
        ball_angle_to_distance,
        filter_shadow_mask,
    )
    from depth_correction_tpu.ops.knn import radius_neighbors

    pts, vps, dirs, depth = _fixture_points(300, seed=3)
    r_dir = float(ball_angle_to_distance(0.25))
    _, nb = radius_neighbors(
        jnp.asarray(dirs, jnp.float64), jnp.asarray(dirs, jnp.float64),
        r=r_dir, k=24,
    )
    nb_np = np.asarray(nb)

    dc = ref.DepthCloud(
        vps=torch.as_tensor(vps, dtype=torch.float64),
        dirs=torch.as_tensor(dirs, dtype=torch.float64),
        depth=torch.as_tensor(depth[:, None], dtype=torch.float64),
    )
    dc.dir_neighbors = torch.as_tensor(nb_np, dtype=torch.long)
    dc.dir_neighbor_weights = (dc.dir_neighbors >= 0).double()
    bounds = [0.2, 2.9]
    kept_ref = ref_filters.filter_shadow_points(dc, list(bounds))
    ref_pts = kept_ref.get_points().numpy()

    cloud = Cloud.from_points(
        jnp.asarray(pts, jnp.float64), vps=jnp.asarray(vps, jnp.float64)
    )
    w = (nb >= 0).astype(jnp.float64)
    mask = np.asarray(filter_shadow_mask(cloud, nb, w, bounds))
    assert 0 < mask.sum() < len(pts)  # the fixture actually exercises both sides
    np.testing.assert_allclose(pts[mask], ref_pts, atol=1e-12)


def test_absolute_orientation_parity(ref):
    """Kabsch/Umeyama absolute orientation vs reference utils.py:253-304."""
    from depth_correction_tpu.ops.se3 import absolute_orientation

    rng = np.random.default_rng(11)
    x = rng.uniform(-3, 3, (40, 3))
    # A known rigid transform plus noise.
    angle = 0.7
    R = np.array(
        [
            [np.cos(angle), -np.sin(angle), 0.0],
            [np.sin(angle), np.cos(angle), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    t = np.array([0.3, -1.2, 0.8])
    y = x @ R.T + t + rng.normal(0, 0.01, x.shape)

    T_ref = np.asarray(
        ref.utils.absolute_orientation(
            torch.as_tensor(x.T, dtype=torch.float64),
            torch.as_tensor(y.T, dtype=torch.float64),
        )
    )
    T_ours = np.asarray(
        absolute_orientation(
            jnp.asarray(x.T, jnp.float64), jnp.asarray(y.T, jnp.float64)
        )
    )
    np.testing.assert_allclose(T_ours, T_ref, atol=1e-9)
