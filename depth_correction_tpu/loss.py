"""Map-consistency losses.

TPU-native re-design of the reference losses
(reference: src/depth_correction/loss.py:216-403): the pointwise loss of a
(feature-annotated) global cloud is computed with static shapes; everything
the reference does by boolean indexing — mask selection, inlier-quantile
trimming, finite filtering — is expressed as mask composition so a whole
train/eval step stays one jitted XLA graph.

Losses return ``(scalar, cloud_with_pointwise_loss)`` like the reference;
the effective mask used for reduction is threaded back on the cloud.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .cloud import Cloud
from .ops.reduce import masked_mean, masked_quantile, masked_sum, reduce_loss

__all__ = [
    "batch_loss",
    "create_loss",
    "loss_by_name",
    "min_eigval_loss",
    "trace_loss",
    "point_to_plane_dist",
    "point_to_point_dist",
    "icp_loss",
    "icp_pair_correspondences",
    "icp_pair_loss_batched",
]


def _base_mask(cloud: Cloud, mask: Optional[jax.Array]) -> Optional[jax.Array]:
    """Combine padding validity with the caller's mask."""
    if mask is None:
        return cloud.valid
    return mask & cloud.valid


def _inlier_trim(
    loss: jax.Array,
    mask: Optional[jax.Array],
    inlier_max_loss,
    inlier_ratio: float,
    inlier_loss_mult: float,
):
    """Quantile-based inlier masking (reference: loss.py:256-273)."""
    if inlier_ratio < 1.0:
        thr = masked_quantile(loss, mask, inlier_ratio)
        if inlier_loss_mult != 1.0:
            thr = inlier_loss_mult * thr
        if inlier_max_loss is None:
            inlier_max_loss = thr
        else:
            inlier_max_loss = jnp.minimum(jnp.asarray(inlier_max_loss, loss.dtype), thr)
    if inlier_max_loss is not None:
        keep = loss <= inlier_max_loss
        mask = keep if mask is None else (mask & keep)
    return mask


def _consistency_loss(
    pointwise: jax.Array,
    cloud: Cloud,
    mask: Optional[jax.Array],
    offset,
    sqrt: bool,
    reduction: str,
    inlier_max_loss,
    inlier_ratio: float,
    inlier_loss_mult: float,
    only_finite: bool,
    skip_nans: bool,
) -> Tuple[jax.Array, Cloud]:
    mask = _base_mask(cloud, mask)
    mask = _inlier_trim(pointwise, mask, inlier_max_loss, inlier_ratio, inlier_loss_mult)

    # Offset by a per-point baseline loss (local-cloud loss), then clamp to
    # positive (reference: loss.py:279-284).
    if offset is not None:
        if isinstance(offset, Cloud):
            offset = offset.loss
        pointwise = pointwise - offset
    pointwise = jax.nn.relu(pointwise)
    if sqrt:
        pointwise = jnp.sqrt(pointwise)

    value, eff = reduce_loss(
        pointwise, mask, reduction=reduction, only_finite=only_finite, skip_nans=skip_nans
    )
    out_cloud = cloud.replace(loss=pointwise, mask=eff if eff is not None else cloud.mask)
    return value, out_cloud


def min_eigval_loss(
    cloud,
    mask=None,
    offset=None,
    sqrt: bool = False,
    normalization: bool = False,
    reduction: str = "mean",
    inlier_max_loss=None,
    inlier_ratio: float = 1.0,
    inlier_loss_mult: float = 1.0,
    only_finite: bool = False,
    skip_nans: bool = False,
    **_unused,
):
    """Smallest-eigenvalue map-consistency loss (reference: loss.py:216-294).

    pointwise = lam_1(cov), optionally normalized by the total variance
    lam_1 / clamp(sum lam, 1e-6), inlier-trimmed, offset, relu'd, sqrt'd,
    then mask-mean reduced.
    """
    if isinstance(cloud, (list, tuple)):
        return batch_loss(
            min_eigval_loss,
            cloud,
            masks=mask,
            offsets=offset,
            reduction=reduction,
            only_finite=only_finite,
            skip_nans=skip_nans,
            sqrt=sqrt,
            normalization=normalization,
            inlier_max_loss=inlier_max_loss,
            inlier_ratio=inlier_ratio,
            inlier_loss_mult=inlier_loss_mult,
        )
    assert cloud.eigvals is not None
    pointwise = cloud.eigvals[..., 0]
    if normalization:
        total = jnp.maximum(jnp.sum(cloud.eigvals, axis=-1), 1e-6)
        pointwise = pointwise / total
    return _consistency_loss(
        pointwise,
        cloud,
        mask,
        offset,
        sqrt,
        reduction,
        inlier_max_loss,
        inlier_ratio,
        inlier_loss_mult,
        only_finite,
        skip_nans,
    )


def trace_loss(
    cloud,
    mask=None,
    offset=None,
    sqrt: bool = False,
    reduction: str = "mean",
    inlier_max_loss=None,
    inlier_ratio: float = 1.0,
    inlier_loss_mult: float = 1.0,
    only_finite: bool = False,
    skip_nans: bool = False,
    **_unused,
):
    """Covariance-trace map-consistency loss (reference: loss.py:297-370)."""
    if isinstance(cloud, (list, tuple)):
        return batch_loss(
            trace_loss,
            cloud,
            masks=mask,
            offsets=offset,
            reduction=reduction,
            only_finite=only_finite,
            skip_nans=skip_nans,
            sqrt=sqrt,
            inlier_max_loss=inlier_max_loss,
            inlier_ratio=inlier_ratio,
            inlier_loss_mult=inlier_loss_mult,
        )
    # Duck-typed inputs (Cloud / FeatureRows / Planes): Planes carries cov
    # but no precomputed trace field.
    trace = getattr(cloud, "trace", None)
    assert cloud.cov is not None or trace is not None
    if trace is not None:
        pointwise = trace
    else:
        pointwise = cloud.cov[..., 0, 0] + cloud.cov[..., 1, 1] + cloud.cov[..., 2, 2]
    return _consistency_loss(
        pointwise,
        cloud,
        mask,
        offset,
        sqrt,
        reduction,
        inlier_max_loss,
        inlier_ratio,
        inlier_loss_mult,
        only_finite,
        skip_nans,
    )


def batch_loss(
    loss_fun,
    clouds: Sequence[Cloud],
    masks=None,
    offsets=None,
    reduction: str = "mean",
    only_finite: bool = False,
    skip_nans: bool = False,
    **kwargs,
):
    """Joint loss of several clouds (one per sequence).

    The reference concatenates pointwise losses and reduces once
    (loss.py:181-213), i.e. the mean weighs every *point* equally across
    sequences; reproduced here with masked sums/counts so sequences of
    different padded sizes compose.
    """
    if masks is None:
        masks = [None] * len(clouds)
    if offsets is None:
        offsets = [None] * len(clouds)
    total = 0.0
    count = 0.0
    loss_clouds = []
    for cloud, mask, offset in zip(clouds, masks, offsets):
        pointwise, lc = loss_fun(
            cloud,
            mask=mask,
            offset=offset,
            reduction="none",
            only_finite=only_finite,
            skip_nans=skip_nans,
            **kwargs,
        )
        # reduce_loss(reduction="none") already folded only_finite /
        # skip_nans into the effective mask it returned on lc.mask.
        eff = lc.mask
        total = total + masked_sum(pointwise, eff)
        count = count + (
            jnp.sum(eff) if eff is not None else pointwise.size
        )
        loss_clouds.append(lc)
    if reduction == "mean":
        value = total / jnp.maximum(count, 1)
    elif reduction == "sum":
        value = total
    else:
        raise ValueError("batch_loss requires mean/sum reduction")
    return value, loss_clouds


# ---------------------------------------------------------------------------
# ICP-style losses over consecutive scan pairs (reference: loss.py:373-565).
# ---------------------------------------------------------------------------


def _pair_correspondence(points1, valid1, points2, valid2, icp_inlier_ratio):
    """1-NN correspondences 1 -> 2 with quantile inlier gating.

    Returns (indices into cloud2, weights in [0, 1]) with weight 0 for
    outliers/padding — the masked analogue of the reference's boolean
    index pair (loss.py:439-452).
    """
    from .ops.knn import nearest_neighbors

    dists, idx = nearest_neighbors(points2, points1, k=1, valid_points=valid2)
    dists = dists[:, 0]
    idx = idx[:, 0]
    thr = masked_quantile(dists, valid1 & (idx >= 0), icp_inlier_ratio)
    w = (dists <= thr) & valid1 & (idx >= 0)
    return idx, w


def point_to_plane_dist(
    clouds: Sequence[Cloud],
    icp_inlier_ratio: float = 0.5,
    masks=None,
    **_unused,
):
    """Symmetric point-to-plane distance over consecutive scan pairs
    (reference: loss.py:406-488). Correspondences come from non-differentiable
    1-NN (stop-gradient indices); gradients flow through the gathered point
    coordinates, as with the reference's precomputed-mask mode
    (train.py:179-210).

    :param masks: optional precomputed per-pair (idx2, weights) tuples.
    """
    n_pairs = len(clouds) - 1
    total = 0.0
    for i in range(n_pairs):
        c1, c2 = clouds[i], clouds[i + 1]
        assert c1.normals is not None, "point-to-plane needs normals"
        p1 = c1.get_points()
        p2 = c2.get_points()
        if masks is not None:
            idx2, w = masks[i]
        else:
            idx2, w = _pair_correspondence(
                jax.lax.stop_gradient(p1),
                c1.valid,
                jax.lax.stop_gradient(p2),
                c2.valid,
                icp_inlier_ratio,
            )
        q2 = p2[jnp.maximum(idx2, 0)]
        n2_of_2 = c2.normals[jnp.maximum(idx2, 0)]

        # 1 -> 2: project the matched point of cloud2 onto cloud1's tangent
        # plane; distance along cloud1's normal (reference: loss.py:461-467).
        k12 = jnp.sum(c1.normals * (q2 - p1), axis=-1)
        d12 = masked_mean(jnp.abs(k12), w)
        # 2 -> 1 with cloud2's normals (reference: loss.py:469-475).
        k21 = jnp.sum(n2_of_2 * (p1 - q2), axis=-1)
        d21 = masked_mean(jnp.abs(k21), w)
        total = total + 0.5 * (d12 + d21)
    return total / max(n_pairs, 1)


def point_to_point_dist(
    clouds: Sequence[Cloud],
    icp_inlier_ratio: float = 0.5,
    masks=None,
    **_unused,
):
    """Symmetric point-to-point distance over consecutive scan pairs
    (reference: loss.py:491-565)."""
    n_pairs = len(clouds) - 1
    total = 0.0
    for i in range(n_pairs):
        c1, c2 = clouds[i], clouds[i + 1]
        p1 = c1.get_points()
        p2 = c2.get_points()
        if masks is not None:
            idx2, w = masks[i]
        else:
            idx2, w = _pair_correspondence(
                jax.lax.stop_gradient(p1),
                c1.valid,
                jax.lax.stop_gradient(p2),
                c2.valid,
                icp_inlier_ratio,
            )
        q2 = p2[jnp.maximum(idx2, 0)]
        d = jnp.linalg.norm(q2 - p1, axis=-1)
        total = total + masked_mean(d, w)
    return total / max(n_pairs, 1)


def icp_pair_correspondences(points, valid, icp_inlier_ratio: float = 0.5):
    """Frozen 1-NN correspondences between consecutive scans of a sequence.

    Host-side equivalent of the reference's precomputed intersection masks
    (reference: train.py:179-210): for each pair (i, i+1), a KD-tree 1-NN
    query of scan i's GT-posed points against scan i+1's, gated by the
    ``icp_inlier_ratio`` distance quantile. Fixed-shape analogue of the
    reference's (mask1, mask2) boolean/index pair: full-length indices with
    zero weight on outliers and padding.

    :param points: (S, N, 3) numpy GT-posed points (uncorrected model).
    :param valid: (S, N) bool, False = padding.
    :return: (idx (S-1, N) int32 into scan i+1's rows, w (S-1, N) bool).
    """
    from scipy.spatial import cKDTree

    points = np.asarray(points)
    valid = np.asarray(valid)
    s, n = valid.shape
    idx = np.zeros((s - 1, n), np.int32)
    w = np.zeros((s - 1, n), bool)
    for i in range(s - 1):
        v1, v2 = valid[i], valid[i + 1]
        rows2 = np.flatnonzero(v2)
        if len(rows2) == 0 or not v1.any():
            # A fully filtered-out scan: zero-weight pair instead of a
            # cKDTree/quantile crash on empty inputs.
            continue
        tree = cKDTree(points[i + 1][rows2])
        d, ind = tree.query(points[i], k=1, workers=-1)
        ind = np.minimum(ind, len(rows2) - 1)
        thr = np.quantile(d[v1], icp_inlier_ratio)
        idx[i] = rows2[ind]
        w[i] = (d <= thr) & v1
    return idx, w


def icp_pair_loss_batched(
    points: jax.Array,
    normals: Optional[jax.Array],
    idx: jax.Array,
    w: jax.Array,
    point_to_plane: bool = True,
) -> jax.Array:
    """Symmetric ICP distance over consecutive scan pairs, fully batched.

    TPU-first reformulation of the reference's Python pair loop
    (reference: loss.py:406-565): all S-1 pairs evaluate as one program over
    (S, N, ...) arrays with precomputed frozen correspondences; gradients
    flow through the gathered point coordinates (and normals' frame via the
    pose transform), exactly like the reference's precomputed-mask mode.

    :param points: (S, N, 3) corrected, pose-transformed points.
    :param normals: (S, N, 3) pose-rotated normals (None for point-to-point).
    :param idx: (S-1, N) correspondence rows into scan i+1.
    :param w: (S-1, N) inlier weights (0 on outliers/padding).
    :return: scalar mean over pairs.
    """
    p1 = points[:-1]  # (P, N, 3)
    p2 = points[1:]
    gi = jnp.maximum(idx, 0)[..., None]
    q2 = jnp.take_along_axis(p2, gi, axis=1)  # (P, N, 3)
    wf = w.astype(points.dtype)
    w_sum = jnp.maximum(jnp.sum(wf, axis=-1), 1.0)
    if point_to_plane:
        assert normals is not None, "point-to-plane needs normals"
        n1 = normals[:-1]
        n2 = jnp.take_along_axis(normals[1:], gi, axis=1)
        # |n . (q - p)| is the distance to the tangent plane (unit normals);
        # the reference materializes the projected point first
        # (loss.py:461-475) — algebraically identical.
        d12 = jnp.sum(jnp.abs(jnp.sum(n1 * (q2 - p1), -1)) * wf, -1) / w_sum
        d21 = jnp.sum(jnp.abs(jnp.sum(n2 * (p1 - q2), -1)) * wf, -1) / w_sum
        pair = 0.5 * (d12 + d21)
    else:
        d = jnp.linalg.norm(q2 - p1, axis=-1)
        pair = jnp.sum(d * wf, -1) / w_sum
    return jnp.mean(pair)


def icp_loss(
    clouds,
    poses=None,
    model=None,
    masks=None,
    icp_point_to_plane: bool = True,
    icp_inlier_ratio: float = 0.5,
    **kwargs,
):
    """ICP loss over sequences of scans (reference: loss.py:373-403).

    :param clouds: list (sequences) of lists (scans) of Clouds.
    :param poses: list of (S, 4, 4) pose arrays per sequence.
    """
    loss_fun = point_to_plane_dist if icp_point_to_plane else point_to_point_dist
    total = 0.0
    loss_clouds = []
    for i, seq in enumerate(clouds):
        seq_clouds = list(seq)
        if model is not None:
            seq_clouds = [model(c) for c in seq_clouds]
        if poses is not None:
            seq_clouds = [
                c.transform(poses[i][j]).with_points()
                for j, c in enumerate(seq_clouds)
            ]
        else:
            seq_clouds = [c.with_points() for c in seq_clouds]
        seq_masks = None if masks is None else masks[i]
        total = total + loss_fun(
            seq_clouds,
            icp_inlier_ratio=icp_inlier_ratio,
            masks=seq_masks,
        )
        loss_clouds.append(seq_clouds)
    return total / max(len(clouds), 1), loss_clouds


def loss_by_name(name: str):
    losses = {
        "min_eigval_loss": min_eigval_loss,
        "trace_loss": trace_loss,
        "icp_loss": icp_loss,
    }
    if name not in losses:
        raise ValueError("Unknown loss: %s" % name)
    return losses[name]


def create_loss(cfg):
    """Bind config loss kwargs (reference: loss.py:573-579)."""
    loss = loss_by_name(cfg.loss)
    kwargs = dict(cfg.loss_kwargs or {})

    def loss_fun(*args, **kw):
        merged = dict(kwargs)
        merged.update(kw)
        return loss(*args, **merged)

    return loss_fun
