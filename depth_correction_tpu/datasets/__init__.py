"""Datasets: synthetic fixtures, corruption wrappers, real-data loaders.

All datasets share the reference's duck-typed protocol
(reference: src/depth_correction/dataset.py, datasets/asl_laser.py:129-154):
``ds.ids``, ``ds.local_cloud(id) -> structured array``,
``ds.cloud_pose(id) -> (4, 4)``, integer indexing yielding
``(cloud, pose)``, slicing, len, iteration.
"""
from .synthetic import (
    AngleDataset,
    BaseDataset,
    GroundPlaneDataset,
    OpenBoxDataset,
    PlaneDataset,
    box_point_cloud,
    make_structured,
)
from .wrappers import (
    DepthBiasDataset,
    FilteredDataset,
    NoisyDepthDataset,
    NoisyPoseDataset,
    OverridePosesDataset,
    Subscriptable,
)

__all__ = [
    "AngleDataset",
    "BaseDataset",
    "DepthBiasDataset",
    "FilteredDataset",
    "GroundPlaneDataset",
    "NoisyDepthDataset",
    "NoisyPoseDataset",
    "OpenBoxDataset",
    "OverridePosesDataset",
    "PlaneDataset",
    "Subscriptable",
    "box_point_cloud",
    "create_dataset",
    "dataset_by_name",
    "make_structured",
    "noisy_dataset",
]


def dataset_by_name(name: str):
    """Resolve a dataset class from a name prefix
    (reference: dataset.py:912-930)."""
    prefix = name.split("/")[0]
    if prefix == "ground_plane":
        return GroundPlaneDataset
    if prefix == "open_box":
        return OpenBoxDataset
    if prefix == "plane":
        return PlaneDataset
    if prefix == "angle":
        return AngleDataset
    if "rendered_mesh" in name:
        from .rendered_mesh import RenderedMeshDataset

        return RenderedMeshDataset
    if ".obj" in name or ".ply" in name:
        from .mesh import MeshDataset

        return MeshDataset
    if prefix in (
        "asl_laser",
        "semantic_kitti",
        "newer_college",
        "kitti360",
        "fee_corridor",
    ):
        import importlib

        module = importlib.import_module(
            "depth_correction_tpu.datasets.%s" % prefix
        )
        return getattr(module, "Dataset")
    raise ValueError("Unknown dataset: %s" % name)


def noisy_dataset(ds, cfg):
    """Wrap with synthetic corruption per config
    (reference: dataset.py:933-950): known depth bias (the self-supervision
    ground truth), depth noise, pose noise.
    """
    import numpy as np

    if cfg.depth_bias_model_class:
        from ..models import model_by_name, load_model

        gt_model = load_model(
            class_name=cfg.depth_bias_model_class,
            model_args=list(cfg.depth_bias_model_args or []),
            model_kwargs=dict(cfg.depth_bias_model_kwargs or {}),
        )
        w = getattr(gt_model, "w", None)
        p0 = getattr(gt_model, "p0", None)
        has_bias = (w is not None and bool(np.any(np.asarray(w) != 0.0))) or (
            p0 is not None and float(p0) != 0.0
        )
        if has_bias:
            ds = DepthBiasDataset(ds, gt_model, cfg=cfg)

    if cfg.depth_noise:
        ds = NoisyDepthDataset(ds, noise=cfg.depth_noise)

    if cfg.pose_noise_mode is not None and cfg.pose_noise:
        ds = NoisyPoseDataset(ds, noise=cfg.pose_noise, mode=cfg.pose_noise_mode)
    return ds


def create_dataset(name: str, cfg, noisy: bool = True, poses_path=None, **kwargs):
    """Dataset factory: base -> poses override -> filtered -> corrupted ->
    sliced (reference: dataset.py:953-962; train.py:68-82 threads the
    per-sequence ``poses_path`` for the PoseProvider axis)."""
    cls = dataset_by_name(name)
    ds = cls(name, *list(cfg.dataset_args or []), **dict(cfg.dataset_kwargs or {}), **kwargs)
    if poses_path:
        ds = OverridePosesDataset(ds, poses_path)
    ds = FilteredDataset(ds, cfg)
    if noisy:
        ds = noisy_dataset(ds, cfg)
    return Subscriptable(ds)[cfg.data_slice()]
