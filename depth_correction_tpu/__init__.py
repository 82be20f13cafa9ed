"""depth_correction_tpu — TPU-native self-supervised lidar depth correction.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ctu-vras/depth_correction (RA-L 2023, "Self-Supervised Depth Correction of
Lidar Measurements from Map Consistency Loss"):

- lidar depth bias modeled as a learnable function of beam incidence angle,
- trained self-supervised from map-consistency losses (min eigenvalue /
  trace of local neighborhood covariances of the merged multi-view cloud)
  or ICP-style point-to-plane/point distances,
- optional SE(3) pose co-optimization,
- evaluation via consistency metrics, chamfer distance, and pose errors.

Design principles (TPU-first, not a port):

- clouds are immutable pytrees of fixed-shape SoA arrays with validity
  masks; filtering produces masks, never ragged arrays,
- the hot training step is a single jitted pure function:
  depth-correct -> pose-transform -> neighbor gather -> weighted cov ->
  closed-form 3x3 eigendecomposition -> masked loss reduction -> grad,
- neighbor search is an on-device tiled kernel producing fixed-K padded
  index matrices (reference pads with -1: nearest_neighbors.py:69-73),
- scaling is scan/point sharding over a `jax.sharding.Mesh` with XLA
  collectives, not host multiprocessing.
"""

from . import config as _config  # noqa: F401  (re-exported below)

from .config import Config, Loss, Model, NeighborhoodType, PoseCorrection
from .cloud import Cloud

__version__ = "0.1.0"

__all__ = [
    "Cloud",
    "Config",
    "Loss",
    "Model",
    "NeighborhoodType",
    "PoseCorrection",
]
