"""SPMD scaling over device meshes."""

from .sharding import (
    make_mesh,
    make_multihost_mesh,
    make_sharded_loss_fn,
    shard_train_data,
)

__all__ = [
    "make_mesh",
    "make_multihost_mesh",
    "make_sharded_loss_fn",
    "shard_train_data",
]
