"""Mesh, shardings, and distributed init (TPU-native dist_util)."""

from .mesh import (data_sharder, data_sharding, make_mesh, param_shardings,
                   replicate, shard_batch)

__all__ = ["data_sharder", "data_sharding", "make_mesh", "param_shardings",
           "replicate", "shard_batch"]
