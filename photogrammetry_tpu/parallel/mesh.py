"""Device-mesh helpers.

The reference's only parallelism is fork pools and TPL Dataflow threads
(SURVEY.md §2.3); the TPU-native replacement is a `jax.sharding.Mesh` with
named axes.  Axis convention:

  "tracks" — landmark/track sharding (data-parallel axis of BA: each device
             owns a shard of landmarks and the reduced camera system is
             psum-assembled over ICI)
  "frames" — keyframe sharding (used by the frontend batch pipeline and the
             pose-graph backend)
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape=None, axis_names=("tracks",), devices=None) -> Mesh:
    """Mesh over available devices; default: 1-D mesh over all of them."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def track_sharding(mesh: Mesh, rank_sharded_dim: int, ndim: int,
                   axis: str = "tracks") -> NamedSharding:
    """NamedSharding that shards dimension ``rank_sharded_dim`` over ``axis``."""
    spec = [None] * ndim
    spec[rank_sharded_dim] = axis
    return NamedSharding(mesh, P(*spec))
