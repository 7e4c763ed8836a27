"""Multi-host initialization and mesh construction.

The reference has no multi-node story (SURVEY.md §2.3); this is the DCN tier
of the north star.  On a pod slice, call ``initialize()`` once per process
before any jax use; mesh axes are laid out so the heavy BA collectives
("tracks" psum of the reduced camera system, parallel/dist_ba.py) ride ICI
within a host while only submap/pose-graph exchange crosses DCN.
"""
from __future__ import annotations

import os

import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with env-var fallbacks.

    No-op when the process is the only one (single-host development) or when
    the coordinator cannot be determined.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "PHOTOGRAMMETRY_COORDINATOR")
    if coordinator_address is None and num_processes is None:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_pod_mesh(tracks_per_host: bool = True):
    """2-D (hosts, chips_per_host) mesh: ("submaps", "tracks").

    The "tracks" axis spans the chips of one host (ICI) so the per-iteration
    Schur psum never crosses DCN; the "submaps" axis spans hosts (DCN) and
    carries only low-rate pose-graph/submap traffic.
    """
    import jax
    from jax.sharding import Mesh

    devices = np.array(jax.devices())
    num_hosts = max(jax.process_count(), 1)
    per_host = len(devices) // num_hosts
    arr = devices.reshape(num_hosts, per_host)
    return Mesh(arr, ("submaps", "tracks"))
