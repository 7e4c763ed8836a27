"""Static-shape helpers.

TPU/XLA requires static shapes under jit; every variable-length collection in
the pipeline (keypoints, matches, tracks) is carried as a fixed-capacity array
plus a validity mask and a count. This module defines the canonical container.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to the next multiple of ``m`` (lane/sublane alignment)."""
    return ((x + m - 1) // m) * m


class PaddedPoints(NamedTuple):
    """Fixed-capacity point set.

    Attributes:
      coords: (K, 2) int32 — (row, col) image coordinates; undefined past count.
      score:  (K,) float32 — detector score (FAST longest-consecutive-run).
      mask:   (K,) bool — True for valid entries.
      count:  () int32 — number of valid entries (== mask.sum()).
    """

    coords: jnp.ndarray
    score: jnp.ndarray
    mask: jnp.ndarray
    count: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]


def pad_to(coords, score, capacity: int) -> PaddedPoints:
    """Build a PaddedPoints from concrete (host) arrays, padding to capacity."""
    import numpy as np

    coords = np.asarray(coords, dtype=np.int32).reshape(-1, 2)
    score = np.asarray(score, dtype=np.float32).reshape(-1)
    n = coords.shape[0]
    if n > capacity:
        raise ValueError(f"{n} points exceed capacity {capacity}")
    out_c = np.zeros((capacity, 2), np.int32)
    out_s = np.zeros((capacity,), np.float32)
    out_m = np.zeros((capacity,), bool)
    out_c[:n] = coords
    out_s[:n] = score
    out_m[:n] = True
    return PaddedPoints(
        jnp.asarray(out_c), jnp.asarray(out_s), jnp.asarray(out_m),
        jnp.asarray(n, jnp.int32),
    )
