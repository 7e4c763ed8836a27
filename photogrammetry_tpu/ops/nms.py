"""Score-ordered non-maximum suppression of keypoints.

Reference: dotnet_src/ImageProcessing/RedundantKeypointEliminator.cs:16-39 —
sort by FastScore descending (stable), greedily keep the maximum, drop every
remaining keypoint within Euclidean ``suppression_radius`` (strictly greater
distances survive), repeat.

The greedy recursion is sequential in the number of *kept* points, but each
step suppresses a whole neighborhood as one vectorized mask update, so the
loop is O(K) iterations of O(K) VPU work on fixed-capacity arrays.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from photogrammetry_tpu.utils.padding import PaddedPoints


@jax.jit
def nms_keypoints(points: PaddedPoints, radius: jnp.ndarray) -> PaddedPoints:
    """Greedy radius NMS; returns same capacity with an updated mask/count."""
    k = points.capacity
    coords = points.coords.astype(jnp.float32)
    r2 = jnp.asarray(radius, jnp.float32) ** 2

    # Stable score-descending order; ties break by original (raster) index,
    # matching C# OrderByDescending's stable sort.
    order = jnp.argsort(-points.score, stable=True)

    def body(i, carry):
        active, kept = carry
        cur = order[i]
        take = active[cur] & points.mask[cur]
        kept = kept.at[cur].set(take)
        d2 = jnp.sum((coords - coords[cur]) ** 2, axis=-1)
        suppress = take & (d2 <= r2)  # distance > radius survives (strict)
        active = active & ~suppress
        return active, kept

    active0 = points.mask
    kept0 = jnp.zeros((k,), bool)
    _, kept = lax.fori_loop(0, k, body, (active0, kept0))
    return PaddedPoints(points.coords, points.score, kept,
                        jnp.sum(kept).astype(jnp.int32))


@partial(jax.jit, static_argnames=("capacity",))
def compact_points(points: PaddedPoints, capacity: int) -> PaddedPoints:
    """Pack the masked entries to the front (raster-stable), new capacity."""
    (idx,) = jnp.nonzero(points.mask, size=capacity, fill_value=0)
    n = jnp.minimum(points.count, capacity)
    valid = jnp.arange(capacity) < n
    return PaddedPoints(
        coords=points.coords[idx],
        score=jnp.where(valid, points.score[idx], 0.0),
        mask=valid,
        count=n,
    )
