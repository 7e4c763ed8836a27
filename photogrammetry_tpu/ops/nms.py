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


@jax.jit
def nms_keypoints_parallel(points: PaddedPoints,
                           radius: jnp.ndarray) -> PaddedPoints:
    """Greedy radius NMS as a parallel fixed-point — same result as
    ``nms_keypoints`` in ~chain-depth rounds instead of K sequential steps.

    Per round, every active point that has no *stronger* active point within
    the radius is a local maximum of the remaining set: greedy would keep
    exactly those, in some order, before any other point — so they are kept
    together and their neighborhoods deactivated.  The while_loop exits when
    nothing changes; worst case (a monotone chain) degrades to K rounds,
    typical keypoint fields converge in < 20.

    Strength order matches the sequential version: score desc, original
    index asc (stable tie-break).
    """
    coords = points.coords.astype(jnp.float32)
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    k = points.capacity

    d2 = jnp.sum((coords[:, None, :] - coords[None, :, :]) ** 2, axis=-1)
    near = d2 <= r2
    idx = jnp.arange(k)
    stronger = (points.score[None, :] > points.score[:, None]) | \
        ((points.score[None, :] == points.score[:, None])
         & (idx[None, :] < idx[:, None]))
    dominates = near & stronger  # j dominates i

    def cond(state):
        active, kept, changed = state
        return changed

    def body(state):
        active, kept, _ = state
        blocked = jnp.any(dominates & active[None, :], axis=1)
        new_kept = active & ~blocked
        # deactivate everything near a newly kept point (incl. itself)
        suppressed = jnp.any(near & new_kept[None, :], axis=1)
        new_active = active & ~suppressed
        kept2 = kept | new_kept
        changed = jnp.any(new_kept)
        return new_active, kept2, changed

    active0 = points.mask
    kept0 = jnp.zeros((k,), bool)
    _, kept, _ = lax.while_loop(cond, body,
                                (active0, kept0, jnp.bool_(True)))
    return PaddedPoints(points.coords, points.score, kept,
                        jnp.sum(kept).astype(jnp.int32))


@partial(jax.jit, static_argnames=("rounds",))
def nms_keypoints_static(points: PaddedPoints, radius: jnp.ndarray,
                         rounds: int = 64) -> PaddedPoints:
    """Parallel fixed-point NMS with a *static* trip count.

    Identical algorithm to ``nms_keypoints_parallel`` but runs a fixed
    ``rounds`` iterations (lax.fori_loop) instead of a data-dependent
    while_loop.  Each round keeps every active point not dominated by a
    stronger active point in radius, so after R rounds all suppression
    chains of depth <= R are resolved; real keypoint fields converge in
    2-14 rounds (measured on the reference fixtures and noise frames), so
    the default 64 has a wide margin.  Rationale: on the TPU runtime a
    data-dependent while_loop forces the surrounding program onto a slow
    synchronous dispatch path (~40 ms/call vs ~0.1 ms) — see
    docs/tpu_notes.md; a static trip count keeps the whole frontend on the
    fast path, and extra rounds past convergence are no-op mask updates
    costing microseconds.
    """
    coords = points.coords.astype(jnp.float32)
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    k = points.capacity
    d2 = jnp.sum((coords[:, None, :] - coords[None, :, :]) ** 2, axis=-1)
    near = d2 <= r2
    idx = jnp.arange(k)
    stronger = (points.score[None, :] > points.score[:, None]) | \
        ((points.score[None, :] == points.score[:, None])
         & (idx[None, :] < idx[:, None]))
    dominates = near & stronger

    def body(_, state):
        active, kept = state
        blocked = jnp.any(dominates & active[None, :], axis=1)
        new_kept = active & ~blocked
        suppressed = jnp.any(near & new_kept[None, :], axis=1)
        return active & ~suppressed, kept | new_kept

    active0 = points.mask
    kept0 = jnp.zeros((k,), bool)
    _, kept = lax.fori_loop(0, rounds, body, (active0, kept0))
    return PaddedPoints(points.coords, points.score, kept,
                        jnp.sum(kept).astype(jnp.int32))


@partial(jax.jit, static_argnames=("num_keep",))
def anms_keypoints(points: PaddedPoints, num_keep: int) -> PaddedPoints:
    """Adaptive non-maximal suppression (the reference's open TODO,
    RedundantKeypointEliminator.cs:41).

    Brown et al.'s ANMS: each keypoint's suppression radius is its distance
    to the nearest *stronger* keypoint (strength order: score desc, original
    index asc — same tie-break as the greedy NMS); the ``num_keep`` points
    with the largest radii survive, giving a spatially even distribution
    instead of a fixed radius.  One (K, K) distance matrix + a top-k: no
    sequential loop at all, the most TPU-friendly of the reduction policies.
    """
    coords = points.coords.astype(jnp.float32)
    k = points.capacity
    idx = jnp.arange(k)
    d2 = jnp.sum((coords[:, None, :] - coords[None, :, :]) ** 2, axis=-1)
    stronger = (points.score[None, :] > points.score[:, None]) | \
        ((points.score[None, :] == points.score[:, None])
         & (idx[None, :] < idx[:, None]))
    stronger = stronger & points.mask[None, :]
    inf = jnp.float32(jnp.finfo(jnp.float32).max)
    radius2 = jnp.min(jnp.where(stronger, d2, inf), axis=1)
    radius2 = jnp.where(points.mask, radius2, -1.0)
    # top-num_keep by radius; near-ties resolved by strength rank
    # (score desc, idx asc via stable sort — same order as the greedy NMS)
    order_rank = jnp.argsort(jnp.argsort(-points.score, stable=True))
    key = radius2 - order_rank.astype(jnp.float32) / (k + 1.0)
    _, keep_idx = lax.top_k(key, min(num_keep, k))
    kept = jnp.zeros((k,), bool).at[keep_idx].set(True) & points.mask
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
