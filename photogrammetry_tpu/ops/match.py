"""Descriptor matching: Hamming distances on the MXU.

The reference computes an N1 x N2 Hamming matrix with per-element XOR+popcount
loops (python_src/.../keypoint_matching.py:7-40 and
dotnet_src/ImageProcessing/KeypointMatching.cs:14-31) — its matching hot loop.

TPU-native design: for 0/1 bit vectors a, b:
    hamming(a, b) = |a| + |b| - 2 a.b
so the full distance matrix is one (N1, P) @ (P, N2) matmul — a perfect MXU
fit (the Pallas kernel in kernels/hamming.py tiles the same contraction).
Counts <= P = 256 are exact in bf16/f32 accumulation.

Three match policies mirror + extend the reference:
  * sorted_candidate_matches — per-row candidates sorted by distance
    (keypoint_matching.py:28-33);
  * greedy_global_matches — repeatedly take the globally smallest remaining
    (i, j) pair, removing both (KeypointMatching.cs:38-66);
  * mutual_nearest_matches — production default: mutual argmin + threshold,
    one pass, fully parallel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

INT_INF = jnp.iinfo(jnp.int32).max


@jax.jit
def hamming_distance_matrix(bits1: jnp.ndarray, bits2: jnp.ndarray,
                            mask1=None, mask2=None) -> jnp.ndarray:
    """(N1, P), (N2, P) {0,1} → (N1, N2) int32 Hamming distances.

    Rows/cols whose mask is False get INT_INF distances.
    """
    a = bits1.astype(jnp.bfloat16)
    b = bits2.astype(jnp.bfloat16)
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    na = jnp.sum(bits1.astype(jnp.int32), axis=1)
    nb = jnp.sum(bits2.astype(jnp.int32), axis=1)
    d = na[:, None] + nb[None, :] - 2 * ab.astype(jnp.int32)
    if mask1 is not None:
        d = jnp.where(mask1[:, None], d, INT_INF)
    if mask2 is not None:
        d = jnp.where(mask2[None, :], d, INT_INF)
    return d


@jax.jit
def sorted_candidate_matches(dist: jnp.ndarray):
    """Per-row candidate list sorted ascending by distance.

    Returns (indices (N1, N2) int32, distances (N1, N2) int32) — the
    semantics of keypoint_matching.py:28-33; the caller takes column 0
    under a distance threshold.
    """
    order = jnp.argsort(dist, axis=1)
    return order.astype(jnp.int32), jnp.take_along_axis(dist, order, axis=1)


@jax.jit
def mutual_nearest_matches(dist: jnp.ndarray, max_distance: jnp.ndarray,
                           max_ratio: jnp.ndarray | None = None):
    """Mutual nearest-neighbor matching, optionally with a Lowe ratio test.

    max_ratio: if given, reject rows whose best distance is not at most
    ``max_ratio * second_best`` (ambiguous matches on self-similar content).

    Returns (idx2 (N1,) int32 — match in set 2 for each row, or -1;
             d (N1,) int32 — its distance;
             valid (N1,) bool).
    """
    best2 = jnp.argmin(dist, axis=1)  # (N1,)
    best1 = jnp.argmin(dist, axis=0)  # (N2,)
    d = jnp.take_along_axis(dist, best2[:, None], axis=1)[:, 0]
    mutual = best1[best2] == jnp.arange(dist.shape[0])
    valid = mutual & (d <= max_distance) & (d < INT_INF)
    if max_ratio is not None:
        masked = jnp.where(
            jax.nn.one_hot(best2, dist.shape[1], dtype=bool), INT_INF, dist)
        second = jnp.min(masked, axis=1)
        ok = d.astype(jnp.float32) <= max_ratio * jnp.minimum(
            second, INT_INF - 1).astype(jnp.float32)
        valid = valid & ok
    return jnp.where(valid, best2, -1).astype(jnp.int32), d, valid


@partial(jax.jit, static_argnames=("num_matches",))
def greedy_global_matches(dist: jnp.ndarray, num_matches: int):
    """Greedy global mutual assignment (KeypointMatching.cs:38-66).

    Repeatedly extracts the globally smallest remaining (i, j), removing row i
    and column j.  Inherently sequential; each of the ``num_matches`` steps is
    a fully vectorized masked argmin, so the loop body is VPU-wide.

    Returns (i (M,) int32, j (M,) int32, d (M,) int32, valid (M,) bool).
    """
    n1, n2 = dist.shape

    def body(carry, _):
        d = carry
        flat = jnp.argmin(d.reshape(-1))
        i, j = flat // n2, flat % n2
        dij = d[i, j]
        d = d.at[i, :].set(INT_INF).at[:, j].set(INT_INF)
        return d, (i.astype(jnp.int32), j.astype(jnp.int32), dij)

    _, (ii, jj, dd) = lax.scan(body, dist, None, length=num_matches)
    valid = dd < INT_INF
    return ii, jj, dd, valid


@partial(jax.jit, static_argnames=())
def motion_consistency_mask(xy1: jnp.ndarray, xy2: jnp.ndarray,
                            mask: jnp.ndarray,
                            neighbor_radius: jnp.ndarray = 600.0,
                            agreement_radius: jnp.ndarray = 80.0,
                            min_support: jnp.ndarray = 2) -> jnp.ndarray:
    """Grid-free motion-smoothness filter over candidate matches (GMS-style).

    True correspondences of a rigid scene follow a locally smooth
    displacement field; false Hamming matches displace randomly.  A match
    survives iff at least ``min_support`` OTHER matches whose image-1
    keypoints lie within ``neighbor_radius`` px have displacement vectors
    within ``agreement_radius`` px of its own.

    Dense O(N^2) formulation — two (N, N) pairwise-distance matrices, a
    natural VPU/MXU fit at the frontend's fixed capacities (N <= 4096).
    The reference has no counterpart (its matcher stops at the raw
    threshold, keypoint_matching.py:28-33); this is the production
    prefilter that makes wide-baseline repetitive-texture pairs (the lego
    stereo fixture) solvable: measured inlier ratio 15/77 raw vs 14/42
    filtered, with the cheirality vote sharpening from 7/15 to 12/14
    (tests/test_real_photos.py).

    Returns the refined (N,) bool mask.
    """
    d = xy2 - xy1
    near = jnp.sum((xy1[:, None] - xy1[None]) ** 2, -1) < neighbor_radius ** 2
    agree = jnp.sum((d[:, None] - d[None]) ** 2, -1) < agreement_radius ** 2
    both = mask[:, None] & mask[None, :]
    support = jnp.sum(near & agree & both, axis=1) - mask.astype(jnp.int32)
    return mask & (support >= min_support)
