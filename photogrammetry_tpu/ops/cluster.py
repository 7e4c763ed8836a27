"""Keypoint clustering (redundancy removal, Python-tree counterpart of NMS).

Reference: python_src/photogrammetry/clustering/hierarchical.py:16-205 —
agglomerative clustering with city-block distance between weighted centroids:
repeatedly merge the closest pair of clusters with distance <= max_merge_dist;
the chunked variants split the image into a 4x4 grid and cluster per cell
(multiprocess pool sharding, hierarchical.py:186-205).

TPU-native design: the 4x4 spatial chunking *is* the parallel axis — each
chunk's merge loop runs on padded fixed-capacity arrays and the 16 chunks are
``vmap``-ed (the reference's fork-pool, re-expressed as a batch dimension).
Each merge step is a masked argmin over the full pairwise distance matrix, so
the inner loop is O(C) steps of O(C^2) VPU work per chunk.

``hierarchical_cluster_exact`` is a host-side NumPy implementation of the
reference's exact sequential semantics (insertion-ordered tie-breaking via a
stable sorted pair list) used for parity tests against the reference's
committed oracles (2175 -> 279/280 on lego, cluster_features.py:61-66).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from photogrammetry_tpu.utils.padding import PaddedPoints

_INF = jnp.float32(1e30)


@partial(jax.jit, static_argnames=())
def _cluster_chunk(centers, weights, max_merge_dist):
    """Agglomerative merge loop for one padded chunk.

    centers: (C, 2) float32; weights: (C,) float32 (0 => empty slot).
    Returns (centers, weights) with merged clusters; absorbed slots get
    weight 0.
    """
    cap = centers.shape[0]

    def dist_matrix(centers, weights):
        d = jnp.sum(jnp.abs(centers[:, None, :] - centers[None, :, :]), axis=-1)
        active = weights > 0
        pair_ok = active[:, None] & active[None, :]
        mask = jnp.triu(jnp.ones((cap, cap), bool), k=1) & pair_ok
        return jnp.where(mask, d, _INF)

    def body(_, state):
        centers, weights = state
        d = dist_matrix(centers, weights)
        flat = jnp.argmin(d.reshape(-1))
        i, j = flat // cap, flat % cap
        do_merge = d.reshape(-1)[flat] <= max_merge_dist
        wi, wj = weights[i], weights[j]
        new_center = (centers[i] * wi + centers[j] * wj) / jnp.maximum(wi + wj, 1e-9)
        centers = jnp.where(do_merge, centers.at[i].set(new_center), centers)
        weights = jnp.where(
            do_merge, weights.at[i].set(wi + wj).at[j].set(0.0), weights)
        return centers, weights

    return lax.fori_loop(0, cap - 1, body, (centers, weights))


@partial(jax.jit, static_argnames=("chunks", "chunk_capacity", "height", "width"))
def grid_cluster_keypoints(points: PaddedPoints, height: int, width: int,
                           max_merge_dist: float = 25.0,
                           chunks: tuple = (4, 4),
                           chunk_capacity: int = 256) -> PaddedPoints:
    """Chunked hierarchical clustering; returns clustered centroids.

    Chunk assignment matches hierarchical.py:153-156 (floor-divide by
    chunk pitch, clamped to the last cell).  Output coords are rounded
    centroids (hierarchical.py:131), score = cluster size.
    """
    ch, cw = chunks
    pitch_h = height // ch
    pitch_w = width // cw
    r = points.coords[:, 0]
    c = points.coords[:, 1]
    hc = jnp.minimum(r // pitch_h, ch - 1)
    wc = jnp.minimum(c // pitch_w, cw - 1)
    chunk_id = hc * cw + wc

    n_chunks = ch * cw
    # Scatter points into per-chunk padded slots (static unroll over chunks).
    all_centers = []
    all_weights = []
    for q in range(n_chunks):
        sel = points.mask & (chunk_id == q)
        (idx,) = jnp.nonzero(sel, size=chunk_capacity, fill_value=0)
        got = jnp.arange(chunk_capacity) < jnp.sum(sel)
        all_centers.append(jnp.where(got[:, None],
                                     points.coords[idx].astype(jnp.float32), 0.0))
        all_weights.append(got.astype(jnp.float32))
    centers = jnp.stack(all_centers)   # (Q, C, 2)
    weights = jnp.stack(all_weights)   # (Q, C)

    centers, weights = jax.vmap(_cluster_chunk, in_axes=(0, 0, None))(
        centers, weights, jnp.float32(max_merge_dist))

    flat_centers = centers.reshape(-1, 2)
    flat_weights = weights.reshape(-1)
    out_cap = n_chunks * chunk_capacity
    (idx,) = jnp.nonzero(flat_weights > 0, size=out_cap, fill_value=0)
    n = jnp.sum(flat_weights > 0).astype(jnp.int32)
    valid = jnp.arange(out_cap) < n
    coords = jnp.round(flat_centers[idx]).astype(jnp.int32)
    return PaddedPoints(
        coords=jnp.where(valid[:, None], coords, 0),
        score=jnp.where(valid, flat_weights[idx], 0.0),
        mask=valid,
        count=n,
    )


def hierarchical_cluster_exact(coords: np.ndarray,
                               max_merge_dist: float = 25.0,
                               return_linkage: bool = False):
    """Host-side exact replica of HierarchicalClustering.run_clustering
    (hierarchical.py:103-136) for parity testing.

    coords: (N, 2) int array.  Returns (M, 2) int32 rounded centroids in the
    reference's output order (iteration over surviving cluster ids).

    With ``return_linkage`` also returns the scipy-style linkage matrix the
    reference accumulates as ``z`` (hierarchical.py:56-58): one row
    ``[id1, id2, distance, new_count]`` per merge, new clusters numbered
    ``n0, n0+1, ...`` in merge order.
    """
    import heapq

    n0 = len(coords)
    centers = {i: coords[i].astype(np.float64) for i in range(n0)}
    counts = {i: 1 for i in range(n0)}
    active = set(centers)
    next_id = n0

    # Min-heap keyed by (distance, insertion sequence): pops in exactly the
    # order of the reference's stable sort-by-distance pair list
    # (hierarchical.py:32,78 — ties break by insertion order).  Pairs whose
    # clusters died are lazily skipped (the reference deletes them eagerly,
    # hierarchical.py:89-93; pop order is identical).
    heap = []
    seq = 0
    if n0 > 1:
        arr = coords.astype(np.float64)
        for j in range(n0):
            d = np.abs(arr[:j] - arr[j]).sum(axis=1)
            for i in np.nonzero(d <= max_merge_dist)[0]:
                heapq.heappush(heap, (d[i], seq, int(i), j))
                seq += 1

    linkage = []
    while heap:
        dist, _, c1, c2 = heapq.heappop(heap)
        if c1 not in active or c2 not in active:
            continue
        active.discard(c1)
        active.discard(c2)
        n = counts[c1] + counts[c2]
        linkage.append((c1, c2, dist, n))
        center = (centers[c1] * counts[c1] + centers[c2] * counts[c2]) / n
        cid = next_id
        next_id += 1
        centers[cid] = center
        counts[cid] = n
        for other in active:
            dd = float(np.abs(centers[other] - center).sum())
            if dd <= max_merge_dist:
                heapq.heappush(heap, (dd, seq, other, cid))
                seq += 1
        active.add(cid)

    out = [np.round(centers[i]).astype(np.int32) for i in sorted(active)]
    cents = np.stack(out) if out else np.zeros((0, 2), np.int32)
    if return_linkage:
        z = (np.asarray(linkage, np.float64).reshape(-1, 4)
             if linkage else np.zeros((0, 4), np.float64))
        return cents, z
    return cents
