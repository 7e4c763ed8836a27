"""DLT triangulation and cheirality-based pose disambiguation.

Reference: CameraPoseEstimation.cs:126-201 — per candidate pose, triangulate
every correspondence with a 4x4 SVD (:154-174), count positive depths in the
second camera (:182-185), keep the candidate with the most (:199).

TPU-native design: the (4 candidates x N pairs) double loop becomes a single
batched computation; the 4x4 null space is taken from ``eigh`` of D^T D
(batched 4x4 eigendecompositions) rather than N sequential SVDs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from photogrammetry_tpu.core.camera import normalize_pixels


def _dlt_design(xn1, xn2, r, t):
    """Build the (…, 4, 4) DLT design matrix for normalized coords.

    P1 = [I | 0], P2 = [R | t] (normalized camera matrices); rows per
    CameraPoseEstimation.cs:154-160.
    """
    p1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    p2 = jnp.concatenate([r, t[:, None]], axis=1)

    def build(x1, x2):
        return jnp.concatenate([
            jnp.stack([p1[0] - x1[0] * p1[2], x1[1] * p1[2] - p1[1]]),
            jnp.stack([p2[0] - x2[0] * p2[2], x2[1] * p2[2] - p2[1]]),
        ], axis=0)

    return jax.vmap(build)(xn1, xn2)  # (N, 4, 4)


def triangulate_dlt(xy1, xy2, r, t, k1, k2):
    """Triangulate pixel correspondences for pose (R, t) of camera 2.

    Returns (points_w (N, 3) in camera-1/world frame, depth2 (N,) depths in
    camera 2).
    """
    xn1 = normalize_pixels(xy1, k1)
    xn2 = normalize_pixels(xy2, k2)
    d = _dlt_design(xn1, xn2, r, t)  # (N, 4, 4)
    gram = jnp.einsum("nij,nik->njk", d, d)
    w, v = jnp.linalg.eigh(gram)
    xh = v[..., :, 0]  # (N, 4) smallest-eigenvalue eigenvector
    denom = xh[..., 3:]
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    pts = xh[..., :3] / denom
    cam2 = pts @ r.T + t
    return pts, cam2[..., 2]


def cheirality_counts(xy1, xy2, rs, ts, k1, k2, mask,
                      both_cameras: bool = True):
    """Inlier-visible point counts for each of the 4 candidate poses.

    both_cameras=False reproduces the reference's camera-2-only test
    (CameraPoseEstimation.cs:182-185); the default also requires positive
    depth in camera 1 (standard cheirality).
    """
    def one(r, t):
        pts, z2 = triangulate_dlt(xy1, xy2, r, t, k1, k2)
        ok = z2 > 0
        if both_cameras:
            ok = ok & (pts[..., 2] > 0)
        return jnp.sum(ok & mask), pts

    counts, pts = jax.vmap(one)(rs, ts)
    return counts, pts


def triangulate_nview(obs: jnp.ndarray, obs_mask: jnp.ndarray,
                      rs: jnp.ndarray, ts: jnp.ndarray, k: jnp.ndarray):
    """Mask-weighted multi-view DLT over every observing frame at once.

    The two-view DLT (triangulate_dlt) generalizes row-wise: each observing
    view contributes two rows u·P[2]-P[0], v·P[2]-P[1] in normalized camera
    coordinates, and the 4x4 Gram matrix sums them over the frame axis —
    masked views contribute zero.  One batched eigh over all T tracks.

    Args:
      obs: (F, T, 2) pixel observations.
      obs_mask: (F, T) bool — which frames observe which track.
      rs, ts: (F, 3, 3), (F, 3) world→camera poses.
      k: (3, 3) shared intrinsics.

    Returns (points (T, 3) world coords, depths (F, T) per-view depths).
    Tracks need >= 2 observing views for a meaningful solution; callers gate
    on jnp.sum(obs_mask, 0) >= 2 and on the returned depths.
    """
    xn = jnp.stack([(obs[..., 0] - k[0, 2]) / k[0, 0],
                    (obs[..., 1] - k[1, 2]) / k[1, 1]], axis=-1)  # (F, T, 2)
    p = jnp.concatenate([rs, ts[:, :, None]], axis=2)             # (F, 3, 4)
    a1 = xn[..., 0, None] * p[:, None, 2, :] - p[:, None, 0, :]   # (F, T, 4)
    a2 = xn[..., 1, None] * p[:, None, 2, :] - p[:, None, 1, :]
    w = obs_mask.astype(a1.dtype)[..., None]
    gram = (jnp.einsum("fti,ftj->tij", a1 * w, a1 * w)
            + jnp.einsum("fti,ftj->tij", a2 * w, a2 * w))          # (T, 4, 4)
    # Regularize the all-masked case so eigh stays well-defined.
    gram = gram + 1e-12 * jnp.eye(4)
    _, v = jnp.linalg.eigh(gram)
    xh = v[..., :, 0]                                              # (T, 4)
    denom = xh[..., 3:]
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    pts = xh[..., :3] / denom                                      # (T, 3)
    depths = jnp.einsum("fij,tj->fti", rs, pts)[..., 2] + ts[:, None, 2]
    return pts, depths


def select_pose(xy1, xy2, rs, ts, k1, k2, mask, both_cameras: bool = True):
    """Pick the candidate with the most points in front of the camera(s).

    Returns (r (3,3), t (3,), points_w (N,3), counts (4,), best_idx ()).
    """
    counts, pts = cheirality_counts(xy1, xy2, rs, ts, k1, k2, mask,
                                    both_cameras)
    best = jnp.argmax(counts)
    return rs[best], ts[best], pts[best], counts, best
