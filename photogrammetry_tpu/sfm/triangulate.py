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


def select_pose(xy1, xy2, rs, ts, k1, k2, mask, both_cameras: bool = True):
    """Pick the candidate with the most points in front of the camera(s).

    Returns (r (3,3), t (3,), points_w (N,3), counts (4,), best_idx ()).
    """
    counts, pts = cheirality_counts(xy1, xy2, rs, ts, k1, k2, mask,
                                    both_cameras)
    best = jnp.argmax(counts)
    return rs[best], ts[best], pts[best], counts, best
