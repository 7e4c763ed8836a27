"""Absolute pose from 2D-3D correspondences (RANSAC DLT-PnP).

The reference pipeline is two-view only (CameraPoseEstimation.cs never
registers a third view), so it has no PnP; this is a north-star estimator
component: once landmarks exist, each new frame's pose comes from its
observations of the existing map, not from chaining relative poses.

TPU-native design mirrors sfm/epipolar.py: the RANSAC hypothesis loop is a
single ``vmap`` (all minimal samples estimated and scored at once), and the
12-vector null space of the DLT system comes from ``eigh`` of the 12x12
Gram matrix A^T A — batched small eigendecompositions instead of tall-skinny
SVDs, the same trick the 8-point estimator uses.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from photogrammetry_tpu.core.camera import normalize_pixels


def dlt_pnp(points_w: jnp.ndarray, xn: jnp.ndarray,
            weights: jnp.ndarray | None = None):
    """Direct linear transform for pose: find (R, t) with xn ~ π(R X + t).

    Args:
      points_w: (N, 3) world points.
      xn: (N, 2) *normalized* image coordinates (K already removed).
      weights: optional (N,) row weights; 0 excludes a correspondence.

    Returns (r (3,3), t (3,)).  Needs >= 6 effective correspondences.

    The projective solution P = [M | p4] is the smallest eigenvector of the
    Gram matrix of the 2N x 12 constraint system; R is the orthogonal
    projection of M (SVD), the shared scale is M's mean singular value, and
    the sign is fixed so det(M) > 0 (cheirality-consistent).
    """
    n = points_w.shape[0]
    w = (jnp.ones((n,), jnp.float32) if weights is None
         else weights.astype(jnp.float32))

    # Condition the 3D side: centroid shift + isotropic scale to mean norm
    # sqrt(3) (the 3D analogue of Hartley normalization).  xn is already O(1).
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    c = jnp.sum(points_w * w[:, None], axis=0) / wsum
    xc = points_w - c
    scale = jnp.sqrt(3.0) / jnp.maximum(
        jnp.sum(jnp.linalg.norm(xc, axis=1) * w) / wsum, 1e-12)
    xs = xc * scale

    xh = jnp.concatenate([xs, jnp.ones((n, 1), xs.dtype)], axis=1)  # (N, 4)
    zeros = jnp.zeros_like(xh)
    u, v = xn[:, 0], xn[:, 1]
    row1 = jnp.concatenate([xh, zeros, -u[:, None] * xh], axis=1)  # (N, 12)
    row2 = jnp.concatenate([zeros, xh, -v[:, None] * xh], axis=1)
    a = jnp.concatenate([row1 * w[:, None], row2 * w[:, None]], axis=0)
    gram = a.T @ a
    _, vecs = jnp.linalg.eigh(gram)
    p = vecs[:, 0].reshape(3, 4)

    # Undo 3D normalization: P' maps s(X - c); P = P' @ [[sI, -sc], [0, 1]].
    tmat = jnp.concatenate(
        [jnp.concatenate([scale * jnp.eye(3), (-scale * c)[:, None]], axis=1),
         jnp.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)
    p = p @ tmat

    m = p[:, :3]
    p = p * jnp.sign(jnp.linalg.det(m))       # det(M) > 0 ⇒ depths consistent
    m = p[:, :3]
    uu, ss, vt = jnp.linalg.svd(m)
    r = uu @ vt
    r = jnp.where(jnp.linalg.det(r) < 0, -r, r)
    s_mean = jnp.maximum(jnp.mean(ss), 1e-12)
    t = p[:, 3] / s_mean
    return r, t


def pnp_reprojection_errors(r, t, points_w, xy, k):
    """Pixel reprojection errors (N,) and depths (N,) for pose (r, t)."""
    pc = points_w @ r.T + t
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    px = k[0, 0] * pc[:, 0] / zs + k[0, 2]
    py = k[1, 1] * pc[:, 1] / zs + k[1, 2]
    err = jnp.linalg.norm(jnp.stack([px, py], axis=-1) - xy, axis=-1)
    return err, z


class PnPResult(NamedTuple):
    r: jnp.ndarray              # (3, 3) world→camera rotation
    t: jnp.ndarray              # (3,) translation
    inliers: jnp.ndarray        # (N,) bool
    num_inliers: jnp.ndarray    # () int32


@partial(jax.jit, static_argnames=("num_samples", "sample_size", "refit"))
def ransac_pnp(key: jax.Array, points_w: jnp.ndarray, xy: jnp.ndarray,
               mask: jnp.ndarray, k: jnp.ndarray, threshold: float = 3.0,
               num_samples: int = 512, sample_size: int = 6,
               refit: bool = True) -> PnPResult:
    """RANSAC absolute pose, fully vmapped.

    points_w: (N, 3) landmarks; xy: (N, 2) pixel observations; mask: (N,)
    valid 2D-3D correspondences; threshold: inlier reprojection error (px).
    An inlier must also have positive depth.  With refit=True the winning
    pose is re-estimated on its full inlier set (and kept only if at least
    as many inliers survive).
    """
    n = xy.shape[0]
    xn = normalize_pixels(xy, k)

    def draw(kk):
        # Without replacement: a duplicated row in a 6-point minimal sample
        # makes the DLT system rank-deficient, which matters exactly when
        # the candidate set is thin (sample_size close to the valid count).
        u = jax.random.uniform(kk, (n,))
        u = jnp.where(mask, u, 2.0)          # invalid rows sort last
        return jnp.argsort(u)[:sample_size]

    keys = jax.random.split(key, num_samples)
    sample_idx = jax.vmap(draw)(keys)                       # (H, S)

    def hypothesis(idx):
        return dlt_pnp(points_w[idx], xn[idx])

    rs, ts = jax.vmap(hypothesis)(sample_idx)               # (H,3,3), (H,3)

    def score(r, t):
        err, z = pnp_reprojection_errors(r, t, points_w, xy, k)
        return jnp.sum((err <= threshold) & (z > 0) & mask)

    counts = jax.vmap(score)(rs, ts)
    best = jnp.argmax(counts)
    r, t = rs[best], ts[best]
    err, z = pnp_reprojection_errors(r, t, points_w, xy, k)
    inliers = (err <= threshold) & (z > 0) & mask

    if refit:
        r2, t2 = dlt_pnp(points_w, xn, weights=inliers.astype(jnp.float32))
        err2, z2 = pnp_reprojection_errors(r2, t2, points_w, xy, k)
        inl2 = (err2 <= threshold) & (z2 > 0) & mask
        better = jnp.sum(inl2) >= jnp.sum(inliers)
        r = jnp.where(better, r2, r)
        t = jnp.where(better, t2, t)
        inliers = jnp.where(better, inl2, inliers)

    return PnPResult(r=r, t=t, inliers=inliers,
                     num_inliers=jnp.sum(inliers).astype(jnp.int32))
