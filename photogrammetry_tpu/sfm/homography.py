"""Plane-induced homography: DLT, RANSAC, and pose decomposition.

Net-new relative to the reference (which only estimates F,
CameraPoseEstimation.cs:26-94): a planar scene under camera motion induces
x2 ~ H x1 and leaves the fundamental matrix under-determined (a
two-parameter family) — exactly the geometry of the reference's own
ground-truth asset (blender/15pt_star_camera_pan: planar star, pure
lateral pan).  Real SfM initializers therefore race an H model against the
F model and bootstrap from whichever explains the matches (the ORB-SLAM
heuristic); this module supplies the H side, built the same TPU-native way
as sfm.epipolar: vmapped hypotheses, 9x9 Gram eigendecompositions instead
of tall SVDs, static shapes + masks throughout.

Decomposition follows Faugeras & Lustman's SVD method: for calibrated
Hn = K2^-1 H K1 with singular values d1 >= d2 >= d3, the four physical
(R, t, n) solutions come from the two sign choices of (x1, x3); cheirality
voting (sfm.triangulate.select_pose) picks the real one downstream.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from photogrammetry_tpu.core.camera import to_homogeneous
from photogrammetry_tpu.sfm.epipolar import (
    _nullvec_sym_fast, normalization_transform,
)


def _smallest_eigvec_sym9(a: jnp.ndarray) -> jnp.ndarray:
    w, v = jnp.linalg.eigh(a)
    return v[..., :, 0]


def dlt_homography(xy1: jnp.ndarray, xy2: jnp.ndarray,
                   weights: jnp.ndarray | None = None,
                   exact: bool = True) -> jnp.ndarray:
    """Normalized DLT estimate of H with x2 ~ H x1.

    xy1, xy2: (N, 2); weights: optional (N,) row weights (0 excludes).
    Returns (3, 3) H scaled to h22-ish unit Frobenius norm.
    """
    n = xy1.shape[0]
    w = jnp.ones((n,), jnp.float32) if weights is None \
        else weights.astype(jnp.float32)
    t1 = normalization_transform(xy1, w > 0)
    t2 = normalization_transform(xy2, w > 0)
    h1 = to_homogeneous(xy1) @ t1.T
    h2 = to_homogeneous(xy2) @ t2.T
    x1, y1 = h1[:, 0], h1[:, 1]
    x2, y2 = h2[:, 0], h2[:, 1]
    zero = jnp.zeros_like(x1)
    one = jnp.ones_like(x1)
    # Two rows per correspondence of the standard DLT system A h = 0.
    r1 = jnp.stack([x1, y1, one, zero, zero, zero,
                    -x2 * x1, -x2 * y1, -x2], axis=-1)
    r2 = jnp.stack([zero, zero, zero, x1, y1, one,
                    -y2 * x1, -y2 * y1, -y2], axis=-1)
    a = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)
    gram = a.T @ a
    # exact=False (the vmapped RANSAC-hypothesis path) swaps the batched
    # eigh for inverse iteration — see epipolar.eight_point_fundamental
    h = (_smallest_eigvec_sym9(gram) if exact
         else _nullvec_sym_fast(gram)).reshape(3, 3)
    h = jnp.linalg.solve(t2, h) @ t1  # denormalize: T2^-1 H T1
    return h / jnp.maximum(jnp.linalg.norm(h), 1e-12)


def homography_residuals(h: jnp.ndarray, xy1: jnp.ndarray,
                         xy2: jnp.ndarray) -> jnp.ndarray:
    """Symmetric transfer error (pixels): |H x1 - x2| + |H^-1 x2 - x1|, /2."""
    hinv = jnp.linalg.inv(h + 1e-30 * jnp.eye(3))

    def transfer(m, a):
        p = to_homogeneous(a) @ m.T
        z = jnp.where(jnp.abs(p[:, 2:3]) < 1e-12, 1e-12, p[:, 2:3])
        return p[:, :2] / z

    d12 = jnp.linalg.norm(transfer(h, xy1) - xy2, axis=-1)
    d21 = jnp.linalg.norm(transfer(hinv, xy2) - xy1, axis=-1)
    return 0.5 * (d12 + d21)


class HRansacResult(NamedTuple):
    h: jnp.ndarray
    inliers: jnp.ndarray
    num_inliers: jnp.ndarray


@partial(jax.jit, static_argnames=("num_samples", "sample_size",
                                   "lo_iterations"))
def ransac_homography(key: jax.Array, xy1: jnp.ndarray, xy2: jnp.ndarray,
                      mask: jnp.ndarray, threshold: float,
                      num_samples: int = 500, sample_size: int = 4,
                      lo_iterations: int = 3) -> HRansacResult:
    """Vmapped RANSAC over homography hypotheses with LO refinement."""
    n = xy1.shape[0]
    count = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    (valid_idx,) = jnp.nonzero(mask, size=n, fill_value=0)

    def draw(k):
        u = jax.random.randint(k, (sample_size,), 0, count)
        return valid_idx[u]

    keys = jax.random.split(key, num_samples)
    sample_idx = jax.vmap(draw)(keys)

    hs = jax.vmap(lambda idx: dlt_homography(xy1[idx],
                                             xy2[idx]))(sample_idx)

    def score(h):
        return jnp.sum((homography_residuals(h, xy1, xy2) <= threshold)
                       & mask)

    best = jnp.argmax(jax.vmap(score)(hs))
    h = hs[best]
    inliers = (homography_residuals(h, xy1, xy2) <= threshold) & mask

    def lo_round(_, carry):
        h, inliers = carry
        h2 = dlt_homography(xy1, xy2, weights=inliers.astype(jnp.float32))
        in2 = (homography_residuals(h2, xy1, xy2) <= threshold) & mask
        better = jnp.sum(in2) >= jnp.sum(inliers)
        return (jnp.where(better, h2, h), jnp.where(better, in2, inliers))

    h, inliers = jax.lax.fori_loop(0, max(1, lo_iterations), lo_round,
                                   (h, inliers))
    return HRansacResult(h=h, inliers=inliers,
                         num_inliers=jnp.sum(inliers).astype(jnp.int32))


def decompose_homography(h: jnp.ndarray, k1: jnp.ndarray, k2: jnp.ndarray):
    """Calibrated H → 4 candidate poses (R (4,3,3), t (4,3), n (4,3)).

    Faugeras-Lustman SVD construction.  t is unit-normalized (the plane
    distance absorbs scale, matching decompose_essential's gauge); n is
    the plane normal in camera-1 coordinates.  The pure-rotation case
    (d1 ~= d3) degrades gracefully: x1, x3 -> 0 gives R = s U V^T, t -> 0.
    """
    hn = jnp.linalg.solve(k2, h) @ k1
    u, d, vt = jnp.linalg.svd(hn)
    d1, d2, d3 = d[0], d[1], d[2]
    hn = hn / jnp.maximum(d2, 1e-12)
    d1, d3 = d1 / jnp.maximum(d2, 1e-12), d3 / jnp.maximum(d2, 1e-12)
    s = jnp.linalg.det(u) * jnp.linalg.det(vt)

    denom = jnp.maximum(d1 ** 2 - d3 ** 2, 1e-12)
    x1 = jnp.sqrt(jnp.clip((d1 ** 2 - 1.0) / denom, 0.0, None))
    x3 = jnp.sqrt(jnp.clip((1.0 - d3 ** 2) / denom, 0.0, None))

    rs, ts, ns = [], [], []
    for e1, e3 in ((1.0, 1.0), (1.0, -1.0), (-1.0, 1.0), (-1.0, -1.0)):
        a1, a3 = e1 * x1, e3 * x3
        sin_t = (d1 - d3) * a1 * a3
        cos_t = d1 * a3 ** 2 + d3 * a1 ** 2
        rp = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                        [0.0, 0.0, 1.0]])
        rp = jnp.stack([
            jnp.stack([cos_t, jnp.zeros(()), -sin_t]),
            jnp.stack([jnp.zeros(()), jnp.ones(()), jnp.zeros(())]),
            jnp.stack([sin_t, jnp.zeros(()), cos_t]),
        ])
        tp = (d1 - d3) * jnp.stack([a1, jnp.zeros(()), -a3])
        npp = jnp.stack([a1, jnp.zeros(()), a3])
        r = s * u @ rp @ vt
        t = u @ tp
        nvec = vt.T @ npp
        # canonicalize: normal pointing toward camera 1 (n.z > 0 for a
        # plane in front of a +z-forward camera)
        flip = jnp.where(nvec[2] < 0, -1.0, 1.0)
        rs.append(r)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
        ns.append(nvec * flip)
    return jnp.stack(rs), jnp.stack(ts), jnp.stack(ns)
