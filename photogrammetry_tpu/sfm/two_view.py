"""Two-view relative pose + structure: the reference's SfM core, one jit.

Composes RANSAC fundamental estimation, essential decomposition, DLT
triangulation and cheirality voting (the full driver of
CameraPoseEstimation.cs + Program.cs:207-249) into a single jittable
function over fixed-capacity correspondence arrays.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from photogrammetry_tpu.sfm.epipolar import (
    ransac_fundamental, essential_from_fundamental, decompose_essential,
)
from photogrammetry_tpu.sfm.triangulate import select_pose


class TwoViewResult(NamedTuple):
    f: jnp.ndarray            # (3, 3) fundamental matrix
    e: jnp.ndarray            # (3, 3) essential matrix
    r: jnp.ndarray            # (3, 3) rotation of camera 2
    t: jnp.ndarray            # (3,) unit translation of camera 2
    points: jnp.ndarray       # (N, 3) triangulated points (world = cam-1 frame)
    inliers: jnp.ndarray      # (N,) bool epipolar inliers
    num_inliers: jnp.ndarray  # () int32
    cheirality: jnp.ndarray   # (4,) int32 positive-depth votes per candidate
    used_homography: jnp.ndarray  # () bool: pose came from the H model


@partial(jax.jit, static_argnames=("num_samples", "sample_size", "residual",
                                   "model", "h_samples"))
def two_view_pipeline(key: jax.Array, xy1: jnp.ndarray, xy2: jnp.ndarray,
                      mask: jnp.ndarray, k: jnp.ndarray,
                      threshold: float = 1.0,
                      num_samples: int = 2000, sample_size: int = 8,
                      residual: str = "sampson",
                      model: str = "auto",
                      h_samples: int = 500) -> TwoViewResult:
    """Matched pixel coords (x, y) → relative pose + 3-D structure.

    threshold is in pixels for residual='sampson'; the reference's 1e-3 on
    the algebraic residual (Program.cs:229) corresponds to residual =
    'algebraic'.

    model='auto' races a plane-induced homography against the fundamental
    matrix (the reference's own ground-truth scene is planar, where F is a
    two-parameter family — sfm.homography): when H explains >= 45% of the
    combined consensus (the ORB-SLAM arbitration ratio), the pose comes
    from H decomposition instead.  model='fundamental' is the reference's
    exact F-only path.
    """
    res = ransac_fundamental(key, xy1, xy2, mask, threshold,
                             num_samples=num_samples, sample_size=sample_size,
                             residual=residual)
    e = essential_from_fundamental(res.f, k, k)
    rs, ts = decompose_essential(e)
    use_h = jnp.zeros((), bool)
    inliers = res.inliers

    if model == "auto":
        from photogrammetry_tpu.sfm.homography import (
            decompose_homography, ransac_homography,
        )

        # Decorrelate the H draws from the F draws (split keys are
        # prefix-stable, so reusing `key` would make the 4-point samples
        # replicate halves of the 8-point samples); fold_in leaves the
        # F stream untouched so F-only results are unchanged.
        hres = ransac_homography(jax.random.fold_in(key, 1), xy1, xy2,
                                 mask, threshold, num_samples=h_samples)
        rs_h, ts_h, _ = decompose_homography(hres.h, k, k)
        sh = hres.num_inliers.astype(jnp.float32)
        sf = res.num_inliers.astype(jnp.float32)
        use_h = sh > 0.45 * (sh + sf)
        rs = jnp.where(use_h, rs_h, rs)
        ts = jnp.where(use_h, ts_h, ts)
        inliers = jnp.where(use_h, hres.inliers, inliers)

    r, t, pts, counts, _ = select_pose(xy1, xy2, rs, ts, k, k, inliers)
    return TwoViewResult(f=res.f, e=e, r=r, t=t, points=pts,
                         inliers=inliers,
                         num_inliers=jnp.sum(inliers).astype(jnp.int32),
                         cheirality=counts.astype(jnp.int32),
                         used_homography=use_h)
