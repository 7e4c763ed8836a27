"""Epipolar geometry: normalized 8-point, RANSAC, essential decomposition.

Reference: dotnet_src/ImageProcessing/CameraPoseEstimation.cs —
EstimateFundamentalMatrix (:204-250), GetFundamentalMatrix RANSAC (:26-94),
EstimateCameraPose essential decomposition (:96-124).

TPU-native design decisions (vs the reference's sequential loops):
  * The RANSAC hypothesis loop (2000 samples x SVD, :39-86) becomes one
    ``vmap``: all hypotheses' constraint matrices are built, solved and
    scored against all pairs at once.
  * The 9-vector null space is taken from ``eigh`` of the 9x9 Gram matrix
    A^T A instead of an (N, 9) SVD — batched 9x9 eigendecompositions map far
    better onto the TPU than tall skinny SVDs and are algebraically the same
    null space.
  * Known reference deviations (documented, not reproduced):
      - CalculateTransformationMatrix computes scale = (2/msd)^(1/2) with
        C# integer division `1/2` == 0, so its Hartley scaling is a no-op
        (CameraPoseEstimation.cs:266); we implement the real sqrt.
      - Its transform composes translation(center) @ diag(s) so the centroid
        shift is unscaled (:268-273); we use the standard T = S @ Tr.
      - Its inlier test is the *signed* residual `x2' F x1 <= threshold`
        (:72-74); we use |residual| (pass signed_residual=True for the
        reference behavior).
      - It discards hypotheses whose F is not numerically rank 2 (:46-51);
        we project every F onto the rank-2 manifold (standard practice).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from photogrammetry_tpu.core.camera import to_homogeneous


def normalization_transform(xy: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Hartley normalization transform (3, 3) for masked (N, 2) points."""
    m = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)
    centroid = jnp.sum(xy * m[:, None], axis=0) / n
    d2 = jnp.sum((xy - centroid) ** 2, axis=-1) * m
    msd = jnp.sum(d2) / n
    s = jnp.sqrt(2.0 / jnp.maximum(msd, 1e-12))
    zero = jnp.zeros_like(s)
    one = jnp.ones_like(s)
    return jnp.stack([
        jnp.stack([s, zero, -s * centroid[0]]),
        jnp.stack([zero, s, -s * centroid[1]]),
        jnp.stack([zero, zero, one]),
    ])


def _smallest_eigvec_sym9(a: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of a symmetric (…, 9, 9)."""
    w, v = jnp.linalg.eigh(a)
    return v[..., :, 0]  # eigh returns ascending eigenvalues


def _nullvec_sym_fast(a: jnp.ndarray, iters: int = 4) -> jnp.ndarray:
    """Approximate smallest-eigenvalue eigenvector of symmetric PSD
    (..., D, D) via shifted inverse iteration — batched LU solves instead
    of eigh.

    Batched eigh of tiny matrices is the RANSAC hot spot on TPU (an
    iterative algorithm of many small ops: 11 ms for a 500-hypothesis
    gate at the 8-frame SfM sizes — measured round 4); ``iters`` direct
    solves converge at ratio ~lam0/lam1 per step, which for RANSAC Gram
    matrices (lam0 near 0, lam1 finite) reaches f32 accuracy in 3-4
    steps.  The start vector is a fixed dense direction; one step of
    inverse iteration already projects it dominantly onto the null space.
    """
    d = a.shape[-1]
    eps = 1e-6 * jnp.trace(a, axis1=-2, axis2=-1)[..., None, None] + 1e-12
    m = a + eps * jnp.eye(d, dtype=a.dtype)
    lu, piv = jax.scipy.linalg.lu_factor(m)
    v = jnp.ones(a.shape[:-1], a.dtype)  # (..., D)
    for _ in range(iters):
        v = jax.scipy.linalg.lu_solve((lu, piv), v[..., None])[..., 0]
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                            1e-30)
    return v


def eight_point_fundamental(xy1: jnp.ndarray, xy2: jnp.ndarray,
                            weights: jnp.ndarray | None = None,
                            exact: bool = True) -> jnp.ndarray:
    """Normalized 8-point estimate of F with x2^T F x1 = 0.

    xy1, xy2: (N, 2) pixel coords; weights: optional (N,) row weights
    (0 excludes a correspondence — used for masked/refit paths).
    Returns (3, 3) rank-2 F (unit Frobenius scale).

    exact=False (inverse-iteration null vector instead of eigh) is a
    documented NEGATIVE result: it halves the 500-hypothesis gate's cost
    (11 -> 5.5 ms) and aligns to the eigh vector < 4e-7 on random
    well-conditioned samples, but real RANSAC minimal samples are often
    near-degenerate (tiny eigen-gaps) where it returns a wrong null
    vector — full-suite regressions: blend-oracle ATE 0.024 -> 0.29,
    submap-chain 0.03 -> 0.30, seed-sweep failures (round 4).  Exact
    eigh everywhere; the fast path stays for future tuning.
    """
    n = xy1.shape[0]
    w = jnp.ones((n,), jnp.float32) if weights is None else weights.astype(jnp.float32)
    t1 = normalization_transform(xy1, w > 0)
    t2 = normalization_transform(xy2, w > 0)
    h1 = to_homogeneous(xy1) @ t1.T  # (N, 3) normalized
    h2 = to_homogeneous(xy2) @ t2.T
    x1, y1 = h1[:, 0], h1[:, 1]
    x2, y2 = h2[:, 0], h2[:, 1]
    one = jnp.ones_like(x1)
    a = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one],
                  axis=-1)  # (N, 9), row i enforces x2_i^T F x1_i = 0
    a = a * w[:, None]
    gram = a.T @ a
    if exact:
        f = _smallest_eigvec_sym9(gram).reshape(3, 3)
    else:
        f = _nullvec_sym_fast(gram).reshape(3, 3)
    f = t2.T @ f @ t1

    # Project to rank 2 (zero the smallest singular value).  Exact
    # batched 3x3 SVD: the SVD-free inverse-iteration projection was
    # another measured negative (ATE 0.029 -> 0.193 on the 8-frame pan).
    u, s, vt = jnp.linalg.svd(f)
    s = s.at[2].set(0.0)
    f = (u * s[None, :]) @ vt
    return f / jnp.maximum(jnp.linalg.norm(f), 1e-12)


def epipolar_residuals(f: jnp.ndarray, xy1: jnp.ndarray, xy2: jnp.ndarray,
                       kind: str = "sampson") -> jnp.ndarray:
    """Residuals of x2^T F x1 per correspondence.

    kind='algebraic' is the reference's raw bilinear value
    (CameraPoseEstimation.cs:72); 'sampson' is the first-order geometric
    distance (preferred for pixel-unit thresholds).
    """
    h1 = to_homogeneous(xy1)
    h2 = to_homogeneous(xy2)
    fx1 = h1 @ f.T       # (N, 3) = F x1
    ftx2 = h2 @ f        # (N, 3) = F^T x2
    alg = jnp.sum(h2 * fx1, axis=-1)
    if kind == "algebraic":
        return alg
    denom = fx1[:, 0] ** 2 + fx1[:, 1] ** 2 + ftx2[:, 0] ** 2 + ftx2[:, 1] ** 2
    return alg / jnp.sqrt(jnp.maximum(denom, 1e-12))


class RansacResult(NamedTuple):
    f: jnp.ndarray              # (3, 3) best fundamental matrix
    inliers: jnp.ndarray        # (N,) bool
    num_inliers: jnp.ndarray    # () int32
    best_sample: jnp.ndarray    # (S,) int32 indices of the winning sample


@partial(jax.jit, static_argnames=("num_samples", "sample_size", "residual",
                                   "signed_residual", "refit",
                                   "lo_iterations"))
def ransac_fundamental(key: jax.Array, xy1: jnp.ndarray, xy2: jnp.ndarray,
                       mask: jnp.ndarray, threshold: float,
                       num_samples: int = 2000, sample_size: int = 8,
                       residual: str = "sampson",
                       signed_residual: bool = False,
                       refit: bool = True,
                       lo_iterations: int = 3) -> RansacResult:
    """RANSAC over fundamental-matrix hypotheses, fully vmapped.

    Reference configuration: 2000 samples x 32 pairs, threshold 1e-3 on the
    algebraic residual (Program.cs:229).  All ``num_samples`` hypotheses are
    estimated and scored in parallel; with refit=True the winner is
    locally optimized (LO-RANSAC): up to ``lo_iterations`` rounds of
    refit-on-inliers -> rescore, keeping each round only if the consensus
    does not shrink.  (The reference returns the raw winner.)  LO shrinks
    the seed-to-seed variance of the winning basin — the dominant ATE
    noise source on small scenes.
    """
    n = xy1.shape[0]
    count = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    (valid_idx,) = jnp.nonzero(mask, size=n, fill_value=0)

    def draw(k):
        # uniform with replacement over valid correspondences; with
        # count >> sample_size duplicate draws are rare and a duplicate row
        # only weakens one hypothesis, never corrupts the consensus.
        u = jax.random.randint(k, (sample_size,), 0, count)
        return valid_idx[u]

    keys = jax.random.split(key, num_samples)
    sample_idx = jax.vmap(draw)(keys)                      # (H, S)

    def hypothesis(idx):
        return eight_point_fundamental(xy1[idx], xy2[idx])

    fs = jax.vmap(hypothesis)(sample_idx)                  # (H, 3, 3)

    def score(f):
        r = epipolar_residuals(f, xy1, xy2, kind=residual)
        ok = (r <= threshold) if signed_residual else (jnp.abs(r) <= threshold)
        return jnp.sum(ok & mask)

    inlier_counts = jax.vmap(score)(fs)
    best = jnp.argmax(inlier_counts)
    f = fs[best]

    r = epipolar_residuals(f, xy1, xy2, kind=residual)
    ok = (r <= threshold) if signed_residual else (jnp.abs(r) <= threshold)
    inliers = ok & mask

    if refit:
        def lo_round(_, carry):
            f, inliers = carry
            f2 = eight_point_fundamental(
                xy1, xy2, weights=inliers.astype(jnp.float32))
            r2 = epipolar_residuals(f2, xy1, xy2, kind=residual)
            ok2 = (r2 <= threshold) if signed_residual \
                else (jnp.abs(r2) <= threshold)
            inliers2 = ok2 & mask
            better = jnp.sum(inliers2) >= jnp.sum(inliers)
            return (jnp.where(better, f2, f),
                    jnp.where(better, inliers2, inliers))

        f, inliers = jax.lax.fori_loop(0, max(1, lo_iterations), lo_round,
                                       (f, inliers))

    return RansacResult(f=f, inliers=inliers,
                        num_inliers=jnp.sum(inliers).astype(jnp.int32),
                        best_sample=sample_idx[best].astype(jnp.int32))


def essential_from_fundamental(f: jnp.ndarray, k1: jnp.ndarray,
                               k2: jnp.ndarray) -> jnp.ndarray:
    """E = K2^T F K1 (CameraPoseEstimation.cs:102 with K1 == K2)."""
    return k2.T @ f @ k1


def decompose_essential(e: jnp.ndarray):
    """E → 4 candidate poses (R (4,3,3), t (4,3)), det(R) = +1.

    The W-trick of CameraPoseEstimation.cs:105-124; R sign fixed via
    determinant, t = ±(third column of U), unit norm.
    """
    u, s, vt = jnp.linalg.svd(e)
    w = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    r1 = u @ w @ vt
    r2 = u @ w.T @ vt
    r1 = r1 * jnp.sign(jnp.linalg.det(r1))
    r2 = r2 * jnp.sign(jnp.linalg.det(r2))
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    rs = jnp.stack([r1, r1, r2, r2])
    ts = jnp.stack([t, -t, t, -t])
    return rs, ts
