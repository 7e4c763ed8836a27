"""Lens-distortion calibration ("distortion-mat calibration", BASELINE.json
config 2): fit the rational radial model's coefficients from images of
straight edges.

The reference hard-codes its coefficients ([3e-4, 1e-7, 0, 0, 0],
python_src/scripts/de_warp.py:52) and derives candidate models in
notes/de_warping.md, but never estimates them from data.  This module closes
that gap with the classic *plumb-line* method: straight world lines must stay
straight after undistortion, so the coefficients are those that minimize the
summed squared distance of undistorted edge points to their best-fit lines.

TPU-native design — every stage is a fixed-shape jitted program:

  * edge extraction: Sobel magnitude (two 3x3 stencils as shifted adds),
    top-N edge points (static top-k);
  * line finding: a Hough transform whose vote stage is an (N x THETA)
    matmul on the MXU followed by one scatter-add into the (THETA, RHO)
    accumulator (``mode='drop'`` for out-of-range votes, the package's
    static-shape convention), peak picking by top-k with a suppression
    window;
  * model fit: Levenberg-Marquardt over the (5,) coefficient vector with
    residuals = point-to-line distances after undistortion (the direct
    forward evaluation rd = r * f(r) — the same direction the image
    dewarp moves content, so fitted coefficients drop straight into
    generate_distortion_map), Jacobian by autodiff, static iteration count,
    per-line best-fit lines recomputed in closed form (2x2 eigen problem)
    inside every residual evaluation.

Forward model (warping.py:33-76): rd = r * f(r),
    f(r) = (1 + k1 r + k2 r^2) / (1 + k3 r + k4 r^2 + k5 r^3).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from photogrammetry_tpu.ops.dewarp import solve_undistorted_radius

_EPS = 1e-12


def undistort_points(xy: jnp.ndarray, coeffs: jnp.ndarray,
                     center: jnp.ndarray) -> jnp.ndarray:
    """Captured (distorted) (..., 2) (row, col) points -> undistorted.

    Direction convention (round 4 — this and ``distort_points`` were
    swapped before, which made calibrate->dewarp round trips on genuinely
    distorted photos inconsistent): the reference's camera has barrel
    distortion, so its dewarp EXPANDS content — a feature captured at
    sensor radius r appears at radius rd = r * f(r) in the dewarped image
    (generate_distortion_map samples output pixel rd from source
    solve(rd); warping.py:149-161).  Undistorting a captured point is
    therefore the direct forward evaluation rd = r * f(r) — no root solve,
    closed form, cheaply differentiable (this is what the plumb-line fit
    iterates).
    """
    coeffs = jnp.asarray(coeffs, jnp.float32)
    k1, k2, k3, k4, k5 = (coeffs[i] for i in range(5))
    d = xy - center
    r = jnp.sqrt(jnp.sum(d * d, axis=-1) + _EPS)
    f = (1.0 + k1 * r + k2 * r ** 2) / (1.0 + k3 * r + k4 * r ** 2
                                        + k5 * r ** 3)
    return center + d * f[..., None]


def _inverse_radius_diff(rd: jnp.ndarray, coeffs: jnp.ndarray,
                         newton_steps: int = 2) -> jnp.ndarray:
    """Differentiable inverse radius (undistorted rd -> captured r).

    The closed-form cubic solve (trig/Cardano branches) produces NaN
    cotangents under autodiff, so the root is taken under stop_gradient and
    refined with Newton steps *through the forward model* — at a converged
    root this is exactly the implicit-function gradient dr/dk, and it also
    polishes the f32 root numerically.
    """
    k1, k2, k3, k4, k5 = (coeffs[i] for i in range(5))
    r = jax.lax.stop_gradient(solve_undistorted_radius(rd, coeffs))
    for _ in range(newton_steps):
        num = 1.0 + k1 * r + k2 * r ** 2
        den = 1.0 + k3 * r + k4 * r ** 2 + k5 * r ** 3
        dnum = k1 + 2.0 * k2 * r
        dden = k3 + 2.0 * k4 * r + 3.0 * k5 * r ** 2
        g = r * num / den - rd
        gp = (num + r * dnum) / den - r * num * dden / (den * den)
        gp = jnp.where(jnp.abs(gp) < 1e-6,
                       jnp.where(gp < 0, -1e-6, 1e-6), gp)
        r = r - g / gp
    return r


def distort_points(xy: jnp.ndarray, coeffs: jnp.ndarray,
                   center: jnp.ndarray) -> jnp.ndarray:
    """Undistorted (world) (..., 2) points -> captured (distorted), via the
    closed-form cubic (ops/dewarp.py:34) with a differentiable Newton
    polish.  This is the camera's own contraction (see undistort_points
    for the direction convention); used to synthesize distorted fixtures
    and project undistorted geometry back into captured frames."""
    d = xy - center
    rd = jnp.sqrt(jnp.sum(d * d, axis=-1) + _EPS)
    r = _inverse_radius_diff(rd, jnp.asarray(coeffs, jnp.float32))
    return center + d * (r / rd)[..., None]


def undistort_points_brown(xy: jnp.ndarray, coeffs: jnp.ndarray,
                           center: jnp.ndarray) -> jnp.ndarray:
    """Brown even-power model (notes/de_warping.md "Alternate Method 3"):
    undistorted = distorted * g(r), g = 1 + k1 r^2 + k2 r^4 + k3 r^6.
    Closed form in this direction — the cheap side lands in the fit loop.

    coeffs: (5,) with [k1, k2, k3, unused, unused]."""
    coeffs = jnp.asarray(coeffs, jnp.float32)
    k1, k2, k3 = coeffs[0], coeffs[1], coeffs[2]
    d = xy - center
    r2 = jnp.sum(d * d, axis=-1) + _EPS
    g = 1.0 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
    return center + d * g[..., None]


def distort_points_brown(xy: jnp.ndarray, coeffs: jnp.ndarray,
                         center: jnp.ndarray,
                         newton_steps: int = 12) -> jnp.ndarray:
    """Inverse Brown model (undistorted -> distorted): Newton on
    h(r) = r g(r) - r0 from r = r0 (differentiable through the iteration)."""
    coeffs = jnp.asarray(coeffs, jnp.float32)
    k1, k2, k3 = coeffs[0], coeffs[1], coeffs[2]
    d = xy - center
    r0 = jnp.sqrt(jnp.sum(d * d, axis=-1) + _EPS)
    r = r0
    for _ in range(newton_steps):
        r2 = r * r
        g = 1.0 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
        gp = 2.0 * k1 * r + 4.0 * k2 * r ** 3 + 6.0 * k3 * r ** 5
        h = r * g - r0
        hp = g + r * gp
        hp = jnp.where(jnp.abs(hp) < 1e-6,
                       jnp.where(hp < 0, -1e-6, 1e-6), hp)
        r = r - h / hp
    return center + d * (r / r0)[..., None]


def line_residuals(points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Signed distances of (L, P, 2) points to each line's best-fit line.

    The best-fit (total-least-squares) line per group is the eigenvector of
    the 2x2 scatter matrix with the smallest eigenvalue — closed form, so the
    whole residual is differentiable and recomputed per evaluation.  Masked
    points contribute zero.
    """
    w = mask.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)  # (L, 1)
    mean = jnp.sum(points * w[..., None], axis=1, keepdims=True) / cnt[..., None]
    d = (points - mean) * w[..., None]                          # (L, P, 2)
    # scatter entries
    sxx = jnp.sum(d[..., 0] ** 2, axis=1)
    syy = jnp.sum(d[..., 1] ** 2, axis=1)
    sxy = jnp.sum(d[..., 0] * d[..., 1], axis=1)
    # Normal of the TLS line via the principal-axis half-angle:
    #   phi = 0.5 atan2(2 sxy, sxx - syy)  (direction of MAX variance)
    #   n   = (-sin phi, cos phi)
    # atan2 is cancellation-free.  The previous eigenvector form
    # (sxy, lam_min - sxx) subtracted two nearly-equal f32 numbers; with
    # axis-aligned lines (sxy ~ 0, variances differing by ~1e6x) the
    # difference was pure rounding noise and the normal could flip onto
    # the line DIRECTION, reporting the full line extent as "residual"
    # (caught by the Brown-model grid fixtures).
    phi = 0.5 * jnp.arctan2(2.0 * sxy, sxx - syy)
    n = jnp.stack([-jnp.sin(phi), jnp.cos(phi)], -1)            # (L, 2)
    return jnp.sum(d * n[:, None, :], axis=-1)                  # (L, P)


class CalibrationResult(NamedTuple):
    coeffs: jnp.ndarray        # (5,) fitted coefficients (model-dependent)
    cost: jnp.ndarray          # final sum of squared line residuals
    initial_cost: jnp.ndarray


class ImageCalibration(NamedTuple):
    """calibrate_from_image result: CalibrationResult fields + which
    distortion model the coefficients belong to.  (Host-side only — jitted
    code returns CalibrationResult, whose pytree stays string-free.)"""
    coeffs: jnp.ndarray
    cost: jnp.ndarray
    initial_cost: jnp.ndarray
    model: str


@partial(jax.jit, static_argnames=("num_iterations", "model"))
def calibrate_distortion(points: jnp.ndarray, mask: jnp.ndarray,
                         center: jnp.ndarray,
                         init_coeffs: jnp.ndarray | None = None,
                         param_mask: jnp.ndarray | None = None,
                         num_iterations: int = 30,
                         init_lambda: float = 1e-3,
                         radius_scale: float = 1000.0,
                         model: str = "rational") -> CalibrationResult:
    """Plumb-line LM fit of the distortion coefficients.

    model="rational" fits the reference's 5-parameter rational radial
    model; model="brown" fits the even-power Brown model of the
    reference's derivation notes (notes/de_warping.md "Alternate Method
    3": g = 1 + k1 r^2 + k2 r^4 + k3 r^6, coefficients in slots [0:3]).

    Args:
      points: (L, P, 2) distorted (row, col) edge points grouped by line.
      mask: (L, P) validity.
      center: (2,) distortion center (row, col).
      init_coeffs: (5,) start, default zeros (identity mapping).
      param_mask: (5,) floats; 0 freezes a coefficient.  Defaults to fitting
        the numerator pair [k1, k2] only — the reference's own usage (its
        k3..k5 are always zero, de_warp.py:52) and the well-conditioned
        subset for plumb-line data.
      radius_scale: internal reparameterization: coefficient i scales a
        radius power r^(i+1), so raw gradients differ by ~r^4 across
        parameters; optimizing k_i' = k_i * radius_scale^(i+1) conditions
        the normal equations at image-scale radii.
    """
    if init_coeffs is None:
        init_coeffs = jnp.zeros((5,), jnp.float32)
    if param_mask is None:
        param_mask = (jnp.array([1.0, 1.0, 0.0, 0.0, 0.0], jnp.float32)
                      if model == "rational"
                      else jnp.array([1.0, 1.0, 1.0, 0.0, 0.0],
                                     jnp.float32))
    init_coeffs = jnp.asarray(init_coeffs, jnp.float32)
    param_mask = jnp.asarray(param_mask, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    w = mask.astype(jnp.float32)

    if model == "rational":
        powers = jnp.arange(1, 6, dtype=jnp.float32)
        undist = undistort_points
    elif model == "brown":
        # Brown coefficients multiply r^2, r^4, r^6
        powers = jnp.array([2.0, 4.0, 6.0, 1.0, 1.0], jnp.float32)
        undist = undistort_points_brown
    else:
        raise ValueError(f"unknown model {model!r}")
    scale = radius_scale ** powers                 # (5,)

    rd = jnp.sqrt(jnp.sum((points - center) ** 2, axis=-1) + _EPS)
    wsum = jnp.maximum(jnp.sum(w), 1.0)

    def resid(scaled):
        coeffs = scaled / scale
        und = undist(points, coeffs, center)
        # Scale-invariance guard: plumb-line cost alone has a descent
        # direction that shrinks *all* undistorted points toward the center
        # (larger f => smaller r for every observed rd), reducing absolute
        # point-to-line distances without straightening.  Dividing by the
        # mean radial contraction removes that gauge.
        ru = jnp.sqrt(jnp.sum((und - center) ** 2, axis=-1) + _EPS)
        contraction = jnp.sum(ru / rd * w) / wsum
        return (line_residuals(und, mask) * w).ravel() / contraction

    def cost_of(scaled):
        r = resid(scaled)
        return 0.5 * jnp.sum(r * r)

    theta0 = init_coeffs * scale
    cost0 = cost_of(theta0)

    def body(carry, _):
        theta, lam, cost = carry
        r = resid(theta)
        j = jax.jacfwd(resid)(theta)               # (L*P, 5)
        j = j * param_mask[None, :]
        jtj = j.T @ j
        g = j.T @ r
        a = jtj + lam * jnp.diag(jnp.diag(jtj)) + 1e-8 * jnp.eye(5)
        step = -jnp.linalg.solve(a, g) * param_mask
        cand = theta + step
        new_cost = cost_of(cand)
        accept = new_cost < cost
        theta = jnp.where(accept, cand, theta)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-10),
                        jnp.minimum(lam * 5.0, 1e8))
        return (theta, lam, cost), cost

    (theta, _, cost), _ = jax.lax.scan(
        body, (theta0, jnp.float32(init_lambda), cost0), None,
        length=num_iterations)
    return CalibrationResult(coeffs=theta / scale, cost=cost,
                             initial_cost=cost0)


# ---------------------------------------------------------------------------
# Edge + line extraction (for the CLI's automatic mode)
# ---------------------------------------------------------------------------

@jax.jit
def sobel_magnitude(image: jnp.ndarray) -> jnp.ndarray:
    """Sobel gradient magnitude of an (H, W) grayscale image (zero border)."""
    img = image.astype(jnp.float32)

    def sh(dr, dc):
        return jnp.roll(img, (dr, dc), axis=(0, 1))

    gx = (sh(-1, -1) + 2 * sh(0, -1) + sh(1, -1)
          - sh(-1, 1) - 2 * sh(0, 1) - sh(1, 1))
    gy = (sh(-1, -1) + 2 * sh(-1, 0) + sh(-1, 1)
          - sh(1, -1) - 2 * sh(1, 0) - sh(1, 1))
    mag = jnp.sqrt(gx * gx + gy * gy)
    mag = mag.at[0, :].set(0.0).at[-1, :].set(0.0)
    mag = mag.at[:, 0].set(0.0).at[:, -1].set(0.0)
    return mag


class HoughLines(NamedTuple):
    theta: jnp.ndarray   # (L,) line normal angle
    rho: jnp.ndarray     # (L,) signed distance from image center
    votes: jnp.ndarray   # (L,) accumulator peak height


@partial(jax.jit, static_argnames=("num_points",))
def extract_edge_points(image: jnp.ndarray, num_points: int = 4096):
    """(N, 2) absolute (row, col) coordinates of the strongest Sobel edges
    plus their (N,) magnitudes (zero-magnitude entries are padding)."""
    mag = sobel_magnitude(image)
    h, w = mag.shape
    val, idx = jax.lax.top_k(mag.ravel(), num_points)
    pts = jnp.stack([(idx // w).astype(jnp.float32),
                     (idx % w).astype(jnp.float32)], axis=-1)
    return pts, val


@partial(jax.jit, static_argnames=("num_thetas", "num_rhos", "num_lines"))
def hough_from_points(points: jnp.ndarray, weights: jnp.ndarray,
                      center: jnp.ndarray, extent: float,
                      num_thetas: int = 180, num_rhos: int = 512,
                      num_lines: int = 8,
                      suppress: float = 0.05) -> HoughLines:
    """Top-``num_lines`` Hough peaks from binary point votes.

    Each point with ``weights > 0`` casts one (unweighted) vote; edge
    magnitudes only gate participation, they do not scale the vote.  (A
    magnitude-weighted vote biases peaks toward a few saturated edges;
    one-point-one-vote favors long lines, which is what the plumb-line
    fit wants.)

    rho is measured from ``center`` (the distortion center, so lines stay
    near their bins under mild distortion); ``extent`` bounds |rho|.  The
    vote stage is one (N, THETA) outer product on the MXU plus one
    scatter-add (``mode='drop'`` for out-of-range votes); peaks are greedy
    top-k with a suppression window (fraction ``suppress`` of each axis,
    wrapping theta since (theta + pi, -rho) is the same line).
    """
    cr = points[..., 0] - center[0]
    cc = points[..., 1] - center[1]
    pw = (weights > 0).astype(jnp.float32)

    thetas = jnp.linspace(0.0, jnp.pi, num_thetas, endpoint=False)
    rho = cr[:, None] * jnp.cos(thetas)[None, :] \
        + cc[:, None] * jnp.sin(thetas)[None, :]
    rbin = jnp.round((rho / extent * 0.5 + 0.5)
                     * (num_rhos - 1)).astype(jnp.int32)
    tbin = jnp.broadcast_to(jnp.arange(num_thetas)[None, :], rbin.shape)
    rbin = jnp.where((rbin < 0) | (rbin >= num_rhos), num_rhos, rbin)
    acc = jnp.zeros((num_thetas, num_rhos), jnp.float32)
    acc = acc.at[tbin.ravel(), rbin.ravel()].add(
        jnp.broadcast_to(pw[:, None], rbin.shape).ravel(), mode="drop")

    st = max(1, int(num_thetas * suppress))
    sr = max(1, int(num_rhos * suppress))

    def pick(acc, _):
        p = jnp.argmax(acc)
        ti, ri = p // num_rhos, p % num_rhos
        v = acc[ti, ri]
        tt = jnp.arange(num_thetas)
        rr = jnp.arange(num_rhos)
        dt = jnp.minimum(jnp.abs(tt - ti), num_thetas - jnp.abs(tt - ti))
        near = (dt[:, None] <= st) & (jnp.abs(rr[None, :] - ri) <= sr)
        return jnp.where(near, 0.0, acc), (ti, ri, v)

    acc, (tis, ris, vs) = jax.lax.scan(pick, acc, None, length=num_lines)
    theta = tis.astype(jnp.float32) * (jnp.pi / num_thetas)
    rho = (ris.astype(jnp.float32) / (num_rhos - 1) - 0.5) * 2.0 * extent
    return HoughLines(theta=theta, rho=rho, votes=vs)


@partial(jax.jit, static_argnames=("points_per_line",))
def assign_points_to_lines(points: jnp.ndarray, weights: jnp.ndarray,
                           lines: HoughLines, center: jnp.ndarray,
                           tol: float = 4.0, points_per_line: int = 512):
    """Group points to their nearest Hough line (within ``tol``).

    Returns (L, P) int32 indices into ``points`` and an (L, P) mask, fixed
    capacity ``points_per_line`` per line (strongest first).  Each point
    joins at most one line (its nearest), so shared corners can't vote for
    two lines with inconsistent groupings.
    """
    cr = points[..., 0] - center[0]
    cc = points[..., 1] - center[1]
    d = jnp.abs(cr[None, :] * jnp.cos(lines.theta)[:, None]
                + cc[None, :] * jnp.sin(lines.theta)[:, None]
                - lines.rho[:, None])                      # (L, N)
    nearest = jnp.argmin(d, axis=0)                        # (N,)
    lidx = jnp.arange(d.shape[0])
    ok = (d <= tol) & (nearest[None, :] == lidx[:, None]) \
        & (weights > 0)[None, :]
    score = jnp.where(ok, weights[None, :], -1.0)
    top, ti = jax.lax.top_k(score, points_per_line)        # (L, P)
    return ti, top > 0


def calibrate_from_image(image, num_lines: int = 8, tol: float = 4.0,
                         num_points: int = 4096, points_per_line: int = 512,
                         rounds: int = 3, num_iterations: int = 30,
                         param_mask=None,
                         model: str = "rational") -> "ImageCalibration":
    """Grayscale image of straight edges -> fitted distortion coefficients.

    Alternates line extraction and model fitting: each round undistorts the
    edge points with the current coefficients, finds lines by Hough + nearest
    assignment in the *undistorted* frame (where true world lines are
    straight, so strongly-curved edges still collect into one bin), then
    refits the coefficients against the original distorted coordinates.
    Round 1 (identity coefficients) is the classic single-shot estimate.

    model: "rational" (the reference's production model), "brown" (the
    even-power candidate from notes/de_warping.md), or "auto" — fit both
    and keep whichever leaves the lines straighter (lower final cost).
    """
    if model == "auto":
        best = None
        for m in ("rational", "brown"):
            r = calibrate_from_image(image, num_lines=num_lines, tol=tol,
                                     num_points=num_points,
                                     points_per_line=points_per_line,
                                     rounds=rounds,
                                     num_iterations=num_iterations,
                                     param_mask=param_mask, model=m)
            if best is None or float(r.cost) < float(best.cost):
                best = r
        return best

    undist = undistort_points if model == "rational" \
        else undistort_points_brown
    image = jnp.asarray(image)
    h, w = image.shape
    center = jnp.array([h / 2.0, w / 2.0], jnp.float32)
    extent = float(jnp.sqrt((h / 2.0) ** 2 + (w / 2.0) ** 2))
    pts, val = extract_edge_points(image, num_points=num_points)

    coeffs = jnp.zeros((5,), jnp.float32)
    result = None
    for _ in range(max(1, rounds)):
        und = undist(pts, coeffs, center)
        lines = hough_from_points(und, val, center, extent,
                                  num_lines=num_lines)
        ti, mask = assign_points_to_lines(und, val, lines, center, tol=tol,
                                          points_per_line=points_per_line)
        grouped = pts[ti]                                  # distorted coords
        result = calibrate_distortion(grouped, mask, center,
                                      init_coeffs=coeffs,
                                      num_iterations=num_iterations,
                                      param_mask=param_mask, model=model)
        coeffs = result.coeffs
    return ImageCalibration(result.coeffs, result.cost,
                            result.initial_cost, model)
