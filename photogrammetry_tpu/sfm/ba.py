"""Bundle adjustment: Levenberg-Marquardt with a Schur-complement reduced
camera system, fully batched for the MXU.

The reference has no BA (SURVEY.md §0: "no bundle adjustment"); this is the
north-star component of BASELINE.json.  Design notes:

  * Observations are carried as a dense (F frames, T tracks) grid with a
    validity mask — the framework's static-shape convention.  Residuals and
    the analytic Jacobians J_cam (F,T,2,6) / J_pt (F,T,2,3) are one fused
    elementwise computation over the grid (VPU), and every contraction that
    assembles the normal equations is an einsum (MXU).
  * The structure of H is exploited exactly as in classic sparse BA: H_pp is
    (T,3,3) block-diagonal and inverted in closed form; the reduced camera
    system S = H_cc - W H_pp^-1 W^T is a dense (6F, 6F) matrix assembled
    with einsums and solved with Cholesky.  For window sizes used in
    incremental SLAM (F <= ~50) the dense reduced system is the
    MXU-optimal layout.
  * Pose increments are left-multiplicative SE(3) twists; camera 0 is frozen
    for gauge fixing (monocular scale gauge is handled by LM damping and by
    similarity alignment in evaluation).
  * Robustness: Huber IRLS weights folded into r and J.

The same residual core serves full BA, motion-only BA (landmarks frozen) and
structure-only refinement (poses frozen) via update masks.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from photogrammetry_tpu.core.lie import se3_exp, so3_hat


class BAProblem(NamedTuple):
    obs: jnp.ndarray       # (F, T, 2) observed pixel (x, y)
    mask: jnp.ndarray      # (F, T) bool
    k: jnp.ndarray         # (3, 3) intrinsics


class BAState(NamedTuple):
    rs: jnp.ndarray        # (F, 3, 3) world->cam rotations
    ts: jnp.ndarray        # (F, 3) world->cam translations
    points: jnp.ndarray    # (T, 3) landmarks (world)


def project(rs, ts, points, k):
    """(F,3,3),(F,3),(T,3) → pixel (F,T,2) and depth (F,T)."""
    pc = jnp.einsum("fij,tj->fti", rs, points) + ts[:, None, :]
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    x = k[0, 0] * pc[..., 0] / zs + k[0, 2]
    y = k[1, 1] * pc[..., 1] / zs + k[1, 2]
    return jnp.stack([x, y], axis=-1), z, pc


def residuals_and_jacobians(state: BAState, prob: BAProblem,
                            huber_delta: float = 3.0):
    """Weighted residuals r (F,T,2), J_cam (F,T,2,6), J_pt (F,T,2,3), and the
    robust cost.  Invalid/behind-camera observations are zero-weighted."""
    rs, ts, points = state
    pred, z, pc = project(rs, ts, points, prob.k)
    r = pred - prob.obs
    valid = prob.mask & (z > 1e-6)
    w = valid.astype(jnp.float32)

    # Huber IRLS weight on the 2-norm of each residual pair.
    rn = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
    hw = jnp.minimum(1.0, huber_delta / rn)
    w = w * hw
    sw = jnp.sqrt(w)

    fx = prob.k[0, 0]
    fy = prob.k[1, 1]
    zinv = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    # dpi/dp: (F,T,2,3)
    zeros = jnp.zeros_like(z)
    dpi = jnp.stack([
        jnp.stack([fx * zinv, zeros, -fx * pc[..., 0] * zinv ** 2], -1),
        jnp.stack([zeros, fy * zinv, -fy * pc[..., 1] * zinv ** 2], -1),
    ], -2)

    # dp/d(delta_w) = -[p]x ; dp/d(delta_v) = I  (left increment)
    neg_phat = -so3_hat(pc)                      # (F,T,3,3)
    j_cam_w = jnp.einsum("ftij,ftjk->ftik", dpi, neg_phat)  # (F,T,2,3)
    j_cam = jnp.concatenate([j_cam_w, dpi], axis=-1)        # (F,T,2,6)
    j_pt = jnp.einsum("ftij,fjk->ftik", dpi, rs)            # (F,T,2,3)

    r = r * sw[..., None]
    j_cam = j_cam * sw[..., None, None]
    j_pt = j_pt * sw[..., None, None]

    # robust (Huber) cost over valid observations.  Validity (in front of
    # the camera) is state-dependent, so the raw cost alone is gameable: a
    # diverged step that throws the whole map behind the cameras zeroes it.
    # The LM loop therefore also receives the valid-observation count and
    # rejects steps that collapse support (see bundle_adjust.body).
    quad = 0.5 * rn ** 2
    lin = huber_delta * (rn - 0.5 * huber_delta)
    cost = jnp.sum(jnp.where(rn <= huber_delta, quad, lin)
                   * valid.astype(jnp.float32))
    num_valid = jnp.sum(valid)
    return r, j_cam, j_pt, cost, num_valid


def _inv3(m):
    """Batched closed-form 3x3 inverse (…,3,3)."""
    a = m[..., 0, 0]; b = m[..., 0, 1]; c = m[..., 0, 2]
    d = m[..., 1, 0]; e = m[..., 1, 1]; f = m[..., 1, 2]
    g = m[..., 2, 0]; h = m[..., 2, 1]; i = m[..., 2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack([
        jnp.stack([co_a, -(b * i - c * h), b * f - c * e], -1),
        jnp.stack([co_b, a * i - c * g, -(a * f - c * d)], -1),
        jnp.stack([co_c, -(a * h - b * g), a * e - b * d], -1),
    ], -2)
    return adj / det[..., None, None]


def schur_solve(r, j_cam, j_pt, lam, fixed_cameras,
                use_pallas: bool = False,
                h_prior=None, b_prior=None):
    """One damped Gauss-Newton step via the Schur complement.

    Args:
      r: (F,T,2) weighted residuals; j_cam (F,T,2,6); j_pt (F,T,2,3).
      lam: LM damping scalar.
      fixed_cameras: (F,) float — 0 freezes a camera's update (gauge).
      use_pallas: assemble (s_off, rhs correction) with the fused
        single-pass kernels.schur.schur_products_pallas instead of two
        einsums (opt-in; see CLAUDE.md on the axon AOT compiler).
    Returns (delta_cam (F,6), delta_pt (T,3)).
    """
    f, t = r.shape[:2]
    # Normal-equation blocks (all einsums -> MXU):
    h_cc = jnp.einsum("ftri,ftrj->fij", j_cam, j_cam)          # (F,6,6)
    h_pp = jnp.einsum("ftri,ftrj->tij", j_pt, j_pt)            # (T,3,3)
    w_cp = jnp.einsum("ftri,ftrj->ftij", j_cam, j_pt)          # (F,T,6,3)
    b_c = -jnp.einsum("ftri,ftr->fi", j_cam, r)                # (F,6)
    b_p = -jnp.einsum("ftri,ftr->ti", j_pt, r)                 # (T,3)

    # Pose-prior (trajectory anchor) contribution: Tikhonov block w^2 I on
    # the camera diagonal plus its right-hand side (bundle_adjust's
    # pose_prior option).
    if h_prior is not None:
        h_cc = h_cc + h_prior[:, None, None] * jnp.eye(6)
        b_c = b_c + b_prior

    # LM damping (multiplicative on the diagonal).
    eye6 = jnp.eye(6)
    eye3 = jnp.eye(3)
    h_cc = h_cc + lam * (h_cc * eye6) + 1e-8 * eye6
    h_pp = h_pp + lam * (h_pp * eye3) + 1e-8 * eye3

    hpp_inv = _inv3(h_pp)                                       # (T,3,3)

    # Reduced camera system S = H_cc δ - W Hpp^-1 W^T  (dense (6F,6F)).
    w_hinv = jnp.einsum("ftij,tjk->ftik", w_cp, hpp_inv)        # (F,T,6,3)
    if use_pallas:
        from photogrammetry_tpu.kernels.schur import schur_products_pallas
        s_off, corr = schur_products_pallas(w_hinv, w_cp, b_p)
    else:
        s_off = jnp.einsum("ftik,gtjk->fgij", w_hinv, w_cp)     # (F,F,6,6)
        corr = jnp.einsum("ftik,tk->fi", w_hinv, b_p)           # (F,6)
    s = -s_off
    s = s.at[jnp.arange(f), jnp.arange(f)].add(h_cc)
    rhs = b_c - corr

    # Freeze gauge cameras: zero their rows/cols, identity diagonal.
    fc = fixed_cameras.astype(jnp.float32)
    s = s * (fc[:, None, None, None] * fc[None, :, None, None])
    s = s.at[jnp.arange(f), jnp.arange(f)].add(
        (1.0 - fc)[:, None, None] * jnp.eye(6))
    rhs = rhs * fc[:, None]

    s_mat = s.transpose(0, 2, 1, 3).reshape(6 * f, 6 * f)
    delta_c = jnp.linalg.solve(s_mat, rhs.reshape(-1)).reshape(f, 6)
    delta_c = delta_c * fc[:, None]

    # Back-substitute landmarks.
    rhs_p = b_p - jnp.einsum("ftij,fi->tj", w_cp, delta_c)
    delta_p = jnp.einsum("tij,tj->ti", hpp_inv, rhs_p)
    return delta_c, delta_p


def apply_step(state: BAState, delta_c, delta_p,
               update_points: bool = True) -> BAState:
    """Left-multiplicative pose update + landmark update."""
    dr, dt = se3_exp(delta_c)
    rs = jnp.einsum("fij,fjk->fik", dr, state.rs)
    ts = jnp.einsum("fij,fj->fi", dr, state.ts) + dt
    points = state.points + delta_p if update_points else state.points
    return BAState(rs=rs, ts=ts, points=points)


class BAResult(NamedTuple):
    state: BAState
    cost: jnp.ndarray
    initial_cost: jnp.ndarray
    iterations: jnp.ndarray


@partial(jax.jit, static_argnames=("num_iterations", "optimize_points",
                                   "use_pallas_schur", "use_pose_prior"))
def bundle_adjust(state: BAState, prob: BAProblem,
                  num_iterations: int = 20,
                  huber_delta: float = 3.0,
                  init_lambda: float = 1e-3,
                  fixed_cameras: jnp.ndarray | None = None,
                  optimize_points: bool = True,
                  use_pallas_schur: bool | None = None,
                  use_pose_prior: bool = False,
                  prior_rs: jnp.ndarray | None = None,
                  prior_ts: jnp.ndarray | None = None,
                  prior_weight: float = 0.0) -> BAResult:
    """Levenberg-Marquardt bundle adjustment (static iteration count).

    fixed_cameras: (F,) float mask; 0 freezes a camera.  Defaults to freezing
    camera 0 (gauge).  optimize_points=False gives motion-only BA.

    use_pose_prior=True adds a trajectory-anchor term
    w^2/2 (||log(R R_p^T)||^2 + ||t - t_p||^2) per camera toward
    (prior_rs, prior_ts): Gauss-Newton contributions w^2 I on the camera
    block and -w^2 v on the rhs, with the prior energy included in the
    LM accept test.  Used by the submap cross-seam global BA, where a
    pure-reprojection refinement of a long monocular arc drifts into
    bas-relief basins the pose graph had already excluded (measured on
    the 201-frame stress; sfm/submaps.py).

    use_pallas_schur: None = auto — OFF everywhere as of round 4: the
    earlier "Pallas wins at F <= 16, T <= 2048" rule came from the no-op-
    barrier dispatch-rate measurements (BENCH_FULL.md postmortem); under
    the forcing-read protocol the einsum path is equal or faster at every
    size tried (F8/T1024: 18.1 vs 18.5 ms per 30 LM iterations; F32/
    T4096: 203 vs 236 ms).  The kernel remains available and
    parity-tested for explicit opt-in.
    """
    from photogrammetry_tpu.core.lie import so3_log

    f = state.rs.shape[0]
    if use_pallas_schur is None:
        use_pallas_schur = False
    if fixed_cameras is None:
        fixed_cameras = jnp.ones((f,)).at[0].set(0.0)

    w2 = jnp.float32(prior_weight) ** 2

    def prior_terms(st):
        """(energy, b_prior (F,6)) of the pose-anchor residuals."""
        v_rot = jax.vmap(so3_log)(
            jnp.einsum("fij,fkj->fik", st.rs, prior_rs))
        v_t = st.ts - prior_ts
        e = 0.5 * w2 * (jnp.sum(v_rot ** 2) + jnp.sum(v_t ** 2))
        b = -w2 * jnp.concatenate([v_rot, v_t], axis=-1)
        return e, b

    _, _, _, cost0, nvalid0 = residuals_and_jacobians(state, prob,
                                                      huber_delta)
    if use_pose_prior:
        e0, _ = prior_terms(state)
        cost0 = cost0 + e0

    def body(carry, _):
        state, lam, cost, nvalid = carry
        r, j_cam, j_pt, _, _ = residuals_and_jacobians(state, prob,
                                                       huber_delta)
        if not optimize_points:
            j_pt = jnp.zeros_like(j_pt)
        if use_pose_prior:
            _, b_pr = prior_terms(state)
            h_pr = jnp.full((f,), w2)
        else:
            h_pr = b_pr = None
        delta_c, delta_p = schur_solve(r, j_cam, j_pt, lam, fixed_cameras,
                                       use_pallas=use_pallas_schur,
                                       h_prior=h_pr, b_prior=b_pr)
        cand = apply_step(state, delta_c, delta_p, optimize_points)
        _, _, _, new_cost, new_nvalid = residuals_and_jacobians(
            cand, prob, huber_delta)
        if use_pose_prior:
            e_c, _ = prior_terms(cand)
            new_cost = new_cost + e_c
        # Support guard: validity is state-dependent, so a diverged step
        # that throws observations behind the cameras lowers the cost for
        # free.  Reject any step losing >10% of the current support.
        support_ok = new_nvalid.astype(jnp.float32) >= \
            0.9 * nvalid.astype(jnp.float32)
        accept = (new_cost < cost) & jnp.isfinite(new_cost) & support_ok
        state = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), cand, state)
        cost = jnp.where(accept, new_cost, cost)
        nvalid = jnp.where(accept, new_nvalid, nvalid)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                        jnp.minimum(lam * 4.0, 1e6))
        return (state, lam, cost, nvalid), cost

    (state, _, cost, _), _ = lax.scan(
        body, (state, jnp.float32(init_lambda), cost0, nvalid0), None,
        length=num_iterations)
    return BAResult(state=state, cost=cost, initial_cost=cost0,
                    iterations=jnp.int32(num_iterations))
