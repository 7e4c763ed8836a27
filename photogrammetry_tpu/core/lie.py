"""SO(3)/SE(3) Lie group operations — pure jax.numpy, vmap/jit-safe.

The reference has no pose parameterization (its single two-view stage keeps
raw R, t from the essential decomposition, CameraPoseEstimation.cs:105-124).
Bundle adjustment and the pose-graph backend need manifold retractions; these
are the standard exp/log maps with Taylor fallbacks near theta = 0 expressed
with ``where`` so they are branch-free under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def so3_hat(w):
    """(…, 3) → (…, 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], -1),
        jnp.stack([wz, z, -wx], -1),
        jnp.stack([-wy, wx, z], -1),
    ], -2)


def so3_exp(w):
    """Axis-angle (…, 3) → rotation matrix (…, 3, 3) (Rodrigues)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS ** 2))
    small = theta2 < _EPS
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    k = so3_hat(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + a[..., None, None] * k + b[..., None, None] * (k @ k)


def so3_log(r):
    """Rotation matrix (…, 3, 3) → axis-angle (…, 3).

    Autodiff-safe at the identity: theta comes from atan2(|sin|, cos) (not
    arccos, whose derivative blows up at 1) and every sqrt/division sees a
    guarded argument so jacfwd/jacrev of downstream residuals stay finite —
    pose-graph edge Jacobians are taken through this function at
    near-identity error transforms (sfm/pose_graph.py).
    """
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    vee = jnp.stack([
        r[..., 2, 1] - r[..., 1, 2],
        r[..., 0, 2] - r[..., 2, 0],
        r[..., 1, 0] - r[..., 0, 1],
    ], -1)
    sin_sq = jnp.sum(vee * vee, axis=-1) / 4.0
    sin_t = jnp.sqrt(sin_sq + 1e-24)          # |sin theta|, safe gradient
    theta = jnp.arctan2(sin_t, cos_t)
    small = sin_sq < _EPS ** 2
    sin_safe = jnp.where(small, 1.0, sin_t)
    scale = jnp.where(small, 0.5 + theta * theta / 12.0,
                      theta / (2.0 * sin_safe))
    # Note: near theta == pi the vee-based formula degrades; BA/pose-graph
    # retractions keep increments small so that regime is not hit in practice.
    return scale[..., None] * vee


def se3_exp(xi):
    """Twist (…, 6) [w | v] → (R (…, 3, 3), t (…, 3))."""
    w, v = xi[..., :3], xi[..., 3:]
    r = so3_exp(w)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS ** 2))
    small = theta2 < _EPS
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2 * theta))
    k = so3_hat(w)
    eye = jnp.eye(3, dtype=xi.dtype)
    vmat = eye + a[..., None, None] * k + b[..., None, None] * (k @ k)
    t = jnp.einsum("...ij,...j->...i", vmat, v)
    return r, t


def se3_log(r, t):
    """(R, t) → twist (…, 6) [w | v].  Autodiff-safe at identity (see
    so3_log); the small-angle branch uses guarded denominators so the
    untaken branch never produces NaN under jacfwd (JAX where-grad rule)."""
    w = so3_log(r)
    theta2 = jnp.sum(w * w, axis=-1) + 1e-24
    theta = jnp.sqrt(theta2)
    small = theta2 < _EPS
    half = theta / 2.0
    sin_half = jnp.where(small, 1.0, jnp.sin(half))
    theta2_safe = jnp.where(small, 1.0, theta2)
    cot_term = jnp.where(
        small, 1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / sin_half) / theta2_safe)
    k = so3_hat(w)
    eye = jnp.eye(3, dtype=r.dtype)
    vinv = eye - 0.5 * k + cot_term[..., None, None] * (k @ k)
    v = jnp.einsum("...ij,...j->...i", vinv, t)
    return jnp.concatenate([w, v], axis=-1)
