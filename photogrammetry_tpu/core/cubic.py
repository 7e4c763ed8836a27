"""Vectorized closed-form real-root solver for monic cubics.

The reference solves one cubic per unique pixel radius with iterative
root-finders (np.roots via companion-matrix eig, warping.py:122; MathNet
Cubic.RealRoots, DeWarp.cs:76) behind a memo dict — inherently sequential.
On TPU we instead solve *every* pixel's cubic in closed form on the VPU:
trigonometric method for the three-real-root case, Cardano for the
one-real-root case, all branches evaluated elementwise and selected with
``where`` (no data-dependent control flow).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-30


@jax.jit
def solve_cubic_real(b, c, d):
    """Real roots of r^3 + b r^2 + c r + d = 0, elementwise over broadcast args.

    Returns (roots (..., 3) float32, num_real (...,) int32).  When only one
    real root exists it is replicated across all three slots.  Roots are not
    sorted; use ``middle_real_root`` for the reference's selection rule.
    """
    b = jnp.asarray(b, jnp.float64) if jax.config.jax_enable_x64 else jnp.asarray(b, jnp.float32)
    c = jnp.asarray(c, b.dtype)
    d = jnp.asarray(d, b.dtype)

    # Depressed cubic t^3 + p t + q with r = t - b/3.
    p = c - b * b / 3.0
    q = 2.0 * b ** 3 / 27.0 - b * c / 3.0 + d
    shift = -b / 3.0

    disc = -4.0 * p ** 3 - 27.0 * q * q  # > 0 => three distinct real roots

    # --- three-real-roots branch (p < 0 guaranteed when disc > 0) ---
    p_neg = jnp.minimum(p, -_EPS)
    m = 2.0 * jnp.sqrt(-p_neg / 3.0)
    acos_arg = jnp.clip(3.0 * q / (p_neg * m), -1.0, 1.0)
    theta = jnp.arccos(acos_arg) / 3.0
    k = jnp.arange(3, dtype=b.dtype)
    t_trig = m[..., None] * jnp.cos(theta[..., None] - 2.0 * jnp.pi * k / 3.0)

    # --- one-real-root branch (Cardano) ---
    sq = jnp.sqrt(jnp.maximum(q * q / 4.0 + p ** 3 / 27.0, 0.0))
    u = jnp.cbrt(-q / 2.0 + sq)
    v = jnp.cbrt(-q / 2.0 - sq)
    t_card = u + v

    three = disc > 0
    roots = jnp.where(three[..., None], t_trig,
                      t_card[..., None] * jnp.ones_like(t_trig)) + shift[..., None]
    num_real = jnp.where(three, 3, 1).astype(jnp.int32)
    return roots.astype(jnp.float32), num_real


@jax.jit
def middle_real_root(b, c, d):
    """The reference's root-selection rule (warping.py:127-130, DeWarp.cs:78-82):
    middle root when three real roots exist, else the single real root."""
    roots, num_real = solve_cubic_real(b, c, d)
    lo = jnp.min(roots, axis=-1)
    hi = jnp.max(roots, axis=-1)
    mid = jnp.sum(roots, axis=-1) - lo - hi
    return jnp.where(num_real == 3, mid, roots[..., 0])
