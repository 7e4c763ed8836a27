"""Trajectory evaluation: Umeyama alignment + ATE.

The reference provides no metric tooling; BASELINE.json's north-star metric
is ATE on the 15pt_star_camera_pan sequence, so the harness lives here.
"""
from __future__ import annotations

import jax.numpy as jnp


def align_umeyama(est: jnp.ndarray, gt: jnp.ndarray, with_scale: bool = True):
    """Similarity transform (s, R, t) minimizing ||gt - (s R est + t)||.

    est, gt: (N, 3) corresponding positions.
    """
    mu_e = est.mean(axis=0)
    mu_g = gt.mean(axis=0)
    ec = est - mu_e
    gc = gt - mu_g
    cov = gc.T @ ec / est.shape[0]
    u, d, vt = jnp.linalg.svd(cov)
    s_fix = jnp.where(jnp.linalg.det(u) * jnp.linalg.det(vt) < 0,
                      jnp.array([1.0, 1.0, -1.0]), jnp.ones(3))
    r = (u * s_fix[None, :]) @ vt
    if with_scale:
        var_e = jnp.mean(jnp.sum(ec ** 2, axis=-1))
        s = jnp.sum(d * s_fix) / jnp.maximum(var_e, 1e-12)
    else:
        s = jnp.asarray(1.0)
    t = mu_g - s * (r @ mu_e)
    return s, r, t


def absolute_trajectory_error(est: jnp.ndarray, gt: jnp.ndarray,
                              with_scale: bool = True) -> jnp.ndarray:
    """RMSE of aligned camera positions (the standard monocular ATE)."""
    s, r, t = align_umeyama(est, gt, with_scale)
    aligned = est @ (s * r).T + t
    return jnp.sqrt(jnp.mean(jnp.sum((aligned - gt) ** 2, axis=-1)))
