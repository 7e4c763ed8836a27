"""Homography estimation / decomposition / H-vs-F model arbitration.

The planar two-view configuration (the geometry of the reference's own
Blender ground-truth asset) leaves F under-determined; these tests pin the
H model pipeline that handles it.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from photogrammetry_tpu.sfm.homography import (
    decompose_homography,
    dlt_homography,
    homography_residuals,
    ransac_homography,
)
from photogrammetry_tpu.sfm.two_view import two_view_pipeline

K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])


def _apply_h(h, xy):
    p = np.concatenate([xy, np.ones((len(xy), 1))], axis=1) @ np.asarray(h).T
    return p[:, :2] / p[:, 2:3]


def _planar_pair(n=80, noise=0.0, seed=0, r=None, t=None, d=4.0,
                 normal=(0.0, 0.0, 1.0)):
    """Synthetic plane n^T X = d in cam-1 frame viewed by two cameras."""
    rng = np.random.default_rng(seed)
    k = np.asarray(K)
    if r is None:
        aa = np.array([0.03, -0.05, 0.02])
        r = _rodrigues(aa)
    if t is None:
        t = np.array([0.4, -0.1, 0.15])
    nvec = np.asarray(normal) / np.linalg.norm(normal)
    # points on the plane
    xy = rng.uniform(-1.5, 1.5, (n, 2))
    z = (d - xy @ nvec[:2]) / nvec[2]
    pts1 = np.concatenate([xy, z[:, None]], axis=1)  # cam-1 coords
    pts2 = pts1 @ r.T + t
    uv1 = (pts1 @ k.T)
    uv1 = uv1[:, :2] / uv1[:, 2:3]
    uv2 = (pts2 @ k.T)
    uv2 = uv2[:, :2] / uv2[:, 2:3]
    uv1 += rng.normal(0, noise, uv1.shape)
    uv2 += rng.normal(0, noise, uv2.shape)
    h_true = k @ (r + np.outer(t, nvec) / d) @ np.linalg.inv(k)
    return uv1, uv2, r, t, nvec, h_true


def _rodrigues(aa):
    th = np.linalg.norm(aa)
    if th < 1e-12:
        return np.eye(3)
    k = aa / th
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * kx + (1 - np.cos(th)) * kx @ kx


def test_dlt_recovers_exact_homography():
    uv1, uv2, _, _, _, h_true = _planar_pair()
    h = np.asarray(dlt_homography(jnp.asarray(uv1, jnp.float32),
                                  jnp.asarray(uv2, jnp.float32)))
    h_true = h_true / np.linalg.norm(h_true)
    h = h / np.linalg.norm(h) * np.sign(h[2, 2]) * np.sign(h_true[2, 2])
    assert np.allclose(h, h_true, atol=2e-4)
    res = homography_residuals(jnp.asarray(h, jnp.float32),
                               jnp.asarray(uv1, jnp.float32),
                               jnp.asarray(uv2, jnp.float32))
    assert float(jnp.max(res)) < 0.1


def test_ransac_homography_rejects_outliers():
    uv1, uv2, *_ = _planar_pair(n=100, noise=0.3)
    rng = np.random.default_rng(3)
    bad = rng.uniform(0, 480, (30, 2))
    xy1 = jnp.asarray(np.concatenate([uv1, bad]), jnp.float32)
    xy2 = jnp.asarray(np.concatenate([uv2, bad[::-1]]), jnp.float32)
    mask = jnp.ones((130,), bool)
    res = ransac_homography(jax.random.PRNGKey(0), xy1, xy2, mask, 2.0)
    inl = np.asarray(res.inliers)
    assert inl[:100].mean() > 0.9   # keeps the planar matches
    assert inl[100:].mean() < 0.2   # drops the scrambled ones


def test_decompose_homography_recovers_pose():
    uv1, uv2, r, t, nvec, h_true = _planar_pair()
    rs, ts, ns = decompose_homography(jnp.asarray(h_true, jnp.float32),
                                      K, K)
    t_dir = t / np.linalg.norm(t)
    errs_r = [np.linalg.norm(np.asarray(rc) - r) for rc in rs]
    errs_t = [min(np.linalg.norm(np.asarray(tc) - t_dir),
                  np.linalg.norm(np.asarray(tc) + t_dir)) for tc in ts]
    i = int(np.argmin(errs_r))
    assert errs_r[i] < 1e-3
    assert errs_t[i] < 1e-3
    # and the recovered plane normal matches for that candidate
    assert min(np.linalg.norm(np.asarray(ns[i]) - nvec),
               np.linalg.norm(np.asarray(ns[i]) + nvec)) < 1e-3


def test_two_view_auto_picks_h_on_planar_scene():
    """On an exactly planar scene the auto pipeline must arbitrate to the
    homography and still recover the true pose (F alone is a 2-parameter
    family here)."""
    uv1, uv2, r, t, *_ = _planar_pair(n=120, noise=0.2, seed=5)
    out = two_view_pipeline(jax.random.PRNGKey(0),
                            jnp.asarray(uv1, jnp.float32),
                            jnp.asarray(uv2, jnp.float32),
                            jnp.ones((120,), bool), K,
                            threshold=2.0, num_samples=500)
    assert bool(out.used_homography)
    # two_view maps xy1->xy2 with (R, t); compare rotation angle error
    r_est = np.asarray(out.r)
    ang = np.degrees(np.arccos(np.clip((np.trace(r_est.T @ r) - 1) / 2,
                                       -1, 1)))
    assert ang < 1.0
    t_dir = t / np.linalg.norm(t)
    t_est = np.asarray(out.t)
    assert min(np.linalg.norm(t_est - t_dir),
               np.linalg.norm(t_est + t_dir)) < 0.05


def test_two_view_auto_keeps_f_on_general_scene():
    rng = np.random.default_rng(2)
    pts = rng.uniform([-2, -2, 4], [2, 2, 9], (150, 3))
    r = _rodrigues(np.array([0.02, -0.06, 0.01]))
    t = np.array([0.5, 0.1, -0.1])
    k = np.asarray(K)
    uv1 = pts @ k.T
    uv1 = uv1[:, :2] / uv1[:, 2:3]
    p2 = pts @ r.T + t
    uv2 = p2 @ k.T
    uv2 = uv2[:, :2] / uv2[:, 2:3]
    out = two_view_pipeline(jax.random.PRNGKey(1),
                            jnp.asarray(uv1, jnp.float32),
                            jnp.asarray(uv2, jnp.float32),
                            jnp.ones((150,), bool), K,
                            threshold=1.0, num_samples=500)
    assert not bool(out.used_homography)
