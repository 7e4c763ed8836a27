"""Two-view geometry tests against exact synthetic ground truth."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from photogrammetry_tpu.core.camera import to_homogeneous
from photogrammetry_tpu.core.lie import so3_exp, so3_log, se3_exp, se3_log
from photogrammetry_tpu.sfm.epipolar import (
    normalization_transform, eight_point_fundamental, epipolar_residuals,
    ransac_fundamental, essential_from_fundamental, decompose_essential,
)
from photogrammetry_tpu.sfm.triangulate import triangulate_dlt, select_pose
from photogrammetry_tpu.sfm.two_view import two_view_pipeline
from photogrammetry_tpu.sfm.metrics import align_umeyama, absolute_trajectory_error
from photogrammetry_tpu.synth.star_scene import (
    StarSceneConfig, star_points_3d, pan_trajectory, intrinsics, project_scene,
)


def make_pair(noise=0.0, n_extra=40, seed=0):
    """Synthetic correspondence set between frames 0 and 6 of the pan."""
    cfg = StarSceneConfig()
    rng = np.random.default_rng(seed)
    pts = star_points_3d(cfg)
    extra = rng.uniform([-1, -1, 4.5], [1, 1, 8.0], (n_extra, 3))
    pts = np.concatenate([pts, extra])
    rs, ts, centers = pan_trajectory(cfg)
    k = intrinsics(cfg)
    i, j = 0, 6
    xy1 = project_scene(pts, rs[i], ts[i], k)
    xy2 = project_scene(pts, rs[j], ts[j], k)
    xy1 += rng.normal(0, noise, xy1.shape)
    xy2 += rng.normal(0, noise, xy2.shape)
    # relative pose cam1 -> cam2: R_rel = R2 R1^T, t_rel = t2 - R_rel t1
    r_rel = rs[j] @ rs[i].T
    t_rel = ts[j] - r_rel @ ts[i]
    return (xy1.astype(np.float32), xy2.astype(np.float32), k.astype(np.float32),
            r_rel, t_rel, pts, rs, ts, centers)


# ----------------------------------------------------------------- lie
def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(11)
    w = rng.normal(0, 0.8, (16, 3)).astype(np.float32)
    r = so3_exp(jnp.asarray(w))
    w2 = np.asarray(so3_log(r))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_so3_exp_orthonormal():
    r = np.asarray(so3_exp(jnp.array([0.1, -0.4, 0.7])))
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-5)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(12)
    xi = rng.normal(0, 0.5, (8, 6)).astype(np.float32)
    r, t = se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(se3_log(r, t))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


# ----------------------------------------------------------- eight-point
def test_normalization_transform():
    xy = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
    t = np.asarray(normalization_transform(jnp.asarray(xy),
                                           jnp.ones(4, bool)))
    h = np.asarray(to_homogeneous(jnp.asarray(xy))) @ t.T
    np.testing.assert_allclose(h[:, :2].mean(0), 0, atol=1e-5)
    msd = (h[:, :2] ** 2).sum(-1).mean()
    assert msd == pytest.approx(2.0, abs=1e-4)


def test_eight_point_noiseless():
    xy1, xy2, k, r_rel, t_rel, *_ = make_pair()
    f = eight_point_fundamental(jnp.asarray(xy1), jnp.asarray(xy2))
    res = np.asarray(epipolar_residuals(f, xy1, xy2, kind="sampson"))
    assert np.abs(res).max() < 1e-2  # sub-pixel epipolar consistency
    # F must be rank 2
    s = np.linalg.svd(np.asarray(f), compute_uv=False)
    assert s[2] < 1e-6


def test_ransac_rejects_outliers():
    xy1, xy2, k, *_ = make_pair(noise=0.2)
    rng = np.random.default_rng(13)
    n_out = 20
    xy1_out = rng.uniform(0, 600, (n_out, 2)).astype(np.float32)
    xy2_out = rng.uniform(0, 600, (n_out, 2)).astype(np.float32)
    a1 = np.concatenate([xy1, xy1_out])
    a2 = np.concatenate([xy2, xy2_out])
    mask = np.ones(len(a1), bool)
    res = ransac_fundamental(jax.random.PRNGKey(0), a1, a2, mask,
                             threshold=1.5, num_samples=500)
    inl = np.asarray(res.inliers)
    assert inl[:len(xy1)].mean() > 0.95      # true matches kept
    assert inl[len(xy1):].mean() < 0.25      # random outliers dropped


def test_ransac_respects_mask():
    xy1, xy2, k, *_ = make_pair()
    mask = np.zeros(len(xy1), bool)
    mask[:40] = True
    res = ransac_fundamental(jax.random.PRNGKey(1), xy1, xy2, mask,
                             threshold=1.0, num_samples=100)
    assert not np.asarray(res.inliers)[~mask].any()


# ------------------------------------------------- essential / pose / DLT
def test_two_view_pose_recovery():
    xy1, xy2, k, r_rel, t_rel, pts, rs, ts, _ = make_pair()
    mask = np.ones(len(xy1), bool)
    out = two_view_pipeline(jax.random.PRNGKey(2), xy1, xy2, mask, k,
                            threshold=1.0, num_samples=500)
    r = np.asarray(out.r)
    t = np.asarray(out.t)
    np.testing.assert_allclose(r, r_rel, atol=2e-3)
    t_gt = t_rel / np.linalg.norm(t_rel)
    np.testing.assert_allclose(t, t_gt, atol=5e-3)
    # structure: triangulated points (expressed in the camera-1 frame) match
    # ground truth up to the monocular scale ||t_rel||
    p = np.asarray(out.points)
    scale = np.linalg.norm(t_rel)  # our t is unit norm; gt scale factor
    pts_cam1 = pts @ rs[0].T + ts[0]
    np.testing.assert_allclose(p * scale, pts_cam1, atol=0.05)


def test_triangulation_exact():
    xy1, xy2, k, r_rel, t_rel, pts, rs, ts, _ = make_pair()
    pts_est, z2 = triangulate_dlt(jnp.asarray(xy1), jnp.asarray(xy2),
                                  jnp.asarray(r_rel, dtype=jnp.float32),
                                  jnp.asarray(t_rel, dtype=jnp.float32),
                                  k, k)
    pts_cam1 = pts @ rs[0].T + ts[0]  # triangulation lives in cam-1 frame
    np.testing.assert_allclose(np.asarray(pts_est), pts_cam1, atol=1e-2)
    assert (np.asarray(z2) > 0).all()


def test_cheirality_selects_correct_candidate():
    xy1, xy2, k, r_rel, t_rel, *_ = make_pair()
    f = eight_point_fundamental(jnp.asarray(xy1), jnp.asarray(xy2))
    e = essential_from_fundamental(f, k, k)
    rs, ts = decompose_essential(e)
    mask = jnp.ones(len(xy1), bool)
    r, t, p, counts, best = select_pose(xy1, xy2, rs, ts, k, k, mask)
    counts = np.asarray(counts)
    assert counts[int(best)] == len(xy1)          # all points in front
    assert (np.sort(counts)[:-1] < len(xy1)).all()  # other candidates lose


# ----------------------------------------------------------------- metrics
def test_umeyama_alignment():
    rng = np.random.default_rng(14)
    pts = rng.normal(0, 1, (30, 3)).astype(np.float32)
    r_gt = np.asarray(so3_exp(jnp.array([0.2, -0.1, 0.4])))
    transformed = 1.7 * pts @ r_gt.T + np.array([3.0, -1.0, 2.0], np.float32)
    s, r, t = align_umeyama(jnp.asarray(pts), jnp.asarray(transformed))
    assert float(s) == pytest.approx(1.7, abs=1e-3)
    ate = float(absolute_trajectory_error(jnp.asarray(pts),
                                          jnp.asarray(transformed)))
    assert ate < 1e-3


def test_ply_roundtrip(tmp_path):
    from photogrammetry_tpu.io.ply import write_ply, read_ply
    pts = np.random.default_rng(15).normal(0, 1, (10, 3)).astype(np.float32)
    p = tmp_path / "cloud.ply"
    write_ply(str(p), pts)
    back = read_ply(str(p))
    np.testing.assert_allclose(back, pts, rtol=1e-5)
    head = p.read_text().splitlines()
    assert head[0] == "ply" and "element vertex 10" in head[2]
