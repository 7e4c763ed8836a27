"""RANSAC DLT-PnP absolute pose + multi-view DLT triangulation."""
import jax
import jax.numpy as jnp
import numpy as np

from photogrammetry_tpu.core.lie import so3_exp
from photogrammetry_tpu.sfm.pnp import dlt_pnp, pnp_reprojection_errors, ransac_pnp
from photogrammetry_tpu.sfm.triangulate import triangulate_nview

K = jnp.array([[800.0, 0.0, 320.0],
               [0.0, 800.0, 240.0],
               [0.0, 0.0, 1.0]], jnp.float32)


def synth_view(seed=0, n=64, rvec=(0.1, -0.2, 0.05), tvec=(0.3, -0.1, 0.2)):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    pts[:, 2] += 6.0
    r = np.asarray(so3_exp(jnp.asarray(rvec, jnp.float32)))
    t = np.asarray(tvec, np.float32)
    pc = pts @ r.T + t
    xy = np.stack([800 * pc[:, 0] / pc[:, 2] + 320,
                   800 * pc[:, 1] / pc[:, 2] + 240], axis=-1)
    return jnp.asarray(pts), jnp.asarray(xy), jnp.asarray(r), jnp.asarray(t)


def rot_err_deg(a, b):
    cos = (np.trace(np.asarray(a) @ np.asarray(b).T) - 1) / 2
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


def test_dlt_pnp_exact_on_clean_data():
    pts, xy, r_gt, t_gt = synth_view()
    xn = jnp.stack([(xy[:, 0] - 320) / 800, (xy[:, 1] - 240) / 800], axis=-1)
    r, t = dlt_pnp(pts, xn)
    assert rot_err_deg(r, r_gt) < 0.1            # f32 eigh precision
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=5e-3)


def test_ransac_pnp_rejects_outliers():
    pts, xy, r_gt, t_gt = synth_view(n=96)
    xy = np.asarray(xy).copy()
    rng = np.random.default_rng(1)
    bad = rng.choice(96, 30, replace=False)        # ~1/3 gross outliers
    xy[bad] += rng.uniform(40, 200, (30, 2)) * rng.choice([-1, 1], (30, 2))
    mask = jnp.ones((96,), bool)
    res = ransac_pnp(jax.random.PRNGKey(0), pts, jnp.asarray(xy), mask, K,
                     threshold=2.0, num_samples=256)
    assert int(res.num_inliers) >= 60
    assert rot_err_deg(res.r, r_gt) < 0.1
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_gt), atol=0.01)
    # the corrupted rows must be excluded
    assert not np.asarray(res.inliers)[bad].any()


def test_ransac_pnp_respects_mask():
    pts, xy, r_gt, t_gt = synth_view(n=64)
    # poison masked-out rows completely; they must not affect the result
    xy = np.asarray(xy).copy()
    xy[:16] = 1e5
    mask = jnp.arange(64) >= 16
    res = ransac_pnp(jax.random.PRNGKey(0), pts, jnp.asarray(xy), mask, K,
                     threshold=2.0, num_samples=128)
    assert rot_err_deg(res.r, r_gt) < 0.1
    assert not np.asarray(res.inliers)[:16].any()


def test_triangulate_nview_exact():
    rng = np.random.default_rng(2)
    f, tcap = 5, 32
    pts_gt = rng.uniform(-2, 2, (tcap, 3)).astype(np.float32)
    pts_gt[:, 2] += 8.0
    rs, ts = [], []
    for i in range(f):
        r = np.asarray(so3_exp(jnp.asarray([0.02 * i, 0.1 * i, 0.0],
                                           jnp.float32)))
        t = np.asarray([0.5 * i, 0.05 * i, 0.0], np.float32)
        rs.append(r)
        ts.append(t)
    rs = jnp.asarray(np.stack(rs))
    ts = jnp.asarray(np.stack(ts))
    pc = jnp.einsum("fij,tj->fti", rs, jnp.asarray(pts_gt)) + ts[:, None, :]
    obs = jnp.stack([800 * pc[..., 0] / pc[..., 2] + 320,
                     800 * pc[..., 1] / pc[..., 2] + 240], axis=-1)
    # drop a third of the observations; every track keeps >= 2 views
    mask = jnp.asarray(rng.uniform(size=(f, tcap)) > 0.33)
    mask = mask.at[:2].set(True)
    pts, depths = triangulate_nview(obs, mask, rs, ts, K)
    np.testing.assert_allclose(np.asarray(pts), pts_gt, atol=1e-2)
    # depths of observing views must match the projection depths
    np.testing.assert_allclose(np.asarray(depths)[np.asarray(mask)],
                               np.asarray(pc[..., 2])[np.asarray(mask)],
                               rtol=1e-2)


def test_nview_beats_or_matches_two_view_under_noise():
    rng = np.random.default_rng(3)
    f, tcap = 6, 64
    pts_gt = rng.uniform(-2, 2, (tcap, 3)).astype(np.float32)
    pts_gt[:, 2] += 8.0
    rs = jnp.asarray(np.stack([np.asarray(so3_exp(jnp.asarray(
        [0.0, 0.08 * i, 0.0], jnp.float32))) for i in range(f)]))
    ts = jnp.asarray(np.stack([[0.4 * i, 0.0, 0.0] for i in range(f)],
                              dtype=np.float32))
    pc = jnp.einsum("fij,tj->fti", rs, jnp.asarray(pts_gt)) + ts[:, None, :]
    obs = jnp.stack([800 * pc[..., 0] / pc[..., 2] + 320,
                     800 * pc[..., 1] / pc[..., 2] + 240], axis=-1)
    obs = obs + jnp.asarray(rng.normal(0, 0.5, obs.shape), jnp.float32)
    mask = jnp.ones((f, tcap), bool)
    pts_n, _ = triangulate_nview(obs, mask, rs, ts, K)
    err_n = np.linalg.norm(np.asarray(pts_n) - pts_gt, axis=1).mean()
    # two-view (first/last) baseline via the same routine restricted to 2 rows
    mask2 = jnp.zeros((f, tcap), bool).at[0].set(True).at[f - 1].set(True)
    pts_2, _ = triangulate_nview(obs, mask2, rs, ts, K)
    err_2 = np.linalg.norm(np.asarray(pts_2) - pts_gt, axis=1).mean()
    assert err_n <= err_2 * 1.05, (err_n, err_2)
