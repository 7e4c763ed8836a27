"""Pose-graph optimization tests on synthetic trajectories."""
import numpy as np
import jax.numpy as jnp

from photogrammetry_tpu.core.lie import so3_exp
from photogrammetry_tpu.sfm.metrics import absolute_trajectory_error
from photogrammetry_tpu.sfm.pose_graph import (
    PoseGraph, optimize_pose_graph, relative_pose, _edge_residual,
)


def circle_trajectory(n=12, radius=2.0):
    """Ground-truth world→cam poses on a circle, camera yawing along it."""
    rs, ts = [], []
    for i in range(n):
        a = 2 * np.pi * i / n
        r = np.asarray(so3_exp(jnp.array([0.0, a, 0.0])))
        c = np.array([radius * np.sin(a), 0.0, radius * (1 - np.cos(a))])
        rs.append(r)
        ts.append(-r @ c)
    return np.stack(rs).astype(np.float32), np.stack(ts).astype(np.float32)


def build_graph(rs, ts, noise=0.0, loop=True, seed=0, closure_noise=None):
    rng = np.random.default_rng(seed)
    n = len(rs)
    edges, zr, zt, ww = [], [], [], []

    def add_edge(i, j, sigma, weight):
        r, t = relative_pose(rs[i], ts[i], rs[j], ts[j])
        if sigma:
            dr = np.asarray(so3_exp(jnp.asarray(
                rng.normal(0, sigma, 3), jnp.float32)))
            r = dr @ r
            t = t + rng.normal(0, sigma, 3)
        edges.append((i, j))
        zr.append(r)
        zt.append(t)
        ww.append(weight)

    for i in range(n - 1):
        add_edge(i, i + 1, noise, 1.0)
    if loop:
        sigma_c = noise / 10 if closure_noise is None else closure_noise
        add_edge(n - 1, 0, sigma_c, 10.0)
        add_edge(n // 2, 0, sigma_c, 10.0)

    return PoseGraph(edges=jnp.asarray(edges, jnp.int32),
                     z_rs=jnp.asarray(np.stack(zr), jnp.float32),
                     z_ts=jnp.asarray(np.stack(zt), jnp.float32),
                     weights=jnp.asarray(ww, jnp.float32))


def centers(rs, ts):
    return -np.einsum("fji,fj->fi", np.asarray(rs), np.asarray(ts))


def test_residual_zero_at_ground_truth():
    rs, ts = circle_trajectory()
    g = build_graph(rs, ts, noise=0.0)
    for e in range(len(g.edges)):
        i, j = np.asarray(g.edges[e])
        r = np.asarray(_edge_residual(rs[i], ts[i], rs[j], ts[j],
                                      np.asarray(g.z_rs[e]),
                                      np.asarray(g.z_ts[e])))
        assert np.abs(r).max() < 1e-5


def test_pose_graph_closes_loop():
    rs_gt, ts_gt = circle_trajectory(n=20)
    # noisy odometry + two near-exact high-weight loop closures
    g = build_graph(rs_gt, ts_gt, noise=0.05)

    # initialize by integrating the noisy chain (classic drifted odometry)
    n = len(rs_gt)
    rs0 = [rs_gt[0]]
    ts0 = [ts_gt[0]]
    for e in range(n - 1):
        zr = np.asarray(g.z_rs[e])
        zt = np.asarray(g.z_ts[e])
        rs0.append(zr @ rs0[-1])
        ts0.append(zr @ ts0[-1] + zt)
    rs0 = jnp.asarray(np.stack(rs0))
    ts0 = jnp.asarray(np.stack(ts0))

    drift_ate = float(absolute_trajectory_error(
        jnp.asarray(centers(rs0, ts0)), jnp.asarray(centers(rs_gt, ts_gt))))

    res = optimize_pose_graph(rs0, ts0, g, num_iterations=25)
    assert float(res.cost) < 0.1 * float(res.initial_cost)
    opt_ate = float(absolute_trajectory_error(
        jnp.asarray(centers(res.rs, res.ts)),
        jnp.asarray(centers(rs_gt, ts_gt))))
    # loop closure must substantially beat open-loop drift
    assert opt_ate < 0.5 * drift_ate, (opt_ate, drift_ate)


def test_gauge_node_fixed():
    rs_gt, ts_gt = circle_trajectory(n=6)
    g = build_graph(rs_gt, ts_gt, noise=0.05)
    res = optimize_pose_graph(jnp.asarray(rs_gt), jnp.asarray(ts_gt), g,
                              num_iterations=5)
    np.testing.assert_allclose(np.asarray(res.rs[0]), rs_gt[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.ts[0]), ts_gt[0], atol=1e-6)


def test_perfect_graph_stays_put():
    rs_gt, ts_gt = circle_trajectory(n=8)
    g = build_graph(rs_gt, ts_gt, noise=0.0)
    res = optimize_pose_graph(jnp.asarray(rs_gt), jnp.asarray(ts_gt), g,
                              num_iterations=5)
    assert float(res.cost) < 1e-8
    np.testing.assert_allclose(np.asarray(res.rs), rs_gt, atol=1e-4)
