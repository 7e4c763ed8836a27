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


def test_sim3_recovers_scale_drift():
    """Monocular scale drift (each odometry step's length inflated by a
    compounding factor -> the circle becomes a spiral) cannot be fixed by
    an SE(3) pose graph, but the Sim(3) graph with one zero-baseline
    revisit edge recovers the circle."""
    import numpy as np

    import jax.numpy as jnp

    from photogrammetry_tpu.sfm.metrics import absolute_trajectory_error
    from photogrammetry_tpu.sfm.pose_graph import (
        PoseGraph, PoseGraphSim3, optimize_pose_graph,
        optimize_pose_graph_sim3, relative_pose,
    )

    n = 40
    theta = np.linspace(0.0, 2 * np.pi, n)
    centers_gt = np.stack([2 * np.cos(theta), 2 * np.sin(theta),
                           np.zeros(n)], -1).astype(np.float32)
    # world->cam rotations: yaw following the tangent (any smooth choice)
    rs_gt = np.zeros((n, 3, 3), np.float32)
    for t in range(n):
        c, s = np.cos(theta[t]), np.sin(theta[t])
        rs_gt[t] = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], np.float32)

    # drift: step vectors scaled by a compounding 1.5%/step
    gamma = 1.015
    steps = np.diff(centers_gt, axis=0)
    drift_steps = steps * (gamma ** np.arange(1, n))[:, None]
    centers_d = np.concatenate([centers_gt[:1],
                                centers_gt[0] + np.cumsum(drift_steps, 0)])
    ts_d = np.einsum("nij,nj->ni", rs_gt, -centers_d).astype(np.float32)
    rs = jnp.asarray(rs_gt)
    ts = jnp.asarray(ts_d)

    # odometry edges from the DRIFTED trajectory; one revisit loop edge
    edges = [(t, t + 1) for t in range(n - 1)] + [(0, n - 1)]
    zr, zt, zs, w = [], [], [], []
    for i, j in edges[:-1]:
        r, t = relative_pose(rs[i], ts[i], rs[j], ts[j])
        zr.append(r); zt.append(t); zs.append(1.0); w.append(1.0)
    r0n = jnp.asarray(rs_gt[n - 1] @ rs_gt[0].T)
    # the loop edge carries the MEASURED relative scale (in production:
    # the median triangulated-depth ratio at the two revisit frames) —
    # with z_s = 1 the graph is told "no scale drift" and correctly does
    # little (measured ATE 0.150); with the true scale it recovers the
    # circle exactly
    zr.append(r0n); zt.append(jnp.zeros(3))
    zs.append(float(gamma ** (n - 1))); w.append(50.0)

    g_se3 = PoseGraph(edges=jnp.asarray(edges, jnp.int32),
                      z_rs=jnp.stack(zr), z_ts=jnp.stack(zt),
                      weights=jnp.asarray(w, jnp.float32))
    g_sim3 = PoseGraphSim3(edges=g_se3.edges, z_rs=g_se3.z_rs,
                           z_ts=g_se3.z_ts,
                           z_ss=jnp.asarray(zs, jnp.float32),
                           weights=g_se3.weights)

    gt = jnp.asarray(centers_gt)

    def ate_of(rs_o, ts_o):
        c = -jnp.einsum("nji,nj->ni", rs_o, ts_o)
        return float(absolute_trajectory_error(c, gt))

    ate_drift = ate_of(rs, ts)
    res3 = optimize_pose_graph(rs, ts, g_se3, num_iterations=30)
    ate_se3 = ate_of(res3.rs, res3.ts)
    res7 = optimize_pose_graph_sim3(rs, ts, g_sim3, num_iterations=30)
    ate_sim3 = ate_of(res7.rs, res7.ts)

    # measured values: drift 0.289, SE3 0.205, Sim3 ~1e-5
    assert ate_sim3 < 0.02 * ate_drift, (ate_drift, ate_se3, ate_sim3)
    assert ate_sim3 < 0.1 * ate_se3, (ate_drift, ate_se3, ate_sim3)
    # the recovered scale chain reproduces the compounding drift
    s = np.asarray(res7.scales)
    np.testing.assert_allclose(s[-1], gamma ** (n - 1), rtol=0.05)
