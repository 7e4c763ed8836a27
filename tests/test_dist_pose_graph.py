"""Distributed (edge-sharded) pose graph vs single-device."""
import numpy as np
import jax.numpy as jnp
import pytest

from photogrammetry_tpu.parallel.mesh import make_mesh
from photogrammetry_tpu.parallel.dist_pose_graph import (
    distributed_optimize_pose_graph, pad_graph,
)
from photogrammetry_tpu.sfm.pose_graph import optimize_pose_graph
from tests.test_pose_graph import build_graph, centers, circle_trajectory


@pytest.mark.slow
def test_distributed_pose_graph_matches_single():
    rs_gt, ts_gt = circle_trajectory(n=14)
    g = build_graph(rs_gt, ts_gt, noise=0.05)
    g8 = pad_graph(g, 8)
    assert g8.edges.shape[0] % 8 == 0

    rs0 = jnp.asarray(rs_gt)
    ts0 = jnp.asarray(ts_gt)
    ref = optimize_pose_graph(rs0, ts0, g, num_iterations=15)
    mesh = make_mesh()
    got = distributed_optimize_pose_graph(rs0, ts0, g8, mesh,
                                          num_iterations=15)
    assert float(got.cost) == pytest.approx(float(ref.cost), rel=1e-3)
    np.testing.assert_allclose(np.asarray(got.rs), np.asarray(ref.rs),
                               atol=1e-3)


@pytest.mark.slow
def test_padded_edges_are_inert():
    rs_gt, ts_gt = circle_trajectory(n=6)
    g = build_graph(rs_gt, ts_gt, noise=0.03)
    mesh = make_mesh()
    a = distributed_optimize_pose_graph(jnp.asarray(rs_gt),
                                        jnp.asarray(ts_gt),
                                        pad_graph(g, 8), mesh,
                                        num_iterations=10)
    b = distributed_optimize_pose_graph(jnp.asarray(rs_gt),
                                        jnp.asarray(ts_gt),
                                        pad_graph(pad_graph(g, 8), 16), mesh,
                                        num_iterations=10)
    assert float(a.cost) == pytest.approx(float(b.cost), rel=1e-4)


@pytest.mark.slow
def test_cg_solver_matches_dense():
    """The matrix-free PCG path converges to the dense direct solve on a
    small graph (same LM schedule, same final cost/poses)."""
    rs_gt, ts_gt = circle_trajectory(n=14)
    g = build_graph(rs_gt, ts_gt, noise=0.05)
    g8 = pad_graph(g, 8)
    mesh = make_mesh()
    dense = distributed_optimize_pose_graph(
        jnp.asarray(rs_gt), jnp.asarray(ts_gt), g8, mesh,
        num_iterations=15, solver="dense")
    cg = distributed_optimize_pose_graph(
        jnp.asarray(rs_gt), jnp.asarray(ts_gt), g8, mesh,
        num_iterations=15, solver="cg", cg_iterations=120)
    assert float(cg.cost) == pytest.approx(float(dense.cost), rel=5e-3)
    np.testing.assert_allclose(np.asarray(cg.rs), np.asarray(dense.rs),
                               atol=5e-3)


@pytest.mark.slow
def test_cg_scales_to_256_nodes():
    """N=256 nodes on the 8-device mesh via the CG path — the dense path
    would psum a 256^2 x 36 float H per iteration (9.4 MB); CG's
    per-step collective is the (256, 6) vector.  Cost must drop
    substantially from the noisy init."""
    rs_gt, ts_gt = circle_trajectory(n=256)
    g = build_graph(rs_gt, ts_gt, noise=0.04)
    g8 = pad_graph(g, 8)
    mesh = make_mesh()
    res = distributed_optimize_pose_graph(
        jnp.asarray(rs_gt), jnp.asarray(ts_gt), g8, mesh,
        num_iterations=10, solver="cg", cg_iterations=60)
    assert float(res.cost) < 0.05 * float(res.initial_cost)


def test_batched_frontend():
    from photogrammetry_tpu.sfm.frontend import (
        FrontendConfig, detect_and_describe, detect_and_describe_batch,
        make_pairs,
    )

    rng = np.random.default_rng(60)
    frames = rng.integers(0, 255, (4, 64, 64)).astype(np.float32)
    cfg = FrontendConfig(detection_threshold=30.0, max_keypoints=64,
                         reduction="nms", suppression_radius=3.0)
    pairs = make_pairs(cfg)
    batch = detect_and_describe_batch(jnp.asarray(frames), pairs, cfg)
    single = detect_and_describe(jnp.asarray(frames[2]), pairs, cfg)
    np.testing.assert_array_equal(np.asarray(batch.points.coords[2]),
                                  np.asarray(single.points.coords))
    np.testing.assert_array_equal(np.asarray(batch.bits[2]),
                                  np.asarray(single.bits))
