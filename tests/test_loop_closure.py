"""Loop-closure detection, measurement, and drift correction."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photogrammetry_tpu.core.lie import so3_exp
from photogrammetry_tpu.sfm import loop_closure as lc
from photogrammetry_tpu.sfm.frontend import (
    FrontendConfig, detect_and_describe, make_pairs,
)
from photogrammetry_tpu.sfm.pose_graph import relative_pose
from photogrammetry_tpu.synth.star_scene import (
    StarSceneConfig, generate_sequence, render_frame,
)

CFG = FrontendConfig(detection_threshold=20.0, max_keypoints=256,
                     reduction="nms", suppression_radius=4.0,
                     hamming_threshold=80)


def make_revisit_scene(num_frames=5):
    """Pan sequence + one final frame back at a true revisit of frame 2's
    pose (tiny but nonzero baseline — the loop-closure regime)."""
    scene = generate_sequence(StarSceneConfig(num_frames=num_frames,
                                              supersample=2))
    cfg = scene["config"]
    cx = scene["centers"][2][0] + 0.02
    yaw = float(np.arctan2(cx, cfg.depth))
    r = np.asarray(so3_exp(jnp.array([0.0, yaw, 0.0])))
    center = np.array([cx, 0.0, 0.0])
    t = -r @ center
    frames = np.concatenate([scene["frames"],
                             render_frame(cfg, r, t, scene["k"])[None]])
    rs = np.concatenate([scene["rs"], r[None]]).astype(np.float32)
    ts = np.concatenate([scene["ts"], t[None]]).astype(np.float32)
    return frames, rs, ts, scene["k"]


def describe_all(frames):
    pairs = make_pairs(CFG)
    return [detect_and_describe(jnp.asarray(f, jnp.float32), pairs, CFG)
            for f in frames]


def rot_err_deg(rs_a, rs_b):
    cos = (np.einsum("fij,fij->f", np.asarray(rs_a), np.asarray(rs_b))
           - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


def test_pairwise_counts_and_detection():
    frames, rs, ts, k = make_revisit_scene()
    feats = describe_all(frames)
    bits = jnp.stack([f.bits for f in feats])
    masks = jnp.stack([f.points.mask for f in feats])
    counts = np.asarray(lc.pairwise_match_counts(bits, masks, 80))
    assert counts.shape == (6, 6)
    assert (counts == counts.T).all()
    # self-matches saturate; the revisit frame resembles its neighbors far
    # more than the pan endpoints resemble each other
    assert counts[1, 5] > counts[0, 4]
    assert counts[2, 5] > counts[0, 4]
    pairs = lc.detect_loop_closures(counts, min_gap=3, min_matches=18)
    assert any(p in pairs for p in [(1, 5), (2, 5)])
    # strongest first, all respect the gap
    assert all(j - i >= 3 for i, j in pairs)


def test_detect_loop_closures_thresholds():
    counts = np.zeros((6, 6), int)
    counts[1, 5] = counts[5, 1] = 80
    counts[0, 3] = counts[3, 0] = 50
    counts[4, 5] = counts[5, 4] = 100   # temporal neighbor: gap too small
    got = lc.detect_loop_closures(counts, min_gap=3, min_matches=18)
    assert got == [(1, 5), (0, 3)]
    assert lc.detect_loop_closures(counts, min_gap=3, min_matches=200) == []


@pytest.mark.slow
def test_close_loops_corrects_rotation_drift():
    frames, rs_gt, ts_gt, k = make_revisit_scene()
    feats = describe_all(frames)

    # rotation-only drift: growing yaw error, camera centers untouched
    rs_d, ts_d = [], []
    for t in range(len(frames)):
        dr = np.asarray(so3_exp(jnp.array([0.0, 0.022 * t, 0.0])))
        rs_d.append(dr @ rs_gt[t])
        ts_d.append(dr @ ts_gt[t])
    rs_d = np.stack(rs_d).astype(np.float32)
    ts_d = np.stack(ts_d).astype(np.float32)
    err0 = rot_err_deg(rs_d, rs_gt).mean()

    rs_o, ts_o, info = lc.close_loops(feats, rs_d, ts_d, k, CFG,
                                      min_gap=3, min_matches=18)
    assert (2, 5) in info["loop_edges"]
    # global mean error decreases...
    err1 = rot_err_deg(rs_o, rs_gt).mean()
    assert err1 < 0.75 * err0, (err0, err1)
    # ...and the drift across the loop itself (the part a loop closure CAN
    # fix — error accumulated after the revisited frame) nearly vanishes:
    # 3*0.022 rad = 3.78 deg before, measurement-limited (< 1 deg) after.
    def rel(rs, i, j):
        return np.asarray(rs[j]) @ np.asarray(rs[i]).T
    gap_before = rot_err_deg(rel(rs_d, 2, 5)[None], rel(rs_gt, 2, 5)[None])[0]
    gap_after = rot_err_deg(rel(rs_o, 2, 5)[None], rel(rs_gt, 2, 5)[None])[0]
    assert gap_before > 3.0
    assert gap_after < 1.0, (gap_before, gap_after)


def test_rotation_mode_edge_has_zero_translation_residual():
    """mode='rotation' measurements must not perturb camera centers: the
    SE(3) translation residual at the current estimate is exactly zero
    because z_t is built from the *measured* z_r (advisor round-1 low)."""
    frames, rs, ts, k = make_revisit_scene()
    feats = describe_all(frames)
    meas, support = lc.measure_loop_edges(
        feats, rs, ts, k, [(2, 5)], CFG, jax.random.PRNGKey(0),
        mode="rotation")
    (zr, zt), = meas
    predicted_t5 = np.asarray(zr) @ np.asarray(ts[2]) + np.asarray(zt)
    np.testing.assert_allclose(predicted_t5, ts[5], atol=1e-6)
    assert support[0] > 0


def test_close_loops_gates_on_geometric_support():
    """Appearance-matched pairs whose geometric fit keeps too few points
    (perceptual aliasing) must be dropped, not turned into loop edges
    (advisor round-1 medium)."""
    frames, rs, ts, k = make_revisit_scene()
    feats = describe_all(frames)
    rs_o, ts_o, info = lc.close_loops(feats, rs, ts, k, CFG, min_gap=3,
                                      min_matches=18, min_support=10_000)
    assert info["loop_edges"] == []
    assert info["rejected_edges"], "gated pairs must be reported"
    np.testing.assert_array_equal(np.asarray(rs_o), rs)
    np.testing.assert_array_equal(np.asarray(ts_o), ts)


def test_build_pose_graph_shapes():
    rng = np.random.default_rng(0)
    rs = np.stack([np.eye(3)] * 4).astype(np.float32)
    ts = rng.normal(0, 0.1, (4, 3)).astype(np.float32)
    zr, zt = lc.relative_pose(jnp.asarray(rs[0]), jnp.asarray(ts[0]),
                              jnp.asarray(rs[3]), jnp.asarray(ts[3]))
    g = lc.build_pose_graph(rs, ts, [(0, 3)], [(zr, zt)], loop_weight=2.0)
    assert g.edges.shape == (4, 2)          # 3 odometry + 1 loop
    assert float(g.weights[-1]) == 2.0
    # odometry edges reproduce the trajectory exactly (zero residual)
    from photogrammetry_tpu.sfm.pose_graph import optimize_pose_graph
    res = optimize_pose_graph(jnp.asarray(rs), jnp.asarray(ts), g,
                              num_iterations=3)
    assert float(res.initial_cost) < 1e-8
