"""Submap-chained SfM: map capacity scales with sequence length.

VERDICT r2 item 9: sequences whose cumulative track count exceeds one
TrackTable's capacity must not silently drop — submaps chain fresh tables
and stitch gauges via full-pose Sim3 alignment + pose-graph smoothing.

Expectation calibration (measured 2026-08-21): on the 64-frame 0.7-rad
orbit all five windows select healthy basins (support 146-180, median
error 0.32-0.39 px) and the stitched ATE is 0.0396 on a 4.11-unit span
(<1%).  Wider orbits stress the per-window estimator (oblique backdrop
views at the arc ends weaken windows systematically at 1.2 rad), and
chaining without loop closures accumulates any per-window error as
odometric drift — loop closure (sfm/loop_closure.py) is the mechanism
that removes it, and the orbit deliberately never revisits its start.
"""
import numpy as np
import pytest

from photogrammetry_tpu.sfm.metrics import absolute_trajectory_error
from photogrammetry_tpu.sfm.submaps import run_submap_sfm
from photogrammetry_tpu.synth.star_scene import (
    StarSceneConfig, generate_orbit_sequence,
)


@pytest.mark.slow
def test_long_sequence_submap_chain():
    """64-frame orbit split into 16-frame submaps: total allocated tracks
    exceed a single table's 1024 capacity, nothing is dropped, every
    window reconstructs well locally, and the stitched trajectory stays
    within odometric-drift bounds of the ground truth."""
    from photogrammetry_tpu.sfm.incremental import SfmConfig

    cfg = StarSceneConfig(num_frames=64, supersample=2, num_dots=220)
    scene = generate_orbit_sequence(cfg, total_angle=0.7)
    gt = scene["centers"].astype(np.float32)

    # capacity 512 per window: the full sequence demands more live tracks
    # than any single table of that size could hold (each 16-frame window
    # alone allocates 160-330), so this run only works because submaps
    # chain fresh tables.  (Allocation counts vary with the selected
    # RANSAC basin — fewer broken chains allocate fewer tracks — so the
    # claim is relative to the configured capacity, not a fixed count.)
    sfm_cfg = SfmConfig(track_capacity=512)
    res = run_submap_sfm(scene["frames"], scene["k"], config=sfm_cfg,
                         submap_frames=16, overlap=4)
    assert len(res.spans) >= 4
    assert res.spans[0][0] == 0 and res.spans[-1][1] == 64
    assert res.total_tracks > 512, res.total_tracks
    assert res.dropped == 0
    # per-window quality (ground-truth-free selection metric)
    for sm in res.submaps:
        support, med = sm.quality
        assert med < 0.75, (support, med)
    # stitched trajectory: measured 0.0396 on span 4.11; 3x margin
    span = float(np.linalg.norm(gt[-1] - gt[0]))
    ate = float(absolute_trajectory_error(
        res.camera_centers.astype(np.float32), gt))
    assert ate < 0.03 * span, f"stitched ATE {ate} on span {span}"
    # merged cloud came from every submap
    assert len(res.points) > 512


def test_submap_spans_and_overlap_rules():
    with pytest.raises(ValueError):
        run_submap_sfm(np.zeros((8, 16, 16)), np.eye(3), overlap=2)
    with pytest.raises(ValueError):
        run_submap_sfm(np.zeros((8, 16, 16)), np.eye(3), submap_frames=3,
                       overlap=3)


def test_sim3_pose_alignment_roundtrip():
    """_align_sim3_poses recovers an applied similarity exactly, including
    the roll DOF that center-only Umeyama leaves free on collinear
    trajectories."""
    from photogrammetry_tpu.sfm.submaps import (
        _align_sim3_poses, _apply_sim3,
    )

    cfg = StarSceneConfig(num_frames=10)
    from photogrammetry_tpu.synth.star_scene import orbit_trajectory

    rs, ts, _ = orbit_trajectory(cfg, 0.8)
    rng = np.random.default_rng(0)
    aa = rng.normal(0, 0.5, 3)
    th = np.linalg.norm(aa)
    k = aa / th
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    r_g = np.eye(3) + np.sin(th) * kx + (1 - np.cos(th)) * kx @ kx
    s, t_g = 2.7, np.array([0.3, -1.0, 0.5])
    rs_m, ts_m, _ = _apply_sim3(1 / s, r_g.T, -r_g.T @ t_g / s, rs, ts)
    s_e, r_e, t_e = _align_sim3_poses(rs_m, ts_m, rs, ts)
    assert s_e == pytest.approx(s, abs=1e-9)
    np.testing.assert_allclose(r_e, r_g, atol=1e-12)
    rs2, ts2, _ = _apply_sim3(s_e, r_e, t_e, rs_m, ts_m)
    np.testing.assert_allclose(rs2, rs, atol=1e-12)
    np.testing.assert_allclose(ts2, ts, atol=1e-9)
