"""Submap-chained SfM: map-size scaling beyond one track table.

A single TrackTable is a fixed-capacity (F, T) grid (the static-shape
convention, sfm/tracks.py); long sequences eventually exhaust T and new
keypoints are dropped (the ``dropped`` counter).  This module lifts that
limit the SLAM way: the sequence is split into overlapping windows, each
reconstructed independently with its own full-capacity table (so total
track count scales linearly with sequence length), then the windows are
stitched into one global frame:

  1. consecutive submaps share ``overlap`` frames; a similarity (Umeyama:
     scale + R + t — monocular submaps each carry their own gauge) maps
     submap i+1 onto the stitched frame using the overlapping camera
     centers + relative rotations;
  2. a pose graph over all frames (odometry edges within submaps, stronger
     edges across the overlaps) smooths the seams — optimized with the
     dense solver for short chains or the matrix-free CG solver at SLAM
     scale (parallel/dist_pose_graph.py).

This is also the "long-context analogue" of SURVEY.md §5: trajectory
length scales by adding submaps, not by growing any single static shape,
so every per-submap program stays compiled-once.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax.numpy as jnp
import numpy as np

from photogrammetry_tpu.sfm.incremental import (
    SfmConfig, SfmResult, run_incremental_sfm_robust,
)
from photogrammetry_tpu.sfm.pose_graph import (
    PoseGraph, optimize_pose_graph, relative_pose,
)


@dataclass
class SubmapResult:
    rs: np.ndarray            # (F, 3, 3) stitched world->cam
    ts: np.ndarray            # (F, 3)
    points: np.ndarray        # (sum_i Ti, 3) merged landmark cloud
    submaps: List[SfmResult]  # per-window results (own gauges)
    spans: List[tuple]        # (start, end) frame range per submap
    total_tracks: int         # tracks allocated across all tables
    dropped: int              # capacity drops across all tables

    @property
    def camera_centers(self) -> np.ndarray:
        return -np.einsum("fji,fj->fi", self.rs, self.ts)


def _align_sim3_poses(rs_m, ts_m, rs_s, ts_s):
    """Sim3 (s, R_g, t_g) mapping submap gauge onto the stitched gauge from
    FULL overlapping poses: c_s ~= s R_g c_m + t_g and R_s ~= R_m R_g^T.

    Center-only Umeyama is rank-deficient on this problem: a camera pan's
    centers are nearly collinear, leaving the roll about the pan axis
    unconstrained (measured: seams accumulate arbitrary roll and the
    stitched z explodes).  The rotations of the shared frames pin that DOF:
    R_g is the chordal mean of R_sf^T R_mf over the overlap.
    """
    cm = -np.einsum("fji,fj->fi", rs_m, ts_m)
    cs = -np.einsum("fji,fj->fi", rs_s, ts_s)
    # chordal mean of per-frame relative rotations (projection onto SO(3))
    m = np.einsum("fji,fjk->ik", rs_s, rs_m)  # sum_f R_sf^T R_mf
    u, _, vt = np.linalg.svd(m)
    d = np.diag([1.0, 1.0, np.sign(np.linalg.det(u @ vt))])
    r_g = u @ d @ vt
    mu_m, mu_s = cm.mean(axis=0), cs.mean(axis=0)
    den = np.sum((cm - mu_m) ** 2)
    s = float(np.sqrt(np.sum((cs - mu_s) ** 2) / max(den, 1e-12))) \
        if den > 1e-12 else 1.0
    t_g = mu_s - s * (r_g @ mu_m)
    return s, r_g, t_g


def _apply_sim3(s, r_g, t_g, rs, ts, points=None):
    """Map poses (and optionally points) through X' = s R_g X + t_g.

    Camera centers move with the similarity; rotations compose with
    R_g^T (pure scene scaling leaves world->cam rotation axes intact)."""
    centers = -np.einsum("fji,fj->fi", rs, ts)
    centers2 = centers @ (s * r_g).T + t_g
    rs2 = np.einsum("fij,kj->fik", rs, r_g)   # R_i R_g^T
    ts2 = -np.einsum("fij,fj->fi", rs2, centers2)
    pts2 = None if points is None else points @ (s * r_g).T + t_g
    return rs2, ts2, pts2


def run_submap_sfm(frames: np.ndarray, k: np.ndarray,
                   config: SfmConfig | None = None,
                   submap_frames: int = 16, overlap: int = 4,
                   seed: int = 0, restarts: int = 3,
                   pose_graph_iterations: int = 15) -> SubmapResult:
    """frames (F, H, W) -> stitched trajectory + merged cloud.

    ``overlap`` >= 3 (the Umeyama seam alignment needs >= 3 shared
    centers); each window runs the full incremental pipeline with a fresh
    table, so per-window shapes are identical and the jitted programs are
    reused across submaps.
    """
    config = config or SfmConfig()
    if overlap < 3:
        raise ValueError("overlap must be >= 3 for similarity stitching")
    num_frames = len(frames)
    step = submap_frames - overlap
    if step <= 0:
        raise ValueError("submap_frames must exceed overlap")

    spans = []
    s0 = 0
    while True:
        e0 = min(s0 + submap_frames, num_frames)
        spans.append((s0, e0))
        if e0 >= num_frames:
            break
        s0 += step
    # merge a tiny tail window into its predecessor
    if len(spans) > 1 and spans[-1][1] - spans[-1][0] < overlap + 2:
        spans[-2] = (spans[-2][0], spans[-1][1])
        spans.pop()

    # Best-of-restarts per window: a single bad RANSAC basin in any one
    # submap poisons every seam after it (a wrong-shape reconstruction can
    # still score a low similarity-aligned ATE, so it would pass silently);
    # reconstruction_quality selection rejects those basins without ground
    # truth.
    results = []
    for i, (a, b) in enumerate(spans):
        res = run_incremental_sfm_robust(frames[a:b], k, config,
                                         seed=seed + i, restarts=restarts,
                                         target_med_px=0.5, max_restarts=8)
        results.append(res)

    # ---- stitch: chain similarities across overlaps -----------------
    rs_all = np.zeros((num_frames, 3, 3), np.float32)
    ts_all = np.zeros((num_frames, 3), np.float32)
    clouds = []
    a0, b0 = spans[0]
    rs_all[a0:b0] = results[0].rs
    ts_all[a0:b0] = results[0].ts
    clouds.append(results[0].points)
    for i in range(1, len(spans)):
        a, b = spans[i]
        prev_end = spans[i - 1][1]
        ov = prev_end - a                     # shared frame count
        # full shared poses: stitched vs this submap's gauge
        s, r_g, t_g = _align_sim3_poses(
            results[i].rs[:ov], results[i].ts[:ov],
            rs_all[a:prev_end], ts_all[a:prev_end])
        rs_i, ts_i, pts_i = _apply_sim3(s, r_g, t_g, results[i].rs,
                                        results[i].ts, results[i].points)
        # overwrite from the first non-shared frame on; shared frames keep
        # the stitched estimate (the pose graph reconciles both below)
        rs_all[prev_end:b] = rs_i[ov:]
        ts_all[prev_end:b] = ts_i[ov:]
        clouds.append(pts_i)

    # ---- pose-graph smoothing over the seams ------------------------
    if len(spans) > 1 and pose_graph_iterations > 0:
        edges, zr, zt, w = [], [], [], []
        for i, (a, b) in enumerate(spans):
            rs_i, ts_i = results[i].rs, results[i].ts
            if i > 0:  # express in stitched gauge for consistent z_ts scale
                prev_end = spans[i - 1][1]
                ov = prev_end - a
                s, r_g, t_g = _align_sim3_poses(
                    rs_i[:ov], ts_i[:ov],
                    rs_all[a:prev_end], ts_all[a:prev_end])
                rs_i, ts_i, _ = _apply_sim3(s, r_g, t_g, rs_i, ts_i)
            for f in range(len(rs_i) - 1):
                r_rel, t_rel = relative_pose(rs_i[f], ts_i[f],
                                             rs_i[f + 1], ts_i[f + 1])
                edges.append((a + f, a + f + 1))
                zr.append(np.asarray(r_rel))
                zt.append(np.asarray(t_rel))
                # edges fully inside the shared window (both endpoints
                # among the ov shared frames, i.e. f <= ov-2) are measured
                # by two submaps; weight that duplicate odometry as soft
                # agreement.  The seam-crossing edge (f == ov-1) exists in
                # this submap only and keeps unit weight.
                w.append(1.0 if i == 0 or f >= ov - 1 else 2.0)
        graph = PoseGraph(edges=jnp.asarray(edges, jnp.int32),
                          z_rs=jnp.asarray(np.stack(zr), jnp.float32),
                          z_ts=jnp.asarray(np.stack(zt), jnp.float32),
                          weights=jnp.asarray(w, jnp.float32))
        out = optimize_pose_graph(jnp.asarray(rs_all), jnp.asarray(ts_all),
                                  graph,
                                  num_iterations=pose_graph_iterations)
        rs_all = np.asarray(out.rs, np.float32)
        ts_all = np.asarray(out.ts, np.float32)

    total = sum(int(np.asarray(r.table.num_tracks)) for r in results)
    dropped = sum(int(np.asarray(r.table.dropped)) for r in results)
    return SubmapResult(rs=rs_all, ts=ts_all,
                        points=np.concatenate(clouds, axis=0),
                        submaps=results, spans=spans,
                        total_tracks=total, dropped=dropped)
