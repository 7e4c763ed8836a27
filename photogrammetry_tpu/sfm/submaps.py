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


def _merge_submap_tracks(results, spans, num_frames: int, capacity: int,
                         loop_links=None):
    """Fuse track identities across submaps into one global (F, T) table.

    Within each overlap the two adjacent submaps observe the SAME detected
    keypoints (the frontend is deterministic per frame), so a track in
    submap i+1 that shares any (frame, xy) observation with a track in
    submap i is the same physical landmark — linked by exact xy identity
    and merged with union-find.  The merged observations give the global
    bundle adjustment real cross-seam constraints, which the Sim3 stitch +
    pose graph alone never had (VERDICT r4: the 201-frame stress residual
    is SEAM error).  Returns (obs (F, T, 2) f32, obs_mask (F, T) bool)
    keeping the ``capacity`` best-observed merged tracks.
    """
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    seen = {}          # (global frame, x-bytes, y-bytes) -> node
    rounded = {}       # (global frame, round 8x, round 8y) -> node
    track_obs = {}     # node -> {global_frame: (x, y)}
    links = {}         # (node_a, node_b) -> shared-observation count
    for i, (a, b) in enumerate(spans):
        t_ = results[i].table
        obs = np.asarray(t_.obs)
        mask = np.asarray(t_.obs_mask)
        n_obs = mask.sum(axis=0)
        for tid in np.nonzero(n_obs >= 2)[0]:
            node = (i, int(tid))
            parent[node] = node
            fr = np.nonzero(mask[:, tid])[0]
            track_obs[node] = {int(a + f): tuple(obs[f, tid]) for f in fr}
            for f in fr:
                key = (int(a + f), obs[f, tid, 0].tobytes(),
                       obs[f, tid, 1].tobytes())
                if key in seen:
                    pair = tuple(sorted((node, seen[key])))
                    links[pair] = links.get(pair, 0) + 1
                else:
                    seen[key] = node
                # eighth-pixel-rounded index for loop-link lookup (loop
                # matches come from a separate frontend run; exact float
                # identity would be brittle there)
                rkey = (int(a + f), int(round(obs[f, tid, 0] * 8)),
                        int(round(obs[f, tid, 1] * 8)))
                rounded[rkey] = node

    # Loop-closure track fusion: an accepted loop edge's gated matches
    # link the track observing (fa, xy_a) with the track observing
    # (fb, xy_b) — WITHOUT these the global BA has no revisit
    # constraints (the loop frames live in non-adjacent submaps sharing
    # no overlap) and quietly re-drifts the fold the pose graph just
    # closed (measured: refine WITH loop links below vs without).
    for (fa, xya, fb, xyb) in (loop_links or []):
        ka = (int(fa), int(round(float(xya[0]) * 8)),
              int(round(float(xya[1]) * 8)))
        kb = (int(fb), int(round(float(xyb[0]) * 8)),
              int(round(float(xyb[1]) * 8)))
        na, nb = rounded.get(ka), rounded.get(kb)
        if na is not None and nb is not None and na != nb:
            pair = tuple(sorted((na, nb)))
            links[pair] = links.get(pair, 0) + 2  # a gated loop inlier
            # counts as full support (conflict rejection + reprojection
            # pruning below still guard bad fusions)

    # Union only pairs agreeing on >= 2 shared observations: a SINGLE
    # shared keypoint is exact-identity but says nothing about how the
    # two submaps chained it FORWARD — one bad chain link would fuse two
    # different landmarks into one track and poison the global BA
    # (measured: single-link unions blew the 201-frame stress ATE
    # 4.0% -> 13.2%; scripts/stress_ablate.py).
    for (na, nb), cnt in links.items():
        if cnt >= 2:
            union(na, nb)

    groups = {}
    for node in parent:
        groups.setdefault(find(node), []).append(node)
    merged = []
    for members in groups.values():
        allobs = {}
        consistent = True
        for m in members:
            for f, xy in track_obs[m].items():
                if f in allobs and allobs[f] != xy:
                    consistent = False  # same frame, different keypoint:
                    break               # two landmarks — reject the merge
                allobs[f] = xy
            if not consistent:
                break
        if consistent:
            merged.append(allobs)
        else:
            # fall back to the largest single member (no cross-seam fuse)
            merged.append(dict(max((track_obs[m] for m in members),
                                   key=len)))
    merged.sort(key=len, reverse=True)
    merged = merged[:capacity]

    obs = np.zeros((num_frames, capacity, 2), np.float32)
    obs_mask = np.zeros((num_frames, capacity), bool)
    for t_id, allobs in enumerate(merged):
        for f, xy in allobs.items():
            obs[f, t_id] = xy
            obs_mask[f, t_id] = True
    return obs, obs_mask


def refine_submaps_global(rs_all, ts_all, results, spans, k,
                          num_frames: int, capacity: int = 4096,
                          rounds: int = 2, iterations: int = 20,
                          prune_px: float = 3.0,
                          min_depth: float = 1e-3,
                          max_depth: float = 1e3,
                          loop_links=None,
                          prior_weight: float = 300.0):
    """Cross-seam global refinement: merged tracks -> retriangulate from
    the stitched poses -> global BA (camera 0 fixed) -> prune, repeated
    ``rounds`` times.  ``loop_links`` (list of (fa, xy_a, fb, xy_b)
    gated loop-match correspondences) fuses tracks across accepted loop
    edges so the BA carries the pose graph's revisit constraints.
    Returns (rs, ts, points (N,3) np arrays)."""
    from photogrammetry_tpu.sfm.ba import BAProblem, BAState, bundle_adjust
    from photogrammetry_tpu.sfm.incremental import (
        _prune_observations, _retriangulate_all,
    )
    from photogrammetry_tpu.sfm.tracks import TrackTable

    obs, obs_mask = _merge_submap_tracks(results, spans, num_frames,
                                         capacity, loop_links=loop_links)
    kmat = jnp.asarray(k, jnp.float32)
    rs = jnp.asarray(rs_all, jnp.float32)
    ts = jnp.asarray(ts_all, jnp.float32)
    table = TrackTable(
        obs=jnp.asarray(obs), obs_mask=jnp.asarray(obs_mask),
        points=jnp.zeros((capacity, 3), jnp.float32),
        has_point=jnp.zeros((capacity,), bool),
        kp_track=jnp.zeros((obs.shape[1],), jnp.int32),
        num_tracks=jnp.int32(capacity), dropped=jnp.int32(0))
    fixed = jnp.ones((num_frames,)).at[0].set(0.0)
    # trajectory anchor: the input poses (pose-graph/loop-closed) prior
    # every round — a pure-reprojection global BA of a long monocular arc
    # drifts into bas-relief basins the pose graph excluded (measured:
    # 201-frame stress 4.0% -> 5.0-5.7% without the prior)
    prior_rs, prior_ts = rs, ts
    for _ in range(max(1, rounds)):
        table = _retriangulate_all(table, rs, ts, kmat,
                                   min_depth, max_depth)
        table = _prune_observations(table, rs, ts, kmat, prune_px)
        state = BAState(rs=rs, ts=ts, points=table.points)
        prob = BAProblem(obs=table.obs,
                         mask=table.obs_mask & table.has_point[None, :],
                         k=kmat)
        res = bundle_adjust(state, prob, num_iterations=iterations,
                            fixed_cameras=fixed,
                            use_pose_prior=prior_weight > 0,
                            prior_rs=prior_rs, prior_ts=prior_ts,
                            prior_weight=prior_weight)
        rs, ts = res.state.rs, res.state.ts
        table = table._replace(points=res.state.points)
    pts = np.asarray(table.points)[np.asarray(table.has_point)]
    return (np.asarray(rs, np.float32), np.asarray(ts, np.float32), pts)


def run_submap_sfm(frames: np.ndarray, k: np.ndarray,
                   config: SfmConfig | None = None,
                   submap_frames: int = 16, overlap: int = 4,
                   seed: int = 0, restarts: int = 3,
                   pose_graph_iterations: int = 15,
                   global_refine_rounds: int = 0,
                   global_track_capacity: int = 4096) -> SubmapResult:
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

    # ---- cross-seam global refinement --------------------------------
    # The Sim3 stitch + pose graph never sees a reprojection residual that
    # crosses a seam; merged-track global BA does (VERDICT r4 item 3).
    points = np.concatenate(clouds, axis=0)
    if len(spans) > 1 and global_refine_rounds > 0:
        rs_all, ts_all, points = refine_submaps_global(
            rs_all, ts_all, results, spans, k, num_frames,
            capacity=global_track_capacity, rounds=global_refine_rounds,
            iterations=config.final_ba_iterations or 20,
            prune_px=config.prune_px, min_depth=config.min_depth,
            max_depth=config.max_depth)

    total = sum(int(np.asarray(r.table.num_tracks)) for r in results)
    dropped = sum(int(np.asarray(r.table.dropped)) for r in results)
    return SubmapResult(rs=rs_all, ts=ts_all,
                        points=points,
                        submaps=results, spans=spans,
                        total_tracks=total, dropped=dropped)
