"""Loop-closure detection + pose-graph construction (SLAM loop completion).

North-star component (BASELINE.json; absent from the reference — its
pipeline is two-view only).  Place recognition is brute-force appearance
matching: every keyframe pair's mutual-nearest BRIEF match count, computed
as a batched bit matmul on the MXU (vmapped over the pair grid — no
vocabulary tree; at keyframe counts the dense (F, F) sweep is cheaper and
exact).  Accepted loop pairs get a two-view relative-pose measurement and
become extra pose-graph edges alongside the odometry chain.

Measurement modes: revisit pairs (near-zero baseline, the usual loop-closure
regime) use a trimmed bearing-Procrustes rotation fit — the epipolar problem
degenerates there but pure-rotation fitting is sub-degree accurate — and the
edge constrains orientation only.  Wide-baseline pairs can use the full
RANSAC→essential pipeline with the translation rescaled to the current
estimated baseline (a two-view translation is direction-only; the graph
never invents scale).
"""
from __future__ import annotations


import math

import jax
import jax.numpy as jnp
import numpy as np

from photogrammetry_tpu.ops.match import (
    hamming_distance_matrix, mutual_nearest_matches,
)
from photogrammetry_tpu.sfm.pose_graph import PoseGraph, relative_pose
from photogrammetry_tpu.sfm.two_view import two_view_pipeline


@jax.jit
def pairwise_match_counts(bits: jnp.ndarray, masks: jnp.ndarray,
                          threshold: jnp.ndarray) -> jnp.ndarray:
    """(F, K, P) descriptor bits + (F, K) masks → (F, F) int32 counts of
    mutual-nearest Hamming matches under ``threshold`` for every frame pair.
    """

    def one(b1, m1, b2, m2):
        d = hamming_distance_matrix(b1, b2, m1, m2)
        _, _, valid = mutual_nearest_matches(d, threshold)
        return jnp.sum(valid).astype(jnp.int32)

    # lax.map over rows keeps the live distance tensor at (F, K, K) — one
    # row of the pair grid at a time — instead of the full (F, F, K, K) a
    # double vmap would materialize (F^2 K^2 floats OOMs around F=50, K=1k).
    def row(bm):
        b1, m1 = bm
        return jax.vmap(one, in_axes=(None, None, 0, 0))(b1, m1, bits, masks)

    return jax.lax.map(row, (bits, masks))


def detect_loop_closures(counts: np.ndarray, min_gap: int = 3,
                         min_matches: int = 30,
                         max_candidates: int = 8) -> list[tuple[int, int]]:
    """Host-side candidate selection from the (F, F) match-count matrix.

    A pair (i, j), j - i >= min_gap, is a loop candidate when its match
    count reaches ``min_matches``; the strongest ``max_candidates`` are
    returned (strongest first).  Temporal neighbors are odometry, not loops.
    """
    counts = np.asarray(counts)
    f = counts.shape[0]
    cand = [(int(counts[i, j]), i, j)
            for i in range(f) for j in range(i + min_gap, f)
            if counts[i, j] >= min_matches]
    cand.sort(reverse=True)
    return [(i, j) for _, i, j in cand[:max_candidates]]


def build_pose_graph(rs, ts, loop_edges, loop_measurements,
                     odometry_weight: float = 1.0,
                     loop_weight: float = 1.0) -> PoseGraph:
    """Odometry chain from the estimated trajectory + measured loop edges.

    Args:
      rs, ts: (F, 3, 3), (F, 3) current world→camera pose estimates.
      loop_edges: list of (i, j) frame index pairs.
      loop_measurements: list of (z_r (3,3), z_t (3,)) measured relative
        poses, convention T_j = Z ∘ T_i (pose_graph.relative_pose).
    """
    rs = jnp.asarray(rs, jnp.float32)
    ts = jnp.asarray(ts, jnp.float32)
    f = rs.shape[0]
    edges, z_rs, z_ts, w = [], [], [], []
    for t in range(1, f):
        zr, zt = relative_pose(rs[t - 1], ts[t - 1], rs[t], ts[t])
        edges.append((t - 1, t))
        z_rs.append(zr)
        z_ts.append(zt)
        w.append(odometry_weight)
    for (i, j), (zr, zt) in zip(loop_edges, loop_measurements):
        edges.append((i, j))
        z_rs.append(jnp.asarray(zr, jnp.float32))
        z_ts.append(jnp.asarray(zt, jnp.float32))
        w.append(loop_weight)
    return PoseGraph(edges=jnp.asarray(edges, jnp.int32),
                     z_rs=jnp.stack(z_rs),
                     z_ts=jnp.stack(z_ts),
                     weights=jnp.asarray(w, jnp.float32))


@jax.jit
def rotation_from_bearings(xy1: jnp.ndarray, xy2: jnp.ndarray,
                           mask: jnp.ndarray, k: jnp.ndarray):
    """Trimmed Kabsch: rotation R with bearing(xy2) ≈ R @ bearing(xy1).

    For a revisit (near-zero baseline) the epipolar problem degenerates but
    the motion field is pure rotation of the bearing vectors, so a weighted
    orthogonal-Procrustes fit (3x3 SVD) recovers R far more accurately than
    an essential decomposition.  Three rounds drop residual outliers beyond
    3x the mean inlier residual.  Returns (R, kept_count).
    """
    kinv = jnp.linalg.inv(jnp.asarray(k, jnp.float32))

    def bear(xy):
        h = jnp.concatenate([xy, jnp.ones((xy.shape[0], 1), xy.dtype)], 1)
        h = h @ kinv.T
        return h / jnp.linalg.norm(h, axis=1, keepdims=True)

    b1 = bear(jnp.asarray(xy1, jnp.float32))
    b2 = bear(jnp.asarray(xy2, jnp.float32))
    w = mask.astype(jnp.float32)
    r = jnp.eye(3)
    for _ in range(3):
        m = (b2 * w[:, None]).T @ b1
        u, _, vt = jnp.linalg.svd(m)
        d = jnp.sign(jnp.linalg.det(u @ vt))
        r = u @ jnp.diag(jnp.stack([1.0, 1.0, d])) @ vt
        resid = jnp.linalg.norm(b2 - b1 @ r.T, axis=1)
        mean = jnp.sum(resid * w) / jnp.maximum(jnp.sum(w), 1.0)
        w = w * (resid < 3.0 * mean + 1e-9)
    return r, jnp.sum(w).astype(jnp.int32)


def measure_loop_edges(features, rs, ts, k, loop_pairs, config, key,
                       num_samples: int = 512, mode: str = "rotation"):
    """Relative-pose measurements for accepted loop pairs.

    features: list of DescribedFrame (sfm.frontend).  Returns
    (measurements, support counts), measurement convention T_j = Z ∘ T_i.

    mode='rotation' (default, for revisits): the rotation comes from the
    bearing-Procrustes fit and the translation is chosen as
    z_t = t_j - z_r @ t_i from the *current* trajectory estimate, so the
    edge's SE(3) translation residual is exactly zero at the current
    estimate and the edge constrains orientation only — at near-zero
    baseline the epipolar translation direction is pure noise.
    mode='essential': full RANSAC→essential→cheirality two-view pipeline;
    the unit translation is rescaled to the current estimated baseline
    |C_j - C_i| (for loop pairs with a real baseline).
    """
    from photogrammetry_tpu.sfm.frontend import match_pair

    rs = jnp.asarray(rs, jnp.float32)
    ts = jnp.asarray(ts, jnp.float32)
    centers = -jnp.einsum("fji,fj->fi", rs, ts)
    out, support = [], []
    for i, j in loop_pairs:
        key, sub = jax.random.split(key)
        # rows = frame j keypoints, cols = frame i; both paths below return
        # (r, t) mapping cam-j coords → cam-i coords, so Z_ij = (r, t)^-1.
        m = match_pair(features[j], features[i], config)
        if mode == "rotation":
            r_ji, kept = rotation_from_bearings(m.xy1, m.xy2, m.mask, k)
            zr = r_ji.T
            # z_t built from the *measured* z_r so the translation residual
            # (t_j - (z_r t_i + z_t)) vanishes at the current estimate; with
            # relative_pose's z_r-from-current-rotations it would not.
            zt = ts[j] - zr @ ts[i]
            out.append((zr, zt))
            support.append(int(kept))
        elif mode == "revisit":
            # Zero-baseline loop edge (round 4): a true revisit means the
            # camera RETURNED to the same place, so the edge pins the two
            # centers together.  With T_j = Z o T_i and C_j = C_i the
            # translation part is exactly z_t = 0 (t_j = z_r t_i).  This
            # is what actually closes positional/scale drift on orbits —
            # 'rotation' mode constrains orientation only, and
            # 'essential' rescales its unit translation by the CURRENT
            # estimated baseline, which would preserve the very gap the
            # loop should close.
            r_ji, kept = rotation_from_bearings(m.xy1, m.xy2, m.mask, k)
            out.append((r_ji.T, jnp.zeros((3,), jnp.float32)))
            support.append(int(kept))
        else:
            tv = two_view_pipeline(sub, m.xy1, m.xy2, m.mask, jnp.asarray(k),
                                   num_samples=num_samples, threshold=1.5)
            zr = tv.r.T
            baseline = jnp.linalg.norm(centers[j] - centers[i])
            zt = -tv.r.T @ (tv.t * baseline)
            out.append((zr, zt))
            support.append(int(tv.num_inliers))
    return out, support


def _median_local_depth(features, rs, ts, k, frame: int, neighbor: int,
                        config):
    """Median two-view triangulated depth at ``frame`` (against a temporal
    neighbor) under the current poses — the local metric scale probe used
    to measure a loop edge's relative scale."""
    from photogrammetry_tpu.sfm.frontend import match_pair
    from photogrammetry_tpu.sfm.triangulate import triangulate_dlt

    m = match_pair(features[frame], features[neighbor], config)
    r_rel = rs[neighbor] @ rs[frame].T
    t_rel = ts[neighbor] - r_rel @ ts[frame]
    pts, _ = triangulate_dlt(m.xy1, m.xy2, r_rel, t_rel, k, k)
    z = pts[:, 2]
    ok = m.mask & (z > 1e-3) & (z < 1e3)
    return float(jnp.nanmedian(jnp.where(ok, z, jnp.nan)))


def close_loops(features, rs, ts, k, config, key=None, min_gap: int = 3,
                min_matches: int = 30, num_iterations: int = 20,
                mode: str = "rotation", loop_weight: float = 4.0,
                min_support: int | None = None,
                max_candidates: int = 8):
    """End-to-end loop closure: detect → measure → build graph → optimize.

    Returns (rs, ts, info dict).  No candidate ⇒ poses returned unchanged.
    A loop edge corrects drift accumulated *after* its revisited frame;
    loop_weight > 1 reflects that Procrustes loop measurements are more
    accurate than single-step odometry.

    Appearance similarity alone is not enough to accept a loop edge
    (perceptual aliasing: two distinct places can share BRIEF statistics),
    so every measured edge is additionally gated on its *geometric* support
    — the Procrustes trim survivor count (mode='rotation') or the RANSAC
    inlier count (mode='essential') — and dropped below ``min_support``
    (default: ``min_matches``).  Rejected pairs are reported in
    info['rejected_edges'].
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if min_support is None:
        min_support = min_matches
    bits = jnp.stack([f.bits for f in features])
    masks = jnp.stack([f.points.mask for f in features])
    f_total = bits.shape[0]
    if f_total <= 64:
        counts = pairwise_match_counts(bits, masks, config.hamming_threshold)
    else:
        # Long sequences (round 4): the dense F^2 full-matching sweep is
        # O(F^2 K^2 P) — fine at F<=60, hopeless at F=200+.  Two-stage
        # place recognition: a bag-of-bits global descriptor per frame
        # (masked mean of descriptor bits — one (F, P) matrix) ranks all
        # pairs with a single F x F distance computation, then full
        # mutual matching runs only on the best ``shortlist`` candidates
        # per the same min_gap rule.
        w = masks.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
        global_d = jnp.einsum("fkp,fk->fp", bits.astype(jnp.float32), w) \
            / denom                                           # (F, P)
        d2 = jnp.sum((global_d[:, None] - global_d[None]) ** 2, -1)
        gap_ok = np.triu(np.ones((f_total, f_total), bool), k=min_gap)
        d2_np = np.where(gap_ok, np.asarray(d2), np.inf)
        shortlist = min(64, gap_ok.sum())
        flat = np.argsort(d2_np.ravel())[:shortlist]
        cand_pairs = [(int(i // f_total), int(i % f_total)) for i in flat
                      if np.isfinite(d2_np.ravel()[i])]
        counts = np.zeros((f_total, f_total), np.int32)
        for i, j in cand_pairs:
            d = hamming_distance_matrix(bits[i], bits[j], masks[i],
                                        masks[j])
            _, _, valid = mutual_nearest_matches(
                d, config.hamming_threshold)
            counts[i, j] = int(jnp.sum(valid))
        counts = jnp.asarray(counts)
    pairs = detect_loop_closures(np.asarray(counts), min_gap=min_gap,
                                 min_matches=min_matches,
                                 max_candidates=max_candidates)
    if not pairs:
        return rs, ts, {"loop_edges": [], "rejected_edges": [],
                        "counts": np.asarray(counts)}
    meas, inl = measure_loop_edges(
        features, rs, ts, k, pairs, config, key,
        mode="revisit" if mode == "revisit_sim3" else mode)
    kept = [(p, z, s) for p, z, s in zip(pairs, meas, inl)
            if s >= min_support]
    rejected = [(p, s) for p, s in zip(pairs, inl) if s < min_support]
    if not kept:
        return rs, ts, {"loop_edges": [], "rejected_edges": rejected,
                        "counts": np.asarray(counts)}
    pairs, meas, inl = ([t[i] for t in kept] for i in range(3))
    if mode == "revisit_sim3":
        # Sim(3) loop closing (round 4): monocular submap chaining
        # accumulates SCALE drift that no SE(3) correction can absorb (a
        # scale-drifted trajectory keeps its spiral under any rigid
        # correction).  Each revisit edge carries a MEASURED relative
        # scale — the ratio of median triangulated scene depth at the two
        # frames (the same scene at a revisit, so the estimated-depth
        # ratio IS the accumulated relative scale) — and the Sim(3) graph
        # distributes the log-scale correction over the trajectory.
        # Validated exactly on synthetic drift: ATE 0.289 -> 0.0000 with
        # the true scale (tests/test_pose_graph.py).
        from photogrammetry_tpu.sfm.pose_graph import (
            PoseGraphSim3, optimize_pose_graph_sim3, relative_pose,
        )

        rs_j = jnp.asarray(rs, jnp.float32)
        ts_j = jnp.asarray(ts, jnp.float32)
        n = rs_j.shape[0]
        eds, zr_l, zt_l, zs_l, w_l = [], [], [], [], []
        for t in range(n - 1):
            zr, zt = relative_pose(rs_j[t], ts_j[t], rs_j[t + 1],
                                   ts_j[t + 1])
            eds.append((t, t + 1))
            zr_l.append(zr)
            zt_l.append(zt)
            zs_l.append(1.0)
            w_l.append(1.0)
        scales_meas = []
        for (i, j), (zr, _zt) in zip(pairs, meas):
            di = _median_local_depth(features, rs_j, ts_j, k, i,
                                     min(i + 1, n - 1) if i + 1 != j
                                     else max(i - 1, 0), config)
            dj = _median_local_depth(features, rs_j, ts_j, k, j,
                                     max(j - 1, 0) if j - 1 != i
                                     else min(j + 1, n - 1), config)
            # A revisit frame with no valid in-gate depths yields a NaN
            # probe; np.clip(NaN) stays NaN and would poison every LM
            # step (NaN cost => silent no-op closure).  Fall back to a
            # unit scale measurement for that edge.
            if not (math.isfinite(di) and math.isfinite(dj)):
                zs = 1.0
            else:
                zs = float(np.clip(dj / max(di, 1e-9), 0.05, 20.0))
            scales_meas.append(zs)
            eds.append((i, j))
            zr_l.append(jnp.asarray(zr))
            zt_l.append(jnp.zeros(3))
            zs_l.append(zs)
            w_l.append(loop_weight * 10.0)
        graph7 = PoseGraphSim3(
            edges=jnp.asarray(eds, jnp.int32), z_rs=jnp.stack(zr_l),
            z_ts=jnp.stack(zt_l), z_ss=jnp.asarray(zs_l, jnp.float32),
            weights=jnp.asarray(w_l, jnp.float32))
        res = optimize_pose_graph_sim3(rs_j, ts_j, graph7,
                                       num_iterations=num_iterations)
        return res.rs, res.ts, {"loop_edges": pairs, "inliers": inl,
                                "rejected_edges": rejected,
                                "counts": np.asarray(counts),
                                "loop_scales": scales_meas,
                                "cost": float(res.cost)}
    graph = build_pose_graph(rs, ts, pairs, meas, loop_weight=loop_weight)
    from photogrammetry_tpu.sfm.pose_graph import optimize_pose_graph

    res = optimize_pose_graph(jnp.asarray(rs, jnp.float32),
                              jnp.asarray(ts, jnp.float32), graph,
                              num_iterations=num_iterations)
    return res.rs, res.ts, {"loop_edges": pairs, "inliers": inl,
                            "rejected_edges": rejected,
                            "counts": np.asarray(counts),
                            "cost": float(res.cost)}
