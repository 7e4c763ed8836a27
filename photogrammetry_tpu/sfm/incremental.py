"""Incremental SfM over an image sequence (the north-star estimator loop).

Host-orchestrated loop over jitted device stages, in the style of a JAX
training loop:

  frame 0:  detect/describe → open tracks
  frame 1:  match → extend tracks → two-view init (unit-baseline gauge)
            → triangulate → full BA
  frame t:  match → extend tracks → pose init = pose(t-1) → motion-only BA
            (PnP-style, landmarks frozen) → triangulate new tracks →
            windowed full BA (cameras before the window frozen)

All per-frame stages are fixed-shape jits; the Python loop only sequences
them (no data-dependent shapes cross the jit boundary).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from photogrammetry_tpu.sfm.ba import BAProblem, BAState, bundle_adjust, project
from photogrammetry_tpu.sfm.frontend import (
    FrontendConfig, frame_features, make_pairs, match_pair,
    precompute_frontend,
)
from photogrammetry_tpu.sfm.tracks import (
    TrackTable, extend_tracks_with_tid, first_last_observations,
    make_track_table, merge_skip_matches, reassociate_to_landmarks,
    start_tracks,
)
from photogrammetry_tpu.sfm.epipolar import ransac_fundamental
from photogrammetry_tpu.sfm.two_view import two_view_pipeline


@dataclass(frozen=True)
class SfmConfig:
    # Frontend capacity drives accuracy directly: landmark count is the
    # strongest ATE lever on the synthetic pan benchmark (256 kps -> ATE
    # ~0.14, 512 kps -> ~0.02 scene units, 8-frame sequence).
    frontend: FrontendConfig = FrontendConfig(
        suppression_radius=4.0, hamming_threshold=80, max_keypoints=512,
        detection_threshold=20.0)
    track_capacity: int = 1024
    ransac_threshold: float = 1.5
    ransac_samples: int = 1000
    # Deferred two-view bootstrap: essential-matrix accuracy scales with
    # parallax (measured on the synthetic pan: the (0,1) pair gives 3-9 deg
    # rotation / 30-85 deg translation-direction error and seeds basins BA
    # never escapes; the (0,3) pair is ~5x better at the same noise).
    # Tracks accumulate poseless until the median frame-0 displacement
    # reaches bootstrap_min_disp_px (or bootstrap_max_defer frames pass),
    # then the (0, t) pair initializes and intermediates are PnP'd in.
    bootstrap_min_disp_px: float = 50.0
    bootstrap_max_defer: int = 3
    # Independent bootstrap RANSAC draws; best post-BA support wins.
    bootstrap_attempts: int = 4
    ba_iterations: int = 30
    window: int = 8               # BA window (frames)
    # Final global BA over ALL frames (gauge camera 0 fixed) after the
    # incremental loop: recovers the drift a bounded window accumulates
    # (12-frame pan: windowed 0.108 -> polished 0.035 ATE).
    final_ba_iterations: int = 30
    # Refinement rounds around the final BA: each round re-triangulates
    # EVERY track from the converged poses (landmarks frozen early at
    # noisy geometry get refreshed), prunes, and re-runs the global BA.
    final_refine_rounds: int = 2
    # Absolute-pose (PnP) initialization for frames >= 2: RANSAC DLT pose
    # from observations of already-triangulated landmarks; falls back to
    # previous-pose when fewer than min_pnp_inliers support it.
    use_pnp: bool = True
    pnp_threshold: float = 4.0
    pnp_samples: int = 512
    min_pnp_inliers: int = 6      # the DLT minimal-sample size
    # PnP replaces the prior only when the prior has actually failed: its
    # median reprojection error on the map exceeds pnp_rescue_px.  On smooth
    # sequences the small-motion prior + motion-only BA is less noisy than
    # an algebraic DLT pose (which overfits map error), so PnP is a rescue
    # path for large motion / relocalization, not the default.
    pnp_rescue_px: float = 16.0
    # Triangulate new tracks from ALL observing views (mask-weighted
    # multi-view DLT) instead of only the first/last observation pair.
    nview_triangulation: bool = True
    # Map-guided track re-association (tracks.reassociate_to_landmarks):
    # after pose estimation, keypoints whose consecutive-frame match chain
    # broke re-attach to landmark tracks projecting within reassociate_px.
    reassociate: bool = True
    reassociate_px: float = 4.0
    min_depth: float = 1e-3
    max_depth: float = 1e3
    prune_px: float = 3.0         # reprojection-error observation pruning
    # Per-frame diagnostic counters (match/chain/reassociation counts) cost
    # one device->host scalar round-trip each; disable for maximum
    # throughput over the TPU tunnel.  Scalars that drive control flow
    # (PnP rescue, bootstrap trigger/selection) are always read.
    collect_diagnostics: bool = True
    # Optional jax.sharding.Mesh: windowed BA runs as the distributed
    # psum-Schur step with tracks sharded over its "tracks" axis
    # (track_capacity must divide the axis size).
    mesh: object = None
    # Frames per batched-frontend program in the sequence precompute
    # (frontend.precompute_frontend): bounds peak HBM on long sequences.
    frontend_chunk: int = 16
    # Fused per-frame steady-state step (_make_steady_step): ONE program
    # per frame instead of ~20.  None = off (measured slower than the
    # staged loop on BOTH current backends — see the resolution site);
    # bit-identical to the staged path (same ops, same RNG order), kept
    # opt-in for runtimes where one-dispatch-per-frame wins.  Requires
    # diagnostics/checkpointing/mesh off.
    fused_steady_steps: bool | None = None
    # Zero device->host reads before the final export: the tunnel
    # toolchain permanently degrades a process to ~17 ms/dispatch after
    # its FIRST readback of any size (docs/tpu_notes.md §3, round 4), so
    # the adaptive bootstrap trigger's per-deferred-frame displacement
    # read is replaced by a fixed bootstrap at min(bootstrap_max_defer,
    # F-1) — usually the same frame the adaptive rule picks on low-
    # parallax starts, and more parallax (not less) when it differs.
    read_free: bool = False
    # Sequence-level batched matching + epipolar gating
    # (frontend.precompute_matching): all (t, t-1)/(t, t-2) matches+gates
    # as a few batched programs, with chaining and PnP+pose fused — ~7
    # fewer dispatches per steady frame.  Measured on the chip it TIES
    # the sequential-draw loop (8.52 vs 8.47 fps diag-off: the removed
    # dispatches' device work just moves into the precompute) while
    # costing ~10x the cold executable-load time, and its fold_in gate
    # streams land in a different RANSAC basin family than the
    # seed-calibrated defaults.  Default OFF; turn on for workloads where
    # per-dispatch cost dominates device work (e.g. higher-RTT links).
    # RNG: seeds are not comparable across the two modes.
    precompute_matching: bool = False
    # Multi-scale pyramid frontend (frontend.detect_and_describe_*_pyramid):
    # octaves > 1 detects/describes on power-of-two scales and merges, so
    # features survive apparent-scale changes up to ~2^(octaves-1)
    # (the reference's descriptor is single-scale, Keypoint.cs:29-57).
    # Keypoint capacity becomes octaves x frontend.max_keypoints; scale
    # track_capacity accordingly.
    pyramid_octaves: int = 1


@jax.jit
def _triangulate_tracks(table: TrackTable, rs, ts, k,
                        first, last, min_depth, max_depth) -> TrackTable:
    """DLT-triangulate tracks with >= 2 observations and no landmark yet.

    Uses the first/last observing frames (max baseline).  Full-projection
    DLT rows x*P[2]-P[0], y*P[2]-P[1] per view; 4x4 Gram eigh.
    """
    cap = table.points.shape[0]
    need = (~table.has_point) & (first >= 0) & (last > first)
    fi = jnp.clip(first, 0)
    li = jnp.clip(last, 0)

    p_all = jnp.einsum("ij,fjk->fik", k,
                       jnp.concatenate([rs, ts[:, :, None]], axis=2))  # (F,3,4)

    def one(tid):
        f0, f1 = fi[tid], li[tid]
        xy0 = table.obs[f0, tid]
        xy1 = table.obs[f1, tid]
        p0 = p_all[f0]
        p1 = p_all[f1]
        d = jnp.stack([
            xy0[0] * p0[2] - p0[0],
            xy0[1] * p0[2] - p0[1],
            xy1[0] * p1[2] - p1[0],
            xy1[1] * p1[2] - p1[1],
        ])
        gram = d.T @ d
        _, v = jnp.linalg.eigh(gram)
        xh = v[:, 0]
        denom = jnp.where(jnp.abs(xh[3]) < 1e-12, 1e-12, xh[3])
        x = xh[:3] / denom
        z0 = (rs[f0] @ x + ts[f0])[2]
        z1 = (rs[f1] @ x + ts[f1])[2]
        ok = (z0 > min_depth) & (z1 > min_depth) & (z0 < max_depth) & (z1 < max_depth)
        return x, ok

    xs, oks = jax.vmap(one)(jnp.arange(cap))
    accept = need & oks
    points = jnp.where(accept[:, None], xs, table.points)
    return table._replace(points=points,
                          has_point=table.has_point | accept)


@jax.jit
def _triangulate_tracks_nview(table: TrackTable, rs, ts, k,
                              min_depth, max_depth) -> TrackTable:
    """Triangulate un-pointed tracks with >= 2 observations from ALL their
    observing views at once (sfm.triangulate.triangulate_nview); every
    observing view must place the point inside the depth band."""
    from photogrammetry_tpu.sfm.triangulate import triangulate_nview

    n_obs = jnp.sum(table.obs_mask, axis=0)
    need = (~table.has_point) & (n_obs >= 2)
    pts, depths = triangulate_nview(table.obs, table.obs_mask, rs, ts, k)
    ok_per_view = jnp.where(table.obs_mask,
                            (depths > min_depth) & (depths < max_depth),
                            True)
    accept = need & jnp.all(ok_per_view, axis=0)
    points = jnp.where(accept[:, None], pts, table.points)
    return table._replace(points=points,
                          has_point=table.has_point | accept)


@jax.jit
def _retriangulate_all(table: TrackTable, rs, ts, k,
                       min_depth, max_depth) -> TrackTable:
    """Re-triangulate EVERY track with >= 2 observations from the current
    poses (not only un-pointed ones), replacing stale landmarks."""
    from photogrammetry_tpu.sfm.triangulate import triangulate_nview

    pts, depths = triangulate_nview(table.obs, table.obs_mask, rs, ts, k)
    n_obs = jnp.sum(table.obs_mask, axis=0)
    ok = jnp.all(jnp.where(table.obs_mask,
                           (depths > min_depth) & (depths < max_depth),
                           True), axis=0)
    accept = (n_obs >= 2) & ok
    return table._replace(
        points=jnp.where(accept[:, None], pts, table.points),
        has_point=accept)


@partial(jax.jit, static_argnames=("min_inliers", "rescue_px", "threshold",
                                   "num_samples"))
def _pnp_rescue_device(key, points, obs_t, pnp_mask, kmat, r_prior, t_prior,
                       min_inliers: int, rescue_px: float, threshold: float,
                       num_samples: int):
    """Whole PnP-rescue decision as one device program (lax.cond).

    The host used to read a per-frame rescue flag; at ~45 ms tunnel RTT
    per scalar read that one readback dominated loop throughput
    (docs/tpu_notes.md §3).  Key evolution exactly matches the old host
    logic — the key splits only on the rescue branch — so RANSAC streams
    (and therefore all seeded results) are unchanged.

    Returns (key, r, t, diag) with diag = (rescued, used_pnp, support,
    prior_med, pnp_inliers, pnp_med) — device scalars the caller only
    reads when diagnostics are on.
    """
    from photogrammetry_tpu.sfm.pnp import (
        pnp_reprojection_errors, ransac_pnp,
    )

    def med_of(r, t_):
        err, z = pnp_reprojection_errors(r, t_, points, obs_t, kmat)
        e = jnp.where(z > 0, err, jnp.inf)
        e = jnp.where(pnp_mask, e, jnp.nan)
        return jnp.nanmedian(e)

    support = jnp.sum(pnp_mask)
    prior_med = med_of(r_prior, t_prior)
    rescue = (support >= min_inliers) & (prior_med > rescue_px)

    def do(key):
        key2, sub = jax.random.split(key)
        pnp = ransac_pnp(sub, points, obs_t, pnp_mask, kmat,
                         threshold=threshold, num_samples=num_samples)
        pnp_med = med_of(pnp.r, pnp.t)
        ok = (pnp.num_inliers >= min_inliers) & (pnp_med < prior_med)
        r = jnp.where(ok, pnp.r, r_prior)
        t_ = jnp.where(ok, pnp.t, t_prior)
        return key2, r, t_, ok, pnp.num_inliers.astype(jnp.int32), pnp_med

    def skip(key):
        return (key, r_prior, t_prior, jnp.zeros((), bool),
                jnp.int32(0), jnp.float32(jnp.nan))

    key, r, t_, used, pnp_inl, pnp_med = jax.lax.cond(rescue, do, skip, key)
    return key, r, t_, (rescue, used, support, prior_med, pnp_inl, pnp_med)


@partial(jax.jit, static_argnames=("min_inliers", "threshold",
                                   "num_samples"))
def _pnp_init_device(key, points, obs_i, pnp_mask, kmat, r_prior, t_prior,
                     min_inliers: int, threshold: float, num_samples: int):
    """Support-gated RANSAC PnP as one jitted program (lax.cond must live
    under jit — eager cond re-traces its branches on every call).  The key
    splits only when PnP runs, matching the host-gated RNG stream."""
    from photogrammetry_tpu.sfm.pnp import ransac_pnp

    def do(key):
        key2, sub = jax.random.split(key)
        pnp = ransac_pnp(sub, points, obs_i, pnp_mask, kmat,
                         threshold=threshold, num_samples=num_samples)
        return key2, pnp.r, pnp.t

    def skip(key):
        return key, r_prior, t_prior

    return jax.lax.cond(jnp.sum(pnp_mask) >= min_inliers, do, skip, key)


@jax.jit
def _rescale_gauge(rs, ts, table: TrackTable):
    """Similarity-rescale the reconstruction about camera 0's center so
    ||center_1 - center_0|| == 1 (the two-view bootstrap's unit baseline).

    Rotations and the projective image of every point are invariant under a
    similarity about c0; only ts and landmarks change.  Guarded to a no-op
    when frames 0/1 coincide (pre-bootstrap), and the factor is clamped to
    [0.1, 10] per call: a PnP-derived frame-1 pose can legitimately sit very
    close to frame 0 (near-static start), and an unclamped 1/baseline would
    inflate the map past the max-depth retriangulation gate.  Repeated calls
    still converge the baseline to 1 when it is genuinely off."""
    centers = -jnp.einsum("fji,fj->fi", rs, ts)
    baseline = jnp.linalg.norm(centers[1] - centers[0])
    s = jnp.where(baseline > 1e-9, 1.0 / jnp.maximum(baseline, 1e-9), 1.0)
    s = jnp.clip(s, 0.1, 10.0)
    c0 = centers[0]
    new_centers = c0[None, :] + s * (centers - c0[None, :])
    new_ts = -jnp.einsum("fij,fj->fi", rs, new_centers)
    new_points = c0[None, :] + s * (table.points - c0[None, :])
    return rs, new_ts, table._replace(points=new_points)


@jax.jit
def _prune_observations(table: TrackTable, rs, ts, k,
                        prune_px) -> TrackTable:
    """Drop observations of triangulated tracks whose reprojection error
    exceeds ``prune_px`` (outlier matches), and retire landmarks left with
    fewer than two observations so they get retriangulated."""
    pred, z, _ = project(rs, ts, table.points, k)
    err = jnp.linalg.norm(pred - table.obs, axis=-1)
    bad = table.has_point[None, :] & table.obs_mask & \
        ((err > prune_px) | (z <= 0))
    obs_mask = table.obs_mask & ~bad
    n_obs = jnp.sum(obs_mask, axis=0)
    has_point = table.has_point & (n_obs >= 2)
    return table._replace(obs_mask=obs_mask, has_point=has_point)


def _bootstrap_map(key, table: TrackTable, rs, ts, kmat, config: "SfmConfig",
                   t: int, num_frames: int):
    """Initialize the map from the (0, t) track pair + PnP intermediates.

    Runs ``bootstrap_attempts`` independent two-view RANSAC draws; each
    candidate triangulates the (0, t) correspondences, PnP-initializes
    frames 1..t-1 from the fresh landmarks (track chains pass through every
    intermediate frame, so support is dense), and bundle-adjusts frames
    1..t.  Arbitration: among candidates whose post-BA support
    (observations reprojecting within 2 px at positive depth on >= 2
    frames) is within 10% of the best, the lowest mean supported
    reprojection error wins — raw-support argmax alone picks wrong basins
    whose loose geometry happens to clear the 2 px gate on a few extra
    points (the seed-sweep p90 tail, scripts/sweep_sfm_seeds.py).
    Returns (rs, ts, table-with-landmarks, support).
    """

    pair_mask = jnp.zeros_like(table.obs_mask)
    pair_mask = pair_mask.at[0].set(table.obs_mask[0])
    pair_mask = pair_mask.at[t].set(table.obs_mask[t])
    both = table.obs_mask[0] & table.obs_mask[t]
    attempts = max(1, config.bootstrap_attempts)

    def attempt(sub):
        """One full bootstrap candidate: two-view -> triangulate -> PnP
        intermediates -> BA -> arbitration scalars.  vmapped over attempt
        keys (round 4): the 4 sequential attempts were ~200 ms of the
        8-frame run's ~0.9 s device time; one batched program runs them
        together."""
        tv = two_view_pipeline(sub, table.obs[t], table.obs[0], both, kmat,
                               threshold=config.ransac_threshold,
                               num_samples=config.ransac_samples)
        # called with xy1=frame t, xy2=frame 0: (tv.r, tv.t) maps frame-t
        # coords to frame-0; invert for frame t's world->cam pose.
        rs_c = rs.at[t].set(tv.r.T)
        ts_c = ts.at[t].set(-tv.r.T @ tv.t)
        # triangulate from the (0, t) pair only
        cand = _triangulate_tracks_nview(
            table._replace(obs_mask=pair_mask), rs_c, ts_c, kmat,
            config.min_depth, config.max_depth)
        cand = cand._replace(obs_mask=table.obs_mask)
        # PnP the intermediate frames off the fresh landmarks (support
        # gate is a device-side cond; under vmap it lowers to select).
        k = sub
        for i in range(1, t):
            pnp_mask = cand.obs_mask[i] & cand.has_point
            k, r_i, t_i = _pnp_init_device(
                k, cand.points, cand.obs[i], pnp_mask, kmat,
                rs_c[i], ts_c[i],
                min_inliers=config.min_pnp_inliers,
                threshold=config.pnp_threshold,
                num_samples=config.pnp_samples)
            rs_c = rs_c.at[i].set(r_i)
            ts_c = ts_c.at[i].set(t_i)
        state = BAState(rs=rs_c, ts=ts_c, points=cand.points)
        prob = BAProblem(obs=cand.obs,
                         mask=cand.obs_mask & cand.has_point[None, :],
                         k=kmat)
        fixed = jnp.zeros((num_frames,))
        fixed = fixed.at[jnp.arange(1, t + 1)].set(1.0)
        res = bundle_adjust(state, prob, num_iterations=20,
                            fixed_cameras=fixed)
        pred, z, _ = project(res.state.rs, res.state.ts, res.state.points,
                             kmat)
        err = jnp.linalg.norm(pred - cand.obs, axis=-1)
        okobs = prob.mask & (err < 2.0) & (z > config.min_depth)
        support_d = jnp.sum(jnp.sum(okobs, axis=0) >= 2)
        mean_err_d = (jnp.sum(jnp.where(okobs, err, 0.0))
                      / jnp.maximum(jnp.sum(okobs), 1))
        return (support_d, mean_err_d, res.state.rs, res.state.ts,
                res.state.points, cand.has_point)

    key, *subs = jax.random.split(key, attempts + 1)
    sup_a, err_a, rs_a, ts_a, pts_a, hp_a = jax.vmap(attempt)(
        jnp.stack(subs))
    # Arbitration on device: among candidates whose support is within 10%
    # of the best, lowest mean supported reprojection error wins.
    smax = jnp.max(sup_a)
    near = sup_a >= 0.9 * smax.astype(jnp.float32)
    pick = jnp.argmin(jnp.where(near, err_a, jnp.inf))
    rs, ts = rs_a[pick], ts_a[pick]
    table = table._replace(points=pts_a[pick], has_point=hp_a[pick])
    # support stays a device scalar: ANY readback here would permanently
    # flip the process to sync dispatch (docs/tpu_notes.md §3); the caller
    # converts it after the final export
    return rs, ts, table, sup_a[pick]


@partial(jax.jit, static_argnames=("capacity",))
def _chain_extend_device(table: TrackTable, kp_track_prev2, t, feats, pm,
                         capacity: int):
    """Frame-t track chaining as ONE program: slice the precomputed
    matches/gates, merge consecutive + skip claims, extend the table.
    Returns (table, kp_track_prev snapshot, chained-count scalar)."""
    tid = merge_skip_matches(table.kp_track, kp_track_prev2,
                             pm.idx1[t], pm.good1[t],
                             pm.idx2[t], pm.good2[t], capacity)
    kp_track_prev = table.kp_track
    n_chained = jnp.sum(tid >= 0).astype(jnp.int32)
    table = extend_tracks_with_tid(table, t, feats.xy[t],
                                   feats.points.mask[t], tid)
    return table, kp_track_prev, n_chained


@partial(jax.jit, static_argnames=("min_inliers", "rescue_px", "threshold",
                                   "num_samples"))
def _pnp_rescue_pose(key, table: TrackTable, rs, ts, t, kmat,
                     min_inliers: int, rescue_px: float, threshold: float,
                     num_samples: int):
    """_pnp_rescue_device plus the pose-row updates, as one program."""
    pnp_mask = table.obs_mask[t] & table.has_point
    key, r_t, t_t, diag = _pnp_rescue_device(
        key, table.points, table.obs[t], pnp_mask, kmat,
        rs[t - 1], ts[t - 1], min_inliers=min_inliers,
        rescue_px=rescue_px, threshold=threshold, num_samples=num_samples)
    return key, rs.at[t].set(r_t), ts.at[t].set(t_t), diag


class DeviceSfmResult:
    """Device-side result: everything still on the chip, ZERO reads taken.

    Produced by ``run_incremental_sfm(..., export=False)`` — the handle a
    zero-read pipeline holds until its one final export.  On the tunnel
    toolchain the process's FIRST device->host read permanently flips it
    into ~17 ms/program synchronous dispatch (docs/tpu_notes.md §3), so a
    clean-mode run must defer even the trajectory readback; call
    ``export_sfm_result`` (one batched device_get) when done.
    """

    def __init__(self, rs, ts, table, costs, frame_info, pending_support):
        self.rs = rs
        self.ts = ts
        self.table = table
        self.costs = costs
        self.frame_info = frame_info
        self.pending_support = pending_support


def export_sfm_result(dev: "DeviceSfmResult") -> "SfmResult":
    """ONE batched device->host transfer closing a zero-read run."""
    rs_h, ts_h, costs_h = jax.device_get(
        (dev.rs, dev.ts,
         jnp.stack(dev.costs) if dev.costs else jnp.zeros((0,))))
    if dev.pending_support is not None:
        info_d, support_d = dev.pending_support
        info_d["bootstrap_support"] = int(support_d)
    return SfmResult(rs_h, ts_h, dev.table, [float(c) for c in costs_h],
                     dev.frame_info)


class SfmResult:
    """Host-side result: trajectory + landmarks + diagnostics."""

    def __init__(self, rs, ts, table: TrackTable, costs, frame_info=None):
        self.rs = np.asarray(rs)
        self.ts = np.asarray(ts)
        self.table = table
        self.costs = costs
        # per-frame dicts: matches, gated matches, pose-init path taken,
        # PnP support/inlier counts, prior/pnp median reprojection errors
        self.frame_info = frame_info or []

    @property
    def camera_centers(self) -> np.ndarray:
        return -np.einsum("fji,fj->fi", self.rs, self.ts)

    @property
    def points(self) -> np.ndarray:
        hp = np.asarray(self.table.has_point)
        return np.asarray(self.table.points)[hp]


def run_incremental_sfm(frames: np.ndarray, k: np.ndarray,
                        config: SfmConfig | None = None,
                        seed: int = 0,
                        checkpoint_path: str | None = None,
                        checkpoint_every: int = 4,
                        resume: bool = True,
                        export: bool = True) -> SfmResult:
    """frames: (F, H, W) grayscale uint8/float; k: (3, 3) intrinsics.

    With checkpoint_path set, (poses, landmarks, track table) snapshot
    atomically every ``checkpoint_every`` frames and a rerun resumes from
    the latest snapshot (store/checkpoint.py).

    export=False returns a DeviceSfmResult with ZERO device->host reads
    taken (requires read_free=True, collect_diagnostics=False and no
    checkpointing); finish with export_sfm_result.  See
    scripts/bench_sfm_clean.py for why this matters on the tunnel runtime.
    """
    config = config or SfmConfig()
    fc = config.frontend
    num_frames = len(frames)
    key = jax.random.PRNGKey(seed)
    pairs = make_pairs(fc)
    kmat = jnp.asarray(k, jnp.float32)

    table = make_track_table(num_frames, config.track_capacity,
                             fc.max_keypoints
                             * max(1, config.pyramid_octaves))
    rs = jnp.tile(jnp.eye(3)[None], (num_frames, 1, 1))
    ts = jnp.zeros((num_frames, 3))
    costs = []
    frame_info = []
    start_frame = 1

    # ONE stacked host->device upload + a few batched (detect|brief|refine)
    # programs for the whole sequence: the per-frame upload (~1 MB over the
    # ~45 ms-RTT tunnel) plus 3 detect dispatches per frame previously
    # dominated the steady-state loop (docs/tpu_notes.md §6).
    feats = precompute_frontend(jnp.asarray(frames, jnp.float32), pairs, fc,
                                chunk=config.frontend_chunk,
                                octaves=max(1, config.pyramid_octaves))

    use_pm = config.precompute_matching
    pm = None
    if use_pm:
        from photogrammetry_tpu.sfm.frontend import precompute_matching

        key, kmatch = jax.random.split(key)
        pm = precompute_matching(feats, fc, kmatch, num_frames,
                                 config.ransac_threshold,
                                 config.ransac_samples // 2,
                                 chunk=config.frontend_chunk)

    import os

    if checkpoint_path and resume and os.path.isfile(checkpoint_path):
        from photogrammetry_tpu.store.checkpoint import load_checkpoint

        rs, ts, table, done, _ = load_checkpoint(checkpoint_path)
        if done + 1 >= num_frames:
            return SfmResult(rs, ts, table, costs, frame_info)
        start_frame = done + 1
        prev = frame_features(feats, done)
        # restore the kp->track mapping of the resumed frame by re-matching
        # its keypoints against the stored observation row
        obs_row = table.obs[done]
        d = jnp.linalg.norm(prev.xy[:, None, :] - obs_row[None], axis=-1)
        d = jnp.where(table.obs_mask[done][None, :], d, 1e9)
        nearest = jnp.argmin(d, axis=1)
        ok = (jnp.take_along_axis(d, nearest[:, None], axis=1)[:, 0] < 0.5) \
            & prev.points.mask
        table = table._replace(
            kp_track=jnp.where(ok, nearest, -1).astype(jnp.int32))
        map_ready = bool(jnp.any(table.has_point))
    else:
        prev = frame_features(feats, 0)
        table = start_tracks(table, jnp.int32(0), prev.xy, prev.points.mask)
        map_ready = False

    prev2 = None            # features of frame t-2
    kp_track_prev2 = None   # frame t-2 keypoint -> track id snapshot

    use_fused = config.fused_steady_steps
    if use_fused is None:
        # OFF everywhere (measured round 4): the fused per-frame program
        # is ~2x slower than the staged loop on CPU (compile + execution)
        # and ~5x slower on the tunnel TPU (large programs serialize,
        # tpu_notes §7: 2.3 vs 11.2 fps).  Strictly opt-in for runtimes
        # where one-dispatch-per-frame wins.
        use_fused = False
    steady_step = (_make_steady_step(config, num_frames) if use_fused
                   else None)
    pending_support = None  # device scalar, converted after final export

    for t in range(start_frame, num_frames):
        if (steady_step is not None and map_ready and t >= 2
                and kp_track_prev2 is not None):
            carry = (table, rs, ts, key, kp_track_prev2)
            (table, rs, ts, key, kp_track_prev2), cost = steady_step(
                feats, pm, kmat, carry, jnp.int32(t))
            costs.append(cost)
            frame_info.append({"frame": t, "pose_init": "fused_step"})
            prev2 = prev
            prev = None if use_pm else frame_features(feats, t)
            continue
        if use_pm:
            # chaining as ONE program off the precomputed matches+gates
            cur = None
            kp2 = kp_track_prev2 if kp_track_prev2 is not None \
                else jnp.full_like(table.kp_track, -1)
            table, kp_track_prev, n_chained = _chain_extend_device(
                table, kp2, jnp.int32(t), feats, pm,
                config.track_capacity)
            info = {"frame": t, "pose_init": "prior"}
            if config.collect_diagnostics:
                info.update(matches=int(pm.num1[t]),
                            gated_matches=int(jnp.sum(pm.good1[t])),
                            chained=int(n_chained))
        else:
            cur = frame_features(feats, t)
            m = match_pair(cur, prev, fc)  # rows = current frame's kps
            # Epipolar gating: only RANSAC-inlier matches may chain tracks
            # (outlier matches would switch track identities, poison BA).
            key, sub = jax.random.split(key)
            gate = ransac_fundamental(sub, m.xy1, m.xy2, m.mask,
                                      threshold=config.ransac_threshold,
                                      num_samples=config.ransac_samples // 2)
            good = m.mask & gate.inliers
            kp_track_prev = table.kp_track
            if prev2 is not None:
                # Skip-frame matching: a single dropped detection/match no
                # longer kills a track — unclaimed keypoints also match
                # frame t-2 (own epipolar gate) and chain onto its tracks.
                m2 = match_pair(cur, prev2, fc)
                key, sub = jax.random.split(key)
                gate2 = ransac_fundamental(
                    sub, m2.xy1, m2.xy2, m2.mask,
                    threshold=config.ransac_threshold,
                    num_samples=config.ransac_samples // 2)
                good2 = m2.mask & gate2.inliers
                tid = merge_skip_matches(kp_track_prev, kp_track_prev2,
                                         m.idx2, good, m2.idx2, good2,
                                         config.track_capacity)
            else:
                tid = jnp.where(good, kp_track_prev[jnp.clip(m.idx2, 0)],
                                -1).astype(jnp.int32)
            table = extend_tracks_with_tid(table, jnp.int32(t), cur.xy,
                                           cur.points.mask, tid)
            info = {"frame": t, "pose_init": "prior"}
            if config.collect_diagnostics:
                info.update(matches=int(m.num),
                            gated_matches=int(jnp.sum(good)),
                            chained=int(jnp.sum(tid >= 0)))

        if not map_ready:
            force = (t == num_frames - 1) or (t >= config.bootstrap_max_defer)
            if config.read_free:
                # zero-read trigger: bootstrap at the fixed max-defer
                # frame (any device->host read permanently flips this
                # process to sync dispatch — see SfmConfig.read_free)
                disp = None
                trigger = force
            else:
                both = table.obs_mask[0] & table.obs_mask[t]
                # one fused scalar read (each read costs a tunnel RTT):
                # median displacement, 0 when fewer than 16 shared tracks
                disp_d = jnp.where(
                    jnp.sum(both) >= 16,
                    jnp.nanmedian(jnp.where(
                        both,
                        jnp.linalg.norm(table.obs[t] - table.obs[0],
                                        axis=-1),
                        jnp.nan)),
                    0.0)
                disp = float(disp_d)
                trigger = disp >= config.bootstrap_min_disp_px or force
            if trigger:
                key, sub = jax.random.split(key)
                rs, ts, table, support = _bootstrap_map(
                    sub, table, rs, ts, kmat, config, t, num_frames)
                map_ready = True
                info.update(pose_init="bootstrap", bootstrap_pair=(0, t))
                if disp is not None:
                    info["bootstrap_disp_px"] = round(disp, 1)
                # support is a device scalar; converted after the final
                # export so the loop stays read-free
                pending_support = (info, support)
            else:
                # keep accumulating tracks poseless
                info.update(pose_init="deferred")
                if disp is not None:
                    info["bootstrap_disp_px"] = round(disp, 1)
                frame_info.append(info)
                prev2, kp_track_prev2 = prev, kp_track_prev
                prev = cur
                # Deferred frames still honor the checkpoint cadence so a
                # crash during the poseless phase resumes mid-deferral
                # instead of from scratch.
                if checkpoint_path and (t % checkpoint_every == 0
                                        or t == num_frames - 1):
                    from photogrammetry_tpu.store.checkpoint import (
                        save_checkpoint,
                    )

                    save_checkpoint(checkpoint_path, rs, ts, table, t,
                                    metadata={"frame": t, "cost": None})
                continue
        else:
            # Pose init: small-motion prior (previous pose) by default;
            # RANSAC PnP against the triangulated map *rescues* the frame
            # when the prior has demonstrably failed (median map
            # reprojection error > pnp_rescue_px — large motion, tracking
            # loss, relocalization).  See SfmConfig.pnp_rescue_px.
            if config.use_pnp:
                # The entire rescue decision + RANSAC PnP runs as one
                # device program (lax.cond): zero host round-trips on the
                # common path.  Every scalar read costs a full tunnel RTT
                # (~45 ms measured); the old per-frame rescue readback
                # alone capped the loop at a few frames/s while all device
                # stages are ~0.2 ms warm (docs/tpu_notes.md §3).
                if use_pm:
                    key, rs, ts, diag = _pnp_rescue_pose(
                        key, table, rs, ts, jnp.int32(t), kmat,
                        min_inliers=config.min_pnp_inliers,
                        rescue_px=config.pnp_rescue_px,
                        threshold=config.pnp_threshold,
                        num_samples=config.pnp_samples)
                else:
                    pnp_mask = table.obs_mask[t] & table.has_point
                    key, r_t, t_t, diag = _pnp_rescue_device(
                        key, table.points, table.obs[t], pnp_mask, kmat,
                        rs[t - 1], ts[t - 1],
                        min_inliers=config.min_pnp_inliers,
                        rescue_px=config.pnp_rescue_px,
                        threshold=config.pnp_threshold,
                        num_samples=config.pnp_samples)
                    rs = rs.at[t].set(r_t)
                    ts = ts.at[t].set(t_t)
                if config.collect_diagnostics:
                    rescued, used, support_d, prior_med, pnp_inl, pnp_med \
                        = diag
                    info.update(pnp_support=int(support_d),
                                prior_med_px=float(prior_med))
                    if bool(rescued):
                        info.update(pnp_inliers=int(pnp_inl),
                                    pnp_med_px=float(pnp_med))
                    if bool(used):
                        info["pose_init"] = "pnp"
            else:
                rs = rs.at[t].set(rs[t - 1])
                ts = ts.at[t].set(ts[t - 1])
            # motion-only BA on all frames so far (only camera t free).
            # NOTE round 5: the stage stays at single-op granularity —
            # fusing motion-BA / reassoc+triangulate / window-BA+rescale+
            # prune into per-frame programs measured SLOWER on the chip
            # (4.4 vs 8.5 fps: the §7 large-program serialization
            # pathology again); only chaining and PnP, which replace
            # many tiny dispatches, stay fused.
            state = BAState(rs=rs, ts=ts, points=table.points)
            prob = BAProblem(
                obs=table.obs,
                mask=table.obs_mask & table.has_point[None, :],
                k=kmat)
            fixed = jnp.zeros((num_frames,)).at[t].set(1.0)
            res = bundle_adjust(state, prob, num_iterations=10,
                                fixed_cameras=fixed,
                                optimize_points=False)
            rs, ts = res.state.rs, res.state.ts

            # Map-guided re-association: re-attach keypoints whose
            # consecutive-frame chain broke to the landmark tracks they
            # project onto (now that frame t's pose is estimated).
            if config.reassociate:
                xy_t = cur.xy if cur is not None else feats.xy[t]
                mask_t = (cur.points.mask if cur is not None
                          else feats.points.mask[t])
                table, n_re = reassociate_to_landmarks(
                    table, jnp.int32(t), xy_t, mask_t,
                    rs[t], ts[t], kmat, config.reassociate_px)
                if config.collect_diagnostics:
                    info["reassociated"] = int(n_re)

        if config.nview_triangulation:
            table = _triangulate_tracks_nview(table, rs, ts, kmat,
                                              config.min_depth,
                                              config.max_depth)
        else:
            first, last = first_last_observations(table)
            table = _triangulate_tracks(table, rs, ts, kmat, first, last,
                                        config.min_depth, config.max_depth)

        # windowed full BA: freeze cameras before the window and frame 0/1
        state = BAState(rs=rs, ts=ts, points=table.points)
        prob = BAProblem(obs=table.obs,
                         mask=table.obs_mask & table.has_point[None, :],
                         k=kmat)
        w0 = max(0, t + 1 - config.window)
        fixed = jnp.zeros((num_frames,))
        fixed = fixed.at[jnp.arange(w0, t + 1)].set(1.0)
        fixed = fixed.at[0].set(0.0)  # SE(3) gauge
        if config.mesh is not None:
            from photogrammetry_tpu.parallel.dist_ba import (
                distributed_bundle_adjust,
            )

            res = distributed_bundle_adjust(
                state, prob, config.mesh,
                num_iterations=config.ba_iterations, fixed_cameras=fixed)
        else:
            res = bundle_adjust(state, prob,
                                num_iterations=config.ba_iterations,
                                fixed_cameras=fixed)
        rs, ts = res.state.rs, res.state.ts
        table = table._replace(points=res.state.points)
        # Monocular scale gauge: with only camera 0 frozen the
        # similarity scale is a flat direction of the BA cost and long
        # LM runs drift along it.  Rather than freezing camera 1
        # (which would anchor its two-view pose error forever),
        # renormalize the reconstruction about camera 0's center so
        # the 0-1 baseline stays unit length.
        rs, ts, table = _rescale_gauge(rs, ts, table)
        table = _prune_observations(table, rs, ts, kmat,
                                    config.prune_px)
        # 0-d device scalar, NOT read here — per-frame cost readbacks
        # cost one tunnel RTT each; converted once after the loop.
        costs.append(res.cost)
        frame_info.append(info)
        prev2, kp_track_prev2 = prev, kp_track_prev
        prev = cur

        if checkpoint_path and (t % checkpoint_every == 0
                                or t == num_frames - 1):
            from photogrammetry_tpu.store.checkpoint import save_checkpoint

            save_checkpoint(checkpoint_path, rs, ts, table, t,
                            metadata={"frame": t, "cost": float(costs[-1])})

    if config.final_ba_iterations > 0 and num_frames >= 2:
        fixed = jnp.ones((num_frames,)).at[0].set(0.0)
        for rnd in range(1 + max(0, config.final_refine_rounds)):
            if rnd > 0:
                # Re-triangulate every track from the converged poses:
                # landmarks frozen early at noisy geometry get refreshed,
                # which is what lets the pipeline climb out of a bad
                # bootstrap basin.
                table = _retriangulate_all(table, rs, ts, kmat,
                                           config.min_depth,
                                           config.max_depth)
                table = _prune_observations(table, rs, ts, kmat,
                                            config.prune_px)
            state = BAState(rs=rs, ts=ts, points=table.points)
            prob = BAProblem(obs=table.obs,
                             mask=table.obs_mask & table.has_point[None, :],
                             k=kmat)
            if config.mesh is not None:
                from photogrammetry_tpu.parallel.dist_ba import (
                    distributed_bundle_adjust,
                )

                res = distributed_bundle_adjust(
                    state, prob, config.mesh,
                    num_iterations=config.final_ba_iterations,
                    fixed_cameras=fixed)
            else:
                res = bundle_adjust(state, prob,
                                    num_iterations=config.final_ba_iterations,
                                    fixed_cameras=fixed)
            rs, ts = res.state.rs, res.state.ts
            table = table._replace(points=res.state.points)
            rs, ts, table = _rescale_gauge(rs, ts, table)
            costs.append(res.cost)

    dev = DeviceSfmResult(rs=rs, ts=ts, table=table, costs=costs,
                          frame_info=frame_info,
                          pending_support=pending_support)
    if not export:
        return dev
    # ONE batched device->host transfer for everything the result needs —
    # sequential np.asarray/float() calls each pay the tunnel RTT.
    return export_sfm_result(dev)


def reconstruction_quality(res: SfmResult, k: np.ndarray,
                           err_px: float = 2.0, min_depth: float = 0.1):
    """(support, median reprojection error px) of a finished reconstruction.

    support = tracks observed within ``err_px`` at positive depth on >= 2
    frames; median error is over all valid observations.  Across-seed
    measurement (scripts/sweep_sfm_seeds.py, 20 seeds): median error
    separates good from bad RANSAC basins cleanly (<= 0.57 px vs >= 0.59
    px on the 8-frame pan) and support flags catastrophic ones — the basis
    of best-of-restarts selection.
    """
    t = res.table
    kmat = jnp.asarray(k, jnp.float32)
    pred, z, _ = project(jnp.asarray(res.rs, jnp.float32),
                         jnp.asarray(res.ts, jnp.float32), t.points, kmat)
    err = jnp.linalg.norm(pred - t.obs, axis=-1)
    m = t.obs_mask & t.has_point[None, :]
    ok = m & (err < err_px) & (z > min_depth)
    support = int(jnp.sum(jnp.sum(ok, axis=0) >= 2))
    med = float(jnp.nanmedian(jnp.where(m, err, jnp.nan)))
    return support, med


def run_incremental_sfm_robust(frames: np.ndarray, k: np.ndarray,
                               config: SfmConfig | None = None,
                               seed: int = 0, restarts: int = 3,
                               target_med_px: float | None = None,
                               max_restarts: int = 8,
                               **kwargs) -> SfmResult:
    """Best-of-``restarts`` incremental SfM.

    The only stochastic inputs are the RANSAC draws, so independent
    restarts land in independent basins; the winner is chosen WITHOUT
    ground truth, by reconstruction_quality: support is primary (a
    collapsed map can score a low median error over its small consistent
    core, so error must never outvote a clearly larger consensus —
    observed on a 6-frame scene where a support-72 collapse beat a
    support-90 good run under a loose 0.7 floor), and median reprojection
    error breaks near-ties (within 5% of the best support).  Cuts the
    across-seed p90 ATE tail at the cost of ``restarts`` sequential runs —
    each reuses the jitted programs, so the wall-clock multiplier is well
    below the restart count.

    target_med_px escalates the restart budget adaptively: if after the
    base ``restarts`` no candidate reaches the target median error, keep
    drawing (up to ``max_restarts``).  Bas-relief-shifted basins (wrong
    trajectory curvature) fit observations almost as well as the true one
    and evade the support test, but their median error runs visibly higher
    (measured ~0.58 px vs ~0.39 px on the orbit windows) — escalation
    buys more draws exactly when the pool looks suspicious.
    """
    candidates = []
    i = 0
    while True:
        res = run_incremental_sfm(frames, k, config,
                                  seed=seed + 7919 * i, **kwargs)
        support, med = reconstruction_quality(res, k)
        res.quality = (support, med)
        candidates.append((support, med, res))
        i += 1
        if i < max(1, restarts):
            continue
        if (target_med_px is not None and i < max_restarts
                and min(c[1] for c in candidates) > target_med_px):
            continue
        break
    smax = max(c[0] for c in candidates)
    best = min((c for c in candidates if c[0] >= 0.95 * smax),
               key=lambda c: c[1])
    return best[2]


def _make_steady_step(config: SfmConfig, num_frames: int):
    """The fused per-frame steady-state body as ONE jitted program.

    match -> gate -> skip-match -> chain -> extend -> PnP-rescue cond ->
    motion-only BA -> reassociate -> triangulate -> windowed BA ->
    rescale -> prune, with the frame index ``t`` traced (one compile
    covers every frame).  Replaces ~20 separate dispatches per steady
    frame in the host loop — decisive on the tunnel toolchain, where a
    single device->host readback anywhere in the process permanently
    flips dispatch to a synchronous ~17 ms/program mode (measured round
    4; docs/tpu_notes.md §3): even poisoned, a fused step costs one
    period instead of twenty.  RNG split order matches the staged path
    exactly, so staged/fused/scan produce bit-identical results.

    Requires t >= 2 (uses frames t-1 and t-2).
    """
    fc = config.frontend

    @partial(jax.jit, static_argnames=())
    def step(feats, pm, kmat, carry, t):
        table, rs, ts, key, kp_track_prev2 = carry

        def frame_at(i):
            from photogrammetry_tpu.sfm.frontend import DescribedFrame
            from photogrammetry_tpu.utils.padding import PaddedPoints

            pts = PaddedPoints(
                coords=feats.points.coords[i], score=feats.points.score[i],
                mask=feats.points.mask[i], count=feats.points.count[i])
            return DescribedFrame(points=pts, bits=feats.bits[i],
                                  xy=feats.xy[i])

        cur = frame_at(t)
        kp_track_prev = table.kp_track
        if pm is not None:
            # precomputed matches/gates: same merge semantics, no in-step
            # matching (matches the staged pm path bit-for-bit)
            tid = merge_skip_matches(kp_track_prev, kp_track_prev2,
                                     pm.idx1[t], pm.good1[t],
                                     pm.idx2[t], pm.good2[t],
                                     config.track_capacity)
        else:
            prev = frame_at(t - 1)
            prev2 = frame_at(t - 2)
            m = match_pair(cur, prev, fc)
            key, sub = jax.random.split(key)
            gate = ransac_fundamental(sub, m.xy1, m.xy2, m.mask,
                                      threshold=config.ransac_threshold,
                                      num_samples=config.ransac_samples // 2)
            good = m.mask & gate.inliers
            m2 = match_pair(cur, prev2, fc)
            key, sub = jax.random.split(key)
            gate2 = ransac_fundamental(sub, m2.xy1, m2.xy2, m2.mask,
                                       threshold=config.ransac_threshold,
                                       num_samples=config.ransac_samples
                                       // 2)
            good2 = m2.mask & gate2.inliers
            tid = merge_skip_matches(kp_track_prev, kp_track_prev2,
                                     m.idx2, good, m2.idx2, good2,
                                     config.track_capacity)
        table = extend_tracks_with_tid(table, t, cur.xy,
                                       cur.points.mask, tid)

        if config.use_pnp:
            pnp_mask = table.obs_mask[t] & table.has_point
            key, r_t, t_t, _ = _pnp_rescue_device(
                key, table.points, table.obs[t], pnp_mask, kmat,
                rs[t - 1], ts[t - 1],
                min_inliers=config.min_pnp_inliers,
                rescue_px=config.pnp_rescue_px,
                threshold=config.pnp_threshold,
                num_samples=config.pnp_samples)
            rs = rs.at[t].set(r_t)
            ts = ts.at[t].set(t_t)
        else:
            rs = rs.at[t].set(rs[t - 1])
            ts = ts.at[t].set(ts[t - 1])

        state = BAState(rs=rs, ts=ts, points=table.points)
        prob = BAProblem(obs=table.obs,
                         mask=table.obs_mask & table.has_point[None, :],
                         k=kmat)
        fixed = jnp.zeros((num_frames,)).at[t].set(1.0)
        res = bundle_adjust(state, prob, num_iterations=10,
                            fixed_cameras=fixed, optimize_points=False)
        rs, ts = res.state.rs, res.state.ts

        if config.reassociate:
            table, _ = reassociate_to_landmarks(
                table, t, cur.xy, cur.points.mask,
                rs[t], ts[t], kmat, config.reassociate_px)

        if config.nview_triangulation:
            table = _triangulate_tracks_nview(table, rs, ts, kmat,
                                              config.min_depth,
                                              config.max_depth)
        else:
            first, last = first_last_observations(table)
            table = _triangulate_tracks(table, rs, ts, kmat, first, last,
                                        config.min_depth, config.max_depth)

        state = BAState(rs=rs, ts=ts, points=table.points)
        prob = BAProblem(obs=table.obs,
                         mask=table.obs_mask & table.has_point[None, :],
                         k=kmat)
        w0 = jnp.maximum(0, t + 1 - config.window)
        fr = jnp.arange(num_frames)
        fixed = ((fr >= w0) & (fr <= t)).astype(jnp.float32)
        fixed = fixed.at[0].set(0.0)  # SE(3) gauge
        res = bundle_adjust(state, prob,
                            num_iterations=config.ba_iterations,
                            fixed_cameras=fixed)
        rs, ts = res.state.rs, res.state.ts
        table = table._replace(points=res.state.points)
        rs, ts, table = _rescale_gauge(rs, ts, table)
        table = _prune_observations(table, rs, ts, kmat, config.prune_px)
        return (table, rs, ts, key, kp_track_prev), res.cost

    return step


def _make_steady_scan(config: SfmConfig, num_frames: int, t0: int):
    """One jitted lax.scan covering steady-state frames t0..num_frames-1.

    The per-frame body is _make_steady_step's program; the whole remainder
    of the sequence runs as a single device program: ONE dispatch and zero
    readbacks however long the sequence is (docs/tpu_notes.md §6).  RNG
    splits replicate the host loop order exactly, so fused and host modes
    produce identical trajectories.  (Measured on the tunnel: the scan
    form's one giant program has ~3.4 s device time for 6 frames — slower
    than per-frame fused steps; kept for gather-healthy runtimes.)
    """
    step = _make_steady_step(config, num_frames)

    @partial(jax.jit, static_argnames=())
    def run(feats, pm, kmat, table, rs, ts, key, kp_track_prev2):
        ts_idx = jnp.arange(t0, num_frames)
        carry, costs = jax.lax.scan(
            lambda c, t: step(feats, pm, kmat, c, t),
            (table, rs, ts, key, kp_track_prev2), ts_idx)
        return carry, costs

    return run


def run_incremental_sfm_fused(frames: np.ndarray, k: np.ndarray,
                              config: SfmConfig | None = None,
                              seed: int = 0) -> SfmResult:
    """Incremental SfM with the steady-state loop fused into one lax.scan.

    Identical math and RNG stream to run_incremental_sfm (bit-identical
    results on CPU, asserted in tests; on TPU the differently-fused giant
    program rounds differently, so equivalence is numerical, not bitwise).
    The deferral/bootstrap prefix runs host-side on batched precomputed
    features, then every remaining frame executes inside a single device
    program — per-frame dispatch/readback cost disappears entirely.

    Measured on the axon-tunnel v5e (2026-08-21): the host loop WINS
    there (4.3 vs 1.3 frames/s warm) — the one big scan program hits the
    toolchain's serial multi-gather lowering (docs/tpu_notes.md §1), the
    exact pathology the split-dispatch architecture avoids.  This mode is
    the right shape for toolchains with healthy gather lowering and for
    minimizing host involvement; it is opt-in, not the default.

    No checkpointing or per-frame diagnostics in this mode; requires
    >= 2 steady frames and mesh=None.
    """
    config = config or SfmConfig()
    assert config.mesh is None, "fused mode is single-device"
    fc = config.frontend
    num_frames = len(frames)
    key = jax.random.PRNGKey(seed)
    pairs = make_pairs(fc)
    kmat = jnp.asarray(k, jnp.float32)

    feats = precompute_frontend(jnp.asarray(frames, jnp.float32), pairs,
                                fc, chunk=config.frontend_chunk,
                                octaves=max(1, config.pyramid_octaves))

    pm = None
    if config.precompute_matching:
        from photogrammetry_tpu.sfm.frontend import precompute_matching

        key, kmatch = jax.random.split(key)
        pm = precompute_matching(feats, fc, kmatch, num_frames,
                                 config.ransac_threshold,
                                 config.ransac_samples // 2,
                                 chunk=config.frontend_chunk)

    def frame_at(i):
        from photogrammetry_tpu.sfm.frontend import DescribedFrame
        from photogrammetry_tpu.utils.padding import PaddedPoints

        pts = PaddedPoints(coords=feats.points.coords[i],
                           score=feats.points.score[i],
                           mask=feats.points.mask[i],
                           count=feats.points.count[i])
        return DescribedFrame(points=pts, bits=feats.bits[i], xy=feats.xy[i])

    table = make_track_table(num_frames, config.track_capacity,
                             fc.max_keypoints
                             * max(1, config.pyramid_octaves))
    rs = jnp.tile(jnp.eye(3)[None], (num_frames, 1, 1))
    ts = jnp.zeros((num_frames, 3))
    costs = []
    frame_info = []

    prev = frame_at(0)
    table = start_tracks(table, jnp.int32(0), prev.xy, prev.points.mask)
    map_ready = False
    prev2 = None
    kp_track_prev2 = None
    t_boot = None

    # ---- host prefix: deferral + bootstrap (the only host decisions) ----
    t = 1
    while t < num_frames and not map_ready:
        cur = frame_at(t)
        kp_track_prev = table.kp_track
        if pm is not None:
            kp2 = kp_track_prev2 if kp_track_prev2 is not None \
                else jnp.full_like(table.kp_track, -1)
            table, kp_track_prev, _ = _chain_extend_device(
                table, kp2, jnp.int32(t), feats, pm,
                config.track_capacity)
        else:
            m = match_pair(cur, prev, fc)
            key, sub = jax.random.split(key)
            gate = ransac_fundamental(sub, m.xy1, m.xy2, m.mask,
                                      threshold=config.ransac_threshold,
                                      num_samples=config.ransac_samples // 2)
            good = m.mask & gate.inliers
            if prev2 is not None:
                m2 = match_pair(cur, prev2, fc)
                key, sub = jax.random.split(key)
                gate2 = ransac_fundamental(sub, m2.xy1, m2.xy2, m2.mask,
                                           threshold=config.ransac_threshold,
                                           num_samples=config.ransac_samples
                                           // 2)
                good2 = m2.mask & gate2.inliers
                tid = merge_skip_matches(kp_track_prev, kp_track_prev2,
                                         m.idx2, good, m2.idx2, good2,
                                         config.track_capacity)
            else:
                tid = jnp.where(good, kp_track_prev[jnp.clip(m.idx2, 0)],
                                -1).astype(jnp.int32)
            table = extend_tracks_with_tid(table, jnp.int32(t), cur.xy,
                                           cur.points.mask, tid)
        both = table.obs_mask[0] & table.obs_mask[t]
        disp = float(jnp.where(
            jnp.sum(both) >= 16,
            jnp.nanmedian(jnp.where(
                both,
                jnp.linalg.norm(table.obs[t] - table.obs[0], axis=-1),
                jnp.nan)),
            0.0))
        force = (t == num_frames - 1) or (t >= config.bootstrap_max_defer)
        if disp >= config.bootstrap_min_disp_px or force:
            key, sub = jax.random.split(key)
            rs, ts, table, support = _bootstrap_map(
                sub, table, rs, ts, kmat, config, t, num_frames)
            map_ready = True
            t_boot = t
            frame_info.append({"frame": t, "pose_init": "bootstrap",
                               "bootstrap_pair": (0, t),
                               "bootstrap_support": int(support)})
            # bootstrap frame tail (same as host loop, honoring the
            # configured triangulation path)
            if config.nview_triangulation:
                table = _triangulate_tracks_nview(table, rs, ts, kmat,
                                                  config.min_depth,
                                                  config.max_depth)
            else:
                first, last = first_last_observations(table)
                table = _triangulate_tracks(table, rs, ts, kmat, first,
                                            last, config.min_depth,
                                            config.max_depth)
            state = BAState(rs=rs, ts=ts, points=table.points)
            prob = BAProblem(obs=table.obs,
                             mask=table.obs_mask & table.has_point[None, :],
                             k=kmat)
            w0 = max(0, t + 1 - config.window)
            fixed = jnp.zeros((num_frames,))
            fixed = fixed.at[jnp.arange(w0, t + 1)].set(1.0)
            fixed = fixed.at[0].set(0.0)
            res = bundle_adjust(state, prob,
                                num_iterations=config.ba_iterations,
                                fixed_cameras=fixed)
            rs, ts = res.state.rs, res.state.ts
            table = table._replace(points=res.state.points)
            rs, ts, table = _rescale_gauge(rs, ts, table)
            table = _prune_observations(table, rs, ts, kmat,
                                        config.prune_px)
            costs.append(res.cost)
        else:
            frame_info.append({"frame": t, "pose_init": "deferred"})
        prev2, kp_track_prev2 = prev, kp_track_prev
        prev = cur
        t += 1

    # ---- fused steady state: one scan over the remaining frames --------
    if map_ready and t_boot + 1 < num_frames:
        run = _make_steady_scan(config, num_frames, t_boot + 1)
        (table, rs, ts, key, _), scan_costs = run(
            feats, pm, kmat, table, rs, ts, key, kp_track_prev2)
        for i in range(num_frames - (t_boot + 1)):
            costs.append(scan_costs[i])
            frame_info.append({"frame": t_boot + 1 + i,
                               "pose_init": "scan"})

    # ---- final global BA + refinement rounds (same as host loop) -------
    if config.final_ba_iterations > 0 and num_frames >= 2:
        fixed = jnp.ones((num_frames,)).at[0].set(0.0)
        for rnd in range(1 + max(0, config.final_refine_rounds)):
            if rnd > 0:
                table = _retriangulate_all(table, rs, ts, kmat,
                                           config.min_depth,
                                           config.max_depth)
                table = _prune_observations(table, rs, ts, kmat,
                                            config.prune_px)
            state = BAState(rs=rs, ts=ts, points=table.points)
            prob = BAProblem(obs=table.obs,
                             mask=table.obs_mask & table.has_point[None, :],
                             k=kmat)
            res = bundle_adjust(state, prob,
                                num_iterations=config.final_ba_iterations,
                                fixed_cameras=fixed)
            rs, ts = res.state.rs, res.state.ts
            table = table._replace(points=res.state.points)
            rs, ts, table = _rescale_gauge(rs, ts, table)
            costs.append(res.cost)

    rs_h, ts_h, costs_h = jax.device_get(
        (rs, ts, jnp.stack(costs) if costs else jnp.zeros((0,))))
    return SfmResult(rs_h, ts_h, table, [float(c) for c in costs_h],
                     frame_info)
