"""Displacement-gated keyframing + PnP localization of non-keyframes.

Two-view parallax starves when consecutive frames barely move: on the
blend-derived pan, running all 60 frames gives ATE 0.086 while stride-6
subsampling of the same asset reaches 0.024 (BENCH_FULL.md) — the map
should be built from frames with real baseline.  This module supplies the
standard SLAM answer:

  1. select_keyframes — walk the sequence, opening a new keyframe when
     the median feature displacement against the previous keyframe
     reaches ``min_disp_px`` (the same displacement statistic the
     deferred bootstrap uses);
  2. build the map with run_incremental_sfm on the keyframes only;
  3. localize_nonkeyframes — every skipped frame gets a pose by matching
     its features against the nearest keyframe, inheriting that
     keyframe's 2D-3D associations (landmarks re-projected into the
     keyframe and claimed by proximity), and solving RANSAC PnP.

Net effect: keyframe-quality conditioning for the geometry, a full
per-frame trajectory for the caller.

WHEN IT HELPS: oversampled, near-static spacing (consecutive baseline
well under ~1% of scene depth) — the blend-derived 60-frame pan improves
0.086 -> 0.032.  On already well-spaced sequences, subsetting only
removes BA redundancy and LOSES (24-frame synthetic pan: naive 0.14 vs
keyframed 0.41) — keyframing is a tool for dense video, not a default.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from photogrammetry_tpu.sfm.frontend import (
    FrontendConfig, frame_features, make_pairs, match_pair,
    precompute_frontend,
)
from photogrammetry_tpu.sfm.incremental import SfmConfig, SfmResult
from photogrammetry_tpu.sfm.pnp import ransac_pnp


def select_keyframes(frames: np.ndarray, config: SfmConfig,
                     min_disp_px: float = 30.0):
    """Indices of displacement-gated keyframes (always includes 0 and the
    last frame) plus the per-frame features (reused by localization).

    Threshold note: the statistic is MEDIAN feature displacement, which a
    fixating camera (yawing to keep the subject centered) suppresses to
    parallax-only flow — on such scenes a small threshold (~10-15 px at
    VGA-ish scales) keyframes correctly where 30-40 px would starve the
    map down to its endpoints."""
    fc = config.frontend
    pairs = make_pairs(fc)
    # one stacked upload + batched programs instead of a per-frame loop
    # (frontend.precompute_frontend; same values)
    stacked = precompute_frontend(jnp.asarray(np.asarray(frames),
                                              jnp.float32), pairs, fc,
                                  chunk=config.frontend_chunk)
    feats = [frame_features(stacked, t) for t in range(len(frames))]
    keyframes = [0]
    for t in range(1, len(frames)):
        m = match_pair(feats[t], feats[keyframes[-1]], fc)
        disp = float(jnp.where(
            m.num >= 16,
            jnp.nanmedian(jnp.where(
                m.mask, jnp.linalg.norm(m.xy1 - m.xy2, axis=-1), jnp.nan)),
            jnp.inf))  # tracking lost -> force a keyframe
        if disp >= min_disp_px or t == len(frames) - 1:
            keyframes.append(t)
    return keyframes, feats


def localize_nonkeyframes(frames, keyframes, feats, res: SfmResult,
                          k: np.ndarray, config: SfmConfig,
                          seed: int = 99):
    """Poses for every frame: keyframes keep the SfM poses; each skipped
    frame matches against its nearest keyframe, inherits the keyframe's
    2D-3D track associations and refines a motion-only BA pose from the
    previous frame's (RANSAC DLT-PnP is only the rescue: it needs >= 6
    NON-coplanar samples, and maps dominated by a planar structure — the
    blend star — make clean draws rare).

    TPU discipline (docs/tpu_notes.md §3/§6): poses accumulate on device
    and transfer once at the end; per-frame decisions read one 0-d scalar
    (the inlier count that picks the path).

    Returns (rs (F,3,3), ts (F,3), info list).
    """
    from photogrammetry_tpu.sfm.ba import BAProblem, BAState, bundle_adjust
    from photogrammetry_tpu.sfm.pnp import pnp_reprojection_errors

    fc = config.frontend
    kmat = jnp.asarray(k, jnp.float32)
    num_frames = len(frames)
    kf_pos = {kf: i for i, kf in enumerate(keyframes)}
    table = res.table
    cap = table.points.shape[0]

    # Per-keyframe claim map, computed once per keyframe (not per skipped
    # frame): keyframe keypoint j -> landmark id within 2 px, or -1.
    kp_lm_by_kf = {}
    for kf, row in kf_pos.items():
        kf_xy = feats[kf].xy
        obs = table.obs[row]
        tvalid = table.obs_mask[row] & table.has_point
        d = jnp.linalg.norm(kf_xy[:, None, :] - obs[None], axis=-1)
        d = jnp.where(tvalid[None, :], d, jnp.inf)
        nearest = jnp.argmin(d, axis=1)
        claimed = jnp.take_along_axis(d, nearest[:, None],
                                      axis=1)[:, 0] < 2.0
        kp_lm_by_kf[kf] = jnp.where(claimed & feats[kf].points.mask,
                                    nearest, -1)

    key = jax.random.PRNGKey(seed)
    rs_dev = [None] * num_frames
    ts_dev = [None] * num_frames
    for kf, i in kf_pos.items():
        rs_dev[kf] = jnp.asarray(res.rs[i], jnp.float32)
        ts_dev[kf] = jnp.asarray(res.ts[i], jnp.float32)

    info = []
    for t in range(num_frames):
        if t in kf_pos:
            continue
        kf = min(keyframes, key=lambda x: abs(x - t))
        m = match_pair(feats[t], feats[kf], fc)
        lm = jnp.where(m.mask, kp_lm_by_kf[kf][jnp.clip(m.idx2, 0)], -1)

        # Deterministic landmark->observation selection: when several
        # frame-t keypoints inherit the same landmark, the lowest Hamming
        # distance wins (scatter-MIN of an encoded (dist, kp-index) key is
        # commutative, unlike scatter-set with duplicate indices whose
        # winner is unspecified).
        kcount = lm.shape[0]
        enc = jnp.where(lm >= 0,
                        m.dist.astype(jnp.int32) * kcount
                        + jnp.arange(kcount, dtype=jnp.int32),
                        jnp.iinfo(jnp.int32).max)
        slot_enc = jnp.full((cap,), jnp.iinfo(jnp.int32).max, jnp.int32)
        lm_w = jnp.where(lm >= 0, lm, cap)
        slot_enc = slot_enc.at[lm_w].min(enc, mode="drop")
        pnp_mask = slot_enc < jnp.iinfo(jnp.int32).max
        chosen = jnp.clip(slot_enc % kcount, 0, kcount - 1)
        xy = jnp.where(pnp_mask[:, None], m.xy1[chosen], 0.0)

        prior_r = rs_dev[t - 1] if t > 0 else rs_dev[kf]
        prior_t = ts_dev[t - 1] if t > 0 else ts_dev[kf]
        state = BAState(rs=prior_r[None], ts=prior_t[None],
                        points=table.points)
        prob = BAProblem(obs=xy[None], mask=pnp_mask[None], k=kmat)
        out = bundle_adjust(state, prob, num_iterations=10,
                            optimize_points=False,
                            fixed_cameras=jnp.ones((1,)))
        r_m, t_m = out.state.rs[0], out.state.ts[0]
        err, z = pnp_reprojection_errors(r_m, t_m, table.points, xy, kmat)
        n_in = int(jnp.sum(pnp_mask & (err < config.pnp_threshold)
                           & (z > 0)))
        if n_in >= config.min_pnp_inliers:
            rs_dev[t], ts_dev[t] = r_m, t_m
            info.append({"frame": t, "keyframe": kf, "inliers": n_in,
                         "path": "motion_ba"})
            continue
        key, sub = jax.random.split(key)
        pnp = ransac_pnp(sub, table.points, xy, pnp_mask, kmat,
                         threshold=config.pnp_threshold,
                         num_samples=config.pnp_samples)
        n_pnp = int(pnp.num_inliers)
        if n_pnp >= config.min_pnp_inliers:
            rs_dev[t], ts_dev[t] = pnp.r, pnp.t
            info.append({"frame": t, "keyframe": kf, "inliers": n_pnp,
                         "path": "ransac_pnp"})
        else:
            rs_dev[t], ts_dev[t] = rs_dev[kf], ts_dev[kf]
            info.append({"frame": t, "keyframe": kf, "inliers": n_pnp,
                         "fallback": True})

    # ONE batched device->host transfer for the whole trajectory
    rs, ts = jax.device_get((jnp.stack(rs_dev), jnp.stack(ts_dev)))
    return np.asarray(rs, np.float32), np.asarray(ts, np.float32), info


def run_keyframed_sfm(frames: np.ndarray, k: np.ndarray,
                      config: SfmConfig | None = None,
                      min_disp_px: float = 30.0, seed: int = 0,
                      restarts: int = 1):
    """Full pipeline: keyframe selection -> SfM on keyframes -> PnP
    localization of every skipped frame.

    Returns (rs (F,3,3), ts (F,3), keyframes, res, info).
    """
    from photogrammetry_tpu.sfm.incremental import (
        run_incremental_sfm, run_incremental_sfm_robust,
    )

    config = config or SfmConfig()
    keyframes, feats = select_keyframes(frames, config, min_disp_px)
    kf_frames = np.stack([np.asarray(frames[i]) for i in keyframes])
    if restarts > 1:
        res = run_incremental_sfm_robust(kf_frames, k, config, seed=seed,
                                         restarts=restarts)
    else:
        res = run_incremental_sfm(kf_frames, k, config, seed=seed)
    # distinct localization draws per run seed (restart independence)
    rs, ts, info = localize_nonkeyframes(frames, keyframes, feats, res, k,
                                         config, seed=seed + 99)
    return rs, ts, keyframes, res, info
