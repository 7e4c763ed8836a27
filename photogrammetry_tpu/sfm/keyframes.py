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
    FrontendConfig, detect_and_describe_split, make_pairs, match_pair,
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
    feats = [detect_and_describe_split(jnp.asarray(f, jnp.float32), pairs,
                                       fc) for f in frames]
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
    2D-3D track associations and solves RANSAC PnP.

    Returns (rs (F,3,3), ts (F,3), info list).
    """
    fc = config.frontend
    kmat = jnp.asarray(k, jnp.float32)
    num_frames = len(frames)
    rs = np.zeros((num_frames, 3, 3), np.float32)
    ts = np.zeros((num_frames, 3), np.float32)
    kf_pos = {kf: i for i, kf in enumerate(keyframes)}
    for kf, i in kf_pos.items():
        rs[kf] = res.rs[i]
        ts[kf] = res.ts[i]

    key = jax.random.PRNGKey(seed)
    table = res.table
    info = []
    for t in range(num_frames):
        if t in kf_pos:
            continue
        # nearest keyframe (in time)
        kf = min(keyframes, key=lambda x: abs(x - t))
        row = kf_pos[kf]
        m = match_pair(feats[t], feats[kf], fc)
        # keyframe keypoint j -> landmark: claim the nearest observed
        # track of the keyframe within 2 px
        kf_xy = feats[kf].xy                          # (K, 2)
        obs = table.obs[row]                          # (T, 2)
        tvalid = table.obs_mask[row] & table.has_point
        d = jnp.linalg.norm(kf_xy[:, None, :] - obs[None], axis=-1)
        d = jnp.where(tvalid[None, :], d, jnp.inf)
        nearest = jnp.argmin(d, axis=1)               # (K,)
        claimed = jnp.take_along_axis(d, nearest[:, None], axis=1)[:, 0] < 2.0
        kp_lm = jnp.where(claimed & feats[kf].points.mask, nearest, -1)

        # skipped-frame keypoint i -> landmark via its keyframe match
        lm = jnp.where(m.mask, kp_lm[jnp.clip(m.idx2, 0)], -1)
        pnp_mask = jnp.zeros((table.points.shape[0],), bool)
        xy = jnp.zeros((table.points.shape[0], 2), jnp.float32)
        ok = lm >= 0
        lm_w = jnp.where(ok, lm, table.points.shape[0])  # OOB -> dropped
        pnp_mask = pnp_mask.at[lm_w].set(True, mode="drop")
        xy = xy.at[lm_w].set(m.xy1, mode="drop")

        # Prior pose: the previous frame (processed in order, so always
        # already localized) or the nearest keyframe — then a motion-only
        # BA on the inherited 2D-3D pairs.  RANSAC DLT-PnP is only the
        # rescue: it needs >= 6 NON-coplanar samples, and maps dominated
        # by a planar structure (the blend star) make clean draws rare
        # (measured: 0 inliers on most mid-gap frames, 18 on a lucky key).
        prior_r = rs[t - 1] if t > 0 else rs[kf]
        prior_t = ts[t - 1] if t > 0 else ts[kf]
        from photogrammetry_tpu.sfm.ba import (
            BAProblem, BAState, bundle_adjust,
        )

        state = BAState(rs=jnp.asarray(prior_r)[None],
                        ts=jnp.asarray(prior_t)[None],
                        points=table.points)
        prob = BAProblem(obs=xy[None], mask=pnp_mask[None], k=kmat)
        out = bundle_adjust(state, prob, num_iterations=10,
                            optimize_points=False,
                            fixed_cameras=jnp.ones((1,)))
        r_m, t_m = out.state.rs[0], out.state.ts[0]
        from photogrammetry_tpu.sfm.pnp import pnp_reprojection_errors

        err, z = pnp_reprojection_errors(r_m, t_m, table.points, xy, kmat)
        n_in = int(jnp.sum(pnp_mask & (err < config.pnp_threshold)
                           & (z > 0)))
        if n_in >= config.min_pnp_inliers:
            rs[t] = np.asarray(r_m)
            ts[t] = np.asarray(t_m)
            info.append({"frame": t, "keyframe": kf, "inliers": n_in,
                         "path": "motion_ba"})
            continue
        key, sub = jax.random.split(key)
        pnp = ransac_pnp(sub, table.points, xy, pnp_mask, kmat,
                         threshold=config.pnp_threshold,
                         num_samples=config.pnp_samples)
        n_pnp = int(pnp.num_inliers)
        if n_pnp >= config.min_pnp_inliers:
            rs[t] = np.asarray(pnp.r)
            ts[t] = np.asarray(pnp.t)
            info.append({"frame": t, "keyframe": kf, "inliers": n_pnp,
                         "path": "ransac_pnp"})
        else:
            rs[t] = rs[kf]
            ts[t] = ts[kf]
            info.append({"frame": t, "keyframe": kf, "inliers": n_pnp,
                         "fallback": True})
    return rs, ts, info


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
    rs, ts, info = localize_nonkeyframes(frames, keyframes, feats, res, k,
                                         config)
    return rs, ts, keyframes, res, info
