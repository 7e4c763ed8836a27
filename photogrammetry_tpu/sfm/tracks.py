"""Feature-track bookkeeping over an image sequence, static-shape.

The reference is strictly two-view (SURVEY.md §0); multi-view tracks are new
north-star infrastructure.  A TrackTable is a fixed-capacity (F frames x T
tracks) observation grid — exactly the dense layout bundle adjustment
consumes (sfm/ba.py) — plus per-track landmark state.  Track extension is a
pure jitted scatter: matches chain a new frame's keypoints onto the tracks
of the previous frame's keypoints; unmatched keypoints open new tracks until
capacity is exhausted (dropped beyond that, counted in ``dropped``).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class TrackTable(NamedTuple):
    obs: jnp.ndarray          # (F, T, 2) float32 observed pixel (x, y)
    obs_mask: jnp.ndarray     # (F, T) bool
    points: jnp.ndarray       # (T, 3) float32 landmark positions
    has_point: jnp.ndarray    # (T,) bool
    kp_track: jnp.ndarray     # (K,) int32: track id of latest frame's kp i (-1 none)
    num_tracks: jnp.ndarray   # () int32 allocated tracks
    dropped: jnp.ndarray      # () int32 keypoints dropped at capacity


def make_track_table(num_frames: int, capacity: int,
                     max_keypoints: int) -> TrackTable:
    return TrackTable(
        obs=jnp.zeros((num_frames, capacity, 2), jnp.float32),
        obs_mask=jnp.zeros((num_frames, capacity), bool),
        points=jnp.zeros((capacity, 3), jnp.float32),
        has_point=jnp.zeros((capacity,), bool),
        kp_track=jnp.full((max_keypoints,), -1, jnp.int32),
        num_tracks=jnp.int32(0),
        dropped=jnp.int32(0),
    )


@partial(jax.jit, static_argnames=())
def start_tracks(table: TrackTable, frame_idx: jnp.ndarray,
                 xy: jnp.ndarray, kp_mask: jnp.ndarray) -> TrackTable:
    """Open a new track for every valid keypoint of the first frame."""
    cap = table.points.shape[0]
    k = xy.shape[0]
    order = jnp.cumsum(kp_mask.astype(jnp.int32)) - 1       # slot per kp
    tid = jnp.where(kp_mask, order, -1)
    fit = tid < cap
    tid = jnp.where(fit, tid, -1)
    # invalid keypoints scatter to index `cap` (out of bounds) and are
    # dropped — never aliased onto a real slot.
    tid_w = jnp.where(tid >= 0, tid, cap)
    obs = table.obs.at[frame_idx, tid_w].set(xy, mode="drop")
    obs_mask = table.obs_mask.at[frame_idx, tid_w].set(True, mode="drop")
    return table._replace(
        obs=obs, obs_mask=obs_mask, kp_track=tid.astype(jnp.int32),
        num_tracks=jnp.minimum(jnp.sum(kp_mask), cap).astype(jnp.int32),
        dropped=table.dropped + jnp.sum(kp_mask & ~fit).astype(jnp.int32))


@partial(jax.jit, static_argnames=())
def extend_tracks(table: TrackTable, frame_idx: jnp.ndarray,
                  xy: jnp.ndarray, kp_mask: jnp.ndarray,
                  match_prev: jnp.ndarray,
                  match_valid: jnp.ndarray) -> TrackTable:
    """Chain frame ``frame_idx`` keypoints onto existing tracks.

    match_prev: (K,) int32 — index of the matching keypoint in the previous
    frame (per mutual_nearest_matches on THIS frame's rows); match_valid (K,).
    """
    cap = table.points.shape[0]
    prev_tid = table.kp_track[jnp.clip(match_prev, 0)]
    chained = match_valid & kp_mask & (prev_tid >= 0)
    tid = jnp.where(chained, prev_tid, -1)

    # allocate fresh tracks for valid-but-unmatched keypoints
    need_new = kp_mask & ~chained
    slot = table.num_tracks + jnp.cumsum(need_new.astype(jnp.int32)) - 1
    fits = slot < cap
    tid = jnp.where(need_new & fits, slot, tid)

    tid_w = jnp.where(tid >= 0, tid, cap)  # OOB => dropped, never aliased
    obs = table.obs.at[frame_idx, tid_w].set(xy, mode="drop")
    obs_mask = table.obs_mask.at[frame_idx, tid_w].set(True, mode="drop")

    new_alloc = jnp.sum(need_new & fits).astype(jnp.int32)
    return table._replace(
        obs=obs, obs_mask=obs_mask, kp_track=tid.astype(jnp.int32),
        num_tracks=jnp.minimum(table.num_tracks + new_alloc, cap),
        dropped=table.dropped + jnp.sum(need_new & ~fits).astype(jnp.int32))


@partial(jax.jit, static_argnames=())
def extend_tracks_with_tid(table: TrackTable, frame_idx: jnp.ndarray,
                           xy: jnp.ndarray, kp_mask: jnp.ndarray,
                           tid: jnp.ndarray) -> TrackTable:
    """Chain keypoints onto explicit track ids (-1 = no match).

    Same semantics as extend_tracks but the caller resolves matches to
    track ids itself — used by the two-frame matcher, which merges
    consecutive-frame and skip-frame (t-2) matches so a single dropped
    detection no longer kills a track.  Valid-but-unmatched keypoints open
    new tracks until capacity."""
    cap = table.points.shape[0]
    chained = kp_mask & (tid >= 0)
    tid = jnp.where(chained, tid, -1)

    need_new = kp_mask & ~chained
    slot = table.num_tracks + jnp.cumsum(need_new.astype(jnp.int32)) - 1
    fits = slot < cap
    tid = jnp.where(need_new & fits, slot, tid)

    tid_w = jnp.where(tid >= 0, tid, cap)
    obs = table.obs.at[frame_idx, tid_w].set(xy, mode="drop")
    obs_mask = table.obs_mask.at[frame_idx, tid_w].set(True, mode="drop")

    new_alloc = jnp.sum(need_new & fits).astype(jnp.int32)
    return table._replace(
        obs=obs, obs_mask=obs_mask, kp_track=tid.astype(jnp.int32),
        num_tracks=jnp.minimum(table.num_tracks + new_alloc, cap),
        dropped=table.dropped + jnp.sum(need_new & ~fits).astype(jnp.int32))


@partial(jax.jit, static_argnames=("capacity",))
def merge_skip_matches(kp_track_prev: jnp.ndarray,
                       kp_track_prev2: jnp.ndarray,
                       idx_prev: jnp.ndarray, good_prev: jnp.ndarray,
                       idx_prev2: jnp.ndarray, good_prev2: jnp.ndarray,
                       capacity: int) -> jnp.ndarray:
    """Resolve per-keypoint track ids from consecutive (t-1) and skip-frame
    (t-2) matches.  t-1 matches win; a t-2 match only claims a track no
    t-1 match claimed, and collisions between t-2 matches keep the lowest
    keypoint index.  Returns (K,) int32 tid (-1 = none)."""
    k = idx_prev.shape[0]
    tid1 = jnp.where(good_prev,
                     kp_track_prev[jnp.clip(idx_prev, 0)], -1)
    tid2 = jnp.where(good_prev2,
                     kp_track_prev2[jnp.clip(idx_prev2, 0)], -1)
    # drop tid2 claims on tracks already taken by tid1
    claimed = jnp.zeros((capacity + 1,), bool)
    claimed = claimed.at[jnp.where(tid1 >= 0, tid1, capacity)].set(
        True, mode="drop")
    tid2 = jnp.where((tid2 >= 0) & ~claimed[jnp.clip(tid2, 0)], tid2, -1)
    # collisions among tid2: lowest keypoint index wins
    owner = jnp.full((capacity + 1,), k, jnp.int32)
    owner = owner.at[jnp.where(tid2 >= 0, tid2, capacity)].min(
        jnp.arange(k, dtype=jnp.int32), mode="drop")
    tid2 = jnp.where((tid2 >= 0)
                     & (owner[jnp.clip(tid2, 0)] == jnp.arange(k)), tid2, -1)
    return jnp.where(tid1 >= 0, tid1, tid2).astype(jnp.int32)


@partial(jax.jit, static_argnames=())
def reassociate_to_landmarks(table: TrackTable, frame_idx: jnp.ndarray,
                             xy: jnp.ndarray, kp_mask: jnp.ndarray,
                             r_t: jnp.ndarray, t_t: jnp.ndarray,
                             k: jnp.ndarray,
                             radius: jnp.ndarray) -> tuple:
    """Map-guided track re-association ("track by projection").

    Consecutive-frame descriptor matching alone lets tracks die whenever one
    link fails, orphaning observations into short fragments (the dominant
    accuracy loss on the synthetic pan sequence: hundreds of 1-2 obs
    fragments).  After frame ``frame_idx``'s pose is estimated, project every
    triangulated landmark into the frame and re-attach keypoints whose
    chain broke: a keypoint that opened a fresh singleton this frame (or was
    dropped) claims a landmark track projecting within ``radius`` px, by
    mutual-nearest assignment.  The singleton's observation moves onto the
    landmark's track (the freed slot stays allocated but empty — static
    shapes, no compaction).

    Returns (table, num_reassociated).
    """
    cap = table.points.shape[0]
    kcount = xy.shape[0]

    pc = table.points @ r_t.T + t_t                      # (T, 3)
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    proj = jnp.stack([k[0, 0] * pc[:, 0] / zs + k[0, 2],
                      k[1, 1] * pc[:, 1] / zs + k[1, 2]], axis=-1)

    cand = table.has_point & (z > 1e-3) & ~table.obs_mask[frame_idx]
    nobs = jnp.sum(table.obs_mask, axis=0)               # includes frame t
    tid_now = table.kp_track
    own = nobs[jnp.clip(tid_now, 0)]
    eligible = kp_mask & ((tid_now < 0) | (own <= 1))

    d = jnp.linalg.norm(xy[:, None, :] - proj[None, :, :], axis=-1)
    d = jnp.where(cand[None, :] & eligible[:, None], d, jnp.inf)
    best_lm = jnp.argmin(d, axis=1)                      # (K,)
    best_d = jnp.min(d, axis=1)
    best_kp = jnp.argmin(d, axis=0)                      # (T,)
    mutual = best_kp[best_lm] == jnp.arange(kcount)
    take = eligible & mutual & (best_d <= radius)

    old_tid = jnp.where(take & (tid_now >= 0), tid_now, cap)
    obs_mask = table.obs_mask.at[frame_idx, old_tid].set(False, mode="drop")
    new_tid = jnp.where(take, best_lm, cap)
    obs = table.obs.at[frame_idx, new_tid].set(xy, mode="drop")
    obs_mask = obs_mask.at[frame_idx, new_tid].set(True, mode="drop")
    kp_track = jnp.where(take, best_lm, tid_now).astype(jnp.int32)
    return table._replace(obs=obs, obs_mask=obs_mask, kp_track=kp_track), \
        jnp.sum(take).astype(jnp.int32)


@partial(jax.jit, static_argnames=())
def first_last_observations(table: TrackTable):
    """Per track: (first_frame, last_frame) observing it (int32, -1 if <1)."""
    f = table.obs.shape[0]
    frames = jnp.arange(f, dtype=jnp.int32)[:, None]
    m = table.obs_mask
    first = jnp.min(jnp.where(m, frames, f), axis=0)
    last = jnp.max(jnp.where(m, frames, -1), axis=0)
    first = jnp.where(first == f, -1, first)
    return first, last
