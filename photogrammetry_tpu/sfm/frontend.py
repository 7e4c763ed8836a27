"""Feature-tracking frontend: images → matched pixel correspondences.

This is the framework's equivalent of the reference's per-image pipeline +
matching driver (TestService.BuildKeypointDetectorPipeline, TestService.cs:
137-152, followed by KeypointMatching, TestService.cs:80-134), expressed as
two jittable stages over static-shape arrays:

  detect_and_describe: grayscale image → (keypoints, descriptor bits)
  match_pair:          two described frames → (xy1, xy2, mask)

Keypoint redundancy removal supports both reference policies: 'nms'
(C# RedundantKeypointEliminator) and 'cluster' (Python chunked hierarchical
clustering).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from photogrammetry_tpu.core.camera import keypoints_to_xy
from photogrammetry_tpu.ops.brief import brief_bits, gaussian_pairs
from photogrammetry_tpu.ops.cluster import grid_cluster_keypoints
from photogrammetry_tpu.ops.fast import extract_keypoints, fast_score_map
from photogrammetry_tpu.ops.match import (
    hamming_distance_matrix, mutual_nearest_matches,
)
from photogrammetry_tpu.ops.nms import (
    compact_points, nms_keypoints, nms_keypoints_parallel,
    nms_keypoints_static,
)
from photogrammetry_tpu.ops.refine import refine_subpixel_dense
from photogrammetry_tpu.utils.padding import PaddedPoints


@dataclass(frozen=True)
class FrontendConfig:
    """Detection/description/matching configuration.

    Defaults follow the reference's Python CLI (match_keypoints.py:14-24:
    threshold 50 on int grayscale, max merge dist 25, hamming threshold 75)
    and C# appsettings (suppression radius 50, 256 pairs, sigma 50).
    """
    detection_threshold: float = 50.0
    max_keypoints: int = 1024
    reduction: str = "nms"            # 'nms' | 'anms' | 'cluster' | 'none'
    # 'static' (fixed 64-round fixed-point), 'parallel' (while_loop
    # fixed-point) and 'sequential' (per-point loop) produce identical
    # results.  'static' is the default: a data-dependent while_loop pushes
    # the whole fused program onto the TPU runtime's slow synchronous
    # dispatch path (~40 ms/call vs ~0.1 ms) and also compiles far slower.
    nms_impl: str = "static"
    suppression_radius: float = 50.0
    max_merge_dist: float = 25.0
    cluster_chunks: tuple = (4, 4)
    brief_sigma: float = 50.0
    num_pairs: int = 256
    hamming_threshold: int = 75
    ratio_test: float = 0.0           # Lowe ratio (0 disables)
    pair_seed: int = 0
    subpixel: bool = True             # refine corners before geometry
    # Steered BRIEF (ORB-style): rotate each keypoint's pair offsets by
    # its intensity-centroid patch orientation before sampling —
    # rotation-invariant descriptors at the same gather cost.  Opt-in
    # (not reference-parity; the reference's BRIEF is unoriented).
    oriented_brief: bool = False
    # Tiled Pallas Hamming kernel: None = auto (on for TPU backends, where
    # it measures faster than the XLA matmul path — 1.015 vs 1.059 ms at
    # 4096^2x256 on v5e, docs/tpu_notes.md; off elsewhere: interpret mode
    # on CPU is orders slower).
    use_pallas_matching: bool | None = None
    # Fused Pallas FAST stencil (kernels/fast_stencil.py): bit-exact, 3.1x
    # faster than the 16-shift XLA stencil standalone at 1080p (0.80 vs
    # 2.49 ms) and +15% on the full split frontend (17.8k -> 20.5k fps,
    # docs/tpu_notes.md §5).  None = auto: on for TPU backends, off
    # elsewhere (interpret mode).
    use_pallas_detect: bool | None = None


class DescribedFrame(NamedTuple):
    points: PaddedPoints
    bits: jnp.ndarray  # (K, P) uint8
    xy: jnp.ndarray    # (K, 2) float32 subpixel (x, y) pixel coords


def make_pairs(config: FrontendConfig) -> jnp.ndarray:
    return gaussian_pairs(jax.random.PRNGKey(config.pair_seed),
                          sigma=config.brief_sigma,
                          num_pairs=config.num_pairs)


def _resolve_pallas_detect(config: FrontendConfig) -> bool:
    if config.use_pallas_detect is None:
        return jax.default_backend() in ("tpu", "axon")
    return config.use_pallas_detect


def _detect_from_score(score: jnp.ndarray, h: int, w: int,
                       config: FrontendConfig) -> PaddedPoints:
    """fixed-capacity keypoint extraction → redundancy reduction."""
    pts = extract_keypoints(score, capacity=config.max_keypoints,
                            order="score")
    if config.reduction == "nms":
        nms = {"static": nms_keypoints_static,
               "parallel": nms_keypoints_parallel,
               "sequential": nms_keypoints}[config.nms_impl]
        pts = compact_points(nms(pts, config.suppression_radius),
                             config.max_keypoints)
    elif config.reduction == "anms":
        from photogrammetry_tpu.ops.nms import anms_keypoints
        keep = max(config.max_keypoints // 4, 64)
        pts = compact_points(anms_keypoints(pts, keep), config.max_keypoints)
    elif config.reduction == "cluster":
        pts = grid_cluster_keypoints(
            pts, h, w, max_merge_dist=config.max_merge_dist,
            chunks=config.cluster_chunks,
            chunk_capacity=max(config.max_keypoints // 4, 64))
        pts = compact_points(pts, config.max_keypoints)
    return pts


def _detect(gray: jnp.ndarray, config: FrontendConfig) -> PaddedPoints:
    """score map → fixed-capacity keypoints → redundancy reduction."""
    h, w = gray.shape
    if _resolve_pallas_detect(config):
        from photogrammetry_tpu.kernels.fast_stencil import (
            fast_score_map_pallas,
        )

        score = fast_score_map_pallas(gray, config.detection_threshold)
    else:
        score = fast_score_map(gray, config.detection_threshold)
    return _detect_from_score(score, h, w, config)


def _bits(gray: jnp.ndarray, pts: PaddedPoints, pairs: jnp.ndarray,
          config: "FrontendConfig | None" = None) -> jnp.ndarray:
    """Masked BRIEF bits for detected keypoints."""
    if config is not None and config.oriented_brief:
        from photogrammetry_tpu.ops.brief import (
            brief_bits_oriented, keypoint_orientations,
        )

        thetas = keypoint_orientations(gray, pts.coords)
        bits = brief_bits_oriented(gray, pts.coords, pairs, thetas)
    else:
        bits = brief_bits(gray, pts.coords, pairs)
    return bits * pts.mask[:, None].astype(bits.dtype)


def _xy(gray: jnp.ndarray, pts: PaddedPoints,
        config: FrontendConfig) -> jnp.ndarray:
    """(K, 2) float32 (x, y) keypoint coordinates, subpixel-refined."""
    if config.subpixel:
        # dense box-filter formulation: 25k gathered elements instead of
        # 400k (the element-gather rate is the frontend's wall — §0)
        rc = refine_subpixel_dense(gray, pts.coords)
        return jnp.stack([rc[:, 1], rc[:, 0]], axis=-1)
    return keypoints_to_xy(pts.coords)


@partial(jax.jit, static_argnames=("config",))
def detect_keypoints(gray: jnp.ndarray,
                     config: FrontendConfig) -> PaddedPoints:
    """Jitted detection stage (see detect_and_describe_split)."""
    return _detect(gray, config)


@partial(jax.jit, static_argnames=("config",))
def describe_bits(gray: jnp.ndarray, pts: PaddedPoints,
                  pairs: jnp.ndarray,
                  config: "FrontendConfig | None" = None) -> jnp.ndarray:
    """Jitted BRIEF stage (see detect_and_describe_split)."""
    return _bits(gray, pts, pairs, config)


@partial(jax.jit, static_argnames=("config",))
def refine_xy(gray: jnp.ndarray, pts: PaddedPoints,
              config: FrontendConfig) -> jnp.ndarray:
    """Jitted subpixel-coordinate stage (see detect_and_describe_split)."""
    return _xy(gray, pts, config)


@partial(jax.jit, static_argnames=("config",))
def detect_and_describe(gray: jnp.ndarray, pairs: jnp.ndarray,
                        config: FrontendConfig) -> DescribedFrame:
    """Grayscale (H, W) float image → keypoints + BRIEF bits (one program).

    One fused jit — the composable form (vmap/batch/mesh-sharding, the
    compile-checked entry point).  For single-frame host-loop use prefer
    ``detect_and_describe_split``: on the current TPU runtime, XLA lowers
    per-keypoint image gathers onto a ~400x slower serial path whenever a
    single program contains more than one of them (docs/tpu_notes.md), so
    the fused form runs at ~40 ms/frame where the split form runs at
    ~0.1 ms/frame for identical results.
    """
    pts = _detect(gray, config)
    return DescribedFrame(points=pts,
                          bits=_bits(gray, pts, pairs, config),
                          xy=_xy(gray, pts, config))


def detect_and_describe_split(gray: jnp.ndarray, pairs: jnp.ndarray,
                              config: FrontendConfig) -> DescribedFrame:
    """Same result as ``detect_and_describe``, dispatched as three programs
    (detect | brief | refine) so each contains exactly one large gather —
    the fast path for host-sequenced pipelines (~0.1 ms vs ~40 ms fused on
    1920x1080; see docs/tpu_notes.md)."""
    pts = detect_keypoints(gray, config)
    return DescribedFrame(points=pts,
                          bits=describe_bits(gray, pts, pairs, config),
                          xy=refine_xy(gray, pts, config))


@partial(jax.jit, static_argnames=("config",))
def detect_and_describe_batch(grays: jnp.ndarray, pairs: jnp.ndarray,
                              config: FrontendConfig) -> DescribedFrame:
    """Batched frontend over (B, H, W) frames (vmapped; shard the batch
    dimension over a mesh for multi-chip frame parallelism)."""
    # pin the XLA stencil: vmap-of-pallas_call is unexercised on the axon
    # AOT path (same guard as _detect_batch)
    import dataclasses

    cfg = dataclasses.replace(config, use_pallas_detect=False)
    return jax.vmap(lambda g: detect_and_describe(g, pairs, cfg))(grays)


@partial(jax.jit, static_argnames=("config",))
def _detect_batch(grays, config):
    # The Pallas stencil batches IN THE KERNEL GRID (frames as the leading
    # grid dimension) — vmap-of-pallas_call is unexercised on the axon AOT
    # and is avoided entirely (VERDICT r4 item 6).
    b, h, w = grays.shape
    if _resolve_pallas_detect(config):
        from photogrammetry_tpu.kernels.fast_stencil import (
            fast_score_map_pallas_batch,
        )

        scores = fast_score_map_pallas_batch(grays,
                                             config.detection_threshold)
    else:
        scores = jax.vmap(
            lambda g: fast_score_map(g, config.detection_threshold))(grays)
    return jax.vmap(lambda s: _detect_from_score(s, h, w, config))(scores)


@partial(jax.jit, static_argnames=("config",))
def _bits_batch(grays, pts, pairs, config=None):
    return jax.vmap(lambda g, p: _bits(g, p, pairs, config))(grays, pts)


@partial(jax.jit, static_argnames=("config",))
def _xy_batch(grays, pts, config):
    return jax.vmap(lambda g, p: _xy(g, p, config))(grays, pts)


def detect_and_describe_batch_split(grays: jnp.ndarray, pairs: jnp.ndarray,
                                    config: FrontendConfig) -> DescribedFrame:
    """Batched frontend as three programs (detect | brief | refine), each a
    single vmapped gather — the fast-dispatch form of
    ``detect_and_describe_batch`` (docs/tpu_notes.md)."""
    pts = _detect_batch(grays, config)
    return DescribedFrame(points=pts,
                          bits=_bits_batch(grays, pts, pairs, config),
                          xy=_xy_batch(grays, pts, config))


def detect_and_describe_batch_pyramid(grays: jnp.ndarray,
                                      pairs: jnp.ndarray,
                                      config: FrontendConfig,
                                      octaves: int) -> DescribedFrame:
    """Batched multi-scale frontend: per-octave batched (detect | brief |
    refine) passes merged along the keypoint axis — the batch form of
    ``detect_and_describe_pyramid`` (coordinates mapped to octave 0; the
    merged frame carries octaves x max_keypoints slots)."""
    frames = []
    img = grays
    for o in range(octaves):
        f = detect_and_describe_batch_split(img, pairs, config)
        off = (2.0 ** (o - 1) - 0.5) if o > 0 else 0.0
        scale = float(2 ** o)
        xy = f.xy * scale + off
        coords = jnp.rint(
            f.points.coords.astype(jnp.float32) * scale + off
        ).astype(jnp.int32)
        frames.append(DescribedFrame(
            points=PaddedPoints(coords=coords, score=f.points.score,
                                mask=f.points.mask, count=f.points.count),
            bits=f.bits, xy=xy))
        if o + 1 < octaves:
            img = jax.vmap(_downsample2)(img)
    cat = lambda get: jnp.concatenate([get(f) for f in frames], axis=1)
    mask = cat(lambda f: f.points.mask)
    pts = PaddedPoints(coords=cat(lambda f: f.points.coords),
                       score=cat(lambda f: f.points.score),
                       mask=mask,
                       count=jnp.sum(mask, axis=1).astype(jnp.int32))
    return DescribedFrame(points=pts, bits=cat(lambda f: f.bits),
                          xy=cat(lambda f: f.xy))


def precompute_frontend(frames: jnp.ndarray, pairs: jnp.ndarray,
                        config: FrontendConfig,
                        chunk: int = 16, octaves: int = 1) -> DescribedFrame:
    """Whole-sequence frontend as a few batched programs: (F, H, W) frames
    -> DescribedFrame with a leading F axis on every leaf.

    The host-sequenced SfM loop previously uploaded each frame (~MBs over
    a ~45 ms-RTT tunnel) and dispatched 3 detect programs per frame; one
    stacked upload + ceil(F/chunk) batched (detect | brief | refine)
    passes removes that per-frame host->device traffic entirely
    (docs/tpu_notes.md §6).  ``chunk`` bounds peak HBM for long sequences;
    the tail chunk is padded to the full chunk size so at most one
    program shape compiles.  ``octaves`` > 1 switches to the multi-scale
    pyramid frontend (keypoint capacity scales to octaves x
    max_keypoints).  Index frame t with ``frame_features(f, t)``.
    """
    f = frames.shape[0]
    chunk = max(1, min(chunk, f))
    outs = []
    for s in range(0, f, chunk):
        blk = frames[s:s + chunk]
        if blk.shape[0] < chunk:  # pad tail to the compiled shape
            reps = jnp.repeat(blk[-1:], chunk - blk.shape[0], axis=0)
            blk = jnp.concatenate([blk, reps], axis=0)
        if octaves > 1:
            outs.append(detect_and_describe_batch_pyramid(
                blk, pairs, config, octaves))
        else:
            outs.append(detect_and_describe_batch_split(blk, pairs,
                                                        config))
    cat = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0)[:f], *outs)
    return cat


def frame_features(feats: DescribedFrame, t) -> DescribedFrame:
    """Select frame ``t`` from a precomputed (F-leading) DescribedFrame."""
    return jax.tree.map(lambda x: x[t], feats)


class MatchedPair(NamedTuple):
    xy1: jnp.ndarray    # (K, 2) float32 (x, y) pixel coords in frame 1
    xy2: jnp.ndarray    # (K, 2)
    idx2: jnp.ndarray   # (K,) int32 matched keypoint index in frame 2 (-1 none)
    dist: jnp.ndarray   # (K,) int32 Hamming distances
    mask: jnp.ndarray   # (K,) bool valid matches
    num: jnp.ndarray    # () int32


@partial(jax.jit, static_argnames=("config",))
def match_pair(f1: DescribedFrame, f2: DescribedFrame,
               config: FrontendConfig) -> MatchedPair:
    """Mutual-nearest Hamming matching between two described frames."""
    use_pallas = config.use_pallas_matching
    if use_pallas is None:  # auto: TPU backends only (incl. the axon tunnel)
        use_pallas = jax.default_backend() in ("tpu", "axon")
    if use_pallas:
        from photogrammetry_tpu.kernels.hamming import (
            hamming_distance_matrix_pallas,
        )
        from photogrammetry_tpu.ops.match import INT_INF

        d = hamming_distance_matrix_pallas(f1.bits, f2.bits)
        d = jnp.where(f1.points.mask[:, None], d, INT_INF)
        d = jnp.where(f2.points.mask[None, :], d, INT_INF)
    else:
        d = hamming_distance_matrix(f1.bits, f2.bits, f1.points.mask,
                                    f2.points.mask)
    ratio = config.ratio_test if config.ratio_test > 0 else None
    idx2, dist, valid = mutual_nearest_matches(d, config.hamming_threshold,
                                               max_ratio=ratio)
    xy1 = f1.xy
    xy2 = f2.xy[jnp.clip(idx2, 0)]
    return MatchedPair(xy1=xy1, xy2=xy2, idx2=idx2, dist=dist, mask=valid,
                       num=jnp.sum(valid).astype(jnp.int32))


class PrecompMatches(NamedTuple):
    """Sequence-level matching + epipolar gates, leading frame axis t.

    Row t holds the (t, t-1) consecutive match (valid for t >= 1) and the
    (t, t-2) skip match (valid for t >= 2); rows outside those ranges are
    masked all-False.  idx arrays index the OLDER frame's keypoints.
    """
    idx1: jnp.ndarray    # (F, K) int32 match into frame t-1
    good1: jnp.ndarray   # (F, K) bool  mask & epipolar inliers
    num1: jnp.ndarray    # (F,) int32 raw mutual matches
    idx2: jnp.ndarray    # (F, K) int32 match into frame t-2
    good2: jnp.ndarray   # (F, K) bool
    num2: jnp.ndarray    # (F,) int32


@partial(jax.jit, static_argnames=("config", "num_samples"))
def _match_gate_batch(feats: DescribedFrame, ts, dts, keys,
                      config: FrontendConfig, threshold,
                      num_samples: int):
    """vmapped (match_pair | ransac gate) over (t, t-dt) frame pairs."""
    from photogrammetry_tpu.sfm.epipolar import ransac_fundamental

    def one(t, dt, sub):
        f1 = jax.tree.map(lambda x: x[t], feats)
        f2 = jax.tree.map(lambda x: x[t - dt], feats)
        m = match_pair(f1, f2, config)
        gate = ransac_fundamental(sub, m.xy1, m.xy2, m.mask,
                                  threshold=threshold,
                                  num_samples=num_samples)
        return m.idx2, m.mask & gate.inliers, m.num

    return jax.vmap(one)(ts, dts, keys)


def precompute_matching(feats: DescribedFrame, config: FrontendConfig,
                        key, num_frames: int, ransac_threshold: float,
                        ransac_samples: int,
                        chunk: int = 16) -> PrecompMatches:
    """Whole-sequence consecutive + skip matching as a few batched
    programs (the per-frame staged loop previously dispatched 2 matches,
    2 RANSAC gates and ~4 eager glue ops per frame — each costing a full
    sync-dispatch period on the tunnel runtime, docs/tpu_notes.md §7).

    RNG: pair (t, dt) draws its gate key as fold_in(key, 2*t + (dt-1)) —
    deterministic and order-independent, so chunking cannot change
    results (but the stream differs from the sequential staged-loop
    draws; seeds are not comparable across the two modes).
    """
    f = num_frames
    pairs = [(t, 1) for t in range(1, f)] + [(t, 2) for t in range(2, f)]
    idx = {(t, dt): i for i, (t, dt) in enumerate(pairs)}
    n = len(pairs)
    ts = np.asarray([p[0] for p in pairs], np.int32)
    dts = np.asarray([p[1] for p in pairs], np.int32)
    salts = np.asarray([2 * t + (dt - 1) for t, dt in pairs], np.uint32)
    keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(
        jnp.asarray(salts))

    outs = []
    chunk = max(1, min(chunk, n))
    for s in range(0, n, chunk):
        blk = slice(s, s + chunk)
        tb, db, kb = ts[blk], dts[blk], keys[blk]
        if len(tb) < chunk:  # pad tail to the compiled shape
            reps = chunk - len(tb)
            tb = np.concatenate([tb, np.repeat(tb[-1:], reps)])
            db = np.concatenate([db, np.repeat(db[-1:], reps)])
            kb = jnp.concatenate([kb, jnp.repeat(kb[-1:], reps, axis=0)])
        outs.append(_match_gate_batch(
            feats, jnp.asarray(tb), jnp.asarray(db), kb, config,
            jnp.float32(ransac_threshold), ransac_samples))
    cat = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0)[:n], *outs)
    all_idx, all_good, all_num = cat

    def rows(dt):
        sel = np.asarray([idx.get((t, dt), 0) for t in range(f)], np.int32)
        has = np.asarray([(t, dt) in idx for t in range(f)])
        gi = all_idx[jnp.asarray(sel)]
        gg = all_good[jnp.asarray(sel)] & jnp.asarray(has)[:, None]
        gn = jnp.where(jnp.asarray(has), all_num[jnp.asarray(sel)], 0)
        return gi, gg, gn

    i1, g1, n1 = rows(1)
    i2, g2, n2 = rows(2)
    return PrecompMatches(idx1=i1, good1=g1, num1=n1,
                          idx2=i2, good2=g2, num2=n2)


@partial(jax.jit, static_argnames=())
def _downsample2(gray: jnp.ndarray) -> jnp.ndarray:
    """2x2 average-pool downsample (dense, bandwidth-bound)."""
    h2, w2 = gray.shape[0] // 2, gray.shape[1] // 2
    g = gray[:h2 * 2, :w2 * 2]
    return (g[0::2, 0::2] + g[0::2, 1::2] + g[1::2, 0::2] + g[1::2, 1::2]) \
        * 0.25


def detect_and_describe_pyramid(gray: jnp.ndarray, pairs: jnp.ndarray,
                                config: FrontendConfig,
                                octaves: int = 3) -> DescribedFrame:
    """Multi-scale frontend: detect + describe on ``octaves`` power-of-two
    image scales and merge into one fixed-capacity DescribedFrame.

    Scale invariance the pyramid way (the reference is single-scale):
    descriptors computed on octave o see the scene at 2^o coarser
    resolution, so features match across views whose apparent scale
    differs by up to ~2^(octaves-1).  Coordinates are mapped back to
    octave-0 pixels (the 2x2 average pool centers octave-o pixel p at
    2^o p + (2^(o-1) - 0.5)).  Each octave keeps the full configured
    capacity; the merged frame has octaves x max_keypoints slots, so
    matching/RANSAC shapes scale accordingly.  Opt-in via
    FrontendConfig-independent call (pyramid semantics are not
    reference-parity).
    """
    frames = []
    img = gray
    for o in range(octaves):
        f = detect_and_describe_split(img, pairs, config)
        off = (2.0 ** (o - 1) - 0.5) if o > 0 else 0.0
        scale = float(2 ** o)
        xy = f.xy * scale + off
        coords = jnp.rint(
            f.points.coords.astype(jnp.float32) * scale + off
        ).astype(jnp.int32)
        frames.append(DescribedFrame(
            points=PaddedPoints(coords=coords, score=f.points.score,
                                mask=f.points.mask, count=f.points.count),
            bits=f.bits, xy=xy))
        if o + 1 < octaves:
            img = _downsample2(img)
    cat = lambda get: jnp.concatenate([get(f) for f in frames], axis=0)
    mask = cat(lambda f: f.points.mask)
    pts = PaddedPoints(coords=cat(lambda f: f.points.coords),
                       score=cat(lambda f: f.points.score),
                       mask=mask,
                       count=jnp.sum(mask).astype(jnp.int32))
    return DescribedFrame(points=pts, bits=cat(lambda f: f.bits),
                          xy=cat(lambda f: f.xy))
