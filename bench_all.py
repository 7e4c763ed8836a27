"""Full benchmark suite (multi-metric; bench.py stays single-line).

Prints one JSON object per line: frontend frames/s, matching, BA iters/s,
dewarp map generation, FAST detection — each with the reference baseline
where one exists (BASELINE.md).  Run on the real TPU: `python bench_all.py`.
"""
from __future__ import annotations

import json
import time

import numpy as np


def _force(out):
    """Forcing read: block_until_ready is a no-op on the tunnel runtime
    (BENCH_FULL.md postmortem) — only a value read proves completion."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(jnp.asarray(leaf, jnp.float32))[0])


def timed(f, *a, iters=20):
    _force(f(*a))
    t = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    _force(out)
    return (time.perf_counter() - t) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from photogrammetry_tpu.ops.dewarp import generate_distortion_map
    from photogrammetry_tpu.ops.fast import fast_score_map
    from photogrammetry_tpu.ops.match import hamming_distance_matrix
    from photogrammetry_tpu.sfm.ba import BAProblem, BAState, bundle_adjust, project
    from photogrammetry_tpu.sfm.frontend import (
        FrontendConfig, detect_and_describe_split, make_pairs,
    )

    rng = np.random.default_rng(0)
    results = []

    # --- FAST detection, 1920x1080 (baseline 0.67 s, keypoint_detection.py:157)
    img = jnp.asarray(rng.integers(0, 255, (1080, 1920)), jnp.float32)
    dt = timed(fast_score_map, img, 50.0)
    results.append({"metric": "fast_detect_1920x1080", "value": dt * 1e3,
                    "unit": "ms", "vs_baseline": 0.67 / dt})

    # --- full frontend (baseline: detection alone, conservative)
    config = FrontendConfig(detection_threshold=50.0, max_keypoints=2048,
                            reduction="nms", suppression_radius=4.0)
    pairs = make_pairs(config)
    fn = lambda im: detect_and_describe_split(im, pairs, config)
    dt = timed(fn, img)
    results.append({"metric": "frontend_frames_per_s_1920x1080",
                    "value": 1.0 / dt, "unit": "frames/s",
                    "vs_baseline": (1.0 / dt) / (1.0 / 0.67)})

    # --- Hamming matching 4096x4096x256 (reference: O(N^2) popcount loops)
    b1 = jnp.asarray(rng.integers(0, 2, (4096, 256)), jnp.uint8)
    b2 = jnp.asarray(rng.integers(0, 2, (4096, 256)), jnp.uint8)
    fm = jax.jit(hamming_distance_matrix)
    dt = timed(fm, b1, b2)
    results.append({"metric": "hamming_4096x4096x256", "value": dt * 1e3,
                    "unit": "ms", "vs_baseline": None})

    # --- distortion map generation 1920x1080 (baseline 7.66 s vectorized)
    gen = jax.jit(lambda c: generate_distortion_map(1080, 1920, c))
    coeffs = jnp.asarray([3e-4, 1e-7, 0, 0, 0], jnp.float32)
    dt = timed(gen, coeffs)
    results.append({"metric": "distortion_map_1920x1080", "value": dt * 1e3,
                    "unit": "ms", "vs_baseline": 7.66 / dt})

    # --- dewarp APPLY 1920x1080 (reference headline: cv2.remap
    # 8-16 ms, warping.py:149-161 / stats.json entries 18-32; round 4 the
    # chip LOST this op at 87 ms element-gather-bound — the separable
    # two-pass Pallas remap wins it back)
    from photogrammetry_tpu.ops.dewarp import make_distortion_applier

    dmap = gen(coeffs)
    apply = make_distortion_applier(dmap, (1080, 1920))
    dt = timed(apply, img, iters=50)
    results.append({"metric": "dewarp_apply_1920x1080", "value": dt * 1e3,
                    "unit": "ms", "vs_baseline": 0.012 / dt})

    # --- BA iterations/s (north-star metric; 16 cams x 4096 landmarks)
    f, t = 16, 4096
    k = jnp.array([[520., 0, 320], [0, 520., 240], [0, 0, 1]])
    pts = jnp.asarray(rng.uniform(-2, 2, (t, 3)) + [0, 0, 6], jnp.float32)
    rs = jnp.tile(jnp.eye(3)[None], (f, 1, 1))
    ts = jnp.asarray(rng.normal(0, 0.1, (f, 3)), jnp.float32)
    obs, _, _ = project(rs, ts, pts, k)
    obs = obs + jnp.asarray(rng.normal(0, 0.5, obs.shape), jnp.float32)
    state = BAState(rs=rs, ts=ts,
                    points=pts + jnp.asarray(rng.normal(0, 0.05, (t, 3)),
                                             jnp.float32))
    prob = BAProblem(obs=obs, mask=jnp.ones((f, t), bool), k=k)
    iters = 10
    ba = jax.jit(lambda s, p: bundle_adjust(s, p, num_iterations=iters))
    dt = timed(ba, state, prob, iters=5)
    results.append({"metric": f"ba_iters_per_s_{f}cam_{t}lm",
                    "value": iters / dt, "unit": "iters/s",
                    "vs_baseline": None})

    # --- end-to-end incremental SfM (synthetic pan scene): frames/s + ATE
    from photogrammetry_tpu.sfm.incremental import (
        SfmConfig, run_incremental_sfm,
    )
    from photogrammetry_tpu.sfm.metrics import absolute_trajectory_error
    from photogrammetry_tpu.synth.star_scene import (
        StarSceneConfig, generate_sequence,
    )

    scene = generate_sequence(StarSceneConfig(num_frames=8, supersample=2))
    # diagnostics off: each per-frame diagnostic scalar readback costs a
    # tunnel RTT and the loop is RTT-bound (docs/tpu_notes.md §3)
    cfg = SfmConfig(collect_diagnostics=False)
    run_incremental_sfm(scene["frames"], scene["k"], cfg)      # compile
    t0 = time.perf_counter()
    res = run_incremental_sfm(scene["frames"], scene["k"], cfg)
    dt = time.perf_counter() - t0
    gt_c = -np.einsum("fji,fj->fi", scene["rs"], scene["ts"])
    ate = float(absolute_trajectory_error(
        np.asarray(res.camera_centers, np.float32), gt_c.astype(np.float32)))
    results.append({"metric": "sfm_frames_per_s_8f_synth",
                    "value": len(scene["frames"]) / dt, "unit": "frames/s",
                    "vs_baseline": None})
    results.append({"metric": "sfm_ate_8f_synth", "value": ate,
                    "unit": "scene units", "vs_baseline": None})

    for r in results:
        r["value"] = round(float(r["value"]), 3)
        if r["vs_baseline"] is not None:
            r["vs_baseline"] = round(float(r["vs_baseline"]), 1)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
