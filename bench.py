"""Headline benchmark: frontend frames/s/chip on 1920x1080.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's fastest committed number for the same stage — FAST
detection on 1920x1080 at 0.67 s/frame with a fork pool on an M1 Mac
(keypoint_detection.py:157, BASELINE.md) => 1.49 frames/s.  Our measured
stage does strictly more work per frame: FAST + score extraction + NMS +
subpixel refinement + 256-bit BRIEF for up to 2048 keypoints.

Input: the committed real 1080p frame
(reference data/feature_detection_test/straight_edge_1920x1080.jpg), not
synthetic noise — noise saturates NMS with dense detections and measures a
workload the reference never ran (VERDICT r2; measured noise-vs-real gap at
capacity 2048 is 5.4x, scripts/bench_frontend_variants.py).

Measurement methodology (round 4 — fixes the 2.5x fresh-process spread
called out in VERDICT r3): a fixed 200-iteration one-shot loop measured
only ~17 ms of wall clock and inherited whatever tunnel-dispatch state the
process started in (observed fresh-process range 2.2k-22k fps for identical
code).  Now the bench (a) warms up in 100-iter blocks until two consecutive
blocks agree within 5% (steady state), then (b) times five 200-iter blocks
and reports the MEDIAN block — robust to a transient stall in any one
block.  Five fresh processes measured 11.1k-12.1k fps (+-5%) with this
scheme; see BENCH_FULL.md for the distribution.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_FPS = 1.0 / 0.67  # keypoint_detection.py:157 (BASELINE.md)


def main() -> None:
    import os

    import jax

    # Persistent compilation cache: tunnel AOT compiles are slow (minutes)
    # and occasionally degrade to >10 min; the cache makes reruns instant.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from photogrammetry_tpu.sfm.frontend import (
        FrontendConfig, detect_and_describe_split, make_pairs,
    )

    config = FrontendConfig(detection_threshold=50.0, max_keypoints=2048,
                            reduction="nms", suppression_radius=4.0)
    pairs = make_pairs(config)

    import cv2

    from photogrammetry_tpu.ops.grayscale import bgr_to_gray_cv2

    img = cv2.imread("/root/reference/data/feature_detection_test/"
                     "straight_edge_1920x1080.jpg")
    frame = jnp.asarray(np.asarray(bgr_to_gray_cv2(img)), jnp.float32)

    # The split frontend dispatches detect | brief | refine as three
    # programs so each contains exactly one large image gather — XLA's
    # fast vectorized gather lowering — instead of the ~400x slower serial
    # lowering multi-gather programs receive (docs/tpu_notes.md).
    def fn(im):
        return detect_and_describe_split(im, pairs, config)

    def timed_block(iters: int) -> float:
        """Frames/s over one block (block_until_ready bookends)."""
        out = fn(frame)
        jax.block_until_ready(out)
        start = time.perf_counter()
        for _ in range(iters):
            out = fn(frame)
        jax.block_until_ready(out)
        return iters / (time.perf_counter() - start)

    # compile / first-dispatch warmup
    jax.block_until_ready(fn(frame))

    # (a) steady-state gate: 100-iter blocks until two consecutive agree
    # within 5% (tunnel dispatch state settles over the first O(1k) calls;
    # capped at 30 blocks = 3000 iters so a noisy tunnel can't hang us).
    prev = timed_block(100)
    for _ in range(30):
        cur = timed_block(100)
        if abs(cur - prev) <= 0.05 * max(cur, prev):
            break
        prev = cur

    # (b) measurement: median of five 200-iter blocks
    fps = float(np.median([timed_block(200) for _ in range(5)]))

    print(json.dumps({
        "metric": "frontend_frames_per_s_per_chip_1920x1080",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
