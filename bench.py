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

Measurement methodology (round 4, replacing the irreproducible one-shot
loop VERDICT r3 flagged): throughput is measured on the BATCHED split
frontend at B=16 frames per dispatch — the production configuration (the
incremental-SfM loop precomputes its whole sequence this way, and it is
the form that shards over a device mesh).  Single-frame dispatch numbers
are dominated by per-dispatch tunnel/host overhead and swing 9.4k-24k
frames/s across fresh processes and time-of-day windows for identical
code; at B=16 the device is the limiter and five fresh processes agree
within +-7% (BENCH_FULL.md has both numbers and the distribution).
Warmup runs blocks until two consecutive agree within 5%, then the median
of five timed blocks is reported.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_FPS = 1.0 / 0.67  # keypoint_detection.py:157 (BASELINE.md)
BATCH = 16


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
        FrontendConfig, detect_and_describe_batch_split, make_pairs,
    )

    config = FrontendConfig(detection_threshold=50.0, max_keypoints=2048,
                            reduction="nms", suppression_radius=4.0)
    pairs = make_pairs(config)

    import cv2

    from photogrammetry_tpu.ops.grayscale import bgr_to_gray_cv2

    img = cv2.imread("/root/reference/data/feature_detection_test/"
                     "straight_edge_1920x1080.jpg")
    frame = jnp.asarray(np.asarray(bgr_to_gray_cv2(img)), jnp.float32)
    frames = jnp.asarray(jnp.broadcast_to(frame, (BATCH,) + frame.shape))

    # The batched split frontend dispatches detect | brief | refine as
    # three programs per 16-frame block so each contains exactly one large
    # vmapped image gather — XLA's fast vectorized gather lowering
    # (docs/tpu_notes.md §1).
    def fn():
        return detect_and_describe_batch_split(frames, pairs, config)

    def timed_block(iters: int) -> float:
        """Frames/s over one block (block_until_ready bookends)."""
        out = fn()
        jax.block_until_ready(out)
        start = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        return iters * BATCH / (time.perf_counter() - start)

    # compile / first-dispatch warmup
    jax.block_until_ready(fn())

    # (a) probe, then size blocks to ~0.25 s of device work each — blocks
    # measuring only a few ms inherit dispatch-burst noise (observed 1.8x
    # spread at 4 ms blocks for identical code)
    probe = timed_block(25)
    iters = max(25, int(0.25 * probe / BATCH))

    # (b) steady-state gate: blocks until two consecutive agree within 5%
    # (capped so a noisy tunnel can't hang the driver)
    prev = timed_block(iters)
    for _ in range(10):
        cur = timed_block(iters)
        if abs(cur - prev) <= 0.05 * max(cur, prev):
            break
        prev = cur

    # (c) measurement: median of five ~0.25 s blocks
    fps = float(np.median([timed_block(iters) for _ in range(5)]))

    print(json.dumps({
        "metric": "frontend_frames_per_s_per_chip_1920x1080",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
