"""Headline benchmark: frontend frames/s/chip on 1920x1080.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's fastest committed number for the same stage — FAST
detection on 1920x1080 at 0.67 s/frame with a fork pool on an M1 Mac
(keypoint_detection.py:157, BASELINE.md) => 1.49 frames/s.  Our measured
stage does strictly more work per frame: FAST + score extraction + NMS +
subpixel refinement + 256-bit BRIEF for up to 2048 keypoints.

Input: the committed real 1080p frame
(reference data/feature_detection_test/straight_edge_1920x1080.jpg).

MEASUREMENT PROTOCOL (round 4 — supersedes every earlier number).  On the
axon tunnel runtime, ``jax.block_until_ready`` returns BEFORE execution
completes (measured: a 2.1 GB elementwise add "blocks" in 0.5 ms but takes
~1.4 s when forced by a value read), so every prior round's headline
(8.8k-187k "frames/s") measured host dispatch rate, not device throughput.
The only sound barrier on this toolchain is reading a value derived from
the last output — in-order execution was verified (N independent enqueues
+ one last-output read costs the same as an N-long dependency chain).
This bench therefore: (1) performs one scalar read up-front, putting the
process in the deterministic synchronous-dispatch mode (measured FASTER
than the async mode end-to-end and far less variable); (2) times blocks of
calls each terminated by a forcing read of the final output; (3) gates on
two consecutive blocks within 5% and reports the median of five blocks.
See BENCH_FULL.md for the current headline number, the full postmortem
and the roofline accounting.
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
    _ = float(frame[0, 0])  # enter deterministic sync-dispatch mode

    def fn(im):
        return detect_and_describe_split(im, pairs, config)

    def timed_block(iters: int) -> float:
        """Frames/s over one block, terminated by a FORCING value read
        (block_until_ready is a no-op on this runtime)."""
        out = fn(frame)
        _ = float(out.xy[0, 0])
        start = time.perf_counter()
        for _ in range(iters):
            out = fn(frame)
        # forces completion of all iters: xy is the LAST-dispatched
        # output (refine runs after describe), so under in-order reads
        # this closes the whole block, bits included
        _ = float(out.xy[0, 0])
        return iters / (time.perf_counter() - start)

    # compile warmup
    out = fn(frame)
    _ = float(out.xy[0, 0])

    # steady-state gate: blocks until two consecutive agree within 5%
    prev = timed_block(10)
    for _ in range(10):
        cur = timed_block(10)
        if abs(cur - prev) <= 0.05 * max(cur, prev):
            break
        prev = cur

    # measurement: median of five ~0.5 s blocks
    iters = max(10, int(0.5 * prev))
    fps = float(np.median([timed_block(iters) for _ in range(5)]))

    print(json.dumps({
        "metric": "frontend_frames_per_s_per_chip_1920x1080",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
