"""Detect FAST keypoints and write an overlay image.

Reference analogue: python_src/scripts/detect_features.py:33-44.
Usage: python -m photogrammetry_tpu.cli.detect_features IMG [-o OUT]
       [--threshold T] [--cache-dir DIR]
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("image")
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--threshold", type=float, default=50.0)
    ap.add_argument("--max-keypoints", type=int, default=4096)
    ap.add_argument("--cache-dir", default=None,
                    help="enable the on-disk keypoint cache")
    args = ap.parse_args(argv)

    from photogrammetry_tpu.cli.common import load_gray
    from photogrammetry_tpu.io.draw import draw_squares
    from photogrammetry_tpu.io.image import read_image, write_image
    from photogrammetry_tpu.ops.fast import extract_keypoints, fast_score_map
    from photogrammetry_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    gray = load_gray(args.image)

    cached = None
    if args.cache_dir:
        from photogrammetry_tpu.store.cache import KeypointCache
        cache = KeypointCache(args.cache_dir)
        cached = cache.get(args.image, threshold=args.threshold)

    if cached is not None:
        coords = cached["coords"]
    else:
        with timer.stage("detect"):
            score = fast_score_map(gray, args.threshold)
            pts = timer.block(extract_keypoints(score, args.max_keypoints))
        coords = np.asarray(pts.coords)[np.asarray(pts.mask)]
        if args.cache_dir:
            cache.put(args.image, {"coords": coords},
                      threshold=args.threshold)

    print(f"{len(coords)} keypoints  {timer.summary()}")
    out_path = args.output or args.image.rsplit(".", 1)[0] + "_detected.png"
    overlay = draw_squares(read_image(args.image), coords)
    write_image(out_path, overlay)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
