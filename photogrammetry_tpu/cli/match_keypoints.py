"""Detect, reduce, match two images; write a side-by-side match overlay.

Reference analogue: python_src/scripts/match_keypoints.py:83-136 (flags
--detection-threshold 50, --max-merge-dist 25, --match-threshold 75,
match_keypoints.py:14-24).
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("image1")
    ap.add_argument("image2")
    ap.add_argument("-o", "--output", default="matched_combined.png")
    ap.add_argument("--detection-threshold", type=float, default=50.0)
    ap.add_argument("--match-threshold", type=int, default=75)
    ap.add_argument("--max-merge-dist", type=float, default=25.0)
    ap.add_argument("--reduction", choices=["cluster", "nms", "none"],
                    default="cluster")
    ap.add_argument("--oriented-brief", action="store_true",
                    help="steered (rotation-invariant) BRIEF descriptors "
                         "(ops/brief.py); use for rotated viewpoints")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from photogrammetry_tpu.cli.common import load_gray
    from photogrammetry_tpu.io.draw import draw_lines, draw_squares, join_right
    from photogrammetry_tpu.io.image import read_image, write_image
    from photogrammetry_tpu.sfm.frontend import (
        FrontendConfig, detect_and_describe_split, make_pairs, match_pair,
    )
    from photogrammetry_tpu.utils.profiling import StageTimer

    config = FrontendConfig(
        detection_threshold=args.detection_threshold,
        hamming_threshold=args.match_threshold,
        max_merge_dist=args.max_merge_dist,
        reduction=args.reduction,
        oriented_brief=args.oriented_brief,
    )
    pairs = make_pairs(config)
    timer = StageTimer()
    g1 = load_gray(args.image1)
    g2 = load_gray(args.image2)
    with timer.stage("detect+describe"):
        f1 = detect_and_describe_split(jnp.asarray(g1), pairs, config)
        f2 = timer.block(detect_and_describe_split(jnp.asarray(g2), pairs, config))
    with timer.stage("match"):
        m = timer.block(match_pair(f1, f2, config))

    mask = np.asarray(m.mask)
    xy1 = np.asarray(m.xy1)[mask]
    xy2 = np.asarray(m.xy2)[mask]
    print(f"{int(f1.points.count)} + {int(f2.points.count)} keypoints, "
          f"{mask.sum()} matches  {timer.summary()}")

    im1 = draw_squares(read_image(args.image1),
                       np.asarray(f1.points.coords)[np.asarray(f1.points.mask)])
    im2 = draw_squares(read_image(args.image2),
                       np.asarray(f2.points.coords)[np.asarray(f2.points.mask)])
    combined = join_right(im1, im2)
    off = im1.shape[1]
    starts = xy1[:, ::-1]                     # (x,y) -> (row,col)
    ends = np.stack([xy2[:, 1], xy2[:, 0] + off], axis=-1)
    combined = draw_lines(combined, starts, ends)
    write_image(args.output, combined)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
