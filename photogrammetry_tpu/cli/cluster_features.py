"""Detect + cluster keypoints and write an overlay image.

Reference analogue: python_src/scripts/cluster_features.py:40-71 (chunked
4x4 hierarchical clustering, max merge distance 25).
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("image")
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--threshold", type=float, default=50.0)
    ap.add_argument("--max-merge-dist", type=float, default=25.0)
    ap.add_argument("--chunks", type=int, nargs=2, default=(4, 4))
    ap.add_argument("--exact", action="store_true",
                    help="use the exact host-side reference-parity path")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from photogrammetry_tpu.cli.common import load_gray
    from photogrammetry_tpu.io.draw import draw_squares
    from photogrammetry_tpu.io.image import read_image, write_image
    from photogrammetry_tpu.ops.cluster import (
        grid_cluster_keypoints, hierarchical_cluster_exact,
    )
    from photogrammetry_tpu.ops.fast import extract_keypoints, fast_score_map
    from photogrammetry_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    gray = load_gray(args.image)
    h, w = gray.shape
    with timer.stage("detect"):
        score = fast_score_map(jnp.asarray(gray), args.threshold)
        pts = timer.block(extract_keypoints(score, capacity=65536))
    raw = int(pts.count)

    with timer.stage("cluster"):
        if args.exact:
            coords = np.asarray(pts.coords)[np.asarray(pts.mask)]
            clustered = hierarchical_cluster_exact(coords,
                                                   args.max_merge_dist)
        else:
            cap = max(raw // (args.chunks[0] * args.chunks[1]) * 2, 256)
            out = timer.block(grid_cluster_keypoints(
                pts, h, w, max_merge_dist=args.max_merge_dist,
                chunks=tuple(args.chunks), chunk_capacity=cap))
            clustered = np.asarray(out.coords)[np.asarray(out.mask)]

    print(f"{raw} keypoints -> {len(clustered)} clusters  {timer.summary()}")
    out_path = args.output or args.image.rsplit(".", 1)[0] + "_clustered.png"
    write_image(out_path, draw_squares(read_image(args.image), clustered))
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
