"""Two-view camera pose from an image pair: detect → match → RANSAC →
essential decomposition → triangulation; writes a PLY cloud and scatter
diagnostics.

Reference analogue: the EstimateCameraPose driver in
dotnet_src/Photogrammetry/Program.cs:207-249 (detect + NMS per image, match,
GetFundamentalMatrix with 2000 samples, EstimateCameraPose →
Utils.CreatePointCloud "test.ply" + ScottPlot scatter PNGs,
CameraPoseEstimation.cs:177-201).
"""
from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("image1")
    ap.add_argument("image2")
    ap.add_argument("--detection-threshold", type=float, default=50.0)
    ap.add_argument("--match-threshold", type=int, default=75)
    ap.add_argument("--reduction", choices=["cluster", "nms", "anms", "none"],
                    default="nms")
    ap.add_argument("--num-samples", type=int, default=2000,
                    help="RANSAC hypotheses (Program.cs:229)")
    ap.add_argument("--ransac-threshold", type=float, default=1.5,
                    help="Sampson inlier threshold, pixels")
    ap.add_argument("--fx", type=float, default=None,
                    help="focal length in pixels (default 1.2*width)")
    ap.add_argument("--oriented-brief", action="store_true",
                    help="steered (rotation-invariant) BRIEF descriptors")
    ap.add_argument("--pyramid-octaves", type=int, default=1,
                    help=">1 runs the multi-scale pyramid frontend "
                         "(scale-invariant matching; 3 is typical)")
    ap.add_argument("--motion-filter", action="store_true",
                    help="GMS-style motion-smoothness prefilter on the "
                         "matches before RANSAC (ops.match."
                         "motion_consistency_mask) — raises the inlier "
                         "ratio on repetitive-texture wide-baseline pairs")
    ap.add_argument("--cloud", default="test.ply")
    ap.add_argument("--plots", default=None,
                    help="prefix for depth-scatter PNGs (omit to skip)")
    ap.add_argument("--stats", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from photogrammetry_tpu.cli.common import load_gray
    from photogrammetry_tpu.io.ply import write_ply
    from photogrammetry_tpu.sfm.frontend import (
        FrontendConfig, detect_and_describe_split, make_pairs, match_pair,
    )
    from photogrammetry_tpu.sfm.two_view import two_view_pipeline
    from photogrammetry_tpu.utils.profiling import StageTimer, append_stats

    config = FrontendConfig(
        detection_threshold=args.detection_threshold,
        hamming_threshold=args.match_threshold,
        reduction=args.reduction,
        suppression_radius=4.0,
        oriented_brief=args.oriented_brief,
    )
    pairs = make_pairs(config)
    g1 = jnp.asarray(load_gray(args.image1))
    g2 = jnp.asarray(load_gray(args.image2))
    h, w = g1.shape
    fx = args.fx if args.fx is not None else 1.2 * w
    if fx <= 0:
        raise SystemExit(f"--fx must be positive, got {fx}")
    k = jnp.array([[fx, 0.0, w / 2.0], [0.0, fx, h / 2.0], [0.0, 0.0, 1.0]],
                  jnp.float32)

    timer = StageTimer()
    with timer.stage("frontend"):
        if args.pyramid_octaves > 1:
            from photogrammetry_tpu.sfm.frontend import (
                detect_and_describe_pyramid,
            )

            f1 = detect_and_describe_pyramid(g1, pairs, config,
                                             octaves=args.pyramid_octaves)
            f2 = detect_and_describe_pyramid(g2, pairs, config,
                                             octaves=args.pyramid_octaves)
        else:
            f1 = detect_and_describe_split(g1, pairs, config)
            f2 = detect_and_describe_split(g2, pairs, config)
        m = timer.block(match_pair(f1, f2, config))
    if args.motion_filter:
        from photogrammetry_tpu.ops.match import motion_consistency_mask

        m = m._replace(mask=motion_consistency_mask(m.xy1, m.xy2, m.mask),
                       num=None)
        m = m._replace(num=jnp.sum(m.mask).astype(jnp.int32))
    with timer.stage("two_view"):
        # model="fundamental": this CLI mirrors the reference's exact
        # F-only driver (Program.cs:207-249); auto H/F arbitration lives
        # in the SfM bootstrap.
        out = timer.block(two_view_pipeline(
            jax.random.PRNGKey(0), m.xy1, m.xy2, m.mask, k,
            threshold=args.ransac_threshold, num_samples=args.num_samples,
            model="fundamental"))

    inl = np.asarray(out.inliers) & np.asarray(m.mask)
    pts = np.asarray(out.points)[inl]
    pts = pts[np.isfinite(pts).all(axis=1) & (pts[:, 2] > 0)]
    write_ply(args.cloud, pts)
    if args.plots:
        from photogrammetry_tpu.io.image import write_image
        from photogrammetry_tpu.io.draw import scatter_plot

        write_image(f"{args.plots}_xz.png", scatter_plot(pts[:, 0], pts[:, 2]))
        write_image(f"{args.plots}_xy.png", scatter_plot(pts[:, 0], pts[:, 1]))

    report = {
        "keypoints": [int(f1.points.count), int(f2.points.count)],
        "matches": int(m.num),
        "inliers": int(out.num_inliers),
        "rotation": np.asarray(out.r).tolist(),
        "translation": np.asarray(out.t).tolist(),
        "cheirality_votes": np.asarray(out.cheirality).tolist(),
        "points": int(len(pts)),
        "timings": timer.summary(),
    }
    print(json.dumps(report))
    print(f"wrote {args.cloud}")
    if args.stats:
        append_stats(args.stats, report)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
