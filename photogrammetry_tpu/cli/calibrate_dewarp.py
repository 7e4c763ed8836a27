"""Calibrate lens-distortion coefficients from images of straight edges.

Closes the reference's open calibration gap: it hard-codes its coefficients
([3e-4, 1e-7, 0, 0, 0], python_src/scripts/de_warp.py:52) and derives the
model candidates in notes/de_warping.md but never fits them to data (the
data/dewarp_test straight_edge_*.jpg fixtures exist for exactly this).
Plumb-line method over Sobel edges + MXU Hough lines + jitted LM; see
ops/calibrate.py.

Usage:
    python -m photogrammetry_tpu.cli.calibrate_dewarp IMG [IMG...] \
        [--num-lines 8] [--tol 4] [--rounds 3] [--fit-denominator] \
        [--save-coefficients coeffs.json] [--dewarp-output out.png]
"""
from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("images", nargs="+")
    ap.add_argument("--num-lines", type=int, default=8)
    ap.add_argument("--tol", type=float, default=4.0,
                    help="point-to-line assignment tolerance (px)")
    ap.add_argument("--rounds", type=int, default=3,
                    help="alternating extract/fit rounds")
    ap.add_argument("--iterations", type=int, default=30,
                    help="LM iterations per round")
    ap.add_argument("--model", default="rational",
                    choices=("rational", "brown"),
                    help="distortion model: the reference's 5-param "
                         "rational, or the even-power Brown model from "
                         "its derivation notes (de_warping.md method 3)")
    ap.add_argument("--fit-denominator", action="store_true",
                    help="also fit k3..k5 (denominator); default fits the "
                    "numerator pair [k1, k2] like the reference uses")
    ap.add_argument("--save-coefficients", default=None,
                    help="write fitted [k1..k5] to this JSON file")
    ap.add_argument("--dewarp-output", default=None,
                    help="also dewarp the first image with the fit")
    ap.add_argument("--stats", default=None,
                    help="append run stats to this JSON log")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from photogrammetry_tpu.cli.common import load_gray
    from photogrammetry_tpu.ops.calibrate import (
        assign_points_to_lines, calibrate_distortion, extract_edge_points,
        hough_from_points, undistort_points, undistort_points_brown,
    )
    from photogrammetry_tpu.utils.profiling import StageTimer, append_stats

    if args.model == "brown":
        param_mask = jnp.array([1.0, 1.0, 1.0, 0.0, 0.0], jnp.float32)
        undist = undistort_points_brown
    else:
        param_mask = jnp.array([1.0, 1.0, 1.0, 1.0, 1.0]
                               if args.fit_denominator
                               else [1.0, 1.0, 0.0, 0.0, 0.0], jnp.float32)
        undist = undistort_points
    timer = StageTimer()

    # Pool line groups from every input image (all must share dimensions so
    # one distortion center applies).
    all_pts, all_masks = [], []
    center = extent = None
    coeffs = jnp.zeros((5,), jnp.float32)
    result = None
    with timer.stage("calibrate"):
        imgs = [jnp.asarray(load_gray(p)) for p in args.images]
        h, w = imgs[0].shape
        for im in imgs:
            if im.shape != (h, w):
                raise SystemExit("all calibration images must share "
                                 f"dimensions; got {im.shape} vs {(h, w)}")
        center = jnp.array([h / 2.0, w / 2.0], jnp.float32)
        extent = float(np.hypot(h / 2.0, w / 2.0))
        extracted = [extract_edge_points(im) for im in imgs]
        for _ in range(max(1, args.rounds)):
            all_pts, all_masks = [], []
            for pts, val in extracted:
                und = undist(pts, coeffs, center)
                lines = hough_from_points(und, val, center, extent,
                                          num_lines=args.num_lines)
                ti, mask = assign_points_to_lines(und, val, lines, center,
                                                  tol=args.tol)
                all_pts.append(pts[ti])
                all_masks.append(mask)
            grouped = jnp.concatenate(all_pts, axis=0)
            mask = jnp.concatenate(all_masks, axis=0)
            result = calibrate_distortion(grouped, mask, center,
                                          init_coeffs=coeffs,
                                          num_iterations=args.iterations,
                                          param_mask=param_mask,
                                          model=args.model)
            coeffs = result.coeffs

    fitted = [float(c) for c in np.asarray(result.coeffs)]
    print(json.dumps({
        "coefficients": fitted,
        "model": args.model,
        "initial_cost": float(result.initial_cost),
        "final_cost": float(result.cost),
        "images": args.images,
    }))

    if args.save_coefficients:
        with open(args.save_coefficients, "w") as f:
            json.dump({"coefficients": fitted}, f)
        print(f"wrote {args.save_coefficients}")

    if args.dewarp_output:
        from photogrammetry_tpu.io.image import write_image
        from photogrammetry_tpu.ops.dewarp import (
            apply_distortion_map, generate_distortion_map,
        )
        if args.model == "brown":
            from photogrammetry_tpu.ops.dewarp import (
                generate_distortion_map_brown,
            )

            dmap = generate_distortion_map_brown(
                h, w, jnp.asarray(fitted, jnp.float32))
        else:
            dmap = generate_distortion_map(
                h, w, jnp.asarray(fitted, jnp.float32))
        out = apply_distortion_map(imgs[0], dmap)
        write_image(args.dewarp_output, np.asarray(out).astype(np.uint8))
        print(f"wrote {args.dewarp_output}")

    if args.stats:
        append_stats(args.stats, {
            "tool": "calibrate_dewarp",
            "images": args.images,
            "coefficients": fitted,
            "final_cost": float(result.cost),
            **timer.summary(),
        })
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
