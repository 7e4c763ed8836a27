"""Dewarp an image through the rational radial model, with map caching and
run-stats logging.

Reference analogue: python_src/scripts/de_warp.py:40-68 (hard-coded
coefficients [3e-4, 1e-7, 0, 0, 0] at :52; stats appended to
data/dewarp_test/stats.json via :27-38).
"""
from __future__ import annotations

import argparse


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("image")
    ap.add_argument("comment", nargs="?", default="")
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--coefficients", type=float, nargs=5,
                    default=[3e-4, 1e-7, 0.0, 0.0, 0.0])
    ap.add_argument("--cache-dir", default="./data/distortion_maps")
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--fast-apply", action="store_true",
                    help="separable two-pass Pallas remap (2-3 ms at "
                         "1080p on TPU vs ~90 ms gather; approximate to "
                         "~1/255 mean on the radial model — the exact "
                         "gather path stays the default)")
    ap.add_argument("--stats", default=None,
                    help="append timing stats to this JSON log")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from photogrammetry_tpu.io.image import read_image, write_image
    from photogrammetry_tpu.ops.dewarp import (
        apply_distortion_map, generate_distortion_map,
    )
    from photogrammetry_tpu.store.cache import DistortionMapCache
    from photogrammetry_tpu.utils.profiling import StageTimer, append_stats

    timer = StageTimer()
    img = read_image(args.image)
    h, w = img.shape[:2]

    with timer.stage("generate_map"):
        if args.no_cache:
            dist_map = timer.block(generate_distortion_map(
                h, w, jnp.asarray(args.coefficients, jnp.float32)))
        else:
            dist_map = DistortionMapCache(args.cache_dir).get_or_generate(
                h, w, args.coefficients)
    with timer.stage("apply_map"):
        if args.fast_apply:
            from photogrammetry_tpu.ops.dewarp import (
                make_distortion_applier,
            )

            apply = make_distortion_applier(dist_map, (h, w),
                                            use_pallas=True)
            out = timer.block(apply(jnp.asarray(img)))
        else:
            out = timer.block(apply_distortion_map(jnp.asarray(img),
                                                   jnp.asarray(dist_map)))

    out_path = args.output or args.image.rsplit(".", 1)[0] + "_dewarped.png"
    write_image(out_path, np.asarray(out))
    stats = timer.summary()
    print(f"{stats}")
    print(f"wrote {out_path}")
    if args.stats:
        append_stats(args.stats, {
            "comment": args.comment,
            "image": args.image,
            "coefficients": args.coefficients,
            "timings": stats,
        })
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
