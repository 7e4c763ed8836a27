"""The reference's live production pipeline, end to end.

Reproduces TestService.BuildKeypointDetectorPipeline exactly —
read -> dewarp -> grayscale -> detect -> NMS -> draw -> write
(TestService.cs:137-152, DeWarpTransformStepFactory.cs:51-62,
Converters.cs:11-23, RedundantKeypointEliminatorTransformStepFactory.cs)
— as a staged run over the content store, with the distortion table built
once and cached (the reference's Lazy<> table,
DeWarpTransformStepFactory.cs:15-37 + our on-disk cache).

Default options mirror appsettings.json: distortion coefficients
[3e-4, 1e-7, 0, 0, 0], suppression radius 50 (appsettings.json:7-27);
the detection threshold is in 0-255 grayscale units like the Python CLIs
(reference C# uses 0.1 on normalized [0,1] — the deliberate unit change
noted in SURVEY.md §5).
"""
from __future__ import annotations

import argparse
import hashlib
import os


def build_pipeline(coeffs, threshold: float, suppression_radius: float,
                   max_keypoints: int, out_dir: str, cache_dir: str,
                   store=None):
    """The TestService stage chain as a store-mediated Pipeline."""
    import numpy as np

    from photogrammetry_tpu.io.draw import draw_squares
    from photogrammetry_tpu.io.image import read_image, write_image
    from photogrammetry_tpu.ops.dewarp import apply_distortion_map
    from photogrammetry_tpu.ops.fast import extract_keypoints, fast_score_map
    from photogrammetry_tpu.ops.grayscale import bgr_to_gray_cv2
    from photogrammetry_tpu.ops.nms import nms_keypoints_static
    from photogrammetry_tpu.store.cache import DistortionMapCache
    from photogrammetry_tpu.store.content_store import Variant
    from photogrammetry_tpu.store.pipeline import Pipeline, Stage

    import jax.numpy as jnp

    cache = DistortionMapCache(cache_dir)
    maps = {}  # (h, w) -> distortion map; the Lazy<> one-time build

    def dewarp(img):
        if not np.any(np.asarray(coeffs)):
            return img  # identity model
        hw = img.shape[:2]
        if hw not in maps:
            maps[hw] = cache.get_or_generate(*hw, coeffs)
        return np.asarray(apply_distortion_map(jnp.asarray(img),
                                               jnp.asarray(maps[hw])))

    def detect(gray):
        score = fast_score_map(jnp.asarray(gray, jnp.float32),
                               float(threshold))
        return extract_keypoints(score, max_keypoints, order="score")

    def nms(points):
        return nms_keypoints_static(points, jnp.float32(suppression_radius))

    def draw(points, dewarped):
        coords = np.asarray(points.coords)[np.asarray(points.mask)]
        return draw_squares(np.asarray(dewarped), coords, half=3,
                            color=(0, 255, 0))

    def write(overlay, source):
        # name from the input path, not a completion counter: with
        # --workers > 1 records finish in arbitrary order, so a shared
        # counter would map output indices to inputs nondeterministically
        os.makedirs(out_dir, exist_ok=True)
        stem = os.path.splitext(os.path.basename(str(source)))[0]
        path = os.path.join(out_dir, f"keypoints_{stem}.png")
        if os.path.exists(path):
            # two inputs sharing a basename stem (same filename in
            # different directories, or foo.jpg + foo.png) must not
            # silently overwrite each other
            tag = hashlib.sha1(str(source).encode()).hexdigest()[:8]
            path = os.path.join(out_dir, f"keypoints_{stem}_{tag}.png")
        write_image(path, overlay)
        return path

    return Pipeline([
        Stage("read", Variant.SOURCE, Variant.RGB,
              lambda p: read_image(p)),
        Stage("dewarp", Variant.RGB, Variant.DEWARPED_RGB, dewarp),
        Stage("grayscale", Variant.DEWARPED_RGB,
              Variant.DEWARPED_GRAYSCALE,
              lambda img: np.asarray(bgr_to_gray_cv2(img),
                                     np.float32)),
        Stage("detect", Variant.DEWARPED_GRAYSCALE, Variant.KEYPOINTS,
              detect),
        Stage("nms", Variant.KEYPOINTS, Variant.DENOISED_KEYPOINTS, nms),
        Stage("draw", Variant.DENOISED_KEYPOINTS, Variant.OVERLAY, draw,
              extra_inputs=(Variant.DEWARPED_RGB,)),
        Stage("write", Variant.OVERLAY, Variant.ARTIFACT, write,
              extra_inputs=(Variant.SOURCE,)),
    ], store=store)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("images", nargs="+", help="input image files")
    ap.add_argument("--coeffs", type=float, nargs=5,
                    default=[3e-4, 1e-7, 0.0, 0.0, 0.0],
                    help="radial distortion coefficients k1..k5 "
                         "(appsettings.json defaults); all zero = no dewarp")
    ap.add_argument("--detection-threshold", type=float, default=50.0)
    ap.add_argument("--suppression-radius", type=float, default=50.0)
    ap.add_argument("--max-keypoints", type=int, default=4096)
    ap.add_argument("--out-dir", default="data/pipeline_out")
    ap.add_argument("--cache-dir", default="data/distortion_maps")
    ap.add_argument("--workers", type=int, default=2,
                    help=">1 overlaps records across stages like the "
                         "reference's dataflow blocks (TestService.cs:85-87)")
    args = ap.parse_args(argv)

    pipe = build_pipeline(args.coeffs, args.detection_threshold,
                          args.suppression_radius, args.max_keypoints,
                          args.out_dir, args.cache_dir)
    rids = pipe.run(args.images, max_workers=args.workers)

    from photogrammetry_tpu.store.content_store import Variant

    for path, rid in zip(args.images, rids):
        import numpy as np

        pts = pipe.store.fetch(rid, Variant.DENOISED_KEYPOINTS)
        n = int(np.asarray(pts.mask).sum())
        out = pipe.store.fetch(rid, Variant.ARTIFACT)
        print(f"{path}: {n} keypoints -> {out}")
    print("stage timings:", pipe.timer.summary())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
