"""Across-seed ATE sweep of the incremental SfM pipeline (CPU).

The RANSAC seed decides bootstrap basin luck; single-seed ATE numbers are
noisy, so robustness work is evaluated on the across-seed mean/max.  Usage:

    python scripts/sweep_sfm_seeds.py [--frames 8 12] [--seeds 6]
"""
from __future__ import annotations

import argparse


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, nargs="+", default=[8, 12])
    ap.add_argument("--seeds", type=int, default=6)
    ap.add_argument("--supersample", type=int, default=2)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from photogrammetry_tpu.sfm.incremental import (
        SfmConfig, run_incremental_sfm,
    )
    from photogrammetry_tpu.sfm.metrics import absolute_trajectory_error
    from photogrammetry_tpu.synth.star_scene import (
        StarSceneConfig, generate_sequence,
    )

    for nf in args.frames:
        scene = generate_sequence(StarSceneConfig(
            num_frames=nf, supersample=args.supersample))
        gt_c = -np.einsum("fji,fj->fi", scene["rs"],
                          scene["ts"]).astype(np.float32)
        ates = []
        for seed in range(args.seeds):
            res = run_incremental_sfm(scene["frames"], scene["k"],
                                      SfmConfig(), seed=seed)
            ates.append(float(absolute_trajectory_error(
                res.camera_centers.astype(np.float32), gt_c)))
        print(f"frames={nf}: ates={[round(a, 3) for a in ates]} "
              f"mean={np.mean(ates):.4f} max={np.max(ates):.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
