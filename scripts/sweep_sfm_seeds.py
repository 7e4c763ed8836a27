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
    ap.add_argument("--restarts", type=int, default=1,
                    help=">1 uses run_incremental_sfm_robust best-of-K "
                         "selection per seed")
    ap.add_argument("--out", default=None,
                    help="append a JSON record per frame count to this file")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from photogrammetry_tpu.sfm.incremental import (
        SfmConfig, run_incremental_sfm, run_incremental_sfm_robust,
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
            if args.restarts > 1:
                res = run_incremental_sfm_robust(
                    scene["frames"], scene["k"], SfmConfig(), seed=seed,
                    restarts=args.restarts)
            else:
                res = run_incremental_sfm(scene["frames"], scene["k"],
                                          SfmConfig(), seed=seed)
            ates.append(float(absolute_trajectory_error(
                res.camera_centers.astype(np.float32), gt_c)))
        rec = {"frames": nf, "seeds": args.seeds,
               "restarts": args.restarts,
               "ates": [round(a, 4) for a in ates],
               "mean": round(float(np.mean(ates)), 4),
               "p90": round(float(np.percentile(ates, 90)), 4),
               "max": round(float(np.max(ates)), 4)}
        print(f"frames={nf}: ates={[round(a, 3) for a in ates]} "
              f"mean={rec['mean']:.4f} p90={rec['p90']:.4f} "
              f"max={rec['max']:.4f}")
        if args.out:
            import json
            import time

            rec["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%S")
            with open(args.out, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
