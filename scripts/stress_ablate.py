"""Decompose long-sequence ATE across this round's changes: pm-mode
matching x cross-seam refine, on a shorter out-and-back arc."""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import jax

jax.config.update("jax_platforms", "cpu")

import cv2
import jax.numpy as jnp
import numpy as np


def main(num_frames: int = 120):
    from photogrammetry_tpu.cli.run_sfm import main as run_sfm
    from photogrammetry_tpu.sfm.metrics import absolute_trajectory_error
    from photogrammetry_tpu.synth.star_scene import (
        StarSceneConfig, generate_orbit_sequence,
    )

    half = num_frames // 2 + 1
    cfg = StarSceneConfig(num_frames=half, image_size=(240, 320),
                          focal=260.0, supersample=2)
    scene = generate_orbit_sequence(cfg, total_angle=1.2 * (half - 1) / 100)
    frames = np.concatenate([scene["frames"], scene["frames"][-2::-1]])
    centers = np.concatenate([scene["centers"], scene["centers"][-2::-1]])

    variants = {
        "prior30": ["--submap-prior-weight", "30"],
        "prior100": ["--submap-prior-weight", "100"],
        "prior10": ["--submap-prior-weight", "10"],
    }
    L = float(np.sum(np.linalg.norm(np.diff(centers, axis=0), axis=1)))
    for name, extra in variants.items():
        with tempfile.TemporaryDirectory() as td:
            fd = os.path.join(td, "frames")
            os.makedirs(fd)
            for i, f in enumerate(frames):
                cv2.imwrite(os.path.join(fd, f"{i:04d}.png"), f)
            traj = os.path.join(td, "traj.json")
            t0 = time.time()
            run_sfm([fd, "--fx", "260", "--cx", "160", "--cy", "120",
                     "--detection-threshold", "20",
                     "--submap-frames", "18", "--submap-overlap", "6",
                     "--loop-closure", "--loop-min-gap", "24",
                     "--loop-min-matches", "25", "--loop-mode", "revisit",
                     "--loop-max-edges", "24",
                     "--trajectory", traj,
                     "--cloud", os.path.join(td, "cloud.ply")] + extra)
            dt = time.time() - t0
            est = np.asarray(json.loads(open(traj).read())["centers"],
                             np.float32)
        ate = float(absolute_trajectory_error(
            jnp.asarray(est), jnp.asarray(centers.astype(np.float32))))
        print(json.dumps({"variant": name, "ate": round(ate, 4),
                          "pct": round(100 * ate / L, 2),
                          "secs": round(dt, 1)}), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 120)
