"""Conditioning sweep for SfM on the blend-derived sequence.

The blend scene is a planar star under pure lateral translation with a
narrow (~40 deg) FOV — weak depth conditioning (bas-relief).  The texture
dots we add around the star (geometry ours, trajectory/star blend-exact)
set the depth diversity; this sweeps their spread plus render scale and
frame stride to pick defaults for the oracle test.
"""
from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import photogrammetry_tpu.synth.blend_oracle as bo  # noqa: E402
from photogrammetry_tpu.sfm.incremental import (  # noqa: E402
    SfmConfig, run_incremental_sfm,
)
from photogrammetry_tpu.sfm.metrics import (  # noqa: E402
    absolute_trajectory_error,
)


def run(stride, scale, zlo, zhi, seed=11):
    orig = bo._texture_dots

    def dots(star, depth):
        rng = np.random.default_rng(seed)
        z0 = float(np.mean(star[:, 2]))
        pts = rng.uniform([-2.4, -1.5, z0 + zlo], [2.4, 1.5, z0 + zhi],
                          (220, 3))
        rad = np.hypot(pts[:, 0], pts[:, 1])
        pts = pts[rad > 1.15]
        intens = rng.integers(130, 255, len(pts))
        return pts, intens

    bo._texture_dots = dots
    try:
        sc = bo.extract_blend_scene(frame_stride=stride)
        r = bo.render_blend_sequence(sc, scale=scale, supersample=2)
    finally:
        bo._texture_dots = orig
    t0 = time.perf_counter()
    res = run_incremental_sfm(r["frames"], r["k"], SfmConfig())
    dt = time.perf_counter() - t0
    gt = sc["centers"].astype(np.float32)
    est = np.asarray(res.camera_centers, np.float32)
    ate = float(absolute_trajectory_error(est, gt))
    print(json.dumps({"stride": stride, "scale": scale,
                      "z": [zlo, zhi], "frames": len(gt),
                      "ate": round(ate, 4), "secs": round(dt, 1)}),
          flush=True)


if __name__ == "__main__":
    run(6, 0.25, -1.2, 0.9)    # current defaults
    run(6, 0.25, -2.5, 1.5)    # deeper dots
    run(6, 0.4, -2.5, 1.5)     # + resolution
    run(4, 0.25, -2.5, 1.5)    # + frames
    run(3, 0.4, -2.5, 1.5)     # both
