"""Full incremental-SfM throughput on the real chip (synthetic scene)."""
from __future__ import annotations

import os
import time

import jax

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    print("devices:", jax.devices(), flush=True)
    from photogrammetry_tpu.sfm.incremental import (
        SfmConfig, run_incremental_sfm,
    )
    from photogrammetry_tpu.sfm.metrics import absolute_trajectory_error
    from photogrammetry_tpu.synth.star_scene import (
        StarSceneConfig, generate_sequence,
    )

    scene = generate_sequence(StarSceneConfig(num_frames=8, supersample=2))
    nf = len(scene["frames"])
    gt_c = -np.einsum("fji,fj->fi", scene["rs"], scene["ts"])

    for name, cfg in [
        ("diag-off", SfmConfig(collect_diagnostics=False)),
        ("diag-on", SfmConfig()),
        ("diag-off oldmatch", SfmConfig(collect_diagnostics=False,
                                        precompute_matching=False)),
    ]:
        t0 = time.perf_counter()
        res = run_incremental_sfm(scene["frames"], scene["k"], cfg)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = run_incremental_sfm(scene["frames"], scene["k"], cfg)
        warm = time.perf_counter() - t0
        ate = float(absolute_trajectory_error(
            np.asarray(res.camera_centers, np.float32),
            gt_c.astype(np.float32)))
        print(f"{name}: warm {warm:.2f} s for {nf} frames = "
              f"{nf/warm:.2f} frames/s (cold {cold:.0f} s); "
              f"ate={ate:.4f} landmarks={res.points.shape[0]}",
              flush=True)


if __name__ == "__main__":
    main()
