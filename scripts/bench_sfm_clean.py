"""Zero-read end-to-end incremental SfM on the chip (the clean-dispatch
number the round-4 floor analysis predicted).

Background (docs/tpu_notes.md §3/§7): on the tunnel runtime the process's
FIRST device->host read of ANY size permanently flips it into synchronous
~2-17 ms/program dispatch; the staged SfM loop (~20 programs/frame) then
lands at the poisoned floor (9.5-11 fps measured round 4) even though its
true device work is ~5-10 ms/frame.  A process therefore has exactly ONE
clean window — everything before its first read.  This bench uses it for
one complete end-to-end run, final export read INCLUDED:

  1. warm-up: the full pipeline runs once with ``export=False``
     (zero reads) — compiles + per-program executable loads happen here;
  2. a host sleep lets the queued warm-up device work drain (sleeping
     does not read, so the process stays clean);
  3. timed: ONE full run, frames -> trajectory, ending in the pipeline's
     real single batched device_get.  Every dispatch in the window is
     asynchronous (~0.2 ms), so wall time ~= true device work;
  4. the export read flips the process; the SAME run is then re-timed to
     report the poisoned-mode floor for comparison.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_sfm_clean.py
            [--scene pan8|blend60] [--drain SECONDS]

Run each scene in its OWN process (one clean window per process).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def build_scene(name: str):
    if name == "pan8":
        from photogrammetry_tpu.synth.star_scene import (
            StarSceneConfig, generate_sequence,
        )

        scene = generate_sequence(StarSceneConfig(num_frames=8,
                                                  supersample=2))
        gt_c = -np.einsum("fji,fj->fi", scene["rs"], scene["ts"])
        return scene["frames"], scene["k"], gt_c
    if name == "blend60":
        from photogrammetry_tpu.synth import blend_oracle as bo

        sc = bo.extract_blend_scene(frame_stride=1)
        r = bo.render_blend_sequence(sc, scale=0.25, supersample=2)
        return r["frames"], r["k"], np.asarray(sc["centers"], np.float32)
    raise SystemExit(f"unknown scene {name!r}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="pan8", choices=["pan8", "blend60"])
    ap.add_argument("--drain", type=float, default=10.0,
                    help="seconds to let warm-up device work drain")
    ap.add_argument("--clean-runs", type=int, default=1,
                    help="runs amortized inside the one clean window "
                         "(only the last exports)")
    args = ap.parse_args()

    from photogrammetry_tpu.sfm.incremental import (
        SfmConfig, run_incremental_sfm,
    )
    from photogrammetry_tpu.sfm.metrics import absolute_trajectory_error

    frames, k, gt_c = build_scene(args.scene)
    nf = len(frames)
    cfg = SfmConfig(read_free=True, collect_diagnostics=False)
    print(f"scene={args.scene} frames={nf} backend={jax.default_backend()}",
          flush=True)

    # 1-2. warm-up (zero reads) + drain.  All compiles and executable
    # loads happen during this dispatch; the sleep lets the enqueued
    # device work finish without a read.
    t0 = time.perf_counter()
    _ = run_incremental_sfm(frames, k, cfg, export=False)
    t_dispatch = time.perf_counter() - t0
    print(f"warm-up dispatch (compiles/loads): {t_dispatch:.1f} s; "
          f"draining {args.drain:.0f} s", flush=True)
    time.sleep(args.drain)

    # 3. the clean window: complete run(s) including one final export.
    t0 = time.perf_counter()
    for _ in range(args.clean_runs - 1):
        run_incremental_sfm(frames, k, cfg, export=False)
    res = run_incremental_sfm(frames, k, cfg)
    clean = (time.perf_counter() - t0) / args.clean_runs

    # 4. the export read above flipped the process — poisoned floor next.
    t0 = time.perf_counter()
    res_p = run_incremental_sfm(frames, k, cfg)
    poisoned = time.perf_counter() - t0

    def ate_of(r):
        return float(absolute_trajectory_error(
            np.asarray(r.camera_centers, np.float32), gt_c))

    out = {
        "scene": args.scene,
        "frames": nf,
        "clean_s": round(clean, 3),
        "clean_fps": round(nf / clean, 2),
        "poisoned_s": round(poisoned, 3),
        "poisoned_fps": round(nf / poisoned, 2),
        "speedup": round(poisoned / clean, 2),
        "ate_clean": round(ate_of(res), 4),
        "ate_poisoned": round(ate_of(res_p), 4),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
