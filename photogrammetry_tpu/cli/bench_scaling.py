"""Scaling-efficiency benchmark: distributed BA iters/s at 1..N devices.

North-star metric (BASELINE.json / BASELINE.md): "BA iters/s at 1 host /
N hosts", target >= 80% frames-per-second scaling efficiency at 2+ hosts.
The reference has no distributed execution at all (SURVEY.md §2.3), so the
baseline here is our own 1-device throughput; efficiency is measured the
standard way:

  weak scaling   (default): tracks = tracks_per_device * n; efficiency =
                 iters/s(n) / iters/s(1)   (ideal: flat, per-device work
                 constant, only the psum of the reduced camera system grows)
  strong scaling (--strong): fixed total tracks split n ways; efficiency =
                 n-device speedup / n.
  overhead       (--overhead): fixed total tracks; compares the n-device
                 sharded program against the SAME problem unsharded on one
                 device.  On virtual CPU devices (which share the host's
                 physical cores) weak/strong "efficiency" measures host
                 FLOP contention, not the collective schedule — this mode
                 is the meaningful one there: overhead_ratio = t_n / t_1,
                 ideal 1.0.

On a real pod slice, run without --force-cpu and the mesh spans the actual
chips (ICI collectives).  On a dev machine, --force-cpu (default when no TPU
is present) simulates N hosts with virtual CPU devices — that validates the
collective schedule and harness, not real ICI bandwidth.

Appends one JSON record per mesh size to a stats log (timestamp + hostname),
mirroring the reference's appended-JSON run log (de_warp.py:27-38,
data/dewarp_test/stats.json).
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import sys
import time


def _parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8],
                   help="mesh sizes to benchmark")
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--tracks-per-device", type=int, default=2048)
    p.add_argument("--iterations", type=int, default=10,
                   help="LM iterations per timed call")
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--strong", action="store_true",
                   help="strong scaling: fixed total tracks split n ways")
    p.add_argument("--overhead", action="store_true",
                   help="sharding-overhead mode: fixed total tracks, "
                   "n-device time vs 1-device time for the same problem")
    p.add_argument("--force-cpu", action="store_true", default=None,
                   help="run on virtual CPU devices (default if no TPU)")
    p.add_argument("--stats", default="data/bench/scaling_stats.json",
                   help="append-only JSON stats log")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = _parse_args(argv)
    max_dev = max(args.devices)

    # Virtual devices must be requested before jax initializes.
    if args.force_cpu or args.force_cpu is None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={max_dev}")
        import jax
        if args.force_cpu:
            jax.config.update("jax_platforms", "cpu")
        else:
            try:
                jax.devices("tpu")
            except RuntimeError:
                jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax
    import jax.numpy as jnp
    import numpy as np

    from photogrammetry_tpu.parallel.dist_ba import distributed_bundle_adjust
    from photogrammetry_tpu.parallel.mesh import make_mesh
    from photogrammetry_tpu.sfm.ba import BAProblem, BAState, project
    from photogrammetry_tpu.utils.profiling import append_stats

    devices = jax.devices()
    sizes = [n for n in args.devices if n <= len(devices)]
    skipped = [n for n in args.devices if n > len(devices)]
    if skipped:
        print(f"# skipping mesh sizes {skipped}: only {len(devices)} "
              f"devices available", file=sys.stderr)

    total_tracks_strong = args.tracks_per_device * max(sizes)
    rng = np.random.default_rng(0)
    k = jnp.array([[520.0, 0, 320], [0, 520.0, 240], [0, 0, 1]], jnp.float32)
    f = args.frames

    def build_problem(t):
        pts = jnp.asarray(rng.uniform(-2, 2, (t, 3)) + [0, 0, 6], jnp.float32)
        rs = jnp.tile(jnp.eye(3)[None], (f, 1, 1))
        ts = jnp.asarray(rng.normal(0, 0.1, (f, 3)), jnp.float32)
        obs, _, _ = project(rs, ts, pts, k)
        obs = obs + jnp.asarray(rng.normal(0, 0.5, obs.shape), jnp.float32)
        state = BAState(
            rs=rs, ts=ts,
            points=pts + jnp.asarray(rng.normal(0, 0.05, (t, 3)), jnp.float32))
        prob = BAProblem(obs=obs, mask=jnp.ones((f, t), bool), k=k)
        return state, prob

    results = []
    base_ips = None
    for n in sizes:
        t = (total_tracks_strong if (args.strong or args.overhead)
             else args.tracks_per_device * n)
        mesh = make_mesh(shape=(n,), axis_names=("tracks",),
                         devices=devices[:n])
        state, prob = build_problem(t)

        def run():
            res = distributed_bundle_adjust(
                state, prob, mesh, num_iterations=args.iterations)
            jax.block_until_ready(res.state.points)
            return res

        run()  # warmup/compile
        start = time.perf_counter()
        for _ in range(args.repeats):
            run()
        dt = (time.perf_counter() - start) / args.repeats
        ips = args.iterations / dt
        if base_ips is None:
            base_ips = ips
        if args.overhead:
            eff = ips / base_ips      # t_1 / t_n; ideal 1.0 on shared cores
        elif args.strong:
            eff = (ips / base_ips) / (n / sizes[0])
        else:
            eff = ips / base_ips
        rec = {
            "metric": "ba_iters_per_s",
            "mesh_devices": n,
            "frames": f,
            "tracks": t,
            "mode": ("overhead" if args.overhead
                     else "strong" if args.strong else "weak"),
            "value": round(ips, 3),
            "unit": "iters/s",
            "scaling_efficiency": round(eff, 3),
            "platform": devices[0].platform,
            "hostname": socket.gethostname(),
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        results.append(rec)
        print(json.dumps(rec))

    if args.stats:
        for rec in results:
            append_stats(args.stats, rec)
    return 0


if __name__ == "__main__":
    sys.exit(main())
