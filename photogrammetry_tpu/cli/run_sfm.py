"""Run incremental SfM over an image sequence; export trajectory + cloud.

The framework's top-level driver (the analogue of the reference's
TestService hosted pipeline, TestService.cs:47-56, extended to the full
multi-view north star).  Accepts a directory of frames (sorted) or the
built-in synthetic star pan with exact ground truth for ATE reporting.
"""
from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("frames", nargs="?", default=None,
                    help="directory of image frames; omit for the synthetic "
                         "star-pan sequence")
    ap.add_argument("--synthetic-frames", type=int, default=8)
    ap.add_argument("--fx", type=float, default=None)
    ap.add_argument("--cx", type=float, default=None)
    ap.add_argument("--cy", type=float, default=None)
    ap.add_argument("--detection-threshold", type=float, default=20.0)
    ap.add_argument("--pyramid-octaves", type=int, default=1,
                    help=">1 runs the multi-scale pyramid frontend "
                         "(scale-invariant tracking up to ~2^(octaves-1) "
                         "apparent-scale change; keypoint and track "
                         "capacity scale with octaves)")
    ap.add_argument("--oriented-brief", action="store_true",
                    help="steered (rotation-invariant) BRIEF descriptors "
                         "in the tracking frontend (ops/brief.py)")
    ap.add_argument("--precompute-matching", action="store_true",
                    help="batched sequence-level matching+gating precompute "
                         "(~7 fewer dispatches/frame; measured a TIE on "
                         "the tunnel chip — use where per-dispatch cost "
                         "dominates; RANSAC seed streams differ from the "
                         "default sequential draws)")
    ap.add_argument("--frame-stride", type=int, default=1,
                    help="temporal subsampling: keep every Nth frame. "
                         "Near-static spacing starves two-view parallax "
                         "(measured on the blend-derived pan: all 60 "
                         "frames ATE 0.086 vs stride-6 ATE 0.024 — "
                         "BENCH_FULL.md); stride is the simple keyframing "
                         "lever")
    ap.add_argument("--distortion-coeffs", type=float, nargs=5, default=None,
                    metavar=("K1", "K2", "K3", "K4", "K5"),
                    help="rational radial distortion coefficients; when "
                         "given every frame is dewarped through the cached "
                         "inverse map before detection (the reference's "
                         "live pipeline order: read->dewarp->gray->detect, "
                         "TestService.cs:137-152)")
    ap.add_argument("--dewarp-cache", default="data/distortion_maps",
                    help="distortion-map cache directory")
    ap.add_argument("--cloud", default="cloud.ply")
    ap.add_argument("--trajectory", default="trajectory.json")
    ap.add_argument("--stats", default=None)
    ap.add_argument("--diagnostics", action="store_true",
                    help="collect per-frame diagnostic counters (costs "
                         "device->host reads per frame; see SfmConfig."
                         "collect_diagnostics)")
    ap.add_argument("--checkpoint", default=None,
                    help="snapshot path; reruns resume from the last "
                         "snapshot (store/checkpoint.py)")
    ap.add_argument("--no-resume", action="store_true",
                    help="ignore an existing checkpoint and start fresh")
    ap.add_argument("--loop-closure", action="store_true",
                    help="detect loop closures (MXU place recognition) and "
                         "optimize the pose graph after SfM")
    ap.add_argument("--loop-min-gap", type=int, default=None,
                    help="minimum frame separation for a loop candidate; "
                         "default max(5, F//4) — temporally-near pairs "
                         "share geometry by construction, and accepting "
                         "them as 'loops' lets median-quality Procrustes "
                         "edges fight the BA trajectory (measured: ATE "
                         "0.03 -> 0.14 on an 8-frame pan with gap 3)")
    ap.add_argument("--loop-min-matches", type=int, default=30)
    ap.add_argument("--loop-max-edges", type=int, default=8,
                    help="max accepted loop edges; long revisit sequences "
                         "benefit from more (each edge pins another pair "
                         "of the trajectory together)")
    ap.add_argument("--loop-mode", default="rotation",
                    choices=("rotation", "essential", "revisit",
                             "revisit_sim3"),
                    help="loop-edge measurement: 'rotation' constrains "
                         "orientation only; 'essential' a full relative "
                         "pose at the current baseline; 'revisit' a "
                         "zero-baseline edge that pins revisit centers "
                         "together; 'revisit_sim3' additionally measures "
                         "the relative SCALE at each revisit (median "
                         "triangulated-depth ratio) and optimizes a "
                         "Sim(3) pose graph — the monocular scale-drift "
                         "corrector")
    ap.add_argument("--restarts", type=int, default=1,
                    help=">1 runs best-of-K restarts with ground-truth-free "
                         "quality selection (support + median reprojection "
                         "error) — cuts RANSAC basin-luck ATE tails")
    ap.add_argument("--submap-frames", type=int, default=0,
                    help=">0 chains overlapping submaps of this many frames "
                         "(sfm/submaps.py): track capacity scales with "
                         "sequence length instead of one fixed table")
    ap.add_argument("--submap-overlap", type=int, default=4)
    ap.add_argument("--submap-prior-weight", type=float, default=100.0,
                    help="trajectory-anchor weight for the cross-seam "
                         "global BA (0 = pure reprojection; large values "
                         "pin the pose-graph trajectory)")
    ap.add_argument("--submap-refine", type=int, default=2,
                    help="cross-seam global refinement rounds after the "
                         "pose graph: merged overlap tracks are "
                         "retriangulated and bundle-adjusted globally "
                         "(0 disables; sfm/submaps.py)")
    ap.add_argument("--mesh", type=int, default=0,
                    help=">0 runs every windowed/final bundle adjustment "
                         "as the distributed psum-Schur step over a "
                         "jax.sharding.Mesh of this many devices "
                         "(parallel/dist_ba.py); tracks are sharded over "
                         "the mesh axis. Use with "
                         "XLA_FLAGS=--xla_force_host_platform_device_count"
                         "=N for a virtual CPU mesh, or real chips")
    ap.add_argument("--keyframe-disp", type=float, default=0.0,
                    help=">0 builds the map from displacement-gated "
                         "keyframes only (new keyframe every N px of "
                         "median feature motion) and PnP-localizes every "
                         "skipped frame — full per-frame trajectory with "
                         "keyframe-quality conditioning (sfm/keyframes.py;"
                         " 60-frame blend sequence: ATE 0.086 naive -> "
                         "0.032 keyframed)")
    args = ap.parse_args(argv)
    if args.restarts > 1 and args.checkpoint:
        ap.error("--restarts and --checkpoint conflict: restart selection "
                 "re-runs from scratch and cannot resume a snapshot")
    if args.checkpoint and (args.keyframe_disp > 0 or args.submap_frames > 0):
        ap.error("--checkpoint is only supported in the plain incremental "
                 "mode: --keyframe-disp and --submap-frames runs take no "
                 "snapshots (their state spans multiple sub-reconstructions)")

    import numpy as np

    from photogrammetry_tpu.io.ply import write_ply
    from photogrammetry_tpu.sfm.frontend import FrontendConfig
    from photogrammetry_tpu.sfm.incremental import SfmConfig, run_incremental_sfm
    from photogrammetry_tpu.utils.profiling import StageTimer, append_stats

    timer = StageTimer()
    gt_centers = None
    if args.frames is None:
        from photogrammetry_tpu.synth.star_scene import (
            StarSceneConfig, generate_sequence,
        )
        scene = generate_sequence(StarSceneConfig(
            num_frames=args.synthetic_frames, supersample=4))
        frames = scene["frames"]
        k = scene["k"]
        gt_centers = scene["centers"]
    else:
        import glob
        import os

        from photogrammetry_tpu.cli.common import load_gray

        paths = sorted(glob.glob(os.path.join(args.frames, "*")))
        if args.frame_stride > 1:
            paths = paths[::args.frame_stride]
        if len(paths) < 2:
            ap.error(f"need >= 2 frames in {args.frames} "
                     f"(after stride {args.frame_stride})")
        frames = np.stack([load_gray(p) for p in paths])
        h, w = frames.shape[1:3]
        if args.distortion_coeffs is not None and \
                any(args.distortion_coeffs):
            import jax.numpy as jnp

            from photogrammetry_tpu.ops.dewarp import (
                make_distortion_applier,
            )
            from photogrammetry_tpu.store.cache import DistortionMapCache

            with timer.stage("dewarp"):
                dmap = jnp.asarray(DistortionMapCache(args.dewarp_cache)
                                   .get_or_generate(h, w,
                                                    args.distortion_coeffs))
                apply = make_distortion_applier(dmap, (h, w))
                frames = np.stack([
                    np.asarray(apply(jnp.asarray(f))) for f in frames])
        fx = args.fx if args.fx is not None else 1.2 * w
        if fx <= 0:
            ap.error(f"--fx must be positive, got {fx}")
        cx = args.cx if args.cx is not None else w / 2
        cy = args.cy if args.cy is not None else h / 2
        k = np.array([[fx, 0, cx], [0, fx, cy], [0, 0, 1]], np.float32)

    mesh = None
    if args.mesh > 0:
        import jax

        from photogrammetry_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < args.mesh:
            ap.error(f"--mesh {args.mesh} needs {args.mesh} devices; "
                     f"only {len(jax.devices())} visible")
        mesh = make_mesh(shape=(args.mesh,), axis_names=("tracks",),
                         devices=jax.devices()[:args.mesh])
    octaves = max(1, args.pyramid_octaves)
    cfg = SfmConfig(frontend=FrontendConfig(
        detection_threshold=args.detection_threshold, max_keypoints=512,
        reduction="nms", suppression_radius=4.0, hamming_threshold=80,
        oriented_brief=bool(args.oriented_brief)),
        mesh=mesh,
        pyramid_octaves=octaves,
        precompute_matching=bool(args.precompute_matching),
        # keep headroom for the octave-merged keypoint sets
        track_capacity=1024 * octaves,
        # per-frame diagnostic counters cost device->host reads (each one
        # permanently degrades dispatch on the tunnel runtime — tpu_notes
        # §3); the CLI report only uses end-of-run aggregates, and
        # diagnostics-off additionally enables the fused steady-step path
        collect_diagnostics=bool(args.diagnostics))
    with timer.stage("sfm"):
        if args.keyframe_disp > 0:
            from photogrammetry_tpu.sfm.keyframes import run_keyframed_sfm

            rs_kf, ts_kf, kf_idx, res, kf_info = run_keyframed_sfm(
                frames, k, cfg, min_disp_px=args.keyframe_disp,
                restarts=max(1, args.restarts))
            # full per-frame trajectory replaces the keyframe-only one
            res.rs, res.ts = rs_kf, ts_kf
            res.keyframes = kf_idx
        elif args.submap_frames > 0:
            from photogrammetry_tpu.sfm.submaps import run_submap_sfm

            # with loop closure on, defer the cross-seam global BA until
            # AFTER the loop-closed pose graph (BA is the final polish;
            # running it first would be smoothed away again)
            res = run_submap_sfm(
                frames, k, cfg,
                submap_frames=args.submap_frames,
                overlap=args.submap_overlap,
                restarts=max(1, args.restarts),
                global_refine_rounds=(0 if args.loop_closure
                                      else args.submap_refine))
        elif args.restarts > 1:
            from photogrammetry_tpu.sfm.incremental import (
                run_incremental_sfm_robust,
            )

            # checkpointing is per-run state; restarts select afresh
            res = run_incremental_sfm_robust(frames, k, cfg,
                                             restarts=args.restarts)
        else:
            res = run_incremental_sfm(frames, k, cfg,
                                      checkpoint_path=args.checkpoint,
                                      resume=not args.no_resume)

    rs_out, ts_out = res.rs, res.ts
    centers_out = res.camera_centers
    loop_report = None
    if args.loop_closure:
        import jax
        import jax.numpy as jnp

        from photogrammetry_tpu.sfm.frontend import (
            frame_features, make_pairs, precompute_frontend,
        )
        from photogrammetry_tpu.sfm.loop_closure import close_loops

        min_gap = (args.loop_min_gap if args.loop_min_gap is not None
                   else max(5, len(frames) // 4))
        with timer.stage("loop_closure"):
            fpairs = make_pairs(cfg.frontend)
            stacked = precompute_frontend(
                jnp.asarray(np.asarray(frames), jnp.float32), fpairs,
                cfg.frontend, chunk=cfg.frontend_chunk)
            feats = [frame_features(stacked, t)
                     for t in range(len(frames))]
            rs_lc, ts_lc, lc_info = close_loops(
                feats, jnp.asarray(rs_out, jnp.float32),
                jnp.asarray(ts_out, jnp.float32), jnp.asarray(k),
                cfg.frontend, key=jax.random.PRNGKey(7),
                min_gap=min_gap,
                min_matches=args.loop_min_matches,
                mode=args.loop_mode,
                max_candidates=args.loop_max_edges)
            rs_out = np.asarray(rs_lc)
            ts_out = np.asarray(ts_lc)
            centers_out = -np.einsum("fji,fj->fi", rs_out, ts_out)
            loop_report = {
                "loop_edges": [list(p) for p in lc_info["loop_edges"]],
                "rejected_edges": len(lc_info.get("rejected_edges", [])),
            }
            # Keep the exported cloud consistent with the corrected
            # trajectory: re-triangulate landmarks under the pose-graph
            # poses (the stored points belong to the pre-correction
            # gauge).  Submap results carry per-window tables instead of
            # one global table; their cloud stays pre-correction.
            if hasattr(res, "table"):
                from photogrammetry_tpu.sfm.triangulate import (
                    triangulate_nview,
                )

                # keyframe mode: the table rows are the keyframe subset
                kf_rows = getattr(res, "keyframes", None)
                rows = (kf_rows if kf_rows is not None
                        else list(range(len(rs_out))))
                if len(rows) == res.table.obs.shape[0]:
                    ridx = jnp.asarray(rows)
                    pts_lc, depths_lc = triangulate_nview(
                        res.table.obs, res.table.obs_mask,
                        rs_lc[ridx], ts_lc[ridx],
                        jnp.asarray(k, jnp.float32))
                    # tracks whose retriangulation failed under the
                    # corrected poses (behind-camera / out-of-depth in an
                    # observing view) are dropped from the map, not kept
                    # with stale points (same depth gate as
                    # _triangulate_tracks_nview)
                    ok_lc = jnp.all(
                        jnp.where(res.table.obs_mask,
                                  (depths_lc > 1e-3) & (depths_lc < 1e3),
                                  True), axis=0)
                    has_lc = res.table.has_point & ok_lc
                    res.table = res.table._replace(
                        points=jnp.where(has_lc[:, None],
                                         pts_lc, res.table.points),
                        has_point=has_lc)
                    # poses consistent with the corrected landmarks (the
                    # quality report below reprojects them)
                    res.rs, res.ts = rs_out, ts_out
            # submap mode: cross-seam global BA as the FINAL polish, on
            # the loop-closed trajectory (merged overlap tracks give BA
            # the seam-crossing residuals the pose graph never sees, and
            # loop-edge track fusion carries the revisit constraints so
            # BA cannot re-drift the closed loops)
            if hasattr(res, "submaps") and args.submap_refine > 0:
                from photogrammetry_tpu.sfm.epipolar import (
                    ransac_fundamental,
                )
                from photogrammetry_tpu.sfm.frontend import match_pair
                from photogrammetry_tpu.sfm.submaps import (
                    refine_submaps_global,
                )

                loop_links = []
                lkey = jax.random.PRNGKey(11)
                for fa, fb in loop_report["loop_edges"] \
                        if loop_report else []:
                    m = match_pair(feats[fa], feats[fb], cfg.frontend)
                    lkey, sub = jax.random.split(lkey)
                    gate = ransac_fundamental(
                        sub, m.xy1, m.xy2, m.mask,
                        threshold=cfg.ransac_threshold,
                        num_samples=cfg.ransac_samples // 2)
                    good = np.asarray(m.mask & gate.inliers)
                    xy1 = np.asarray(m.xy1)
                    xy2 = np.asarray(m.xy2)
                    for i in np.nonzero(good)[0]:
                        loop_links.append((fa, tuple(xy1[i]),
                                           fb, tuple(xy2[i])))
                rs_out, ts_out, pts_ref = refine_submaps_global(
                    rs_out, ts_out, res.submaps, res.spans, k,
                    len(frames), rounds=args.submap_refine,
                    iterations=cfg.final_ba_iterations or 20,
                    prune_px=cfg.prune_px, min_depth=cfg.min_depth,
                    max_depth=cfg.max_depth, loop_links=loop_links,
                    prior_weight=args.submap_prior_weight)
                centers_out = -np.einsum("fji,fj->fi", rs_out, ts_out)
                res.rs, res.ts = rs_out, ts_out
                res.points = pts_ref

    write_ply(args.cloud, res.points)
    traj = {"centers": centers_out.tolist(),
            "rotations": rs_out.tolist(),
            "translations": ts_out.tolist()}
    costs = getattr(res, "costs", None)
    report = {"frames": len(frames), "landmarks": len(res.points),
              "final_cost": costs[-1] if costs else None,
              "timings": timer.summary()}
    # Ground-truth-free reconstruction quality (support + median
    # reprojection error px) — the same metric restart selection uses.
    if hasattr(res, "table"):
        from types import SimpleNamespace

        from photogrammetry_tpu.sfm.incremental import reconstruction_quality

        kf_rows = getattr(res, "keyframes", None)
        rows = (kf_rows if kf_rows is not None
                else list(range(len(res.rs))))
        if len(rows) == res.table.obs.shape[0]:
            view = SimpleNamespace(rs=np.asarray(res.rs)[rows],
                                   ts=np.asarray(res.ts)[rows],
                                   table=res.table)
            support, med = reconstruction_quality(view, k)
            report["quality"] = {"support": support,
                                 "median_reproj_px": round(med, 3)}
    if hasattr(res, "spans"):
        report["submaps"] = {"spans": [list(sp) for sp in res.spans],
                             "total_tracks": res.total_tracks,
                             "dropped": res.dropped}
    if hasattr(res, "keyframes"):
        report["keyframes"] = list(res.keyframes)
    if loop_report is not None:
        report["loop_closure"] = loop_report
    if gt_centers is not None:
        import jax.numpy as jnp

        from photogrammetry_tpu.sfm.metrics import absolute_trajectory_error

        report["ate"] = float(absolute_trajectory_error(
            jnp.asarray(centers_out), jnp.asarray(gt_centers)))
    with open(args.trajectory, "w") as fh:
        json.dump(traj, fh)
    print(json.dumps(report))
    print(f"wrote {args.cloud}, {args.trajectory}")
    if args.stats:
        append_stats(args.stats, report)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
