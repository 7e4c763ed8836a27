"""CLI test: run_sfm on a frame directory with dewarp in the live path.

The reference's production order is read -> dewarp -> gray -> detect
(TestService.cs:137-152); --distortion-coeffs puts the dewarp stage in
front of the flagship SfM driver the same way.
"""
import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_run_sfm_with_dewarp(tmp_path):
    import cv2

    from photogrammetry_tpu.cli.run_sfm import main
    from photogrammetry_tpu.synth.star_scene import (
        StarSceneConfig, generate_sequence,
    )

    cfg = StarSceneConfig(num_frames=5, image_size=(240, 320), focal=260.0,
                          supersample=2)
    scene = generate_sequence(cfg)
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i, f in enumerate(scene["frames"]):
        cv2.imwrite(str(frames_dir / f"{i:03d}.png"), f)

    traj = tmp_path / "traj.json"
    cloud = tmp_path / "cloud.ply"
    # Small but nonzero coefficients: the dewarp stage must actually
    # resample (and the map must land in the cache dir) while keeping the
    # geometry close enough to the pinhole ground truth for SfM to run.
    rc = main([str(frames_dir),
               "--fx", "260", "--cx", "160", "--cy", "120",
               "--detection-threshold", "20",
               "--distortion-coeffs", "1e-5", "0", "0", "0", "0",
               "--dewarp-cache", str(tmp_path / "maps"),
               "--trajectory", str(traj), "--cloud", str(cloud)])
    assert rc in (0, None)
    assert cloud.is_file()
    data = json.loads(traj.read_text())
    assert len(data["centers"]) == 5
    assert os.listdir(tmp_path / "maps")  # distortion map cached
    # trajectory moved: the pan spans ~2.4 units of camera travel
    c = np.asarray(data["centers"])
    assert np.linalg.norm(c[-1] - c[0]) > 0.1


@pytest.mark.slow
def test_run_sfm_submap_mode(tmp_path, capsys):
    import cv2

    from photogrammetry_tpu.cli.run_sfm import main
    from photogrammetry_tpu.synth.star_scene import (
        StarSceneConfig, generate_orbit_sequence,
    )

    cfg = StarSceneConfig(num_frames=12, image_size=(240, 320), focal=260.0,
                          supersample=2)
    scene = generate_orbit_sequence(cfg, total_angle=0.25)
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i, f in enumerate(scene["frames"]):
        cv2.imwrite(str(frames_dir / f"{i:03d}.png"), f)

    traj = tmp_path / "traj.json"
    cloud = tmp_path / "cloud.ply"
    rc = main([str(frames_dir),
               "--fx", "260", "--cx", "160", "--cy", "120",
               "--detection-threshold", "20",
               "--submap-frames", "8", "--submap-overlap", "3",
               "--trajectory", str(traj), "--cloud", str(cloud)])
    assert rc in (0, None)
    out = capsys.readouterr().out
    report = json.loads([l for l in out.splitlines()
                         if l.startswith("{")][0])
    assert "submaps" in report
    assert report["submaps"]["dropped"] == 0
    assert len(report["submaps"]["spans"]) >= 2
    assert cloud.is_file()
    data = json.loads(traj.read_text())
    assert len(data["centers"]) == 12


@pytest.mark.slow
def test_run_sfm_keyframe_mode(tmp_path, capsys):
    import cv2

    from photogrammetry_tpu.cli.run_sfm import main
    from photogrammetry_tpu.synth.star_scene import (
        StarSceneConfig, generate_sequence,
    )

    cfg = StarSceneConfig(num_frames=12, image_size=(240, 320), focal=260.0,
                          supersample=2)
    scene = generate_sequence(cfg)
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i, f in enumerate(scene["frames"]):
        cv2.imwrite(str(frames_dir / f"{i:03d}.png"), f)

    traj = tmp_path / "traj.json"
    rc = main([str(frames_dir),
               "--fx", "260", "--cx", "160", "--cy", "120",
               "--detection-threshold", "20",
               "--keyframe-disp", "20",
               "--trajectory", str(traj),
               "--cloud", str(tmp_path / "cloud.ply")])
    assert rc in (0, None)
    out = capsys.readouterr().out
    report = json.loads([l for l in out.splitlines()
                         if l.startswith("{")][0])
    assert "keyframes" in report
    assert 2 < len(report["keyframes"]) < 12
    data = json.loads(traj.read_text())
    assert len(data["centers"]) == 12  # every frame localized
