"""Content store, caches, config, profiling, CLI smoke tests."""
import json
import os

import numpy as np
import pytest

from photogrammetry_tpu.config import (
    DeWarpConfig, PipelineConfig, RansacConfig, load_config,
)
from photogrammetry_tpu.store.cache import DistortionMapCache, KeypointCache
from photogrammetry_tpu.store.content_store import ContentStore, Variant
from photogrammetry_tpu.utils.profiling import StageTimer, append_stats

STAR = "/root/reference/data/feature_matching_test/15pt_star.png"


# ------------------------------------------------------------ content store
def test_content_store_roundtrip():
    store = ContentStore(clock=lambda: 123.0)
    rid = store.create_record()
    store.store(rid, Variant.GRAYSCALE, np.ones((2, 2)))
    assert store.has(rid, Variant.GRAYSCALE)
    assert not store.has(rid, Variant.RGB)
    np.testing.assert_array_equal(store.fetch(rid, Variant.GRAYSCALE),
                                  np.ones((2, 2)))
    assert store.created_at(rid) == 123.0
    assert len(store) == 1


def test_content_store_one_variant_invariant():
    store = ContentStore()
    rid = store.create_record()
    store.store(rid, Variant.KEYPOINTS, [1, 2])
    with pytest.raises(ValueError):
        store.store(rid, Variant.KEYPOINTS, [3])
    with pytest.raises(KeyError):
        store.fetch(rid, Variant.POSE)
    with pytest.raises(KeyError):
        store.fetch("nope", Variant.POSE)


# ------------------------------------------------------------------ caches
def test_distortion_map_cache(tmp_path):
    cache = DistortionMapCache(str(tmp_path))
    m1 = cache.get_or_generate(16, 12, [3e-4, 1e-7, 0, 0, 0])
    assert m1.shape == (16, 12, 2)
    # hit returns identical data without regeneration
    m2 = cache.get_or_generate(16, 12, [3e-4, 1e-7, 0, 0, 0])
    np.testing.assert_array_equal(m1, m2)
    assert len(os.listdir(tmp_path)) == 1


def test_keypoint_cache_keys_on_config(tmp_path):
    cache = KeypointCache(str(tmp_path))
    assert cache.get(STAR, threshold=50) is None
    cache.put(STAR, {"coords": np.array([[1, 2]])}, threshold=50)
    hit = cache.get(STAR, threshold=50)
    np.testing.assert_array_equal(hit["coords"], [[1, 2]])
    assert cache.get(STAR, threshold=60) is None  # different config


# ------------------------------------------------------------------ config
def test_config_defaults_valid():
    PipelineConfig().validate()


def test_config_validation():
    with pytest.raises(ValueError):
        DeWarpConfig(coefficients=(1.0, 2.0)).validate()
    with pytest.raises(ValueError):
        RansacConfig(sample_size=4).validate()


def test_config_file_and_env_overlay(tmp_path):
    base = tmp_path / "settings.json"
    base.write_text(json.dumps(
        {"ransac": {"num_samples": 500},
         "dewarp": {"coefficients": [1e-4, 0, 0, 0, 0]}}))
    overlay = tmp_path / "settings.prod.json"
    overlay.write_text(json.dumps({"ransac": {"threshold": 2.5}}))

    cfg = load_config(str(base))
    assert cfg.ransac.num_samples == 500
    assert cfg.dewarp.coefficients == (1e-4, 0, 0, 0, 0)

    cfg2 = load_config(str(base), environment="prod")
    assert cfg2.ransac.threshold == 2.5
    assert cfg2.ransac.num_samples == 500  # base still applies


def test_config_unknown_key_rejected(tmp_path):
    f = tmp_path / "bad.json"
    f.write_text(json.dumps({"nonsense": 1}))
    with pytest.raises(ValueError):
        load_config(str(f))


# --------------------------------------------------------------- profiling
def test_stage_timer_and_stats(tmp_path):
    timer = StageTimer()
    with timer.stage("a"):
        pass
    with timer.stage("a"):
        pass
    s = timer.summary()
    assert s["a"]["calls"] == 2

    log = tmp_path / "stats.json"
    append_stats(str(log), {"x": 1})
    append_stats(str(log), {"x": 2})
    entries = json.loads(log.read_text())
    assert [e["x"] for e in entries] == [1, 2]
    assert "hostname" in entries[0]


# -------------------------------------------------------------- CLI smoke
def test_detect_cli(tmp_path):
    from photogrammetry_tpu.cli.detect_features import main

    out = tmp_path / "det.png"
    assert main([STAR, "-o", str(out)]) == 0
    assert out.exists()


def test_dewarp_cli(tmp_path):
    from photogrammetry_tpu.cli.de_warp import main

    out = tmp_path / "dw.png"
    img = "/root/reference/data/feature_detection_test/15pt_star.png"
    assert main([img, "t", "-o", str(out),
                 "--cache-dir", str(tmp_path / "maps"),
                 "--stats", str(tmp_path / "stats.json")]) == 0
    assert out.exists()
    assert (tmp_path / "stats.json").exists()


def test_image_editing_cli(tmp_path):
    from photogrammetry_tpu.cli.image_editing import main
    from photogrammetry_tpu.io.image import read_image

    out = tmp_path / "shifted.png"
    assert main([STAR, "-o", str(out), "--shift-x", "10"]) == 0
    src = read_image(STAR)
    dst = read_image(str(out))
    np.testing.assert_array_equal(dst[:, 10:], src[:, :-10])
    assert (dst[:, :10] == 0).all()


def test_scatter_plot():
    from photogrammetry_tpu.io.draw import scatter_plot

    img = scatter_plot([0.0, 1.0, 2.0], [0.0, 1.0, 0.5], size=(120, 160))
    assert img.shape == (120, 160, 3) and img.dtype == np.uint8
    # points drawn in the plot color, axes in black, background white
    assert (img == (30, 90, 200)).all(axis=-1).sum() >= 3
    assert (img == 0).all(axis=-1).any()
    # empty / non-finite input degrades to an empty frame, no crash
    empty = scatter_plot([], [], size=(60, 80))
    assert not (empty == (30, 90, 200)).all(axis=-1).any()
    scatter_plot([np.nan], [1.0], size=(60, 80))


@pytest.mark.slow
def test_estimate_pose_cli(tmp_path):
    from photogrammetry_tpu.cli.estimate_pose import main
    from photogrammetry_tpu.io.image import write_image
    from photogrammetry_tpu.synth.star_scene import (
        StarSceneConfig, generate_sequence,
    )

    # adjacent frames of a 4-frame pan: small-baseline pair, many matches
    scene = generate_sequence(StarSceneConfig(num_frames=4, supersample=2))
    p1 = tmp_path / "f1.png"
    p2 = tmp_path / "f2.png"
    write_image(str(p1), scene["frames"][1])
    write_image(str(p2), scene["frames"][2])
    cloud = tmp_path / "cloud.ply"
    assert main([str(p1), str(p2), "--detection-threshold", "20",
                 "--match-threshold", "80", "--num-samples", "256",
                 "--fx", str(float(scene["k"][0, 0])),
                 "--cloud", str(cloud),
                 "--plots", str(tmp_path / "pose"),
                 "--stats", str(tmp_path / "stats.json")]) == 0
    assert cloud.exists()
    assert (tmp_path / "pose_xz.png").exists()
    assert (tmp_path / "pose_xy.png").exists()
    from photogrammetry_tpu.io.ply import read_ply
    pts = read_ply(str(cloud))
    assert len(pts) > 10 and (pts[:, 2] > 0).all()
