from photogrammetry_tpu.synth.star_scene import (
    star_points_3d, pan_trajectory, project_scene, render_frame,
    StarSceneConfig, generate_sequence,
)
