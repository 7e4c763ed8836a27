from photogrammetry_tpu.sfm.epipolar import (
    normalization_transform, eight_point_fundamental, ransac_fundamental,
    essential_from_fundamental, decompose_essential, epipolar_residuals,
)
from photogrammetry_tpu.sfm.triangulate import (
    triangulate_dlt, cheirality_counts, select_pose,
)
from photogrammetry_tpu.sfm.two_view import two_view_pipeline, TwoViewResult
from photogrammetry_tpu.sfm.metrics import align_umeyama, absolute_trajectory_error
