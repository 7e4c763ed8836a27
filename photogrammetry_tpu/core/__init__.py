from photogrammetry_tpu.core.cubic import solve_cubic_real
from photogrammetry_tpu.core.lie import (
    so3_exp, so3_log, so3_hat, se3_exp, se3_log,
)
from photogrammetry_tpu.core.camera import (
    intrinsic_matrix, project_points, normalize_pixels, REFERENCE_K,
)
