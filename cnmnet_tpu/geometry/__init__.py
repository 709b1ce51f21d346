from cnmnet_tpu.geometry.camera import (
    Camera,
    camera_from_array,
    camera_to_array,
    relative_pose,
    scale_intrinsics,
    pixel_grid,
    plane_sweep_terms,
    invert_intrinsics,
    invert_se3,
)
from cnmnet_tpu.geometry.warp import (
    bilinear_sample,
    pixel2cam,
    cam2pixel,
    inverse_warp,
)

__all__ = [
    "Camera",
    "camera_from_array",
    "camera_to_array",
    "relative_pose",
    "scale_intrinsics",
    "pixel_grid",
    "plane_sweep_terms",
    "invert_intrinsics",
    "invert_se3",
    "bilinear_sample",
    "pixel2cam",
    "cam2pixel",
    "inverse_warp",
]
