"""Pure jittable compute ops (NHWC, TPU-first)."""

from .cost_volume import correlation
from .geometry import (
    calculate_rigid_flow,
    disp2depth,
    essential_matrix,
    euler2mat,
    fundamental_from_pose,
    inverse_warp2,
    pixel2cam,
    pose_vec2mat,
    projection_matrices,
    quat2mat,
    skew_symmetric,
)
from .interp import image_pyramid, resize_area, resize_bilinear, upsample2x_bilinear
from .ssim import ssim
from .warp import grid_sample, normalize_coords, pixel_grid, warp_flow

__all__ = [
    "correlation",
    "calculate_rigid_flow",
    "disp2depth",
    "essential_matrix",
    "euler2mat",
    "fundamental_from_pose",
    "inverse_warp2",
    "pixel2cam",
    "pose_vec2mat",
    "projection_matrices",
    "quat2mat",
    "skew_symmetric",
    "image_pyramid",
    "resize_area",
    "resize_bilinear",
    "upsample2x_bilinear",
    "ssim",
    "grid_sample",
    "normalize_coords",
    "pixel_grid",
    "warp_flow",
]
