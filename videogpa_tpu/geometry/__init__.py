"""Pure-JAX geometry math: rotations, pose encodings, projections.

All functions are jit-safe (static shapes, no Python data-dependent control
flow) and differentiable unless stated otherwise.
"""

from videogpa_tpu.geometry.rotation import (
    mat_to_quat,
    quat_to_mat,
    standardize_quaternion,
)
from videogpa_tpu.geometry.pose_enc import (
    extri_intri_to_pose_encoding,
    pose_encoding_to_extri_intri,
)
from videogpa_tpu.geometry.transforms import (
    affine_inverse,
    closed_form_inverse_se3,
    depth_to_cam_points,
    depth_to_world_points,
    unproject_depth,
)
from videogpa_tpu.geometry.projection import (
    project_points_zbuffer,
    batch_reproject,
)

__all__ = [
    "mat_to_quat",
    "quat_to_mat",
    "standardize_quaternion",
    "extri_intri_to_pose_encoding",
    "pose_encoding_to_extri_intri",
    "affine_inverse",
    "closed_form_inverse_se3",
    "depth_to_cam_points",
    "depth_to_world_points",
    "unproject_depth",
    "project_points_zbuffer",
    "batch_reproject",
]
