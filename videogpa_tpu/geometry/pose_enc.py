"""Camera pose encoding: extrinsics+intrinsics <-> 9-D "absT_quaR_FoV" vector.

Layout (reference ``vggt/utils/pose_enc.py:11-124``):
  enc[..., 0:3] = camera-from-world translation T
  enc[..., 3:7] = rotation quaternion (scalar-last)
  enc[..., 7:9] = (fov_h, fov_w) in radians
Cameras use the OpenCV convention (x-right, y-down, z-forward); extrinsics are
[R|t] world->camera with shape (..., 3, 4); intrinsics are pixel-unit 3x3 with
the principal point assumed at the image center for the decode direction.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from videogpa_tpu.geometry.rotation import mat_to_quat, quat_to_mat


def extri_intri_to_pose_encoding(
    extrinsics: jax.Array,
    intrinsics: jax.Array,
    image_size_hw: Tuple[int, int],
) -> jax.Array:
    """(..., 3, 4) extrinsics + (..., 3, 3) intrinsics -> (..., 9) encoding."""
    R = extrinsics[..., :3, :3]
    T = extrinsics[..., :3, 3]
    quat = mat_to_quat(R)
    H, W = image_size_hw
    fov_h = 2 * jnp.arctan((H / 2) / intrinsics[..., 1, 1])
    fov_w = 2 * jnp.arctan((W / 2) / intrinsics[..., 0, 0])
    return jnp.concatenate(
        [T, quat, fov_h[..., None], fov_w[..., None]], axis=-1
    ).astype(jnp.float32)


def pose_encoding_to_extri_intri(
    pose_encoding: jax.Array,
    image_size_hw: Tuple[int, int],
    build_intrinsics: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """(..., 9) encoding -> ((..., 3, 4) extrinsics, (..., 3, 3) intrinsics)."""
    T = pose_encoding[..., :3]
    quat = pose_encoding[..., 3:7]
    fov_h = pose_encoding[..., 7]
    fov_w = pose_encoding[..., 8]

    R = quat_to_mat(quat)
    extrinsics = jnp.concatenate([R, T[..., None]], axis=-1)

    intrinsics = None
    if build_intrinsics:
        H, W = image_size_hw
        fy = (H / 2.0) / jnp.tan(fov_h / 2.0)
        fx = (W / 2.0) / jnp.tan(fov_w / 2.0)
        zeros = jnp.zeros_like(fx)
        ones = jnp.ones_like(fx)
        row0 = jnp.stack([fx, zeros, ones * (W / 2)], axis=-1)
        row1 = jnp.stack([zeros, fy, ones * (H / 2)], axis=-1)
        row2 = jnp.stack([zeros, zeros, ones], axis=-1)
        intrinsics = jnp.stack([row0, row1, row2], axis=-2)

    return extrinsics, intrinsics
