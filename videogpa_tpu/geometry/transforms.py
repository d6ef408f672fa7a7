"""SE(3) transforms and depth unprojection, fully batched and jit-safe.

Behavioral parity targets:
- closed-form SE3 inverse          (reference ``vggt/utils/geometry.py:120+``)
- affine_inverse                   (reference ``depth_anything_3/utils/geometry.py:55-59``)
- depth -> camera / world points   (reference ``vggt/utils/geometry.py:48-120``)
- unproject_depth                  (reference ``depth_anything_3/utils/geometry.py:434-497``)

All cameras are OpenCV convention; extrinsics are world->camera [R|t].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def closed_form_inverse_se3(se3: jax.Array) -> jax.Array:
    """Invert (..., 3, 4) or (..., 4, 4) world->camera transforms in closed form.

    Returns a (..., 4, 4) camera->world transform: [R^T | -R^T t].
    """
    R = se3[..., :3, :3]
    t = se3[..., :3, 3:4]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -Rt @ t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=se3.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def affine_inverse(A: jax.Array) -> jax.Array:
    """Invert (..., 4, 4) rigid transforms, preserving the bottom row as-is."""
    R = A[..., :3, :3]
    T = A[..., :3, 3:]
    P = A[..., 3:, :]
    Rt = jnp.swapaxes(R, -1, -2)
    return jnp.concatenate([jnp.concatenate([Rt, -Rt @ T], axis=-1), P], axis=-2)


def _pixel_grid(H: int, W: int, dtype) -> jax.Array:
    """(H, W, 2) grid of (u, v) pixel coordinates."""
    u = jax.lax.broadcasted_iota(dtype, (H, W), 1)
    v = jax.lax.broadcasted_iota(dtype, (H, W), 0)
    return jnp.stack([u, v], axis=-1)


def depth_to_cam_points(depth: jax.Array, intrinsics: jax.Array) -> jax.Array:
    """Depth map (..., H, W) + intrinsics (..., 3, 3) -> camera points (..., H, W, 3)."""
    H, W = depth.shape[-2], depth.shape[-1]
    grid = _pixel_grid(H, W, depth.dtype)  # (H, W, 2)
    fu = intrinsics[..., 0, 0][..., None, None]
    fv = intrinsics[..., 1, 1][..., None, None]
    cu = intrinsics[..., 0, 2][..., None, None]
    cv = intrinsics[..., 1, 2][..., None, None]
    x = (grid[..., 0] - cu) * depth / fu
    y = (grid[..., 1] - cv) * depth / fv
    return jnp.stack([x, y, depth], axis=-1)


def depth_to_world_points(
    depth: jax.Array, extrinsics: jax.Array, intrinsics: jax.Array
) -> jax.Array:
    """Depth (..., H, W) + world->cam extrinsics (..., 3, 4) + K (..., 3, 3)
    -> world points (..., H, W, 3)."""
    cam_pts = depth_to_cam_points(depth, intrinsics)
    c2w = closed_form_inverse_se3(extrinsics)
    t = c2w[..., None, None, :3, 3]  # (..., 1, 1, 3)
    return jnp.einsum("...hwj,...ij->...hwi", cam_pts, c2w[..., :3, :3],
                      preferred_element_type=jnp.float32) + t


def unproject_depth(
    depth: jax.Array,
    intrinsics: jax.Array,
    c2w: Optional[jax.Array] = None,
) -> jax.Array:
    """DA3-convention unprojection.

    Args:
        depth: (b, v, h, w, 1)
        intrinsics: (b, v, 3, 3) in pixel units
        c2w: (b, v, 4, 4) camera->world; identity if None.

    Returns:
        (b, v, h, w, 3) world-space points.
    """
    b, v, h, w, _ = depth.shape
    if c2w is None:
        c2w = jnp.broadcast_to(jnp.eye(4, dtype=depth.dtype), (b, v, 4, 4))

    grid = _pixel_grid(h, w, depth.dtype)  # (h, w, 2)
    ones = jnp.ones((h, w, 1), dtype=depth.dtype)
    pix = jnp.concatenate([grid, ones], axis=-1)  # (h, w, 3) homogeneous pixels

    K_inv = jnp.linalg.inv(intrinsics)  # (b, v, 3, 3)
    rays = jnp.einsum("bvij,hwj->bvhwi", K_inv, pix)
    cam_pts = rays * depth  # (b, v, h, w, 3)

    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    return jnp.einsum("bvij,bvhwj->bvhwi", R, cam_pts) + t[:, :, None, None, :]
