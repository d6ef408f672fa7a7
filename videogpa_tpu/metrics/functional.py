"""Pure-JAX metric kernels (batched, jit-safe, differentiable where sensible).

Parity targets:
- MSE/PSNR range handling: reference ``metrics/mse.py:31-99``
- SSIM (gaussian 11/1.5, official downsampling): piq.ssim as used at
  reference ``metrics/mse.py:110``
- motion score: reference ``metrics/consistency_score.py:8-40``
- MVCS warp: reference ``metrics/mvcs.py:59-115``
- Sampson epipolar distance + normalized 8-point fundamental: kornia as used
  at reference ``metrics/epipolar.py:188-216``
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from videogpa_tpu.ops.resize import grid_sample_bilinear, resize_bilinear


def to_unit_range(x: jax.Array) -> jax.Array:
    """Normalize frames to [0, 1]: [-1,1] -> [0,1]; [0,255] -> [0,1]."""
    lo = jnp.min(x)
    hi = jnp.max(x)
    from_neg1 = (x + 1.0) / 2.0
    from_255 = x / 255.0
    return jnp.where(lo < 0, from_neg1, jnp.where(hi > 1.0, from_255, x))


def to_sym_range(x: jax.Array) -> jax.Array:
    """Normalize frames to [-1, 1] (LPIPS convention)."""
    lo = jnp.min(x)
    hi = jnp.max(x)
    x01 = jnp.where(hi > 1.0, x / 255.0, x)
    return jnp.where(lo >= 0, x01 * 2.0 - 1.0, x)


def _match_size(gt: jax.Array, rep: jax.Array) -> jax.Array:
    """Resize rep (..., H, W) to gt's spatial size (bilinear, ac=False)."""
    if gt.shape[-2:] != rep.shape[-2:]:
        rep = resize_bilinear(rep, gt.shape[-2:], align_corners=False)
    return rep


@jax.jit
def mse(gt: jax.Array, rep: jax.Array) -> jax.Array:
    """Video MSE in [0,1] range. gt/rep: (T, C, H, W) any supported range."""
    gt = to_unit_range(gt.astype(jnp.float32))
    rep = to_unit_range(rep.astype(jnp.float32))
    rep = _match_size(gt, rep)
    return jnp.mean((gt - rep) ** 2)


@jax.jit
def psnr(gt: jax.Array, rep: jax.Array) -> jax.Array:
    m = mse(gt, rep)
    return jnp.where(m == 0, 100.0, 10.0 * jnp.log10(1.0 / jnp.maximum(m, 1e-12)))


def _gaussian_kernel1d(size: int, sigma: float) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / jnp.sum(g)


@partial(jax.jit, static_argnames=("kernel_size", "downsample"))
def ssim(
    gt: jax.Array,
    rep: jax.Array,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    data_range: float = 1.0,
    downsample: bool = True,
) -> jax.Array:
    """SSIM over (T, C, H, W) in [0,1], mean over everything.

    Follows the official implementation (as piq does): optional average-pool
    downsampling by f = max(1, round(min(H, W) / 256)), gaussian window,
    valid-mode windowed statistics.
    """
    gt = to_unit_range(gt.astype(jnp.float32))
    rep = to_unit_range(rep.astype(jnp.float32))
    rep = _match_size(gt, rep)

    f = max(1, round(min(gt.shape[-2], gt.shape[-1]) / 256)) if downsample else 1
    if f > 1:
        def pool(x):
            T, C, H, W = x.shape
            x = x[:, :, : H // f * f, : W // f * f]
            x = x.reshape(T, C, H // f, f, W // f, f)
            return x.mean(axis=(3, 5))

        gt, rep = pool(gt), pool(rep)

    g = _gaussian_kernel1d(kernel_size, sigma)

    def blur(x):
        # separable valid-mode gaussian as depthwise convs (MXU/VPU friendly)
        T, C, H, W = x.shape
        h = x.reshape(T * C, 1, H, W)
        kh = g.reshape(1, 1, kernel_size, 1)
        kw = g.reshape(1, 1, 1, kernel_size)
        h = jax.lax.conv_general_dilated(
            h, kh, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))
        h = jax.lax.conv_general_dilated(
            h, kw, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return h.reshape(T, C, *h.shape[-2:])

    mu_x, mu_y = blur(gt), blur(rep)
    sigma_x = blur(gt * gt) - mu_x ** 2
    sigma_y = blur(rep * rep) - mu_y ** 2
    sigma_xy = blur(gt * rep) - mu_x * mu_y

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    ssim_map = ((2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)) / (
        (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    )
    return jnp.mean(ssim_map)


@jax.jit
def motion_score(extrinsics: jax.Array) -> jax.Array:
    """Camera-motion magnitude from (T, 3+, 4) or (T, 4, 4) extrinsics.

    mean ||t_{i+1} - t_i|| + 0.1 * mean geodesic rotation angle; NaN -> 0.
    """
    E = extrinsics.astype(jnp.float32)
    Rs = E[:, :3, :3]
    ts = E[:, :3, 3]
    trans = jnp.linalg.norm(ts[1:] - ts[:-1], axis=1)
    dR = jnp.einsum("tij,tkj->tik", Rs[1:], Rs[:-1])
    traces = jnp.trace(dR, axis1=-2, axis2=-1)
    angles = jnp.arccos(jnp.clip((traces - 1) / 2, -1.0, 1.0))
    score = jnp.mean(trans) + 0.1 * jnp.mean(angles)
    return jnp.where(jnp.isnan(score), 0.0, score)


@partial(jax.jit, static_argnames=())
def mvcs(
    depths: jax.Array, intrinsics: jax.Array, extrinsics: jax.Array
) -> jax.Array:
    """Multi-view depth-consistency score = exp(-mean pairwise warp error).

    Args:
        depths: (T, H, W); intrinsics: (T, 3, 3); extrinsics: (T, 4, 4) W2C.
    """
    depths = depths.astype(jnp.float32)
    T, H, W = depths.shape

    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    coords = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=0).reshape(3, -1)

    inv_K = jnp.linalg.inv(intrinsics)  # (T, 3, 3)
    inv_E = jnp.linalg.inv(extrinsics)  # (T, 4, 4)

    def pair_err(i):
        d_i = depths[i].reshape(1, -1)
        p3d_i = (inv_K[i] @ coords) * d_i  # (3, HW) camera-i points
        rel = extrinsics[i + 1] @ inv_E[i]
        p3d_j = rel[:3, :3] @ p3d_i + rel[:3, 3:4]
        proj = intrinsics[i + 1] @ p3d_j
        depth_proj = p3d_j[2].reshape(H, W)
        z = jnp.maximum(proj[2], 1e-8)
        u = (proj[0] / z).reshape(H, W)
        v = (proj[1] / z).reshape(H, W)
        sampled = grid_sample_bilinear(depths[i + 1], u, v, align_corners=True)
        mask = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (depth_proj > 0)
        cnt = jnp.sum(mask)
        err = jnp.sum(jnp.where(mask, (sampled - depth_proj) ** 2, 0.0)) / jnp.maximum(cnt, 1)
        return err, cnt > 0

    errs, valids = jax.vmap(pair_err)(jnp.arange(T - 1))
    n_valid = jnp.sum(valids)
    avg = jnp.sum(jnp.where(valids, errs, 0.0)) / jnp.maximum(n_valid, 1)
    # reference returns 0.0 (not exp(0)=1) when no pair has valid pixels
    return jnp.where(n_valid > 0, jnp.exp(-avg), 0.0)


# ---------------------------------------------------------------------------
# Epipolar geometry (8-point fundamental + Sampson distance)
# ---------------------------------------------------------------------------

def _normalize_points(pts: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Hartley normalization: centroid to origin, mean distance sqrt(2)."""
    mean = jnp.mean(pts, axis=0)
    d = jnp.linalg.norm(pts - mean, axis=1)
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.mean(d), 1e-8)
    T = jnp.array(
        [
            [scale, 0.0, -scale * mean[0]],
            [0.0, scale, -scale * mean[1]],
            [0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    normed = (pts - mean) * scale
    return normed, T


def find_fundamental(pts1: jax.Array, pts2: jax.Array) -> jax.Array:
    """Normalized 8-point least-squares fundamental matrix. pts: (N, 2)."""
    p1, T1 = _normalize_points(pts1.astype(jnp.float32))
    p2, T2 = _normalize_points(pts2.astype(jnp.float32))
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    F = vt[-1].reshape(3, 3)
    # rank-2 enforcement
    u, s, vt2 = jnp.linalg.svd(F)
    F = (u * s.at[2].set(0.0)[None]) @ vt2
    F = T2.T @ F @ T1
    return F / jnp.maximum(jnp.linalg.norm(F), 1e-12)


def sampson_distance(
    pts1: jax.Array, pts2: jax.Array, F: jax.Array, squared: bool = True
) -> jax.Array:
    """Sampson epipolar distance per correspondence. pts: (N, 2)."""
    ones = jnp.ones((pts1.shape[0], 1), pts1.dtype)
    x1 = jnp.concatenate([pts1, ones], axis=1)
    x2 = jnp.concatenate([pts2, ones], axis=1)
    Fx1 = x1 @ F.T  # (N, 3) = F @ x1
    Ftx2 = x2 @ F  # (N, 3) = F^T @ x2
    num = jnp.sum(x2 * Fx1, axis=1) ** 2
    den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    d2 = num / jnp.maximum(den, 1e-12)
    return d2 if squared else jnp.sqrt(d2 + 1e-8)
