"""TPU-native 3D Gaussian splatting renderer + camera trajectory helpers.

Parity target: reference ``depth_anything_3/model/utils/gs_renderer.py`` —
``render_3dgs`` (:44, which delegates to the CUDA gsplat ``rasterization``)
and ``run_renderer_in_chunk_w_trj_mode`` (:156, trajectory modes).

The CUDA rasterizer builds dynamic per-tile gaussian lists; XLA needs static
shapes, so this re-design rasterizes with a fixed per-tile budget:

1. project all gaussians once (EWA: camera transform, perspective Jacobian,
   2D covariance + 0.3px blur, 3-sigma radius),
2. for each 16x16 tile take the nearest ``max_per_tile`` gaussians whose
   bounding box overlaps the tile (``lax.top_k`` over depth — deterministic,
   no atomics, unlike the GPU's append lists),
3. alpha-composite front-to-back with a closed-form exclusive-cumsum
   transmittance instead of a sequential blend loop — the whole render is
   one ``lax.map`` over tiles inside a single jit.

Everything is differentiable (plain jnp ops), so the renderer can also
serve reconstruction losses, which the gsplat path cannot do on TPU at all.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videogpa_tpu.geometry import affine_inverse
from videogpa_tpu.models.da3.gaussians import Gaussians

_SH_C0 = 0.28209479177387814
_TILE = 16


def _quat_to_rotmat_wxyz(q: jax.Array) -> jax.Array:
    w, x, y, z = (q[..., i] for i in range(4))
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def _project_gaussians(
    means, scales, quats, viewmat, fx, fy, cx, cy, W, H, near=0.01
):
    """EWA projection of N gaussians for one camera.

    Returns (xy (N,2) pixels, depth (N,), conic (N,3), radius (N,), valid (N,)).
    """
    R, t = viewmat[:3, :3], viewmat[:3, 3]
    p_cam = means @ R.T + t  # (N, 3)
    z = p_cam[:, 2]
    valid = z > near
    zc = jnp.maximum(z, near)

    x_pix = p_cam[:, 0] / zc * fx + cx
    y_pix = p_cam[:, 1] / zc * fy + cy
    xy = jnp.stack([x_pix, y_pix], -1)

    # 3D covariance in world: M = R_q diag(s); Sigma = M M^T
    Rq = _quat_to_rotmat_wxyz(quats)  # (N, 3, 3)
    M = Rq * scales[:, None, :]
    sigma_w = M @ jnp.swapaxes(M, -1, -2)  # (N, 3, 3)
    sigma_c = jnp.einsum("ij,njk,lk->nil", R, sigma_w, R)

    # perspective Jacobian (gsplat convention, with the 1.3x frustum clamp)
    lim_x = 1.3 * (0.5 * W / fx)
    lim_y = 1.3 * (0.5 * H / fy)
    tx = jnp.clip(p_cam[:, 0] / zc, -lim_x, lim_x) * zc
    ty = jnp.clip(p_cam[:, 1] / zc, -lim_y, lim_y) * zc
    zero = jnp.zeros_like(zc)
    J = jnp.stack(
        [
            jnp.stack([fx / zc, zero, -fx * tx / (zc * zc)], -1),
            jnp.stack([zero, fy / zc, -fy * ty / (zc * zc)], -1),
        ],
        axis=-2,
    )  # (N, 2, 3)
    cov2d = jnp.einsum("nij,njk,nlk->nil", J, sigma_c, J)
    cov2d = cov2d + 0.3 * jnp.eye(2)  # low-pass blur (3DGS/gsplat)

    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] ** 2
    det = jnp.maximum(det, 1e-10)
    conic = jnp.stack(
        [cov2d[:, 1, 1] / det, -cov2d[:, 0, 1] / det, cov2d[:, 0, 0] / det], -1
    )
    mid = 0.5 * (cov2d[:, 0, 0] + cov2d[:, 1, 1])
    lam1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))
    return xy, z, conic, radius, valid


def _render_one_view(
    means, scales, quats, opac, colors, viewmat, K, W, H, bg, max_per_tile
):
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    xy, depth, conic, radius, valid = _project_gaussians(
        means, scales, quats, viewmat, fx, fy, cx, cy, W, H
    )
    tiles_x = (W + _TILE - 1) // _TILE
    tiles_y = (H + _TILE - 1) // _TILE

    # gaussian bbox in tile units
    g_x0 = (xy[:, 0] - radius) / _TILE
    g_x1 = (xy[:, 0] + radius) / _TILE
    g_y0 = (xy[:, 1] - radius) / _TILE
    g_y1 = (xy[:, 1] + radius) / _TILE
    sort_depth = jnp.where(valid & (radius > 0), depth, jnp.inf)

    def render_tile(tile_idx):
        ty_i = tile_idx // tiles_x
        tx_i = tile_idx % tiles_x
        overlap = (
            (g_x1 >= tx_i) & (g_x0 <= tx_i + 1) & (g_y1 >= ty_i) & (g_y0 <= ty_i + 1)
        )
        d = jnp.where(overlap, sort_depth, jnp.inf)
        neg_d, idx = jax.lax.top_k(-d, max_per_tile)  # nearest first
        live = jnp.isfinite(-neg_d)  # (M,)

        t_xy = xy[idx]  # (M, 2)
        t_conic = conic[idx]
        t_opac = opac[idx] * live
        t_col = colors[idx]  # (M, 3)
        t_z = depth[idx]

        # pixel centers of this tile
        px = tx_i * _TILE + jnp.arange(_TILE) + 0.5
        py = ty_i * _TILE + jnp.arange(_TILE) + 0.5
        gx, gy = jnp.meshgrid(px, py)
        pix = jnp.stack([gx, gy], -1).reshape(-1, 2)  # (P, 2)

        dxy = pix[None] - t_xy[:, None]  # (M, P, 2)
        power = -0.5 * (
            t_conic[:, 0:1] * dxy[..., 0] ** 2
            + t_conic[:, 2:3] * dxy[..., 1] ** 2
        ) - t_conic[:, 1:2] * dxy[..., 0] * dxy[..., 1]
        alpha = jnp.minimum(t_opac[:, None] * jnp.exp(jnp.minimum(power, 0.0)), 0.999)
        alpha = jnp.where(alpha < 1.0 / 255.0, 0.0, alpha)  # (M, P)

        # front-to-back compositing, vectorized: w_i = a_i * prod_{j<i}(1-a_j)
        log_t = jnp.cumsum(jnp.log1p(-alpha), axis=0)
        trans_excl = jnp.exp(jnp.concatenate(
            [jnp.zeros((1, alpha.shape[1])), log_t[:-1]], axis=0
        ))
        w = alpha * trans_excl  # (M, P)
        color = w.T @ t_col + jnp.exp(log_t[-1])[:, None] * bg[None]  # (P, 3)
        depth_out = w.T @ t_z[:, None]  # (P, 1) accumulated depth (RGB+D)
        return (
            color.reshape(_TILE, _TILE, 3),
            depth_out.reshape(_TILE, _TILE),
        )

    colors_t, depths_t = jax.lax.map(
        render_tile, jnp.arange(tiles_x * tiles_y), batch_size=tiles_x
    )
    img = colors_t.reshape(tiles_y, tiles_x, _TILE, _TILE, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * _TILE, tiles_x * _TILE, 3)
    dep = depths_t.reshape(tiles_y, tiles_x, _TILE, _TILE)
    dep = dep.transpose(0, 2, 1, 3).reshape(tiles_y * _TILE, tiles_x * _TILE)
    return img[:H, :W].transpose(2, 0, 1), dep[:H, :W]


@functools.partial(jax.jit, static_argnums=(3, 6))
def _render_views(g_flat, viewmats, Ks, image_shape, bg, sh0, max_per_tile):
    means, scales, quats, opac, colors = g_flat
    H, W = image_shape

    def one(args):
        vm, K, b = args
        return _render_one_view(
            means, scales, quats, opac, colors, vm, K, W, H, b, max_per_tile
        )

    return jax.lax.map(one, (viewmats, Ks, bg))


def render_3dgs(
    extrinsics: jax.Array,  # (V, 4, 4) world->cam
    intrinsics: jax.Array,  # (V, 3, 3) NORMALIZED (reference convention)
    image_shape: Tuple[int, int],
    gaussians: Gaussians,
    background_color: Optional[jax.Array] = None,  # (V, 3)
    batch: int = 0,
    max_per_tile: int = 256,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (color (V, 3, H, W), depth (V, H, W)). SH degree 0 colors."""
    H, W = image_shape
    V = extrinsics.shape[0]
    max_per_tile = min(max_per_tile, gaussians.means.shape[1])
    K = jnp.asarray(intrinsics, jnp.float32)
    K = K.at[:, 0, :].multiply(W).at[:, 1, :].multiply(H)  # to pixels
    if background_color is None:
        background_color = jnp.zeros((V, 3), jnp.float32)

    sh = gaussians.harmonics[batch]  # (N, 3, d_sh)
    colors = sh[..., 0] * _SH_C0 + 0.5  # SH0 -> RGB (gsplat convention)
    g_flat = (
        jnp.asarray(gaussians.means[batch], jnp.float32),
        jnp.asarray(gaussians.scales[batch], jnp.float32),
        jnp.asarray(gaussians.rotations[batch], jnp.float32),
        jnp.asarray(gaussians.opacities[batch], jnp.float32),
        jnp.asarray(colors, jnp.float32),
    )
    return _render_views(
        g_flat, jnp.asarray(extrinsics, jnp.float32), K, (H, W),
        jnp.asarray(background_color, jnp.float32), None, max_per_tile,
    )


# ---------------------------------------------------------------------------
# camera trajectory helpers (host-side numpy; reference gs_renderer.py:156+
# and its wander/dolly/stabilization path utilities)
# ---------------------------------------------------------------------------

def _slerp(q0: np.ndarray, q1: np.ndarray, t: np.ndarray) -> np.ndarray:
    d = np.clip(np.sum(q0 * q1, -1), -1, 1)
    q1 = np.where(d[..., None] < 0, -q1, q1)
    d = np.abs(d)
    theta = np.arccos(np.clip(d, -1, 1))
    sin_t = np.sin(theta)
    w0 = np.where(sin_t > 1e-6, np.sin((1 - t) * theta) / np.maximum(sin_t, 1e-9), 1 - t)
    w1 = np.where(sin_t > 1e-6, np.sin(t * theta) / np.maximum(sin_t, 1e-9), t)
    q = w0[..., None] * q0 + w1[..., None] * q1
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _mat_to_quat_np(R: np.ndarray) -> np.ndarray:
    from videogpa_tpu.geometry import mat_to_quat

    return np.asarray(mat_to_quat(jnp.asarray(R)))


def _quat_to_mat_np(q: np.ndarray) -> np.ndarray:
    from videogpa_tpu.geometry import quat_to_mat

    return np.asarray(quat_to_mat(jnp.asarray(q)))


def interpolate_extrinsics(c2w0: np.ndarray, c2w1: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Slerp rotation + lerp translation between two c2w poses. t: (T,)."""
    q0 = _mat_to_quat_np(c2w0[:3, :3])[None]
    q1 = _mat_to_quat_np(c2w1[:3, :3])[None]
    q = _slerp(np.repeat(q0, len(t), 0), np.repeat(q1, len(t), 0), t)
    R = _quat_to_mat_np(q)
    T = (1 - t)[:, None] * c2w0[:3, 3] + t[:, None] * c2w1[:3, 3]
    out = np.tile(np.eye(4, dtype=np.float64), (len(t), 1, 1))
    out[:, :3, :3] = R
    out[:, :3, 3] = T
    return out.astype(np.float32)


def interpolate_intrinsics(k0: np.ndarray, k1: np.ndarray, t: np.ndarray) -> np.ndarray:
    return ((1 - t)[:, None, None] * k0 + t[:, None, None] * k1).astype(np.float32)


def render_stabilization_path(c2ws: np.ndarray, k_size: int = 50) -> np.ndarray:
    """Moving-average smoothing of positions + quaternions (reflect-padded)."""
    V = c2ws.shape[0]
    k = min(k_size, V) | 1  # odd
    pad = k // 2
    idx = np.concatenate(
        [np.arange(pad, 0, -1), np.arange(V), np.arange(V - 2, V - 2 - pad, -1)]
    )
    idx = np.clip(idx, 0, V - 1)
    pos = c2ws[idx, :3, 3]
    quat = _mat_to_quat_np(c2ws[idx, :3, :3])
    # hemisphere-align quats before averaging
    for i in range(1, len(quat)):
        if np.dot(quat[i], quat[i - 1]) < 0:
            quat[i] = -quat[i]
    kernel = np.ones(k) / k
    sm_pos = np.stack([np.convolve(pos[:, i], kernel, "valid") for i in range(3)], -1)
    sm_q = np.stack([np.convolve(quat[:, i], kernel, "valid") for i in range(4)], -1)
    sm_q = sm_q / np.linalg.norm(sm_q, axis=-1, keepdims=True)
    out = np.tile(np.eye(4, dtype=np.float64), (V, 1, 1))
    out[:, :3, :3] = _quat_to_mat_np(sm_q)
    out[:, :3, 3] = sm_pos
    return out.astype(np.float32)


def render_wander_path(
    c2w: np.ndarray, intr: np.ndarray, h: int, w: int,
    num_frames: int = 60, max_disp: float = 24.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Elliptical camera sway around a single pose (reference wander mode)."""
    fx = float(intr[0, 0] * w)
    max_trans = max_disp / fx
    out = []
    for i in range(num_frames):
        a = 2 * np.pi * i / num_frames
        x_t = max_trans * np.sin(a)
        y_t = max_trans * np.cos(a) / 3.0
        z_t = max_trans * np.cos(a) / 3.0
        delta = np.eye(4, dtype=np.float32)
        delta[:3, 3] = [x_t, y_t, z_t]
        out.append(c2w @ delta)
    return np.stack(out), np.tile(intr, (num_frames, 1, 1)).astype(np.float32)


def render_dolly_zoom_path(
    c2w: np.ndarray, intr: np.ndarray, h: int, w: int,
    num_frames: int = 60, max_disp: float = 48.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Dolly-zoom: move along +z while widening focal length to compensate."""
    fx = float(intr[0, 0] * w)
    max_trans = max_disp / fx
    outs, intrs = [], []
    for i in range(num_frames):
        a = 2 * np.pi * i / num_frames
        z_t = max_trans * (1 - np.cos(a)) / 2.0
        delta = np.eye(4, dtype=np.float32)
        delta[2, 3] = z_t
        k = intr.copy()
        zoom = 1.0 + 0.5 * (1 - np.cos(a)) / 2.0
        k[0, 0] *= zoom
        k[1, 1] *= zoom
        outs.append(c2w @ delta)
        intrs.append(k)
    return np.stack(outs), np.stack(intrs).astype(np.float32)


def run_renderer_chunked(
    gaussians: Gaussians,
    extrinsics: np.ndarray,  # (V, 3/4, 4) world->cam
    intrinsics: np.ndarray,  # (V, 3, 3) pixel units
    image_shape: Tuple[int, int],
    input_shape: Optional[Tuple[int, int]] = None,
    trj_mode: str = "smooth",
    chunk_size: int = 8,
    max_per_tile: int = 256,
) -> Tuple[np.ndarray, np.ndarray]:
    """Render a camera trajectory derived from the input poses.

    trj_mode: original | smooth | interpolate | interpolate_smooth | wander
    | dolly_zoom (reference gs_renderer.py:161-175 mode set minus the
    compound 'extend'/'wobble_inter' variants).
    """
    V = extrinsics.shape[0]
    if extrinsics.shape[-2] == 3:
        pad = np.tile(np.array([[0, 0, 0, 1.0]], np.float32), (V, 1, 1))
        extrinsics = np.concatenate([extrinsics, pad], axis=1)
    in_h, in_w = input_shape if input_shape is not None else image_shape
    intr_n = intrinsics.astype(np.float32).copy()
    intr_n[:, 0, :] /= in_w
    intr_n[:, 1, :] /= in_h
    c2w = np.asarray(affine_inverse(jnp.asarray(extrinsics, jnp.float32)))

    if trj_mode == "original":
        tgt_c2w, tgt_intr = c2w, intr_n
    elif trj_mode == "smooth":
        tgt_c2w, tgt_intr = render_stabilization_path(c2w), intr_n
    elif trj_mode in ("interpolate", "interpolate_smooth"):
        t = np.linspace(0, 1, 8, dtype=np.float32)
        t = (np.cos(np.pi * (t + 1)) + 1) / 2  # cosine easing (reference)
        cs, ks = [], []
        for i in range(V - 1):
            skip = 0 if i == 0 else 1
            cs.append(interpolate_extrinsics(c2w[i], c2w[i + 1], t)[skip:])
            ks.append(interpolate_intrinsics(intr_n[i], intr_n[i + 1], t)[skip:])
        tgt_c2w = np.concatenate(cs)
        tgt_intr = np.concatenate(ks)
        if trj_mode == "interpolate_smooth":
            tgt_c2w = render_stabilization_path(tgt_c2w)
    elif trj_mode == "wander":
        tgt_c2w, tgt_intr = render_wander_path(c2w[0], intr_n[0], in_h, in_w)
    elif trj_mode == "dolly_zoom":
        tgt_c2w, tgt_intr = render_dolly_zoom_path(c2w[0], intr_n[0], in_h, in_w)
    else:
        raise ValueError(f"unknown trj_mode {trj_mode!r}")

    w2c = np.asarray(affine_inverse(jnp.asarray(tgt_c2w, jnp.float32)))
    colors, depths = [], []
    for s0 in range(0, len(w2c), chunk_size):
        c, d = render_3dgs(
            jnp.asarray(w2c[s0 : s0 + chunk_size]),
            jnp.asarray(tgt_intr[s0 : s0 + chunk_size]),
            image_shape, gaussians, max_per_tile=max_per_tile,
        )
        colors.append(np.asarray(c))
        depths.append(np.asarray(d))
    return np.concatenate(colors), np.concatenate(depths)
