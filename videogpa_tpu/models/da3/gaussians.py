"""DA3 Gaussian-splatting branch: GSDPT head, camera->world adapter, gs_ply.

Parity targets: reference ``depth_anything_3/model/gsdpt.py`` (DPT branch
predicting raw per-pixel gaussian params + opacity, with the input images
merged into the head features) and ``model/gs_adapter.py`` (depth-anchored
means, sigmoid-bounded scales x depth x intrinsics multiplier, camera->world
quaternion rotation, SH color masking). The CUDA rasterizer the reference
optionally imports (gsplat) has no TPU analog here yet — rendering is out of
scope; prediction + export are supported, matching the reference's
optional-import behavior.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videogpa_tpu.geometry import affine_inverse
from videogpa_tpu.models.da3.config import DA3Config
from videogpa_tpu.models.vggt.heads import dpt_head_forward, dpt_head_init
from videogpa_tpu.models.vggt.config import VGGTConfig
from videogpa_tpu.ops import layers as L


@dataclasses.dataclass
class Gaussians:
    """Mirror of reference ``specs.py::Gaussians`` (flattened over views)."""

    means: jax.Array  # (B, N, 3)
    harmonics: jax.Array  # (B, N, 3, d_sh)
    opacities: jax.Array  # (B, N)
    scales: jax.Array  # (B, N, 3)
    rotations: jax.Array  # (B, N, 4) wxyz


def gs_raw_dim(sh_degree: int = 0, pred_offset_xy: bool = True) -> int:
    d_sh = (sh_degree + 1) ** 2
    return (2 if pred_offset_xy else 0) + 3 + 4 + 3 * d_sh


def _mat_to_quat_wxyz(R: jax.Array) -> jax.Array:
    from videogpa_tpu.geometry import mat_to_quat

    q = mat_to_quat(R)  # xyzw
    return jnp.concatenate([q[..., 3:4], q[..., :3]], axis=-1)


def _quat_mul_wxyz(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = (a[..., i] for i in range(4))
    bw, bx, by, bz = (b[..., i] for i in range(4))
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def gaussian_adapter(
    extrinsics: jax.Array,  # (B, V, 4, 4) world->cam
    intrinsics: jax.Array,  # (B, V, 3, 3) pixel units
    depths: jax.Array,  # (B, V, H, W)
    opacities: jax.Array,  # (B, V, H, W)
    raw_gaussians: jax.Array,  # (B, V, H, W, d_in)
    image_shape: Tuple[int, int],
    sh_degree: int = 0,
    pred_offset_xy: bool = True,
    gaussian_scale_min: float = 1e-5,
    gaussian_scale_max: float = 30.0,
    eps: float = 1e-8,
) -> Gaussians:
    H, W = image_shape
    B, V = raw_gaussians.shape[:2]
    d_sh = (sh_degree + 1) ** 2

    c2w = affine_inverse(extrinsics)
    intr_normed = intrinsics.at[..., 0, :].divide(W).at[..., 1, :].divide(H)

    # pixel-center grid in [0, 1]
    xs = (jnp.arange(W) + 0.5) / W
    ys = (jnp.arange(H) + 0.5) / H
    gx, gy = jnp.meshgrid(xs, ys)
    xy = jnp.broadcast_to(jnp.stack([gx, gy], -1), (B, V, H, W, 2))

    if pred_offset_xy:
        pixel = jnp.array([1.0 / W, 1.0 / H])
        xy = xy + raw_gaussians[..., :2] * pixel
        raw_gaussians = raw_gaussians[..., 2:]

    # unproject: dir_cam = K_normed^-1 (x, y, 1); world = t + R dir * depth
    Kinv = jnp.linalg.inv(intr_normed)  # (B, V, 3, 3)
    ones = jnp.ones_like(xy[..., :1])
    pix = jnp.concatenate([xy, ones], axis=-1)
    dir_cam = jnp.einsum("bvij,bvhwj->bvhwi", Kinv, pix)
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    dir_world = jnp.einsum("bvij,bvhwj->bvhwi", R, dir_cam)
    means = t[:, :, None, None] + dir_world * depths[..., None]

    scales_raw, rot_raw, sh = jnp.split(raw_gaussians, [3, 7], axis=-1)

    scales = gaussian_scale_min + (
        gaussian_scale_max - gaussian_scale_min
    ) * jax.nn.sigmoid(scales_raw)
    pixel = jnp.array([1.0 / W, 1.0 / H])
    mult = 0.1 * jnp.einsum(
        "bvij,j->bvi", jnp.linalg.inv(intr_normed[..., :2, :2]), pixel
    ).sum(-1)
    gs_scales = scales * depths[..., None] * mult[:, :, None, None, None]

    rot = rot_raw / (jnp.linalg.norm(rot_raw, axis=-1, keepdims=True) + eps)  # xyzw
    rot_wxyz = jnp.concatenate([rot[..., 3:4], rot[..., :3]], axis=-1)
    q_c2w = _mat_to_quat_wxyz(R)  # (B, V, 4)
    world_rot = _quat_mul_wxyz(
        jnp.broadcast_to(q_c2w[:, :, None, None], rot_wxyz.shape), rot_wxyz
    )

    sh = sh.reshape(sh.shape[:-1] + (3, d_sh))
    if sh_degree > 0:
        mask = jnp.ones((d_sh,))
        for degree in range(1, sh_degree + 1):
            mask = mask.at[degree ** 2 : (degree + 1) ** 2].set(0.1 * 0.25 ** degree)
        sh = sh * mask

    flat = lambda x: x.reshape((B, V * H * W) + x.shape[4:])
    return Gaussians(
        means=flat(means),
        harmonics=flat(sh),
        opacities=flat(opacities),
        scales=flat(gs_scales),
        rotations=flat(world_rot),
    )


# ---------------------------------------------------------------------------
# GSDPT head (simplified merger: images concatenated into the head features)
# ---------------------------------------------------------------------------

def _gs_vcfg(cfg: DA3Config) -> VGGTConfig:
    return VGGTConfig(
        embed_dim=cfg.embed_dim,
        num_register_tokens=0,
        dpt_features=cfg.dpt_features,
        dpt_out_channels=cfg.dpt_out_channels,
        dpt_intermediate_layers=(0, 1, 2, 3),
        patch_size=cfg.patch_size,
    )


def gsdpt_init(key: jax.Array, cfg: DA3Config, sh_degree: int = 0,
               dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 4)
    d_out = gs_raw_dim(sh_degree) + 1  # + opacity
    f = cfg.dpt_features
    return {
        # DPT trunk up to full-res features (feature_only)
        "dpt": dpt_head_init(keys[0], _gs_vcfg(cfg), output_dim=0, dtype=dtype,
                             feature_only=True),
        # merge input images into the features, then the output head
        "images_merger": L.conv2d_init(keys[1], f + 3, f // 2, 3, dtype=dtype),
        "out_a": L.conv2d_init(keys[2], f // 2, 32, 3, dtype=dtype),
        "out_b": L.conv2d_init(keys[3], 32, d_out, 1, dtype=dtype),
    }


def gsdpt_forward(
    params: dict,
    feats,
    images: jax.Array,  # (B, V, 3, H, W) in [0, 1]
    cfg: DA3Config,
    sh_degree: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (raw_gaussians (B, V, H, W, d_in), opacities (B, V, H, W))."""
    B, V, _, H, W = images.shape
    vcfg = _gs_vcfg(cfg)
    layer_outputs = jnp.stack([f[0] for f in feats])  # (4, B, V, P, 2C)
    # tokens are already cls-stripped; re-add a dummy slot so patch_start_idx=1
    dummy = layer_outputs[:, :, :, :1]
    layer_outputs = jnp.concatenate([dummy, layer_outputs], axis=3)

    features = dpt_head_forward(
        params["dpt"], layer_outputs, vcfg, (H, W), feature_only=True,
        inplace_relu=False,  # DA3 fusion: raw-x residual (model/dpt.py:347)
    )  # (B, V, f, H, W)
    h = jnp.concatenate(
        [features.reshape(B * V, -1, H, W), images.reshape(B * V, 3, H, W)], axis=1
    )
    h = jax.nn.relu(L.conv2d(params["images_merger"], h, padding=1))
    h = jax.nn.relu(L.conv2d(params["out_a"], h, padding=1))
    out = L.conv2d(params["out_b"], h)
    out = jnp.transpose(out, (0, 2, 3, 1)).reshape(B, V, H, W, -1)
    raw = out[..., :-1]
    opac = jax.nn.sigmoid(out[..., -1])
    return raw, opac


# ---------------------------------------------------------------------------
# 3DGS PLY export
# ---------------------------------------------------------------------------

def save_gs_ply(g: Gaussians, path: str, batch: int = 0) -> None:
    """Write gaussians in the standard 3DGS PLY layout."""
    means = np.asarray(g.means[batch], np.float32)
    sh = np.asarray(g.harmonics[batch], np.float32)  # (N, 3, d_sh)
    opac = np.asarray(g.opacities[batch], np.float32)
    scales = np.asarray(g.scales[batch], np.float32)
    rots = np.asarray(g.rotations[batch], np.float32)
    N = means.shape[0]
    d_sh = sh.shape[-1]
    n_rest = 3 * (d_sh - 1)

    names = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(n_rest)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {N}\n"
        + "".join(f"property float {n}\n" for n in names)
        + "end_header\n"
    )
    cols = [means, np.zeros((N, 3), np.float32), sh[:, :, 0]]
    if n_rest:
        cols.append(sh[:, :, 1:].reshape(N, n_rest))
    # inverse activations (3DGS convention): logit opacity, log scales
    cols.append(np.log(np.clip(opac, 1e-6, 1 - 1e-6) /
                       (1 - np.clip(opac, 1e-6, 1 - 1e-6)))[:, None])
    cols.append(np.log(np.maximum(scales, 1e-9)))
    cols.append(rots)
    data = np.concatenate(cols, axis=1).astype("<f4")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(data.tobytes())
