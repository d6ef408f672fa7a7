"""DA3 top-level net + inference API (JAX).

Parity targets: reference ``depth_anything_3/model/da3.py:100-230`` (forward:
AA-ViT -> DualDPT in f32 -> CameraDec -> pose decode, extrinsics = w2c) and
``depth_anything_3/api.py:133-273`` (inference: ImageNet normalization,
forward, numpy outputs). The scoring path consumes depth/conf/extrinsics/
intrinsics/processed_images (reference ``pipelines/process_video.py:132-166``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from videogpa_tpu.geometry import affine_inverse, pose_encoding_to_extri_intri
from videogpa_tpu.models.da3.config import DA3Config
from videogpa_tpu.models.da3.heads import (
    camera_dec_forward,
    camera_dec_init,
    camera_enc_forward,
    camera_enc_init,
    dualdpt_forward,
    dualdpt_init,
)
from videogpa_tpu.models.da3.vit import aavit_forward, aavit_init

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def da3_init(key: jax.Array, cfg: DA3Config, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "backbone": aavit_init(k1, cfg, dtype),
        "head": dualdpt_init(k2, cfg, dtype),
        "cam_dec": camera_dec_init(k3, cfg.tokens_dim, dtype),
        "cam_enc": camera_enc_init(k4, cfg.embed_dim, dtype),
    }


def da3_forward(
    params: dict,
    images: jax.Array,
    cfg: DA3Config,
    attn_impl: str = "auto",
    compute_dtype=jnp.float32,
    gt_extrinsics: Optional[jax.Array] = None,
    gt_intrinsics: Optional[jax.Array] = None,
    return_features: bool = False,
) -> Dict[str, jax.Array]:
    """images: (B, S, 3, H, W), already ImageNet-normalized.

    Optional GT camera conditioning (reference ``model/da3.py:126-130``):
    cam tokens from CameraEnc replace the learned camera token.

    Returns dict: depth (B,S,H,W), depth_conf, ray, ray_conf,
    extrinsics (B,S,3,4) world->camera, intrinsics (B,S,3,3).
    """
    B, S, _, H, W = images.shape
    cam_token = None
    if gt_extrinsics is not None and "cam_enc" in params:
        cam_token = camera_enc_forward(
            params["cam_enc"], gt_extrinsics, gt_intrinsics, (H, W), attn_impl
        ).astype(compute_dtype)
    feats = aavit_forward(
        params["backbone"], images.astype(compute_dtype), cfg,
        cam_token=cam_token, attn_impl=attn_impl
    )
    # heads run f32 (reference autocast-off), but cast at each consumer's
    # slice instead of materializing a full-stack f32 copy (~0.5 GB at
    # S=10/518²): dualdpt_forward casts tokens per layer (heads.py:94) and
    # aavit_forward already emits cls features in f32 (vit.py:105)

    out = dualdpt_forward(params["head"], feats, cfg, (H, W))

    pose_enc = camera_dec_forward(params["cam_dec"], feats[-1][1])
    c2w, intr = pose_encoding_to_extri_intri(pose_enc, (H, W))
    out["extrinsics"] = affine_inverse(c2w)  # -> w2c (B, S, 3, 4)
    out["intrinsics"] = intr
    out["pose_enc"] = pose_enc
    if return_features:
        # last out-layer patch tokens, for feat_vis PCA export (reference
        # utils/export feat_vis / pca_utils)
        out["features"] = feats[-1][0].astype(jnp.float32)  # (B, S, P, 2C)
    return out


@dataclasses.dataclass
class DA3Prediction:
    """Numpy prediction mirror of reference ``depth_anything_3/specs.py:36-47``."""

    depth: np.ndarray  # (S, H, W)
    conf: Optional[np.ndarray]  # (S, H, W)
    extrinsics: np.ndarray  # (S, 3, 4) world->camera
    intrinsics: np.ndarray  # (S, 3, 3)
    processed_images: np.ndarray  # (S, H, W, 3) uint8-scale
    gaussians: Optional[object] = None  # models.da3.gaussians.Gaussians
    features: Optional[np.ndarray] = None  # (S, H/14, W/14, C) for feat_vis


# module-level jit: eager dispatch costs ~100 ms/op on remote TPU backends
# and a per-call jax.jit wrapper would recompile every call
_da3_forward_j = jax.jit(da3_forward, static_argnums=(2, 3, 4, 7))


def da3_inference(
    params: dict,
    frames: np.ndarray,
    cfg: DA3Config,
    attn_impl: str = "auto",
    compute_dtype=jnp.bfloat16,
    gt_extrinsics: Optional[np.ndarray] = None,
    return_features: bool = False,
) -> DA3Prediction:
    """frames: (S, H, W, 3) uint8 RGB (pre-resized to /14-divisible).

    With gt_extrinsics (S, 3/4, 4) the predicted trajectory is aligned to
    them via Umeyama Sim(3) — RANSAC when >= 10 views, mirroring reference
    ``api.py:341-365``.
    """
    imgs = frames.astype(np.float32) / 255.0
    mean = np.asarray(_IMAGENET_MEAN, np.float32)
    std = np.asarray(_IMAGENET_STD, np.float32)
    normed = (imgs - mean) / std
    x = jnp.asarray(normed.transpose(0, 3, 1, 2))[None]  # (1, S, 3, H, W)

    out = _da3_forward_j(
        params, x, cfg, attn_impl, compute_dtype, None, None, return_features
    )
    extr = np.asarray(out["extrinsics"][0])
    depth = np.asarray(out["depth"][0])
    if gt_extrinsics is not None:
        from videogpa_tpu.geometry.alignment import align_poses_umeyama

        _, _, scale, aligned = align_poses_umeyama(
            gt_extrinsics, extr, return_aligned=True,
            ransac=len(extr) >= 10, random_state=0,
        )
        extr = aligned[:, :3].astype(np.float32)
        depth = depth * scale  # metric scale follows the trajectory alignment
    features = None
    if return_features:
        S, H, W = depth.shape
        feats = np.asarray(out["features"][0])  # (S, P, C)
        features = feats.reshape(S, H // 14, W // 14, feats.shape[-1])
    return DA3Prediction(
        depth=depth,
        conf=np.asarray(out["depth_conf"][0]),
        extrinsics=extr,
        intrinsics=np.asarray(out["intrinsics"][0]),
        processed_images=(imgs * 255.0).astype(np.float32),
        features=features,
    )
