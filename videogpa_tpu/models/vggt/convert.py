"""facebook/VGGT-1B torch checkpoint -> JAX params conversion.

Key layout follows the reference module tree (``vggt/models/vggt.py``,
``vggt/models/aggregator.py``, ``vggt/heads/*``). Per-layer block weights are
stacked along a leading axis for ``lax.scan``.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from videogpa_tpu.convert import (
    t_array,
    t_conv2d,
    t_conv_transpose2d,
    t_layernorm,
    t_linear,
)
from videogpa_tpu.models.vggt.config import VGGTConfig
from videogpa_tpu.ops import layers as L


def _convert_block(
    sd: Mapping[str, np.ndarray], pfx: str, qk_norm: bool, ls: bool,
    ffn: str = "mlp",
) -> dict:
    if ffn == "swiglu":  # DINOv2-giant SwiGLUFFNFused (w12 / w3)
        mlp_p = {
            "w12": t_linear(sd, f"{pfx}.mlp.w12"),
            "w3": t_linear(sd, f"{pfx}.mlp.w3"),
        }
    else:
        mlp_p = {
            "fc1": t_linear(sd, f"{pfx}.mlp.fc1"),
            "fc2": t_linear(sd, f"{pfx}.mlp.fc2"),
        }
    p = {
        "norm1": t_layernorm(sd, f"{pfx}.norm1"),
        "attn": {
            "qkv": t_linear(sd, f"{pfx}.attn.qkv"),
            "proj": t_linear(sd, f"{pfx}.attn.proj"),
        },
        "norm2": t_layernorm(sd, f"{pfx}.norm2"),
        "mlp": mlp_p,
    }
    if qk_norm:
        p["attn"]["q_norm"] = t_layernorm(sd, f"{pfx}.attn.q_norm")
        p["attn"]["k_norm"] = t_layernorm(sd, f"{pfx}.attn.k_norm")
    if ls:
        p["ls1"] = {"gamma": t_array(sd, f"{pfx}.ls1.gamma")}
        p["ls2"] = {"gamma": t_array(sd, f"{pfx}.ls2.gamma")}
    return p


def convert_dinov2(sd: Mapping[str, np.ndarray], pfx: str, depth: int) -> dict:
    blocks = [
        _convert_block(sd, f"{pfx}.blocks.{i}", qk_norm=False, ls=True)
        for i in range(depth)
    ]
    return {
        "patch_embed": t_conv2d(sd, f"{pfx}.patch_embed.proj"),
        "cls_token": t_array(sd, f"{pfx}.cls_token"),
        "register_tokens": t_array(sd, f"{pfx}.register_tokens"),
        "pos_embed": t_array(sd, f"{pfx}.pos_embed"),
        "blocks": L.stack_params(blocks),
        "norm": t_layernorm(sd, f"{pfx}.norm"),
    }


def _convert_dpt_head(sd: Mapping[str, np.ndarray], pfx: str) -> dict:
    def rcu(rpfx):
        return {
            "conv1": t_conv2d(sd, f"{rpfx}.conv1"),
            "conv2": t_conv2d(sd, f"{rpfx}.conv2"),
        }

    def fusion(fpfx, has_residual):
        p = {"out_conv": t_conv2d(sd, f"{fpfx}.out_conv"), "rcu2": rcu(f"{fpfx}.resConfUnit2")}
        if has_residual:
            p["rcu1"] = rcu(f"{fpfx}.resConfUnit1")
        return p

    return {
        "norm": t_layernorm(sd, f"{pfx}.norm"),
        "projects": [t_conv2d(sd, f"{pfx}.projects.{i}") for i in range(4)],
        "resize0": t_conv_transpose2d(sd, f"{pfx}.resize_layers.0"),
        "resize1": t_conv_transpose2d(sd, f"{pfx}.resize_layers.1"),
        "resize3": t_conv2d(sd, f"{pfx}.resize_layers.3"),
        "layer_rn": [
            t_conv2d(sd, f"{pfx}.scratch.layer{i + 1}_rn") for i in range(4)
        ],
        "refinenet1": fusion(f"{pfx}.scratch.refinenet1", True),
        "refinenet2": fusion(f"{pfx}.scratch.refinenet2", True),
        "refinenet3": fusion(f"{pfx}.scratch.refinenet3", True),
        "refinenet4": fusion(f"{pfx}.scratch.refinenet4", False),
        "output_conv1": t_conv2d(sd, f"{pfx}.scratch.output_conv1"),
        "output_conv2a": t_conv2d(sd, f"{pfx}.scratch.output_conv2.0"),
        "output_conv2b": t_conv2d(sd, f"{pfx}.scratch.output_conv2.2"),
    }


def _convert_camera_head(sd: Mapping[str, np.ndarray], pfx: str, trunk_depth: int) -> dict:
    trunk = [
        _convert_block(sd, f"{pfx}.trunk.{i}", qk_norm=False, ls=True)
        for i in range(trunk_depth)
    ]
    return {
        "trunk": L.stack_params(trunk),
        "token_norm": t_layernorm(sd, f"{pfx}.token_norm"),
        "trunk_norm": t_layernorm(sd, f"{pfx}.trunk_norm"),
        "empty_pose_tokens": t_array(sd, f"{pfx}.empty_pose_tokens"),
        "embed_pose": t_linear(sd, f"{pfx}.embed_pose"),
        # Sequential(SiLU, Linear) -> index 1
        "poseLN_modulation": t_linear(sd, f"{pfx}.poseLN_modulation.1"),
        "pose_branch": {
            "fc1": t_linear(sd, f"{pfx}.pose_branch.fc1"),
            "fc2": t_linear(sd, f"{pfx}.pose_branch.fc2"),
        },
    }


def convert_vggt(sd: Mapping[str, np.ndarray], cfg: VGGTConfig) -> dict:
    """Convert a VGGT torch state dict to this framework's param pytree."""
    agg = {
        "patch_embed": convert_dinov2(sd, "aggregator.patch_embed", cfg.backbone_depth),
        "camera_token": t_array(sd, "aggregator.camera_token"),
        "register_token": t_array(sd, "aggregator.register_token"),
        "frame_blocks": L.stack_params(
            [
                _convert_block(sd, f"aggregator.frame_blocks.{i}", cfg.qk_norm, True)
                for i in range(cfg.depth)
            ]
        ),
        "global_blocks": L.stack_params(
            [
                _convert_block(sd, f"aggregator.global_blocks.{i}", cfg.qk_norm, True)
                for i in range(cfg.depth)
            ]
        ),
    }
    params = {"aggregator": agg}
    if cfg.enable_camera and "camera_head.token_norm.weight" in sd:
        params["camera_head"] = _convert_camera_head(
            sd, "camera_head", cfg.camera_trunk_depth
        )
    if cfg.enable_depth and "depth_head.norm.weight" in sd:
        params["depth_head"] = _convert_dpt_head(sd, "depth_head")
    if cfg.enable_point and "point_head.norm.weight" in sd:
        params["point_head"] = _convert_dpt_head(sd, "point_head")
    return params
