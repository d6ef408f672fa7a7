"""diffusers CogVideoX checkpoint <-> JAX params conversion.

Key layout follows diffusers ``CogVideoXTransformer3DModel`` /
``AutoencoderKLCogVideoX`` module trees (the models the reference loads at
``train/CogVideoX-I2V-5B/03_train.py:94-111``). Both directions are provided:
``convert_dit``/``convert_vae`` ingest torch state dicts; ``export_dit`` emits
one (used for PEFT/HF interop round-trips).
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from videogpa_tpu.convert import t_conv2d, t_layernorm, t_linear
from videogpa_tpu.models.cogvideox.config import CogVideoXConfig
from videogpa_tpu.ops import layers as L


def t_conv3d(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    w = np.asarray(sd[f"{prefix}.weight"])  # (O, I, kt, kh, kw)
    p = {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


# ---------------------------------------------------------------------------
# DiT
# ---------------------------------------------------------------------------

def _convert_block(sd, pfx: str) -> dict:
    return {
        "norm1": {
            "linear": t_linear(sd, f"{pfx}.norm1.linear"),
            "norm": t_layernorm(sd, f"{pfx}.norm1.norm"),
        },
        "attn1": {
            "to_q": t_linear(sd, f"{pfx}.attn1.to_q"),
            "to_k": t_linear(sd, f"{pfx}.attn1.to_k"),
            "to_v": t_linear(sd, f"{pfx}.attn1.to_v"),
            "to_out": t_linear(sd, f"{pfx}.attn1.to_out.0"),
            "norm_q": t_layernorm(sd, f"{pfx}.attn1.norm_q"),
            "norm_k": t_layernorm(sd, f"{pfx}.attn1.norm_k"),
        },
        "norm2": {
            "linear": t_linear(sd, f"{pfx}.norm2.linear"),
            "norm": t_layernorm(sd, f"{pfx}.norm2.norm"),
        },
        "ff": {
            "fc1": t_linear(sd, f"{pfx}.ff.net.0.proj"),
            "fc2": t_linear(sd, f"{pfx}.ff.net.2"),
        },
    }


def convert_dit(sd: Mapping[str, np.ndarray], cfg: CogVideoXConfig) -> dict:
    if cfg.patch_size_t is None:
        patch_proj = t_conv2d(sd, "patch_embed.proj")
    else:
        patch_proj = t_linear(sd, "patch_embed.proj")
    params = {
        "patch_embed": {
            "proj": patch_proj,
            "text_proj": t_linear(sd, "patch_embed.text_proj"),
        },
        "time_embedding": {
            "linear_1": t_linear(sd, "time_embedding.linear_1"),
            "linear_2": t_linear(sd, "time_embedding.linear_2"),
        },
        "blocks": L.stack_params(
            [
                _convert_block(sd, f"transformer_blocks.{i}")
                for i in range(cfg.num_layers)
            ]
        ),
        "norm_final": t_layernorm(sd, "norm_final"),
        "norm_out": {
            "linear": t_linear(sd, "norm_out.linear"),
            "norm": t_layernorm(sd, "norm_out.norm"),
        },
        "proj_out": t_linear(sd, "proj_out"),
    }
    if "ofs_embedding.linear_1.weight" in sd:
        params["ofs_embedding"] = {
            "linear_1": t_linear(sd, "ofs_embedding.linear_1"),
            "linear_2": t_linear(sd, "ofs_embedding.linear_2"),
        }
    if "patch_embed.pos_embedding" in sd:
        params["pos_embedding"] = jnp.asarray(sd["patch_embed.pos_embedding"])
    return params


def export_dit(params: dict, cfg: CogVideoXConfig) -> Dict[str, np.ndarray]:
    """Inverse of convert_dit (diffusers key layout, torch tensor layouts)."""
    out: Dict[str, np.ndarray] = {}

    def put_linear(pfx, p):
        out[f"{pfx}.weight"] = np.asarray(p["kernel"]).T
        if "bias" in p:
            out[f"{pfx}.bias"] = np.asarray(p["bias"])

    def put_ln(pfx, p):
        if "scale" in p:
            out[f"{pfx}.weight"] = np.asarray(p["scale"])
            out[f"{pfx}.bias"] = np.asarray(p["bias"])

    pe = params["patch_embed"]["proj"]
    if cfg.patch_size_t is None:
        out["patch_embed.proj.weight"] = np.asarray(pe["kernel"]).transpose(3, 2, 0, 1)
        out["patch_embed.proj.bias"] = np.asarray(pe["bias"])
    else:
        put_linear("patch_embed.proj", pe)
    put_linear("patch_embed.text_proj", params["patch_embed"]["text_proj"])
    put_linear("time_embedding.linear_1", params["time_embedding"]["linear_1"])
    put_linear("time_embedding.linear_2", params["time_embedding"]["linear_2"])
    if "ofs_embedding" in params:
        put_linear("ofs_embedding.linear_1", params["ofs_embedding"]["linear_1"])
        put_linear("ofs_embedding.linear_2", params["ofs_embedding"]["linear_2"])
    if "pos_embedding" in params:
        out["patch_embed.pos_embedding"] = np.asarray(params["pos_embedding"])

    import jax

    for i in range(cfg.num_layers):
        blk = jax.tree_util.tree_map(lambda a, i=i: a[i], params["blocks"])
        pfx = f"transformer_blocks.{i}"
        put_linear(f"{pfx}.norm1.linear", blk["norm1"]["linear"])
        put_ln(f"{pfx}.norm1.norm", blk["norm1"]["norm"])
        for name in ("to_q", "to_k", "to_v"):
            put_linear(f"{pfx}.attn1.{name}", blk["attn1"][name])
        put_linear(f"{pfx}.attn1.to_out.0", blk["attn1"]["to_out"])
        put_ln(f"{pfx}.attn1.norm_q", blk["attn1"]["norm_q"])
        put_ln(f"{pfx}.attn1.norm_k", blk["attn1"]["norm_k"])
        put_linear(f"{pfx}.norm2.linear", blk["norm2"]["linear"])
        put_ln(f"{pfx}.norm2.norm", blk["norm2"]["norm"])
        put_linear(f"{pfx}.ff.net.0.proj", blk["ff"]["fc1"])
        put_linear(f"{pfx}.ff.net.2", blk["ff"]["fc2"])

    put_ln("norm_final", params["norm_final"])
    put_linear("norm_out.linear", params["norm_out"]["linear"])
    put_ln("norm_out.norm", params["norm_out"]["norm"])
    put_linear("proj_out", params["proj_out"])
    return out


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def _gn(sd, pfx):
    return {
        "scale": jnp.asarray(sd[f"{pfx}.weight"]),
        "bias": jnp.asarray(sd[f"{pfx}.bias"]),
    }


def _spatial_norm(sd, pfx):
    return {
        "norm": _gn(sd, f"{pfx}.norm_layer"),
        "conv_y": t_conv3d(sd, f"{pfx}.conv_y.conv"),
        "conv_b": t_conv3d(sd, f"{pfx}.conv_b.conv"),
    }


def _vae_resnet(sd, pfx, spatial: bool):
    norm = _spatial_norm if spatial else _gn
    p = {
        "norm1": norm(sd, f"{pfx}.norm1"),
        "conv1": t_conv3d(sd, f"{pfx}.conv1.conv"),
        "norm2": norm(sd, f"{pfx}.norm2"),
        "conv2": t_conv3d(sd, f"{pfx}.conv2.conv"),
    }
    if f"{pfx}.conv_shortcut.conv.weight" in sd:
        p["conv_shortcut"] = t_conv3d(sd, f"{pfx}.conv_shortcut.conv")
    return p


def convert_vae(sd: Mapping[str, np.ndarray], cfg: CogVideoXConfig) -> dict:
    import math as _math

    ch = cfg.vae_block_out_channels
    npb = cfg.vae_layers_per_block
    t_levels = int(_math.log2(cfg.temporal_compression_ratio))

    enc = {"conv_in": t_conv3d(sd, "encoder.conv_in.conv"), "down": []}
    for i in range(len(ch)):
        block = {
            "resnets": [
                _vae_resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", False)
                for j in range(npb)
            ]
        }
        ds = f"encoder.down_blocks.{i}.downsamplers.0.conv"
        if f"{ds}.weight" in sd:
            block["downsample"] = {"conv": t_conv2d(sd, ds)}
        enc["down"].append(block)
    enc["mid"] = {
        "resnets": [
            _vae_resnet(sd, f"encoder.mid_block.resnets.{j}", False) for j in range(2)
        ]
    }
    enc["norm_out"] = _gn(sd, "encoder.norm_out")
    enc["conv_out"] = t_conv3d(sd, "encoder.conv_out.conv")

    dec = {"conv_in": t_conv3d(sd, "decoder.conv_in.conv"), "up": []}
    dec["mid"] = {
        "resnets": [
            _vae_resnet(sd, f"decoder.mid_block.resnets.{j}", True) for j in range(2)
        ]
    }
    n_up = len(ch)
    for i in range(n_up):
        block = {
            "resnets": [
                _vae_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", True)
                for j in range(npb + 1)
            ]
        }
        us = f"decoder.up_blocks.{i}.upsamplers.0.conv"
        if f"{us}.weight" in sd:
            block["upsample"] = {"conv": t_conv2d(sd, us)}
        dec["up"].append(block)
    dec["norm_out"] = _spatial_norm(sd, "decoder.norm_out")
    dec["conv_out"] = t_conv3d(sd, "decoder.conv_out.conv")
    return {"encoder": enc, "decoder": dec}
