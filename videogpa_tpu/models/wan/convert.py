"""Wan2.2 checkpoint -> JAX params conversion.

Key layout follows the Wan repo's WanModel module tree (Sequential indices:
text/time_embedding = [Linear, GELU/SiLU, Linear] -> .0/.2;
time_projection = [SiLU, Linear] -> .1; ffn = [Linear, GELU, Linear] -> .0/.2).
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

from videogpa_tpu.convert import t_layernorm, t_linear, t_rmsnorm
from videogpa_tpu.models.wan.config import WanConfig
from videogpa_tpu.ops import layers as L


def _attn(sd, pfx):
    return {
        "q": t_linear(sd, f"{pfx}.q"),
        "k": t_linear(sd, f"{pfx}.k"),
        "v": t_linear(sd, f"{pfx}.v"),
        "o": t_linear(sd, f"{pfx}.o"),
        "norm_q": t_rmsnorm(sd, f"{pfx}.norm_q"),
        "norm_k": t_rmsnorm(sd, f"{pfx}.norm_k"),
    }


def _convert_block(sd, pfx):
    return {
        "norm3": t_layernorm(sd, f"{pfx}.norm3"),
        "self_attn": _attn(sd, f"{pfx}.self_attn"),
        "cross_attn": _attn(sd, f"{pfx}.cross_attn"),
        "ffn": {
            "fc1": t_linear(sd, f"{pfx}.ffn.0"),
            "fc2": t_linear(sd, f"{pfx}.ffn.2"),
        },
        "modulation": jnp.asarray(sd[f"{pfx}.modulation"]),
    }


def convert_wan(sd: Mapping[str, np.ndarray], cfg: WanConfig) -> dict:
    w = np.asarray(sd["patch_embedding.weight"])  # (O, I, kt, kh, kw)
    blocks = [
        _convert_block(sd, f"blocks.{i}") for i in range(cfg.num_layers)
    ]
    return {
        "patch_embedding": {
            "kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
            "bias": jnp.asarray(sd["patch_embedding.bias"]),
        },
        "text_embedding": {
            "fc1": t_linear(sd, "text_embedding.0"),
            "fc2": t_linear(sd, "text_embedding.2"),
        },
        "time_embedding": {
            "fc1": t_linear(sd, "time_embedding.0"),
            "fc2": t_linear(sd, "time_embedding.2"),
        },
        "time_projection": t_linear(sd, "time_projection.1"),
        "blocks": L.stack_params(blocks),
        "head": {
            "head": t_linear(sd, "head.head"),
            "modulation": jnp.asarray(sd["head.modulation"]),
        },
    }


def _t_conv3d(sd, pfx):
    """torch Conv3d (O,I,kt,kh,kw) -> DHWIO."""
    return {
        "kernel": jnp.asarray(np.asarray(sd[f"{pfx}.weight"]).transpose(2, 3, 4, 1, 0)),
        "bias": jnp.asarray(sd[f"{pfx}.bias"]),
    }


def _t_conv2d(sd, pfx):
    """torch Conv2d (O,I,kh,kw) -> HWIO."""
    return {
        "kernel": jnp.asarray(np.asarray(sd[f"{pfx}.weight"]).transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(sd[f"{pfx}.bias"]),
    }


def _t_rms(sd, pfx):
    """Wan RMS_norm gamma (C,1,1[,1]) -> (C,)."""
    return {"gamma": jnp.asarray(np.asarray(sd[f"{pfx}.gamma"]).reshape(-1))}


def _vae_resnet(sd, pfx):
    p = {
        "norm1": _t_rms(sd, f"{pfx}.residual.0"),
        "conv1": _t_conv3d(sd, f"{pfx}.residual.2"),
        "norm2": _t_rms(sd, f"{pfx}.residual.3"),
        "conv2": _t_conv3d(sd, f"{pfx}.residual.6"),
    }
    if f"{pfx}.shortcut.weight" in sd:
        p["shortcut"] = _t_conv3d(sd, f"{pfx}.shortcut")
    return p


def _vae_resample(sd, pfx):
    p = {"conv": _t_conv2d(sd, f"{pfx}.resample.1")}
    if f"{pfx}.time_conv.weight" in sd:
        p["time_conv"] = _t_conv3d(sd, f"{pfx}.time_conv")
    return p


def _vae_mid(sd, pfx):
    return {
        "res1": _vae_resnet(sd, f"{pfx}.0"),
        "attn": {
            "norm": _t_rms(sd, f"{pfx}.1.norm"),
            "qkv": _t_conv2d(sd, f"{pfx}.1.to_qkv"),
            "proj": _t_conv2d(sd, f"{pfx}.1.proj"),
        },
        "res2": _vae_resnet(sd, f"{pfx}.2"),
    }


def convert_wan_vae(
    sd: Mapping[str, np.ndarray],
    cfg: WanConfig,
    latents_mean=None,
    latents_std=None,
) -> dict:
    """Wan2.2 VAE checkpoint (``Wan2.2_VAE.pth``, ``wan/modules/vae2_2.py``
    WanVAE_ key layout) -> our pytree.

    Module tree: ``encoder.conv1`` / ``encoder.downsamples.{i}.downsamples.{j}``
    (j = resnets then the trailing Resample) / ``encoder.middle.{0,1,2}`` /
    ``encoder.head.{0,2}`` / root ``conv1``/``conv2`` (quant / post-quant) /
    ``decoder.conv1`` / ``decoder.upsamples.{i}.upsamples.{j}`` /
    ``decoder.middle`` / ``decoder.head``. The parameter-free AvgDown3D /
    DupUp3D shortcuts have no keys.

    ``latents_mean``/``latents_std`` are NOT in the checkpoint — the Wan repo
    hardcodes the 48-channel lists in ``Wan2_2_VAE.__init__`` (diffusers ships
    them as ``vae/config.json:latents_mean/latents_std``). Pass them here;
    omitted, latents stay un-normalized (mean 0 / std 1), which is wrong for
    real weights — callers load them alongside the state dict.
    """
    if any(k.startswith("model.") for k in sd):
        sd = {k.removeprefix("model."): v for k, v in sd.items()}
    n_scales = len(cfg.vae_dim_mult)
    nrb = cfg.vae_num_res_blocks
    z = cfg.vae_z_dim

    enc = {
        "conv_in": _t_conv3d(sd, "encoder.conv1"),
        "scales": [],
        "mid": _vae_mid(sd, "encoder.middle"),
        "head_norm": _t_rms(sd, "encoder.head.0"),
        "conv_out": _t_conv3d(sd, "encoder.head.2"),
    }
    for i in range(n_scales):
        pfx = f"encoder.downsamples.{i}.downsamples"
        scale = {"resnets": [_vae_resnet(sd, f"{pfx}.{j}") for j in range(nrb)]}
        if i != n_scales - 1:
            scale["resample"] = _vae_resample(sd, f"{pfx}.{nrb}")
        enc["scales"].append(scale)

    dec = {
        "conv_in": _t_conv3d(sd, "decoder.conv1"),
        "mid": _vae_mid(sd, "decoder.middle"),
        "scales": [],
        "head_norm": _t_rms(sd, "decoder.head.0"),
        "conv_out": _t_conv3d(sd, "decoder.head.2"),
    }
    for i in range(n_scales):
        pfx = f"decoder.upsamples.{i}.upsamples"
        scale = {"resnets": [_vae_resnet(sd, f"{pfx}.{j}") for j in range(nrb + 1)]}
        if i != n_scales - 1:
            scale["resample"] = _vae_resample(sd, f"{pfx}.{nrb + 1}")
        dec["scales"].append(scale)

    return {
        "encoder": enc,
        "quant_conv": _t_conv3d(sd, "conv1"),
        "post_quant_conv": _t_conv3d(sd, "conv2"),
        "decoder": dec,
        "latents_mean": (
            jnp.zeros((z,), jnp.float32)
            if latents_mean is None
            else jnp.asarray(latents_mean, jnp.float32)
        ),
        "latents_std": (
            jnp.ones((z,), jnp.float32)
            if latents_std is None
            else jnp.asarray(latents_std, jnp.float32)
        ),
    }
