"""Wan2.2 VAE in JAX: z=48, compression (4, 16, 16).

The reference treats this VAE as an external dependency (``Wan2_2_VAE`` from
the sibling Wan2.2 checkout, ``train/Wan2.2-TI2V-5B/02_encode.py``) — it is
not vendored there either. This is a causal 3D VAE with the Wan2.2 operating
point: 16x spatial / 4x temporal compression to 48 latent channels, per-
channel latent mean/std normalization (``latents_mean``/``latents_std``).

Shares the causal-conv/groupnorm/resnet primitives with the CogVideoX VAE
(``videogpa_tpu.models.cogvideox.vae``); stage layout: 4 spatial down stages
(2x each) of which the middle two also halve time, mirrored in the decoder.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from videogpa_tpu.models.cogvideox.vae import (
    _resnet,
    _resnet_init,
    causal_conv3d,
    conv3d_init,
    groupnorm,
    groupnorm_init,
)
from videogpa_tpu.models.wan.config import WanConfig


def _down_init(key, ch, dtype):
    return conv3d_init(key, ch, ch, 3, dtype=dtype)


def _stage_channels(cfg: WanConfig):
    base = cfg.vae_base_ch
    return [base, base * 2, base * 4, base * 4]


def wan_vae_init(key: jax.Array, cfg: WanConfig, dtype=jnp.float32) -> dict:
    ch = _stage_channels(cfg)
    z = cfg.vae_z_dim
    keys = iter(jax.random.split(key, 100))

    enc = {"conv_in": conv3d_init(next(keys), 3, ch[0], 3, dtype=dtype), "down": []}
    in_ch = ch[0]
    for i, out_ch in enumerate(ch):
        enc["down"].append(
            {
                "resnets": [
                    _resnet_init(next(keys), in_ch if j == 0 else out_ch, out_ch, None, dtype)
                    for j in range(2)
                ],
                "downsample": _down_init(next(keys), out_ch, dtype),
            }
        )
        in_ch = out_ch
    enc["mid"] = {"resnets": [_resnet_init(next(keys), ch[-1], ch[-1], None, dtype) for _ in range(2)]}
    enc["norm_out"] = groupnorm_init(ch[-1], dtype)
    enc["conv_out"] = conv3d_init(next(keys), ch[-1], 2 * z, 3, dtype=dtype)

    rch = ch[::-1]
    dec = {"conv_in": conv3d_init(next(keys), z, rch[0], 3, dtype=dtype), "up": []}
    dec["mid"] = {"resnets": [_resnet_init(next(keys), rch[0], rch[0], None, dtype) for _ in range(2)]}
    in_ch = rch[0]
    for i, out_ch in enumerate(rch):
        dec["up"].append(
            {
                "resnets": [
                    _resnet_init(next(keys), in_ch if j == 0 else out_ch, out_ch, None, dtype)
                    for j in range(2)
                ],
                "upsample": conv3d_init(next(keys), out_ch, out_ch, 3, dtype=dtype),
            }
        )
        in_ch = out_ch
    dec["norm_out"] = groupnorm_init(rch[-1], dtype)
    dec["conv_out"] = conv3d_init(next(keys), rch[-1], 3, 3, dtype=dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "latents_mean": jnp.zeros((z,), dtype),
        "latents_std": jnp.ones((z,), dtype),
    }


def _temporal_down(x):
    """Pair-average over time, first frame kept (1 + 2k pattern)."""
    B, C, T, H, W = x.shape
    first, rest = x[:, :, :1], x[:, :, 1:]
    rest = rest.reshape(B, C, (T - 1) // 2, 2, H, W).mean(axis=3)
    return jnp.concatenate([first, rest], axis=2)


def _spatial_down(x):
    B, C, T, H, W = x.shape
    return x.reshape(B, C, T, H // 2, 2, W // 2, 2).mean(axis=(4, 6))


def _temporal_up(x):
    B, C, T, H, W = x.shape
    first, rest = x[:, :, :1], x[:, :, 1:]
    return jnp.concatenate([first, jnp.repeat(rest, 2, axis=2)], axis=2)


def _spatial_up(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=-2), 2, axis=-1)


# stages that also compress/expand time (2 of 4 -> temporal 4x)
_TIME_STAGES_ENC = (1, 2)
_TIME_STAGES_DEC = (1, 2)


def wan_vae_encode(
    params: dict,
    video: jax.Array,
    cfg: WanConfig,
    key: Optional[jax.Array] = None,
    sample: bool = True,
) -> jax.Array:
    """(B, 3, T, H, W) in [-1,1], T = 4k+1 -> normalized latents
    (B, z, T', H/16, W/16)."""
    enc = params["encoder"]
    h = causal_conv3d(enc["conv_in"], video)
    for i, block in enumerate(enc["down"]):
        for rp in block["resnets"]:
            h = _resnet(rp, h, None)
        h = _spatial_down(h)
        if i in _TIME_STAGES_ENC:
            h = _temporal_down(h)
        h = causal_conv3d(block["downsample"], h)
    for rp in enc["mid"]["resnets"]:
        h = _resnet(rp, h, None)
    h = jax.nn.silu(groupnorm(enc["norm_out"], h))
    moments = causal_conv3d(enc["conv_out"], h)
    mean, logvar = jnp.split(moments, 2, axis=1)
    if sample:
        if key is None:
            raise ValueError("sampling the posterior needs a PRNG key")
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mean = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
    lm = params["latents_mean"].reshape(1, -1, 1, 1, 1)
    ls = params["latents_std"].reshape(1, -1, 1, 1, 1)
    return (mean - lm) / ls


def wan_vae_decode(params: dict, latents: jax.Array, cfg: WanConfig) -> jax.Array:
    lm = params["latents_mean"].reshape(1, -1, 1, 1, 1)
    ls = params["latents_std"].reshape(1, -1, 1, 1, 1)
    z = latents * ls + lm
    dec = params["decoder"]
    h = causal_conv3d(dec["conv_in"], z)
    for rp in dec["mid"]["resnets"]:
        h = _resnet(rp, h, None)
    for i, block in enumerate(dec["up"]):
        for rp in block["resnets"]:
            h = _resnet(rp, h, None)
        h = _spatial_up(h)
        if i in _TIME_STAGES_DEC:
            h = _temporal_up(h)
        h = causal_conv3d(block["upsample"], h)
    h = jax.nn.silu(groupnorm(dec["norm_out"], h))
    return causal_conv3d(dec["conv_out"], h)
