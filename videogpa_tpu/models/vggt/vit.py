"""DINOv2 vision transformer patch-embed backbone (JAX).

Parity target: reference ``vggt/layers/vision_transformer.py`` (ViT-L/14 with
4 register tokens, LayerScale 1.0, learned pos-embed with bicubic
interpolation). Only the ``x_norm_patchtokens`` output is needed by the
aggregator (reference ``vggt/models/aggregator.py:206-209``).

TPU design: the 24 identical blocks are stacked and folded with ``lax.scan``
(one compiled block body instead of 24 inlined copies).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from videogpa_tpu.models.vggt.config import VGGTConfig
from videogpa_tpu.ops import layers as L
from videogpa_tpu.ops.resize import resize_bicubic
from videogpa_tpu.ops.transformer import BlockConfig, block_apply, block_init


def _block_cfg(cfg: VGGTConfig) -> BlockConfig:
    return BlockConfig(
        dim=cfg.backbone_dim,
        num_heads=cfg.backbone_heads,
        mlp_ratio=4.0,
        init_values=cfg.backbone_init_values,
        qk_norm=False,
        rope_base=0.0,
        norm_eps=1e-6,
    )


def dinov2_init(key: jax.Array, cfg: VGGTConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, cfg.backbone_depth + 4)
    n_grid = cfg.img_size // cfg.patch_size
    n_patches = n_grid * n_grid
    bcfg = _block_cfg(cfg)
    blocks = [block_init(keys[i], bcfg, dtype) for i in range(cfg.backbone_depth)]
    return {
        "patch_embed": L.conv2d_init(
            keys[-1], 3, cfg.backbone_dim, cfg.patch_size, dtype=dtype
        ),
        "cls_token": jnp.zeros((1, 1, cfg.backbone_dim), dtype),
        "register_tokens": jnp.zeros(
            (1, cfg.backbone_register_tokens, cfg.backbone_dim), dtype
        ),
        "pos_embed": jax.random.normal(
            keys[-2], (1, 1 + n_patches, cfg.backbone_dim), dtype
        )
        * 0.02,
        "blocks": L.stack_params(blocks),
        "norm": L.layernorm_init(cfg.backbone_dim, dtype),
    }


def _interpolate_pos_embed(
    pos_embed: jax.Array, h_grid: int, w_grid: int, antialias: bool = True
) -> jax.Array:
    """Resize the learned (1, 1+M*M, C) pos-embed to (1, 1+h*w, C).

    Torch-exact bicubic with antialias (the aggregator builds its DINOv2 with
    ``interpolate_antialias=True`` — reference ``aggregator.py:152-157``).
    """
    n = pos_embed.shape[1] - 1
    m = int(round(n ** 0.5))
    if (h_grid, w_grid) == (m, m):
        return pos_embed
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:].reshape(1, m, m, -1)
    patch_pe = jnp.transpose(patch_pe, (0, 3, 1, 2))
    patch_pe = resize_bicubic(
        patch_pe.astype(jnp.float32), (h_grid, w_grid), antialias=antialias
    ).astype(pos_embed.dtype)
    patch_pe = jnp.transpose(patch_pe, (0, 2, 3, 1))
    return jnp.concatenate(
        [cls_pe, patch_pe.reshape(1, h_grid * w_grid, -1)], axis=1
    )


def dinov2_forward(
    params: dict, images: jax.Array, cfg: VGGTConfig, attn_impl: str = "auto"
) -> jax.Array:
    """images: (B, 3, H, W), already ImageNet-normalized.

    Returns:
        (B, num_patches, C) normed patch tokens.
    """
    B, _, H, W = images.shape
    hg, wg = H // cfg.patch_size, W // cfg.patch_size

    x = L.conv2d(params["patch_embed"], images, stride=cfg.patch_size)  # (B,C,hg,wg)
    x = x.reshape(B, cfg.backbone_dim, hg * wg).transpose(0, 2, 1)

    cls = jnp.broadcast_to(
        params["cls_token"].astype(x.dtype), (B, 1, cfg.backbone_dim)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _interpolate_pos_embed(params["pos_embed"], hg, wg).astype(x.dtype)

    reg = jnp.broadcast_to(
        params["register_tokens"].astype(x.dtype),
        (B, cfg.backbone_register_tokens, cfg.backbone_dim),
    )
    x = jnp.concatenate([x[:, :1], reg, x[:, 1:]], axis=1)

    bcfg = _block_cfg(cfg)

    def body(carry, layer_params):
        return block_apply(layer_params, carry, bcfg, attn_impl=attn_impl), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = L.layernorm(params["norm"], x, eps=1e-6)
    return x[:, 1 + cfg.backbone_register_tokens :]
