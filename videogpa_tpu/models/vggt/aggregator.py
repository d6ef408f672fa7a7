"""VGGT alternating-attention aggregator (JAX).

Parity target: reference ``vggt/models/aggregator.py:25-331``. Per layer,
tokens pass a *frame* block (attention within each frame, tokens (B*S, P, C))
then a *global* block (attention across all frames, tokens (B, S*P, C)); the
per-layer output is concat([frame_out, global_out]) with 2C channels.

TPU design: the 24 (frame, global) pairs run under one ``lax.scan`` over
stacked params; the two attention shapes are just reshapes of the same buffer,
so no data movement beyond what XLA fuses. RoPE positions are precomputed once
(special tokens get pos 0; patch positions are shifted by +1 —
reference ``aggregator.py:223-228``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from videogpa_tpu.models.vggt.config import VGGTConfig
from videogpa_tpu.models.vggt.vit import dinov2_forward, dinov2_init
from videogpa_tpu.ops import layers as L
from videogpa_tpu.ops.transformer import BlockConfig, block_apply, block_init

_RESNET_MEAN = (0.485, 0.456, 0.406)
_RESNET_STD = (0.229, 0.224, 0.225)


def _agg_block_cfg(cfg: VGGTConfig) -> BlockConfig:
    return BlockConfig(
        dim=cfg.embed_dim,
        num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio,
        qk_norm=cfg.qk_norm,
        init_values=cfg.init_values,
        rope_base=cfg.rope_base,
    )


def aggregator_init(key: jax.Array, cfg: VGGTConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 2 * cfg.depth + 3)
    bcfg = _agg_block_cfg(cfg)
    frame_blocks = [block_init(keys[i], bcfg, dtype) for i in range(cfg.depth)]
    global_blocks = [
        block_init(keys[cfg.depth + i], bcfg, dtype) for i in range(cfg.depth)
    ]
    return {
        "patch_embed": dinov2_init(keys[-1], cfg, dtype),
        "camera_token": jax.random.normal(keys[-2], (1, 2, 1, cfg.embed_dim), dtype)
        * 1e-6,
        "register_token": jax.random.normal(
            keys[-3], (1, 2, cfg.num_register_tokens, cfg.embed_dim), dtype
        )
        * 1e-6,
        "frame_blocks": L.stack_params(frame_blocks),
        "global_blocks": L.stack_params(global_blocks),
    }


def slice_expand_and_flatten(token: jax.Array, B: int, S: int) -> jax.Array:
    """(1, 2, X, C) special tokens -> (B*S, X, C): slot 0 for the first frame,
    slot 1 for the rest (reference ``aggregator.py:308-331``)."""
    query = jnp.broadcast_to(token[:, 0:1], (B, 1) + token.shape[2:])
    others = jnp.broadcast_to(token[:, 1:], (B, S - 1) + token.shape[2:])
    combined = jnp.concatenate([query, others], axis=1)
    return combined.reshape((B * S,) + token.shape[2:])


def aggregator_forward(
    params: dict,
    images: jax.Array,
    cfg: VGGTConfig,
    attn_impl: str = "auto",
    compute_dtype=jnp.float32,
    keep_layers=None,
) -> Tuple[jax.Array, int]:
    """Run the alternating-attention trunk.

    Args:
        images: (B, S, 3, H, W) in [0, 1].

    Returns:
        (tokens_per_layer, patch_start_idx): tokens_per_layer is
        (depth, B, S, P, 2C) — per-layer concat of frame/global outputs.
    """
    B, S, C_in, H, W = images.shape
    mean = jnp.asarray(_RESNET_MEAN, images.dtype).reshape(1, 1, 3, 1, 1)
    std = jnp.asarray(_RESNET_STD, images.dtype).reshape(1, 1, 3, 1, 1)
    images = (images - mean) / std

    flat = images.reshape(B * S, C_in, H, W).astype(compute_dtype)
    patch_tokens = dinov2_forward(params["patch_embed"], flat, cfg, attn_impl)
    _, P_patch, C = patch_tokens.shape

    camera_token = slice_expand_and_flatten(
        params["camera_token"].astype(compute_dtype), B, S
    )
    register_token = slice_expand_and_flatten(
        params["register_token"].astype(compute_dtype), B, S
    )
    tokens = jnp.concatenate([camera_token, register_token, patch_tokens], axis=1)
    P = tokens.shape[1]

    # RoPE positions: patch grid coords + 1; special tokens at 0.
    hg, wg = H // cfg.patch_size, W // cfg.patch_size
    yy = jax.lax.broadcasted_iota(jnp.int32, (hg, wg), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (hg, wg), 1)
    patch_pos = jnp.stack([yy, xx], axis=-1).reshape(1, hg * wg, 2) + 1
    special_pos = jnp.zeros((1, cfg.patch_start_idx, 2), jnp.int32)
    pos = jnp.concatenate([special_pos, jnp.broadcast_to(patch_pos, (1, P_patch, 2))], axis=1)
    pos_frame = jnp.broadcast_to(pos, (B * S, P, 2))
    pos_global = pos_frame.reshape(B, S * P, 2)

    bcfg = _agg_block_cfg(cfg)

    def body(tokens, layer_params):
        fp, gp = layer_params
        # frame attention: (B*S, P, C)
        t = block_apply(fp, tokens, bcfg, pos=pos_frame, attn_impl=attn_impl)
        frame_inter = t
        # global attention: (B, S*P, C)
        t = t.reshape(B, S * P, C)
        t = block_apply(gp, t, bcfg, pos=pos_global, attn_impl=attn_impl)
        global_inter = t.reshape(B * S, P, C)
        out = jnp.concatenate([frame_inter, global_inter], axis=-1)
        return global_inter, out.reshape(B, S, P, 2 * C)

    blocks = (params["frame_blocks"], params["global_blocks"])
    if keep_layers is None:
        _, layer_outputs = jax.lax.scan(body, tokens, blocks)
        return layer_outputs, cfg.patch_start_idx

    # keep only the requested layers: scan the stretches between them and
    # unroll the kept layers, so activation memory is O(len(keep)) instead of
    # O(depth) — the full 24-layer stack is 17 GB at scoring batch 4.
    keep = tuple(sorted(set(keep_layers)))

    def seg_body(t, lp):
        return body(t, lp)[0], None

    outs = []
    t = tokens
    start = 0
    for k in keep:
        if k > start:
            seg = jax.tree.map(lambda a: a[start:k], blocks)
            t, _ = jax.lax.scan(seg_body, t, seg)
        t, out = body(t, jax.tree.map(lambda a: a[k], blocks))
        outs.append(out)
        start = k + 1
    return jnp.stack(outs), cfg.patch_start_idx
