"""Shared ViT transformer block (DINOv2/VGGT/DA3 style).

Pre-LN block with optional QK-norm, LayerScale and 2D RoPE:
    x = x + ls1 * attn(norm1(x));  x = x + ls2 * mlp(norm2(x))
Parity target: reference ``vggt/layers/block.py:27-101`` and
``vggt/layers/attention.py:21-72``. Attention runs through the Pallas flash
kernel on TPU (``videogpa_tpu.ops.attention``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from videogpa_tpu.ops import layers as L
from videogpa_tpu.ops.attention import attention
from videogpa_tpu.ops.rope import rope_2d


@dataclasses.dataclass(frozen=True)
class BlockConfig:
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    proj_bias: bool = True
    ffn_bias: bool = True
    qk_norm: bool = False
    init_values: Optional[float] = None  # LayerScale init; None = no LayerScale
    rope_base: float = 0.0  # 0 = no rope
    norm_eps: float = 1e-5  # DINOv2 backbones use 1e-6
    ffn: str = "mlp"  # "mlp" | "swiglu" (DINOv2-giant uses SwiGLUFFNFused)


def block_init(key: jax.Array, cfg: BlockConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 4)
    head_dim = cfg.dim // cfg.num_heads
    if cfg.ffn == "swiglu":
        ffn_params = L.swiglu_init(
            keys[2], cfg.dim, L.swiglu_hidden(cfg.dim, cfg.mlp_ratio),
            bias=cfg.ffn_bias, dtype=dtype,
        )
    else:
        ffn_params = L.mlp_init(
            keys[2], cfg.dim, int(cfg.dim * cfg.mlp_ratio), bias=cfg.ffn_bias, dtype=dtype
        )
    p = {
        "norm1": L.layernorm_init(cfg.dim, dtype),
        "attn": {
            "qkv": L.linear_init(keys[0], cfg.dim, cfg.dim * 3, cfg.qkv_bias, dtype),
            "proj": L.linear_init(keys[1], cfg.dim, cfg.dim, cfg.proj_bias, dtype),
        },
        "norm2": L.layernorm_init(cfg.dim, dtype),
        "mlp": ffn_params,
    }
    if cfg.qk_norm:
        p["attn"]["q_norm"] = L.layernorm_init(head_dim, dtype)
        p["attn"]["k_norm"] = L.layernorm_init(head_dim, dtype)
    if cfg.init_values is not None:
        p["ls1"] = {"gamma": jnp.full((cfg.dim,), cfg.init_values, dtype)}
        p["ls2"] = {"gamma": jnp.full((cfg.dim,), cfg.init_values, dtype)}
    return p


def self_attention(
    p: dict,
    x: jax.Array,
    cfg: BlockConfig,
    pos: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    attn_layout: str = "bnhd",
) -> jax.Array:
    """x: (B, N, C); pos: optional (B, N, 2) for 2D RoPE.

    attn_layout="bnhd" (default) keeps q/k/v in the projection-natural
    (B, N, H, D) layout into the kernel (``attention(layout="bnhd")``),
    replacing the 5D qkv transpose + per-operand kernel transposes with
    slices + one transpose each. Safe as a default: differentiating
    through the block (e.g. fine-tuning VGGT/DINOv2) routes the backward
    to the bhnd flash vjp (``attention._attention_bnhd_vjp``), so the
    layout win is inference-only but grads stay correct everywhere.
    """
    B, N, C = x.shape
    H = cfg.num_heads
    D = C // H

    if attn_layout == "bnhd":
        qkv = L.linear(p["qkv"], x).reshape(B, N, 3, H, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)
        if "q_norm" in p:
            q = L.layernorm(p["q_norm"], q)
            k = L.layernorm(p["k_norm"], k)
        if pos is not None and cfg.rope_base > 0:
            q = rope_2d(q, pos, cfg.rope_base, layout="bnhd")
            k = rope_2d(k, pos, cfg.rope_base, layout="bnhd")
        o = attention(q, k, v, impl=attn_impl, layout="bnhd").reshape(B, N, C)
        return L.linear(p["proj"], o)

    qkv = L.linear(p["qkv"], x).reshape(B, N, 3, H, D)
    qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # (3, B, H, N, D)
    q, k, v = qkv[0], qkv[1], qkv[2]

    if "q_norm" in p:
        q = L.layernorm(p["q_norm"], q)
        k = L.layernorm(p["k_norm"], k)
    if pos is not None and cfg.rope_base > 0:
        q = rope_2d(q, pos, cfg.rope_base)
        k = rope_2d(k, pos, cfg.rope_base)

    o = attention(q, k, v, impl=attn_impl)
    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(B, N, C)
    return L.linear(p["proj"], o)


def block_apply(
    p: dict,
    x: jax.Array,
    cfg: BlockConfig,
    pos: Optional[jax.Array] = None,
    attn_impl: str = "auto",
) -> jax.Array:
    h = self_attention(
        p["attn"], L.layernorm(p["norm1"], x, eps=cfg.norm_eps), cfg, pos, attn_impl
    )
    if "ls1" in p:
        h = h * p["ls1"]["gamma"].astype(h.dtype)
    x = x + h
    h2 = L.layernorm(p["norm2"], x, eps=cfg.norm_eps)
    h = L.swiglu(p["mlp"], h2) if cfg.ffn == "swiglu" else L.mlp(p["mlp"], h2)
    if "ls2" in p:
        h = h * p["ls2"]["gamma"].astype(h.dtype)
    return x + h
