"""WanModel DiT in JAX.

Rebuild of Wan2.2's WanModel (the denoiser the reference LoRA-trains,
``train/Wan2.2-TI2V-5B/03_train.py:139-160``): per block a non-affine-LN
self-attention with per-block learned modulation (6-way, added to the time
embedding), text cross-attention, gelu-tanh FFN; per-token timesteps for the
TI2V clean-first-frame trick; 3D RoPE with the Wan axis split
(d - 4*(d//6), 2*(d//6), 2*(d//6)) and interleaved complex pairing.

Key naming follows the Wan repo module tree for weight conversion.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from videogpa_tpu.models.wan.config import WanConfig
from videogpa_tpu.ops import layers as L
from videogpa_tpu.ops.attention import attention
from videogpa_tpu.ops.rope import apply_rope_interleaved, rope_3d_freqs
from videogpa_tpu.parallel.sharding import seq_shard as _seq_shard
from videogpa_tpu.train.lora import lora_delta


def sinusoidal_embedding_1d(dim: int, t: jax.Array) -> jax.Array:
    """Wan's 1D sinusoidal embedding: cat(cos, sin) over dim/2 freqs."""
    half = dim // 2
    freqs = jnp.outer(
        t.astype(jnp.float32),
        1.0 / (10000.0 ** (jnp.arange(half, dtype=jnp.float32) / half)),
    )
    return jnp.concatenate([jnp.cos(freqs), jnp.sin(freqs)], axis=-1)


def _block_init(key: jax.Array, cfg: WanConfig, dtype) -> dict:
    d = cfg.dim
    keys = jax.random.split(key, 12)
    return {
        "norm3": L.layernorm_init(d, dtype),  # affine (cross-attn input norm)
        "self_attn": {
            "q": L.linear_init(keys[0], d, d, dtype=dtype),
            "k": L.linear_init(keys[1], d, d, dtype=dtype),
            "v": L.linear_init(keys[2], d, d, dtype=dtype),
            "o": L.linear_init(keys[3], d, d, dtype=dtype),
            "norm_q": {"scale": jnp.ones((d,), dtype)},
            "norm_k": {"scale": jnp.ones((d,), dtype)},
        },
        "cross_attn": {
            "q": L.linear_init(keys[4], d, d, dtype=dtype),
            "k": L.linear_init(keys[5], d, d, dtype=dtype),
            "v": L.linear_init(keys[6], d, d, dtype=dtype),
            "o": L.linear_init(keys[7], d, d, dtype=dtype),
            "norm_q": {"scale": jnp.ones((d,), dtype)},
            "norm_k": {"scale": jnp.ones((d,), dtype)},
        },
        "ffn": {
            "fc1": L.linear_init(keys[8], d, cfg.ffn_dim, dtype=dtype),
            "fc2": L.linear_init(keys[9], cfg.ffn_dim, d, dtype=dtype),
        },
        "modulation": jax.random.normal(keys[10], (1, 6, d), dtype) / d ** 0.5,
    }


def wan_init(key: jax.Array, cfg: WanConfig, dtype=jnp.float32) -> dict:
    d = cfg.dim
    keys = jax.random.split(key, 10)
    pt, ph, pw = cfg.patch_size
    return {
        "patch_embedding": {
            # conv3d patch embed, kernel DHWIO
            "kernel": jax.random.normal(
                keys[0], (pt, ph, pw, cfg.in_channels, d), dtype
            )
            * 0.02,
            "bias": jnp.zeros((d,), dtype),
        },
        "text_embedding": {
            "fc1": L.linear_init(keys[1], cfg.text_dim, d, dtype=dtype),
            "fc2": L.linear_init(keys[2], d, d, dtype=dtype),
        },
        "time_embedding": {
            "fc1": L.linear_init(keys[3], cfg.freq_dim, d, dtype=dtype),
            "fc2": L.linear_init(keys[4], d, d, dtype=dtype),
        },
        "time_projection": L.linear_init(keys[5], d, 6 * d, dtype=dtype),
        "blocks": jax.vmap(lambda k: _block_init(k, cfg, dtype))(
            jnp.stack(jax.random.split(keys[6], cfg.num_layers))
        ),
        "head": {
            "head": L.linear_init(
                keys[7], d, cfg.out_channels * pt * ph * pw, dtype=dtype
            ),
            "modulation": jax.random.normal(keys[8], (1, 2, d), dtype) / d ** 0.5,
        },
    }


def _ln(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Non-affine LayerNorm in f32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _heads(y: jax.Array, H: int) -> jax.Array:
    B, N, C = y.shape
    return jnp.transpose(y.reshape(B, N, H, C // H), (0, 2, 1, 3))


def _self_attention(p, x, cfg, rope, attn_impl, lora=None, lora_scaling=1.0):
    H = cfg.num_heads

    def proj(name):
        y = L.linear(p[name], x)
        lname = {"q": "to_q", "k": "to_k", "v": "to_v"}.get(name)
        if lora is not None and lname in lora:
            y = y + lora_delta(lora, lname, x, lora_scaling)
        return y

    q = L.rmsnorm(p["norm_q"], proj("q"), eps=cfg.eps)
    k = L.rmsnorm(p["norm_k"], proj("k"), eps=cfg.eps)
    v = proj("v")
    q, k, v = _heads(q, H), _heads(k, H), _heads(v, H)
    cos, sin = rope
    q = apply_rope_interleaved(q, cos, sin)
    k = apply_rope_interleaved(k, cos, sin)
    o = attention(q, k, v, impl=attn_impl)
    B, _, N, _ = o.shape
    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(B, N, cfg.dim)
    out = L.linear(p["o"], o)
    if lora is not None and "to_out" in lora:
        out = out + lora_delta(lora, "to_out", o, lora_scaling)
    return out


def _cross_attention(p, x, context, cfg, attn_impl):
    H = cfg.num_heads
    q = L.rmsnorm(p["norm_q"], L.linear(p["q"], x), eps=cfg.eps)
    k = L.rmsnorm(p["norm_k"], L.linear(p["k"], context), eps=cfg.eps)
    v = L.linear(p["v"], context)
    o = attention(_heads(q, H), _heads(k, H), _heads(v, H), impl=attn_impl)
    B, _, N, _ = o.shape
    return L.linear(p["o"], jnp.transpose(o, (0, 2, 1, 3)).reshape(B, N, cfg.dim))


def _block_apply(p, x, e0, context, cfg, rope, attn_impl, lora=None, lora_scaling=1.0):
    """x: (B, L, d); e0: (B, L_or_1, 6, d) per-token modulation."""
    e = (p["modulation"].astype(jnp.float32)[:, None] + e0.astype(jnp.float32))
    e = [e[:, :, i] for i in range(6)]  # each (B, L_or_1, d)

    h = _ln(x, cfg.eps).astype(jnp.float32) * (1 + e[1]) + e[0]
    y = _self_attention(p["self_attn"], h.astype(x.dtype), cfg, rope, attn_impl,
                        lora, lora_scaling)
    x = x + (y.astype(jnp.float32) * e[2]).astype(x.dtype)

    x = x + _cross_attention(
        p["cross_attn"], L.layernorm(p["norm3"], x, eps=cfg.eps), context, cfg, attn_impl
    )

    h = _ln(x, cfg.eps).astype(jnp.float32) * (1 + e[4]) + e[3]
    y = L.linear(
        p["ffn"]["fc2"],
        jax.nn.gelu(L.linear(p["ffn"]["fc1"], h.astype(x.dtype)), approximate=True),
    )
    x = x + (y.astype(jnp.float32) * e[5]).astype(x.dtype)
    return x


def wan_forward(
    params: dict,
    x: jax.Array,
    t: jax.Array,
    context: jax.Array,
    cfg: WanConfig,
    attn_impl: str = "auto",
    remat: bool = False,
    compute_dtype=jnp.bfloat16,
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
) -> jax.Array:
    """WanModel forward.

    Args:
        x: (B, C, F, H, W) noisy latents.
        t: (B,) or (B, L) timesteps (per-token for TI2V).
        context: (B, text_len, text_dim) umT5 features (zero-padded).

    Returns:
        (B, out_channels, F, H, W) velocity prediction.
    """
    B, C, F, H, W = x.shape
    pt, ph, pw = cfg.patch_size
    d = cfg.dim
    grid = (F // pt, H // ph, W // pw)
    Lk = grid[0] * grid[1] * grid[2]

    x = x.astype(compute_dtype)
    # patch embed: conv3d stride=patch
    h = jax.lax.conv_general_dilated(
        x,
        params["patch_embedding"]["kernel"].astype(compute_dtype),
        window_strides=cfg.patch_size,
        padding="VALID",
        dimension_numbers=("NCDHW", "DHWIO", "NCDHW"),
        preferred_element_type=jnp.float32,
    )
    h = (h + params["patch_embedding"]["bias"].astype(jnp.float32)[None, :, None, None, None])
    h = h.astype(compute_dtype)
    h = h.reshape(B, d, Lk).transpose(0, 2, 1)  # (B, L, d)

    # time embedding (f32), optionally per-token
    temb = sinusoidal_embedding_1d(cfg.freq_dim, t.reshape(-1))
    temb = L.linear(params["time_embedding"]["fc1"], temb)
    temb = L.linear(params["time_embedding"]["fc2"], jax.nn.silu(temb))
    e0 = L.linear(params["time_projection"], jax.nn.silu(temb))
    if t.ndim == 2:
        e0 = e0.reshape(B, t.shape[1], 6, d)
        temb = temb.reshape(B, t.shape[1], d)
    else:
        e0 = e0.reshape(B, 1, 6, d)
        temb = temb.reshape(B, 1, d)

    ctx = L.linear(
        params["text_embedding"]["fc2"],
        jax.nn.gelu(
            L.linear(params["text_embedding"]["fc1"], context.astype(compute_dtype)),
            approximate=True,
        ),
    )

    cos, sin = rope_3d_freqs(grid, cfg.head_dim, cfg.rope_theta, cfg.rope_axis_dims)
    rope = (cos, sin)

    def body(carry, xs):
        hh = carry
        if lora is not None:
            layer_params, layer_lora = xs
        else:
            layer_params, layer_lora = xs, None
        hh = _block_apply(
            layer_params, hh, e0, ctx, cfg, rope, attn_impl, layer_lora, lora_scaling
        )
        return _seq_shard(hh), None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    xs = (params["blocks"], lora) if lora is not None else params["blocks"]
    h, _ = jax.lax.scan(body, _seq_shard(h), xs)

    # head: modulated non-affine LN + linear
    he = (
        params["head"]["modulation"].astype(jnp.float32)[:, None]
        + temb[:, :, None].astype(jnp.float32)
    )  # (B, L_or_1, 2, d)
    out = _ln(h, cfg.eps).astype(jnp.float32) * (1 + he[:, :, 1]) + he[:, :, 0]
    out = L.linear(params["head"]["head"], out.astype(compute_dtype))

    # unpatchify: (B, L, pt*ph*pw*C_out) -> (B, C_out, F, H, W)
    out = out.reshape(B, grid[0], grid[1], grid[2], pt, ph, pw, cfg.out_channels)
    out = out.transpose(0, 7, 1, 4, 2, 5, 3, 6).reshape(
        B, cfg.out_channels, F, H, W
    )
    return out.astype(jnp.float32)
