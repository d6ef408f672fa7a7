"""CogVideoX DiT (Transformer3D) in JAX.

Architecture matches diffusers' ``CogVideoXTransformer3DModel`` (the model
the reference LoRA-trains, ``train/CogVideoX-I2V-5B/03_train.py:99-109``):

- joint text+video token stream; per-block AdaLN ("LayerNormZero") driven by
  the 512-d time embedding producing shift/scale/gate for both streams
- single fused self-attention over [text ‖ video] with per-head QK LayerNorm
  (eps 1e-6) and 3D RoPE applied to the video tokens only
- gelu-tanh FFN over the concatenated stream
- final LayerNorm + AdaLN + linear unpatchify

TPU design: blocks run under one ``lax.scan`` over stacked params with
optional ``jax.checkpoint`` (remat) for training; attention uses the Pallas
flash kernel. Param names mirror diffusers keys for conversion.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from videogpa_tpu.models.cogvideox.config import CogVideoXConfig
from videogpa_tpu.ops import layers as L
from videogpa_tpu.ops.attention import attention
from videogpa_tpu.ops.rope import rope_3d_freqs, apply_rope_interleaved
from videogpa_tpu.parallel.sharding import seq_shard as _seq_shard
from videogpa_tpu.train.lora import lora_delta


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------

def timestep_embedding(
    timesteps: jax.Array, dim: int, max_period: float = 10000.0
) -> jax.Array:
    """diffusers get_timestep_embedding with flip_sin_to_cos=True, shift=0."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None]
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


def _sincos_1d(dim: int, pos: jax.Array) -> jax.Array:
    omega = jnp.arange(dim // 2, dtype=jnp.float32) / (dim / 2.0)
    omega = 1.0 / (10000.0 ** omega)
    out = pos.reshape(-1)[:, None] * omega[None]
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)


def sincos_pos_embed_3d(
    embed_dim: int, t: int, h: int, w: int,
    spatial_scale: float = 1.875, temporal_scale: float = 1.0,
) -> jax.Array:
    """3D sincos pos-embed, (T*H*W, embed_dim): 3/4 spatial + 1/4 temporal."""
    dim_s = embed_dim // 4 * 3
    dim_t = embed_dim // 4
    ys = jnp.arange(h, dtype=jnp.float32) / spatial_scale
    xs = jnp.arange(w, dtype=jnp.float32) / spatial_scale
    gy = jnp.repeat(ys, w)
    gx = jnp.tile(xs, h)
    # diffusers' MAE-inherited quirk: grid = np.meshgrid(grid_w, grid_h), so
    # "emb_h" = get_1d(grid[0]) actually embeds the W coordinate — the first
    # spatial half is the w-embedding (verified in test_cogvideox_parity)
    spatial = jnp.concatenate(
        [_sincos_1d(dim_s // 2, gx), _sincos_1d(dim_s // 2, gy)], axis=1
    )  # (H*W, dim_s) -- order (w-emb, h-emb)
    ts = jnp.arange(t, dtype=jnp.float32) / temporal_scale
    temporal = _sincos_1d(dim_t, ts)  # (T, dim_t)
    spatial = jnp.tile(spatial[None], (t, 1, 1))
    temporal = jnp.tile(temporal[:, None], (1, h * w, 1))
    return jnp.concatenate([temporal, spatial], axis=-1).reshape(t * h * w, embed_dim)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _block_init(key: jax.Array, cfg: CogVideoXConfig, dtype) -> dict:
    dim = cfg.hidden_dim
    hd = cfg.head_dim
    keys = jax.random.split(key, 10)
    return {
        "norm1": {
            "linear": L.linear_init(keys[0], cfg.time_embed_dim, 6 * dim, dtype=dtype),
            "norm": L.layernorm_init(dim, dtype),
        },
        "attn1": {
            "to_q": L.linear_init(keys[1], dim, dim, dtype=dtype),
            "to_k": L.linear_init(keys[2], dim, dim, dtype=dtype),
            "to_v": L.linear_init(keys[3], dim, dim, dtype=dtype),
            "to_out": L.linear_init(keys[4], dim, dim, dtype=dtype),
            "norm_q": L.layernorm_init(hd, dtype),
            "norm_k": L.layernorm_init(hd, dtype),
        },
        "norm2": {
            "linear": L.linear_init(keys[5], cfg.time_embed_dim, 6 * dim, dtype=dtype),
            "norm": L.layernorm_init(dim, dtype),
        },
        "ff": {
            "fc1": L.linear_init(keys[6], dim, 4 * dim, dtype=dtype),
            "fc2": L.linear_init(keys[7], 4 * dim, dim, dtype=dtype),
        },
    }


def dit_init(key: jax.Array, cfg: CogVideoXConfig, dtype=jnp.float32) -> dict:
    dim = cfg.hidden_dim
    keys = jax.random.split(key, cfg.num_layers + 8)
    p_sz = cfg.patch_size

    if cfg.patch_size_t is None:
        patch_proj = L.conv2d_init(keys[-1], cfg.in_channels, dim, p_sz, dtype=dtype)
    else:
        patch_proj = L.linear_init(
            keys[-1], cfg.in_channels * cfg.patch_size_t * p_sz * p_sz, dim, dtype=dtype
        )

    params = {
        "patch_embed": {
            "proj": patch_proj,
            "text_proj": L.linear_init(keys[-2], cfg.text_embed_dim, dim, dtype=dtype),
        },
        "time_embedding": {
            "linear_1": L.linear_init(keys[-3], dim, cfg.time_embed_dim, dtype=dtype),
            "linear_2": L.linear_init(
                keys[-4], cfg.time_embed_dim, cfg.time_embed_dim, dtype=dtype
            ),
        },
        # vmapped init allocates the stacked layout directly (a python-list
        # stack would transiently hold 2x the 11GB of a 5B model in HBM)
        "blocks": jax.vmap(lambda k: _block_init(k, cfg, dtype))(
            jnp.stack(jax.random.split(keys[0], cfg.num_layers))
        ),
        "norm_final": L.layernorm_init(dim, dtype),
        "norm_out": {
            "linear": L.linear_init(keys[-5], cfg.time_embed_dim, 2 * dim, dtype=dtype),
            "norm": L.layernorm_init(dim, dtype),
        },
        "proj_out": L.linear_init(
            keys[-6],
            dim,
            (cfg.patch_size_t or 1) * p_sz * p_sz * cfg.out_channels,
            dtype=dtype,
        ),
    }
    if cfg.ofs_embed_dim is not None:
        params["ofs_embedding"] = {
            "linear_1": L.linear_init(keys[-7], cfg.ofs_embed_dim, cfg.ofs_embed_dim, dtype=dtype),
            "linear_2": L.linear_init(keys[-8], cfg.ofs_embed_dim, cfg.ofs_embed_dim, dtype=dtype),
        }
    if not cfg.use_rotary_positional_embeddings or cfg.use_learned_positional_embeddings:
        n = cfg.max_text_seq_length + (
            cfg.sample_frames
            * (cfg.sample_height // p_sz)
            * (cfg.sample_width // p_sz)
        )
        pe = jnp.zeros((1, n, dim), dtype)
        img = sincos_pos_embed_3d(
            dim,
            cfg.sample_frames,
            cfg.sample_height // p_sz,
            cfg.sample_width // p_sz,
        ).astype(dtype)
        params["pos_embedding"] = pe.at[0, cfg.max_text_seq_length :].set(img)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _adaln_zero(p: dict, temb: jax.Array, hidden, encoder):
    """CogVideoXLayerNormZero: 6-way AdaLN over both streams."""
    mod = L.linear(p["linear"], jax.nn.silu(temb))  # (B, 6*dim)
    shift, scale, gate, e_shift, e_scale, e_gate = jnp.split(mod, 6, axis=-1)
    h = L.layernorm(p["norm"], hidden) * (1 + scale[:, None]) + shift[:, None]
    e = L.layernorm(p["norm"], encoder) * (1 + e_scale[:, None]) + e_shift[:, None]
    return h, e, gate[:, None], e_gate[:, None]


def _joint_attention(
    p: dict,
    hidden: jax.Array,
    encoder: jax.Array,
    cfg: CogVideoXConfig,
    rope: Optional[Tuple[jax.Array, jax.Array]],
    attn_impl: str,
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
    attn_layout: str = "bhnd",
):
    B, N_img, C = hidden.shape
    N_txt = encoder.shape[1]
    x = jnp.concatenate([encoder, hidden], axis=1)
    H, D = cfg.num_heads, cfg.head_dim

    def proj(name):
        y = L.linear(p[name], x)
        if lora is not None and name in lora:
            y = y + lora_delta(lora, name, x, lora_scaling)
        return y

    if attn_layout == "bnhd":
        # inference fast path: stay in the projection-natural (B, N, H, D)
        # layout all the way into the kernel (attention(layout="bnhd")) —
        # QK-norm is over D (layout-agnostic) and RoPE broadcasts over the
        # heads dim; saves two full-tensor transposes per attention
        def heads(y):
            return y.reshape(B, -1, H, D)
    else:
        def heads(y):
            return jnp.transpose(y.reshape(B, -1, H, D), (0, 2, 1, 3))

    q = heads(proj("to_q"))
    k = heads(proj("to_k"))
    v = heads(proj("to_v"))
    q = L.layernorm(p["norm_q"], q, eps=1e-6)
    k = L.layernorm(p["norm_k"], k, eps=1e-6)

    if rope is not None:
        cos, sin = rope
        # concatenate, NOT at[].set(): the dynamic-update-slice form is
        # miscompiled by the SPMD partitioner under a sharded mesh (silently
        # wrong values, reproduced on the CPU mesh in tests/test_parallel.py)
        if attn_layout == "bnhd":
            cos_b, sin_b = cos[:, None], sin[:, None]  # broadcast over H
            q = jnp.concatenate(
                [q[:, :N_txt],
                 apply_rope_interleaved(q[:, N_txt:], cos_b, sin_b)], axis=1
            )
            k = jnp.concatenate(
                [k[:, :N_txt],
                 apply_rope_interleaved(k[:, N_txt:], cos_b, sin_b)], axis=1
            )
        else:
            q = jnp.concatenate(
                [q[:, :, :N_txt], apply_rope_interleaved(q[:, :, N_txt:], cos, sin)], axis=2
            )
            k = jnp.concatenate(
                [k[:, :, :N_txt], apply_rope_interleaved(k[:, :, N_txt:], cos, sin)], axis=2
            )

    if attn_layout == "bnhd":
        o = attention(q, k, v, impl=attn_impl, layout="bnhd")
        o = o.reshape(B, N_txt + N_img, C)
    else:
        o = attention(q, k, v, impl=attn_impl)
        o = jnp.transpose(o, (0, 2, 1, 3)).reshape(B, N_txt + N_img, C)
    out = L.linear(p["to_out"], o)
    if lora is not None and "to_out" in lora:
        out = out + lora_delta(lora, "to_out", o, lora_scaling)
    return out[:, N_txt:], out[:, :N_txt]


def _block_apply(p, hidden, encoder, temb, cfg, rope, attn_impl,
                 lora=None, lora_scaling=1.0, attn_layout="bhnd"):
    h_n, e_n, gate, e_gate = _adaln_zero(p["norm1"], temb, hidden, encoder)
    attn_h, attn_e = _joint_attention(
        p["attn1"], h_n, e_n, cfg, rope, attn_impl, lora, lora_scaling,
        attn_layout,
    )
    hidden = hidden + gate * attn_h
    encoder = encoder + e_gate * attn_e

    h_n, e_n, gate, e_gate = _adaln_zero(p["norm2"], temb, hidden, encoder)
    x = jnp.concatenate([e_n, h_n], axis=1)
    ff = L.linear(p["ff"]["fc2"], jax.nn.gelu(L.linear(p["ff"]["fc1"], x), approximate=True))
    n_txt = encoder.shape[1]
    hidden = hidden + gate * ff[:, n_txt:]
    encoder = encoder + e_gate * ff[:, :n_txt]
    return hidden, encoder




def dit_forward(
    params: dict,
    hidden_states: jax.Array,
    encoder_hidden_states: jax.Array,
    timestep: jax.Array,
    cfg: CogVideoXConfig,
    ofs: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    compute_dtype=jnp.bfloat16,
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
    attn_layout: str = "bhnd",
) -> jax.Array:
    """CogVideoX DiT forward.

    Args:
        hidden_states: (B, F, C, H, W) latent video (diffusers layout).
        encoder_hidden_states: (B, L, text_embed_dim) T5 features.
        timestep: (B,) int timesteps.
        lora: optional stacked LoRA tree (videogpa_tpu.train.lora) applied to
            the attention projections inside the layer scan.

    Returns:
        (B, F, out_channels, H, W) prediction (v-prediction).
    """
    B, F, C, Hh, Ww = hidden_states.shape
    p = cfg.patch_size
    pt = cfg.patch_size_t
    dim = cfg.hidden_dim

    hidden_states = hidden_states.astype(compute_dtype)
    encoder = L.linear(
        params["patch_embed"]["text_proj"],
        encoder_hidden_states.astype(compute_dtype),
    )

    # 1. time embedding (f32 for stability)
    t_emb = timestep_embedding(timestep, dim)
    temb = L.linear(params["time_embedding"]["linear_1"], t_emb)
    temb = L.linear(params["time_embedding"]["linear_2"], jax.nn.silu(temb))
    if ofs is not None and "ofs_embedding" in params:
        o_emb = timestep_embedding(ofs, cfg.ofs_embed_dim)
        o_emb = L.linear(params["ofs_embedding"]["linear_1"], o_emb)
        o_emb = L.linear(params["ofs_embedding"]["linear_2"], jax.nn.silu(o_emb))
        temb = temb + o_emb
    temb = temb.astype(compute_dtype)

    # 2. patchify
    if pt is None:
        x = hidden_states.reshape(B * F, C, Hh, Ww)
        x = L.conv2d(params["patch_embed"]["proj"], x, stride=p)  # (BF, dim, H/p, W/p)
        x = x.reshape(B, F, dim, -1).transpose(0, 1, 3, 2).reshape(B, -1, dim)
        grid_t, grid_h, grid_w = F, Hh // p, Ww // p
    else:
        grid_t, grid_h, grid_w = F // pt, Hh // p, Ww // p
        x = hidden_states.reshape(B, grid_t, pt, C, grid_h, p, grid_w, p)
        x = x.transpose(0, 1, 4, 6, 2, 3, 5, 7).reshape(
            B, grid_t * grid_h * grid_w, pt * C * p * p
        )
        x = L.linear(params["patch_embed"]["proj"], x)

    if "pos_embedding" in params:
        n_txt = cfg.max_text_seq_length
        pe = params["pos_embedding"].astype(compute_dtype)
        joint = jnp.concatenate([encoder, x], axis=1)
        joint = joint + pe[:, : joint.shape[1]]
        encoder, x = joint[:, :n_txt], joint[:, n_txt:]

    rope = None
    if cfg.use_rotary_positional_embeddings:
        cos, sin = rope_3d_freqs((grid_t, grid_h, grid_w), cfg.head_dim, cfg.rope_theta)
        rope = (cos, sin)

    # 3. transformer blocks under scan (+ optional remat)
    def body(carry, xs):
        h, e = carry
        if lora is not None:
            layer_params, layer_lora = xs
        else:
            layer_params, layer_lora = xs, None
        h, e = _block_apply(
            layer_params, h, e, temb, cfg, rope, attn_impl, layer_lora,
            lora_scaling, attn_layout
        )
        return (_seq_shard(h), _seq_shard(e)), None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    xs = (params["blocks"], lora) if lora is not None else params["blocks"]
    (x, encoder), _ = jax.lax.scan(body, (_seq_shard(x), _seq_shard(encoder)), xs)

    # 4. output head
    joint = jnp.concatenate([encoder, x], axis=1)
    joint = L.layernorm(params["norm_final"], joint)
    x = joint[:, encoder.shape[1] :]

    mod = L.linear(params["norm_out"]["linear"], jax.nn.silu(temb))
    shift, scale = jnp.split(mod, 2, axis=-1)
    x = L.layernorm(params["norm_out"]["norm"], x) * (1 + scale[:, None]) + shift[:, None]
    x = L.linear(params["proj_out"], x)

    # 5. unpatchify
    if pt is None:
        x = x.reshape(B, F, grid_h, grid_w, cfg.out_channels, p, p)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6).reshape(
            B, F, cfg.out_channels, grid_h * p, grid_w * p
        )
    else:
        x = x.reshape(B, grid_t, grid_h, grid_w, pt, cfg.out_channels, p, p)
        x = x.transpose(0, 1, 4, 5, 2, 6, 3, 7).reshape(
            B, F, cfg.out_channels, grid_h * p, grid_w * p
        )
    return x.astype(jnp.float32)
