"""T5 encoder in JAX (v1.1 gated-GELU variant + umT5 per-layer bias).

The reference encodes prompts with T5-XXL via diffusers/transformers
(reference ``train/CogVideoX-I2V-5B/02_encode.py:79-98``) and Wan's
umT5-XXL (``train/Wan2.2-TI2V-5B/02_encode.py``). This is a from-scratch
functional implementation: RMSNorm, bias-free projections, unscaled attention
logits with a learned relative-position bucket bias (shared across layers for
T5; per-layer for umT5), gated-GELU FFN.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from videogpa_tpu.convert import t_linear, t_rmsnorm
from videogpa_tpu.ops import layers as L


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    per_layer_relative_bias: bool = False  # umT5: True
    layer_norm_eps: float = 1e-6

    @staticmethod
    def t5_v1_1_xxl() -> "T5Config":
        return T5Config()

    @staticmethod
    def umt5_xxl() -> "T5Config":
        return T5Config(vocab_size=256384, per_layer_relative_bias=True)

    @staticmethod
    def tiny(per_layer_bias: bool = False) -> "T5Config":
        return T5Config(
            vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
            num_heads=4, per_layer_relative_bias=per_layer_bias,
        )


def _layer_init(key: jax.Array, cfg: T5Config, with_bias: bool, dtype) -> dict:
    keys = jax.random.split(key, 8)
    inner = cfg.num_heads * cfg.d_kv
    p = {
        "ln1": {"scale": jnp.ones((cfg.d_model,), dtype)},
        "q": L.linear_init(keys[0], cfg.d_model, inner, bias=False, dtype=dtype),
        "k": L.linear_init(keys[1], cfg.d_model, inner, bias=False, dtype=dtype),
        "v": L.linear_init(keys[2], cfg.d_model, inner, bias=False, dtype=dtype),
        "o": L.linear_init(keys[3], inner, cfg.d_model, bias=False, dtype=dtype),
        "ln2": {"scale": jnp.ones((cfg.d_model,), dtype)},
        "wi_0": L.linear_init(keys[4], cfg.d_model, cfg.d_ff, bias=False, dtype=dtype),
        "wi_1": L.linear_init(keys[5], cfg.d_model, cfg.d_ff, bias=False, dtype=dtype),
        "wo": L.linear_init(keys[6], cfg.d_ff, cfg.d_model, bias=False, dtype=dtype),
    }
    if with_bias:
        p["rel_bias"] = (
            jax.random.normal(
                keys[7], (cfg.relative_attention_num_buckets, cfg.num_heads), dtype
            )
            * 0.02
        )
    return p


def t5_encoder_init(key: jax.Array, cfg: T5Config, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, cfg.num_layers + 2)
    layers = [
        _layer_init(
            keys[i], cfg, with_bias=cfg.per_layer_relative_bias or i == 0, dtype=dtype
        )
        for i in range(cfg.num_layers)
    ]
    return {
        "embed": jax.random.normal(keys[-1], (cfg.vocab_size, cfg.d_model), dtype),
        "layers": layers,  # kept as a list: layer 0 may carry the shared bias
        "final_ln": {"scale": jnp.ones((cfg.d_model,), dtype)},
    }


def _relative_position_bucket(
    rel_pos: jax.Array, num_buckets: int, max_distance: int
) -> jax.Array:
    """Bidirectional T5 bucket function."""
    num_buckets //= 2
    ret = jnp.where(rel_pos > 0, num_buckets, 0)
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def _position_bias(rel_bias: jax.Array, qlen: int, klen: int, cfg: T5Config) -> jax.Array:
    ctx = jax.lax.broadcasted_iota(jnp.int32, (qlen, klen), 0)
    mem = jax.lax.broadcasted_iota(jnp.int32, (qlen, klen), 1)
    buckets = _relative_position_bucket(
        mem - ctx, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
    )
    bias = rel_bias[buckets]  # (q, k, heads)
    return jnp.transpose(bias, (2, 0, 1))[None]  # (1, H, q, k)


def t5_encode(
    params: dict,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    cfg: Optional[T5Config] = None,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """(B, L) int ids -> (B, L, d_model) final hidden states."""
    cfg = cfg or T5Config()
    B, Lq = input_ids.shape
    h = params["embed"][input_ids].astype(compute_dtype)

    mask_bias = None
    if attention_mask is not None:
        mask_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)

    shared_bias = None
    for i, layer in enumerate(params["layers"]):
        if "rel_bias" in layer:
            pos_bias = _position_bias(
                layer["rel_bias"].astype(jnp.float32), Lq, Lq, cfg
            )
            if i == 0:
                shared_bias = pos_bias
        else:
            pos_bias = shared_bias

        x = L.rmsnorm(layer["ln1"], h, eps=cfg.layer_norm_eps)
        H, D = cfg.num_heads, cfg.d_kv

        def heads(y):
            return jnp.transpose(y.reshape(B, Lq, H, D), (0, 2, 1, 3))

        q = heads(L.linear(layer["q"], x))
        k = heads(L.linear(layer["k"], x))
        v = heads(L.linear(layer["v"], x))
        # T5: unscaled logits + additive position bias
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        s = s + pos_bias
        if mask_bias is not None:
            s = s + mask_bias
        a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v, preferred_element_type=jnp.float32)
        o = jnp.transpose(o.astype(compute_dtype), (0, 2, 1, 3)).reshape(B, Lq, H * D)
        h = h + L.linear(layer["o"], o)

        x = L.rmsnorm(layer["ln2"], h, eps=cfg.layer_norm_eps)
        gated = jax.nn.gelu(L.linear(layer["wi_0"], x), approximate=True) * L.linear(
            layer["wi_1"], x
        )
        h = h + L.linear(layer["wo"], gated)

    return L.rmsnorm(params["final_ln"], h, eps=cfg.layer_norm_eps)


def convert_t5_encoder(sd: Mapping[str, np.ndarray], cfg: T5Config) -> dict:
    """transformers T5EncoderModel / UMT5EncoderModel state dict -> params."""
    pfx = "encoder."
    layers = []
    for i in range(cfg.num_layers):
        b = f"{pfx}block.{i}.layer"
        p = {
            "ln1": t_rmsnorm(sd, f"{b}.0.layer_norm"),
            "q": t_linear(sd, f"{b}.0.SelfAttention.q"),
            "k": t_linear(sd, f"{b}.0.SelfAttention.k"),
            "v": t_linear(sd, f"{b}.0.SelfAttention.v"),
            "o": t_linear(sd, f"{b}.0.SelfAttention.o"),
            "ln2": t_rmsnorm(sd, f"{b}.1.layer_norm"),
            "wi_0": t_linear(sd, f"{b}.1.DenseReluDense.wi_0"),
            "wi_1": t_linear(sd, f"{b}.1.DenseReluDense.wi_1"),
            "wo": t_linear(sd, f"{b}.1.DenseReluDense.wo"),
        }
        bias_key = f"{b}.0.SelfAttention.relative_attention_bias.weight"
        if bias_key in sd:
            p["rel_bias"] = jnp.asarray(sd[bias_key])
        layers.append(p)
    embed_key = "shared.weight" if "shared.weight" in sd else f"{pfx}embed_tokens.weight"
    return {
        "embed": jnp.asarray(sd[embed_key]),
        "layers": layers,
        "final_ln": t_rmsnorm(sd, f"{pfx}final_layer_norm"),
    }
