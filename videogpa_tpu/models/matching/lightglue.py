"""LightGlue keypoint matcher in JAX.

Rebuild of the LightGlue matcher used by the reference's epipolar metric
(reference ``metrics/epipolar.py:72-139`` via the ``lightglue`` package):
learned-Fourier rotary position encoding over normalized keypoints, 9 layers
of self + symmetric cross attention over the two keypoint sets, and a
dual-softmax log-assignment with per-point matchability. The adaptive
pruning / early-exit inference shortcuts of the original are omitted (full
depth is run — same outputs, simpler graph).

All shapes are static (padded keypoint sets with validity masks) for jit.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videogpa_tpu.convert import t_layernorm, t_linear
from videogpa_tpu.ops import layers as L

_NEG = -1e9


@dataclasses.dataclass(frozen=True)
class LightGlueConfig:
    descriptor_dim: int = 256
    num_heads: int = 4
    n_layers: int = 9
    filter_threshold: float = 0.1


def _ffn_init(key, d, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": L.linear_init(k1, 2 * d, 2 * d, dtype=dtype),
        "ln": L.layernorm_init(2 * d, dtype),
        "fc2": L.linear_init(k2, 2 * d, d, dtype=dtype),
    }


def _layer_init(key, cfg: LightGlueConfig, dtype):
    d = cfg.descriptor_dim
    keys = jax.random.split(key, 8)
    return {
        "self": {
            "Wqkv": L.linear_init(keys[0], d, 3 * d, dtype=dtype),
            "out_proj": L.linear_init(keys[1], d, d, dtype=dtype),
            "ffn": _ffn_init(keys[2], d, dtype),
        },
        "cross": {
            "to_qk": L.linear_init(keys[3], d, d, dtype=dtype),
            "to_v": L.linear_init(keys[4], d, d, dtype=dtype),
            "to_out": L.linear_init(keys[5], d, d, dtype=dtype),
            "ffn": _ffn_init(keys[6], d, dtype),
        },
    }


def lightglue_init(key: jax.Array, cfg: LightGlueConfig = LightGlueConfig(),
                   dtype=jnp.float32) -> dict:
    d = cfg.descriptor_dim
    head_dim = d // cfg.num_heads
    keys = jax.random.split(key, cfg.n_layers + 4)
    return {
        "input_proj": L.linear_init(keys[-1], d, d, dtype=dtype),
        "posenc_Wr": L.linear_init(keys[-2], 2, head_dim // 2, bias=False, dtype=dtype),
        "layers": [_layer_init(keys[i], cfg, dtype) for i in range(cfg.n_layers)],
        "final_proj": L.linear_init(keys[-3], d, d, dtype=dtype),
        "matchability": L.linear_init(keys[-4], d, 1, dtype=dtype),
    }


def _rotary_embed(params, kpts: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(B, K, 2) normalized kpts -> interleaved cos/sin (B, 1, K, head_dim)."""
    proj = L.linear(params["posenc_Wr"], kpts)  # (B, K, hd/2)
    cos = jnp.repeat(jnp.cos(proj), 2, axis=-1)[:, None]
    sin = jnp.repeat(jnp.sin(proj), 2, axis=-1)[:, None]
    return cos, sin


def _rotate_interleaved(x):
    pairs = x.reshape(x.shape[:-1] + (-1, 2))
    return jnp.stack([-pairs[..., 1], pairs[..., 0]], axis=-1).reshape(x.shape)


def _apply_rotary(x, cos, sin):
    return x * cos + _rotate_interleaved(x) * sin


def _heads(x, H):
    B, K, D = x.shape
    return x.reshape(B, K, H, D // H).transpose(0, 2, 1, 3)


def _unheads(x):
    B, H, K, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, K, H * D)


def _masked_attn(q, k, v, mask_k):
    """(B, H, Kq, d) attention with key validity mask (B, Kk)."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask_k[:, None, None, :], s, _NEG)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def _ffn(p, x, msg):
    h = jnp.concatenate([x, msg], axis=-1)
    h = L.layernorm(p["ln"], L.linear(p["fc1"], h))
    return L.linear(p["fc2"], jax.nn.gelu(h))


def _self_block(p, desc, rot, mask, H):
    qkv = L.linear(p["Wqkv"], desc)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    cos, sin = rot
    q = _apply_rotary(_heads(q, H), cos, sin)
    k = _apply_rotary(_heads(k, H), cos, sin)
    msg = L.linear(p["out_proj"], _unheads(_masked_attn(q, k, _heads(v, H), mask)))
    return desc + _ffn(p["ffn"], desc, msg)


def _cross_block(p, desc0, desc1, mask0, mask1, H):
    qk0 = _heads(L.linear(p["to_qk"], desc0), H)
    qk1 = _heads(L.linear(p["to_qk"], desc1), H)
    v0 = _heads(L.linear(p["to_v"], desc0), H)
    v1 = _heads(L.linear(p["to_v"], desc1), H)
    m0 = L.linear(p["to_out"], _unheads(_masked_attn(qk0, qk1, v1, mask1)))
    m1 = L.linear(p["to_out"], _unheads(_masked_attn(qk1, qk0, v0, mask0)))
    desc0 = desc0 + _ffn(p["ffn"], desc0, m0)
    desc1 = desc1 + _ffn(p["ffn"], desc1, m1)
    return desc0, desc1


def normalize_keypoints(kpts: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    H, W = hw
    size = jnp.array([W, H], jnp.float32)
    shift = size / 2
    scale = size.max() / 2
    return (kpts - shift) / scale


def lightglue_match(
    params: dict,
    kpts0: jax.Array, desc0: jax.Array, mask0: jax.Array,
    kpts1: jax.Array, desc1: jax.Array, mask1: jax.Array,
    image_hw: Tuple[int, int],
    cfg: LightGlueConfig = LightGlueConfig(),
):
    """Match two padded keypoint sets.

    Args:
        kpts*: (B, K, 2) pixel coords; desc*: (B, K, D); mask*: (B, K) bool.

    Returns:
        (matches0 (B, K) int index into set 1 or -1, scores0 (B, K)).
    """
    H = cfg.num_heads
    d0 = L.linear(params["input_proj"], desc0)
    d1 = L.linear(params["input_proj"], desc1)
    rot0 = _rotary_embed(params, normalize_keypoints(kpts0, image_hw))
    rot1 = _rotary_embed(params, normalize_keypoints(kpts1, image_hw))

    for layer in params["layers"]:
        d0 = _self_block(layer["self"], d0, rot0, mask0, H)
        d1 = _self_block(layer["self"], d1, rot1, mask1, H)
        d0, d1 = _cross_block(layer["cross"], d0, d1, mask0, mask1, H)

    D = cfg.descriptor_dim
    md0 = L.linear(params["final_proj"], d0) / D ** 0.25
    md1 = L.linear(params["final_proj"], d1) / D ** 0.25
    sim = jnp.einsum("bmd,bnd->bmn", md0, md1, preferred_element_type=jnp.float32)
    sim = jnp.where(mask0[:, :, None] & mask1[:, None, :], sim, _NEG)

    z0 = L.linear(params["matchability"], d0)[..., 0]
    z1 = L.linear(params["matchability"], d1)[..., 0]
    scores = (
        jax.nn.log_softmax(sim, axis=2)
        + jax.nn.log_softmax(sim, axis=1)
        + jax.nn.log_sigmoid(z0)[:, :, None]
        + jax.nn.log_sigmoid(z1)[:, None, :]
    )

    # mutual nearest neighbors above threshold
    idx0 = jnp.argmax(scores, axis=2)  # (B, M)
    idx1 = jnp.argmax(scores, axis=1)  # (B, N)
    m_scores = jnp.exp(jnp.max(scores, axis=2))
    mutual = jnp.take_along_axis(idx1, idx0, axis=1) == jnp.arange(idx0.shape[1])[None]
    ok = mutual & (m_scores > cfg.filter_threshold) & mask0
    matches0 = jnp.where(ok, idx0, -1)
    return matches0, jnp.where(ok, m_scores, 0.0)


def convert_lightglue(sd: Mapping[str, np.ndarray],
                      cfg: LightGlueConfig = LightGlueConfig()) -> dict:
    """Convert the official superpoint_lightglue checkpoint."""
    def ffn(pfx):
        return {
            "fc1": t_linear(sd, f"{pfx}.0"),
            "ln": t_layernorm(sd, f"{pfx}.1"),
            "fc2": t_linear(sd, f"{pfx}.3"),
        }

    layers = []
    for i in range(cfg.n_layers):
        pfx = f"transformers.{i}"
        layers.append({
            "self": {
                "Wqkv": t_linear(sd, f"{pfx}.self_attn.Wqkv"),
                "out_proj": t_linear(sd, f"{pfx}.self_attn.out_proj"),
                "ffn": ffn(f"{pfx}.self_attn.ffn"),
            },
            "cross": {
                "to_qk": t_linear(sd, f"{pfx}.cross_attn.to_qk"),
                "to_v": t_linear(sd, f"{pfx}.cross_attn.to_v"),
                "to_out": t_linear(sd, f"{pfx}.cross_attn.to_out"),
                "ffn": ffn(f"{pfx}.cross_attn.ffn"),
            },
        })
    return {
        "input_proj": t_linear(sd, "input_proj"),
        "posenc_Wr": t_linear(sd, "posenc.Wr"),
        "layers": layers,
        "final_proj": t_linear(sd, f"log_assignment.{cfg.n_layers - 1}.final_proj"),
        "matchability": t_linear(sd, f"log_assignment.{cfg.n_layers - 1}.matchability"),
    }
