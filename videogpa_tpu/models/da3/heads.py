"""DA3 heads: DualDPT (depth + ray) and CameraDec.

Parity targets: reference ``depth_anything_3/model/dualdpt.py`` (independent
main/aux fusion chains over the same projection pyramid; main = depth+conf
with exp/expp1, aux = 7-channel ray(6)+conf with a LayerNorm in its head) and
``depth_anything_3/model/cam_dec.py`` (MLP -> (t, quat, fov), fov ReLU).

Reuses the VGGT DPT primitives (same ResidualConvUnit/fusion semantics,
including the inplace-ReLU residual quirk).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import functools

import jax
import jax.numpy as jnp

from videogpa_tpu.models.da3.config import DA3Config
from videogpa_tpu.models.vggt.heads import _fusion, _uv_pos_embed
from videogpa_tpu.ops import layers as L
from videogpa_tpu.ops.resize import resize_bilinear


def _fusion_init(keys, f, has_residual, dtype):
    def rcu():
        return {
            "conv1": L.conv2d_init(next(keys), f, f, 3, dtype=dtype),
            "conv2": L.conv2d_init(next(keys), f, f, 3, dtype=dtype),
        }

    p = {"out_conv": L.conv2d_init(next(keys), f, f, 1, dtype=dtype), "rcu2": rcu()}
    if has_residual:
        p["rcu1"] = rcu()
    return p


def dualdpt_init(key: jax.Array, cfg: DA3Config, dtype=jnp.float32) -> dict:
    oc = cfg.dpt_out_channels
    f = cfg.dpt_features
    dim_in = cfg.tokens_dim
    keys = iter(jax.random.split(key, 80))

    aux1 = []
    ch_seq = {5: [(f, f // 2), (f // 2, f), (f, f // 2), (f // 2, f), (f, f // 2)],
              3: [(f, f // 2), (f // 2, f), (f, f // 2)],
              1: [(f, f // 2)]}[cfg.aux_out1_conv_num]
    for _ in range(4):  # aux levels
        aux1.append([L.conv2d_init(next(keys), a, b, 3, dtype=dtype) for a, b in ch_seq])

    return {
        "norm": L.layernorm_init(dim_in, dtype),
        "projects": [L.conv2d_init(next(keys), dim_in, c, 1, dtype=dtype) for c in oc],
        "resize0": L.conv2d_init(next(keys), oc[0], oc[0], 4, dtype=dtype),
        "resize1": L.conv2d_init(next(keys), oc[1], oc[1], 2, dtype=dtype),
        "resize3": L.conv2d_init(next(keys), oc[3], oc[3], 3, dtype=dtype),
        "layer_rn": [L.conv2d_init(next(keys), c, f, 3, bias=False, dtype=dtype) for c in oc],
        "refinenet1": _fusion_init(keys, f, True, dtype),
        "refinenet2": _fusion_init(keys, f, True, dtype),
        "refinenet3": _fusion_init(keys, f, True, dtype),
        "refinenet4": _fusion_init(keys, f, False, dtype),
        "refinenet1_aux": _fusion_init(keys, f, True, dtype),
        "refinenet2_aux": _fusion_init(keys, f, True, dtype),
        "refinenet3_aux": _fusion_init(keys, f, True, dtype),
        "refinenet4_aux": _fusion_init(keys, f, False, dtype),
        "output_conv1": L.conv2d_init(next(keys), f, f // 2, 3, dtype=dtype),
        "output_conv2a": L.conv2d_init(next(keys), f // 2, 32, 3, dtype=dtype),
        "output_conv2b": L.conv2d_init(next(keys), 32, 2, 1, dtype=dtype),
        "output_conv1_aux": aux1,
        "output_conv2a_aux": L.conv2d_init(next(keys), f // 2, 32, 3, dtype=dtype),
        "output_conv2_ln_aux": L.layernorm_init(32, dtype),
        "output_conv2b_aux": L.conv2d_init(next(keys), 32, 7, 1, dtype=dtype),
    }


def dualdpt_forward(
    params: dict,
    feats: List[Tuple[jax.Array, jax.Array]],
    cfg: DA3Config,
    img_hw: Tuple[int, int],
) -> Dict[str, jax.Array]:
    """feats: list of 4 (tokens (B, S, P, 2C), cam) tuples.

    Returns dict depth (B,S,H,W), depth_conf, ray (B,S,H,W,6), ray_conf.
    """
    H, W = img_hw
    ph, pw = H // cfg.patch_size, W // cfg.patch_size
    B, S, P, C2 = feats[0][0].shape

    pyramid = []
    for i in range(4):
        x = feats[i][0].reshape(B * S, P, C2).astype(jnp.float32)
        x = L.layernorm(params["norm"], x)
        x = jnp.transpose(x, (0, 2, 1)).reshape(B * S, C2, ph, pw)
        x = L.conv2d(params["projects"][i], x)
        x = x + _uv_pos_embed(ph, pw, x.shape[1], W, H).astype(x.dtype)
        if i == 0:
            x = L.conv_transpose2d(params["resize0"], x, stride=4)
        elif i == 1:
            x = L.conv_transpose2d(params["resize1"], x, stride=2)
        elif i == 3:
            x = L.conv2d(params["resize3"], x, stride=2, padding=1)
        pyramid.append(x)

    l1, l2, l3, l4 = [
        L.conv2d(params["layer_rn"][i], p, padding=1) for i, p in enumerate(pyramid)
    ]
    # main + aux fusion chains (independent)
    # DA3 fusion blocks use ReLU(inplace=False) — raw-x residual skip
    # (reference model/dpt.py:342-352)
    F = functools.partial(_fusion, inplace_relu=False)
    out = F(params["refinenet4"], l4, size=l3.shape[-2:])
    aux = F(params["refinenet4_aux"], l4, size=l3.shape[-2:])
    out = F(params["refinenet3"], out, l3, size=l2.shape[-2:])
    aux = F(params["refinenet3_aux"], aux, l3, size=l2.shape[-2:])
    out = F(params["refinenet2"], out, l2, size=l1.shape[-2:])
    aux = F(params["refinenet2_aux"], aux, l2, size=l1.shape[-2:])
    out = F(params["refinenet1"], out, l1)
    aux = F(params["refinenet1_aux"], aux, l1)

    out = L.conv2d(params["output_conv1"], out, padding=1)
    for conv in params["output_conv1_aux"][-1]:
        aux = L.conv2d(conv, aux, padding=1)

    h_out, w_out = ph * cfg.patch_size, pw * cfg.patch_size
    out = resize_bilinear(out, (h_out, w_out), align_corners=True)
    out = out + _uv_pos_embed(h_out, w_out, out.shape[1], W, H).astype(out.dtype)
    main = L.conv2d(params["output_conv2b"],
                    jax.nn.relu(L.conv2d(params["output_conv2a"], out, padding=1)))
    fmap = jnp.transpose(main, (0, 2, 3, 1))
    depth = jnp.exp(fmap[..., 0])
    depth_conf = 1 + jnp.exp(fmap[..., 1])

    aux = aux + _uv_pos_embed(aux.shape[-2], aux.shape[-1], aux.shape[1], W, H).astype(aux.dtype)
    a = L.conv2d(params["output_conv2a_aux"], aux, padding=1)
    a = jnp.transpose(a, (0, 2, 3, 1))
    a = L.layernorm(params["output_conv2_ln_aux"], a)
    a = jnp.transpose(a, (0, 3, 1, 2))
    a = L.conv2d(params["output_conv2b_aux"], jax.nn.relu(a))
    fa = jnp.transpose(a, (0, 2, 3, 1))
    ray = fa[..., :6]
    ray_conf = 1 + jnp.exp(fa[..., 6])

    def rs(x):
        return x.reshape(B, S, *x.shape[1:])

    return {
        "depth": rs(depth),
        "depth_conf": rs(depth_conf),
        "ray": rs(ray),
        "ray_conf": rs(ray_conf),
    }


def camera_enc_init(key: jax.Array, dim_out: int = 1024, dtype=jnp.float32) -> dict:
    """CameraEnc (reference ``depth_anything_3/model/cam_enc.py:23-80``):
    GT pose encoding -> MLP -> 4 transformer blocks -> camera tokens."""
    from videogpa_tpu.ops.transformer import BlockConfig, block_init

    keys = jax.random.split(key, 7)
    bcfg = BlockConfig(dim=dim_out, num_heads=16, mlp_ratio=4.0, init_values=0.01)
    return {
        "pose_branch": {
            "fc1": L.linear_init(keys[0], 9, dim_out // 2, dtype=dtype),
            "fc2": L.linear_init(keys[1], dim_out // 2, dim_out, dtype=dtype),
        },
        "token_norm": L.layernorm_init(dim_out, dtype),
        "trunk": L.stack_params(
            [block_init(k, bcfg, dtype) for k in keys[2:6]]
        ),
        "trunk_norm": L.layernorm_init(dim_out, dtype),
    }


def camera_enc_forward(params: dict, ext: jax.Array, ixt: jax.Array,
                       image_hw, attn_impl: str = "auto") -> jax.Array:
    """ext: (B, S, 3/4, 4) w2c; ixt: (B, S, 3, 3) -> (B, S, dim) cam tokens."""
    from videogpa_tpu.geometry import affine_inverse, extri_intri_to_pose_encoding
    from videogpa_tpu.ops.transformer import BlockConfig, block_apply

    if ext.shape[-2] == 3:
        bottom = jnp.broadcast_to(jnp.array([0.0, 0, 0, 1]), ext.shape[:-2] + (1, 4))
        ext = jnp.concatenate([ext, bottom], axis=-2)
    c2w = affine_inverse(ext)[..., :3, :]
    enc = extri_intri_to_pose_encoding(c2w, ixt, image_hw)
    tok = L.mlp(params["pose_branch"], enc)
    tok = L.layernorm(params["token_norm"], tok)
    dim = tok.shape[-1]
    bcfg = BlockConfig(dim=dim, num_heads=16, mlp_ratio=4.0, init_values=0.01)

    def body(x, lp):
        return block_apply(lp, x, bcfg, attn_impl=attn_impl), None

    tok, _ = jax.lax.scan(body, tok, params["trunk"])
    return L.layernorm(params["trunk_norm"], tok)


def camera_dec_init(key: jax.Array, dim_in: int, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 5)
    return {
        "backbone1": L.linear_init(keys[0], dim_in, dim_in, dtype=dtype),
        "backbone2": L.linear_init(keys[1], dim_in, dim_in, dtype=dtype),
        "fc_t": L.linear_init(keys[2], dim_in, 3, dtype=dtype),
        "fc_qvec": L.linear_init(keys[3], dim_in, 4, dtype=dtype),
        "fc_fov": L.linear_init(keys[4], dim_in, 2, dtype=dtype),
    }


def camera_dec_forward(params: dict, feat: jax.Array) -> jax.Array:
    """feat: (B, S, 2C) camera tokens -> (B, S, 9) pose encoding (c2w)."""
    h = jax.nn.relu(L.linear(params["backbone1"], feat))
    h = jax.nn.relu(L.linear(params["backbone2"], h))
    h = h.astype(jnp.float32)
    t = L.linear(params["fc_t"], h)
    q = L.linear(params["fc_qvec"], h)
    fov = jax.nn.relu(L.linear(params["fc_fov"], h))
    return jnp.concatenate([t, q, fov], axis=-1)
