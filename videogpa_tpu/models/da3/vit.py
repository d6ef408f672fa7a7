"""DA3 DINOv2 AA-ViT (alternating local/global attention) in JAX.

Parity target: reference ``depth_anything_3/model/dinov2/vision_transformer.py``
(da3-large config: alt/qknorm/rope start 8):

- layers [0, alt_start): plain DINOv2 blocks, per-frame ("local") attention
- after layer alt_start-1, with S >= 3 views: reference-view selection
  (saddle_balanced over cls-token stats) and view reorder (ref first)
- at layer alt_start the cls slot is overwritten with the camera token
  (slot 0 for the reference view, slot 1 for the rest)
- layers [alt_start, depth): QK-norm + 2D RoPE; odd layers attend globally
  over all views (RoPE positions collapsed to a constant), even layers local
- per out_layer: concat([last_local_out, current_out]) -> 2C channels,
  final norm applied to the global half only; camera token taken pre-norm

TPU design: the uniform pre-phase runs under lax.scan; the alternating phase
is a short unrolled loop (16 blocks) so arbitrary out_layers tap cleanly.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from videogpa_tpu.models.da3.config import DA3Config
from videogpa_tpu.ops import layers as L
from videogpa_tpu.ops.resize import resize_bicubic
from videogpa_tpu.ops.transformer import BlockConfig, block_apply, block_init


def _pre_cfg(cfg: DA3Config) -> BlockConfig:
    return BlockConfig(
        dim=cfg.embed_dim, num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
        init_values=cfg.init_values, qk_norm=False, rope_base=0.0, norm_eps=1e-6,
        ffn=cfg.ffn,
    )


def _alt_cfg(cfg: DA3Config) -> BlockConfig:
    return BlockConfig(
        dim=cfg.embed_dim, num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
        init_values=cfg.init_values, qk_norm=True, rope_base=cfg.rope_base,
        norm_eps=1e-6, ffn=cfg.ffn,
    )


def aavit_init(key: jax.Array, cfg: DA3Config, dtype=jnp.float32) -> dict:
    n_grid = cfg.img_size // cfg.patch_size
    keys = jax.random.split(key, 6)
    pre = [_pre_cfg(cfg)] * cfg.alt_start
    alt_n = cfg.depth - cfg.alt_start
    return {
        "patch_embed": L.conv2d_init(keys[0], 3, cfg.embed_dim, cfg.patch_size, dtype=dtype),
        "cls_token": jnp.zeros((1, 1, cfg.embed_dim), dtype),
        "pos_embed": jax.random.normal(
            keys[1], (1, 1 + n_grid * n_grid, cfg.embed_dim), dtype
        ) * 0.02,
        "camera_token": jax.random.normal(keys[2], (1, 2, cfg.embed_dim), dtype),
        "blocks_pre": jax.vmap(lambda k: block_init(k, _pre_cfg(cfg), dtype))(
            jnp.stack(jax.random.split(keys[3], cfg.alt_start))
        ),
        "blocks_alt": [
            block_init(k, _alt_cfg(cfg), dtype)
            for k in jax.random.split(keys[4], alt_n)
        ],
        "norm": L.layernorm_init(cfg.embed_dim, dtype),
    }


def _interp_pos(pos_embed: jax.Array, hg: int, wg: int) -> jax.Array:
    n = pos_embed.shape[1] - 1
    m = int(round(n ** 0.5))
    if (hg, wg) == (m, m):
        return pos_embed
    cls_pe = pos_embed[:, :1]
    pe = pos_embed[:, 1:].reshape(1, m, m, -1).transpose(0, 3, 1, 2)
    # DA3's DINOv2 keeps interpolate_offset=0.1 (vision_transformer.py:235-242):
    # torch maps source coords with the GIVEN scale factor (g+0.1)/m, not g/m
    pe = resize_bicubic(
        pe.astype(jnp.float32), (hg, wg), antialias=False,
        scale_override=(m / (hg + 0.1), m / (wg + 0.1)),
    )
    pe = pe.transpose(0, 2, 3, 1).reshape(1, hg * wg, -1).astype(pos_embed.dtype)
    return jnp.concatenate([cls_pe, pe], axis=1)


def select_reference_view(
    x: jax.Array, strategy: str = "saddle_balanced"
) -> jax.Array:
    """Reference-view selection over cls tokens; x: (B, S, P, C) -> (B,).

    All four reference strategies
    (``model/reference_view_selector.py:29-110``): ``first``, ``middle``,
    ``saddle_balanced`` (view closest to the median of similarity / norm /
    variance metrics) and ``saddle_sim_range`` (largest max-min similarity
    range)."""
    B, S = x.shape[:2]
    if strategy == "first":
        return jnp.zeros((B,), jnp.int32)
    if strategy == "middle":
        return jnp.full((B,), S // 2, jnp.int32)

    cls = x[:, :, 0].astype(jnp.float32)  # (B, S, C)
    feat = cls / jnp.linalg.norm(cls, axis=-1, keepdims=True)
    sim = jnp.einsum("bsc,btc->bst", feat, feat)
    sim = sim - jnp.eye(S)[None]

    if strategy == "saddle_sim_range":
        sim_range = sim.max(-1) - sim.min(-1)
        return jnp.argmax(sim_range, axis=1)

    if strategy != "saddle_balanced":
        raise ValueError(
            f"unknown ref_view_strategy {strategy!r}; expected one of "
            "first, middle, saddle_balanced, saddle_sim_range"
        )
    sim_score = sim.sum(-1) / (S - 1)
    feat_norm = jnp.linalg.norm(cls, axis=-1)
    feat_var = jnp.var(feat, axis=-1)

    def norm_metric(m):
        mn = m.min(axis=1, keepdims=True)
        mx = m.max(axis=1, keepdims=True)
        return (m - mn) / (mx - mn + 1e-8)

    balance = (
        jnp.abs(norm_metric(sim_score) - 0.5)
        + jnp.abs(norm_metric(feat_norm) - 0.5)
        + jnp.abs(norm_metric(feat_var) - 0.5)
    )
    return jnp.argmin(balance, axis=1)


def _reorder_perm(b_idx: jax.Array, S: int) -> jax.Array:
    """(B,) ref indices -> (B, S) permutation [ref, others in order]."""
    pos = jnp.arange(S)[None]
    key = jnp.where(pos == b_idx[:, None], -1, pos)
    return jnp.argsort(key, axis=1)


def aavit_forward(
    params: dict,
    images: jax.Array,
    cfg: DA3Config,
    cam_token: Optional[jax.Array] = None,
    attn_impl: str = "auto",
) -> List[Tuple[jax.Array, jax.Array]]:
    """images: (B, S, 3, H, W), ImageNet-normalized.

    Returns: per out_layer a tuple (tokens (B, S, P_patch, 2C) with the
    global half final-normed and cls stripped, camera_token (B, S, 2C)).
    """
    B, S, _, H, W = images.shape
    hg, wg = H // cfg.patch_size, W // cfg.patch_size
    C = cfg.embed_dim

    x = L.conv2d(params["patch_embed"], images.reshape(B * S, 3, H, W),
                 stride=cfg.patch_size)
    x = x.reshape(B * S, C, hg * wg).transpose(0, 2, 1)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B * S, 1, C))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _interp_pos(params["pos_embed"], hg, wg).astype(x.dtype)
    P = x.shape[1]

    # RoPE positions: patch coords + 1, cls at 0; global variant collapses
    # patch positions to the constant (1, 1) (reference _prepare_rope).
    yy = jax.lax.broadcasted_iota(jnp.int32, (hg, wg), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (hg, wg), 1)
    ppos = jnp.stack([yy, xx], -1).reshape(1, hg * wg, 2) + 1
    zero = jnp.zeros((1, 1, 2), jnp.int32)
    pos_local = jnp.broadcast_to(
        jnp.concatenate([zero, ppos], axis=1), (B * S, P, 2)
    )
    pos_nodiff = jnp.broadcast_to(
        jnp.concatenate([zero, jnp.ones_like(ppos)], axis=1), (B * S, P, 2)
    ).reshape(B, S * P, 2)

    # phase 1: uniform local blocks under scan
    pre_cfg = _pre_cfg(cfg)

    def pre_body(carry, lp):
        return block_apply(lp, carry, pre_cfg, attn_impl=attn_impl), None

    # reference-view selection statistics are computed on the INPUT of block
    # alt_start-1 (reference vision_transformer.py:314-321 runs the selection
    # at the top of that loop iteration), so the scan stops one block short,
    # selection reads x, and the final pre block runs after. The reorder is
    # applied after the block — a per-frame block commutes with a view
    # permutation, so this matches the reference exactly.
    select = S >= cfg.ref_view_threshold and cam_token is None and cfg.alt_start >= 1
    perm = None
    if select:
        head_blocks = jax.tree.map(lambda a: a[:-1], params["blocks_pre"])
        last_block = jax.tree.map(lambda a: a[-1], params["blocks_pre"])
        x, _ = jax.lax.scan(pre_body, x, head_blocks)
        b_idx = select_reference_view(x.reshape(B, S, P, C), cfg.ref_view_strategy)
        x = block_apply(last_block, x, pre_cfg, attn_impl=attn_impl)
        x = x.reshape(B, S, P, C)
        perm = _reorder_perm(b_idx, S)
        x = jnp.take_along_axis(x, perm[:, :, None, None], axis=1)
    else:
        x, _ = jax.lax.scan(pre_body, x, params["blocks_pre"])
        x = x.reshape(B, S, P, C)

    # camera token into cls slot
    if cam_token is None:
        ct = params["camera_token"].astype(x.dtype)
        cam = jnp.concatenate(
            [jnp.broadcast_to(ct[:, :1], (B, 1, C)),
             jnp.broadcast_to(ct[:, 1:], (B, S - 1, C))], axis=1
        )
    else:
        cam = cam_token.astype(x.dtype)
    # concatenate, not at[].set(): the dynamic-update-slice form can be
    # miscompiled by the SPMD partitioner under a sharded mesh (see
    # tests/test_parallel.py / cogvideox dit rope)
    x = jnp.concatenate([cam[:, :, None], x[:, :, 1:]], axis=2)

    # phase 2: alternating local/global with qk-norm + rope
    alt_cfg = _alt_cfg(cfg)
    local_x = x
    outputs = {}
    for j, lp in enumerate(params["blocks_alt"]):
        i = cfg.alt_start + j
        if i % 2 == 1:  # global
            h = x.reshape(B, S * P, C)
            h = block_apply(lp, h, alt_cfg, pos=pos_nodiff, attn_impl=attn_impl)
            x = h.reshape(B, S, P, C)
        else:  # local
            h = x.reshape(B * S, P, C)
            h = block_apply(lp, h, alt_cfg, pos=pos_local, attn_impl=attn_impl)
            x = h.reshape(B, S, P, C)
            local_x = x
        if i in cfg.out_layers:
            outputs[i] = jnp.concatenate([local_x, x], axis=-1)

    feats = []
    inv_perm = jnp.argsort(perm, axis=1) if perm is not None else None
    for i in cfg.out_layers:
        out = outputs[i]
        if inv_perm is not None:
            out = jnp.take_along_axis(out, inv_perm[:, :, None, None], axis=1)
        cam_tok = out[:, :, 0]  # pre-norm camera token (2C)
        # final norm is a default nn.LayerNorm (eps 1e-5), unlike the blocks'
        # 1e-6 (reference vision_transformer.py:218 vs layers/block.py:49)
        normed = jnp.concatenate(
            [out[..., :C], L.layernorm(params["norm"], out[..., C:])],
            axis=-1,
        )
        feats.append((normed[:, :, 1:], cam_tok))
    return feats
