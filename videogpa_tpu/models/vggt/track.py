"""VGGT track head (CoTracker-style iterative point tracker) in JAX.

Parity target: reference ``vggt/heads/track_head.py`` +
``vggt/heads/track_modules/*``: a DPT feature extractor (feature-only,
down-ratio 2) feeding a BaseTrackerPredictor — correlation pyramid sampling
around current track positions, an EfficientUpdateFormer (time attention over
each track + space attention through 64 virtual tracks) predicting coordinate
deltas and feature updates over 4 refinement iterations, with visibility and
confidence heads.

Quirks preserved for weight parity:
- AttnBlock/CrossAttnBlock apply norm1 *reassigning* the residual branch
  (x = norm1(x); x = x + attn(x)) — reference ``track_modules/modules.py:156-170``
- correlation sampling uses align_corners=True pixel coords with zeros padding
- the cotracker 2D embedding interleaves sin/cos with div_term arange(0,C,2)*1000/C
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from videogpa_tpu.models.vggt.config import VGGTConfig
from videogpa_tpu.models.vggt.heads import dpt_head_forward, dpt_head_init
from videogpa_tpu.ops import layers as L
from videogpa_tpu.ops.resize import grid_sample_bilinear


# ---------------------------------------------------------------------------
# Embeddings / samplers (reference track_modules/utils.py)
# ---------------------------------------------------------------------------

def get_2d_sincos_pos_embed(embed_dim: int, grid_hw: Tuple[int, int]) -> jax.Array:
    """(1, embed_dim, H, W); cotracker layout (x-grid first half)."""
    H, W = grid_hw
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)

    def emb_1d(pos, dim):
        omega = jnp.arange(dim // 2, dtype=jnp.float32) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = pos.reshape(-1)[:, None] * omega[None]
        return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)

    emb = jnp.concatenate(
        [emb_1d(xs, embed_dim // 2), emb_1d(ys, embed_dim // 2)], axis=1
    )
    return emb.reshape(1, H, W, embed_dim).transpose(0, 3, 1, 2)


def get_2d_embedding(xy: jax.Array, C: int, cat_coords: bool = True) -> jax.Array:
    """(B, N, 2) -> (B, N, 2C [+2]); interleaved sin/cos per axis."""
    x = xy[..., 0:1]
    y = xy[..., 1:2]
    div = (jnp.arange(0, C, 2, dtype=jnp.float32) * (1000.0 / C))[None, None]

    def interleave(sin, cos):
        out = jnp.stack([sin, cos], axis=-1)
        return out.reshape(out.shape[:-2] + (C,))

    pe_x = interleave(jnp.sin(x * div), jnp.cos(x * div))
    pe_y = interleave(jnp.sin(y * div), jnp.cos(y * div))
    pe = jnp.concatenate([pe_x, pe_y], axis=-1)
    if cat_coords:
        pe = jnp.concatenate([xy, pe], axis=-1)
    return pe


def _sample_map(img: jax.Array, u: jax.Array, v: jax.Array, padding: str) -> jax.Array:
    """(H, W) sampled at pixel coords, align_corners=True semantics."""
    if padding == "border":
        H, W = img.shape
        u = jnp.clip(u, 0, W - 1)
        v = jnp.clip(v, 0, H - 1)
    return grid_sample_bilinear(img, u, v)


def sample_features4d(fmap: jax.Array, coords: jax.Array,
                      padding: str = "border") -> jax.Array:
    """fmap (B, C, H, W), coords (B, N, 2) xy pixels -> (B, N, C)."""
    def one(fm, xy):
        return jax.vmap(lambda ch: _sample_map(ch, xy[:, 0], xy[:, 1], padding))(fm).T

    return jax.vmap(one)(fmap, coords)


# ---------------------------------------------------------------------------
# Correlation pyramid (reference track_modules/blocks.py CorrBlock)
# ---------------------------------------------------------------------------

def _avg_pool2(x):
    B, C, H, W = x.shape
    x = x[:, :, : H // 2 * 2, : W // 2 * 2]  # floor odd dims (torch avg_pool2d)
    return x.reshape(B, C, H // 2, 2, W // 2, 2).mean(axis=(3, 5))


def corr_pyramid_sample(
    fmaps: jax.Array, targets: jax.Array, coords: jax.Array,
    num_levels: int, radius: int,
) -> jax.Array:
    """fmaps (B, S, C, H, W); targets (B, S, N, C); coords (B, S, N, 2) pixels.

    Returns (B, S, N, num_levels * (2r+1)^2) sampled correlations.
    """
    B, S, C, H, W = fmaps.shape
    r = radius
    k = 2 * r + 1
    dx = jnp.linspace(-r, r, k)
    # Reference window order (vggt/heads/track_modules/blocks.py:174,
    # vggt/dependency/track_modules/blocks.py:293-299): the (dy, dx)
    # meshgrid is added to (x, y) coords, so at window slot (i, j) the
    # sample is (x + lin[i], y + lin[j]) — the x offset varies along the
    # FIRST grid axis. Converted checkpoints expect this flatten order.
    dyx = jnp.stack(jnp.meshgrid(dx, dx, indexing="ij"), axis=-1)  # (k, k, 2)

    out = []
    fm = fmaps
    for lvl in range(num_levels):
        Hc, Wc = fm.shape[-2:]
        corr = jnp.einsum(
            "bsnc,bschw->bsnhw", targets, fm, preferred_element_type=jnp.float32
        ) / math.sqrt(C)
        centers = coords / (2 ** lvl)  # (B, S, N, 2)
        sample_xy = centers[:, :, :, None, None, :] + dyx[None, None, None]
        u = sample_xy[..., 0].reshape(B, S, -1)
        v = sample_xy[..., 1].reshape(B, S, -1)

        def samp(corr_sn, u_sn, v_sn):
            # corr_sn (N, Hc, Wc); u_sn (N*k*k,)
            n = corr_sn.shape[0]
            uu = u_sn.reshape(n, k * k)
            vv = v_sn.reshape(n, k * k)
            return jax.vmap(
                lambda cm, a, b: _sample_map(cm, a, b, "zeros")
            )(corr_sn, uu, vv)  # (N, k*k)

        sampled = jax.vmap(jax.vmap(samp))(corr, u, v)  # (B, S, N, k*k)
        out.append(sampled)
        if lvl + 1 < num_levels:
            fm = _avg_pool2(fm.reshape(B * S, C, Hc, Wc)).reshape(
                B, S, C, Hc // 2, Wc // 2
            )
    return jnp.concatenate(out, axis=-1)


# ---------------------------------------------------------------------------
# Update former
# ---------------------------------------------------------------------------

def _mha_init(key, dim, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "in_proj": L.linear_init(k1, dim, 3 * dim, dtype=dtype),
        "out_proj": L.linear_init(k2, dim, dim, dtype=dtype),
    }


def _mha(p, q_in, kv_in, num_heads):
    D = q_in.shape[-1]
    w = p["in_proj"]["kernel"]
    b = p["in_proj"]["bias"]
    q = q_in @ w[:, :D] + b[:D]
    k = kv_in @ w[:, D : 2 * D] + b[D : 2 * D]
    v = kv_in @ w[:, 2 * D :] + b[2 * D :]

    def heads(x):
        Bn, N, _ = x.shape
        return x.reshape(Bn, N, num_heads, D // num_heads).transpose(0, 2, 1, 3)

    s = jnp.einsum("bhqd,bhkd->bhqk", heads(q), heads(k),
                   preferred_element_type=jnp.float32) * (D // num_heads) ** -0.5
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", a.astype(v.dtype), heads(v))
    Bn, _, N, _ = o.shape
    o = o.transpose(0, 2, 1, 3).reshape(Bn, N, D)
    return L.linear(p["out_proj"], o)


def _attn_block_init(key, dim, dtype):
    keys = jax.random.split(key, 3)
    return {
        "norm1": L.layernorm_init(dim, dtype),
        "norm2": L.layernorm_init(dim, dtype),
        "attn": _mha_init(keys[0], dim, dtype),
        "mlp": L.mlp_init(keys[1], dim, int(dim * 4), dtype=dtype),
    }


def _attn_block(p, x, num_heads):
    # NOTE: reference reassigns x to norm1(x) before the residual
    x = L.layernorm(p["norm1"], x)
    x = x + _mha(p["attn"], x, x, num_heads)
    x = x + L.mlp(p["mlp"], L.layernorm(p["norm2"], x))
    return x


def _cross_block_init(key, dim, dtype):
    keys = jax.random.split(key, 3)
    return {
        "norm1": L.layernorm_init(dim, dtype),
        "norm_context": L.layernorm_init(dim, dtype),
        "norm2": L.layernorm_init(dim, dtype),
        "attn": _mha_init(keys[0], dim, dtype),
        "mlp": L.mlp_init(keys[1], dim, int(dim * 4), dtype=dtype),
    }


def _cross_block(p, x, context, num_heads):
    x = L.layernorm(p["norm1"], x)
    ctx = L.layernorm(p["norm_context"], context)
    x = x + _mha(p["attn"], x, ctx, num_heads)
    x = x + L.mlp(p["mlp"], L.layernorm(p["norm2"], x))
    return x


def updateformer_init(key, input_dim, hidden_size, output_dim,
                      space_depth=6, time_depth=6, num_virtual=64,
                      dtype=jnp.float32):
    keys = iter(jax.random.split(key, 4 + time_depth + 3 * space_depth))
    return {
        "input_norm": L.layernorm_init(input_dim, dtype),
        "input_transform": L.linear_init(next(keys), input_dim, hidden_size, dtype=dtype),
        "output_norm": L.layernorm_init(hidden_size, dtype),
        "flow_head": L.linear_init(next(keys), hidden_size, output_dim, dtype=dtype),
        "virtual_tracks": jax.random.normal(next(keys), (1, num_virtual, 1, hidden_size), dtype),
        "time_blocks": [_attn_block_init(next(keys), hidden_size, dtype) for _ in range(time_depth)],
        "space_virtual_blocks": [_attn_block_init(next(keys), hidden_size, dtype) for _ in range(space_depth)],
        "space_point2virtual_blocks": [_cross_block_init(next(keys), hidden_size, dtype) for _ in range(space_depth)],
        "space_virtual2point_blocks": [_cross_block_init(next(keys), hidden_size, dtype) for _ in range(space_depth)],
    }


def updateformer_forward(p, x, num_heads=8, num_virtual=64):
    """x: (B, N, T, input_dim) -> (B, N, T, output_dim)."""
    x = L.layernorm(p["input_norm"], x)
    tokens = L.linear(p["input_transform"], x)
    init_tokens = tokens
    B, N0, T, Ch = tokens.shape

    virtual = jnp.broadcast_to(p["virtual_tracks"], (B, num_virtual, T, Ch))
    tokens = jnp.concatenate([tokens, virtual], axis=1)
    N = tokens.shape[1]

    n_time = len(p["time_blocks"])
    n_space = len(p["space_virtual_blocks"])
    stride = max(1, n_time // max(n_space, 1))
    j = 0
    for i in range(n_time):
        t_tok = tokens.reshape(B * N, T, Ch)
        t_tok = _attn_block(p["time_blocks"][i], t_tok, num_heads)
        tokens = t_tok.reshape(B, N, T, Ch)
        if n_space and i % stride == 0 and j < n_space:
            s_tok = tokens.transpose(0, 2, 1, 3).reshape(B * T, N, Ch)
            pts = s_tok[:, : N - num_virtual]
            vir = s_tok[:, N - num_virtual :]
            vir = _cross_block(p["space_virtual2point_blocks"][j], vir, pts, num_heads)
            vir = _attn_block(p["space_virtual_blocks"][j], vir, num_heads)
            pts = _cross_block(p["space_point2virtual_blocks"][j], pts, vir, num_heads)
            s_tok = jnp.concatenate([pts, vir], axis=1)
            tokens = s_tok.reshape(B, T, N, Ch).transpose(0, 2, 1, 3)
            j += 1

    tokens = tokens[:, : N - num_virtual] + init_tokens
    tokens = L.layernorm(p["output_norm"], tokens)
    return L.linear(p["flow_head"], tokens)


# ---------------------------------------------------------------------------
# Tracker predictor + head
# ---------------------------------------------------------------------------

def tracker_init(key, latent_dim=128, hidden_size=384, corr_levels=7,
                 corr_radius=4, depth=6, dtype=jnp.float32):
    keys = jax.random.split(key, 8)
    transformer_dim = 3 * latent_dim + 4
    return {
        "corr_mlp": L.mlp_init(
            keys[0], corr_levels * (2 * corr_radius + 1) ** 2, hidden_size,
            latent_dim, dtype=dtype,
        ),
        "query_ref_token": jax.random.normal(keys[1], (1, 2, transformer_dim), dtype),
        "updateformer": updateformer_init(
            keys[2], transformer_dim, hidden_size, latent_dim + 2,
            space_depth=depth, time_depth=depth, dtype=dtype,
        ),
        "fmap_norm": L.layernorm_init(latent_dim, dtype),
        "ffeat_norm": L.layernorm_init(latent_dim, dtype),  # GroupNorm(1) == LN over C
        "ffeat_updater": L.linear_init(keys[3], latent_dim, latent_dim, dtype=dtype),
        "vis_predictor": L.linear_init(keys[4], latent_dim, 1, dtype=dtype),
        "conf_predictor": L.linear_init(keys[5], latent_dim, 1, dtype=dtype),
    }


def tracker_forward(
    params, query_points: jax.Array, fmaps: jax.Array,
    iters: int = 6, stride: int = 2, corr_levels: int = 7, corr_radius: int = 4,  # noqa: E501
    max_scale: float = 518.0, latent_dim: int = 128, down_ratio: int = 1,
):
    """query_points (B, N, 2) full-res pixels; fmaps (B, S, C, HH, WW)."""
    B, N, _ = query_points.shape
    _, S, C, HH, WW = fmaps.shape

    fmaps = L.layernorm(params["fmap_norm"], fmaps.transpose(0, 1, 3, 4, 2))
    fmaps = fmaps.transpose(0, 1, 4, 2, 3)

    qp = query_points / float(down_ratio) / float(stride)
    coords = jnp.broadcast_to(qp[:, None], (B, S, N, 2))
    query_feat = sample_features4d(fmaps[:, 0], coords[:, 0])  # (B, N, C)
    track_feats = jnp.broadcast_to(query_feat[:, None], (B, S, N, latent_dim))
    coords0 = coords

    pos_embed_map = get_2d_sincos_pos_embed(3 * latent_dim + 4, (HH, WW))
    sampled_pos = sample_features4d(
        jnp.broadcast_to(pos_embed_map, (B,) + pos_embed_map.shape[1:]), coords[:, 0]
    )  # (B, N, D)

    coord_preds = []
    for _ in range(iters):
        coords = jax.lax.stop_gradient(coords)
        fcorrs = corr_pyramid_sample(fmaps, track_feats, coords, corr_levels, corr_radius)
        corr_emb = L.mlp(params["corr_mlp"], fcorrs.transpose(0, 2, 1, 3).reshape(
            B * N, S, -1
        ), act=lambda x: jax.nn.gelu(x))

        flows = (coords - coords[:, 0:1]).transpose(0, 2, 1, 3).reshape(B * N, S, 2)
        flows_emb = get_2d_embedding(flows, latent_dim // 2, cat_coords=False)
        flows_emb = jnp.concatenate(
            [flows_emb, flows / max_scale, flows / max_scale], axis=-1
        )
        tf = track_feats.transpose(0, 2, 1, 3).reshape(B * N, S, latent_dim)
        x = jnp.concatenate([flows_emb, corr_emb, tf], axis=-1)
        x = x + sampled_pos.reshape(B * N, 1, -1)

        qr = jnp.concatenate(
            [params["query_ref_token"][:, 0:1],
             jnp.broadcast_to(params["query_ref_token"][:, 1:2], (1, S - 1, x.shape[-1]))],
            axis=1,
        )
        x = x + qr
        x = x.reshape(B, N, S, -1)

        delta = updateformer_forward(params["updateformer"], x)
        delta = delta.reshape(B * N, S, -1)
        d_coords = delta[:, :, :2]
        d_feats = delta[:, :, 2:].reshape(B * N * S, latent_dim)

        tf_flat = tf.reshape(B * N * S, latent_dim)
        upd = jax.nn.gelu(
            L.linear(params["ffeat_updater"], L.layernorm(params["ffeat_norm"], d_feats))
        )
        tf_flat = upd + tf_flat
        track_feats = tf_flat.reshape(B, N, S, latent_dim).transpose(0, 2, 1, 3)

        coords = coords + d_coords.reshape(B, N, S, 2).transpose(0, 2, 1, 3)
        coords = coords.at[:, 0].set(coords0[:, 0])
        coord_preds.append(coords * stride * down_ratio)

    feats_flat = track_feats.reshape(B * S * N, latent_dim)
    vis = jax.nn.sigmoid(
        L.linear(params["vis_predictor"], feats_flat).reshape(B, S, N)
    )
    conf = jax.nn.sigmoid(
        L.linear(params["conf_predictor"], feats_flat).reshape(B, S, N)
    )
    return coord_preds, vis, conf


def track_head_init(key: jax.Array, cfg: VGGTConfig, features: int = 128,
                    dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "feature_extractor": dpt_head_init(
            k1, cfg, output_dim=0, dtype=dtype, features=features, feature_only=True
        ),
        "tracker": tracker_init(k2, latent_dim=features, dtype=dtype),
    }


def track_head_forward(
    params: dict,
    layer_outputs: jax.Array,
    images_hw: Tuple[int, int],
    query_points: jax.Array,
    cfg: VGGTConfig,
    iters: int = 4,
    corr_levels: int = 7,
    corr_radius: int = 4,
):
    """Returns (coord_preds list of (B, S, N, 2), vis (B, S, N), conf).

    corr_levels/corr_radius must match the tracker params' corr pyramid
    (the 1B defaults are 7/4; reduced trackers pass their own)."""
    fmaps = dpt_head_forward(
        params["feature_extractor"], layer_outputs, cfg, images_hw,
        feature_only=True, down_ratio=2, use_pos_embed=False,
    )
    return tracker_forward(
        params["tracker"], query_points, fmaps, iters=iters,
        latent_dim=fmaps.shape[2], corr_levels=corr_levels,
        corr_radius=corr_radius,
    )
