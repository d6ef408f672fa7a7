"""VGGSfM coarse-to-fine point tracker (TPU-native rebuild).

Parity target: the reference's separate VGGSfM tracker checkpoint family —
``vggt/dependency/vggsfm_tracker.py:25-124`` (TrackerPredictor),
``vggt/dependency/track_modules/blocks.py`` (BasicEncoder:25-87,
ShallowEncoder:90-148, EfficientUpdateFormer:155-261, CorrBlock:264-329),
``track_modules/base_track_predictor.py:15-190`` (BaseTrackerPredictor) and
``track_modules/track_refine.py:22-160`` (refine_track). Weights load from
the public ``facebook/VGGSfM`` ``vggsfm_v2_tracker.pt`` via
:func:`convert_vggsfm_tracker`.

Architecture: a coarse stage — BasicEncoder CNN features at stride 4 on
2x-downsampled images, then 6 iterations of correlation-pyramid sampling +
an EfficientUpdateFormer (time attention per track, space attention through
64 virtual tracks) predicting coordinate/feature deltas — followed by a
fine stage that crops a 31x31 patch around each coarse track, runs a
ShallowEncoder on every patch and a small space-attention-free tracker
*inside* the patches.

TPU design notes:
- Functional pytrees + ``*_init``/``*_forward`` pairs like the rest of the
  repo; the refinement loop has a static iteration count and every shape is
  static, so the whole coarse+fine tracker jits into one program.
- The reference extracts patches with ``Tensor.unfold`` (materializing an
  (B·S)·3·H·W·31·31 view) and indexes it; here the patch crop is one
  advanced-indexing gather of shape (B·S, N, 3, P, P) — no unfold blow-up,
  and XLA lowers it to a single dynamic-gather.
- The per-iteration correlation is an einsum over the feature pyramid
  (MXU-friendly), shared with the VGGT track head implementation
  (``videogpa_tpu/models/vggt/track.py``).

Quirks preserved for weight parity (all verified against the vendored
torch modules in tests/test_vggsfm_tracker_parity.py):
- AttnBlock/CrossAttnBlock reassign the residual to the *normed* input
  (``modules.py:159-168``) with non-affine eps=1e-6 norms — unlike the VGGT
  track head, whose norms are affine eps=1e-5.
- the fine predictor's transformer_dim padding adds 4 (even) / 5 (odd)
  dummy channels, the coarse one rounds up to a multiple of 4
  (``base_track_predictor.py:44-48``).
- the checkpoint key for virtual tracks is the reference's typo
  ``virual_tracks``.
- patch top-left clamping assumes square images (``track_refine.py:96-98``).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from videogpa_tpu.models.vggt.track import (
    corr_pyramid_sample,
    get_2d_embedding,
    get_2d_sincos_pos_embed,
    sample_features4d,
    _mha,
    _mha_init,
)
from videogpa_tpu.ops import layers as L
from videogpa_tpu.ops.resize import resize_bilinear


# ---------------------------------------------------------------------------
# CNN encoders (reference track_modules/blocks.py + modules.py ResidualBlock)
# ---------------------------------------------------------------------------

def _instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch nn.InstanceNorm2d default: per-sample per-channel over (H, W),
    no affine, biased variance."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(-2, -1), keepdims=True)
    var = jnp.var(xf, axis=(-2, -1), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _residual_block_init(key, in_planes, planes, stride=1, dtype=jnp.float32):
    keys = jax.random.split(key, 3)
    p = {
        "conv1": L.conv2d_init(keys[0], in_planes, planes, 3, dtype=dtype),
        "conv2": L.conv2d_init(keys[1], planes, planes, 3, dtype=dtype),
    }
    if stride != 1:
        p["downsample"] = L.conv2d_init(keys[2], in_planes, planes, 1, dtype=dtype)
    return p


def _residual_block(p, x, stride=1):
    y = jax.nn.relu(_instance_norm(L.conv2d(p["conv1"], x, stride=stride, padding=1)))
    y = jax.nn.relu(_instance_norm(L.conv2d(p["conv2"], y, padding=1)))
    if "downsample" in p:
        x = _instance_norm(L.conv2d(p["downsample"], x, stride=stride))
    return jax.nn.relu(x + y)


def basic_encoder_init(key, input_dim=3, output_dim=128, dtype=jnp.float32):
    """Reference blocks.py:25-64 (stride is a forward-time arg)."""
    keys = iter(jax.random.split(key, 16))
    half = output_dim // 2
    dims = [half, output_dim // 4 * 3, output_dim, output_dim]
    p = {"conv1": L.conv2d_init(next(keys), input_dim, half, 7, dtype=dtype)}
    in_planes = half
    for li, dim in enumerate(dims, start=1):
        stride = 1 if li == 1 else 2
        p[f"layer{li}"] = [
            _residual_block_init(next(keys), in_planes, dim, stride, dtype),
            _residual_block_init(next(keys), dim, dim, 1, dtype),
        ]
        in_planes = dim
    cat_dim = sum(dims)
    p["conv2"] = L.conv2d_init(next(keys), cat_dim, output_dim * 2, 3, dtype=dtype)
    p["conv3"] = L.conv2d_init(next(keys), output_dim * 2, output_dim, 1, dtype=dtype)
    return p


def basic_encoder_forward(p, x, stride=4):
    """x (B, 3, H, W) -> (B, output_dim, H//stride, W//stride)."""
    H, W = x.shape[-2:]
    x = jax.nn.relu(_instance_norm(L.conv2d(p["conv1"], x, stride=2, padding=3)))
    outs = []
    for li in range(1, 5):
        blocks = p[f"layer{li}"]
        x = _residual_block(blocks[0], x, stride=1 if li == 1 else 2)
        x = _residual_block(blocks[1], x)
        outs.append(resize_bilinear(x, (H // stride, W // stride),
                                    align_corners=True))
    x = jax.nn.relu(_instance_norm(
        L.conv2d(p["conv2"], jnp.concatenate(outs, axis=1), padding=1)
    ))
    return L.conv2d(p["conv3"], x)


def shallow_encoder_init(key, input_dim=3, output_dim=32, dtype=jnp.float32):
    """Reference blocks.py:90-130."""
    keys = jax.random.split(key, 4)
    return {
        "conv1": L.conv2d_init(keys[0], input_dim, output_dim, 3, dtype=dtype),
        "layer1": _residual_block_init(keys[1], output_dim, output_dim, 2, dtype),
        "layer2": _residual_block_init(keys[2], output_dim, output_dim, 2, dtype),
        "conv2": L.conv2d_init(keys[3], output_dim, output_dim, 1, dtype=dtype),
    }


def shallow_encoder_forward(p, x, stride=1):
    """x (B, 3, H, W) -> (B, output_dim, H//stride, W//stride)."""
    H, W = x.shape[-2:]
    x = jax.nn.relu(_instance_norm(L.conv2d(p["conv1"], x, stride=2, padding=1)))
    hw = x.shape[-2:]
    tmp = _residual_block(p["layer1"], x, stride=2)
    x = x + resize_bilinear(tmp, hw, align_corners=True)
    tmp = _residual_block(p["layer2"], tmp, stride=2)
    x = x + resize_bilinear(tmp, hw, align_corners=True)
    x = L.conv2d(p["conv2"], x) + x
    return resize_bilinear(x, (H // stride, W // stride), align_corners=True)


# ---------------------------------------------------------------------------
# EfficientUpdateFormer (VGGSfM flavor: no input/output norms, non-affine
# eps=1e-6 block norms — reference blocks.py:155-261, modules.py:133-202)
# ---------------------------------------------------------------------------

def _norm_na(x: jax.Array) -> jax.Array:
    return L.layernorm({}, x, eps=1e-6)


def _sfm_attn_block_init(key, dim, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "attn": _mha_init(k1, dim, dtype),
        "mlp": L.mlp_init(k2, dim, int(dim * 4), dtype=dtype),
    }


def _sfm_attn_block(p, x, num_heads):
    x = _norm_na(x)  # residual branches off the NORMED input
    x = x + _mha(p["attn"], x, x, num_heads)
    return x + L.mlp(p["mlp"], _norm_na(x))


def _sfm_cross_block_init(key, dim, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "norm_context": L.layernorm_init(dim, dtype),
        "attn": _mha_init(k1, dim, dtype),
        "mlp": L.mlp_init(k2, dim, int(dim * 4), dtype=dtype),
    }


def _sfm_cross_block(p, x, context, num_heads):
    x = _norm_na(x)
    ctx = L.layernorm(p["norm_context"], context, eps=1e-5)
    x = x + _mha(p["attn"], x, ctx, num_heads)
    return x + L.mlp(p["mlp"], _norm_na(x))


def sfm_updateformer_init(key, input_dim, hidden_size, output_dim,
                          space_depth=6, time_depth=6, num_virtual=64,
                          dtype=jnp.float32):
    keys = iter(jax.random.split(key, 3 + time_depth + 3 * max(space_depth, 1)))
    p = {
        "input_transform": L.linear_init(next(keys), input_dim, hidden_size,
                                         dtype=dtype),
        "flow_head": L.linear_init(next(keys), hidden_size, output_dim,
                                   dtype=dtype),
        "time_blocks": [_sfm_attn_block_init(next(keys), hidden_size, dtype)
                        for _ in range(time_depth)],
    }
    if space_depth:
        p["virtual_tracks"] = jax.random.normal(
            next(keys), (1, num_virtual, 1, hidden_size), dtype
        )
        p["space_virtual_blocks"] = [
            _sfm_attn_block_init(next(keys), hidden_size, dtype)
            for _ in range(space_depth)
        ]
        p["space_point2virtual_blocks"] = [
            _sfm_cross_block_init(next(keys), hidden_size, dtype)
            for _ in range(space_depth)
        ]
        p["space_virtual2point_blocks"] = [
            _sfm_cross_block_init(next(keys), hidden_size, dtype)
            for _ in range(space_depth)
        ]
    return p


def sfm_updateformer_forward(p, x, num_heads=8, num_virtual=64):
    """x (B, N, T, input_dim) -> (B, N, T, output_dim)."""
    tokens = L.linear(p["input_transform"], x)
    init_tokens = tokens
    B, N0, T, Ch = tokens.shape
    space = "virtual_tracks" in p
    if space:
        virtual = jnp.broadcast_to(p["virtual_tracks"], (B, num_virtual, T, Ch))
        tokens = jnp.concatenate([tokens, virtual], axis=1)
    N = tokens.shape[1]

    n_time = len(p["time_blocks"])
    n_space = len(p.get("space_virtual_blocks", ()))
    j = 0
    for i in range(n_time):
        t_tok = tokens.reshape(B * N, T, Ch)
        t_tok = _sfm_attn_block(p["time_blocks"][i], t_tok, num_heads)
        tokens = t_tok.reshape(B, N, T, Ch)
        if space and i % (n_time // n_space) == 0:
            s_tok = tokens.transpose(0, 2, 1, 3).reshape(B * T, N, Ch)
            pts = s_tok[:, : N - num_virtual]
            vir = s_tok[:, N - num_virtual:]
            vir = _sfm_cross_block(
                p["space_virtual2point_blocks"][j], vir, pts, num_heads
            )
            vir = _sfm_attn_block(p["space_virtual_blocks"][j], vir, num_heads)
            pts = _sfm_cross_block(
                p["space_point2virtual_blocks"][j], pts, vir, num_heads
            )
            s_tok = jnp.concatenate([pts, vir], axis=1)
            tokens = s_tok.reshape(B, T, N, Ch).transpose(0, 2, 1, 3)
            j += 1
    if space:
        tokens = tokens[:, : N - num_virtual]
    tokens = tokens + init_tokens
    return L.linear(p["flow_head"], tokens)


# ---------------------------------------------------------------------------
# BaseTrackerPredictor (reference base_track_predictor.py:15-190)
# ---------------------------------------------------------------------------

def transformer_dim_for(corr_levels, corr_radius, latent_dim, fine):
    dim = corr_levels * (corr_radius * 2 + 1) ** 2 + latent_dim * 2
    if fine:
        return dim + (4 if dim % 2 == 0 else 5)
    return dim + (4 - dim % 4) % 4


def base_tracker_init(key, stride=4, corr_levels=5, corr_radius=4,
                      latent_dim=128, hidden_size=384, use_spaceatt=True,
                      depth=6, fine=False, dtype=jnp.float32):
    keys = jax.random.split(key, 4)
    tdim = transformer_dim_for(corr_levels, corr_radius, latent_dim, fine)
    p = {
        "updateformer": sfm_updateformer_init(
            keys[0], tdim, hidden_size, latent_dim + 2,
            space_depth=depth if use_spaceatt else 0, time_depth=depth,
            dtype=dtype,
        ),
        "norm": L.layernorm_init(latent_dim, dtype),  # GroupNorm(1, C) == LN
        "ffeat_updater": L.linear_init(keys[1], latent_dim, latent_dim,
                                       dtype=dtype),
    }
    if not fine:
        p["vis_predictor"] = L.linear_init(keys[2], latent_dim, 1, dtype=dtype)
    return p


def base_tracker_forward(
    p, query_points: jax.Array, fmaps: jax.Array, iters: int = 4,
    stride: int = 4, corr_levels: int = 5, corr_radius: int = 4,
    latent_dim: int = 128, fine: bool = False, down_ratio: int = 1,
    return_feat: bool = False,
):
    """query_points (B, N, 2) image-scale xy; fmaps (B, S, C, HH, WW).

    Returns (coord_preds list, vis or None[, track_feats, query_feat])."""
    B, N, _ = query_points.shape
    _, S, C, HH, WW = fmaps.shape
    tdim = transformer_dim_for(corr_levels, corr_radius, latent_dim, fine)

    qp = query_points / float(down_ratio) / float(stride)
    coords = jnp.broadcast_to(qp[:, None], (B, S, N, 2))
    query_feat = sample_features4d(fmaps[:, 0], coords[:, 0])  # (B, N, C)
    track_feats = jnp.broadcast_to(query_feat[:, None], (B, S, N, latent_dim))
    coords0 = coords

    pos_map = get_2d_sincos_pos_embed(tdim, (HH, WW))
    sampled_pos = sample_features4d(
        jnp.broadcast_to(pos_map, (B,) + pos_map.shape[1:]), coords[:, 0]
    ).reshape(B * N, 1, tdim)

    def step(carry, _):
        coords, track_feats = carry
        coords = jax.lax.stop_gradient(coords)
        fcorrs = corr_pyramid_sample(
            fmaps, track_feats, coords, corr_levels, corr_radius
        )
        fcorrs_ = fcorrs.transpose(0, 2, 1, 3).reshape(B * N, S, -1)
        flows = (coords - coords[:, 0:1]).transpose(0, 2, 1, 3).reshape(
            B * N, S, 2
        )
        flows_emb = get_2d_embedding(flows, latent_dim // 2, cat_coords=False)
        flows_emb = jnp.concatenate([flows_emb, flows], axis=-1)
        tf = track_feats.transpose(0, 2, 1, 3).reshape(B * N, S, latent_dim)
        x = jnp.concatenate([flows_emb, fcorrs_, tf], axis=-1)
        pad = tdim - x.shape[-1]
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1
            )
        x = (x + sampled_pos).reshape(B, N, S, tdim)

        delta = sfm_updateformer_forward(p["updateformer"], x)
        delta = delta.reshape(B * N, S, latent_dim + 2)
        d_coords = delta[:, :, :2]
        d_feats = delta[:, :, 2:].reshape(B * N * S, latent_dim)

        upd = jax.nn.gelu(
            L.linear(p["ffeat_updater"], L.layernorm(p["norm"], d_feats)),
            approximate=False,
        )
        tf_flat = upd + tf.reshape(B * N * S, latent_dim)
        track_feats = tf_flat.reshape(B, N, S, latent_dim).transpose(0, 2, 1, 3)

        coords = coords + d_coords.reshape(B, N, S, 2).transpose(0, 2, 1, 3)
        coords = coords.at[:, 0].set(coords0[:, 0])
        return (coords, track_feats), coords * stride * down_ratio

    # identical weights every iteration -> lax.scan compiles the update
    # body once instead of unrolling `iters` copies of the updateformer
    (coords, track_feats), preds = jax.lax.scan(
        step, (coords, track_feats), None, length=iters
    )
    coord_preds: List[jax.Array] = [preds[i] for i in range(iters)]

    vis = None
    if not fine:
        vis = jax.nn.sigmoid(
            L.linear(p["vis_predictor"],
                     track_feats.reshape(B * S * N, latent_dim)).reshape(B, S, N)
        )
    if return_feat:
        return coord_preds, vis, track_feats, query_feat
    return coord_preds, vis


# ---------------------------------------------------------------------------
# Fine refinement (reference track_refine.py:22-160)
# ---------------------------------------------------------------------------

def extract_patches(images: jax.Array, topleft: jax.Array, psize: int):
    """images (BS, 3, H, W); topleft (BS, N, 2) int xy -> (BS, N, 3, P, P).

    One gather instead of the reference's unfold+index
    (track_refine.py:73-107)."""
    BS, _, H, W = images.shape
    N = topleft.shape[1]
    ar = jnp.arange(psize)
    yy = topleft[..., 1][..., None] + ar  # (BS, N, P)
    xx = topleft[..., 0][..., None] + ar
    b = jnp.arange(BS)[:, None, None, None]
    # advanced indexing: result (BS, N, P, P, 3) with channel moved last
    patches = images[b, :, yy[:, :, :, None], xx[:, :, None, :]]
    return patches.transpose(0, 1, 4, 2, 3)


def refine_track(
    images: jax.Array, fine_fnet_params, fine_tracker_params,
    coarse_pred: jax.Array, pradius: int = 15, fine_iters: int = 6,
):
    """images (B, S, 3, H, W) in [0, 1]; coarse_pred (B, S, N, 2).

    Returns refined tracks (B, S, N, 2). The reference's compute_score branch
    is marked NOT USED upstream (track_refine.py:299) and is omitted."""
    B, S, N, _ = coarse_pred.shape
    H, W = images.shape[-2:]
    psize = pradius * 2 + 1

    query_points = coarse_pred[:, 0]
    track_int = jnp.floor(coarse_pred).astype(jnp.int32)
    track_frac = coarse_pred - track_int
    topleft_bsn = track_int - pradius
    # NOTE: clamp assumes H == W like the reference (track_refine.py:96-98)
    topleft = jnp.clip(topleft_bsn, 0, H - psize).reshape(B * S, N, 2)

    patches = extract_patches(images.reshape(B * S, 3, H, W), topleft, psize)
    patch_feat = shallow_encoder_forward(
        fine_fnet_params, patches.reshape(B * S * N, 3, psize, psize), stride=1
    )
    C_out = patch_feat.shape[1]
    patch_feat = patch_feat.reshape(B, S, N, C_out, psize, psize)
    patch_feat = patch_feat.transpose(0, 2, 1, 3, 4, 5).reshape(
        B * N, S, C_out, psize, psize
    )

    patch_query = (track_frac[:, 0] + pradius).reshape(B * N, 1, 2)
    preds, _vis = base_tracker_forward(
        fine_tracker_params, patch_query, patch_feat, iters=fine_iters,
        stride=1, corr_levels=3, corr_radius=3, latent_dim=C_out, fine=True,
    )
    fine_level = preds[-1].reshape(B, N, S, 2).transpose(0, 2, 1, 3)
    refined = fine_level + topleft_bsn
    return refined.at[:, 0].set(query_points)


# ---------------------------------------------------------------------------
# Full TrackerPredictor (reference vggsfm_tracker.py:25-124)
# ---------------------------------------------------------------------------

def vggsfm_tracker_init(key, dtype=jnp.float32):
    keys = jax.random.split(key, 4)
    return {
        "coarse_fnet": basic_encoder_init(keys[0], dtype=dtype),
        "coarse_predictor": base_tracker_init(keys[1], dtype=dtype),
        "fine_fnet": shallow_encoder_init(keys[2], dtype=dtype),
        "fine_predictor": base_tracker_init(
            keys[3], stride=1, depth=4, corr_levels=3, corr_radius=3,
            latent_dim=32, hidden_size=256, fine=True, use_spaceatt=False,
            dtype=dtype,
        ),
    }


def process_images_to_fmaps(params, images: jax.Array) -> jax.Array:
    """(S, 3, H, W) -> coarse feature maps (S, 128, H//8, W//8); the images
    are 2x-downsampled first (coarse_down_ratio, vggsfm_tracker.py:106-124)."""
    H, W = images.shape[-2:]
    down = resize_bilinear(images, (H // 2, W // 2), align_corners=True)
    return basic_encoder_forward(params["coarse_fnet"], down, stride=4)


def vggsfm_tracker_forward(
    params, images: jax.Array, query_points: jax.Array,
    fmaps: Optional[jax.Array] = None, coarse_iters: int = 6,
    fine_tracking: bool = True, fine_pradius: int = 15,
) -> Tuple[jax.Array, jax.Array, jax.Array, Optional[jax.Array]]:
    """images (B, S, 3, H, W) in [0, 1]; query_points (B, N, 2) xy pixels.

    Returns (fine_pred_track, coarse_pred_track, pred_vis, pred_score) like
    the reference forward (vggsfm_tracker.py:58-104); pred_score is None
    when fine_tracking (compute_score is never used upstream) and all-ones
    otherwise.
    """
    B, S, _, H, W = images.shape
    if fmaps is None:
        fm = process_images_to_fmaps(params, images.reshape(B * S, 3, H, W))
        fmaps = fm.reshape(B, S, *fm.shape[1:])

    coarse_preds, pred_vis = base_tracker_forward(
        params["coarse_predictor"], query_points, fmaps, iters=coarse_iters,
        stride=4, corr_levels=5, corr_radius=4, latent_dim=128, down_ratio=2,
    )
    coarse_pred_track = coarse_preds[-1]

    if fine_tracking:
        fine_pred_track = refine_track(
            images, params["fine_fnet"], params["fine_predictor"],
            coarse_pred_track, pradius=fine_pradius,
        )
        pred_score = None
    else:
        fine_pred_track = coarse_pred_track
        pred_score = jnp.ones_like(pred_vis)
    return fine_pred_track, coarse_pred_track, pred_vis, pred_score


# ---------------------------------------------------------------------------
# Weight conversion (torch vggsfm_v2_tracker.pt state dict -> pytree)
# ---------------------------------------------------------------------------

def _t_conv(sd, name):
    p = {"kernel": jnp.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{name}.bias"])
    return p


def _t_linear(sd, name):
    p = {"kernel": jnp.asarray(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{name}.bias"])
    return p


def _t_norm(sd, name):
    return {
        "scale": jnp.asarray(sd[f"{name}.weight"]),
        "bias": jnp.asarray(sd[f"{name}.bias"]),
    }


def _t_res_block(sd, name):
    p = {"conv1": _t_conv(sd, f"{name}.conv1"),
         "conv2": _t_conv(sd, f"{name}.conv2")}
    if f"{name}.downsample.0.weight" in sd:
        p["downsample"] = _t_conv(sd, f"{name}.downsample.0")
    return p


def _t_mha(sd, name):
    return {
        "in_proj": {
            "kernel": jnp.asarray(sd[f"{name}.in_proj_weight"]).T,
            "bias": jnp.asarray(sd[f"{name}.in_proj_bias"]),
        },
        "out_proj": _t_linear(sd, f"{name}.out_proj"),
    }


def _t_mlp(sd, name):
    return {"fc1": _t_linear(sd, f"{name}.fc1"),
            "fc2": _t_linear(sd, f"{name}.fc2")}


def _t_attn_block(sd, name):
    # norm1/norm2 are non-affine (no params in the checkpoint)
    return {"attn": _t_mha(sd, f"{name}.attn"),
            "mlp": _t_mlp(sd, f"{name}.mlp")}


def _t_cross_block(sd, name):
    return {
        "norm_context": _t_norm(sd, f"{name}.norm_context"),
        "attn": _t_mha(sd, f"{name}.cross_attn"),
        "mlp": _t_mlp(sd, f"{name}.mlp"),
    }


def _t_updateformer(sd, name):
    p = {
        "input_transform": _t_linear(sd, f"{name}.input_transform"),
        "flow_head": _t_linear(sd, f"{name}.flow_head"),
        "time_blocks": [],
    }
    i = 0
    while f"{name}.time_blocks.{i}.attn.in_proj_weight" in sd:
        p["time_blocks"].append(_t_attn_block(sd, f"{name}.time_blocks.{i}"))
        i += 1
    if f"{name}.virual_tracks" in sd:  # reference typo preserved
        p["virtual_tracks"] = jnp.asarray(sd[f"{name}.virual_tracks"])
        for kind, conv in (
            ("space_virtual_blocks", _t_attn_block),
            ("space_point2virtual_blocks", _t_cross_block),
            ("space_virtual2point_blocks", _t_cross_block),
        ):
            p[kind] = []
            i = 0
            while any(k.startswith(f"{name}.{kind}.{i}.") for k in sd):
                p[kind].append(conv(sd, f"{name}.{kind}.{i}"))
                i += 1
    return p


def _t_base_tracker(sd, name, fine):
    p = {
        "updateformer": _t_updateformer(sd, f"{name}.updateformer"),
        "norm": _t_norm(sd, f"{name}.norm"),
        "ffeat_updater": _t_linear(sd, f"{name}.ffeat_updater.0"),
    }
    if not fine:
        p["vis_predictor"] = _t_linear(sd, f"{name}.vis_predictor.0")
    return p


def _t_encoder(sd, name, shallow):
    p = {"conv1": _t_conv(sd, f"{name}.conv1"),
         "conv2": _t_conv(sd, f"{name}.conv2")}
    if shallow:
        p["layer1"] = _t_res_block(sd, f"{name}.layer1")
        p["layer2"] = _t_res_block(sd, f"{name}.layer2")
    else:
        p["conv3"] = _t_conv(sd, f"{name}.conv3")
        for li in range(1, 5):
            p[f"layer{li}"] = [
                _t_res_block(sd, f"{name}.layer{li}.0"),
                _t_res_block(sd, f"{name}.layer{li}.1"),
            ]
    return p


def convert_vggsfm_tracker(state_dict) -> dict:
    """torch ``TrackerPredictor`` state dict -> our pytree.

    Layout documented in videogpa_tpu/convert.py; keys per
    ``vggt/dependency/vggsfm_tracker.py:36-56``."""
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
          for k, v in state_dict.items()}
    return {
        "coarse_fnet": _t_encoder(sd, "coarse_fnet", shallow=False),
        "coarse_predictor": _t_base_tracker(sd, "coarse_predictor", fine=False),
        "fine_fnet": _t_encoder(sd, "fine_fnet", shallow=True),
        "fine_predictor": _t_base_tracker(sd, "fine_predictor", fine=True),
    }
