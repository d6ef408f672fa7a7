"""CogVideoX 3D-causal VAE in JAX.

Rebuild of diffusers' ``AutoencoderKLCogVideoX`` (frozen encoder/decoder used
for latent prep and video decode — reference
``train/CogVideoX-I2V-5B/02_encode.py:100-119``,
``train/CogVideoX-I2V-5B/03_train.py:94-97``):

- causal 3D convs: temporal pad replicates the FIRST frame (k_t - 1 times),
  spatial pad is zero — so frame t only sees frames <= t
- encoder: conv_in -> 4 down blocks (spatial stride-2 after blocks 0-2;
  temporal pair-average after blocks 0-1, first frame kept) -> mid block ->
  GroupNorm/SiLU -> conv_out (2 x latent channels: mean ‖ logvar)
- decoder: conv_in -> mid -> 4 up blocks (nearest 2x spatial upsample;
  temporal 2x repeat except the first frame), resnet norms are z-conditioned
  spatial norms -> conv_out
- 49 pixel frames <-> 13 latent frames (compression (4, 8, 8), z=16)

All convs run as XLA ``conv_general_dilated`` in NCDHW — these map directly
onto the MXU; bf16 compute with f32 norm statistics.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from videogpa_tpu.models.cogvideox.config import CogVideoXConfig
from videogpa_tpu.ops import layers as L

Params = dict


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------

def conv3d_init(
    key, in_ch: int, out_ch: int, kernel, stride=1, dtype=jnp.float32
) -> Params:
    if isinstance(kernel, int):
        kernel = (kernel, kernel, kernel)
    kw, kb = jax.random.split(key)
    fan_in = in_ch * math.prod(kernel)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(
            kw, kernel + (in_ch, out_ch), dtype, -bound, bound
        ),  # DHWIO
        "bias": jax.random.uniform(kb, (out_ch,), dtype, -bound, bound),
    }


def causal_conv3d(p: Params, x: jax.Array, stride=(1, 1, 1)) -> jax.Array:
    """Causal 3D conv, NCDHW. Temporal pad: replicate first frame; spatial: zeros."""
    kt, kh, kw = p["kernel"].shape[:3]
    t_pad = kt - 1
    h_pad = (kh - 1) // 2
    w_pad = (kw - 1) // 2
    if t_pad:
        first = jnp.repeat(x[:, :, :1], t_pad, axis=2)
        x = jnp.concatenate([first, x], axis=2)
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=stride if isinstance(stride, tuple) else (stride,) * 3,
        padding=((0, 0), (h_pad, h_pad), (w_pad, w_pad)),
        dimension_numbers=("NCDHW", "DHWIO", "NCDHW"),
        preferred_element_type=jnp.float32,
    )
    return (y + p["bias"].astype(jnp.float32)[None, :, None, None, None]).astype(x.dtype)


def groupnorm_init(ch: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}


def groupnorm(p: Params, x: jax.Array, groups: int = 32, eps: float = 1e-6) -> jax.Array:
    """GroupNorm over (B, C, ...) with f32 statistics."""
    B, C = x.shape[:2]
    groups = math.gcd(groups, C)  # real configs have C % 32 == 0; tiny tests don't
    xf = x.astype(jnp.float32).reshape(B, groups, C // groups, -1)
    mean = xf.mean(axis=(2, 3), keepdims=True)
    var = xf.var(axis=(2, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(x.shape)
    shape = (1, C) + (1,) * (x.ndim - 2)
    xf = xf * p["scale"].astype(jnp.float32).reshape(shape) + p["bias"].astype(
        jnp.float32
    ).reshape(shape)
    return xf.astype(x.dtype)


def spatial_norm_init(key, f_ch: int, zq_ch: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "norm": groupnorm_init(f_ch, dtype),
        "conv_y": conv3d_init(k1, zq_ch, f_ch, 1, dtype=dtype),
        "conv_b": conv3d_init(k2, zq_ch, f_ch, 1, dtype=dtype),
    }


def _resize_zq(zq: jax.Array, t: int, h: int, w: int) -> jax.Array:
    """Nearest-resize zq (B,C,T',H',W') to (B,C,t,h,w); first frame separate
    when the temporal sizes follow the 1 + 2k causal pattern."""
    B, C, T0, H0, W0 = zq.shape

    def nearest_spatial(x):
        idx_h = (jnp.arange(h) * x.shape[-2] // h).astype(jnp.int32)
        idx_w = (jnp.arange(w) * x.shape[-1] // w).astype(jnp.int32)
        return x[..., idx_h, :][..., idx_w]

    if T0 != t:
        # split first frame, nearest-repeat the rest (t-1)/(T0-1) times
        first, rest = zq[:, :, :1], zq[:, :, 1:]
        idx_t = (jnp.arange(t - 1) * (T0 - 1) // max(t - 1, 1)).astype(jnp.int32)
        rest = rest[:, :, idx_t]
        zq = jnp.concatenate([first, rest], axis=2)
    return nearest_spatial(zq)


def spatial_norm(p: Params, f: jax.Array, zq: jax.Array) -> jax.Array:
    zq = _resize_zq(zq, *f.shape[2:])
    norm_f = groupnorm(p["norm"], f)
    return norm_f * causal_conv3d(p["conv_y"], zq) + causal_conv3d(p["conv_b"], zq)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _resnet_init(key, in_ch, out_ch, zq_ch: Optional[int], dtype) -> Params:
    keys = jax.random.split(key, 5)
    if zq_ch is None:
        n1 = groupnorm_init(in_ch, dtype)
        n2 = groupnorm_init(out_ch, dtype)
    else:
        n1 = spatial_norm_init(keys[3], in_ch, zq_ch, dtype)
        n2 = spatial_norm_init(keys[4], out_ch, zq_ch, dtype)
    p = {
        "norm1": n1,
        "conv1": conv3d_init(keys[0], in_ch, out_ch, 3, dtype=dtype),
        "norm2": n2,
        "conv2": conv3d_init(keys[1], out_ch, out_ch, 3, dtype=dtype),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = conv3d_init(keys[2], in_ch, out_ch, 1, dtype=dtype)
    return p


def _resnet(p: Params, x: jax.Array, zq: Optional[jax.Array]) -> jax.Array:
    def norm(np_, h):
        return groupnorm(np_, h) if zq is None else spatial_norm(np_, h, zq)

    h = jax.nn.silu(norm(p["norm1"], x))
    h = causal_conv3d(p["conv1"], h)
    h = jax.nn.silu(norm(p["norm2"], h))
    h = causal_conv3d(p["conv2"], h)
    if "conv_shortcut" in p:
        x = causal_conv3d(p["conv_shortcut"], x)
    return x + h


def _downsample_init(key, ch, dtype) -> Params:
    return {"conv": L.conv2d_init(key, ch, ch, 3, dtype=dtype)}


def _downsample(p: Params, x: jax.Array, compress_time: bool) -> jax.Array:
    B, C, T, H, W = x.shape
    if compress_time:
        first, rest = x[:, :, :1], x[:, :, 1:]
        Tr = rest.shape[2]
        rest = rest.reshape(B, C, Tr // 2, 2, H, W).mean(axis=3)
        x = jnp.concatenate([first, rest], axis=2)
        T = x.shape[2]
    # spatial: asymmetric pad (0,1) then stride-2 conv (diffusers Downsample2D pad=0 variant)
    x2 = x.transpose(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
    x2 = jnp.pad(x2, ((0, 0), (0, 0), (0, 1), (0, 1)))
    y = jax.lax.conv_general_dilated(
        x2,
        p["conv"]["kernel"].astype(x2.dtype),
        (2, 2),
        "VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    y = (y + p["conv"]["bias"].astype(jnp.float32)[None, :, None, None]).astype(x.dtype)
    Ho, Wo = y.shape[-2:]
    return y.reshape(B, T, C, Ho, Wo).transpose(0, 2, 1, 3, 4)


def _upsample_init(key, ch, dtype) -> Params:
    return {"conv": L.conv2d_init(key, ch, ch, 3, dtype=dtype)}


def _upsample(p: Params, x: jax.Array, compress_time: bool) -> jax.Array:
    B, C, T, H, W = x.shape
    if compress_time:
        first, rest = x[:, :, :1], x[:, :, 1:]
        rest = jnp.repeat(rest, 2, axis=2)
        x = jnp.concatenate([first, rest], axis=2)
        T = x.shape[2]
    x2 = x.transpose(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
    x2 = jnp.repeat(jnp.repeat(x2, 2, axis=-2), 2, axis=-1)  # nearest 2x
    y = L.conv2d(p["conv"], x2, padding=1)
    return y.reshape(B, T, C, 2 * H, 2 * W).transpose(0, 2, 1, 3, 4)


# ---------------------------------------------------------------------------
# Encoder / Decoder
# ---------------------------------------------------------------------------

def vae_init(key: jax.Array, cfg: CogVideoXConfig, dtype=jnp.float32) -> dict:
    ch = cfg.vae_block_out_channels
    z = cfg.vae_latent_channels
    npb = cfg.vae_layers_per_block
    t_levels = int(math.log2(cfg.temporal_compression_ratio))
    keys = iter(jax.random.split(key, 200))

    # ----- encoder -----
    enc = {"conv_in": conv3d_init(next(keys), 3, ch[0], 3, dtype=dtype), "down": []}
    in_ch = ch[0]
    for i, out_ch in enumerate(ch):
        block = {"resnets": []}
        for j in range(npb):
            block["resnets"].append(
                _resnet_init(next(keys), in_ch if j == 0 else out_ch, out_ch, None, dtype)
            )
        if i < len(ch) - 1:
            block["downsample"] = _downsample_init(next(keys), out_ch, dtype)
        in_ch = out_ch
        enc["down"].append(block)
    enc["mid"] = {
        "resnets": [
            _resnet_init(next(keys), ch[-1], ch[-1], None, dtype) for _ in range(2)
        ]
    }
    enc["norm_out"] = groupnorm_init(ch[-1], dtype)
    enc["conv_out"] = conv3d_init(next(keys), ch[-1], 2 * z, 3, dtype=dtype)

    # ----- decoder -----
    rch = ch[::-1]
    dec = {"conv_in": conv3d_init(next(keys), z, rch[0], 3, dtype=dtype), "up": []}
    dec["mid"] = {
        "resnets": [
            _resnet_init(next(keys), rch[0], rch[0], z, dtype) for _ in range(2)
        ]
    }
    in_ch = rch[0]
    for i, out_ch in enumerate(rch):
        block = {"resnets": []}
        for j in range(npb + 1):
            block["resnets"].append(
                _resnet_init(next(keys), in_ch if j == 0 else out_ch, out_ch, z, dtype)
            )
        if i < len(rch) - 1:
            block["upsample"] = _upsample_init(next(keys), out_ch, dtype)
        in_ch = out_ch
        dec["up"].append(block)
    dec["norm_out"] = spatial_norm_init(next(keys), rch[-1], z, dtype)
    dec["conv_out"] = conv3d_init(next(keys), rch[-1], 3, 3, dtype=dtype)
    return {"encoder": enc, "decoder": dec}


def vae_encode(
    params: dict,
    video: jax.Array,
    cfg: CogVideoXConfig,
    key: Optional[jax.Array] = None,
    sample: bool = True,
) -> jax.Array:
    """(B, 3, T, H, W) in [-1, 1] -> latents (B, z, T', H/8, W/8), scaled.

    T must be 4k+1 (first frame + groups of 4) like the reference protocol.
    """
    enc = params["encoder"]
    t_levels = int(math.log2(cfg.temporal_compression_ratio))
    h = causal_conv3d(enc["conv_in"], video)
    for i, block in enumerate(enc["down"]):
        for rp in block["resnets"]:
            h = _resnet(rp, h, None)
        if "downsample" in block:
            h = _downsample(block["downsample"], h, compress_time=i < t_levels)
    for rp in enc["mid"]["resnets"]:
        h = _resnet(rp, h, None)
    h = jax.nn.silu(groupnorm(enc["norm_out"], h))
    moments = causal_conv3d(enc["conv_out"], h)
    mean, logvar = jnp.split(moments, 2, axis=1)
    if sample:
        if key is None:
            raise ValueError("sampling the posterior needs a PRNG key")
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mean = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
    if cfg.vae_invert_scale_latents:
        return mean / cfg.vae_scaling_factor
    return mean * cfg.vae_scaling_factor


def vae_decode(params: dict, latents: jax.Array, cfg: CogVideoXConfig) -> jax.Array:
    """Scaled latents (B, z, T', H', W') -> video (B, 3, T, 8H', 8W') in [-1, 1]."""
    if cfg.vae_invert_scale_latents:
        z = latents * cfg.vae_scaling_factor
    else:
        z = latents / cfg.vae_scaling_factor
    dec = params["decoder"]
    t_levels = int(math.log2(cfg.temporal_compression_ratio))
    h = causal_conv3d(dec["conv_in"], z)
    for rp in dec["mid"]["resnets"]:
        h = _resnet(rp, h, z)
    for i, block in enumerate(dec["up"]):
        for rp in block["resnets"]:
            h = _resnet(rp, h, z)
        if "upsample" in block:
            # diffusers upsamples time at the DEEP up blocks (i < levels),
            # mirroring the encoder's shallow-block downsampling — verified
            # against the torch oracle in test_cogvideox_vae_parity.py
            h = _upsample(block["upsample"], h, compress_time=i < t_levels)
    h = jax.nn.silu(spatial_norm(dec["norm_out"], h, z))
    return causal_conv3d(dec["conv_out"], h)


# ---------------------------------------------------------------------------
# Tiled encode/decode (the reference's enable_tiling/enable_slicing
# equivalent, generate/CogVideoX-5B.py:20-21 — bounds peak activation memory
# by decoding overlapping spatial tiles and linear-blending the seams)
# ---------------------------------------------------------------------------

def _tile_positions(size: int, tile: int, overlap: int):
    """Uniform-size tile start positions (last tile end-aligned) so only ONE
    tile shape is ever compiled."""
    if size <= tile:
        return [0]
    stride = max(tile - overlap, max(tile // 2, 1))  # overlap can't eat the tile
    pos = list(range(0, size - tile, stride))
    pos.append(size - tile)
    return pos


def _ramp_1d_np(n: int, first: bool, last: bool) -> np.ndarray:
    """Linear border ramp for weighted tile stitching (16-sample edges)."""
    w = np.ones(n, np.float32)
    edge = min(n // 2, 16)
    if not first:
        w[:edge] = np.linspace(0, 1, edge, endpoint=False)
    if not last:
        w[-edge:] = np.linspace(1, 0, edge, endpoint=False)
    return w


# Device-side weighted tile stitching: the ENTIRE tile loop runs as one
# lax.scan inside one jit — tile positions and ramp weights are scan inputs,
# the tile codec body compiles once, and the stitched output never leaves
# the device. (Round 2 blended on host: each decoded tile took an np.array()
# round-trip, ~660 MB of f32 over the ~50 MB/s axon tunnel for a
# 49f@480x720 decode — 24 of the measured 25 s. An intermediate per-tile-jit
# device design still paid 2 dispatch round-trips per tile, ~10 s on the
# tunnel; the single-program scan removes the per-tile dispatch entirely.
# Keeping the video device-resident also feeds the reward scorer directly
# with no transfer at all; see bench_overlap.)


def _tile_grid(H, W, th, tw, overlap):
    pos_h = _tile_positions(H, th, overlap)
    pos_w = _tile_positions(W, tw, overlap)
    grid = [
        (hi, wi, i0, j0)
        for hi, i0 in enumerate(pos_h)
        for wi, j0 in enumerate(pos_w)
    ]
    return pos_h, pos_w, grid


def _ramp_stacks(grid, n_h, n_w, th_out, tw_out):
    whs = np.stack(
        [_ramp_1d_np(th_out, hi == 0, hi == n_h - 1) for hi, wi, _, _ in grid]
    )
    wws = np.stack(
        [_ramp_1d_np(tw_out, wi == 0, wi == n_w - 1) for hi, wi, _, _ in grid]
    )
    return jnp.asarray(whs), jnp.asarray(wws)


def _scan_stitch(tile_fn, src, xs, out_shape, tile_out_hw):
    """lax.scan over tiles: slice src, apply tile_fn, weighted-accumulate.

    xs = (i0s, j0s, whs, wws[, extras...]) with positions in OUTPUT cells.
    tile_fn(src, i0, j0, *extras) -> (B, C, T_out, th_out, tw_out) tile.
    """
    th_out, tw_out = tile_out_hw

    def body(carry, x):
        acc, wacc = carry
        i0, j0, wh, ww = x[:4]
        tile = tile_fn(src, i0, j0, *x[4:])
        wmap = wh[:, None] * ww[None, :]
        cur = jax.lax.dynamic_slice(
            acc, (0, 0, 0, i0, j0), acc.shape[:3] + (th_out, tw_out)
        )
        acc = jax.lax.dynamic_update_slice(
            acc, cur + tile.astype(jnp.float32) * wmap, (0, 0, 0, i0, j0)
        )
        wcur = jax.lax.dynamic_slice(wacc, (i0, j0), (th_out, tw_out))
        wacc = jax.lax.dynamic_update_slice(wacc, wcur + wmap, (i0, j0))
        return (acc, wacc), None

    acc = jnp.zeros(out_shape, jnp.float32)
    wacc = jnp.zeros(out_shape[-2:], jnp.float32)
    (acc, wacc), _ = jax.lax.scan(body, (acc, wacc), xs)
    return acc / jnp.maximum(wacc, 1e-8)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _decode_tiled_jit(params, latents, cfg, th, tw, i0s, j0s, whs, wws):
    B, C, T, H, W = latents.shape
    sc = cfg.spatial_compression_ratio
    T_out = (T - 1) * cfg.temporal_compression_ratio + 1

    def tile_fn(src, oi, oj, li, lj):
        z = jax.lax.dynamic_slice(src, (0, 0, 0, li, lj), (B, C, T, th, tw))
        return vae_decode(params, z, cfg)

    return _scan_stitch(
        tile_fn, latents,
        (i0s * sc, j0s * sc, whs, wws, i0s, j0s),
        (B, 3, T_out, H * sc, W * sc), (th * sc, tw * sc),
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _encode_tiled_jit(params, video, cfg, th, tw, sample, i0s, j0s, whs, wws, keys):
    B, C, T, H, W = video.shape
    sc = cfg.spatial_compression_ratio
    T_lat = (T - 1) // cfg.temporal_compression_ratio + 1
    zc = cfg.vae_latent_channels

    def tile_fn(src, oi, oj, pi, pj, key):
        v = jax.lax.dynamic_slice(src, (0, 0, 0, pi, pj), (B, C, T, th, tw))
        return vae_encode(params, v, cfg, key=key, sample=sample)

    return _scan_stitch(
        tile_fn, video,
        (i0s, j0s, whs, wws, i0s * sc, j0s * sc, keys),
        (B, zc, T_lat, H // sc, W // sc), (th // sc, tw // sc),
    )


def vae_decode_tiled(
    params: dict,
    latents: jax.Array,
    cfg: CogVideoXConfig,
    tile_latent: int = 32,
    overlap_latent: int = 8,
) -> jax.Array:
    """Spatially-tiled decode: uniform latent tiles (one compiled shape),
    linear-ramp weighted stitching in pixel space — ONE jitted lax.scan over
    the tile grid, fully on device (single dispatch, no host round-trip)."""
    B, C, T, H, W = latents.shape
    if H <= tile_latent and W <= tile_latent:
        return vae_decode(params, latents, cfg)
    sc = cfg.spatial_compression_ratio
    th = min(tile_latent, H)
    tw = min(tile_latent, W)

    pos_h, pos_w, grid = _tile_grid(H, W, th, tw, overlap_latent)
    whs, wws = _ramp_stacks(grid, len(pos_h), len(pos_w), th * sc, tw * sc)
    i0s = jnp.asarray([i0 for _, _, i0, _ in grid], jnp.int32)
    j0s = jnp.asarray([j0 for _, _, _, j0 in grid], jnp.int32)
    return _decode_tiled_jit(params, latents, cfg, th, tw, i0s, j0s, whs, wws)


def vae_encode_tiled(
    params: dict,
    video: jax.Array,
    cfg: CogVideoXConfig,
    key: Optional[jax.Array] = None,
    sample: bool = True,
    tile_pixels: int = 256,
    overlap_pixels: int = 64,
) -> jax.Array:
    """Spatially-tiled encode: uniform pixel tiles, weighted latent
    stitching — one jitted lax.scan on device like the decode path."""
    B, C, T, H, W = video.shape
    if H <= tile_pixels and W <= tile_pixels:
        return vae_encode(params, video, cfg, key=key, sample=sample)
    sc = cfg.spatial_compression_ratio
    th = min(tile_pixels, H)
    tw = min(tile_pixels, W)

    if key is None:
        key = jax.random.PRNGKey(0)
    pos_h = _tile_positions(H, th, overlap_pixels)
    pos_w = _tile_positions(W, tw, overlap_pixels)
    # positions must be /sc-aligned so latent tiles stitch on integer cells
    pos_h = sorted({p // sc for p in pos_h})
    pos_w = sorted({p // sc for p in pos_w})
    grid = [
        (hi, wi, i0, j0)
        for hi, i0 in enumerate(pos_h)
        for wi, j0 in enumerate(pos_w)
    ]
    whs, wws = _ramp_stacks(grid, len(pos_h), len(pos_w), th // sc, tw // sc)
    i0s = jnp.asarray([i0 for _, _, i0, _ in grid], jnp.int32)
    j0s = jnp.asarray([j0 for _, _, _, j0 in grid], jnp.int32)
    keys = jax.random.split(key, len(grid))
    return _encode_tiled_jit(
        params, video, cfg, th, tw, sample, i0s, j0s, whs, wws, keys
    )
