"""Wan2.2 VAE in JAX: z=48, compression (4, 16, 16).

Faithful rebuild of the Wan2.2 repo's ``Wan2_2_VAE`` (``wan/modules/vae2_2.py``,
loaded by reference ``train/Wan2.2-TI2V-5B/02_encode.py:103-107`` and
``generate/Wan2.2-TI2V-5B.py:46-52``; the Wan2.2 repo is an external
dependency there, not vendored). Architecture:

- 2x2 spatial **patchify** at input / unpatchify at output (channel packing
  order ``b c f (h q) (w r) -> b (c r q) f h w``), so 16x spatial = 2 patchify
  x 2^3 strided convs
- causal 3D convs: zero temporal padding at the FRONT only (kt-1 frames), so
  frame t sees frames <= t
- encoder: conv_in -> 4 scales, each = [2 resnets + optional strided
  downsample] with a parameter-free **AvgDown3D residual shortcut** (pixel
  (un)shuffle + grouped channel mean); temporal stride at scales 1-2
- decoder (wider: base 256 vs encoder 160): 4 scales of [3 resnets +
  optional upsample] with a **DupUp3D residual shortcut** (channel repeat +
  pixel shuffle); temporal upsample at scales 0-1
- RMS norms (L2-normalize over channels * sqrt(C) * gamma), mid-block
  single-head spatial attention
- deterministic encode: returns the (normalized) posterior mean, matching
  ``Wan2_2_VAE.encode`` which never samples

The upstream model streams frames through encoder/decoder in chunks of
(1, 4, 4, ...) input frames with per-conv feature caches. This
implementation computes the mathematically-identical full-sequence form:

- every k_t=3 conv <=> causal conv with 2 zero frames front padding
- encoder ``downsample3d``: output frame 0 bypasses the temporal conv
  (the stream caches the first chunk without convolving it); frames n>=1 are
  stride-2 windows (x_{2n-2}, x_{2n-1}, x_{2n})
- decoder ``upsample3d``: latent frame 0 bypasses (the stream's 'Rep' slot
  skips doubling on the first chunk); frames n>=1 run a causal conv to 2C
  channels, split and interleaved into 2 output frames each
- AvgDown3D zero-pads time at the front to a multiple of the factor;
  DupUp3D trims factor_t - 1 leading frames (the stream's first_chunk trim)

hence T pixel frames <-> 1 + (T-1)/4 latent frames. The streaming-vs-full
equivalence is locked down by tests/test_wan_vae_parity.py against a torch
oracle that implements the chunked/cached semantics directly.

All convs run as XLA ``conv_general_dilated`` in NCDHW (MXU-friendly);
norm/softmax statistics in f32 per the repo dtype policy.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from videogpa_tpu.models.cogvideox.vae import conv3d_init
from videogpa_tpu.models.wan.config import WanConfig

Params = dict


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def conv2d_init(key, in_ch: int, out_ch: int, kernel: int, dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel * kernel
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(
            kw, (kernel, kernel, in_ch, out_ch), dtype, -bound, bound
        ),  # HWIO
        "bias": jax.random.uniform(kb, (out_ch,), dtype, -bound, bound),
    }


def _conv2d_frames(p: Params, x: jax.Array, stride: int = 1, padding="SAME") -> jax.Array:
    """2D conv applied per frame on (B, C, T, H, W) by folding T into N."""
    B, C, T, H, W = x.shape
    y = jax.lax.conv_general_dilated(
        x.transpose(0, 2, 1, 3, 4).reshape(B * T, C, H, W),
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    y = y + p["bias"].astype(jnp.float32)[None, :, None, None]
    _, O, Ho, Wo = y.shape
    return y.reshape(B, T, O, Ho, Wo).transpose(0, 2, 1, 3, 4).astype(x.dtype)


def _causal_conv3d(p: Params, x: jax.Array, t_stride: int = 1) -> jax.Array:
    """Causal 3D conv, NCDHW: zero-pad kt-1 frames at the time FRONT (Wan's
    CausalConv3d semantics: ``_padding[4] = 2 * (kt//2)``), symmetric zero
    spatial padding. ``t_stride`` > 1 implies NO temporal padding (the
    downsample3d time_conv is built with padding=(0,0,0))."""
    kt, kh, kw = p["kernel"].shape[:3]
    t_pad = 0 if t_stride > 1 else (kt - 1)
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(t_stride, 1, 1),
        padding=((t_pad, 0), ((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)),
        dimension_numbers=("NCDHW", "DHWIO", "NCDHW"),
        preferred_element_type=jnp.float32,
    )
    return (y + p["bias"].astype(jnp.float32)[None, :, None, None, None]).astype(x.dtype)


def rmsnorm_init(ch: int, dtype=jnp.float32) -> Params:
    return {"gamma": jnp.ones((ch,), dtype)}


def _rms_norm(p: Params, x: jax.Array) -> jax.Array:
    """Wan RMS_norm: F.normalize(x, dim=1) * sqrt(C) * gamma  (f32 stats)."""
    C = x.shape[1]
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=1, keepdims=True))
    xf = xf / jnp.maximum(norm, 1e-12) * math.sqrt(C)
    shape = (1, C) + (1,) * (x.ndim - 2)
    return (xf * p["gamma"].astype(jnp.float32).reshape(shape)).astype(x.dtype)


def _resnet_init(key, in_ch: int, out_ch: int, dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": rmsnorm_init(in_ch, dtype),
        "conv1": conv3d_init(k1, in_ch, out_ch, 3, dtype=dtype),
        "norm2": rmsnorm_init(out_ch, dtype),
        "conv2": conv3d_init(k2, out_ch, out_ch, 3, dtype=dtype),
    }
    if in_ch != out_ch:
        p["shortcut"] = conv3d_init(k3, in_ch, out_ch, 1, dtype=dtype)
    return p


def _resnet(p: Params, x: jax.Array) -> jax.Array:
    h = jax.nn.silu(_rms_norm(p["norm1"], x))
    h = _causal_conv3d(p["conv1"], h)
    h = jax.nn.silu(_rms_norm(p["norm2"], h))
    h = _causal_conv3d(p["conv2"], h)
    sc = _causal_conv3d(p["shortcut"], x) if "shortcut" in p else x
    return h + sc


def _attn_init(key, ch: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "norm": rmsnorm_init(ch, dtype),
        "qkv": conv2d_init(k1, ch, ch * 3, 1, dtype=dtype),
        "proj": conv2d_init(k2, ch, ch, 1, dtype=dtype),
    }


def _attn_block(p: Params, x: jax.Array) -> jax.Array:
    """Single-head spatial self-attention per frame (Wan AttentionBlock)."""
    B, C, T, H, W = x.shape
    h = _rms_norm(p["norm"], x)
    qkv = _conv2d_frames(p["qkv"], h)  # (B, 3C, T, H, W)
    qkv = qkv.reshape(B, 3, C, T, H * W)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # (B, C, T, HW)
    logits = jnp.einsum(
        "bctq,bctk->btqk", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(C)
    attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("btqk,bctk->bctq", attn, v, preferred_element_type=jnp.float32)
    o = o.astype(x.dtype).reshape(B, C, T, H, W)
    return _conv2d_frames(p["proj"], o) + x


# ---------------------------------------------------------------------------
# Parameter-free shuffles
# ---------------------------------------------------------------------------

def _patchify(x: jax.Array, ps: int) -> jax.Array:
    """b c f (h q) (w r) -> b (c r q) f h w  (Wan's einops order: w-subpixel
    r varies faster over channels than h-subpixel q... c slowest, then r, q)."""
    if ps == 1:
        return x
    B, C, T, H, W = x.shape
    x = x.reshape(B, C, T, H // ps, ps, W // ps, ps)  # b c f h q w r
    x = x.transpose(0, 1, 6, 4, 2, 3, 5)  # b c r q f h w
    return x.reshape(B, C * ps * ps, T, H // ps, W // ps)


def _unpatchify(x: jax.Array, ps: int) -> jax.Array:
    if ps == 1:
        return x
    B, CP, T, H, W = x.shape
    C = CP // (ps * ps)
    x = x.reshape(B, C, ps, ps, T, H, W)  # b c r q f h w
    x = x.transpose(0, 1, 4, 5, 3, 6, 2)  # b c f h q w r
    return x.reshape(B, C, T, H * ps, W * ps)


def _avg_down3d(x: jax.Array, out_ch: int, ft: int, fs: int) -> jax.Array:
    """Wan AvgDown3D: zero-pad time front to a multiple of ft, space-to-channel
    (packing order C, t_off, h_off, w_off), grouped channel mean to out_ch."""
    B, C, T, H, W = x.shape
    pad_t = (ft - T % ft) % ft
    if pad_t:
        x = jnp.concatenate([jnp.zeros_like(x[:, :, :pad_t]), x], axis=2)
        T += pad_t
    factor = ft * fs * fs
    g = C * factor // out_ch
    x = x.reshape(B, C, T // ft, ft, H // fs, fs, W // fs, fs)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)  # B C ft fsh fsw T' H' W'
    x = x.reshape(B, out_ch, g, T // ft, H // fs, W // fs)
    return x.mean(axis=2)


def _dup_up3d(x: jax.Array, out_ch: int, ft: int, fs: int) -> jax.Array:
    """Wan DupUp3D: channel repeat_interleave + channel-to-space (inverse
    packing of AvgDown3D), then trim the ft-1 leading frames (the stream
    applies this on the first chunk; on the full sequence it is the front)."""
    B, C, T, H, W = x.shape
    factor = ft * fs * fs
    reps = out_ch * factor // C
    x = jnp.repeat(x, reps, axis=1)
    x = x.reshape(B, out_ch, ft, fs, fs, T, H, W)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)  # B C T ft H fsh W fsw
    x = x.reshape(B, out_ch, T * ft, H * fs, W * fs)
    return x[:, :, ft - 1 :]


# ---------------------------------------------------------------------------
# Resample blocks (stream-equivalent full-sequence forms)
# ---------------------------------------------------------------------------

def _resample_down(p: Params, x: jax.Array, temporal: bool) -> jax.Array:
    """downsample2d/3d: ZeroPad2d((0,1,0,1)) + Conv2d k3 s2, then (3d) the
    stride-2 temporal conv with frame 0 bypassing it."""
    B, C, T, H, W = x.shape
    x2 = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 1)))
    h = jax.lax.conv_general_dilated(
        x2.transpose(0, 2, 1, 3, 4).reshape(B * T, C, H + 1, W + 1),
        p["conv"]["kernel"].astype(x.dtype),
        window_strides=(2, 2),
        padding="VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    h = h + p["conv"]["bias"].astype(jnp.float32)[None, :, None, None]
    h = h.reshape(B, T, C, H // 2, W // 2).transpose(0, 2, 1, 3, 4).astype(x.dtype)
    if temporal:
        if T == 1:
            return h  # stream: first chunk is cached, not convolved
        rest = _causal_conv3d(p["time_conv"], h, t_stride=2)  # windows (0,1,2),(2,3,4),...
        h = jnp.concatenate([h[:, :, :1], rest], axis=2)
    return h


def _resample_up(p: Params, x: jax.Array, temporal: bool) -> jax.Array:
    """upsample2d/3d: (3d) causal conv frames 1..T-1 to 2C and interleave into
    2 frames each, frame 0 bypasses; then nearest-exact 2x + Conv2d k3."""
    B, C, T, H, W = x.shape
    if temporal and T > 1:
        h = _causal_conv3d(p["time_conv"], x[:, :, 1:])  # (B, 2C, T-1, H, W)
        h = h.reshape(B, 2, C, T - 1, H, W)
        h = h.transpose(0, 2, 3, 1, 4, 5).reshape(B, C, 2 * (T - 1), H, W)
        x = jnp.concatenate([x[:, :, :1], h], axis=2)
    x = jnp.repeat(jnp.repeat(x, 2, axis=-2), 2, axis=-1)  # nearest-exact 2x
    return _conv2d_frames(p["conv"], x)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _enc_dims(cfg: WanConfig):
    return [cfg.vae_base_ch * u for u in [1] + list(cfg.vae_dim_mult)]


def _dec_dims(cfg: WanConfig):
    m = list(cfg.vae_dim_mult)
    return [cfg.vae_dec_base_ch * u for u in [m[-1]] + m[::-1]]


def wan_vae_init(key: jax.Array, cfg: WanConfig, dtype=jnp.float32) -> dict:
    """Random-init params with the exact Wan2.2 module tree (see convert.py
    for the torch key mapping)."""
    z = cfg.vae_z_dim
    ps = cfg.vae_patch_size
    keys = iter(jax.random.split(key, 200))
    t_down = list(cfg.vae_temporal_down)
    n_scales = len(cfg.vae_dim_mult)

    def mid(ch):
        return {
            "res1": _resnet_init(next(keys), ch, ch, dtype),
            "attn": _attn_init(next(keys), ch, dtype),
            "res2": _resnet_init(next(keys), ch, ch, dtype),
        }

    dims = _enc_dims(cfg)
    enc = {
        "conv_in": conv3d_init(next(keys), 3 * ps * ps, dims[0], 3, dtype=dtype),
        "scales": [],
        "mid": mid(dims[-1]),
        "head_norm": rmsnorm_init(dims[-1], dtype),
        "conv_out": conv3d_init(next(keys), dims[-1], 2 * z, 3, dtype=dtype),
    }
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        scale = {
            "resnets": [
                _resnet_init(next(keys), cin if j == 0 else cout, cout, dtype)
                for j in range(cfg.vae_num_res_blocks)
            ]
        }
        if i != n_scales - 1:
            temporal = t_down[i] if i < len(t_down) else False
            scale["resample"] = {"conv": conv2d_init(next(keys), cout, cout, 3, dtype)}
            if temporal:
                scale["resample"]["time_conv"] = conv3d_init(
                    next(keys), cout, cout, (3, 1, 1), dtype=dtype
                )
        enc["scales"].append(scale)

    ddims = _dec_dims(cfg)
    t_up = t_down[::-1]
    dec = {
        "conv_in": conv3d_init(next(keys), z, ddims[0], 3, dtype=dtype),
        "mid": mid(ddims[0]),
        "scales": [],
        "head_norm": rmsnorm_init(ddims[-1], dtype),
        "conv_out": conv3d_init(next(keys), ddims[-1], 3 * ps * ps, 3, dtype=dtype),
    }
    for i, (cin, cout) in enumerate(zip(ddims[:-1], ddims[1:])):
        scale = {
            "resnets": [
                _resnet_init(next(keys), cin if j == 0 else cout, cout, dtype)
                for j in range(cfg.vae_num_res_blocks + 1)
            ]
        }
        if i != n_scales - 1:
            temporal = t_up[i] if i < len(t_up) else False
            scale["resample"] = {"conv": conv2d_init(next(keys), cout, cout, 3, dtype)}
            if temporal:
                scale["resample"]["time_conv"] = conv3d_init(
                    next(keys), cout, 2 * cout, (3, 1, 1), dtype=dtype
                )
        dec["scales"].append(scale)

    return {
        "encoder": enc,
        "quant_conv": conv3d_init(next(keys), 2 * z, 2 * z, 1, dtype=dtype),
        "post_quant_conv": conv3d_init(next(keys), z, z, 1, dtype=dtype),
        "decoder": dec,
        "latents_mean": jnp.zeros((z,), jnp.float32),
        "latents_std": jnp.ones((z,), jnp.float32),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _mid_block(p: Params, h: jax.Array) -> jax.Array:
    h = _resnet(p["res1"], h)
    h = _attn_block(p["attn"], h)
    return _resnet(p["res2"], h)


def wan_vae_encode(
    params: dict,
    video: jax.Array,
    cfg: WanConfig,
    key: Optional[jax.Array] = None,
    sample: bool = False,
) -> jax.Array:
    """(B, 3, T, H, W) in [-1,1], T = 4k+1 (or 1) -> normalized latents
    (B, z, 1+(T-1)/4, H/16, W/16).

    ``sample=False`` (default) returns the posterior mean, matching
    ``Wan2_2_VAE.encode`` which is deterministic (mu only)."""
    t_down = list(cfg.vae_temporal_down)
    n_scales = len(cfg.vae_dim_mult)
    dims = _enc_dims(cfg)
    enc = params["encoder"]

    h = _causal_conv3d(enc["conv_in"], _patchify(video, cfg.vae_patch_size))
    for i, scale in enumerate(enc["scales"]):
        sc_in = h
        for rp in scale["resnets"]:
            h = _resnet(rp, h)
        temporal = t_down[i] if i < len(t_down) else False
        if "resample" in scale:
            h = _resample_down(scale["resample"], h, temporal)
        ft = 2 if (temporal and i != n_scales - 1) else 1
        fs = 2 if i != n_scales - 1 else 1
        h = h + _avg_down3d(sc_in, dims[i + 1], ft, fs)
    h = _mid_block(enc["mid"], h)
    h = jax.nn.silu(_rms_norm(enc["head_norm"], h))
    moments = _causal_conv3d(enc["conv_out"], h)
    moments = _causal_conv3d(params["quant_conv"], moments)
    mean, logvar = jnp.split(moments, 2, axis=1)
    if sample:
        if key is None:
            raise ValueError("sampling the posterior needs a PRNG key")
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mean = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
    lm = params["latents_mean"].astype(mean.dtype).reshape(1, -1, 1, 1, 1)
    ls = params["latents_std"].astype(mean.dtype).reshape(1, -1, 1, 1, 1)
    return (mean - lm) / ls


def wan_vae_decode(params: dict, latents: jax.Array, cfg: WanConfig) -> jax.Array:
    """Normalized latents (B, z, T', H', W') -> video (B, 3, 1+4(T'-1),
    16H', 16W') clamped to [-1, 1]."""
    t_up = list(cfg.vae_temporal_down)[::-1]
    n_scales = len(cfg.vae_dim_mult)
    ddims = _dec_dims(cfg)
    dec = params["decoder"]

    lm = params["latents_mean"].astype(latents.dtype).reshape(1, -1, 1, 1, 1)
    ls = params["latents_std"].astype(latents.dtype).reshape(1, -1, 1, 1, 1)
    z = latents * ls + lm
    h = _causal_conv3d(params["post_quant_conv"], z)
    h = _causal_conv3d(dec["conv_in"], h)
    h = _mid_block(dec["mid"], h)
    for i, scale in enumerate(dec["scales"]):
        sc_in = h
        for rp in scale["resnets"]:
            h = _resnet(rp, h)
        temporal = t_up[i] if i < len(t_up) else False
        if "resample" in scale:
            h = _resample_up(scale["resample"], h, temporal)
            ft = 2 if temporal else 1
            h = h + _dup_up3d(sc_in, ddims[i + 1], ft, 2)
    h = jax.nn.silu(_rms_norm(dec["head_norm"], h))
    h = _causal_conv3d(dec["conv_out"], h)
    return jnp.clip(_unpatchify(h, cfg.vae_patch_size), -1.0, 1.0)
