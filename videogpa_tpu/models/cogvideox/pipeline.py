"""CogVideoX sampling pipelines (T2V + I2V) on TPU.

Parity targets: the diffusers pipelines invoked by the reference CLIs —
50 DPM steps, cfg 6.0, 49 frames (reference ``generate/CogVideoX-5B.py:95-97``),
dynamic cfg for 1.5 (``generate/CogVideoX1.5-5B.py:85``), I2V first-frame
latent conditioning (``generate/CogVideoX-5B-I2V.py``).

TPU design: the whole denoising loop is ONE jitted program (lax.fori_loop
over precomputed timesteps); both CFG branches run as a single batched
forward (batch-2 concat) so the MXU sees one large matmul stream. VAE decode
is a second jitted program.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videogpa_tpu.models.cogvideox.config import CogVideoXConfig
from videogpa_tpu.models.cogvideox.dit import dit_forward
from videogpa_tpu.models.cogvideox.scheduler import CogVideoXScheduler
from videogpa_tpu.models.cogvideox.vae import vae_encode


@dataclasses.dataclass(frozen=True)
class SamplerSettings:
    num_inference_steps: int = 50
    guidance_scale: float = 6.0
    use_dynamic_cfg: bool = False
    sampler: str = "dpm"  # "dpm" | "ddim"


def _dynamic_cfg(base: float, step_t: jax.Array, num_steps: int, num_train: int) -> jax.Array:
    """1 + g * (1 - cos(pi * ((T - t)/T)**5)) / 2 (diffusers dynamic cfg)."""
    frac = (num_train - step_t.astype(jnp.float32)) / num_train
    return 1.0 + base * (1.0 - jnp.cos(jnp.pi * frac ** 5.0)) / 2.0


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "settings", "attn_impl", "compute_dtype", "latent_shape"),
)
def denoise_loop(
    dit_params,
    text_embeds: jax.Array,
    negative_embeds: jax.Array,
    key: jax.Array,
    cfg: CogVideoXConfig,
    settings: SamplerSettings,
    latent_shape: Tuple[int, ...],
    image_latents: Optional[jax.Array] = None,
    ofs: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Run the full denoising loop. latent_shape: (B, F, C, H, W)."""
    scheduler = CogVideoXScheduler()
    ts = jnp.asarray(scheduler.timesteps(settings.num_inference_steps))
    n = settings.num_inference_steps
    prev_ts = jnp.concatenate([ts[1:], jnp.array([-1])])

    k_init, k_steps = jax.random.split(key)
    latents = jax.random.normal(k_init, latent_shape, jnp.float32)
    embeds = jnp.concatenate([negative_embeds, text_embeds], axis=0)

    def dit_step(lat, t):
        model_in = jnp.concatenate([lat, lat], axis=0)
        if image_latents is not None:
            img = jnp.concatenate([image_latents, image_latents], axis=0)
            model_in = jnp.concatenate([model_in, img], axis=2)
        t_b = jnp.broadcast_to(t, (model_in.shape[0],))
        ofs_b = None
        if ofs is not None:
            ofs_b = jnp.broadcast_to(ofs, (model_in.shape[0],))
        v = dit_forward(
            dit_params, model_in, embeds, t_b, cfg,
            ofs=ofs_b, attn_impl=attn_impl, compute_dtype=compute_dtype,
            # inference-only (B, N, H, D) fast path: feeds the transposed
            # flash kernel with one transpose per operand instead of two
            # (attention(layout="bnhd"); falls back harmlessly off-TPU)
            attn_layout="bnhd",
        )
        v_uncond, v_text = jnp.split(v, 2, axis=0)
        return v_uncond, v_text

    # ts[i-1] (the previous, larger timestep) feeds the 2nd-order correction
    back_ts = jnp.concatenate([jnp.array([0]), ts[:-1]])

    def body(i, carry):
        lat, old_x0 = carry
        t = ts[i]
        t_prev = prev_ts[i]
        v_uncond, v_text = dit_step(lat, t)
        if settings.use_dynamic_cfg:
            g = _dynamic_cfg(
                settings.guidance_scale, t, n, scheduler.num_train_timesteps
            )
        else:
            g = settings.guidance_scale
        v = v_uncond + g * (v_text - v_uncond)

        if settings.sampler == "ddim":
            new_lat = scheduler.ddim_step(v, t, t_prev, lat)
            new_x0 = old_x0
        else:
            # diffusers CogVideoXDPMScheduler: SDE step with fresh noise;
            # 2nd-order correction except on the first and final steps
            noise = jax.random.normal(
                jax.random.fold_in(k_steps, i), lat.shape, lat.dtype
            )
            prev1, prev2, x0 = scheduler.dpm_step(
                v, t, t_prev, lat, noise, old_x0=old_x0, timestep_back=back_ts[i]
            )
            new_lat = jnp.where((i > 0) & (t_prev >= 0), prev2, prev1)
            new_x0 = x0
        return new_lat, new_x0

    init = (latents, jnp.zeros_like(latents))
    latents, _ = jax.lax.fori_loop(0, n, body, init)
    return latents


def sample_t2v(
    dit_params,
    vae_params,
    text_embeds: jax.Array,
    negative_embeds: jax.Array,
    cfg: CogVideoXConfig,
    key: jax.Array,
    num_frames: int = 49,
    height: int = 480,
    width: int = 720,
    settings: Optional[SamplerSettings] = None,
    attn_impl: str = "auto",
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Text-to-video: returns decoded video (B, 3, T, H, W) in [-1, 1]."""
    settings = settings or SamplerSettings()
    B = text_embeds.shape[0]
    F = (num_frames - 1) // cfg.temporal_compression_ratio + 1
    if cfg.patch_size_t is not None:
        pad = cfg.patch_size_t - (F % cfg.patch_size_t or cfg.patch_size_t)
        F += pad  # 1.5 models round latent frames up to patch_size_t
    shape = (
        B, F, cfg.vae_latent_channels,
        height // cfg.spatial_compression_ratio,
        width // cfg.spatial_compression_ratio,
    )
    latents = denoise_loop(
        dit_params, text_embeds, negative_embeds, key, cfg, settings, shape,
        attn_impl=attn_impl, compute_dtype=compute_dtype,
    )
    return decode_latents(vae_params, latents, cfg)


def sample_i2v(
    dit_params,
    vae_params,
    text_embeds: jax.Array,
    negative_embeds: jax.Array,
    image: jax.Array,
    cfg: CogVideoXConfig,
    key: jax.Array,
    num_frames: int = 49,
    settings: Optional[SamplerSettings] = None,
    attn_impl: str = "auto",
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Image-to-video. image: (B, 3, H, W) in [-1, 1]."""
    settings = settings or SamplerSettings()
    B, _, H, W = image.shape
    F = (num_frames - 1) // cfg.temporal_compression_ratio + 1
    k_img, k_noise = jax.random.split(key)

    img_latent = vae_encode(
        vae_params, image[:, :, None], cfg, key=k_img, sample=True
    )  # (B, z, 1, H/8, W/8)
    img_latent = jnp.transpose(img_latent, (0, 2, 1, 3, 4))  # (B, 1, z, h, w)
    pad = jnp.zeros((B, F - 1) + img_latent.shape[2:], img_latent.dtype)
    image_latents = jnp.concatenate([img_latent, pad], axis=1)

    shape = (B, F, cfg.vae_latent_channels, H // 8, W // 8)
    latents = denoise_loop(
        dit_params, text_embeds, negative_embeds, k_noise, cfg, settings, shape,
        image_latents=image_latents, attn_impl=attn_impl, compute_dtype=compute_dtype,
    )
    return decode_latents(vae_params, latents, cfg)


def decode_latents(vae_params, latents: jax.Array, cfg: CogVideoXConfig) -> jax.Array:
    """(B, F, C, h, w) latents -> (B, 3, T, H, W) video in [-1, 1].

    Large spatial grids decode through overlapping tiles (the reference's
    enable_tiling) to bound peak HBM. Decoding usually runs with the 5B DiT
    still resident; if a tile size doesn't fit next to the weights (device
    OOM), the tile shrinks and the decode retries — some backends expose no
    memory stats to plan with (override with VIDEOGPA_VAE_TILE).
    """
    import os

    from videogpa_tpu.models.cogvideox.vae import vae_decode_tiled

    z = jnp.transpose(latents, (0, 2, 1, 3, 4))
    env = os.environ.get("VIDEOGPA_VAE_TILE")
    sizes = [int(env)] if env else [32, 16, 8]
    for i, tile in enumerate(sizes):
        try:
            out = vae_decode_tiled(vae_params, z, cfg, tile_latent=tile)
            # the tiled decode is one async-dispatched program now: sync
            # here so a device OOM surfaces inside this try and can retry.
            # block_until_ready does not reliably block on the axon backend
            # (CLAUDE.md), so pull one element — completing any output
            # element requires the whole program to have executed.
            jax.block_until_ready(out)
            float(np.asarray(out.ravel()[0]))
            return jnp.clip(out, -1.0, 1.0)
        except Exception as e:  # jaxlib runtime errors don't share a base
            oom = "RESOURCE_EXHAUSTED" in str(e) or "out of memory" in str(e).lower()
            if not oom or i == len(sizes) - 1:
                raise
            print(f"decode tile {tile} OOM; retrying with {sizes[i + 1]}")
    raise AssertionError("unreachable")


def video_to_uint8(video: jax.Array) -> np.ndarray:
    """(B, 3, T, H, W) [-1,1] -> (B, T, H, W, 3) uint8."""
    v = np.asarray(video)
    v = ((v + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
    return v.transpose(0, 2, 3, 4, 1)
