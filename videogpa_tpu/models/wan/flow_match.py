"""Flow-matching utilities for Wan2.2 (shifted linear schedule).

Exact parity targets (reference ``train/Wan2.2-TI2V-5B/03_train.py:103-125``):
    sigma(t)   = shift * s / (1 + (shift - 1) * s),  s = t / T
    z_t        = (1 - sigma) * z0 + sigma * eps
    target v   = eps - z0
    TI2V trick = first temporal latent frame is the clean image latent
                 (sigma = 0), expressed through a per-token timestep tensor
                 where first-frame tokens carry t = 0.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sigma_from_timestep(
    timestep: jax.Array, num_train_timesteps: int = 1000, shift: float = 5.0
) -> jax.Array:
    s = timestep.astype(jnp.float32) / num_train_timesteps
    return shift * s / (1 + (shift - 1) * s)


def flow_add_noise(z0: jax.Array, noise: jax.Array, sigma: jax.Array) -> jax.Array:
    sigma = sigma.reshape(sigma.shape + (1,) * (z0.ndim - sigma.ndim))
    return (1.0 - sigma) * z0 + sigma * noise


def flow_velocity_target(z0: jax.Array, noise: jax.Array) -> jax.Array:
    return noise - z0


def ti2v_timestep_tokens(
    timestep: jax.Array,
    grid_fhw: Tuple[int, int, int],
    patch_size: Tuple[int, int, int] = (1, 2, 2),
) -> jax.Array:
    """Per-token timesteps: first latent frame's tokens get t=0, rest get t.

    Args:
        timestep: (B,) timesteps.
        grid_fhw: latent grid (F, H, W) BEFORE patching.

    Returns:
        (B, L) with L = F * H/p * W/p.
    """
    F, H, W = grid_fhw
    hp, wp = H // patch_size[1], W // patch_size[2]
    per_frame = jnp.ones((F,), jnp.float32).at[0].set(0.0)
    tokens = jnp.repeat(per_frame, hp * wp)  # (L,)
    return timestep.astype(jnp.float32)[:, None] * tokens[None]
