"""Rotary position embeddings: 2D (VGGT/DA3 ViTs) and 3D (video DiTs).

2D variant parity target: reference ``vggt/layers/rope.py:63-188`` — feature
dim is split in half for (y, x); each half gets 1D RoPE with base frequency
100 and duplicated (not interleaved) angle layout: ang = cat(ang, ang), and
rotate_half(x) = cat(-x2, x1).

3D variant follows CogVideoX's spatiotemporal RoPE: head_dim split into
(t, h, w) channel groups sized by ``dim_t/dim_h/dim_w``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _angles_1d(positions: jax.Array, dim: int, base: float) -> jax.Array:
    """positions (...,) -> duplicated-layout angles (..., dim)."""
    exponents = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    inv_freq = 1.0 / (base ** exponents)
    ang = positions[..., None].astype(jnp.float32) * inv_freq
    return jnp.concatenate([ang, ang], axis=-1)


def apply_rope_1d(tokens: jax.Array, angles: jax.Array) -> jax.Array:
    """tokens (..., N, d), angles broadcastable (..., N, d)."""
    dtype = tokens.dtype
    t = tokens.astype(jnp.float32)
    out = t * jnp.cos(angles) + rotate_half(t) * jnp.sin(angles)
    return out.astype(dtype)


def rope_2d(tokens: jax.Array, positions: jax.Array, base: float = 100.0,
            layout: str = "bhnd") -> jax.Array:
    """Apply 2D RoPE.

    Args:
        tokens: (B, num_heads, N, D) — or (B, N, num_heads, D) with
            ``layout="bnhd"`` (the inference fast layout; same math, the
            angle tables broadcast over the heads axis instead).
        positions: (B, N, 2) integer (y, x) grid positions.

    Returns:
        same shape/dtype as tokens.
    """
    D = tokens.shape[-1]
    half = D // 2
    vert, horiz = tokens[..., :half], tokens[..., half:]
    ang_y = _angles_1d(positions[..., 0], half, base)  # (B, N, half)
    ang_x = _angles_1d(positions[..., 1], half, base)
    if layout == "bnhd":
        ang_y, ang_x = ang_y[:, :, None], ang_x[:, :, None]  # (B,N,1,half)
    else:
        ang_y, ang_x = ang_y[:, None], ang_x[:, None]  # (B,1,N,half)
    return jnp.concatenate(
        [apply_rope_1d(vert, ang_y), apply_rope_1d(horiz, ang_x)], axis=-1
    )


def rope_3d_freqs(
    grid_tfw: Tuple[int, int, int],
    head_dim: int,
    theta: float = 10000.0,
    axis_dims: Tuple[int, int, int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Precompute CogVideoX-style 3D rotary cos/sin tables.

    The head_dim is partitioned into temporal/vertical/horizontal channel
    groups (dim_t = hd/4, dim_h = dim_w = 3hd/8). Angles use the
    *interleaved* layout (each angle repeated for the (even, odd) channel
    pair), matching diffusers' ``get_3d_rotary_pos_embed`` with
    ``repeat_interleave_real=True`` so converted CogVideoX weights see
    identical rotations.

    Returns:
        (cos, sin) of shape (T*H*W, head_dim), float32; apply with
        :func:`apply_rope_interleaved`.
    """
    T, H, W = grid_tfw
    if axis_dims is None:
        # CogVideoX split; Wan uses (d - 4*(d//6)*... ) -> pass axis_dims
        axis_dims = (head_dim // 4, head_dim // 8 * 3, head_dim // 8 * 3)
    dim_t, dim_h, dim_w = axis_dims

    def axis_angles(n, dim):
        exponents = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
        inv = 1.0 / (theta ** exponents)
        ang = jnp.arange(n, dtype=jnp.float32)[:, None] * inv  # (n, dim/2)
        return jnp.repeat(ang, 2, axis=-1)  # interleaved: (n, dim)

    ang_t = axis_angles(T, dim_t)
    ang_h = axis_angles(H, dim_h)
    ang_w = axis_angles(W, dim_w)

    full = jnp.concatenate(
        [
            jnp.broadcast_to(ang_t[:, None, None, :], (T, H, W, dim_t)),
            jnp.broadcast_to(ang_h[None, :, None, :], (T, H, W, dim_h)),
            jnp.broadcast_to(ang_w[None, None, :, :], (T, H, W, dim_w)),
        ],
        axis=-1,
    ).reshape(T * H * W, head_dim)
    return jnp.cos(full), jnp.sin(full)


def rotate_interleaved(x: jax.Array) -> jax.Array:
    """(x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...)."""
    x_pairs = x.reshape(x.shape[:-1] + (-1, 2))
    even, odd = x_pairs[..., 0], x_pairs[..., 1]
    return jnp.stack([-odd, even], axis=-1).reshape(x.shape)


def apply_rope_interleaved(
    tokens: jax.Array, cos: jax.Array, sin: jax.Array
) -> jax.Array:
    """tokens (..., N, D) with interleaved-layout tables (N, D)."""
    dtype = tokens.dtype
    t = tokens.astype(jnp.float32)
    out = t * cos + rotate_interleaved(t) * sin
    return out.astype(dtype)


def apply_rope_cos_sin(
    tokens: jax.Array, cos: jax.Array, sin: jax.Array
) -> jax.Array:
    """Duplicated-layout (rotate_half) variant; tokens (..., N, D), tables (N, D)."""
    dtype = tokens.dtype
    t = tokens.astype(jnp.float32)
    out = t * cos + rotate_half(t) * sin
    return out.astype(dtype)
