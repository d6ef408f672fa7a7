"""Bilinear resize / grid-sample with exact torch pixel-model semantics.

The reward pipeline's parity depends on matching PyTorch's two pixel models:
- ``align_corners=False`` (metric resize, reference ``metrics/mse.py:24-25``):
  source coord = (x + 0.5) * scale - 0.5, edge-clamped.
- ``align_corners=True`` (DPT fusion upsample ``vggt/heads/dpt_head.py:239``,
  MVCS grid_sample ``metrics/mvcs.py:94-101``):
  source coord = x * (in - 1) / (out - 1).

``jax.image.resize`` implements neither exactly (it uses a different kernel
normalization at edges), so we gather explicitly. All ops are jit-safe and
batched over leading dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_coords(out_size: int, in_size: int, align_corners: bool, dtype) -> jax.Array:
    x = jnp.arange(out_size, dtype=dtype)
    if align_corners:
        if out_size == 1:
            return jnp.zeros((1,), dtype)
        return x * ((in_size - 1) / (out_size - 1))
    scale = in_size / out_size
    return (x + 0.5) * scale - 0.5


def _gather_1d_weights(coords: jax.Array, in_size: int):
    """Return (lo_idx, hi_idx, hi_weight) for linear interpolation, edge-clamped."""
    c = jnp.clip(coords, 0.0, in_size - 1)
    lo = jnp.floor(c).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w = c - lo.astype(c.dtype)
    return lo, hi, w


def resize_bilinear(
    x: jax.Array, out_hw: tuple, align_corners: bool = False
) -> jax.Array:
    """Resize (..., H, W) to (..., H', W') with torch-interp semantics."""
    H, W = x.shape[-2], x.shape[-1]
    Ho, Wo = out_hw
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    x = x.astype(dtype)

    ys = _axis_coords(Ho, H, align_corners, dtype)
    xs = _axis_coords(Wo, W, align_corners, dtype)
    y0, y1, wy = _gather_1d_weights(ys, H)
    x0, x1, wx = _gather_1d_weights(xs, W)

    top = jnp.take(x, y0, axis=-2)
    bot = jnp.take(x, y1, axis=-2)
    rows = top * (1 - wy)[..., :, None] + bot * wy[..., :, None]
    left = jnp.take(rows, x0, axis=-1)
    right = jnp.take(rows, x1, axis=-1)
    return left * (1 - wx) + right * wx


def grid_sample_bilinear(
    img: jax.Array, u: jax.Array, v: jax.Array, align_corners: bool = True
) -> jax.Array:
    """Sample (H, W) image at float pixel coords with zeros padding.

    Args:
        img: (H, W) array.
        u, v: pixel-space sample coordinates, any matching shape.
            (Convert normalized [-1, 1] grid coords to pixels first:
            align_corners=True => px = (g + 1) / 2 * (size - 1).)

    Returns:
        samples with the shape of ``u``; out-of-bounds contributions are zero,
        matching ``F.grid_sample(padding_mode='zeros')``.
    """
    H, W = img.shape
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = u - x0.astype(u.dtype)
    wy = v - y0.astype(v.dtype)

    def tap(yi, xi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        val = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(inb, val, 0.0)

    return (
        tap(y0, x0) * (1 - wy) * (1 - wx)
        + tap(y0, x1) * (1 - wy) * wx
        + tap(y1, x0) * wy * (1 - wx)
        + tap(y1, x1) * wy * wx
    )


# ---------------------------------------------------------------------------
# Torch-exact bicubic resize (pos-embed interpolation)
# ---------------------------------------------------------------------------

import numpy as np  # noqa: E402  (host-side weight computation)


def _cubic_kernel(t: "np.ndarray", a: float = -0.75) -> "np.ndarray":
    at = np.abs(t)
    w = np.where(
        at <= 1,
        (a + 2) * at ** 3 - (a + 3) * at ** 2 + 1,
        np.where(at < 2, a * at ** 3 - 5 * a * at ** 2 + 8 * a * at - 4 * a, 0.0),
    )
    return w


def _bicubic_weights_1d(
    in_size: int, out_size: int, align_corners: bool, antialias: bool,
    scale_override: float = 0.0,
) -> "np.ndarray":
    """(out_size, in_size) weight matrix reproducing torch F.interpolate bicubic.

    Indices are edge-clamped (border replicate); antialiased weights are
    renormalized, matching torch's upsample_bicubic2d_aa. ``scale_override``
    reproduces torch's behavior when the caller passes ``scale_factor=sf``
    instead of ``size``: source coords use the *given* in/out ratio
    (``1/sf``), not ``in_size/out_size`` (DINOv2's historical
    ``interpolate_offset=0.1`` kludge relies on this).
    """
    W = np.zeros((out_size, in_size), np.float64)
    if align_corners:
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        centers = np.arange(out_size) * scale
    else:
        scale = scale_override if scale_override > 0 else in_size / out_size
        centers = (np.arange(out_size) + 0.5) * scale - 0.5

    if antialias and not align_corners:
        # PIL-style resampling (aten upsample_*2d_aa): half-pixel centers,
        # clipped (not replicated) borders, normalized weights.
        s = max(scale, 1.0)
        support = 2.0 * s
        inv = 1.0 / s
        for i in range(out_size):
            center = scale * (i + 0.5)
            lo = max(0, int(center - support + 0.5))
            hi = min(in_size, int(center + support + 0.5))
            j = np.arange(lo, hi)
            # the AA path uses the PIL cubic kernel (a=-0.5), unlike the
            # non-AA path's a=-0.75
            w = _cubic_kernel((j - center + 0.5) * inv, a=-0.5)
            w = w / w.sum()
            W[i, j] = w
    else:
        for i, c in enumerate(centers):
            f = int(np.floor(c))
            j = np.arange(f - 1, f + 3)
            w = _cubic_kernel(j - c)
            np.add.at(W[i], np.clip(j, 0, in_size - 1), w)
    return W.astype(np.float32)


def resize_bicubic(
    x: jax.Array,
    out_hw: tuple,
    align_corners: bool = False,
    antialias: bool = False,
    scale_override: tuple = (0.0, 0.0),
) -> jax.Array:
    """Resize (..., H, W) with torch bicubic semantics (incl. antialias).

    The interpolation weights depend only on static sizes, so they are
    precomputed host-side and applied as two MXU matmuls. ``scale_override``
    (per-axis in/out ratios) mirrors torch's ``scale_factor=`` coordinate
    mapping — see ``_bicubic_weights_1d``.
    """
    H, W = x.shape[-2], x.shape[-1]
    Ho, Wo = out_hw
    wh = jnp.asarray(_bicubic_weights_1d(H, Ho, align_corners, antialias,
                                         scale_override[0]))
    ww = jnp.asarray(_bicubic_weights_1d(W, Wo, align_corners, antialias,
                                         scale_override[1]))
    y = jnp.einsum("oh,...hw->...ow", wh, x.astype(jnp.float32))
    y = jnp.einsum("ow,...hw->...ho", ww, y)
    return y.astype(x.dtype)
