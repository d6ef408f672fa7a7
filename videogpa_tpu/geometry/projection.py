"""Point-cloud splatting renderer as deterministic XLA scatter-min z-buffering.

Behavioral parity target: reference ``utils/projection_utils.py:12-101``, which
projects a colored point cloud into each camera, rounds to integer pixels and
resolves occlusion by sorting far-to-near and overwriting (painter's
algorithm — the *nearest* point wins each pixel).

The TPU-native design replaces the data-dependent sort+overwrite with two
deterministic scatter-min passes over a flat (H*W+1) buffer (the "+1" slot
absorbs invalid points so shapes stay static under jit):

  1. scatter-min of z        -> per-pixel nearest depth
  2. scatter-min of point id (restricted to points at the winning depth)
                             -> deterministic tie-break: lowest point index
  3. gather colors by id

This is bit-stable across runs and shardable (points can be sharded over the
mesh; each shard scatters into a replicated buffer reduced with min).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_INT_MAX = jnp.iinfo(jnp.int32).max


def project_points_zbuffer(
    points: jax.Array,
    colors: jax.Array,
    K: jax.Array,
    E: jax.Array,
    H: int,
    W: int,
    valid: Optional[jax.Array] = None,
    bg: Tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> jax.Array:
    """Render one view of a colored point cloud.

    Args:
        points: (N, 3) world-space points (padded to static N).
        colors: (N, 3) float colors in [0, 255].
        K: (3, 3) intrinsics.
        E: (3, 4) or (4, 4) world->camera extrinsics.
        H, W: canvas size.
        valid: optional (N,) bool mask for padding points.
        bg: background color (0-255 scale).

    Returns:
        (H, W, 3) float32 canvas holding uint8-quantized colors in [0, 255].
    """
    R = E[:3, :3]
    t = E[:3, 3]

    # f32 accumulation per the repo matmul policy (CLAUDE.md): pixel coords
    # reach ~W, where bf16 ulp is whole pixels
    pc_cam = jnp.matmul(points, R.T, preferred_element_type=jnp.float32) + t
    pc_proj = jnp.matmul(pc_cam, K.T, preferred_element_type=jnp.float32)

    z = pc_proj[:, 2]
    u = jnp.round(pc_proj[:, 0] / (z + 1e-8)).astype(jnp.int32)
    v = jnp.round(pc_proj[:, 1] / (z + 1e-8)).astype(jnp.int32)

    ok = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (z > 0)
    if valid is not None:
        ok = ok & valid

    n_px = H * W
    lin = jnp.where(ok, v * W + u, n_px)  # invalid points land in dump slot

    # Pass 1: nearest depth per pixel.
    zbuf = jnp.full((n_px + 1,), jnp.inf, dtype=z.dtype)
    zbuf = zbuf.at[lin].min(jnp.where(ok, z, jnp.inf))

    # Pass 2: lowest point index among points at the winning depth.
    at_front = ok & (z <= zbuf[lin])
    n = points.shape[0]
    pid = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    ibuf = jnp.full((n_px + 1,), _INT_MAX, dtype=jnp.int32)
    ibuf = ibuf.at[lin].min(jnp.where(at_front, pid, _INT_MAX))

    # Pass 3: gather colors (uint8 quantization mirrors the reference's
    # float->uint8 truncation in projection_utils.py:43-48).
    c8 = jnp.floor(jnp.clip(colors, 0.0, 255.0))
    hit = ibuf[:n_px] < _INT_MAX
    safe_ids = jnp.where(hit, ibuf[:n_px], 0)
    px = jnp.where(hit[:, None], c8[safe_ids], jnp.asarray(bg, dtype=c8.dtype))
    return px.reshape(H, W, 3)


@partial(jax.jit, static_argnames=("H", "W", "zbuffer_impl", "unit_colors"))
def batch_reproject(
    points: jax.Array,
    colors: jax.Array,
    intrinsics: jax.Array,
    extrinsics: jax.Array,
    H: int,
    W: int,
    valid: Optional[jax.Array] = None,
    zbuffer_impl: str = "scatter",
    unit_colors: Optional[bool] = None,
) -> jax.Array:
    """Reproject a point cloud into T cameras.

    Args:
        points: (N, 3); colors: (N, 3) in [0, 255] or [0, 1].
        intrinsics: (T, 3, 3); extrinsics: (T, 3, 4) or (T, 4, 4).
        valid: optional (N,) bool padding mask.
        zbuffer_impl: "scatter" (exact two-pass scatter-min, the parity
            default), "sorted" (exact, scatter-free), or "packed" (one
            fused scatter-min for ALL views with 10-bit-quantized depth in
            the key — the fast production path; see
            :func:`reproject_views_packed`).
        unit_colors: True = colors are [0, 1] (rescaled to 255), False =
            already [0, 255]. None (default) auto-detects by max value —
            convenient, but a genuinely near-black [0, 255] cloud (every
            channel <= 1.0) would be misread as unit-scale and brightened
            255x, so callers that KNOW their scale should say so (the
            reward path passes False; ``colored_pointcloud`` emits 0-255).

    Returns:
        (T, 3, H, W) float32 frames in [-1, 1] (reference
        ``utils/projection_utils.py:99-101`` normalization).
    """
    if unit_colors is None:
        colors = jnp.where(jnp.max(colors) <= 1.0, colors * 255.0, colors)
    elif unit_colors:
        colors = colors * 255.0
    if zbuffer_impl == "packed" and points.shape[0] >= (1 << 24):
        # beyond 2^24 points the packed key would keep < 8 depth bits —
        # too coarse a quantum; static shapes make this a trace-time choice
        import warnings

        warnings.warn(
            f"packed z-buffer supports < {1 << 24} points "
            f"(got {points.shape[0]}); falling back to exact scatter"
        )
        zbuffer_impl = "scatter"
    if zbuffer_impl == "packed":
        render = reproject_views_packed(
            points, colors, intrinsics, extrinsics, H, W, valid
        )
        frames = jnp.transpose(render, (0, 3, 1, 2))
        return (frames / 255.0) * 2.0 - 1.0
    one_view = (
        project_points_zbuffer_sorted
        if zbuffer_impl == "sorted"
        else project_points_zbuffer
    )
    # serialize views with lax.map instead of vmap: the per-view projection
    # intermediates are O(N_points) (~32 MB each at 10x518² clouds) and a
    # vmapped scatter materializes all T views' worth at once (~2 GB peak).
    # The scatter is bandwidth-bound, so serializing views costs nothing
    # measurable but lets the scorer co-reside with a 5B DiT (bench_overlap).
    render = jax.lax.map(
        lambda KE: one_view(points, colors, KE[0], KE[1], H, W, valid),
        (intrinsics, extrinsics),
    )
    frames = jnp.transpose(render, (0, 3, 1, 2))
    return (frames / 255.0) * 2.0 - 1.0


def reproject_views_packed(
    points: jax.Array,
    colors: jax.Array,
    intrinsics: jax.Array,
    extrinsics: jax.Array,
    H: int,
    W: int,
    valid: Optional[jax.Array] = None,
    bg: Tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> jax.Array:
    """All-views z-buffer splat as ONE packed-key scatter-min.

    Why: XLA:TPU scatters serialize per update, so the exact two-pass
    z-buffer costs ~300 ms/view at production shape (2.68M points, K=4
    batched) — the fused reward scorer measured GEOMETRY-bound, 3.19 s of a
    6.55 s program (tools/onchip_scorer_native.py, round 4). Two levers,
    both measured on-chip (tools/onchip_zbuffer_ab.py):

    - scatter latency amortizes sub-linearly over batched updates
      (1x2.68M: 45.7 ms; 4x batched: 99.5 ms) -> fuse ALL T views into one
      scatter over a (T*(H*W+1),) buffer;
    - the two passes (z winner, then lowest-id-at-winner) collapse to ONE
      by packing (quantized z, point id) into a single uint32 ordered key:
      min(key) = nearest 10-bit-quantized depth, lowest point id among
      quantization ties.

    Exactness: winners match the exact scatter wherever per-pixel depth
    gaps exceed the quantum (z-range / (2^zq_bits - 2); 1/1022 of range at
    the default 22-bit id field). Where two points fall in the same depth
    bucket the LOWER-ID one wins even if marginally farther — a sub-quantum
    occlusion flip with no effect at the metric level. This is the scorer's
    PRODUCTION default (``reward/processor.py`` sets
    ``VIDEOGPA_ZBUFFER=packed``); only ``batch_reproject``'s signature
    default stays ``"scatter"`` for callers that want the exact parity
    lowering, and ``VIDEOGPA_ZBUFFER=scatter`` reverts the scorer.

    The id field widens with the (static) cloud size — pid_bits =
    max(22, bits(n)), depth keeps the remaining 32 - pid_bits — down to a
    floor of 8 depth bits: clouds with n in (2^23, 2^24) run with an 8-bit
    quantum (1/254 of the z-range), the coarsest this lowering serves.
    Clouds of n >= 2^24 points (~64 frames at 518²) raise a ValueError
    here; ``batch_reproject`` applies the same cutoff and falls back to
    the exact scatter instead of raising.
    """
    T = intrinsics.shape[0]
    n = points.shape[0]
    n_px = H * W
    if n >= (1 << 24):
        # same boundary as batch_reproject's fallback: beyond 2^24 the id
        # field needs 25+ bits, leaving <= 7 depth bits — coarser than the
        # 8-bit floor this lowering serves (n = 2^24 itself is excluded so
        # the two functions share ONE cutoff).
        raise ValueError(
            f"packed z-buffer supports < {1 << 24} points (got {n}): the id "
            f"field would leave too few depth bits; use zbuffer_impl='scatter'"
        )
    pid_bits = max(22, (max(n, 2) - 1).bit_length())
    zq_bits = 32 - pid_bits
    zq_top = float((1 << zq_bits) - 2)  # max quantized depth (sentinel-safe)

    R = extrinsics[:, :3, :3]  # (T, 3, 3)
    t = extrinsics[:, :3, 3]  # (T, 3)
    # (T, N, 3): world -> camera -> pixel, all views at once (MXU batched;
    # f32 accumulation per the repo matmul policy)
    pc_cam = jnp.einsum("nd,tkd->tnk", points, R,
                        preferred_element_type=jnp.float32) + t[:, None, :]
    pc_proj = jnp.einsum("tnk,tmk->tnm", pc_cam, intrinsics,
                         preferred_element_type=jnp.float32)

    z = pc_proj[..., 2]  # (T, N)
    u = jnp.round(pc_proj[..., 0] / (z + 1e-8)).astype(jnp.int32)
    v = jnp.round(pc_proj[..., 1] / (z + 1e-8)).astype(jnp.int32)
    ok = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (z > 0)
    if valid is not None:
        ok = ok & valid[None, :]

    # per-view depth range for quantization (masked; degenerate-safe)
    zmin = jnp.min(jnp.where(ok, z, jnp.inf), axis=1, keepdims=True)
    zmax = jnp.max(jnp.where(ok, z, -jnp.inf), axis=1, keepdims=True)
    scale = zq_top / jnp.maximum(zmax - zmin, 1e-9)
    zq = jnp.clip((z - zmin) * scale, 0.0, zq_top).astype(jnp.uint32)

    pid = jax.lax.broadcasted_iota(jnp.uint32, (T, n), 1)
    sentinel = jnp.uint32(0xFFFFFFFF)  # > any valid key (zq <= zq_top)
    key = jnp.where(ok, (zq << pid_bits) | pid, sentinel)

    # one flat buffer for all views; invalid points land in their view's
    # dump slot so shapes stay static under jit
    view_base = jax.lax.broadcasted_iota(jnp.int32, (T, n), 0) * (n_px + 1)
    lin = view_base + jnp.where(ok, v * W + u, n_px)
    from videogpa_tpu.geometry import zbuffer_kernel

    if zbuffer_kernel.use_kernel():
        # tiered windowed Pallas lowering — bit-identical output, ~2-4x the
        # XLA scatter on coherent projections (see zbuffer_kernel.py)
        buf = zbuffer_kernel.scatter_min_u32(
            lin.reshape(-1), key.reshape(-1), T * (n_px + 1)
        )
    else:
        buf = jnp.full((T * (n_px + 1),), sentinel, jnp.uint32)
        buf = buf.at[lin.reshape(-1)].min(key.reshape(-1))

    win = buf.reshape(T, n_px + 1)[:, :n_px]
    hit = win != sentinel
    ids = (win & jnp.uint32((1 << pid_bits) - 1)).astype(jnp.int32)
    c8 = jnp.floor(jnp.clip(colors, 0.0, 255.0))
    px = jnp.where(
        hit[..., None],
        c8[jnp.where(hit, ids, 0)],
        jnp.asarray(bg, dtype=c8.dtype),
    )
    return px.reshape(T, H, W, 3)


def project_points_zbuffer_sorted(
    points: jax.Array,
    colors: jax.Array,
    K: jax.Array,
    E: jax.Array,
    H: int,
    W: int,
    valid: Optional[jax.Array] = None,
    bg: Tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> jax.Array:
    """Scatter-free variant of :func:`project_points_zbuffer`.

    Identical output (same nearest-depth winner, same lowest-point-index
    tie-break), different lowering: instead of two scatter-mins over the
    canvas, sort the points by (pixel, z, id) lexicographically and binary-
    search each pixel's first entry (``searchsorted``) — sort + gather only,
    no scatter. Exists because XLA:TPU scatters serialize; A/B on-chip and
    keep whichever wins (see ``zbuffer_impl`` in ``batch_reproject``).
    """
    R = E[:3, :3]
    t = E[:3, 3]

    # f32 accumulation per the repo matmul policy (CLAUDE.md): pixel coords
    # reach ~W, where bf16 ulp is whole pixels
    pc_cam = jnp.matmul(points, R.T, preferred_element_type=jnp.float32) + t
    pc_proj = jnp.matmul(pc_cam, K.T, preferred_element_type=jnp.float32)

    z = pc_proj[:, 2]
    u = jnp.round(pc_proj[:, 0] / (z + 1e-8)).astype(jnp.int32)
    v = jnp.round(pc_proj[:, 1] / (z + 1e-8)).astype(jnp.int32)

    ok = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (z > 0)
    if valid is not None:
        ok = ok & valid

    n_px = H * W
    lin = jnp.where(ok, v * W + u, n_px)  # invalid points in the dump slot

    n = points.shape[0]
    pid = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    # lexicographic (lin, z, pid): after the sort, the first entry of each
    # pixel's run is the nearest-depth point, lowest id among depth ties —
    # exactly the scatter version's winner
    lin_s, _, pid_s = jax.lax.sort(
        (lin, jnp.where(ok, z, jnp.inf), pid), num_keys=2
    )
    first = jnp.searchsorted(lin_s, jnp.arange(n_px, dtype=lin_s.dtype))
    hit = lin_s[jnp.minimum(first, n - 1)] == jnp.arange(n_px, dtype=lin_s.dtype)
    hit = hit & (first < n)
    win = pid_s[jnp.minimum(first, n - 1)]

    c8 = jnp.floor(jnp.clip(colors, 0.0, 255.0))
    px = jnp.where(
        hit[:, None], c8[jnp.where(hit, win, 0)], jnp.asarray(bg, dtype=c8.dtype)
    )
    return px.reshape(H, W, 3)
