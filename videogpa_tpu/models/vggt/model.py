"""VGGT top-level model (JAX).

Parity target: reference ``vggt/models/vggt.py:17-96``. Forward returns the
prediction dict consumed by the reward pipeline
(``utils/model_utils.py:89-122``): pose_enc, depth(+conf), world_points(+conf).

The aggregator trunk runs in the caller's compute dtype (bfloat16 on TPU);
heads run in float32, matching the reference's autocast policy.

The track head (reference ``vggt/heads/track_head.py``) is available via
``enable_track``/``query_points`` (unused by the VideoGPA scoring path).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from videogpa_tpu.models.vggt.aggregator import aggregator_forward, aggregator_init
from videogpa_tpu.models.vggt.config import VGGTConfig
from videogpa_tpu.models.vggt.heads import (
    camera_head_forward,
    camera_head_init,
    dpt_head_forward,
    dpt_head_init,
)


def vggt_init(key: jax.Array, cfg: VGGTConfig, dtype=jnp.float32,
              enable_track: bool = False) -> dict:
    k_agg, k_cam, k_depth, k_point, k_track = jax.random.split(key, 5)
    params = {"aggregator": aggregator_init(k_agg, cfg, dtype)}
    if cfg.enable_camera:
        params["camera_head"] = camera_head_init(k_cam, cfg, dtype)
    if cfg.enable_depth:
        params["depth_head"] = dpt_head_init(k_depth, cfg, output_dim=2, dtype=dtype)
    if cfg.enable_point:
        params["point_head"] = dpt_head_init(k_point, cfg, output_dim=4, dtype=dtype)
    if enable_track:
        from videogpa_tpu.models.vggt.track import track_head_init

        params["track_head"] = track_head_init(k_track, cfg, dtype=dtype)
    return params


def vggt_forward(
    params: dict,
    images: jax.Array,
    cfg: VGGTConfig,
    attn_impl: str = "auto",
    compute_dtype=jnp.bfloat16,
    query_points=None,
    track_kwargs: dict = None,
    dpt_chunk: int = 8,
    dpt_dtype=jnp.float32,
) -> Dict[str, jax.Array]:
    """Args:
        images: (B, S, 3, H, W) in [0, 1].

    Returns dict with (shapes as the reference, ``vggt/models/vggt.py:40-55``):
        pose_enc (B, S, 9); depth (B, S, H, W, 1); depth_conf (B, S, H, W);
        world_points (B, S, H, W, 3); world_points_conf (B, S, H, W);
        images (input, for color extraction).
    """
    if images.ndim == 4:
        images = images[None]
    B, S, _, H, W = images.shape

    # only the DPT taps + final layer are consumed; keeping just those bounds
    # activation memory at O(5) layers instead of O(depth)
    keep = tuple(sorted(set(cfg.dpt_intermediate_layers) | {cfg.depth - 1}))
    pos = {layer: i for i, layer in enumerate(keep)}
    layer_outputs, _ = aggregator_forward(
        params["aggregator"], images, cfg, attn_impl, compute_dtype,
        keep_layers=keep,
    )
    # heads run f32 (reference autocast-off policy), but the cast happens at
    # each consumer's slice (_dpt_core per chunk, camera tokens below) —
    # casting the whole (5, B, S, P, 2C) stack here would materialize an
    # extra ~0.5 GB f32 copy at S=10/518², which matters when the scorer
    # shares the chip with a resident 5B DiT (bench_overlap)
    import dataclasses

    hcfg = dataclasses.replace(
        cfg,
        dpt_intermediate_layers=tuple(pos[l] for l in cfg.dpt_intermediate_layers),
    )

    preds: Dict[str, jax.Array] = {"images": images}
    if "camera_head" in params:
        cam_tokens = layer_outputs[pos[cfg.depth - 1]][:, :, 0].astype(jnp.float32)
        pose_enc_list = camera_head_forward(params["camera_head"], cam_tokens, cfg, attn_impl)
        preds["pose_enc"] = pose_enc_list[-1]
        preds["pose_enc_list"] = pose_enc_list
    if "depth_head" in params:
        depth, depth_conf = dpt_head_forward(
            params["depth_head"], layer_outputs, hcfg, (H, W), "exp", "expp1",
            chunk_size=dpt_chunk, compute_dtype=dpt_dtype,
        )
        preds["depth"] = depth
        preds["depth_conf"] = depth_conf
    if "point_head" in params:
        pts, conf = dpt_head_forward(
            params["point_head"], layer_outputs, hcfg, (H, W), "inv_log", "expp1",
            chunk_size=dpt_chunk, compute_dtype=dpt_dtype,
        )
        preds["world_points"] = pts
        preds["world_points_conf"] = conf
    if "track_head" in params and query_points is not None:
        from videogpa_tpu.models.vggt.track import track_head_forward

        if query_points.ndim == 2:
            query_points = query_points[None]
        track_list, vis, conf = track_head_forward(
            params["track_head"], layer_outputs, (H, W), query_points, hcfg,
            **(track_kwargs or {}),
        )
        preds["track"] = track_list[-1]
        preds["vis"] = vis
        preds["conf"] = conf
    return preds
