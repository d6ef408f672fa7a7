"""Nested DA3: anyview branch + metric-mono branch with scale alignment.

Parity target: reference ``depth_anything_3/model/da3.py::NestedDepthAnything3Net``
(:301-435) and ``utils/alignment.py`` (least_squares_scale_scalar :23,
compute_alignment_mask :68, apply_metric_scaling :118,
set_sky_regions_to_max_depth :136) — preset ``da3nested-giant-large``.

Two independent forwards (each a single jitted program) and a closed-form
host-side alignment: the metric branch's focal-scaled depth anchors the
anyview branch's relative depth via a least-squares scalar, the trajectory
is rescaled with it, and sky pixels (metric branch's sky head) are pushed
to the 99th-percentile depth.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from videogpa_tpu.models.da3.config import DA3Config
from videogpa_tpu.models.da3.model import DA3Prediction, da3_inference
from videogpa_tpu.models.da3.mono import compute_sky_mask, mono_inference


def least_squares_scale_scalar(a: np.ndarray, b: np.ndarray,
                               eps: float = 1e-12) -> float:
    """Scale s with a ~= s * b (reference utils/alignment.py:23-51)."""
    num = float(np.dot(a.reshape(-1), b.reshape(-1)))
    den = max(float(np.dot(b.reshape(-1), b.reshape(-1))), eps)
    return num / den


def apply_metric_scaling(depth: np.ndarray, intrinsics: np.ndarray,
                         scale_factor: float = 300.0) -> np.ndarray:
    """Focal-normalized metric scaling (reference utils/alignment.py:118-133).

    depth (S, H, W); intrinsics (S, 3, 3) pixel units.
    """
    focal = (intrinsics[:, 0, 0] + intrinsics[:, 1, 1]) / 2
    return depth * (focal[:, None, None] / scale_factor)


def compute_alignment_mask(
    depth_conf: np.ndarray,
    non_sky_mask: np.ndarray,
    depth: np.ndarray,
    metric_depth: np.ndarray,
    median_conf: float,
    min_depth_threshold: float = 1e-3,
    min_metric_depth_threshold: float = 1e-2,
) -> np.ndarray:
    return (
        (depth_conf >= median_conf)
        & non_sky_mask
        & (metric_depth > min_metric_depth_threshold)
        & (depth > min_depth_threshold)
        # degenerate cameras can produce non-finite focal-scaled depth;
        # they must not poison the least-squares scale
        & np.isfinite(metric_depth)
        & np.isfinite(depth)
    )


def _sample_for_quantile(x: np.ndarray, max_samples: int = 100_000) -> np.ndarray:
    if x.size <= max_samples:
        return x
    rng = np.random.default_rng(0)
    return x.reshape(-1)[rng.permutation(x.size)[:max_samples]]


@dataclasses.dataclass
class NestedPrediction(DA3Prediction):
    is_metric: int = 0
    scale_factor: float = 1.0


def align_to_metric(
    pred: DA3Prediction,
    metric_depth: np.ndarray,  # (S, H, W) focal-scaled metric depth
    sky: Optional[np.ndarray],  # (S, H, W) metric branch sky logits
    sky_depth_def: float = 200.0,
) -> NestedPrediction:
    """The nested net's post-forward alignment (da3.py:367-435)."""
    depth = pred.depth.copy()
    conf = None if pred.conf is None else pred.conf.copy()
    extr = pred.extrinsics.copy()

    non_sky = (compute_sky_mask(sky, 0.3) if sky is not None
               else np.ones_like(depth, bool))
    if non_sky.sum() <= 10:
        raise ValueError("Insufficient non-sky pixels for alignment")

    median_conf = float(np.quantile(
        _sample_for_quantile(conf[non_sky]), 0.5
    )) if conf is not None else -np.inf
    align = compute_alignment_mask(
        conf if conf is not None else np.ones_like(depth),
        non_sky, depth, metric_depth, median_conf,
    )
    scale = (least_squares_scale_scalar(metric_depth[align], depth[align])
             if align.any() else 1.0)
    if not np.isfinite(scale) or scale <= 0:
        scale = 1.0  # keep relative scale rather than destroy the output
    depth *= scale
    extr[:, :3, 3] *= scale

    # sky pixels -> min(q99 non-sky depth, sky_depth_def), conf -> 1
    non_sky_max = min(
        float(np.quantile(_sample_for_quantile(depth[non_sky]), 0.99)),
        sky_depth_def,
    )
    depth[~non_sky] = non_sky_max
    if conf is not None:
        conf[~non_sky] = 1.0

    return NestedPrediction(
        depth=depth, conf=conf, extrinsics=extr, intrinsics=pred.intrinsics,
        processed_images=pred.processed_images, gaussians=pred.gaussians,
        is_metric=1, scale_factor=scale,
    )


def nested_inference(
    anyview_params: dict,
    anyview_cfg: DA3Config,
    metric_params: dict,
    metric_cfg: DA3Config,
    frames: np.ndarray,  # (S, H, W, 3) uint8, /14-divisible
    attn_impl: str = "auto",
    compute_dtype=jnp.bfloat16,
) -> NestedPrediction:
    """Run both branches and align (reference forward :329-366)."""
    pred = da3_inference(anyview_params, frames, anyview_cfg,
                         attn_impl=attn_impl, compute_dtype=compute_dtype)
    raw_metric, sky = mono_inference(
        metric_params, frames, metric_cfg, attn_impl=attn_impl,
        compute_dtype=compute_dtype, sky_postprocess=False,
    )
    metric_depth = apply_metric_scaling(raw_metric, pred.intrinsics)
    return align_to_metric(pred, metric_depth, sky)
