"""Colored point cloud extraction with confidence filtering (static shapes).

Parity target: reference ``utils/pointcloud_utils.py:10-80`` — keep-fraction
top-k confidence filtering. The reference materializes a ragged filtered
array; for jit-stable shapes we return the full point set plus a boolean
keep-mask (the splatting renderer consumes the mask directly).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def confidence_mask(conf: jax.Array, conf_thres: float) -> jax.Array:
    """Keep-mask over flattened confidences.

    conf_thres <= 0: keep all finite conf > 1e-5. Otherwise keep the top
    (1 - conf_thres/100) fraction of valid points (>= the k-th value), like
    the reference's GPU top-k.
    """
    vals = conf.reshape(-1)
    valid = jnp.isfinite(vals) & (vals > 1e-5)
    if conf_thres <= 0:
        return valid

    keep_frac = max(0.0, min(1.0, 1.0 - conf_thres / 100.0))
    n_valid = jnp.sum(valid)
    k = jnp.maximum(1, jnp.ceil(n_valid * keep_frac).astype(jnp.int32))
    sorted_vals = jnp.sort(jnp.where(valid, vals, -jnp.inf))[::-1]
    thr = sorted_vals[jnp.maximum(k - 1, 0)]
    return valid & (vals >= thr)


def colored_pointcloud(
    predictions: Dict[str, jax.Array], mode: str = "depth", conf_thres: float = 0.0
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Extract (points (N,3), colors (N,3) in [0,255], keep-mask (N,)).

    predictions: dict with world_points_from_depth/world_points (+ conf) and
    images (S, 3, H, W) in [0, 1] (reference layout after batch squeeze).
    """
    if "pointmap" in mode.lower() and "world_points" in predictions:
        points = predictions["world_points"]
        conf = predictions.get("world_points_conf", jnp.ones(points.shape[:-1]))
    else:
        points = predictions["world_points_from_depth"]
        conf = predictions.get("depth_conf", jnp.ones(points.shape[:-1]))

    vertices = points.reshape(-1, 3)
    images = predictions["images"]
    if images.ndim == 4 and images.shape[1] == 3:
        colors = jnp.transpose(images, (0, 2, 3, 1))
    else:
        colors = images
    colors = colors.reshape(-1, 3) * 255.0
    mask = confidence_mask(conf, conf_thres)
    return vertices, colors, mask


def save_ply(points, colors, path: str) -> None:
    """Binary little-endian PLY writer (reference ``pointcloud_utils.py:82-106``)."""
    import numpy as np

    P = np.asarray(points, np.float32)
    C = np.clip(np.asarray(colors), 0, 255).astype(np.uint8)
    n = P.shape[0]
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    rec = np.empty(
        n,
        dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
               ("red", "u1"), ("green", "u1"), ("blue", "u1")],
    )
    rec["x"], rec["y"], rec["z"] = P[:, 0], P[:, 1], P[:, 2]
    rec["red"], rec["green"], rec["blue"] = C[:, 0], C[:, 1], C[:, 2]
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())
