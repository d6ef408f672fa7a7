"""SuperPoint keypoint detector + descriptor in JAX.

Rebuild of MagicLeap's SuperPoint as used by the reference's LightGlue
matcher (reference ``metrics/epipolar.py:72-139`` via the ``lightglue``
package): shared VGG-style encoder, a 65-channel detector head (8x8 cells +
dustbin, softmax + depth-to-space) and a 256-d descriptor head with bicubic
upsampling and L2 normalization. Keypoint selection (NMS + top-k) runs with
static shapes for jit.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videogpa_tpu.convert import t_conv2d
from videogpa_tpu.ops import layers as L


@dataclasses.dataclass(frozen=True)
class SuperPointConfig:
    descriptor_dim: int = 256
    channels: Tuple[int, ...] = (64, 64, 64, 64, 128, 128, 128, 128)
    nms_radius: int = 4
    max_num_keypoints: int = 2048
    detection_threshold: float = 0.0005


def superpoint_init(key: jax.Array, cfg: SuperPointConfig = SuperPointConfig(),
                    dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 16))
    c = cfg.channels
    p = {}
    in_ch = 1
    for i, out_ch in enumerate(c):
        p[f"conv{i // 2 + 1}{'ab'[i % 2]}"] = L.conv2d_init(
            next(keys), in_ch, out_ch, 3, dtype=dtype
        )
        in_ch = out_ch
    p["convPa"] = L.conv2d_init(next(keys), c[-1], 256, 3, dtype=dtype)
    p["convPb"] = L.conv2d_init(next(keys), 256, 65, 1, dtype=dtype)
    p["convDa"] = L.conv2d_init(next(keys), c[-1], 256, 3, dtype=dtype)
    p["convDb"] = L.conv2d_init(next(keys), 256, cfg.descriptor_dim, 1, dtype=dtype)
    return p


def _pool(x):
    return -jax.lax.reduce_window(
        -x, jnp.inf, jax.lax.min, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


def superpoint_forward(params: dict, image: jax.Array, cfg: SuperPointConfig = SuperPointConfig()):
    """image: (B, 1, H, W) in [0, 1] (H, W divisible by 8).

    Returns (scores (B, H, W), descriptors (B, D, H/8, W/8)).
    """
    x = image
    relu = jax.nn.relu
    x = relu(L.conv2d(params["conv1a"], x, padding=1))
    x = relu(L.conv2d(params["conv1b"], x, padding=1))
    x = _pool(x)
    x = relu(L.conv2d(params["conv2a"], x, padding=1))
    x = relu(L.conv2d(params["conv2b"], x, padding=1))
    x = _pool(x)
    x = relu(L.conv2d(params["conv3a"], x, padding=1))
    x = relu(L.conv2d(params["conv3b"], x, padding=1))
    x = _pool(x)
    x = relu(L.conv2d(params["conv4a"], x, padding=1))
    x = relu(L.conv2d(params["conv4b"], x, padding=1))

    # detector: 65ch softmax, drop dustbin, depth-to-space 8x
    sc = relu(L.conv2d(params["convPa"], x, padding=1))
    sc = L.conv2d(params["convPb"], sc)
    sc = jax.nn.softmax(sc, axis=1)[:, :64]
    B, _, Hc, Wc = sc.shape
    sc = sc.reshape(B, 8, 8, Hc, Wc).transpose(0, 3, 1, 4, 2).reshape(B, Hc * 8, Wc * 8)

    de = relu(L.conv2d(params["convDa"], x, padding=1))
    de = L.conv2d(params["convDb"], de)
    de = de / jnp.maximum(jnp.linalg.norm(de, axis=1, keepdims=True), 1e-8)
    return sc, de


def _nms(scores: jax.Array, radius: int) -> jax.Array:
    """Keep only local maxima within a (2r+1)^2 window."""
    k = 2 * radius + 1
    pooled = jax.lax.reduce_window(
        scores, -jnp.inf, jax.lax.max, (1, k, k), (1, 1, 1),
        [(0, 0), (radius, radius), (radius, radius)],
    )
    return jnp.where(scores == pooled, scores, 0.0)


def extract_keypoints(
    scores: jax.Array,
    descriptors: jax.Array,
    cfg: SuperPointConfig = SuperPointConfig(),
):
    """Static-shape keypoint extraction.

    Args:
        scores: (B, H, W); descriptors: (B, D, H/8, W/8).

    Returns:
        (kpts (B, K, 2) xy pixels, kp_scores (B, K), desc (B, K, D),
        valid (B, K) bool) with K = cfg.max_num_keypoints.
    """
    B, H, W = scores.shape
    K = cfg.max_num_keypoints
    s = _nms(scores, cfg.nms_radius).reshape(B, -1)
    top, idx = jax.lax.top_k(s, K)
    ys = idx // W
    xs = idx % W
    kpts = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)
    valid = top > cfg.detection_threshold

    # bilinear-sample descriptors at keypoint locations (desc grid is H/8)
    D = descriptors.shape[1]

    def sample_one(desc, kp):
        from videogpa_tpu.ops.resize import grid_sample_bilinear

        u = (kp[:, 0] - 3.5) / 8.0
        v = (kp[:, 1] - 3.5) / 8.0
        out = jax.vmap(lambda ch: grid_sample_bilinear(ch, u, v))(desc)  # (D, K)
        return out.T

    desc = jax.vmap(sample_one)(descriptors, kpts)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    return kpts, top, desc, valid


def convert_superpoint(sd: Mapping[str, np.ndarray]) -> dict:
    """Convert the magicleap superpoint_v1 state dict (torch conv layout)."""
    names = ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
             "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"]
    return {n: t_conv2d(sd, n) for n in names}
