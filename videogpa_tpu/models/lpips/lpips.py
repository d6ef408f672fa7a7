"""LPIPS (Learned Perceptual Image Patch Similarity), VGG16 variant, in JAX.

Parity target: the ``lpips.LPIPS(net='vgg')`` network used throughout the
reference reward pipeline (``metrics/lpips.py:12-19``,
``train/01_preference_pair.py:102``):

    input in [-1, 1]
    -> per-channel shift/scale ("scaling layer")
    -> VGG16 features at relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
    -> channel-unit-normalize, squared diff
    -> learned 1x1 "lin" weights, spatial mean, sum over the 5 taps

The VGG16 trunk is a straight conv stack — pure MXU work for XLA. Weight
conversion consumes a torchvision ``vgg16.features`` state dict plus the
lpips ``lin*`` checkpoint.
"""

from __future__ import annotations

from typing import List, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from videogpa_tpu.convert import t_conv2d
from videogpa_tpu.ops import layers as L

# VGG16 'features' layout: conv indices and the relu tap points
_VGG16_CONVS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_VGG16_CHANNELS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
# taps AFTER relu of conv index (torchvision feature indices 3, 8, 15, 22, 29)
_TAP_AFTER_CONV = [1, 3, 6, 9, 12]  # position in _VGG16_CONVS
_POOL_AFTER_CONV = [1, 3, 6, 9]  # maxpool after these conv positions

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def lpips_init(key: jax.Array, dtype=jnp.float32) -> dict:
    """Random-init LPIPS params (structure only — use convert_lpips for real)."""
    keys = jax.random.split(key, len(_VGG16_CONVS) + 5)
    convs = []
    in_ch = 3
    for i, out_ch in enumerate(_VGG16_CHANNELS):
        convs.append(L.conv2d_init(keys[i], in_ch, out_ch, 3, dtype=dtype))
        in_ch = out_ch
    tap_channels = [64, 128, 256, 512, 512]
    lins = [
        L.conv2d_init(keys[len(_VGG16_CONVS) + i], c, 1, 1, bias=False, dtype=dtype)
        for i, c in enumerate(tap_channels)
    ]
    return {"convs": convs, "lins": lins}


def _vgg_features(params: dict, x: jax.Array) -> List[jax.Array]:
    feats = []
    h = x
    for i, p in enumerate(params["convs"]):
        h = L.conv2d(p, h, padding=1)
        h = jax.nn.relu(h)
        if i in _TAP_AFTER_CONV:
            feats.append(h)
        if i in _POOL_AFTER_CONV:
            h = -jax.lax.reduce_window(
                -h, jnp.inf, jax.lax.min, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            )
    return feats


def _unit_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(x ** 2, axis=1, keepdims=True))
    return x / (norm + eps)


def lpips_distance(params: dict, x: jax.Array, y: jax.Array) -> jax.Array:
    """Per-sample LPIPS distance.

    Args:
        x, y: (B, 3, H, W) in [-1, 1].

    Returns:
        (B,) distances.
    """
    shift = jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)
    scale = jnp.asarray(_SCALE).reshape(1, 3, 1, 1)
    fx = _vgg_features(params, (x - shift) / scale)
    fy = _vgg_features(params, (y - shift) / scale)

    total = jnp.zeros((x.shape[0],), jnp.float32)
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        w = L.conv2d(params["lins"][i], d)  # (B, 1, H, W)
        total = total + jnp.mean(w, axis=(1, 2, 3))
    return total


def convert_lpips(
    vgg_sd: Mapping[str, np.ndarray], lin_sd: Mapping[str, np.ndarray]
) -> dict:
    """Build params from torchvision vgg16 ``features.*`` + lpips ``lin*.*``.

    Args:
        vgg_sd: keys like ``features.0.weight`` (torchvision vgg16).
        lin_sd: keys like ``lin0.model.1.weight`` (lpips package checkpoint).
    """
    convs = [t_conv2d(vgg_sd, f"features.{idx}") for idx in _VGG16_CONVS]
    lins = []
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key not in lin_sd:
            key = f"lins.{i}.model.1.weight"
        w = np.asarray(lin_sd[key])  # (1, C, 1, 1)
        lins.append({"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))})
    return {"convs": convs, "lins": lins}
