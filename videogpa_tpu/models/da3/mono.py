"""DA3 mono / metric presets: plain DINOv2 trunk + single-branch DPT + sky.

Parity targets: reference ``configs/da3mono-large.yaml`` /
``da3metric-large.yaml`` (ViT-L, out_layers [4, 11, 17, 23], alternating
attention disabled via ``alt_start: -1``, single DPT head dim_in 1024 with
sky head), ``model/dpt.py`` (main + sky branches off shared neck) and
``model/da3.py::_process_mono_sky_estimation`` (:155-179) with
``utils/alignment.py::compute_sky_mask`` / ``set_sky_regions_to_max_depth``.

TPU shape: the trunk is the same stacked-params ``lax.scan`` used by the
multi-view backbone, split into segments at the out_layers so intermediate
features fall out of segment boundaries without materializing every layer.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videogpa_tpu.models.da3.config import DA3Config
from videogpa_tpu.models.da3.vit import _interp_pos, _pre_cfg, aavit_init
from videogpa_tpu.models.vggt.config import VGGTConfig
from videogpa_tpu.models.vggt.heads import dpt_head_forward, dpt_head_init
from videogpa_tpu.ops import layers as L
from videogpa_tpu.ops.transformer import block_apply


def mono_config(large: bool = True) -> DA3Config:
    """da3mono-large / da3metric-large trunk shape (alt attention off)."""
    return DA3Config(out_layers=(4, 11, 17, 23), alt_start=-1)


def _head_vcfg(cfg: DA3Config) -> VGGTConfig:
    return VGGTConfig(
        embed_dim=cfg.embed_dim,
        num_register_tokens=0,
        dpt_features=cfg.dpt_features,
        dpt_out_channels=cfg.dpt_out_channels,
        dpt_intermediate_layers=(0, 1, 2, 3),
        patch_size=cfg.patch_size,
    )


def mono_init(key: jax.Array, cfg: DA3Config, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    # all blocks are plain DINOv2 blocks: reuse aavit_init with the
    # alternating phase collapsed to zero layers
    trunk_cfg = dataclasses.replace(cfg, alt_start=cfg.depth)
    backbone = aavit_init(k1, trunk_cfg, dtype)
    backbone.pop("camera_token")  # mono has no camera conditioning
    backbone.pop("blocks_alt")
    return {
        "backbone": backbone,
        "head": dpt_head_init(
            k2, _head_vcfg(cfg), output_dim=1, dtype=dtype,
            dim_in=cfg.embed_dim, sky_head=True, input_norm=False,
        ),
    }


def mono_vit_forward(
    params: dict, images: jax.Array, cfg: DA3Config, attn_impl: str = "auto",
) -> jax.Array:
    """images (B, 3, H, W) -> stacked out-layer tokens (4, B, P, C), normed.

    Plain DINOv2 forward; the stacked per-layer params scan in segments whose
    boundaries are cfg.out_layers, so only those activations are kept.
    """
    B, _, H, W = images.shape
    hg, wg = H // cfg.patch_size, W // cfg.patch_size
    C = cfg.embed_dim

    x = L.conv2d(params["patch_embed"], images, stride=cfg.patch_size)
    x = x.reshape(B, C, hg * wg).transpose(0, 2, 1)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B, 1, C))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _interp_pos(params["pos_embed"], hg, wg).astype(x.dtype)

    pre_cfg = _pre_cfg(cfg)

    def body(carry, lp):
        return block_apply(lp, carry, pre_cfg, attn_impl=attn_impl), None

    outs = []
    start = 0
    for end in cfg.out_layers:
        seg = jax.tree.map(lambda a: a[start : end + 1], params["blocks_pre"])
        x, _ = jax.lax.scan(body, x, seg)
        # the trunk's final norm is a default nn.LayerNorm (eps 1e-5) — the
        # blocks' 1e-6 does not apply here (vision_transformer.py:218)
        outs.append(L.layernorm(params["norm"], x))
        start = end + 1
    return jnp.stack(outs)  # (4, B, P, C)


def mono_forward(
    params: dict,
    images: jax.Array,  # (B, S, 3, H, W) ImageNet-normalized
    cfg: DA3Config,
    attn_impl: str = "auto",
    compute_dtype=jnp.float32,
) -> dict:
    """Returns {"depth": (B, S, H, W), "sky": (B, S, H, W)}."""
    B, S, _, H, W = images.shape
    tokens = mono_vit_forward(
        params["backbone"],
        images.reshape(B * S, 3, H, W).astype(compute_dtype),
        cfg, attn_impl,
    )  # (4, B*S, P, C)
    tokens = tokens[:, :, None].astype(jnp.float32)  # heads run f32 (autocast off)
    depth, _, sky = dpt_head_forward(
        params["head"], tokens, _head_vcfg(cfg), (H, W),
        activation="exp", with_conf=False, use_pos_embed=False,
        inplace_relu=False,  # DA3 fusion: raw-x residual (model/dpt.py:347)
    )
    return {
        "depth": depth[..., 0].reshape(B, S, H, W),
        "sky": sky.reshape(B, S, H, W),
    }


# ---------------------------------------------------------------------------
# sky post-processing (reference model/da3.py:155-179, utils/alignment.py)
# ---------------------------------------------------------------------------

def compute_sky_mask(sky: np.ndarray, threshold: float = 0.3) -> np.ndarray:
    """True where NOT sky (reference utils/alignment.py:54-66)."""
    return sky < threshold


def apply_mono_sky_postprocess(
    depth: np.ndarray, sky: Optional[np.ndarray], threshold: float = 0.3,
) -> np.ndarray:
    """Set sky regions to the 99th-percentile non-sky depth."""
    if sky is None:
        return depth
    non_sky = compute_sky_mask(sky, threshold)
    if non_sky.sum() <= 10 or (~non_sky).sum() <= 10:
        return depth
    vals = depth[non_sky]
    if vals.size > 100_000:
        rng = np.random.default_rng(0)
        vals = vals[rng.integers(0, vals.size, 100_000)]
    max_depth = float(np.quantile(vals, 0.99))
    out = depth.copy()
    out[~non_sky] = max_depth
    return out


# module-level jit: a per-call jax.jit wrapper would recompile every call
_mono_forward_j = jax.jit(mono_forward, static_argnums=(2, 3, 4))


def mono_inference(
    params: dict,
    frames: np.ndarray,  # (S, H, W, 3) uint8, /14-divisible
    cfg: DA3Config,
    attn_impl: str = "auto",
    compute_dtype=jnp.bfloat16,
    sky_postprocess: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-frame monocular depth + sky map. Returns (depth, sky), (S, H, W)."""
    imgs = frames.astype(np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    normed = ((imgs - mean) / std).transpose(0, 3, 1, 2)[None]
    out = _mono_forward_j(params, jnp.asarray(normed), cfg, attn_impl,
                          compute_dtype)
    depth = np.asarray(out["depth"][0], np.float32)
    sky = np.asarray(out["sky"][0], np.float32)
    if sky_postprocess:
        depth = np.stack(
            [apply_mono_sky_postprocess(d, s) for d, s in zip(depth, sky)]
        )
    return depth, sky
