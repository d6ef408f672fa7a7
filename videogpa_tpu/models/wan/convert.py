"""Wan2.2 checkpoint -> JAX params conversion.

Key layout follows the Wan repo's WanModel module tree (Sequential indices:
text/time_embedding = [Linear, GELU/SiLU, Linear] -> .0/.2;
time_projection = [SiLU, Linear] -> .1; ffn = [Linear, GELU, Linear] -> .0/.2).
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

from videogpa_tpu.convert import t_layernorm, t_linear, t_rmsnorm
from videogpa_tpu.models.wan.config import WanConfig
from videogpa_tpu.ops import layers as L


def _attn(sd, pfx):
    return {
        "q": t_linear(sd, f"{pfx}.q"),
        "k": t_linear(sd, f"{pfx}.k"),
        "v": t_linear(sd, f"{pfx}.v"),
        "o": t_linear(sd, f"{pfx}.o"),
        "norm_q": t_rmsnorm(sd, f"{pfx}.norm_q"),
        "norm_k": t_rmsnorm(sd, f"{pfx}.norm_k"),
    }


def _convert_block(sd, pfx):
    return {
        "norm3": t_layernorm(sd, f"{pfx}.norm3"),
        "self_attn": _attn(sd, f"{pfx}.self_attn"),
        "cross_attn": _attn(sd, f"{pfx}.cross_attn"),
        "ffn": {
            "fc1": t_linear(sd, f"{pfx}.ffn.0"),
            "fc2": t_linear(sd, f"{pfx}.ffn.2"),
        },
        "modulation": jnp.asarray(sd[f"{pfx}.modulation"]),
    }


def convert_wan(sd: Mapping[str, np.ndarray], cfg: WanConfig) -> dict:
    w = np.asarray(sd["patch_embedding.weight"])  # (O, I, kt, kh, kw)
    blocks = [
        _convert_block(sd, f"blocks.{i}") for i in range(cfg.num_layers)
    ]
    return {
        "patch_embedding": {
            "kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
            "bias": jnp.asarray(sd["patch_embedding.bias"]),
        },
        "text_embedding": {
            "fc1": t_linear(sd, "text_embedding.0"),
            "fc2": t_linear(sd, "text_embedding.2"),
        },
        "time_embedding": {
            "fc1": t_linear(sd, "time_embedding.0"),
            "fc2": t_linear(sd, "time_embedding.2"),
        },
        "time_projection": t_linear(sd, "time_projection.1"),
        "blocks": L.stack_params(blocks),
        "head": {
            "head": t_linear(sd, "head.head"),
            "modulation": jnp.asarray(sd["head.modulation"]),
        },
    }


def convert_wan_vae(sd: Mapping[str, np.ndarray], cfg: WanConfig) -> dict:
    """Wan VAE conversion — layout mapping is checkpoint-dependent; until real
    weights are available for key inspection this raises with guidance."""
    raise NotImplementedError(
        "Wan VAE checkpoint conversion requires the released Wan2.2 VAE key "
        "layout; inspect the checkpoint and extend convert_wan_vae"
    )
