"""Generic torch-checkpoint -> JAX pytree conversion helpers.

All model-family converters (VGGT, DA3, CogVideoX, Wan, LPIPS) build on these
primitives. Input is a flat ``{torch_key: np.ndarray}`` state dict (load with
``safetensors.numpy`` or ``torch.load`` + ``.numpy()``); output leaves are
``jnp`` arrays in this framework's layouts:

- Linear:          torch (out, in)        -> kernel (in, out)
- Conv2d:          torch (O, I, kh, kw)   -> kernel HWIO (kh, kw, I, O)
- ConvTranspose2d: torch (I, O, kh, kw)   -> kernel HWIO (kh, kw, I, O)
- LayerNorm:       weight/bias            -> scale/bias
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np


def t_linear(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    p = {"kernel": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def t_layernorm(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    if f"{prefix}.weight" not in sd:
        return {}
    return {
        "scale": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def t_rmsnorm(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {"scale": jnp.asarray(sd[f"{prefix}.weight"])}


def t_conv2d(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    w = np.asarray(sd[f"{prefix}.weight"])
    p = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def t_conv_transpose2d(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    w = np.asarray(sd[f"{prefix}.weight"])  # (I, O, kh, kw)
    p = {"kernel": jnp.asarray(w.transpose(2, 3, 0, 1))}
    if f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def t_array(sd: Mapping[str, np.ndarray], key: str) -> jnp.ndarray:
    return jnp.asarray(sd[key])


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a checkpoint file (.safetensors or torch .pt/.bin) to numpy."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
            for k, v in sd.items()}
