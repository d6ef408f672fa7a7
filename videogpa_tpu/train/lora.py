"""LoRA adapters for the CogVideoX/Wan DiT attention projections.

Parity targets:
- training config: r=64, alpha=128, targets to_q/to_k/to_v/to_out.0
  (reference ``train/CogVideoX-I2V-5B/03_train.py:64-67``,
  ``checkpoints/VideoGPA-I2V-lora/adapter_config.json``)
- HARD interop requirement (BASELINE.md): adapters trained here must load
  back into the reference HF pipelines unchanged — PEFT safetensors
  (``base_model.model.<path>.lora_A/B.weight``) + adapter_config.json.
- three scaling conventions at inference (SURVEY.md §7 hard parts):
  PEFT merge uses alpha/r; CogVideoX1.5 overrides scaling absolutely
  (``generate/CogVideoX1.5-5B.py:32-36``); Wan multiplies relatively
  (``generate/Wan2.2-TI2V-5B.py:66-70``). ``merge_lora(scaling=...)``
  covers all three.

Layout: A is (r, in), B is (out, r) — PEFT convention; per-layer matrices are
stacked along the leading axis to ride the same ``lax.scan`` as the blocks.
delta_W = B @ A, applied as y += scaling * (x @ A^T) @ B^T (never
materializing merged weights during training).
"""

from __future__ import annotations

import json
import math
import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

TARGETS = ("to_q", "to_k", "to_v", "to_out")
# our tree name -> PEFT module path suffix
_PEFT_NAMES = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v", "to_out": "to_out.0"}


def lora_init(
    key: jax.Array,
    num_layers: int,
    dim: int,
    rank: int = 64,
    targets: Sequence[str] = TARGETS,
    dtype=jnp.float32,
) -> dict:
    """LoRA params stacked over layers: A ~ kaiming-uniform, B = 0 (PEFT init)."""
    params: Dict[str, dict] = {}
    keys = jax.random.split(key, len(targets))
    bound = 1.0 / math.sqrt(dim)
    for k, name in zip(keys, targets):
        params[name] = {
            "lora_A": jax.random.uniform(
                k, (num_layers, rank, dim), dtype, -bound * math.sqrt(3), bound * math.sqrt(3)
            ),
            "lora_B": jnp.zeros((num_layers, dim, rank), dtype),
        }
    return params


def lora_delta(
    layer_lora: dict, name: str, x: jax.Array, scaling: float
) -> jax.Array:
    """scaling * (x @ A^T) @ B^T for one (unstacked) layer."""
    if layer_lora is None or name not in layer_lora:
        return jnp.zeros(x.shape[:-1] + (0,), x.dtype)
    A = layer_lora[name]["lora_A"].astype(x.dtype)
    B = layer_lora[name]["lora_B"].astype(x.dtype)
    h = jnp.dot(x, A.T, preferred_element_type=jnp.float32).astype(x.dtype)
    return scaling * jnp.dot(h, B.T, preferred_element_type=jnp.float32).astype(x.dtype)


# per model family: (attention subtree key, {lora name -> param name})
_MERGE_LAYOUTS = {
    "cogvideox": ("attn1", {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v", "to_out": "to_out"}),
    "wan": ("self_attn", {"to_q": "q", "to_k": "k", "to_v": "v", "to_out": "o"}),
}


def merge_lora(
    dit_params: dict,
    lora: dict,
    rank: int,
    alpha: float,
    weight: float = 1.0,
    absolute_scaling: Optional[float] = None,
    layout: str = "cogvideox",
) -> dict:
    """Merge LoRA into DiT weights (for sampling).

    scaling = absolute_scaling if given (CogVideoX1.5 convention), else
    weight * alpha / rank (PEFT merge x relative Wan/replicate convention).
    """
    scaling = absolute_scaling if absolute_scaling is not None else weight * alpha / rank
    attn_key, name_map = _MERGE_LAYOUTS[layout]
    merged = jax.tree_util.tree_map(lambda x: x, dit_params)  # shallow copy tree
    attn = merged["blocks"][attn_key]
    for name, lp in lora.items():
        pname = name_map.get(name, name)
        # kernel layout (L, in, out); delta = (B @ A)^T per layer = A^T B^T
        delta = jnp.einsum("lri,lor->lio", lp["lora_A"], lp["lora_B"]) * scaling
        attn[pname] = dict(attn[pname])
        attn[pname]["kernel"] = attn[pname]["kernel"] + delta.astype(
            attn[pname]["kernel"].dtype
        )
    return merged


# ---------------------------------------------------------------------------
# PEFT interop
# ---------------------------------------------------------------------------

def export_peft(
    lora: dict,
    out_dir: str,
    rank: int,
    alpha: float,
    base_model_class: str = "CogVideoXTransformer3DModel",
    parent_library: str = "diffusers.models.transformers.cogvideox_transformer_3d",
    block_prefix: str = "transformer_blocks",
) -> None:
    """Write adapter_model.safetensors + adapter_config.json (PEFT format)."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    tensors: Dict[str, np.ndarray] = {}
    num_layers = next(iter(lora.values()))["lora_A"].shape[0]
    for name, lp in lora.items():
        peft_name = _PEFT_NAMES.get(name, name)
        A = np.asarray(lp["lora_A"], np.float32)
        B = np.asarray(lp["lora_B"], np.float32)
        for i in range(num_layers):
            base = f"base_model.model.{block_prefix}.{i}.attn1.{peft_name}"
            tensors[f"{base}.lora_A.weight"] = A[i]
            tensors[f"{base}.lora_B.weight"] = B[i]
    save_file(tensors, os.path.join(out_dir, "adapter_model.safetensors"))

    config = {
        "alpha_pattern": {},
        "auto_mapping": {
            "base_model_class": base_model_class,
            "parent_library": parent_library,
        },
        "base_model_name_or_path": None,
        "bias": "none",
        "fan_in_fan_out": False,
        "inference_mode": True,
        "init_lora_weights": True,
        "lora_alpha": alpha,
        "lora_dropout": 0.0,
        "peft_type": "LORA",
        "r": rank,
        "rank_pattern": {},
        "target_modules": [_PEFT_NAMES.get(t, t) for t in lora.keys()],
        "task_type": None,
        "use_dora": False,
        "use_rslora": False,
    }
    with open(os.path.join(out_dir, "adapter_config.json"), "w") as f:
        json.dump(config, f, indent=2)


def import_peft(adapter_dir: str, num_layers: int,
                block_prefix: str = "transformer_blocks") -> dict:
    """Load a PEFT LoRA adapter directory into our stacked layout."""
    from safetensors.numpy import load_file

    tensors = load_file(os.path.join(adapter_dir, "adapter_model.safetensors"))
    inv = {v: k for k, v in _PEFT_NAMES.items()}
    lora: Dict[str, dict] = {}
    for peft_name, ours in inv.items():
        a_list, b_list = [], []
        for i in range(num_layers):
            base = f"base_model.model.{block_prefix}.{i}.attn1.{peft_name}"
            a_key, b_key = f"{base}.lora_A.weight", f"{base}.lora_B.weight"
            if a_key not in tensors:
                break
            a_list.append(tensors[a_key])
            b_list.append(tensors[b_key])
        if a_list:
            lora[ours] = {
                "lora_A": jnp.asarray(np.stack(a_list)),
                "lora_B": jnp.asarray(np.stack(b_list)),
            }
    return lora
