"""W8A8 dynamic-quantized linear layers for inference (TPU int8 MXU).

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197
TOP/s); the DiT's projection/FFN GEMMs are ~2.4 s of the 6.4 s CogVideoX-5B
denoise step, so quantizing them is the largest remaining inference lever
after the int8-QK attention mode (``ops/attention.py::_flash_int8``).

Scheme (SmoothQuant-style dynamic W8A8, inference only):
- weights: symmetric per-OUTPUT-channel int8, quantized once at load time
  (``quantize_linear`` / ``quantize_dit_int8``);
- activations: symmetric per-TOKEN int8, quantized on the fly inside the
  jit (an abs-max reduce + scale — VPU work that rides the same activation
  pass the GEMM needs anyway);
- accumulate int32 on the MXU, rescale f32: y = (qx @ qw) * (sx * sw) + b.

``ops.layers.linear`` dispatches on the presence of ``w_int8`` in the param
dict, so any call site accepts quantized params unchanged. LoRA deltas
apply on the f32 path on top (they read the raw activations, not qx).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


def quantize_linear(p: Params) -> Params:
    """{"kernel" (..., in, out), "bias"?} -> {"w_int8", "w_scale", "bias"?}.

    Works on lax.scan-stacked kernels ((L, in, out)) too: the reduction axis
    is always -2 (in_features), giving per-(layer, out-channel) scales.
    """
    k = p["kernel"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=-2, keepdims=True)  # (..., 1, out)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    out: Params = {"w_int8": q, "w_scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def linear_w8a8(p: Params, x: jax.Array) -> jax.Array:
    """Dynamic per-token int8 activation x per-channel int8 weight matmul."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    qx = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        qx, p["w_int8"],
        (((qx.ndim - 1,), (p["w_int8"].ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * p["w_scale"].astype(jnp.float32))
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_dit_int8(params: dict) -> dict:
    """CogVideoX DiT: quantize the per-block projection/FFN linears.

    Returns a copy of the param tree with blocks' to_q/to_k/to_v/to_out and
    ff.fc1/fc2 replaced by int8 weights + scales (the ~2.4 s of GEMMs in the
    5B denoise step). Embedders, AdaLN modulation and output head stay f32 —
    they are small and range-sensitive.
    """
    import copy

    params = copy.copy(params)
    params["blocks"] = copy.deepcopy(params["blocks"])
    blocks = params["blocks"]
    for name in ("to_q", "to_k", "to_v", "to_out"):
        blocks["attn1"][name] = quantize_linear(blocks["attn1"][name])
    for name in ("fc1", "fc2"):
        blocks["ff"][name] = quantize_linear(blocks["ff"][name])
    return params


def _quantize_vit_blocks(blocks: dict) -> dict:
    """Quantize one stacked ViT block tree ({"attn": {qkv, proj}, "mlp":
    {fc1, fc2} | swiglu w1/w2/w3})."""
    import copy

    blocks = copy.deepcopy(blocks)
    for name in ("qkv", "proj"):
        if name in blocks.get("attn", {}):
            blocks["attn"][name] = quantize_linear(blocks["attn"][name])
    mlp = blocks.get("mlp", {})
    for name in list(mlp.keys()):
        leaf = mlp[name]
        if isinstance(leaf, dict) and "kernel" in leaf:
            mlp[name] = quantize_linear(leaf)
    return blocks


def quantize_vggt_int8(params: dict) -> dict:
    """VGGT: quantize the aggregator's frame/global trunk GEMMs (the reward
    scorer's matmul bulk). Patch embed, camera head and DPT heads stay f32
    (small / range-sensitive; the heads run f32 by reference parity)."""
    import copy

    params = copy.copy(params)
    agg = copy.copy(params["aggregator"])
    for key in ("frame_blocks", "global_blocks"):
        agg[key] = _quantize_vit_blocks(agg[key])
    params["aggregator"] = agg
    return params


def quantize_wan_int8(params: dict) -> dict:
    """Wan DiT: quantize the per-block self/cross-attention and FFN linears."""
    import copy

    params = copy.copy(params)
    params["blocks"] = copy.deepcopy(params["blocks"])
    blocks = params["blocks"]
    for attn in ("self_attn", "cross_attn"):
        if attn not in blocks:
            continue
        for name in ("q", "k", "v", "o"):
            if name in blocks[attn]:
                blocks[attn][name] = quantize_linear(blocks[attn][name])
    if "ffn" in blocks:
        for name in list(blocks["ffn"].keys()):
            leaf = blocks["ffn"][name]
            if isinstance(leaf, dict) and "kernel" in leaf:
                blocks["ffn"][name] = quantize_linear(leaf)
    return params


def quantize_da3_int8(params: dict) -> dict:
    """DA3: quantize the AA-ViT backbone trunk GEMMs (qkv/proj/mlp of the
    uniform pre blocks and the alternating local/global blocks). Patch
    embed, camera enc/dec and the DualDPT heads stay f32 — same policy as
    ``quantize_vggt_int8`` (heads run f32 by reference autocast parity,
    depth_anything_3/model/da3.py:139-147). Scoring only ranks candidate
    videos, the most quantization-tolerant consumer in the system."""
    import copy

    params = copy.copy(params)
    bb = copy.copy(params["backbone"])
    bb["blocks_pre"] = _quantize_vit_blocks(bb["blocks_pre"])
    bb["blocks_alt"] = [_quantize_vit_blocks(b) for b in bb["blocks_alt"]]
    params["backbone"] = bb
    return params


def quantize_scorer_params(backbone: str, params: dict):
    """Shared CLI helper: quantize a scoring backbone for the production
    int8 mode. Returns (quantized_params, attn_impl) for VideoProcessor.

    No donation here: scorer trunks are small (VGGT-1B / DA3-Large are a
    few GB — no OOM risk) and callers may keep or re-quantize the input
    tree (e.g. resume re-runs); donation is for the 5B DiT paths."""
    import jax

    q = quantize_da3_int8 if backbone.lower() == "da3" else quantize_vggt_int8
    return jax.jit(q)(params), "flash_int8"


def quantize_on_device(fn, params):
    """Run a quantize_*_int8 transform under jit with the INPUT DONATED.

    At 5B scale the bf16 param tree is ~10.4 GiB and its int8 image ~6.0
    GiB; without donation both are resident during the transform (~16.3
    GiB), which overflows a 16 GB v5e. Donation lets XLA free each bf16
    leaf as its int8 leaf is produced. (On CPU donation is a no-op warning.)
    """
    import jax

    return jax.jit(fn, donate_argnums=0)(params)
