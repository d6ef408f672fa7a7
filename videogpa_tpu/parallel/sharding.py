"""Sharding rules (PartitionSpec trees) for model params and train state.

Tensor-parallel layout for the CogVideoX DiT (an upgrade over the reference,
which only has data parallelism — SURVEY.md §2.5): attention head projections
are column-sharded over the ``model`` axis, output projections row-sharded,
FFN up/down likewise — the Megatron pattern, expressed purely as parameter
shardings; XLA/GSPMD inserts the (all-gather, reduce-scatter) pairs over ICI.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from videogpa_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _spec_like(tree: Any, spec_fn) -> Any:
    return jax.tree_util.tree_map_with_path(spec_fn, tree)


def dit_param_specs(params: Any) -> Any:
    """PartitionSpec tree for CogVideoX DiT params (stacked-blocks layout)."""

    def spec(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        name = "/".join(str(k) for k in keys)
        nd = leaf.ndim
        if "blocks" in name:
            # stacked leaves: leading axis = layer
            if any(t in name for t in ("to_q", "to_k", "to_v")) or "fc1" in name:
                if name.endswith("kernel") and nd == 3:
                    return P(None, None, MODEL_AXIS)  # column parallel
                if name.endswith("bias") and nd == 2:
                    return P(None, MODEL_AXIS)
            if "to_out" in name or "fc2" in name:
                if name.endswith("kernel") and nd == 3:
                    return P(None, MODEL_AXIS, None)  # row parallel
        return P()  # replicate everything else

    return _spec_like(params, spec)


def wan_param_specs(params: Any) -> Any:
    """PartitionSpec tree for the Wan2.2 DiT (stacked-blocks layout).

    Megatron pattern over the ``model`` axis: self/cross-attention q/k/v and
    ffn fc1 column-parallel, o / fc2 row-parallel; norms, modulation tables
    and embeddings replicated."""

    def spec(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        name = "/".join(str(k) for k in keys)
        nd = leaf.ndim
        if "blocks" in name:
            col = any(t in name for t in ("/q/", "/k/", "/v/")) or "fc1" in name
            row = name.endswith(("o/kernel",)) or "fc2" in name
            if col:
                if name.endswith("kernel") and nd == 3:
                    return P(None, None, MODEL_AXIS)
                if name.endswith("bias") and nd == 2:
                    return P(None, MODEL_AXIS)
            if row and name.endswith("kernel") and nd == 3:
                return P(None, MODEL_AXIS, None)
        return P()

    return _spec_like(params, spec)


def vit_param_specs(params: Any) -> Any:
    """PartitionSpec tree for stacked ViT blocks (VGGT aggregator frame/global
    blocks, DA3 AA-ViT blocks_pre/blocks_alt, DINOv2): fused qkv and mlp fc1
    column-parallel over ``model``, attention proj and fc2 row-parallel.

    This makes the ``model`` mesh axis live for the scoring path too —
    VGGT-1B / DA3-Giant shard across chips for batched reward scoring."""

    def spec(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        name = "/".join(str(k) for k in keys)
        nd = leaf.ndim
        if "blocks" in name:
            col = "attn/qkv" in name or "mlp/fc1" in name
            row = "attn/proj" in name or "mlp/fc2" in name
            if col:
                if name.endswith("kernel") and nd == 3:
                    return P(None, None, MODEL_AXIS)
                if name.endswith("bias") and nd == 2:
                    return P(None, MODEL_AXIS)
            if row and name.endswith("kernel") and nd == 3:
                return P(None, MODEL_AXIS, None)
        return P()

    return _spec_like(params, spec)


def seq_shard(x: jax.Array) -> jax.Array:
    """Megatron-style sequence parallelism for a DiT residual stream.

    Under an active tensor-parallel mesh, the scan-carry activations — which
    are exactly the per-layer residuals ``jax.checkpoint`` keeps alive for
    the backward pass — are constrained to (data, model)-sharded layout, so
    each device stores 1/(dp*tp) of them. XLA/GSPMD turns the surrounding
    collectives into the all-gather (into qkv) / reduce-scatter (out of the
    row-parallel projections) pair; same ICI bytes as the plain Megatron
    all-reduce. Activation memory is the binding constraint of the 5B DPO
    step on 16 GB chips (see videogpa_tpu/train/memory.py).

    No-op outside a mesh context or when the ``model`` axis is trivial, so
    single-chip inference paths are unaffected.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh.empty or mesh.shape.get(MODEL_AXIS, 1) <= 1:
        return x
    bspec = DATA_AXIS if mesh.shape.get(DATA_AXIS, 1) > 1 else None
    return jax.lax.with_sharding_constraint(x, P(bspec, MODEL_AXIS, None))


def lora_param_specs(lora: Any) -> Any:
    """LoRA trees are small: replicate (grads all-reduce over data axis)."""
    return jax.tree_util.tree_map(lambda _: P(), lora)


def batch_specs(batch: Any) -> Any:
    """Shard every batch array over the data axis."""
    return jax.tree_util.tree_map(lambda _: P(DATA_AXIS), batch)


def shard_tree(tree: Any, specs: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )
