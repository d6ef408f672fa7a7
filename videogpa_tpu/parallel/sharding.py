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
