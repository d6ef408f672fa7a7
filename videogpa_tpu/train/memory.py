"""AOT memory proof for the sharded 5B DPO train step.

The reference trains CogVideoX-5B DPO on 8 GPUs with Lightning DDP
(``train/CogVideoX-I2V-5B/03_train.py:249-258``).  On one 16 GB v5e the
measured step needs ~25.5 GB HBM, so — like the reference — the 5B recipe
requires the mesh.  This module *proves* the sharded step fits without any
multi-chip hardware: the train step is AOT-lowered against abstract
``jax.ShapeDtypeStruct`` params/batch (no weights ever materialize) and
compiled either

- compile-only against a real TPU topology (``v5e:2x4`` via
  ``jax.experimental.topologies``) — real XLA:TPU buffer assignment, real
  Pallas flash kernels, real per-device HBM figures; or
- against the virtual 8-device CPU mesh (driver dryrun fallback).

``compiled.memory_analysis()`` then reports per-device peak bytes.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _enable_compile_cache() -> None:
    """Persistent compilation cache: the full 5B train-step compile takes
    ~8 min; with the cache the driver's dryrun re-run is near-instant.
    force=True because this path compiles against a TPU *topology* even
    when the default platform is CPU (see ``__main__`` below)."""
    from videogpa_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(force=True)

from videogpa_tpu.models.cogvideox.config import CogVideoXConfig
from videogpa_tpu.models.cogvideox.dit import dit_init
from videogpa_tpu.parallel.mesh import MeshAxes, make_mesh
from videogpa_tpu.parallel.sharding import batch_specs, dit_param_specs
from videogpa_tpu.train.lora import lora_init
from videogpa_tpu.train.trainer import (
    TrainerConfig,
    init_train_state,
    make_dpo_train_step_unbound,
)


def _sds(tree: Any, specs: Any, mesh: Mesh) -> Any:
    """Attach NamedShardings to a tree of ShapeDtypeStructs."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh, s)
        ),
        tree,
        specs,
    )


def tpu_topology_mesh(topology: str = "v5e:2x4", dp: int = 2) -> Mesh:
    """dp x tp mesh over a compile-only TPU topology (no chips needed)."""
    from jax.experimental import topologies

    topo = topologies.get_topology_desc(topology, "tpu")
    n = len(topo.devices)
    return make_mesh(MeshAxes(data=dp, model=n // dp), devices=topo.devices)


def aot_train_memory(
    cfg: Optional[CogVideoXConfig] = None,
    tcfg: Optional[TrainerConfig] = None,
    mesh: Optional[Mesh] = None,
    batch_size: int = 2,
) -> Dict[str, Any]:
    """AOT-compile the DPO train step with abstract inputs; return memory stats.

    ``batch_size`` is the GLOBAL preference-pair batch (sharded over the
    ``data`` axis).  Default cfg/tcfg is the real CogVideoX-5B-I2V operating
    point: 42 layers, hidden 3072, 49f@480x720 latents (17,776 tokens with
    text), LoRA r=64, remat, bf16 base — reference
    ``train/CogVideoX-I2V-5B/03_train.py:39-80``.
    """
    _enable_compile_cache()
    if cfg is None:
        cfg = CogVideoXConfig.cogvideox_5b_i2v()
    if tcfg is None:
        tcfg = TrainerConfig(
            lora_rank=64,
            lora_alpha=128.0,
            compute_dtype=jnp.bfloat16,
            remat=True,
            attn_impl="flash",
        )
    if mesh is None:
        mesh = tpu_topology_mesh()

    key0 = jax.random.PRNGKey(0)
    base_shapes = jax.eval_shape(
        lambda k: dit_init(k, cfg, dtype=jnp.bfloat16), key0
    )
    base_sds = _sds(base_shapes, dit_param_specs(base_shapes), mesh)

    lora_shapes = jax.eval_shape(
        lambda k: lora_init(k, cfg.num_layers, cfg.hidden_dim, rank=tcfg.lora_rank),
        key0,
    )
    state_shapes = jax.eval_shape(lambda l: init_train_state(l, tcfg), lora_shapes)
    state_sds = _sds(
        state_shapes,
        jax.tree_util.tree_map(lambda _: P(), state_shapes),
        mesh,
    )

    B = batch_size
    batch_shapes = {
        "x_win": jax.ShapeDtypeStruct(
            (B, cfg.out_channels, cfg.sample_frames, cfg.sample_height, cfg.sample_width),
            jnp.float32,
        ),
        "x_lose": jax.ShapeDtypeStruct(
            (B, cfg.out_channels, cfg.sample_frames, cfg.sample_height, cfg.sample_width),
            jnp.float32,
        ),
        "prompt_emb": jax.ShapeDtypeStruct(
            (B, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32
        ),
    }
    batch_sds = _sds(batch_shapes, batch_specs(batch_shapes), mesh)
    key_sds = jax.ShapeDtypeStruct(key0.shape, key0.dtype)

    train_step, _ = make_dpo_train_step_unbound(cfg, tcfg)
    # set_mesh makes the mesh visible to trace-time sharding decisions (the
    # sequence-parallel residual constraints in dit_forward and the
    # shard_map wrap around the Pallas kernels read the abstract mesh)
    with jax.set_mesh(mesh):
        compiled = train_step.lower(
            base_sds, None, state_sds, batch_sds, key_sds
        ).compile()
    ma = compiled.memory_analysis()
    # conservative per-device HBM: persistent argument buffers + the temp
    # arena + outputs, minus donated aliases. ma.peak_memory_in_bytes lets
    # argument buffers expire at last use, which PJRT's runtime does not.
    total = (
        ma.argument_size_in_bytes
        + ma.temp_size_in_bytes
        + ma.output_size_in_bytes
        - ma.alias_size_in_bytes
    )
    stats = {
        "platform": mesh.devices.flat[0].platform,
        "mesh": {a: int(s) for a, s in zip(mesh.axis_names, mesh.devices.shape)},
        "global_batch_pairs": B,
        # DiT tokens as the train step actually sees them: the trainer trims
        # F to a multiple of patch_size_t (trainer.py:151-156) and the 1.5
        # models patchify temporally by patch_size_t
        "tokens": (
            (cfg.sample_frames - cfg.sample_frames % (cfg.patch_size_t or 1))
            // (cfg.patch_size_t or 1)
        )
        * (cfg.sample_height // cfg.patch_size)
        * (cfg.sample_width // cfg.patch_size)
        + cfg.max_text_seq_length,
        "attn_impl": tcfg.attn_impl,
        "per_device_hbm_bytes": int(total),
        "per_device_hbm_gib": round(total / 2**30, 3),
        "peak_heap_gib": round(ma.peak_memory_in_bytes / 2**30, 3),
        "argument_gib": round(ma.argument_size_in_bytes / 2**30, 3),
        "temp_gib": round(ma.temp_size_in_bytes / 2**30, 3),
        "output_gib": round(ma.output_size_in_bytes / 2**30, 3),
        "alias_gib": round(ma.alias_size_in_bytes / 2**30, 3),
    }
    return stats


def aot_cog15_train_memory(
    mesh: Optional[Mesh] = None,
    batch_size: int = 2,
    attn_impl: str = "flash",
) -> Dict[str, Any]:
    """AOT memory proof for the CogVideoX1.5-5B DPO train step — the hardest
    memory case in the system: 81f@768x1360 latents at patch_size_t=2 give
    (20 trimmed frames / 2) x 48 x 85 = 40,800 video tokens + 226 text =
    41,026 DiT tokens per forward, 2.3x the 49f step.  The reference trains
    this recipe on 8 GPUs (``train/CogVideoX1.5-5B/03_train.py:54,95``,
    max_steps 1500); this proves the sharded TP step fits the v5e:2x4
    topology the same way :func:`aot_train_memory` proves the 49f step.
    """
    cfg = CogVideoXConfig.cogvideox_1_5_5b()
    tcfg = TrainerConfig(
        lora_rank=64,
        lora_alpha=128.0,
        compute_dtype=jnp.bfloat16,
        remat=True,
        attn_impl=attn_impl,
    )
    return aot_train_memory(cfg=cfg, tcfg=tcfg, mesh=mesh, batch_size=batch_size)


def aot_wan_train_memory(
    mesh: Optional[Mesh] = None,
    batch_size: int = 2,
    latent_fhw: tuple = (21, 44, 80),
) -> Dict[str, Any]:
    """AOT memory proof for the Wan2.2-TI2V-5B DPO train step (flow matching,
    per-token timesteps) at the reference operating point — 81f@704x1280
    video = (21, 44, 80) latents, 18,480 DiT tokens at patch (1,2,2) —
    reference ``train/Wan2.2-TI2V-5B/03_train.py:354-366`` (the other 8-GPU
    requirement).  Same method as :func:`aot_train_memory`: abstract
    ShapeDtypeStruct weights, compile-only v5e:2x4 topology, per-device HBM
    from ``memory_analysis``.
    """
    from videogpa_tpu.models.wan.config import WanConfig
    from videogpa_tpu.models.wan.dit import wan_init
    from videogpa_tpu.parallel.sharding import wan_param_specs
    from videogpa_tpu.train.wan_trainer import make_wan_dpo_train_step_unbound

    _enable_compile_cache()
    cfg = WanConfig.ti2v_5b()
    tcfg = TrainerConfig(
        lora_rank=64,
        lora_alpha=128.0,
        compute_dtype=jnp.bfloat16,
        remat=True,
        attn_impl="flash",
    )
    if mesh is None:
        mesh = tpu_topology_mesh()

    key0 = jax.random.PRNGKey(0)
    base_shapes = jax.eval_shape(
        lambda k: wan_init(k, cfg, dtype=jnp.bfloat16), key0
    )
    base_sds = _sds(base_shapes, wan_param_specs(base_shapes), mesh)

    lora_shapes = jax.eval_shape(
        lambda k: lora_init(k, cfg.num_layers, cfg.dim, rank=tcfg.lora_rank),
        key0,
    )
    state_shapes = jax.eval_shape(lambda l: init_train_state(l, tcfg), lora_shapes)
    state_sds = _sds(
        state_shapes,
        jax.tree_util.tree_map(lambda _: P(), state_shapes),
        mesh,
    )

    B = batch_size
    F, H, W = latent_fhw
    lat = jax.ShapeDtypeStruct((B, cfg.in_channels, F, H, W), jnp.float32)
    batch_shapes = {
        "x_win": lat,
        "x_lose": lat,
        "prompt_emb": jax.ShapeDtypeStruct((B, cfg.text_len, cfg.text_dim), jnp.float32),
    }
    batch_sds = _sds(batch_shapes, batch_specs(batch_shapes), mesh)
    key_sds = jax.ShapeDtypeStruct(key0.shape, key0.dtype)

    train_step, _ = make_wan_dpo_train_step_unbound(cfg, tcfg)
    with jax.set_mesh(mesh):
        compiled = train_step.lower(base_sds, state_sds, batch_sds, key_sds).compile()
    ma = compiled.memory_analysis()
    total = (
        ma.argument_size_in_bytes
        + ma.temp_size_in_bytes
        + ma.output_size_in_bytes
        - ma.alias_size_in_bytes
    )
    pt, ph, pw = cfg.patch_size
    return {
        "platform": mesh.devices.flat[0].platform,
        "mesh": {a: int(s) for a, s in zip(mesh.axis_names, mesh.devices.shape)},
        "global_batch_pairs": B,
        "tokens": (F // pt) * (H // ph) * (W // pw),
        "attn_impl": tcfg.attn_impl,
        "per_device_hbm_bytes": int(total),
        "per_device_hbm_gib": round(total / 2**30, 3),
        "peak_heap_gib": round(ma.peak_memory_in_bytes / 2**30, 3),
        "argument_gib": round(ma.argument_size_in_bytes / 2**30, 3),
        "temp_gib": round(ma.temp_size_in_bytes / 2**30, 3),
        "output_gib": round(ma.output_size_in_bytes / 2**30, 3),
        "alias_gib": round(ma.alias_size_in_bytes / 2**30, 3),
    }


if __name__ == "__main__":
    import json
    import sys

    # eager constants (scheduler tables) go to CPU; the TPU topology client
    # is compile-only and independent of the default platform. Without this
    # the first jnp op initializes the (slow, remote) axon device client.
    jax.config.update("jax_platforms", "cpu")
    which = sys.argv[1] if len(sys.argv) > 1 else "cogvideox"
    fn = {
        "wan": aot_wan_train_memory,
        "cog15": aot_cog15_train_memory,
    }.get(which, aot_train_memory)
    kwargs = {}
    if len(sys.argv) > 2:  # e.g. "1x8" or "2x4@v5e:2x4" -> dp (tp fills rest)
        spec = sys.argv[2]
        topo = "v5e:2x4"
        if "@" in spec:
            spec, topo = spec.split("@")
        kwargs["mesh"] = tpu_topology_mesh(
            topology=topo, dp=int(spec.split("x")[0])
        )
    if len(sys.argv) > 3:  # global batch pairs
        kwargs["batch_size"] = int(sys.argv[3])
    print(json.dumps(fn(**kwargs), indent=2))
