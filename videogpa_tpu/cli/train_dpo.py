"""Shared DPO training driver (CogVideoX + Wan recipes).

Behavior parity: reference ``train/CogVideoX-I2V-5B/03_train.py:210-281`` —
98/2 split (seed 42), per-step training with periodic validation, top-k
checkpointing by val loss, final PEFT LoRA export on completion, throughput
telemetry. ``train_wan_dpo`` mirrors ``train/Wan2.2-TI2V-5B/03_train.py``
(flow matching, per-token timesteps, LoRA on blocks.* q/k/v/o).

``main`` is the ``videogpa-train-dpo`` console entry point; the
``train/*/03_train.py`` scripts are thin wrappers over the same recipes
(``videogpa_tpu/train/recipes.py``).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _peak_memory_gb() -> float:
    """Peak device HBM use (reference logs stats/max_memory_gb via torch.cuda,
    …I2V…/03_train.py:166-177). Returns 0.0 on backends without stats."""
    import jax

    try:
        stats = jax.devices()[0].memory_stats() or {}
        return float(stats.get("peak_bytes_in_use", 0)) / 1e9
    except Exception:
        return 0.0


def train_dpo(config: dict, cog_cfg, i2v: bool = False):
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.checkpoint import TrainCheckpointer
    from videogpa_tpu.models.loader import load_cogvideox
    from videogpa_tpu.train.dataset import DPODataset, collate, train_val_split
    from videogpa_tpu.train.lora import export_peft, lora_init
    from videogpa_tpu.train.trainer import (
        TrainerConfig, TrainState, init_train_state, make_dpo_train_step,
    )
    from videogpa_tpu.utils import MetricLogger

    dit, vae = load_cogvideox(config["model_path"], cog_cfg, dtype=jnp.bfloat16)

    tcfg = TrainerConfig(
        learning_rate=config.get("learning_rate", 5e-6),
        beta=config.get("beta", 1.0),
        warmup_steps=config.get("warmup_steps", 500),
        max_steps=config.get("max_steps", 10_000),
        gradient_clip_val=config.get("gradient_clip_val", 1.0),
        accumulate_grad_batches=config.get("accumulate_grad_batches", 1),
        lora_rank=config.get("lora_rank", 64),
        lora_alpha=config.get("lora_alpha", 128.0),
    )
    lora = lora_init(
        jax.random.PRNGKey(config.get("seed", 0)), cog_cfg.num_layers,
        cog_cfg.hidden_dim, rank=tcfg.lora_rank,
    )
    state = init_train_state(lora, tcfg)
    train_step, eval_step = make_dpo_train_step(
        dit, cog_cfg, tcfg, vae_params=vae if i2v else None
    )

    ds = DPODataset(
        base_path=config["base_path"],
        metadata_path=config["metadata_path"],
        metric_name=config.get("metric_name", "consistency_score"),
        metric_mode=config.get("metric_mode", "min"),
        min_gap=config.get("min_gap", 0.05),
        metric_threshold=config.get("metric_threshold"),
        motion_threshold=config.get("motion_threshold", 0.001),
    )
    train_idx, val_idx = train_val_split(len(ds), 0.02, seed=42)
    print(f"pairs: {len(ds)} (train {len(train_idx)}, val {len(val_idx)})")

    out_dir = config["output_dir"]
    ckpt = TrainCheckpointer(
        os.path.join(out_dir, "checkpoints"),
        save_top_k=config.get("save_top_k", 10),
    )
    logger = MetricLogger(out_dir, project=config.get("wandb_project"),
                          name=config.get("experiment_name"), config=config)

    batch_size = config.get("batch_size", 2)
    rng = np.random.default_rng(config.get("seed", 0))
    key = jax.random.PRNGKey(config.get("seed", 0))
    step = 0
    log_every = config.get("log_every_n_steps", 10)
    ckpt_every = config.get("checkpoint_every_n_steps", 1000)

    # resume from the newest checkpoint (the reference relies on Lightning's
    # ckpt_path; here resume is automatic when checkpoints exist)
    def _state_dict(st):
        return {"lora": st.lora, "opt_state": st.opt_state, "step": st.step}

    latest = ckpt.latest() if config.get("resume", True) else None
    if latest is not None:
        restored = ckpt.restore(latest, _state_dict(state))
        state = TrainState(**restored)
        step = int(np.asarray(state.step))
        print(f"resumed from {latest} at step {step}")
    # throughput counts steps taken by THIS process: dividing the global
    # step by this process's elapsed time would inflate samples/sec after
    # a checkpoint resume
    step0 = step

    def make_batch(indices):
        items = [ds[int(i)] for i in indices]
        b = collate(items)
        return {k: jnp.asarray(v) for k, v in b.items() if k != "prompt"}

    if len(train_idx) < batch_size:
        # drop-last batching below would yield zero batches per epoch and
        # the while loop would spin forever without taking a step
        raise ValueError(
            f"batch_size={batch_size} exceeds the {len(train_idx)}-pair "
            f"training set; drop-last batching would never yield a batch")

    while step < tcfg.max_steps:
        order = rng.permutation(train_idx)
        # drop-last batching (the reference's DataLoader yields a final
        # partial batch): a partial batch is a second static shape -> a
        # second XLA compile; shuffled epochs cover every pair anyway
        for i in range(0, len(order) - batch_size + 1, batch_size):
            batch = make_batch(order[i : i + batch_size])
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, batch, sub)
            step += 1
            if step % log_every == 0:
                m = {f"train/{k}": float(v) for k, v in metrics.items()}
                m["stats/samples_per_sec"] = logger.throughput(
                    step - step0, batch_size)
                m["stats/max_memory_gb"] = _peak_memory_gb()
                logger.log(step, m)
                print(f"step {step}: loss={m['train/loss']:.4f} "
                      f"margin={m['train/reward_margin']:.4f}")
            if step % ckpt_every == 0 or step >= tcfg.max_steps:
                val_losses = []
                for j in range(0, min(len(val_idx), 50), 1):
                    vb = make_batch(val_idx[j : j + 1])
                    key, sub = jax.random.split(key)
                    val_losses.append(float(eval_step(state, vb, sub)["loss"]))
                val_loss = float(np.mean(val_losses)) if val_losses else float("inf")
                logger.log(step, {"val/loss": val_loss})
                ckpt.save(step, _state_dict(state), metric=val_loss)
            if step >= tcfg.max_steps:
                break

    export_peft(
        state.lora, os.path.join(out_dir, "final_lora"),
        rank=tcfg.lora_rank, alpha=tcfg.lora_alpha,
    )
    logger.close()
    print(f"final LoRA exported to {os.path.join(out_dir, 'final_lora')}")


def train_wan_dpo(config: dict):
    """Wan2.2-TI2V-5B DPO: flow-matching loss with per-token timesteps.

    Parity: reference ``train/Wan2.2-TI2V-5B/03_train.py:64-97,354-366``.
    """
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.checkpoint import TrainCheckpointer
    from videogpa_tpu.models.loader import (
        _to_f32, load_safetensors_dir, resolve_model_dir,
    )
    from videogpa_tpu.models.wan import WanConfig
    from videogpa_tpu.models.wan.convert import convert_wan
    from videogpa_tpu.train.dataset import DPODataset, collate, train_val_split
    from videogpa_tpu.train.lora import export_peft, lora_init
    from videogpa_tpu.train.trainer import TrainerConfig, init_train_state
    from videogpa_tpu.train.wan_trainer import make_wan_dpo_train_step
    from videogpa_tpu.utils import MetricLogger

    cfg = WanConfig.ti2v_5b()
    sd = _to_f32(load_safetensors_dir(resolve_model_dir(config["model_path"])))
    base = convert_wan(sd, cfg)
    base = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), base)

    tcfg = TrainerConfig(
        learning_rate=config["learning_rate"], beta=config["beta"],
        warmup_steps=config["warmup_steps"], max_steps=config["max_steps"],
        accumulate_grad_batches=config.get("accumulate_grad_batches", 1),
        lora_rank=config["lora_rank"], lora_alpha=config["lora_alpha"],
    )
    lora = lora_init(jax.random.PRNGKey(0), cfg.num_layers, cfg.dim,
                     rank=tcfg.lora_rank)
    state = init_train_state(lora, tcfg)
    train_step, eval_step = make_wan_dpo_train_step(base, cfg, tcfg)

    ds = DPODataset(
        base_path=config["base_path"], metadata_path=config["metadata_path"],
        metric_name=config["metric_name"], metric_mode=config["metric_mode"],
        min_gap=config["min_gap"],
        metric_threshold=config.get("metric_threshold"),
        motion_threshold=config["motion_threshold"],
    )
    train_idx, val_idx = train_val_split(len(ds), 0.02, seed=42)
    print(f"pairs: {len(ds)} (train {len(train_idx)}, val {len(val_idx)})")
    out_dir = config["output_dir"]
    ckpt = TrainCheckpointer(os.path.join(out_dir, "checkpoints"),
                             save_top_k=config["save_top_k"])
    logger = MetricLogger(out_dir, name="wan-dpo-tpu", config=config)

    def _state_dict(st):
        return {"lora": st.lora, "opt_state": st.opt_state, "step": st.step}

    from videogpa_tpu.train.trainer import TrainState

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    step = 0
    # resume from the newest checkpoint, same contract as train_dpo
    latest = ckpt.latest() if config.get("resume", True) else None
    if latest is not None:
        state = TrainState(**ckpt.restore(latest, _state_dict(state)))
        step = int(np.asarray(state.step))
        print(f"resumed from {latest} at step {step}")
    # steps taken by THIS process, for samples/sec (see train_dpo)
    step0 = step

    def make_batch(indices):
        items = [ds[int(i)] for i in indices]
        b = collate(items)
        return {k: jnp.asarray(v) for k, v in b.items() if k != "prompt"}

    # honor a batch_size override like train_dpo does (recipe default is 1;
    # Wan2.2-TI2V-5B/03_train.py trains at batch 1 with accumulation 2)
    batch_size = config.get("batch_size", 1)
    if len(train_idx) < batch_size:
        # drop-last batching would never yield a batch -> silent spin
        raise ValueError(
            f"batch_size={batch_size} exceeds the {len(train_idx)}-pair "
            f"training set; drop-last batching would never yield a batch")
    while step < tcfg.max_steps:
        order = rng.permutation(train_idx)
        # drop-last batching (the reference's DataLoader yields a final
        # partial batch): a partial batch is a second static shape -> a
        # second XLA compile; shuffled epochs cover every pair anyway
        for i in range(0, len(order) - batch_size + 1, batch_size):
            batch = make_batch(order[i : i + batch_size])
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, batch, sub)
            step += 1
            if step % config["log_every_n_steps"] == 0:
                m = {f"train/{k}": float(v) for k, v in metrics.items()}
                m["stats/samples_per_sec"] = logger.throughput(
                    step - step0, batch_size)
                logger.log(step, m)
            if step % config["checkpoint_every_n_steps"] == 0 \
                    or step >= tcfg.max_steps:
                # top-k by held-out val loss (reference ranks checkpoints by
                # monitored val metric, …TI2V-5B/03_train.py ModelCheckpoint)
                val_losses = []
                for j in range(min(len(val_idx), 50)):
                    key, sub = jax.random.split(key)
                    val_losses.append(float(
                        eval_step(state, make_batch(val_idx[j : j + 1]), sub)
                        ["loss"]
                    ))
                val_loss = (float(np.mean(val_losses)) if val_losses
                            else float("inf"))
                logger.log(step, {"val/loss": val_loss})
                ckpt.save(step, _state_dict(state), metric=val_loss)
            if step >= tcfg.max_steps:
                break
    export_peft(state.lora, os.path.join(out_dir, "final_lora"),
                rank=tcfg.lora_rank, alpha=tcfg.lora_alpha,
                base_model_class="WanModel",
                parent_library="wan.modules.model", block_prefix="blocks")
    logger.close()


def main(argv=None):
    """``videogpa-train-dpo <recipe> [--config cfg.yaml] [--base_path dir]``"""
    from videogpa_tpu.train.recipes import RECIPES, build_config, run_recipe

    parser = argparse.ArgumentParser(
        prog="videogpa-train-dpo",
        description="DPO LoRA training at one of the reference operating "
                    "points (videogpa_tpu/train/recipes.py)",
    )
    parser.add_argument("recipe", choices=RECIPES)
    parser.add_argument("--config", type=str, default=None,
                        help="YAML with overrides under key 'training'")
    parser.add_argument("--base_path", type=str, default=None)
    args = parser.parse_args(argv)
    run_recipe(args.recipe, build_config(args.recipe, args.config,
                                         args.base_path))


if __name__ == "__main__":
    main()
