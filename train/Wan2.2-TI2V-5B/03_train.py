"""DPO LoRA training for Wan2.2-TI2V-5B on TPU (flow matching).

Config surface parity: reference ``train/Wan2.2-TI2V-5B/03_train.py``
(batch 1, 1000 flow-match timesteps, shift 5.0, LoRA q/k/v/o). Gradient
accumulation (reference accum=2) is provided by --accumulate steps of the
optimizer schedule; the TI2V clean-first-frame trick and per-token timesteps
are built into the train step.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "../..")))

import numpy as np

DATASET_PATH = os.environ.get("DATASET_PATH", "/path/to/your/dataset")

DEFAULT_CONFIG = {
    "metadata_path": f"{DATASET_PATH}/meta_data.json",
    "model_path": "Wan-AI/Wan2.2-TI2V-5B",
    "output_dir": "outputs/Wan2.2-TI2V-5B-dpo",
    "base_path": DATASET_PATH,
    "metric_name": "consistency_score",
    "metric_mode": "min",
    "min_gap": 0.05,
    "metric_threshold": 0.8,
    "motion_threshold": 0.001,
    "learning_rate": 5e-6,
    "beta": 1.0,
    "max_steps": 10000,
    "warmup_steps": 500,
    "batch_size": 1,
    "accumulate_grad_batches": 2,
    "lora_rank": 64,
    "lora_alpha": 128.0,
    "checkpoint_every_n_steps": 1000,
    "log_every_n_steps": 10,
    "save_top_k": 10,
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--base_path", type=str, default=None)
    args = parser.parse_args()
    config = dict(DEFAULT_CONFIG)
    if args.config:
        import yaml

        with open(args.config) as f:
            config.update(yaml.safe_load(f).get("training", {}))
    if args.base_path:
        config["base_path"] = args.base_path
    config["metadata_path"] = f"{config['base_path']}/meta_data.json"

    import jax
    import jax.numpy as jnp

    from videogpa_tpu.checkpoint import TrainCheckpointer
    from videogpa_tpu.models.loader import load_safetensors_dir, resolve_model_dir, _to_f32
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
    lora = lora_init(jax.random.PRNGKey(0), cfg.num_layers, cfg.dim, rank=tcfg.lora_rank)
    state = init_train_state(lora, tcfg)
    train_step, eval_step = make_wan_dpo_train_step(base, cfg, tcfg)

    ds = DPODataset(
        base_path=config["base_path"], metadata_path=config["metadata_path"],
        metric_name=config["metric_name"], metric_mode=config["metric_mode"],
        min_gap=config["min_gap"], metric_threshold=config.get("metric_threshold"),
        motion_threshold=config["motion_threshold"],
    )
    train_idx, val_idx = train_val_split(len(ds), 0.02, seed=42)
    out_dir = config["output_dir"]
    ckpt = TrainCheckpointer(os.path.join(out_dir, "checkpoints"),
                             save_top_k=config["save_top_k"])
    logger = MetricLogger(out_dir, name="wan-dpo-tpu", config=config)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    step = 0
    B = config["batch_size"]
    while step < tcfg.max_steps:
        for i in rng.permutation(train_idx):
            item = collate([ds[int(i)]])
            batch = {k: jnp.asarray(v) for k, v in item.items() if k != "prompt"}
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, batch, sub)
            step += 1
            if step % config["log_every_n_steps"] == 0:
                logger.log(step, {f"train/{k}": float(v) for k, v in metrics.items()})
            if step % config["checkpoint_every_n_steps"] == 0:
                ckpt.save(step, {"lora": state.lora},
                          metric=float(metrics["loss"]))
            if step >= tcfg.max_steps:
                break
    export_peft(state.lora, os.path.join(out_dir, "final_lora"),
                rank=tcfg.lora_rank, alpha=tcfg.lora_alpha,
                base_model_class="WanModel", parent_library="wan.modules.model",
                block_prefix="blocks")
    logger.close()


if __name__ == "__main__":
    main()
