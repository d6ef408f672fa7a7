"""DPO LoRA training for CogVideoX-5B on TPU.

Config surface parity: reference ``train/CogVideoX-5B/03_train.py`` (DEFAULT_CONFIG
+ optional --config YAML merge under key 'training'; lr 5e-6, beta 1.0, LoRA
r=64 alpha=128 on q/k/v/out, warmup 500, grad clip 1.0, pair filters
min_gap 0.05 / metric_threshold 0.8 / motion_threshold 0.001).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "../..")))

DATASET_PATH = os.environ.get("DATASET_PATH", "/path/to/your/dataset")

DEFAULT_CONFIG = {
    "metadata_path": f"{DATASET_PATH}/meta_data.json",
    "model_path": "THUDM/CogVideoX-5B",
    "output_dir": "outputs/CogVideoX-5B-dpo",
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
    "gradient_clip_val": 1.0,
    "lora_rank": 64,
    "lora_alpha": 128.0,
    "experiment_name": "CogVideoX-5B-dpo-tpu",
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

    from videogpa_tpu.cli.train_dpo import train_dpo
    from videogpa_tpu.models.cogvideox import CogVideoXConfig

    train_dpo(config, CogVideoXConfig.cogvideox_5b(), i2v=False)


if __name__ == "__main__":
    main()
