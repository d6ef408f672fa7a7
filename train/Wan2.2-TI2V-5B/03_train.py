"""DPO LoRA training for Wan2.2-TI2V-5B on TPU.

Config surface parity: reference ``train/Wan2.2-TI2V-5B/03_train.py`` (DEFAULT_CONFIG
+ optional --config YAML merge under key 'training'). The operating point
lives in ``videogpa_tpu/train/recipes.py``; this script and the
``videogpa-train-dpo`` console entry point share it.
"""

import os
import sys

try:
    import videogpa_tpu  # noqa: F401  (installed via `pip install -e .`)
except ModuleNotFoundError:  # raw-checkout fallback
    sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "../..")))

from videogpa_tpu.cli.train_dpo import main as _main


def main():
    _main(["Wan2.2-TI2V-5B", *sys.argv[1:]])


if __name__ == "__main__":
    main()
