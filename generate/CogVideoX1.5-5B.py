"""CogVideoX1.5-5B T2V generation on TPU.

Surface parity with reference ``generate/CogVideoX1.5-5B.py``: 81 frames at
768x1360, fps 16, dynamic cfg, ABSOLUTE LoRA scaling override (--lora_weight
sets module scaling directly, default 0.2 — reference :32-36).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from videogpa_tpu.cli.generate import add_common_args, run_generation
from videogpa_tpu.models.cogvideox import CogVideoXConfig


def main():
    parser = argparse.ArgumentParser(description="CogVideoX1.5-5B T2V generation")
    add_common_args(parser, base_model="THUDM/CogVideoX1.5-5B")
    parser.add_argument("--lora_weight", type=float, default=0.2,
                        help="absolute LoRA scaling override")
    parser.set_defaults(fps=16)
    args = parser.parse_args()
    run_generation(
        args, CogVideoXConfig.cogvideox_1_5_5b(), i2v=False, dynamic_cfg=True,
        lora_weight=args.lora_weight, absolute_lora=True,
        num_frames=81, height=768, width=1360,
    )


if __name__ == "__main__":
    main()
