"""CogVideoX-5B-I2V image-to-video generation on TPU.

Surface parity with reference ``generate/CogVideoX-5B-I2V.py`` including
--base_dir relative-image resolution.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from videogpa_tpu.cli.generate import add_common_args, run_generation
from videogpa_tpu.models.cogvideox import CogVideoXConfig


def main():
    parser = argparse.ArgumentParser(description="CogVideoX-5B I2V generation")
    add_common_args(parser, base_model="THUDM/CogVideoX-5B-I2V")
    parser.add_argument("--base_dir", type=str, default=None,
                        help="base dir for relative image paths")
    args = parser.parse_args()
    run_generation(
        args, CogVideoXConfig.cogvideox_5b_i2v(), i2v=True, base_dir=args.base_dir
    )


if __name__ == "__main__":
    main()
