"""CogVideoX-5B T2V generation on TPU.

Surface parity with reference ``generate/CogVideoX-5B.py`` (same flags and
operating point: 50 DPM steps, cfg 6.0, 49 frames @ 480x720, fps 8).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from videogpa_tpu.cli.generate import add_common_args, run_generation
from videogpa_tpu.models.cogvideox import CogVideoXConfig


def main():
    parser = argparse.ArgumentParser(description="CogVideoX-5B T2V generation")
    add_common_args(parser, base_model="THUDM/CogVideoX-5B")
    args = parser.parse_args()
    run_generation(args, CogVideoXConfig.cogvideox_5b(), i2v=False)


if __name__ == "__main__":
    main()
