"""Encode candidate videos + conditions (CogVideoX1.5-5B variant: 81 frames).

Surface parity: reference ``train/CogVideoX1.5-5B/02_encode.py:31`` (81-frame
latent encoding, otherwise the shared CogVideoX encoder).
"""

import os
import runpy
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "../..")))

if __name__ == "__main__":
    argv = " ".join(sys.argv)
    if "--num_frames" not in argv:
        sys.argv += ["--num_frames", "81"]
    if "--model_path" not in argv:
        sys.argv += ["--model_path", "THUDM/CogVideoX1.5-5B"]
    runpy.run_path(
        os.path.join(os.path.dirname(__file__), "..", "CogVideoX-I2V-5B", "02_encode.py"),
        run_name="__main__",
    )
