"""Encode candidate videos + conditions (CogVideoX-5B T2V variant).

Surface parity: reference ``train/CogVideoX-5B/02_encode.py`` — same as the
I2V encoder without the image condition (49 frames, T5 max_len 226).
"""

import os
import runpy
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "../..")))

if __name__ == "__main__":
    sys.argv += ["--model_path", "THUDM/CogVideoX-5B"] if "--model_path" not in " ".join(sys.argv) else []
    runpy.run_path(
        os.path.join(os.path.dirname(__file__), "..", "CogVideoX-I2V-5B", "02_encode.py"),
        run_name="__main__",
    )
