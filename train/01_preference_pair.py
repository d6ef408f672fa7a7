"""Score candidate videos per prompt group -> preference metadata.

Surface parity: reference ``train/01_preference_pair.py`` — reads a groups
metadata JSON, scores every candidate video with the geometry reward
(Consistency_Score + motion_norm at conf threshold 0, 10 frames/video),
writes the scores back into the metadata with resume support and atomic
saves. The multi-GPU spawn pool becomes a single TPU process streaming
videos through one jitted scoring graph. The implementation lives in
``videogpa_tpu.cli.score`` (also the ``videogpa-score`` console script).
"""

import os
import sys

try:
    import videogpa_tpu  # noqa: F401  (installed via `pip install -e .`)
except ModuleNotFoundError:  # raw-checkout fallback
    sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from videogpa_tpu.cli.score import main

if __name__ == "__main__":
    main()
