"""Depth Anything 3 (DA3) in JAX — the reference's default scoring backbone.

Rebuild of ByteDance's DA3 (reference ``depth_anything_3/``): DINOv2 AA-ViT
with alternating local/global attention from ``alt_start``, reference-view
selection, camera-token injection, DualDPT depth+ray head, camera decoder.
The replicate protocol scores with SCORE_BACKBONE="da3"
(reference ``replicate.sh:95``).
"""

from videogpa_tpu.models.da3.config import DA3Config
from videogpa_tpu.models.da3.model import da3_init, da3_forward, da3_inference

__all__ = ["DA3Config", "da3_init", "da3_forward", "da3_inference"]
