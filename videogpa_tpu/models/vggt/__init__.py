"""VGGT (Visual Geometry Grounded Transformer) in JAX.

Rebuild of Meta's VGGT-1B (reference ``vggt/``): DINOv2 ViT-L patch embed,
frame/global alternating-attention aggregator, iterative camera head, and DPT
depth/point heads. The scoring path of VideoGPA consumes pose_enc, depth and
world points (reference ``pipelines/process_video.py:66-98``).
"""

from videogpa_tpu.models.vggt.config import VGGTConfig
from videogpa_tpu.models.vggt.model import vggt_init, vggt_forward

__all__ = ["VGGTConfig", "vggt_init", "vggt_forward"]
