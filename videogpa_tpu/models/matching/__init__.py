"""Learned keypoint matching: SuperPoint detector + LightGlue matcher (JAX)."""

from videogpa_tpu.models.matching.superpoint import (
    SuperPointConfig,
    superpoint_init,
    superpoint_forward,
    extract_keypoints,
    convert_superpoint,
)
from videogpa_tpu.models.matching.lightglue import (
    LightGlueConfig,
    lightglue_init,
    lightglue_match,
    convert_lightglue,
)

__all__ = [
    "SuperPointConfig",
    "superpoint_init",
    "superpoint_forward",
    "extract_keypoints",
    "convert_superpoint",
    "LightGlueConfig",
    "lightglue_init",
    "lightglue_match",
    "convert_lightglue",
]
