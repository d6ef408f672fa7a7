"""Geometry reward pipeline: frames -> pose/depth -> reprojection -> scores."""

from videogpa_tpu.reward.pointcloud import confidence_mask, colored_pointcloud
from videogpa_tpu.reward.processor import VideoProcessor

__all__ = ["VideoProcessor", "confidence_mask", "colored_pointcloud"]
