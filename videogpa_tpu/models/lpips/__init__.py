"""LPIPS perceptual distance (VGG16 backbone) in JAX."""

from videogpa_tpu.models.lpips.lpips import (
    lpips_distance,
    lpips_init,
    convert_lpips,
)

__all__ = ["lpips_distance", "lpips_init", "convert_lpips"]
