"""T5 text encoder family (T5-v1.1 XXL for CogVideoX, umT5-XXL for Wan)."""

from videogpa_tpu.models.t5.encoder import (
    T5Config,
    t5_encode,
    t5_encoder_init,
    convert_t5_encoder,
)

__all__ = ["T5Config", "t5_encoder_init", "t5_encode", "convert_t5_encoder"]
