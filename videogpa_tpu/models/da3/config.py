"""DA3 configuration (da3-large preset).

Mirrors reference ``depth_anything_3/configs/da3-large.yaml``: ViT-L backbone,
out_layers [11, 15, 19, 23], alt/qknorm/rope start 8, cat_token, DualDPT
(dim_in 2048, features 256), CameraDec (dim_in 2048).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class DA3Config:
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    init_values: float = 1.0  # DINOv2 LayerScale
    alt_start: int = 8
    out_layers: Tuple[int, ...] = (11, 15, 19, 23)
    rope_base: float = 100.0
    ref_view_threshold: int = 3  # S >= 3 triggers reference-view selection
    # first | middle | saddle_balanced | saddle_sim_range
    # (reference model/reference_view_selector.py:29-110)
    ref_view_strategy: str = "saddle_balanced"

    # DualDPT
    dpt_features: int = 256
    dpt_out_channels: Tuple[int, int, int, int] = (256, 512, 1024, 1024)
    aux_out1_conv_num: int = 5

    @property
    def tokens_dim(self) -> int:
        return 2 * self.embed_dim  # cat_token: [local ‖ global]

    @staticmethod
    def large() -> "DA3Config":
        return DA3Config()

    @staticmethod
    def tiny() -> "DA3Config":
        return DA3Config(
            img_size=56,
            embed_dim=32,
            depth=8,
            num_heads=2,
            alt_start=2,
            out_layers=(3, 5, 7, 7),
            dpt_features=16,
            dpt_out_channels=(16, 16, 16, 16),
            aux_out1_conv_num=1,
        )
