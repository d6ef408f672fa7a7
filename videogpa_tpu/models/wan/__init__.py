"""Wan2.2 TI2V-5B video diffusion family in JAX.

Rebuild of the external Wan2.2 stack the reference depends on
(``generate/Wan2.2-TI2V-5B.py:13-21`` imports it from a sibling checkout;
``train/Wan2.2-TI2V-5B/03_train.py`` trains its DiT with flow matching):
WanModel DiT (self-attn + text cross-attn, per-token timesteps), shifted
flow-matching schedule, Wan VAE (z=48, stride (4,16,16)).
"""

from videogpa_tpu.models.wan.config import WanConfig
from videogpa_tpu.models.wan.dit import wan_forward, wan_init
from videogpa_tpu.models.wan.flow_match import (
    flow_add_noise,
    flow_velocity_target,
    sigma_from_timestep,
    ti2v_timestep_tokens,
)

__all__ = [
    "WanConfig",
    "wan_init",
    "wan_forward",
    "sigma_from_timestep",
    "flow_add_noise",
    "flow_velocity_target",
    "ti2v_timestep_tokens",
]
