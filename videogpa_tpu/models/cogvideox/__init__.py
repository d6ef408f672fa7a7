"""CogVideoX video diffusion family in JAX.

Rebuild of the diffusers CogVideoX stack the reference trains/samples through
(reference ``generate/CogVideoX-5B*.py``, ``train/CogVideoX*/03_train.py``):
DiT with joint text-video attention + 3D RoPE, 3D-causal VAE, v-prediction
schedulers (DDIM + DPM-Solver++), T2V/I2V pipelines.
"""

from videogpa_tpu.models.cogvideox.config import CogVideoXConfig
from videogpa_tpu.models.cogvideox.dit import dit_forward, dit_init
from videogpa_tpu.models.cogvideox.scheduler import CogVideoXScheduler

__all__ = ["CogVideoXConfig", "dit_init", "dit_forward", "CogVideoXScheduler"]
