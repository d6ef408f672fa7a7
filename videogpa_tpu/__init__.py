"""VideoGPA-TPU: a TPU-native (JAX/XLA/Pallas) rebuild of the VideoGPA framework.

VideoGPA ("Distilling Geometry Priors for 3D-Consistent Video Generation") is a
DPO post-training framework for video diffusion models that uses geometry
foundation models (VGGT / Depth Anything 3) as a self-supervised reward.

This package re-designs every component of the reference
(github.com/Hongyang-Du/VideoGPA) TPU-first:

- ``videogpa_tpu.geometry``  — pure-JAX camera/pose/projection math
- ``videogpa_tpu.ops``       — Pallas kernels + XLA compute primitives
- ``videogpa_tpu.models``    — VGGT, CogVideoX (DiT + 3D-causal VAE), Wan, DA3, LPIPS
- ``videogpa_tpu.metrics``   — MSE/PSNR/SSIM/LPIPS/Consistency/MVCS/Epipolar
- ``videogpa_tpu.reward``    — the frames -> geometry -> reprojection -> score pipeline
- ``videogpa_tpu.train``     — preference pairs, DPO loss, LoRA, pjit trainer
- ``videogpa_tpu.parallel``  — device mesh, sharding rules, collectives layout
- ``videogpa_tpu.data``      — host-side video IO feeding HBM with prefetch
"""

__version__ = "0.1.0"
