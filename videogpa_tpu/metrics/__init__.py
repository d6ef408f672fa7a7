"""Metric suite: MSE/PSNR/SSIM/LPIPS/Consistency/MVCS/Epipolar.

Two layers:
- ``videogpa_tpu.metrics.functional`` — pure-JAX batched kernels (jit-safe).
- ``videogpa_tpu.metrics.api`` — reference-compatible class wrappers
  (``Metric.compute(gt=..., rep=...) -> float``) and ``build_metrics``
  mirroring reference ``replicate_scorer.py:63-74``.
"""

from videogpa_tpu.metrics.api import (
    ConsistencyScore,
    EpipolarMetric,
    LPIPSMetric,
    Metric,
    MSEMetric,
    MVCSMetric,
    PSNRMetric,
    SSIMMetric,
    build_metrics,
)

__all__ = [
    "Metric",
    "MSEMetric",
    "PSNRMetric",
    "SSIMMetric",
    "LPIPSMetric",
    "ConsistencyScore",
    "MVCSMetric",
    "EpipolarMetric",
    "build_metrics",
]
