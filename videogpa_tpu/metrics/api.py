"""Reference-compatible metric classes.

Same call contract as the reference (``metrics/base.py:18-31``):
``metric.compute(gt=..., rep=..., **kw) -> float`` over whole videos, with
the same input-range coercions.

Performance note: the eager-op dispatch overhead of the TPU backend dominates
if conversions run outside jit, so every metric is exactly ONE jitted device
call — layout/range normalization happens inside the traced function (shape
logic specializes at trace time).
"""

from __future__ import annotations

import functools
from abc import ABC, abstractmethod
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from videogpa_tpu.metrics import functional as F
from videogpa_tpu.metrics.epipolar import LightGlueMatcher, SIFTMatcher, epipolar_error
from videogpa_tpu.models.lpips import lpips_distance


def _tchw(x: jax.Array) -> jax.Array:
    """Trace-time layout normalization to (T, C, H, W) float32."""
    if x.ndim == 3:
        x = x[None]
    if x.shape[-1] in (1, 3) and x.shape[1] not in (1, 3):
        x = jnp.transpose(x, (0, 3, 1, 2))
    return x.astype(jnp.float32)


@jax.jit
def _mse_j(gt, rep):
    return F.mse(_tchw(gt), _tchw(rep))


@jax.jit
def _psnr_j(gt, rep):
    return F.psnr(_tchw(gt), _tchw(rep))


@jax.jit
def _ssim_j(gt, rep):
    return F.ssim(_tchw(gt), _tchw(rep))


@jax.jit
def _lpips_j(params, gt, rep):
    gt_t = F.to_sym_range(_tchw(gt))
    rep_t = F.to_sym_range(_tchw(rep))
    rep_t = F._match_size(gt_t, rep_t)
    return jnp.mean(lpips_distance(params, gt_t, rep_t))


@functools.partial(jax.jit, static_argnames=("ratio", "with_lpips"))
def _consistency_j(params, gt, rep, extrinsics, ratio=1.0, with_lpips=True):
    gt_t = _tchw(gt)
    rep_t = _tchw(rep)
    val = F.mse(gt_t, rep_t)
    if with_lpips:
        g = F.to_sym_range(gt_t)
        r = F._match_size(g, F.to_sym_range(rep_t))
        val = val + ratio * jnp.mean(lpips_distance(params, g, r))
    motion = F.motion_score(extrinsics.astype(jnp.float32))
    return val, motion


@jax.jit
def _mvcs_j(depths, intrinsics, extrinsics):
    d = depths.astype(jnp.float32)
    if d.ndim == 4:
        d = d[:, 0] if d.shape[1] == 1 else d[..., 0]
    K = intrinsics.astype(jnp.float32)
    if K.shape[-2:] == (4, 4):
        K = K[..., :3, :3]
    E = extrinsics.astype(jnp.float32)
    if E.shape[-2:] == (3, 4):
        bottom = jnp.broadcast_to(jnp.array([0.0, 0, 0, 1]), E.shape[:-2] + (1, 4))
        E = jnp.concatenate([E, bottom], axis=-2)
    return F.mvcs(d, K, E)


class Metric(ABC):
    def __init__(self, name: str):
        self.name = name

    @abstractmethod
    def compute(self, *, gt, rep, **kwargs) -> float:
        raise NotImplementedError

    def __call__(self, *args: Any, **kwargs: Any) -> float:
        return self.compute(*args, **kwargs)


class MSEMetric(Metric):
    def __init__(self):
        super().__init__("mse")

    def compute(self, *, gt, rep, **kwargs) -> float:
        return float(_mse_j(jnp.asarray(gt), jnp.asarray(rep)))


class PSNRMetric(Metric):
    def __init__(self, **_):
        super().__init__("psnr")

    def compute(self, *, gt, rep, **kwargs) -> float:
        return float(_psnr_j(jnp.asarray(gt), jnp.asarray(rep)))


class SSIMMetric(Metric):
    def __init__(self, **_):
        super().__init__("ssim")

    def compute(self, *, gt, rep, **kwargs) -> float:
        return float(_ssim_j(jnp.asarray(gt), jnp.asarray(rep)))


class LPIPSMetric(Metric):
    def __init__(self, lpips_params: Optional[dict] = None, **_):
        super().__init__("lpips")
        self.params = lpips_params if lpips_params is not None else _default_lpips()

    def compute(self, *, gt, rep, **kwargs) -> float:
        if self.params is None:
            return 0.0
        return float(_lpips_j(self.params, jnp.asarray(gt), jnp.asarray(rep)))


class ConsistencyScore(Metric):
    """MSE + ratio * LPIPS (+ motion score returned separately).

    Mirrors reference ``metrics/consistency_score.py:43-72`` including the
    default ratio=1 from the function signature (the docstring there claims
    0.1; the signature default is what executes and is preserved here).
    """

    def __init__(self, lpips_params: Optional[dict] = None, **_):
        super().__init__("Consistency_Score")
        self.params = lpips_params if lpips_params is not None else _default_lpips()

    def compute(self, *, gt, rep, extrinsics, ratio: float = 1, **kwargs):
        score, motion = _consistency_j(
            self.params if self.params is not None else {"convs": [], "lins": []},
            jnp.asarray(gt),
            jnp.asarray(rep),
            jnp.asarray(np.asarray(extrinsics)),
            ratio=float(ratio),
            with_lpips=self.params is not None,
        )
        return float(score), float(motion)


class MVCSMetric(Metric):
    def __init__(self, **_):
        super().__init__("MVCS")

    def compute(self, *, gt, rep, depths, intrinsics, extrinsics, **kwargs) -> float:
        return float(
            _mvcs_j(
                jnp.asarray(np.asarray(depths)),
                jnp.asarray(np.asarray(intrinsics)),
                jnp.asarray(np.asarray(extrinsics)),
            )
        )


class EpipolarMetric(Metric):
    def __init__(self, descriptor_type: str = "sift", ratio_thresh: float = 0.75,
                 min_matches: int = 20, **_):
        super().__init__("Epipolar")
        if descriptor_type == "sift":
            self.matcher = SIFTMatcher(ratio_thresh, min_matches)
        elif descriptor_type == "lightglue":
            self.matcher = LightGlueMatcher(min_matches=min_matches)
        else:
            raise ValueError(f"Unsupported descriptor type: {descriptor_type}")

    def compute(self, *, gt, rep, **kwargs) -> float:
        # reference computes temporal consistency of gt only
        return epipolar_error(np.asarray(gt), self.matcher)


_LPIPS_CACHE: Dict[str, Optional[dict]] = {}


def _default_lpips() -> Optional[dict]:
    """Load converted LPIPS weights from VIDEOGPA_LPIPS_PATH, else None.

    With None the LPIPS term is 0 (MSE-only consistency score) — callers that
    need strict reference parity must provide converted weights.
    """
    import os

    if "params" in _LPIPS_CACHE:
        return _LPIPS_CACHE["params"]
    path = os.environ.get("VIDEOGPA_LPIPS_PATH")
    params = None
    if path and os.path.exists(path):
        from videogpa_tpu.checkpoint import load_pytree

        params = load_pytree(path)
    _LPIPS_CACHE["params"] = params
    return params


def build_metrics(lpips_params: Optional[dict] = None,
                  descriptor_type: str = "sift") -> Dict[str, Metric]:
    """Full scorer metric set (reference ``replicate_scorer.py:63-74``)."""
    lp = lpips_params if lpips_params is not None else _default_lpips()
    return {
        "MSE": MSEMetric(),
        "Consistency_Score": ConsistencyScore(lp),
        "MVCS": MVCSMetric(),
        "PSNR": PSNRMetric(),
        "SSIM": SSIMMetric(),
        "LPIPS": LPIPSMetric(lp),
        "Epipolar": EpipolarMetric(descriptor_type=descriptor_type),
    }
