"""Epipolar consistency metric: SIFT matching (host) + Sampson distance (JAX).

Parity target: reference ``metrics/epipolar.py`` SIFT path — consecutive-frame
keypoint matching with Lowe ratio test (0.75), normalized 8-point fundamental,
mean sqrt-Sampson distance in pixels, -1.0 when no frame pair yields enough
matches.

SIFT keypoint detection is inherently host-side (OpenCV); the geometry
(fundamental estimation + Sampson) runs in JAX so it can later be batched on
device. The reference's learned alternative (SuperPoint+LightGlue) is also
implemented in JAX — see ``LightGlueMatcher`` below and
``videogpa_tpu/models/matching/`` — selected via ``descriptor_type``; SIFT is
the reference's default (``replicate_scorer.py:46`` env default "sift").
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from videogpa_tpu.metrics.functional import find_fundamental, sampson_distance


class SIFTMatcher:
    def __init__(self, ratio_thresh: float = 0.75, min_matches: int = 20):
        import cv2

        self._cv2 = cv2
        self.ratio_thresh = ratio_thresh
        self.min_matches = min_matches
        self.sift = cv2.SIFT_create()

    def get_matched_points(
        self, frame1: np.ndarray, frame2: np.ndarray
    ) -> Tuple[Optional[np.ndarray], Optional[np.ndarray], int]:
        cv2 = self._cv2

        def gray(f):
            if f.ndim == 3:
                if f.shape[0] == 3:
                    f = f.transpose(1, 2, 0)
                return cv2.cvtColor(f, cv2.COLOR_RGB2GRAY)
            return f

        kp1, d1 = self.sift.detectAndCompute(gray(frame1), None)
        kp2, d2 = self.sift.detectAndCompute(gray(frame2), None)
        if len(kp1) < 8 or len(kp2) < 8 or d1 is None or d2 is None:
            return None, None, 0

        bf = cv2.BFMatcher()
        matches = bf.knnMatch(d1, d2, k=2)
        good = [m for pair in matches if len(pair) == 2
                for m, n in [pair] if m.distance < self.ratio_thresh * n.distance]
        if len(good) < self.min_matches:
            return None, None, len(good)

        pts1 = np.array([kp1[m.queryIdx].pt for m in good], np.float32)
        pts2 = np.array([kp2[m.trainIdx].pt for m in good], np.float32)
        return pts1, pts2, len(good)


class LightGlueMatcher:
    """SuperPoint + LightGlue matcher (JAX) — the reference scorer's default
    descriptor (reference ``replicate_scorer.py:46``).

    Weights: pass converted param pytrees, or set VIDEOGPA_SUPERPOINT_PATH /
    VIDEOGPA_LIGHTGLUE_PATH to .npz pytrees saved with
    ``videogpa_tpu.checkpoint.save_pytree``.
    """

    def __init__(self, min_matches: int = 20, sp_params=None, lg_params=None):
        import os

        import jax

        from videogpa_tpu.models.matching import (
            LightGlueConfig,
            SuperPointConfig,
            lightglue_init,
            superpoint_init,
        )

        self.min_matches = min_matches
        self.sp_cfg = SuperPointConfig()
        self.lg_cfg = LightGlueConfig()

        def load(env, provided, init):
            if provided is not None:
                return provided
            path = os.environ.get(env)
            if path and os.path.exists(path):
                from videogpa_tpu.checkpoint import load_pytree

                return load_pytree(path)
            return init(jax.random.PRNGKey(0))

        self.sp_params = load("VIDEOGPA_SUPERPOINT_PATH", sp_params, superpoint_init)
        self.lg_params = load("VIDEOGPA_LIGHTGLUE_PATH", lg_params, lightglue_init)

    def get_matched_points(self, frame1: np.ndarray, frame2: np.ndarray):
        import jax.numpy as jnp

        from videogpa_tpu.models.matching import (
            extract_keypoints,
            lightglue_match,
            superpoint_forward,
        )

        def gray(f):
            if f.ndim == 3:
                return (0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2])
            return f.astype(np.float32)

        H, W = frame1.shape[:2]
        # pad to /8-divisible
        Hp, Wp = -(-H // 8) * 8, -(-W // 8) * 8
        imgs = np.zeros((2, 1, Hp, Wp), np.float32)
        imgs[0, 0, :H, :W] = gray(frame1) / 255.0
        imgs[1, 0, :H, :W] = gray(frame2) / 255.0

        scores, desc = superpoint_forward(self.sp_params, jnp.asarray(imgs), self.sp_cfg)
        kpts, kp_scores, descs, valid = extract_keypoints(scores, desc, self.sp_cfg)
        matches0, m_scores = lightglue_match(
            self.lg_params,
            kpts[:1], descs[:1], valid[:1],
            kpts[1:], descs[1:], valid[1:],
            (Hp, Wp), self.lg_cfg,
        )
        m = np.asarray(matches0[0])
        good = m >= 0
        n = int(good.sum())
        if n < self.min_matches:
            return None, None, n
        pts1 = np.asarray(kpts[0])[good]
        pts2 = np.asarray(kpts[1])[m[good]]
        return pts1.astype(np.float32), pts2.astype(np.float32), n


def frames_to_uint8(x) -> np.ndarray:
    """Accept (T,C,H,W)/(T,H,W,C) in [-1,1]/[0,1]/[0,255] -> (T,H,W,C) uint8."""
    x = np.asarray(x)
    if x.ndim == 3:
        x = x[None]
    if x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
        x = x.transpose(0, 2, 3, 1)
    if x.min() < 0:
        x = (x + 1.0) * 127.5
    elif x.max() <= 1.0:
        x = x * 255.0
    return np.clip(x, 0, 255).astype(np.uint8)


def epipolar_error(frames, matcher: Optional[SIFTMatcher] = None) -> float:
    """Mean Sampson distance (px) over consecutive frame pairs; -1.0 if none."""
    matcher = matcher or SIFTMatcher()
    frames = frames_to_uint8(frames)
    errors = []
    for i in range(len(frames) - 1):
        pts1, pts2, n = matcher.get_matched_points(frames[i], frames[i + 1])
        if pts1 is None:
            continue
        F = find_fundamental(pts1, pts2)
        if not np.isfinite(np.asarray(F)).all():
            continue
        d = np.asarray(sampson_distance(pts1, pts2, F, squared=False))
        errors.append(float(np.mean(d)))
    if not errors:
        return -1.0
    return float(np.mean(errors))
