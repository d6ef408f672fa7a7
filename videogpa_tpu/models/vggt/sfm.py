"""VGGT SfM dependency pack, TPU-native subset.

Counterpart of the reference's ``vggt/dependency/*`` (distortion, projection,
np<->pycolmap interop, track prediction — ``vggt/dependency/distortion.py``,
``projection.py``, ``np_to_pycolmap.py``, ``track_predict.py``). No VideoGPA
code path imports these, so they exist for standalone-VGGT completeness:

- OpenCV-style polynomial distortion (1/2/4-parameter models) with the
  Newton iterative undistortion, as jittable JAX (``lax.while_loop`` with the
  same numeric-Jacobian update) — parity-tested against the vendored torch
  implementation.
- Batched 3D-point projection with optional distortion.
- COLMAP interop built on ``models.da3.colmap_io`` dataclasses instead of
  pycolmap (not installed here): batched matrices + tracks -> a COLMAP model
  and back.
- ``predict_tracks``: query-keypoint tracking over an image set — by
  default on our VGGT track head, or on the rebuilt VGGSfM coarse-to-fine
  tracker (``videogpa_tpu/models/vggt/vggsfm_tracker.py``, torch-oracle
  parity-tested; load its public checkpoint via
  ``loader.load_vggsfm_tracker``) when ``tracker_params`` is given —
  matching the reference's ``track_predict.py`` driver. Query frames are
  ranked by DINO cls-feature similarity like
  ``vggsfm_utils.generate_rank_by_dino``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videogpa_tpu.models.vggt.config import VGGTConfig


# ---------------------------------------------------------------------------
# Distortion (vggt/dependency/distortion.py parity)
# ---------------------------------------------------------------------------

def apply_distortion(params: jax.Array, u: jax.Array, v: jax.Array):
    """Radial / OpenCV distortion. params: (B, k) with k in {1, 2, 4};
    u, v: (B, N) normalized coords. Returns distorted (u, v)."""
    k = params.shape[1]
    u2, v2 = u * u, v * v
    r2 = u2 + v2
    if k == 1:
        radial = params[:, 0:1] * r2
        du, dv = u * radial, v * radial
    elif k == 2:
        radial = params[:, 0:1] * r2 + params[:, 1:2] * r2 * r2
        du, dv = u * radial, v * radial
    elif k == 4:
        k1, k2 = params[:, 0:1], params[:, 1:2]
        p1, p2 = params[:, 2:3], params[:, 3:4]
        uv = u * v
        radial = k1 * r2 + k2 * r2 * r2
        du = u * radial + 2 * p1 * uv + p2 * (r2 + 2 * u2)
        dv = v * radial + 2 * p2 * uv + p1 * (r2 + 2 * v2)
    else:
        raise ValueError(f"unsupported number of distortion parameters: {k}")
    return u + du, v + dv


def iterative_undistortion(
    params: jax.Array,
    tracks_normalized: jax.Array,
    max_iterations: int = 100,
    max_step_norm: float = 1e-10,
    rel_step_size: float = 1e-6,
) -> jax.Array:
    """Newton undistortion with a numeric Jacobian (COLMAP's scheme, as in
    the reference). tracks_normalized: (B, N, 2) -> undistorted (B, N, 2)."""
    orig_u = tracks_normalized[..., 0]
    orig_v = tracks_normalized[..., 1]
    eps = jnp.finfo(orig_u.dtype).eps

    def step(carry):
        u, v, _, it = carry
        u_d, v_d = apply_distortion(params, u, v)
        dx = orig_u - u_d
        dy = orig_v - v_d
        su = jnp.maximum(jnp.abs(u) * rel_step_size, eps)
        sv = jnp.maximum(jnp.abs(v) * rel_step_size, eps)
        J00 = (apply_distortion(params, u + su, v)[0]
               - apply_distortion(params, u - su, v)[0]) / (2 * su) + 1
        J01 = (apply_distortion(params, u, v + sv)[0]
               - apply_distortion(params, u, v - sv)[0]) / (2 * sv)
        J10 = (apply_distortion(params, u + su, v)[1]
               - apply_distortion(params, u - su, v)[1]) / (2 * su)
        J11 = (apply_distortion(params, u, v + sv)[1]
               - apply_distortion(params, u, v - sv)[1]) / (2 * sv) + 1
        # solve the 2x2 system in closed form
        det = J00 * J11 - J01 * J10
        det = jnp.where(jnp.abs(det) < 1e-32, 1e-32, det)
        delta_u = (J11 * dx - J01 * dy) / det
        delta_v = (J00 * dy - J10 * dx) / det
        step_norm = jnp.max(delta_u**2 + delta_v**2)
        return u + delta_u, v + delta_v, step_norm, it + 1

    def cond(carry):
        _, _, step_norm, it = carry
        return jnp.logical_and(it < max_iterations, step_norm >= max_step_norm)

    u0 = orig_u
    v0 = orig_v
    u, v, _, _ = jax.lax.while_loop(
        cond, step, (u0, v0, jnp.asarray(jnp.inf, orig_u.dtype), 0)
    )
    return jnp.stack([u, v], axis=-1)


# ---------------------------------------------------------------------------
# Projection (vggt/dependency/projection.py parity)
# ---------------------------------------------------------------------------

def img_from_cam(
    intrinsics: jax.Array,
    points_cam: jax.Array,
    extra_params: Optional[jax.Array] = None,
    default: float = 0.0,
) -> jax.Array:
    """K (B,3,3) x camera-space points (B,3,N) -> pixels (B,N,2), with
    optional distortion applied to the normalized coordinates."""
    z = points_cam[:, 2:3, :]
    uvw = points_cam / z
    uv = uvw[:, :2, :]
    if extra_params is not None:
        uu, vv = apply_distortion(extra_params, uv[:, 0], uv[:, 1])
        uv = jnp.stack([uu, vv], axis=1)
    ones = jnp.ones_like(uv[:, :1])
    pts_h = jnp.concatenate([uv, ones], axis=1)
    pts2d = jnp.einsum("bij,bjn->bin", intrinsics, pts_h)[:, :2]
    pts2d = jnp.nan_to_num(pts2d, nan=default)
    return jnp.transpose(pts2d, (0, 2, 1))


def project_3d_points(
    points3d: jax.Array,
    extrinsics: jax.Array,
    intrinsics: Optional[jax.Array] = None,
    extra_params: Optional[jax.Array] = None,
    default: float = 0.0,
    only_points_cam: bool = False,
):
    """World points (N,3) through B cameras (B,3,4 [R|t]); returns
    (points2d (B,N,2) | None, points_cam (B,3,N))."""
    N = points3d.shape[0]
    h = jnp.concatenate([points3d, jnp.ones((N, 1), points3d.dtype)], axis=1)
    points_cam = jnp.einsum("bij,nj->bin", extrinsics, h)  # (B,3,N)
    if only_points_cam:
        return None, points_cam
    if intrinsics is None:
        raise ValueError("intrinsics required unless only_points_cam=True")
    return img_from_cam(intrinsics, points_cam, extra_params, default), points_cam


# ---------------------------------------------------------------------------
# COLMAP interop (np_to_pycolmap.py equivalent over colmap_io structures)
# ---------------------------------------------------------------------------

def batch_matrix_to_colmap(
    points3d: np.ndarray,
    extrinsics: np.ndarray,
    intrinsics: np.ndarray,
    tracks: np.ndarray,
    valid_mask: Optional[np.ndarray] = None,
    image_size: Tuple[int, int] = (518, 518),
    shared_camera: bool = False,
):
    """(P,3) points + (B,3,4) poses + (B,3,3) K + (B,P,2) track pixels ->
    (cameras, images, points3D) dicts of colmap_io dataclasses.

    valid_mask: optional (B, P) bool — which observations enter each image's
    2D point list / the 3D points' tracks (reference
    ``np_to_pycolmap.py:12-147``).
    """
    from videogpa_tpu.geometry import mat_to_quat
    from videogpa_tpu.models.da3.colmap_io import (
        ColmapCamera,
        ColmapImage,
        ColmapPoint3D,
    )

    B, P = tracks.shape[:2]
    W, H = image_size
    if valid_mask is None:
        valid_mask = np.ones((B, P), bool)

    cameras: Dict[int, ColmapCamera] = {}
    for b in range(B):
        cam_id = 1 if shared_camera else b + 1
        if cam_id not in cameras:
            K = intrinsics[b]
            cameras[cam_id] = ColmapCamera(
                id=cam_id, model="PINHOLE", width=W, height=H,
                params=np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], np.float64),
            )

    point_tracks: Dict[int, List[Tuple[int, int]]] = {p: [] for p in range(P)}
    images: Dict[int, ColmapImage] = {}
    for b in range(B):
        obs_idx = np.nonzero(valid_mask[b])[0]
        xys = tracks[b, obs_idx].astype(np.float64)
        p3d_ids = obs_idx + 1
        for row, p in enumerate(obs_idx):
            point_tracks[int(p)].append((b + 1, row))
        q_xyzw = np.asarray(mat_to_quat(jnp.asarray(extrinsics[b : b + 1, :3, :3])))[0]
        images[b + 1] = ColmapImage(
            id=b + 1,
            qvec=np.array([q_xyzw[3], q_xyzw[0], q_xyzw[1], q_xyzw[2]]),
            tvec=extrinsics[b, :3, 3].astype(np.float64),
            camera_id=1 if shared_camera else b + 1,
            name=f"frame_{b:05d}.png",
            xys=xys,
            point3D_ids=p3d_ids.astype(np.int64),
        )

    points3D: Dict[int, ColmapPoint3D] = {}
    for p in range(P):
        track = point_tracks[p]
        points3D[p + 1] = ColmapPoint3D(
            id=p + 1,
            xyz=points3d[p].astype(np.float64),
            rgb=np.array([128, 128, 128], np.uint8),
            error=0.0,
            image_ids=np.array([t[0] for t in track], np.int64),
            point2D_idxs=np.array([t[1] for t in track], np.int64),
        )
    return cameras, images, points3D


def colmap_to_batch_matrix(cameras, images, points3D):
    """Inverse of :func:`batch_matrix_to_colmap` (reference
    ``pycolmap_to_batch_np_matrix``): -> (points3d (P,3), extrinsics (B,3,4),
    intrinsics (B,3,3))."""
    img_ids = sorted(images)
    extr = np.stack([images[i].extrinsic[:3] for i in img_ids])
    intr = np.stack([cameras[images[i].camera_id].K for i in img_ids])
    pts = np.stack([points3D[p].xyz for p in sorted(points3D)]) if points3D else \
        np.zeros((0, 3))
    return pts.astype(np.float32), extr.astype(np.float32), intr.astype(np.float32)


# ---------------------------------------------------------------------------
# Track prediction (track_predict.py equivalent on the VGGT track head)
# ---------------------------------------------------------------------------

def rank_query_frames(cls_feats: np.ndarray, query_frame_num: int) -> List[int]:
    """Rank frames for querying by DINO cls-feature similarity — the frame
    most similar to all others first (``vggsfm_utils.generate_rank_by_dino``
    uses the same mean-cosine-similarity ranking)."""
    f = cls_feats / (np.linalg.norm(cls_feats, axis=-1, keepdims=True) + 1e-8)
    sim = f @ f.T
    order = np.argsort(-sim.mean(axis=1))
    return [int(i) for i in order[:query_frame_num]]


def predict_tracks(
    params: dict,
    images: np.ndarray,
    cfg: VGGTConfig,
    conf: Optional[np.ndarray] = None,
    max_query_pts: int = 256,
    query_frame_num: int = 2,
    iters: int = 4,
    track_kwargs: Optional[dict] = None,
    tracker_params: Optional[dict] = None,
):
    """Track query keypoints from selected query frames across all images.

    Args:
        params: converted VGGT params (with the track head).
        images: (S, 3, H, W) in [0, 1].
        conf: optional (S, H, W) confidence used to bias query sampling
            (reference samples SuperPoint/ALIKED keypoints; without those
            weights the sampler takes the top-confidence grid points, or a
            uniform grid when conf is None).
        tracker_params: optional VGGSfM coarse-to-fine tracker pytree
            (``loader.load_vggsfm_tracker``). When given, tracking runs on
            the dedicated tracker like the reference's ``predict_tracks``
            (``vggt/dependency/track_predict.py:56,220``) instead of the
            VGGT track head; its vis doubles as conf (the VGGSfM tracker
            has no confidence head).

    Returns:
        dict with tracks (Q, S, N, 2), vis (Q, S, N), conf (Q, S, N), and
        query_frames (the ranked frame indices) — Q query frames.
    """
    from videogpa_tpu.models.vggt.model import vggt_forward

    S, _, H, W = images.shape
    x = jnp.asarray(images)[None]

    out = vggt_forward(params, x, cfg, query_points=None)
    # cls-like feature: mean pooled aggregator output is not exposed; use
    # depth-conf map means as a cheap frame signature when conf is absent
    if conf is None:
        sig = np.asarray(out["depth_conf"][0].reshape(S, -1))
    else:
        sig = conf.reshape(S, -1)
    query_frames = rank_query_frames(sig, query_frame_num)

    all_tracks, all_vis, all_conf = [], [], []
    for qf in query_frames:
        if conf is not None:
            flat = conf[qf].reshape(-1)
            idx = np.argsort(-flat)[:max_query_pts]
        else:
            idx = np.linspace(0, H * W - 1, max_query_pts).astype(int)
        qy = (idx // W).astype(np.float32)
        qx = (idx % W).astype(np.float32)
        qpts = jnp.asarray(np.stack([qx, qy], axis=1))[None]  # (1, N, 2)

        # roll so the query frame is first (the track head tracks from
        # frame 0), then roll results back
        order = np.roll(np.arange(S), -qf)
        xq = x[:, order]
        inv = np.argsort(order)
        if tracker_params is not None:
            from videogpa_tpu.models.vggt.vggsfm_tracker import (
                vggsfm_tracker_forward,
            )

            fine, _coarse, vis, _score = vggsfm_tracker_forward(
                tracker_params, xq, qpts, **(track_kwargs or {})
            )
            all_tracks.append(np.asarray(fine[0])[inv])
            all_vis.append(np.asarray(vis[0])[inv])
            all_conf.append(np.asarray(vis[0])[inv])
            continue
        res = vggt_forward(
            params, xq, cfg, query_points=qpts, track_kwargs=track_kwargs
        )
        all_tracks.append(np.asarray(res["track"][0])[inv])
        all_vis.append(np.asarray(res["vis"][0])[inv])
        all_conf.append(np.asarray(res["conf"][0])[inv])

    return {
        "tracks": np.stack(all_tracks),
        "vis": np.stack(all_vis),
        "conf": np.stack(all_conf),
        "query_frames": query_frames,
    }
