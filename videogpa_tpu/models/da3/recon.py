"""Reconstruction evaluation: TSDF fusion + chamfer/F-score metrics.

Parity targets: reference ``depth_anything_3/bench/utils.py`` —
``nn_correspondance`` (:72), ``evaluate_3d_reconstruction`` (:91),
``create_tsdf_volume``/``fuse_depth_to_tsdf`` (:173/:202). The reference
fuses via Open3D's ScalableTSDFVolume (CPU hash-grid, sequential
per-frame integrate). Open3D is unavailable here and hash-grids don't map
to XLA, so fusion is re-designed TPU-first: a **dense static-shape voxel
grid** whose TSDF update is one jitted program — all frames' depth maps
are sampled per voxel with bilinear lookup and averaged with the standard
truncated-SDF weighting. Surface points come from the zero-crossing shell
(|tsdf| < surface_frac) rather than marching cubes + mesh sampling; for
point-based chamfer/F-score metrics these are equivalent surfaces.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# chamfer / F-score (reference bench/utils.py:72-171)
# ---------------------------------------------------------------------------

def nn_correspondance(verts1: np.ndarray, verts2: np.ndarray) -> np.ndarray:
    """Distance from each point of verts2 to its nearest neighbour in verts1."""
    if len(verts1) == 0 or len(verts2) == 0:
        return np.array([])
    from scipy.spatial import cKDTree

    dist, _ = cKDTree(verts1).query(verts2, workers=-1)
    return np.asarray(dist).reshape(-1)


def voxel_down_sample(points: np.ndarray, voxel: float) -> np.ndarray:
    """Average one point per occupied voxel (Open3D voxel_down_sample)."""
    if len(points) == 0 or voxel <= 0:
        return points
    idx = np.floor(points / voxel).astype(np.int64)
    _, inv, counts = np.unique(idx, axis=0, return_inverse=True,
                               return_counts=True)
    sums = np.zeros((len(counts), 3), np.float64)
    np.add.at(sums, inv, points)
    return (sums / counts[:, None]).astype(points.dtype)


def evaluate_3d_reconstruction(
    pcd_pred: np.ndarray,
    pcd_trgt: np.ndarray,
    threshold: float = 0.05,
    down_sample: Optional[float] = None,
) -> Dict[str, float]:
    """acc/comp/overall chamfer + precision/recall/F-score at `threshold`."""
    if down_sample is not None and down_sample > 0:
        pcd_pred = voxel_down_sample(np.asarray(pcd_pred), down_sample)
        pcd_trgt = voxel_down_sample(np.asarray(pcd_trgt), down_sample)
    if len(pcd_pred) == 0 or len(pcd_trgt) == 0:
        return {"acc": float("inf"), "comp": float("inf"),
                "overall": float("inf"), "precision": 0.0, "recall": 0.0,
                "fscore": 0.0}
    d_pred = nn_correspondance(pcd_trgt, pcd_pred)  # accuracy
    d_gt = nn_correspondance(pcd_pred, pcd_trgt)  # completeness
    acc = float(np.mean(d_pred))
    comp = float(np.mean(d_gt))
    precision = float(np.mean(d_pred < threshold))
    recall = float(np.mean(d_gt < threshold))
    fscore = (2 * precision * recall / (precision + recall)
              if precision + recall > 0 else 0.0)
    return {"acc": acc, "comp": comp, "overall": (acc + comp) / 2,
            "precision": precision, "recall": recall, "fscore": fscore}


# ---------------------------------------------------------------------------
# TSDF fusion — one jitted dense-grid program
# ---------------------------------------------------------------------------

def _tsdf_integrate(
    centers: jax.Array,  # (N, 3) world voxel centers
    depths: jax.Array,  # (S, H, W)
    intrinsics: jax.Array,  # (S, 3, 3)
    extrinsics: jax.Array,  # (S, 4, 4) world->cam
    trunc: float,
    max_depth: float,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (tsdf (N,), weight (N,)): weighted-average truncated SDF."""
    H, W = depths.shape[-2:]

    def body(carry, frame):
        tsdf, weight = carry
        depth, K, E = frame
        cam = centers @ E[:3, :3].T + E[:3, 3]  # (N, 3)
        z = cam[:, 2]
        uv = cam[:, :2] / jnp.maximum(z[:, None], 1e-6)
        u = uv[:, 0] * K[0, 0] + K[0, 2]
        v = uv[:, 1] * K[1, 1] + K[1, 2]
        # bilinear depth lookup (zeros outside)
        u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 2)
        v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 2)
        fu, fv = u - u0, v - v0
        d = (depth[v0, u0] * (1 - fu) * (1 - fv)
             + depth[v0, u0 + 1] * fu * (1 - fv)
             + depth[v0 + 1, u0] * (1 - fu) * fv
             + depth[v0 + 1, u0 + 1] * fu * fv)
        inb = ((u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
               & (z > 1e-4) & (d > 1e-4) & (d < max_depth))
        sdf = (d - z) / trunc
        # standard TSDF rule: integrate only in front of the surface band
        w_new = (inb & (sdf > -1.0)).astype(tsdf.dtype)
        sdf = jnp.clip(sdf, -1.0, 1.0)
        tsdf = (tsdf * weight + sdf * w_new) / jnp.maximum(weight + w_new, 1e-6)
        return (tsdf, weight + w_new), None

    init = (jnp.zeros(centers.shape[0]), jnp.zeros(centers.shape[0]))
    (tsdf, weight), _ = jax.lax.scan(body, init, (depths, intrinsics, extrinsics))
    return tsdf, weight


_tsdf_integrate_j = jax.jit(_tsdf_integrate, static_argnums=(4, 5))


def fuse_depths_tsdf(
    depths: np.ndarray,  # (S, H, W)
    intrinsics: np.ndarray,  # (S, 3, 3)
    extrinsics: np.ndarray,  # (S, 3/4, 4) world->cam
    voxel_size: float = 0.04,
    trunc_factor: float = 4.0,
    max_depth: float = 10.0,
    surface_frac: float = 0.5,
    max_voxels: int = 48_000_000,
    min_weight: float = 1.0,
) -> np.ndarray:
    """Fuse depth maps into a dense TSDF grid; return surface points (M, 3).

    The grid bounds come from unprojected depth percentiles (robust to
    outliers); voxel_size grows if the bounds exceed ``max_voxels``.
    """
    from videogpa_tpu.geometry import affine_inverse, unproject_depth

    S = len(depths)
    if extrinsics.shape[-2] == 3:
        pad = np.tile(np.array([[0, 0, 0, 1.0]], np.float32), (S, 1, 1))
        extrinsics = np.concatenate([extrinsics, pad], axis=1)

    # drop frames with non-finite cameras/depths (degenerate predictions)
    ok = (np.isfinite(intrinsics).all((1, 2)) & np.isfinite(extrinsics).all((1, 2))
          & np.isfinite(depths).all((1, 2)))
    if not ok.all():
        depths, intrinsics, extrinsics = depths[ok], intrinsics[ok], extrinsics[ok]
    if len(depths) == 0:
        return np.zeros((0, 3), np.float32)

    # world-space bounds from subsampled unprojections
    sub_K = np.asarray(intrinsics) / np.array([4, 4, 1.0])[None, :, None]
    pts = np.asarray(unproject_depth(
        jnp.asarray(depths[:, ::4, ::4, None])[None],
        jnp.asarray(sub_K)[None],
        affine_inverse(jnp.asarray(extrinsics))[None],
    )).reshape(-1, 3)
    d = depths[:, ::4, ::4].reshape(-1)
    valid = (d > 1e-4) & (d < max_depth)
    if not valid.any():  # degenerate depth range: widen the truncation band
        valid = d > 1e-4
        max_depth = float(d[valid].max()) * 1.01 if valid.any() else max_depth
    if not valid.any():
        return np.zeros((0, 3), np.float32)
    pts = pts[valid]
    lo = np.percentile(pts, 1, axis=0) - 2 * voxel_size
    hi = np.percentile(pts, 99, axis=0) + 2 * voxel_size

    dims = np.ceil((hi - lo) / voxel_size).astype(int)
    while int(np.prod(dims)) > max_voxels:
        voxel_size *= 1.26  # ~2x voxel count reduction per step
        dims = np.ceil((hi - lo) / voxel_size).astype(int)
    trunc = trunc_factor * voxel_size

    ax = [lo[i] + (np.arange(dims[i]) + 0.5) * voxel_size for i in range(3)]
    gx, gy, gz = np.meshgrid(*ax, indexing="ij")
    centers = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)

    tsdf, weight = _tsdf_integrate_j(
        jnp.asarray(centers), jnp.asarray(depths, jnp.float32),
        jnp.asarray(intrinsics, jnp.float32),
        jnp.asarray(extrinsics, jnp.float32), float(trunc), float(max_depth),
    )
    tsdf = np.asarray(tsdf)
    weight = np.asarray(weight)
    mask = (np.abs(tsdf) < surface_frac) & (weight >= min_weight)
    return centers[mask]
