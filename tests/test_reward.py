"""End-to-end reward pipeline smoke test: video file -> scores dict."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videogpa_tpu.data.video_io import sample_uniform_frames, write_video
from videogpa_tpu.metrics import (
    ConsistencyScore,
    EpipolarMetric,
    MSEMetric,
    MVCSMetric,
    PSNRMetric,
    SSIMMetric,
)
from videogpa_tpu.models.vggt import VGGTConfig, vggt_init
from videogpa_tpu.reward import VideoProcessor


def _textured_video(T=6, H=96, W=128, seed=0):
    """Moving textured pattern (gives SIFT something to match)."""
    rng = np.random.default_rng(seed)
    base = (rng.uniform(0, 255, (H * 2, W * 2, 3))).astype(np.uint8)
    import cv2

    base = cv2.GaussianBlur(base, (0, 0), 2)
    frames = []
    for t in range(T):
        frames.append(base[t * 2 : t * 2 + H, t * 3 : t * 3 + W])
    return np.stack(frames)


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("vids") / "clip.mp4")
    write_video(p, _textured_video(), fps=8)
    return p


class TestVideoIO:
    def test_roundtrip_and_sampling(self, video_path):
        frames = sample_uniform_frames(video_path, n_frames=4, size=56)
        assert frames.shape == (4, 56, 56, 3)
        assert frames.dtype == np.uint8

    def test_sampling_caps_at_total(self, video_path):
        frames = sample_uniform_frames(video_path, n_frames=100, size=56)
        assert frames.shape[0] == 6


class TestVideoProcessor:
    def test_end_to_end_scores(self, video_path):
        cfg = VGGTConfig.tiny()
        params = vggt_init(jax.random.PRNGKey(0), cfg)
        metrics = {
            "MSE": MSEMetric(),
            "Consistency_Score": ConsistencyScore(lpips_params=None),
            "MVCS": MVCSMetric(),
            "PSNR": PSNRMetric(),
            "SSIM": SSIMMetric(),
            "Epipolar": EpipolarMetric(),
        }
        vp = VideoProcessor(
            metrics,
            params=params,
            config=cfg,
            compute_dtype=jnp.float32,
            attn_impl="xla",
        )
        # tiny config takes 56x56 inputs
        frames = sample_uniform_frames(video_path, n_frames=3, size=cfg.img_size)
        results = vp.process_frames(frames, thresholds=[0])

        res = results[0]
        for key in ("MSE", "Consistency_Score", "motion_norm", "MVCS", "PSNR", "SSIM", "Epipolar"):
            assert key in res, key
            assert np.isfinite(res[key]), (key, res[key])
        assert "_extrinsic" in results
        assert np.asarray(results["_extrinsic"]).shape == (3, 3, 4)
        # random model => reprojection is poor; scores must still be sane
        assert 0 <= res["MSE"] <= 1
        assert -1 <= res["SSIM"] <= 1

    def test_da3_backbone_selectable(self):
        vp = VideoProcessor({}, backbone="da3")
        assert vp.backbone == "da3"

    def test_fused_scoring_matches_per_metric(self, video_path, monkeypatch):
        """The fused on-device scorer (one jit -> metric scalars) returns
        the same numbers as the reference-style per-metric host loop."""
        cfg = VGGTConfig.tiny()
        params = vggt_init(jax.random.PRNGKey(0), cfg)
        metrics = {
            "MSE": MSEMetric(),
            "Consistency_Score": ConsistencyScore(lpips_params=None),
            "MVCS": MVCSMetric(),
            "PSNR": PSNRMetric(),
            "SSIM": SSIMMetric(),
            "Epipolar": EpipolarMetric(),
        }
        frames = sample_uniform_frames(video_path, n_frames=3, size=cfg.img_size)

        def score(fused: bool):
            monkeypatch.setenv(
                "VIDEOGPA_NO_FUSED_METRICS", "0" if fused else "1"
            )
            vp = VideoProcessor(
                metrics, params=params, config=cfg,
                compute_dtype=jnp.float32, attn_impl="xla",
            )
            return vp.process_frames(frames, thresholds=[0])

        fused = score(True)
        ref = score(False)
        for key in ("MSE", "Consistency_Score", "motion_norm", "MVCS",
                    "PSNR", "SSIM", "Epipolar"):
            np.testing.assert_allclose(
                fused[0][key], ref[0][key], rtol=1e-4, atol=1e-5, err_msg=key
            )
        np.testing.assert_allclose(
            np.asarray(fused["_extrinsic"]), np.asarray(ref["_extrinsic"]),
            rtol=1e-4, atol=1e-5,
        )

    def test_dpt_chunk_is_score_invariant(self, video_path):
        """dpt_chunk only bounds the DPT head's peak memory (reference
        chunking, vggt/heads/dpt_head.py:115-171) — scores agree across
        chunk sizes (up to XLA fusion reassociation, ~1e-4 relative)."""
        cfg = VGGTConfig.tiny()
        params = vggt_init(jax.random.PRNGKey(0), cfg)
        frames = sample_uniform_frames(video_path, n_frames=3, size=cfg.img_size)
        outs = []
        for chunk in (1, 3):
            vp = VideoProcessor(
                {"MSE": MSEMetric()}, params=params, config=cfg,
                compute_dtype=jnp.float32, attn_impl="xla", dpt_chunk=chunk,
            )
            outs.append(vp.process_frames(frames, thresholds=[0])[0]["MSE"])
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-3)


class TestBatchedScoring:
    def test_process_paths_matches_single(self, video_path, tmp_path):
        """Batched K-clip graph produces the same scores as process()."""
        import shutil

        p2 = str(tmp_path / "clip2.mp4")
        write_video(p2, _textured_video(seed=3), fps=8)
        cfg = VGGTConfig.tiny()
        params = vggt_init(jax.random.PRNGKey(0), cfg)
        vp = VideoProcessor(
            {"Consistency_Score": ConsistencyScore(lpips_params=None)},
            params=params, config=cfg,
            compute_dtype=jnp.float32, attn_impl="xla",
        )
        batched = vp.process_paths([video_path, p2], [0], num_frames=4)
        singles = [vp.process(p, [0], num_frames=4) for p in (video_path, p2)]
        for b, s in zip(batched, singles):
            np.testing.assert_allclose(
                b[0]["Consistency_Score"], s[0]["Consistency_Score"],
                rtol=1e-4, atol=1e-5,
            )
            np.testing.assert_allclose(
                b[0]["motion_norm"], s[0]["motion_norm"], rtol=1e-4, atol=1e-6)

    def test_score_groups_batched(self, video_path, tmp_path):
        import json

        from videogpa_tpu.cli.score import score_groups

        p2 = str(tmp_path / "clip2.mp4")
        write_video(p2, _textured_video(seed=3), fps=8)
        cfg = VGGTConfig.tiny()
        params = vggt_init(jax.random.PRNGKey(0), cfg)
        vp = VideoProcessor(
            {"Consistency_Score": ConsistencyScore(lpips_params=None)},
            params=params, config=cfg,
            compute_dtype=jnp.float32, attn_impl="xla",
        )
        data = {"groups": [{"group_id": "g", "videos": [
            {"video_path": video_path}, {"video_path": p2},
        ]}]}
        out_json = str(tmp_path / "scored.json")
        stats = score_groups(vp, data, out_json, num_frames=4, batch_size=2)
        assert stats == {"scored": 2, "failed": 0, "resumed": 0}
        for v in data["groups"][0]["videos"]:
            assert np.isfinite(v["consistency_score"])
        # resume with batching: nothing re-scored
        stats2 = score_groups(vp, data, out_json, num_frames=4, batch_size=2)
        assert stats2["resumed"] == 2 and stats2["scored"] == 0


class TestPipelinedSingleClip:
    """Depth-2 single-clip pipelining (process_frames_async): same scores as
    the synchronous call, and score_groups' batch_size=1 loop uses it."""

    def test_async_matches_sync(self):
        cfg = VGGTConfig.tiny()
        params = vggt_init(jax.random.PRNGKey(0), cfg)
        vp = VideoProcessor(
            {"MSE": MSEMetric(),
             "Consistency_Score": ConsistencyScore(lpips_params=None)},
            params=params, config=cfg,
            compute_dtype=jnp.float32, attn_impl="xla",
        )
        S = cfg.img_size  # square img_size u8 -> the fused raw-upload path
        frames = np.random.default_rng(0).integers(
            0, 255, (4, S, S, 3), dtype=np.uint8)
        sync = vp.process_frames(frames, [0])
        handle = vp.process_frames_async(frames, [0])
        got = handle()
        np.testing.assert_allclose(
            got[0]["Consistency_Score"], sync[0]["Consistency_Score"],
            rtol=1e-5)
        np.testing.assert_allclose(
            got[0]["motion_norm"], sync[0]["motion_norm"], rtol=1e-5)
        assert got["_extrinsic"] == sync["_extrinsic"]

    def test_async_rejects_unfused(self):
        cfg = VGGTConfig.tiny()
        params = vggt_init(jax.random.PRNGKey(0), cfg)
        vp = VideoProcessor(
            {"MSE": MSEMetric()}, params=params, config=cfg,
            compute_dtype=jnp.float32, attn_impl="xla",
        )
        frames = np.random.default_rng(0).integers(
            0, 255, (4, 60, 80, 3), dtype=np.uint8)  # non-square -> f32 gt
        with pytest.raises(RuntimeError, match="fused"):
            vp.process_frames_async(frames, [0])

    @pytest.mark.slow
    def test_score_groups_single_clip_pipelined(self, tmp_path):
        from videogpa_tpu.cli.score import score_groups

        cfg = VGGTConfig.tiny()
        S = cfg.img_size
        rng = np.random.default_rng(1)
        paths = []
        for i in range(3):
            p = str(tmp_path / f"sq{i}.mp4")
            write_video(
                p, rng.integers(0, 255, (4, S, S, 3), dtype=np.uint8), fps=8
            )
            paths.append(p)
        params = vggt_init(jax.random.PRNGKey(0), cfg)
        vp = VideoProcessor(
            {"Consistency_Score": ConsistencyScore(lpips_params=None)},
            params=params, config=cfg,
            compute_dtype=jnp.float32, attn_impl="xla",
        )
        data = {"groups": [{"group_id": "g", "videos": [
            {"video_path": p} for p in paths
        ]}]}
        out_json = str(tmp_path / "scored.json")
        stats = score_groups(vp, data, out_json, num_frames=4, batch_size=1)
        assert stats == {"scored": 3, "failed": 0, "resumed": 0}
        # pipelined loop must produce the synchronous path's numbers
        for v, p in zip(data["groups"][0]["videos"], paths):
            ref = vp.process(p, [0], num_frames=4)
            np.testing.assert_allclose(
                v["consistency_score"], ref[0]["Consistency_Score"],
                rtol=1e-5)
            assert np.isfinite(v["motion_norm"])
