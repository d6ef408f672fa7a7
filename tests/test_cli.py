"""CLI/driver tests: prompt loading, score config env surface, checkpointer."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest


class TestPromptLoading:
    def test_dict_and_list_formats(self, tmp_path):
        from videogpa_tpu.cli.generate import load_tasks

        p1 = tmp_path / "d.json"
        p1.write_text(json.dumps({"a": "prompt A", "b": {"text_prompt": "B", "image_path": "x.png"}}))
        tasks = load_tasks(str(p1), None)
        assert tasks[0]["group_id"] == "a" and tasks[0]["text_prompt"] == "prompt A"
        assert tasks[1]["image_path"] == "x.png"

        p2 = tmp_path / "l.json"
        p2.write_text(json.dumps([{"group_id": "g", "prompt": "P"}]))
        tasks = load_tasks(str(p2), 5)
        assert len(tasks) == 1

    def test_num_prompts_limit(self, tmp_path):
        from videogpa_tpu.cli.generate import load_tasks

        p = tmp_path / "many.json"
        p.write_text(json.dumps({str(i): f"p{i}" for i in range(10)}))
        assert len(load_tasks(str(p), 3)) == 3


class TestReplicateScorerConfig:
    def test_env_surface(self, monkeypatch):
        monkeypatch.setenv("SCORE_BACKBONE", "vggt")
        monkeypatch.setenv("SCORE_NUM_FRAMES", "7")
        monkeypatch.setenv("SCORE_RESUME", "true")
        monkeypatch.setenv("SCORE_SEED_FILTER", "456")
        sys.path.insert(0, "/root/repo")
        import importlib

        import replicate_scorer

        importlib.reload(replicate_scorer)
        cfg = replicate_scorer.build_score_config()
        assert cfg["backbone"] == "vggt"
        assert cfg["model_name"] == "facebook/VGGT-1B"
        assert cfg["num_frames"] == 7
        assert cfg["resume"] is True
        assert cfg["seed_filter"] == "456"

    def test_mode_inference_and_summary(self):
        import replicate_scorer as rs

        assert rs.infer_mode("seed_456_dpo_w1.0.mp4") == "dpo"
        assert rs.infer_mode("seed_1_original_w1.0.mp4") == "original"
        rows = [
            {"video_name": "seed_1_dpo_w1.0.mp4", "psnr": 30.0, "ssim": 0.9,
             "lpips": 0.1, "mvcs": 0.99, "consistency_score": 0.1,
             "epipolar": 1.0, "mse": 0.01, "motion_score": 0.2},
            {"video_name": "seed_1_dpo_w1.0.mp4", "psnr": 20.0, "ssim": 0.8,
             "lpips": 0.2, "mvcs": 0.95, "consistency_score": 0.3,
             "epipolar": 2.0, "mse": 0.02, "motion_score": 0.1},
        ]
        summary = rs.build_summary(rows)
        assert summary["dpo"]["count"] == 2
        np.testing.assert_allclose(summary["dpo"]["mean_psnr"], 25.0)


class TestCheckpointer:
    def test_pytree_roundtrip(self, tmp_path):
        from videogpa_tpu.checkpoint import load_pytree, save_pytree

        tree = {
            "a": {"kernel": np.ones((2, 3), np.float32)},
            "blocks": [{"w": np.zeros(4)}, {"w": np.full(4, 2.0)}],
        }
        path = str(tmp_path / "params")
        save_pytree(tree, path)
        loaded = load_pytree(path)
        np.testing.assert_allclose(np.asarray(loaded["a"]["kernel"]), 1.0)
        assert isinstance(loaded["blocks"], list)
        np.testing.assert_allclose(np.asarray(loaded["blocks"][1]["w"]), 2.0)

    def test_topk_retention(self, tmp_path):
        from videogpa_tpu.checkpoint import TrainCheckpointer

        ck = TrainCheckpointer(str(tmp_path / "ck"), save_top_k=2, mode="min")
        import jax.numpy as jnp

        for step, score in [(1, 3.0), (2, 1.0), (3, 2.0), (4, 5.0)]:
            ck.save(step, {"w": jnp.ones((2,)) * step}, metric=score)
        kept = sorted(ck._scores)
        assert len(kept) == 2
        # best two scores: 1.0 (step 2) and 2.0 (step 3)
        assert kept == ["step_00000002", "step_00000003"]
        # restore latest
        path = ck.latest()
        restored = ck.restore(path, {"w": jnp.zeros((2,))})
        assert np.asarray(restored["w"]).shape == (2,)


class TestDA3CLIParsing:
    def test_autodetect_routes(self, tmp_path, monkeypatch):
        from videogpa_tpu.models.da3 import cli as da3_cli

        calls = []
        monkeypatch.setattr(da3_cli, "cmd_image", lambda a: calls.append("image"))
        monkeypatch.setattr(da3_cli, "cmd_video", lambda a: calls.append("video"))
        monkeypatch.setattr(da3_cli, "cmd_images", lambda a: calls.append("images"))

        img = tmp_path / "x.png"
        img.write_bytes(b"")
        da3_cli.main(["auto", str(img), "--out_dir", str(tmp_path)])
        vid = tmp_path / "x.mp4"
        vid.write_bytes(b"")
        da3_cli.main(["auto", str(vid), "--out_dir", str(tmp_path)])
        da3_cli.main(["auto", str(tmp_path), "--out_dir", str(tmp_path)])
        assert calls == ["image", "video", "images"]
