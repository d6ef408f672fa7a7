"""Full phase-1 -> phase-3 loop at tiny scale: the minimum end-to-end slice.

Mirrors the reference pipeline (SURVEY.md §0): generate candidates ->
geometry-reward scoring -> preference pairs -> VAE latents + T5 conditions ->
DPO LoRA training -> PEFT export/import -> LoRA-merged sampling.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videogpa_tpu.cli.score import score_groups
from videogpa_tpu.metrics import ConsistencyScore
from videogpa_tpu.models.cogvideox import CogVideoXConfig, dit_init
from videogpa_tpu.models.cogvideox.vae import vae_encode, vae_init
from videogpa_tpu.models.vggt import VGGTConfig, vggt_init
from videogpa_tpu.reward import VideoProcessor
from videogpa_tpu.train import DPODataset, collate, export_peft, import_peft, lora_init, merge_lora
from videogpa_tpu.train.trainer import TrainerConfig, init_train_state, make_dpo_train_step


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Two prompt groups x two candidate videos (one smooth, one jittery)."""
    from videogpa_tpu.data.video_io import write_video

    base = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    import cv2

    groups = []
    for g in range(2):
        videos = []
        bg = cv2.GaussianBlur(
            rng.uniform(0, 255, (140, 140, 3)).astype(np.uint8), (0, 0), 3
        )
        for vid_id, jitter in [(0, 1), (1, 12)]:
            frames = []
            for t in range(6):
                dy = t * 2 + int(rng.integers(-jitter, jitter + 1))
                dx = t * 3 + int(rng.integers(-jitter, jitter + 1))
                dy, dx = np.clip(dy, 0, 80), np.clip(dx, 0, 80)
                frames.append(bg[dy : dy + 48, dx : dx + 64])
            path = f"videos/g{g}_v{vid_id}.mp4"
            os.makedirs(base / "videos", exist_ok=True)
            write_video(str(base / path), np.stack(frames), fps=8)
            videos.append({"video_path": path, "generation_id": vid_id})
        groups.append({"group_id": f"g{g}", "prompt": f"scene {g}", "videos": videos})
    meta = {"groups": groups}
    with open(base / "meta.json", "w") as f:
        json.dump(meta, f)
    return base


class TestEndToEndSlice:
    def test_phase1_to_phase3(self, workspace):
        base = workspace
        # ---------------- phase 1: geometry-reward scoring ----------------
        vcfg = VGGTConfig.tiny()
        vggt_params = vggt_init(jax.random.PRNGKey(0), vcfg)
        vp = VideoProcessor(
            {"Consistency_Score": ConsistencyScore(lpips_params=None)},
            params=vggt_params, config=vcfg,
            compute_dtype=jnp.float32, attn_impl="xla",
        )
        with open(base / "meta.json") as f:
            data = json.load(f)
        out_json = str(base / "scored.json")
        stats = score_groups(vp, data, out_json, base_dir=str(base), num_frames=4)
        assert stats["scored"] == 4 and stats["failed"] == 0
        for g in data["groups"]:
            for v in g["videos"]:
                assert np.isfinite(v["consistency_score"])
                assert v["motion_norm"] >= 0

        # resume path: second run scores nothing new
        stats2 = score_groups(vp, data, out_json, base_dir=str(base), num_frames=4)
        assert stats2["scored"] == 0 and stats2["resumed"] == 4

        # ---------------- phase 2: latents + conditions ----------------
        ccfg = CogVideoXConfig.tiny()
        vae = vae_init(jax.random.PRNGKey(1), ccfg)
        from videogpa_tpu.data.video_io import read_video_frames

        os.makedirs(base / "lat", exist_ok=True)
        rng = np.random.default_rng(1)
        for g in data["groups"]:
            cond_rel = f"lat/cond_{g['group_id']}.npz"
            np.savez(
                base / cond_rel,
                encoder_hidden_states=rng.standard_normal(
                    (ccfg.max_text_seq_length, ccfg.text_embed_dim)
                ).astype(np.float32),
            )
            for v in g["videos"]:
                frames = read_video_frames(str(base / v["video_path"]), np.arange(5))
                vid = jnp.asarray(
                    frames.astype(np.float32).transpose(3, 0, 1, 2)[None] / 127.5 - 1
                )
                lat = vae_encode(vae, vid, ccfg, sample=False)
                lat_rel = f"lat/l_{g['group_id']}_{v['generation_id']}.npz"
                np.savez(base / lat_rel, data=np.asarray(lat[0], np.float32))
                v["latent_path"] = lat_rel
                v["condition_path"] = cond_rel
        with open(base / "meta_final.json", "w") as f:
            json.dump(data, f)

        # ---------------- phase 3: preference pairs + DPO ----------------
        ds = DPODataset(
            str(base), str(base / "meta_final.json"),
            min_gap=0.0, motion_threshold=0.0,
        )
        assert len(ds) == 2  # one pair per group
        for i in range(len(ds)):
            item = ds[i]
            assert item["m_win"] <= item["m_lose"]

        dit = dit_init(jax.random.PRNGKey(2), ccfg)
        tcfg = TrainerConfig(
            learning_rate=1e-3, warmup_steps=1, max_steps=5, lora_rank=4,
            lora_alpha=8.0, compute_dtype=jnp.float32, remat=False,
            attn_impl="xla",
        )
        lora = lora_init(jax.random.PRNGKey(3), ccfg.num_layers, ccfg.hidden_dim, rank=4)
        state = init_train_state(lora, tcfg)
        train_step, _ = make_dpo_train_step(dit, ccfg, tcfg)
        batch = collate([ds[0], ds[1]])
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "prompt"}
        for i in range(3):
            state, metrics = train_step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss"]))

        # ---------------- PEFT export/import + merged sampling ----------------
        adapter_dir = str(base / "final_lora")
        export_peft(state.lora, adapter_dir, rank=4, alpha=8.0)
        lora2 = import_peft(adapter_dir, ccfg.num_layers)
        merged = merge_lora(dit, lora2, 4, 8.0)

        from videogpa_tpu.models.cogvideox.pipeline import SamplerSettings, sample_t2v

        txt = jnp.zeros((1, ccfg.max_text_seq_length, ccfg.text_embed_dim))
        video = sample_t2v(
            merged, vae, txt, txt, ccfg, jax.random.PRNGKey(9),
            num_frames=5, height=32, width=48,
            settings=SamplerSettings(num_inference_steps=2),
            attn_impl="xla", compute_dtype=jnp.float32,
        )
        assert video.shape == (1, 3, 5, 32, 48)
        assert np.isfinite(np.asarray(video)).all()


class TestVideoWriteFFmpeg:
    """write_video prefers the reference's ffmpeg x264 pipe when available
    (reference generate/Wan2.2-TI2V-5B.py:24-38) and falls back to OpenCV."""

    def test_ffmpeg_pipe_invoked_with_raw_rgb(self, tmp_path, monkeypatch):
        # fake ffmpeg: record argv, consume stdin to a file, exit 0
        bindir = tmp_path / "bin"
        bindir.mkdir()
        fake = bindir / "ffmpeg"
        fake.write_text(
            "#!/bin/sh\n"
            f'echo "$@" > {tmp_path}/argv.txt\n'
            f"cat > {tmp_path}/stdin.bin\n"
            'touch "${@: -1}" 2>/dev/null || :\n'
        )
        fake.chmod(0o755)
        monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

        from videogpa_tpu.data.video_io import write_video

        frames = np.random.default_rng(0).integers(
            0, 255, (3, 16, 24, 3), dtype=np.uint8
        )
        out = tmp_path / "clip.mp4"
        write_video(str(out), frames, fps=24)

        argv = (tmp_path / "argv.txt").read_text()
        assert "libx264" in argv and "yuv420p" in argv and "24x16" in argv
        assert "-r 24" in argv
        raw = (tmp_path / "stdin.bin").read_bytes()
        assert raw == frames.tobytes()  # rawvideo rgb24 byte stream

    def test_fallback_to_opencv_when_ffmpeg_fails(self, tmp_path, monkeypatch):
        bindir = tmp_path / "bin"
        bindir.mkdir()
        fake = bindir / "ffmpeg"
        fake.write_text("#!/bin/sh\ncat > /dev/null\nexit 1\n")
        fake.chmod(0o755)
        monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

        from videogpa_tpu.data.video_io import read_video_frames, write_video

        frames = np.full((3, 16, 24, 3), 128, np.uint8)
        out = tmp_path / "clip.mp4"
        write_video(str(out), frames, fps=8)
        back = read_video_frames(str(out))
        assert back.shape == frames.shape
