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
    pytestmark = pytest.mark.slow  # excluded from the default gate (pyproject addopts)

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


class TestClosedLoopDPO:
    pytestmark = pytest.mark.slow  # excluded from the default gate (pyproject addopts)

    """The product claim, closed at tiny scale: score candidates with the
    geometry reward -> build win/lose pairs FROM THE SCORES -> DPO -> the
    policy's fresh samples move toward the preferred (higher-reward)
    candidate distribution (reference ``README.md:205-244`` — replicate.sh's
    accept test at real scale).

    Setup mirrors the real regime: the tiny DiT is first pretrained
    (diffusion SFT) on all candidate videos with the low-reward mode
    dominant, so its samples live on the candidate manifold and DPO has a
    preferred direction to pull toward. Candidate quality axis: content
    smoothness — measured scorer sensitivity at tiny scale shows
    random-weight VGGT consistency separates clean (~0.25) from
    noise-corrupted (~0.29+) reliably, while temporal-jitter differences are
    sub-noise.

    Assertions (each measured robust across three prototype configs):
    1. the scorer ranks the geometrically-consistent candidate better;
    2. the DPO implicit-reward margin grows over training;
    3. post-DPO fresh samples move toward the win distribution in latent
       space (min-MSE to the win set drops);
    4. post-DPO samples score better than the rejected candidates.
    A mean-score-improvement assertion on re-scored samples is deliberately
    NOT made: with random scorer weights the per-sample consistency score is
    a chaotic function of pixels (z-buffer winners / top-k masks flip
    discontinuously — same phenomenon as the documented int8 score drift),
    so its sign at tiny scale is seed-level noise even when the latent
    distribution demonstrably moves the right way. On real weights this is
    exactly replicate.sh's protocol.
    """

    def test_dpo_moves_policy_toward_preferred_candidates(self):
        import cv2
        import optax

        from videogpa_tpu.models.cogvideox.dit import dit_forward
        from videogpa_tpu.models.cogvideox.pipeline import (
            SamplerSettings,
            sample_t2v,
        )
        from videogpa_tpu.models.cogvideox.scheduler import CogVideoXScheduler
        from videogpa_tpu.train import merge_lora

        ccfg = CogVideoXConfig.tiny()
        vcfg = VGGTConfig.tiny()
        dit0 = dit_init(jax.random.PRNGKey(0), ccfg)
        vae = vae_init(jax.random.PRNGKey(1), ccfg)
        vggt = vggt_init(jax.random.PRNGKey(2), vcfg)
        vp = VideoProcessor(
            {"Consistency_Score": ConsistencyScore(None)},
            params=vggt, config=vcfg,
            compute_dtype=jnp.float32, attn_impl="xla",
        )

        G, NF, H, W = 3, 5, 32, 48
        rng = np.random.default_rng(0)
        txts = [
            jnp.asarray(rng.standard_normal(
                (1, ccfg.max_text_seq_length, ccfg.text_embed_dim)
            ).astype(np.float32))
            for _ in range(G)
        ]
        neg = jnp.zeros_like(txts[0])
        settings = SamplerSettings(num_inference_steps=4)

        def gen(params, txt, seed):
            return sample_t2v(
                params, vae, txt, neg, ccfg, jax.random.PRNGKey(seed),
                num_frames=NF, height=H, width=W, settings=settings,
                attn_impl="xla", compute_dtype=jnp.float32,
            )

        def score_frames(frames_u8):
            res = vp.process_frames(frames_u8, [0])
            return float(res[0]["Consistency_Score"])

        def to_uint8(video):
            v = np.asarray(video[0]).transpose(1, 2, 3, 0)
            return np.clip((v + 1) * 127.5, 0, 255).astype(np.uint8)

        def enc(v_u8):
            vid = jnp.asarray(
                v_u8.astype(np.float32).transpose(3, 0, 1, 2)[None] / 127.5 - 1
            )
            return vae_encode(vae, vid, ccfg, sample=False)

        # ---- phase 1: score candidates, pairs FROM the scores ----
        pairs, all_lats, all_txt, lose_scores = [], [], [], []
        for g in range(G):
            bg = cv2.GaussianBlur(
                rng.uniform(0, 255, (128, 128, 3)).astype(np.uint8), (0, 0), 3
            )
            clean = np.stack([
                bg[10 + 2 * t:10 + 2 * t + H, 10 + 3 * t:10 + 3 * t + W]
                for t in range(NF)
            ])
            noisy = np.clip(
                clean.astype(np.int16)
                + np.random.default_rng(300 + g).integers(-90, 90, clean.shape),
                0, 255,
            ).astype(np.uint8)
            scs = [score_frames(clean), score_frames(noisy)]
            # assertion 1: the geometrically-consistent candidate wins
            # (consistency_score: lower = better, metric_mode "min")
            assert scs[0] < scs[1], scs
            lose_scores.append(scs[1])
            lw, ll = enc(clean), enc(noisy)
            pairs.append((lw, ll, txts[g]))
            all_lats += [lw, ll]
            all_txt += [txts[g], txts[g]]
            # low-reward mode dominant in the pretraining mix
            for extra in range(2):
                nz = np.clip(
                    clean.astype(np.int16)
                    + np.random.default_rng(400 + 10 * g + extra).integers(
                        -90, 90, clean.shape),
                    0, 255,
                ).astype(np.uint8)
                all_lats.append(enc(nz))
                all_txt.append(txts[g])

        # ---- pretrain the tiny DiT on the candidate mix (diffusion SFT) ----
        scheduler = CogVideoXScheduler()
        X = jnp.transpose(jnp.concatenate(all_lats), (0, 2, 1, 3, 4))
        E = jnp.concatenate(all_txt)
        opt = optax.adam(1e-3)

        def sft_loss(params, key):
            k_t, k_n = jax.random.split(key)
            t = jax.random.randint(
                k_t, (X.shape[0],), 0, scheduler.num_train_timesteps
            )
            noise = jax.random.normal(k_n, X.shape, jnp.float32)
            v = dit_forward(
                params, scheduler.add_noise(X, noise, t), E, t, ccfg,
                attn_impl="xla", compute_dtype=jnp.float32,
            )
            return jnp.mean((v - scheduler.get_velocity(X, noise, t)) ** 2)

        @jax.jit
        def pre_step(params, opt_state, key):
            loss, grads = jax.value_and_grad(sft_loss)(params, key)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        dit = dit0
        opt_state = opt.init(dit)
        for i in range(300):
            dit, opt_state, _l = pre_step(dit, opt_state, jax.random.PRNGKey(5000 + i))

        # ---- phase 3: DPO LoRA on the scored pairs ----
        tcfg = TrainerConfig(
            learning_rate=1e-3, warmup_steps=5, max_steps=300, beta=1.0,
            lora_rank=8, lora_alpha=16.0, compute_dtype=jnp.float32,
            remat=False, attn_impl="xla",
        )
        lora = lora_init(jax.random.PRNGKey(3), ccfg.num_layers,
                         ccfg.hidden_dim, rank=8)
        state = init_train_state(lora, tcfg)
        train_step, _ = make_dpo_train_step(dit, ccfg, tcfg)
        batch = {
            "x_win": jnp.concatenate([p[0] for p in pairs]),
            "x_lose": jnp.concatenate([p[1] for p in pairs]),
            "prompt_emb": jnp.concatenate([p[2] for p in pairs]),
        }
        first_margin = last_margin = None
        for i in range(tcfg.max_steps):
            state, metrics = train_step(state, batch, jax.random.PRNGKey(10 + i))
            if first_margin is None:
                first_margin = float(metrics["reward_margin"])
            last_margin = float(metrics["reward_margin"])
        # assertion 2: the implicit-reward margin grew (measured ~0.0 -> 0.45
        # at this config; 0.1 is a robust floor)
        assert np.isfinite(last_margin)
        assert last_margin > first_margin + 0.1, (first_margin, last_margin)

        # ---- re-sample with the DPO'd policy on FRESH seeds, re-score ----
        merged = merge_lora(dit, state.lora, tcfg.lora_rank, tcfg.lora_alpha)
        win_lats = jnp.stack([p[0][0] for p in pairs])

        def dist_to_wins(video):
            # min over the G win latents: lat is (1, C, F, h, w) and
            # broadcasts against win_lats (G, C, F, h, w)
            lat = enc(to_uint8(video))
            return float(jnp.min(jnp.mean(
                (win_lats - lat) ** 2, axis=(1, 2, 3, 4)
            )))

        pre_d, post_d, post_s = [], [], []
        for g in range(G):
            for c in range(4):
                seed = 900 + g * 4 + c
                pre_d.append(dist_to_wins(gen(dit, txts[g], seed)))
                v_post = gen(merged, txts[g], seed)
                post_d.append(dist_to_wins(v_post))
                post_s.append(score_frames(to_uint8(v_post)))
        # assertion 3: the policy's samples moved toward the preferred
        # (win) distribution — min-MSE to the nearest win latent drops
        assert np.mean(post_d) < np.mean(pre_d) - 0.005, (
            np.mean(pre_d), np.mean(post_d))
        # assertion 4: post-DPO samples score better than the REJECTED
        # candidates — the reward-level sanity bound (post ~0.27 vs ~0.29)
        assert np.mean(post_s) < np.mean(lose_scores), (
            np.mean(post_s), lose_scores)


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
