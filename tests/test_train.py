"""DPO training stack tests: loss, LoRA, dataset filters, end-to-end step."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videogpa_tpu.models.cogvideox import CogVideoXConfig, dit_forward, dit_init
from videogpa_tpu.train import (
    DPODataset,
    DPOLoss,
    collate,
    create_loss_strategy,
    export_peft,
    import_peft,
    lora_init,
    merge_lora,
)
from videogpa_tpu.train.trainer import (
    TrainerConfig,
    init_train_state,
    make_dpo_train_step,
)


class TestDPOLoss:
    def test_shapes_and_finiteness(self):
        """Mirror of the reference __main__ self-test (train/loss.py:158-189)."""
        key = jax.random.PRNGKey(0)
        shape = (2, 5, 4, 6, 9)
        args = [jax.random.normal(jax.random.PRNGKey(i), shape) for i in range(6)]
        out = create_loss_strategy("dpo", beta=500.0)(*args)
        for v in (out.loss, out.reward_margin, out.accuracy):
            assert np.isfinite(float(v))
        assert 0.0 <= float(out.accuracy) <= 1.0

    def test_prefers_winner_improvement(self):
        """If the policy improves only the winner, loss must be below log(2)."""
        shape = (4, 2, 3, 4, 4)
        target = jnp.zeros(shape)
        ref = jnp.ones(shape)
        v_win = 0.5 * jnp.ones(shape)   # policy halves winner error
        v_lose = jnp.ones(shape)        # loser unchanged
        out = DPOLoss(beta=1.0)(v_win, v_lose, ref, ref, target, target)
        assert float(out.loss) < np.log(2.0)

    def test_symmetric_is_log2(self):
        shape = (2, 2, 2, 4, 4)
        x = jax.random.normal(jax.random.PRNGKey(1), shape)
        t = jnp.zeros(shape)
        out = DPOLoss(beta=1.0)(x, x, x, x, t, t)
        np.testing.assert_allclose(float(out.loss), np.log(2.0), rtol=1e-5)

    def test_hinge_and_smoothing(self):
        shape = (2, 2, 2, 4, 4)
        args = [jax.random.normal(jax.random.PRNGKey(i), shape) for i in range(6)]
        h = DPOLoss(beta=1.0, loss_type="hinge")(*args)
        s = DPOLoss(beta=1.0, label_smoothing=0.1)(*args)
        assert np.isfinite(float(h.loss)) and np.isfinite(float(s.loss))


class TestLoRA:
    def test_zero_init_is_identity(self):
        cfg = CogVideoXConfig.tiny()
        params = dit_init(jax.random.PRNGKey(0), cfg)
        lora = lora_init(jax.random.PRNGKey(1), cfg.num_layers, cfg.hidden_dim, rank=4)
        x = jax.random.normal(
            jax.random.PRNGKey(2),
            (1, cfg.sample_frames, cfg.in_channels, cfg.sample_height, cfg.sample_width),
        )
        txt = jnp.zeros((1, cfg.max_text_seq_length, cfg.text_embed_dim))
        t = jnp.array([100])
        o_base = dit_forward(params, x, txt, t, cfg, attn_impl="xla", compute_dtype=jnp.float32)
        o_lora = dit_forward(params, x, txt, t, cfg, attn_impl="xla",
                             compute_dtype=jnp.float32, lora=lora, lora_scaling=2.0)
        np.testing.assert_allclose(np.asarray(o_base), np.asarray(o_lora), atol=1e-6)

    def test_merge_matches_online_application(self):
        cfg = CogVideoXConfig.tiny()
        params = dit_init(jax.random.PRNGKey(0), cfg)
        lora = lora_init(jax.random.PRNGKey(1), cfg.num_layers, cfg.hidden_dim, rank=4)
        # non-trivial B
        lora = jax.tree_util.tree_map(
            lambda a: a + 0.01 * jax.random.normal(jax.random.PRNGKey(9), a.shape), lora
        )
        rank, alpha = 4, 8.0
        scaling = alpha / rank
        x = jax.random.normal(
            jax.random.PRNGKey(2),
            (1, cfg.sample_frames, cfg.in_channels, cfg.sample_height, cfg.sample_width),
        )
        txt = jnp.zeros((1, cfg.max_text_seq_length, cfg.text_embed_dim))
        t = jnp.array([100])
        o_online = dit_forward(params, x, txt, t, cfg, attn_impl="xla",
                               compute_dtype=jnp.float32, lora=lora, lora_scaling=scaling)
        merged = merge_lora(params, lora, rank, alpha)
        o_merged = dit_forward(merged, x, txt, t, cfg, attn_impl="xla", compute_dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(o_online), np.asarray(o_merged), atol=2e-4
        )

    def test_peft_export_import_roundtrip(self, tmp_path):
        lora = lora_init(jax.random.PRNGKey(0), 3, 32, rank=4)
        lora = jax.tree_util.tree_map(
            lambda a: a + jax.random.normal(jax.random.PRNGKey(1), a.shape), lora
        )
        out = str(tmp_path / "adapter")
        export_peft(lora, out, rank=4, alpha=8.0)
        assert os.path.exists(os.path.join(out, "adapter_model.safetensors"))
        with open(os.path.join(out, "adapter_config.json")) as f:
            config = json.load(f)
        assert config["r"] == 4 and config["lora_alpha"] == 8.0
        assert set(config["target_modules"]) == {"to_q", "to_k", "to_v", "to_out.0"}

        lora2 = import_peft(out, num_layers=3)
        for name in lora:
            np.testing.assert_allclose(
                np.asarray(lora[name]["lora_A"]), np.asarray(lora2[name]["lora_A"])
            )
            np.testing.assert_allclose(
                np.asarray(lora[name]["lora_B"]), np.asarray(lora2[name]["lora_B"])
            )


@pytest.fixture
def dpo_metadata(tmp_path):
    """Synthetic scored metadata with latent/condition artifacts on disk."""
    base = tmp_path
    lat_dir = base / "latents"
    lat_dir.mkdir()
    groups = []
    rng = np.random.default_rng(0)
    scores = [(0.3, 0.7), (0.5, 0.52), (0.9, 1.5), (0.4, 0.8)]  # (win, lose)
    motions = [(0.1, 0.1), (0.1, 0.1), (0.1, 0.1), (0.0001, 0.1)]
    for g, ((sw, sl), (mw, ml)) in enumerate(zip(scores, motions)):
        videos = []
        cond_path = f"latents/cond_{g}.npz"
        np.savez(
            base / cond_path,
            encoder_hidden_states=rng.standard_normal((8, 32)).astype(np.float32),
        )
        for i, (score, motion) in enumerate([(sw, mw), (sl, ml)]):
            lp = f"latents/lat_{g}_{i}.npz"
            np.savez(base / lp, data=rng.standard_normal((4, 3, 8, 12)).astype(np.float32))
            videos.append(
                {
                    "video_path": f"v_{g}_{i}.mp4",
                    "consistency_score": score,
                    "motion_norm": motion,
                    "latent_path": lp,
                    "condition_path": cond_path,
                }
            )
        groups.append({"group_id": f"g{g}", "prompt": f"prompt {g}", "videos": videos})
    meta = base / "meta_data.json"
    with open(meta, "w") as f:
        json.dump({"groups": groups}, f)
    return str(base), str(meta)


class TestDPODataset:
    def test_filters(self, dpo_metadata):
        base, meta = dpo_metadata
        ds = DPODataset(base, meta, min_gap=0.05, metric_threshold=0.8,
                        motion_threshold=0.001)
        # group 0: ok; group 1: gap 0.02 < 0.05 -> dropped;
        # group 2: winner 0.9 >= 0.8 threshold -> dropped;
        # group 3: winner motion 0.0001 < 0.001 -> dropped (only 1 valid left)
        assert len(ds) == 1
        item = ds[0]
        assert item["m_win"] == 0.3 and item["m_lose"] == 0.7
        assert item["x_win"].shape == (4, 3, 8, 12)

    def test_collate(self, dpo_metadata):
        base, meta = dpo_metadata
        ds = DPODataset(base, meta, min_gap=0.01, motion_threshold=0.001)
        batch = collate([ds[0], ds[1]])
        assert batch["x_win"].shape == (2, 4, 3, 8, 12)
        assert batch["prompt_emb"].shape == (2, 8, 32)
        assert len(batch["prompt"]) == 2


class TestTrainStep:
    def test_step_runs_and_improves_margin(self):
        cfg = CogVideoXConfig.tiny()
        base = dit_init(jax.random.PRNGKey(0), cfg)
        tcfg = TrainerConfig(
            learning_rate=1e-3, beta=1.0, warmup_steps=2, max_steps=20,
            lora_rank=4, lora_alpha=8.0, compute_dtype=jnp.float32,
            remat=False, attn_impl="xla",
        )
        lora = lora_init(jax.random.PRNGKey(1), cfg.num_layers, cfg.hidden_dim, rank=4)
        state = init_train_state(lora, tcfg)
        train_step, eval_step = make_dpo_train_step(base, cfg, tcfg)

        rng = np.random.default_rng(0)
        B, C, F, H, W = 2, cfg.in_channels, cfg.sample_frames, cfg.sample_height, cfg.sample_width
        batch = {
            "x_win": jnp.asarray(rng.standard_normal((B, C, F, H, W)), jnp.float32),
            "x_lose": jnp.asarray(rng.standard_normal((B, C, F, H, W)), jnp.float32),
            "prompt_emb": jnp.asarray(
                rng.standard_normal((B, cfg.max_text_seq_length, cfg.text_embed_dim)),
                jnp.float32,
            ),
        }
        first_loss = None
        for i in range(8):
            state, metrics = train_step(state, batch, jax.random.PRNGKey(42))
            if first_loss is None:
                first_loss = float(metrics["loss"])
        # fixed RNG key -> deterministic objective; loss must decrease
        assert float(metrics["loss"]) < first_loss
        assert int(state.step) == 8
        assert np.isfinite(float(metrics["grad_norm"]))
        # LoRA B matrices must have moved off zero
        b_norm = float(jnp.linalg.norm(state.lora["to_q"]["lora_B"]))
        assert b_norm > 0

        ev = eval_step(state, batch, jax.random.PRNGKey(42))
        assert np.isfinite(float(ev["loss"]))

    def test_seq_parallel_ring_step_matches_xla(self):
        """One DPO train step with attn_impl='ring' on a seq-axis mesh: the
        ring is exact, so loss/grads must match the single-device xla step."""
        from videogpa_tpu.parallel import MeshAxes, make_mesh

        cfg = CogVideoXConfig.tiny()
        base = dit_init(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(1)
        B, C, F, H, W = 1, cfg.in_channels, cfg.sample_frames, cfg.sample_height, cfg.sample_width
        batch = {
            "x_win": jnp.asarray(rng.standard_normal((B, C, F, H, W)), jnp.float32),
            "x_lose": jnp.asarray(rng.standard_normal((B, C, F, H, W)), jnp.float32),
            "prompt_emb": jnp.asarray(
                rng.standard_normal((B, cfg.max_text_seq_length, cfg.text_embed_dim)),
                jnp.float32,
            ),
        }

        losses = {}
        for impl, mesh_axes in (
            ("xla", None),
            ("ring", MeshAxes(data=1, seq=8, model=1)),
        ):
            tcfg = TrainerConfig(
                learning_rate=1e-3, beta=1.0, warmup_steps=2, max_steps=20,
                lora_rank=4, lora_alpha=8.0, compute_dtype=jnp.float32,
                remat=False, attn_impl=impl,
            )
            # re-init per run: the train step donates its input state
            lora = lora_init(
                jax.random.PRNGKey(1), cfg.num_layers, cfg.hidden_dim, rank=4
            )
            state = init_train_state(lora, tcfg)
            train_step, _ = make_dpo_train_step(base, cfg, tcfg)
            if mesh_axes is None:
                state, metrics = train_step(state, batch, jax.random.PRNGKey(7))
            else:
                with jax.set_mesh(make_mesh(mesh_axes)):
                    state, metrics = train_step(state, batch, jax.random.PRNGKey(7))
            losses[impl] = float(metrics["loss"])
            assert np.isfinite(losses[impl])
        np.testing.assert_allclose(losses["ring"], losses["xla"], rtol=5e-4)


class TestCogVideoX15Trim:
    def test_odd_latents_trimmed_for_patch_size_t(self):
        """1.5 (patch_size_t=2) trains on odd-frame latents by trimming
        (reference CogVideoX1.5 trainer :135-142)."""
        import dataclasses

        from videogpa_tpu.models.cogvideox import CogVideoXConfig, dit_init
        from videogpa_tpu.train.lora import lora_init
        from videogpa_tpu.train.trainer import (
            TrainerConfig, init_train_state, make_dpo_train_step,
        )

        cfg = dataclasses.replace(CogVideoXConfig.tiny(), patch_size_t=2)
        dit = dit_init(jax.random.PRNGKey(0), cfg)
        tcfg = TrainerConfig(lora_rank=4, lora_alpha=8.0, warmup_steps=1,
                             max_steps=5, compute_dtype=jnp.float32,
                             remat=False, attn_impl="xla")
        lora = lora_init(jax.random.PRNGKey(1), cfg.num_layers, cfg.hidden_dim, rank=4)
        state = init_train_state(lora, tcfg)
        train_step, _ = make_dpo_train_step(dit, cfg, tcfg)
        B, C, F, H, W = 1, cfg.in_channels, 5, 10, 14  # odd F, non-patch H/W
        rng = np.random.default_rng(0)
        batch = {
            "x_win": jnp.asarray(rng.standard_normal((B, C, F, H, W)), jnp.float32),
            "x_lose": jnp.asarray(rng.standard_normal((B, C, F, H, W)), jnp.float32),
            "prompt_emb": jnp.asarray(rng.standard_normal(
                (B, cfg.max_text_seq_length, cfg.text_embed_dim)), jnp.float32),
        }
        state, metrics = train_step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))
