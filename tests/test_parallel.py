"""Tensor-parallel sharding specs: sharded forwards must match replicated.

The reference has data parallelism only (SURVEY.md §2.5); TP over the
``model`` mesh axis is the declared upgrade. These tests lay each model's
params out with its PartitionSpec tree on the virtual 8-device CPU mesh and
check GSPMD produces the same numbers as the unsharded forward.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from videogpa_tpu.parallel import MeshAxes, make_mesh
from videogpa_tpu.parallel.sharding import (
    batch_specs,
    dit_param_specs,
    shard_tree,
    vit_param_specs,
    wan_param_specs,
)


def _used_axes(specs):
    from jax.sharding import PartitionSpec as P

    names = set()
    for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P)
    ):
        if not isinstance(s, P):
            continue
        for part in s:
            if part is None:
                continue
            if isinstance(part, (tuple, list)):
                names.update(part)
            else:
                names.add(part)
    return names


class TestWanTP:
    def test_sharded_forward_matches_replicated(self):
        from videogpa_tpu.models.wan.config import WanConfig
        from videogpa_tpu.models.wan.dit import wan_forward, wan_init

        cfg = dataclasses.replace(WanConfig.tiny(), num_heads=4, dim=64, ffn_dim=128)
        params = wan_init(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.in_channels, 3, 8, 8))
        ctx = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.text_len, cfg.text_dim))
        t = jnp.full((1,), 500.0)

        want = wan_forward(params, x, t, ctx, cfg, attn_impl="xla",
                           compute_dtype=jnp.float32)

        mesh = make_mesh(MeshAxes(data=2, model=4))
        specs = wan_param_specs(params)
        assert "model" in _used_axes(specs)  # the axis is live
        sharded = shard_tree(params, specs, mesh)
        with jax.set_mesh(mesh):
            got = jax.jit(
                lambda p, x, t, c: wan_forward(
                    p, x, t, c, cfg, attn_impl="xla", compute_dtype=jnp.float32
                )
            )(sharded, x, t, ctx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


class TestVGGTTP:
    def test_sharded_forward_matches_replicated(self):
        from videogpa_tpu.models.vggt.config import VGGTConfig
        from videogpa_tpu.models.vggt.model import vggt_forward, vggt_init

        cfg = VGGTConfig.tiny()
        params = vggt_init(jax.random.PRNGKey(0), cfg)
        images = jax.random.uniform(
            jax.random.PRNGKey(1), (1, 2, 3, cfg.img_size, cfg.img_size)
        )
        want = vggt_forward(params, images, cfg, attn_impl="xla",
                            compute_dtype=jnp.float32)

        mesh = make_mesh(MeshAxes(data=2, model=4))
        specs = vit_param_specs(params)
        assert "model" in _used_axes(specs)
        sharded = shard_tree(params, specs, mesh)
        with jax.set_mesh(mesh):
            got = jax.jit(
                lambda p, im: vggt_forward(
                    p, im, cfg, attn_impl="xla", compute_dtype=jnp.float32
                )
            )(sharded, images)
        for key in ("pose_enc", "depth", "world_points"):
            np.testing.assert_allclose(
                np.asarray(got[key]), np.asarray(want[key]), atol=5e-4
            )


class TestTPTrainingNumerics:
    def test_sharded_dpo_step_matches_replicated(self):
        """TP x remat x LoRA TRAINING equivalence: the dp=2 x tp=4 sharded
        DPO train step must produce the same loss, grad norm, and updated
        LoRA params as the single-device replicated step (VERDICT r3 weak
        #8 — the dryrun only checks finiteness)."""
        from videogpa_tpu.models.cogvideox import CogVideoXConfig, dit_init
        from videogpa_tpu.parallel.sharding import lora_param_specs
        from videogpa_tpu.train.lora import lora_init
        from videogpa_tpu.train.trainer import (
            TrainerConfig,
            init_train_state,
            make_dpo_train_step,
        )

        cfg = CogVideoXConfig.tiny()
        tcfg = TrainerConfig(
            learning_rate=1e-3, warmup_steps=1, max_steps=10, lora_rank=4,
            lora_alpha=8.0, compute_dtype=jnp.float32, remat=True,
            attn_impl="xla",
        )
        base = dit_init(jax.random.PRNGKey(0), cfg)
        lora = lora_init(jax.random.PRNGKey(1), cfg.num_layers, cfg.hidden_dim, rank=4)
        rng = np.random.default_rng(0)
        B = 2
        batch = {
            "x_win": jnp.asarray(rng.standard_normal(
                (B, cfg.in_channels, cfg.sample_frames,
                 cfg.sample_height, cfg.sample_width)), jnp.float32),
            "x_lose": jnp.asarray(rng.standard_normal(
                (B, cfg.in_channels, cfg.sample_frames,
                 cfg.sample_height, cfg.sample_width)), jnp.float32),
            "prompt_emb": jnp.asarray(rng.standard_normal(
                (B, cfg.max_text_seq_length, cfg.text_embed_dim)), jnp.float32),
        }
        key = jax.random.PRNGKey(7)

        # build BOTH states before stepping: the train step donates its
        # state, so the shared lora leaves must be copied up front
        mesh = make_mesh(MeshAxes(data=2, model=4))
        base_sh = shard_tree(base, dit_param_specs(base), mesh)
        lora_sh = shard_tree(lora, lora_param_specs(lora), mesh)
        state_sh = init_train_state(lora_sh, tcfg)
        batch_sh = shard_tree(batch, batch_specs(batch), mesh)
        lora_rep = jax.tree_util.tree_map(jnp.copy, lora)
        state_rep = init_train_state(lora_rep, tcfg)

        # replicated single-device step
        step_rep, _ = make_dpo_train_step(base, cfg, tcfg)
        state_rep, m_rep = step_rep(state_rep, batch, key)

        # dp=2 x tp=4 sharded step
        step_sh, _ = make_dpo_train_step(base_sh, cfg, tcfg)
        with jax.set_mesh(mesh):
            state_sh, m_sh = step_sh(state_sh, batch_sh, key)

        for k in ("loss", "reward_margin", "grad_norm"):
            np.testing.assert_allclose(
                float(m_sh[k]), float(m_rep[k]), rtol=2e-5, atol=2e-6,
                err_msg=k,
            )
        flat_rep = jax.tree_util.tree_leaves_with_path(state_rep.lora)
        flat_sh = jax.tree_util.tree_leaves_with_path(state_sh.lora)
        for (path_r, leaf_r), (path_s, leaf_s) in zip(flat_rep, flat_sh):
            assert path_r == path_s
            np.testing.assert_allclose(
                np.asarray(leaf_s), np.asarray(leaf_r), atol=1e-5,
                err_msg=jax.tree_util.keystr(path_r),
            )


class TestDiTTPBatch:
    def test_dit_tp_with_data_sharded_batch(self):
        from videogpa_tpu.models.cogvideox import CogVideoXConfig, dit_forward, dit_init

        cfg = CogVideoXConfig.tiny()
        params = dit_init(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(
            jax.random.PRNGKey(1),
            (2, cfg.sample_frames, cfg.in_channels, cfg.sample_height, cfg.sample_width),
        )
        txt = jax.random.normal(
            jax.random.PRNGKey(2), (2, cfg.max_text_seq_length, cfg.text_embed_dim)
        )
        t = jnp.array([100, 900])
        want = dit_forward(params, x, txt, t, cfg, attn_impl="xla",
                           compute_dtype=jnp.float32)

        mesh = make_mesh(MeshAxes(data=2, model=4))
        sharded = shard_tree(params, dit_param_specs(params), mesh)
        batch = shard_tree({"x": x, "txt": txt}, batch_specs({"x": x, "txt": txt}), mesh)
        with jax.set_mesh(mesh):
            got = jax.jit(
                lambda p, x, txt, t: dit_forward(
                    p, x, txt, t, cfg, attn_impl="xla", compute_dtype=jnp.float32
                )
            )(sharded, batch["x"], batch["txt"], t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
