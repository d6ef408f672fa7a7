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
