"""Tests for attention (flash kernel vs XLA reference) and RoPE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import videogpa_tpu.ops.attention as attn_mod
from videogpa_tpu.ops.attention import attention, mha_reference
from videogpa_tpu.ops.rope import rope_2d, rope_3d_freqs, apply_rope_interleaved


@pytest.fixture(autouse=True)
def interpret_mode():
    attn_mod.INTERPRET = True
    yield
    attn_mod.INTERPRET = False


class TestFlashAttention:
    @pytest.mark.parametrize("n", [128, 257, 300])
    def test_forward_matches_reference(self, n):
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (2, 4, n, 64), jnp.float32)
        k = jax.random.normal(kk, (2, 4, n, 64), jnp.float32)
        v = jax.random.normal(kv, (2, 4, n, 64), jnp.float32)
        got = attention(q, k, v, impl="flash", block_q=128, block_k=128)
        want = mha_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    @pytest.mark.parametrize("n", [257, 300])
    def test_bnhd_layout_matches_bhnd(self, n):
        """attention(layout="bnhd") — the inference fast path fed straight
        from the (B, N, H, D) projection layout. At short key rows it
        routes to the one-shot full-softmax kernel (_flash_short), which is
        numerically exact but not bit-identical to the lagged-max kernel
        (different reduction order), so compare with a tight tolerance; the
        xla fallback must also match."""
        key = jax.random.PRNGKey(3)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (2, n, 4, 64), jnp.float32)
        k = jax.random.normal(kk, (2, n, 4, 64), jnp.float32)
        v = jax.random.normal(kv, (2, n, 4, 64), jnp.float32)
        qc, kc, vc = (jnp.transpose(a, (0, 2, 1, 3)) for a in (q, k, v))
        want = jnp.transpose(
            attention(qc, kc, vc, impl="flash", block_q=128, block_k=128),
            (0, 2, 1, 3),
        )
        got = attention(q, k, v, impl="flash", block_q=128, block_k=128,
                        layout="bnhd")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6, rtol=1e-5)
        got_xla = attention(q, k, v, impl="xla", layout="bnhd")
        np.testing.assert_allclose(
            np.asarray(got_xla), np.asarray(want), atol=2e-5
        )

    @pytest.mark.parametrize("nq,nk", [(300, 300), (1374, 1374), (64, 500)])
    def test_flash_short_matches_reference(self, nq, nk):
        """The short-seq native-bnhd kernel vs the XLA oracle, incl. a
        cross-attention (nq != nk) shape and a non-128-multiple key row
        (padding mask path)."""
        from videogpa_tpu.ops.attention import _flash_short

        key = jax.random.PRNGKey(5)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (2, nq, 4, 64), jnp.float32)
        k = jax.random.normal(kk, (2, nk, 4, 64), jnp.float32)
        v = jax.random.normal(kv, (2, nk, 4, 64), jnp.float32)
        got = _flash_short(q, k, v, nk)
        want = jnp.transpose(
            mha_reference(*(jnp.transpose(a, (0, 2, 1, 3)) for a in (q, k, v))),
            (0, 2, 1, 3),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6, rtol=1e-5)

    def test_flash_short_n_valid_mask(self):
        """n_valid < Nk must mask trailing key rows exactly like slicing
        them away."""
        from videogpa_tpu.ops.attention import _flash_short

        key = jax.random.PRNGKey(7)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (1, 200, 2, 64), jnp.float32)
        k = jax.random.normal(kk, (1, 256, 2, 64), jnp.float32)
        v = jax.random.normal(kv, (1, 256, 2, 64), jnp.float32)
        got = _flash_short(q, k, v, 200)
        want = _flash_short(q, k[:, :200], v[:, :200], 200)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6, rtol=1e-5)

    def test_flash_short_bf16(self):
        from videogpa_tpu.ops.attention import _flash_short

        key = jax.random.PRNGKey(9)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (2, 300, 4, 64), jnp.bfloat16)
        k = jax.random.normal(kk, (2, 300, 4, 64), jnp.bfloat16)
        v = jax.random.normal(kv, (2, 300, 4, 64), jnp.bfloat16)
        got = _flash_short(q, k, v, 300).astype(jnp.float32)
        want = jnp.transpose(
            mha_reference(*(jnp.transpose(a, (0, 2, 1, 3)) for a in (q, k, v))),
            (0, 2, 1, 3),
        ).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-2, rtol=2e-2)

    def test_dit_bnhd_layout_matches_default(self):
        """dit_forward(attn_layout='bnhd') — the layout used by the
        inference entry points (pipeline denoise loop, bench) — matches the
        default layout to float noise."""
        from videogpa_tpu.models.cogvideox import CogVideoXConfig, dit_init
        from videogpa_tpu.models.cogvideox.dit import dit_forward

        cfg = CogVideoXConfig.tiny()
        p = dit_init(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(
            jax.random.PRNGKey(1),
            (2, cfg.sample_frames, cfg.in_channels,
             cfg.sample_height, cfg.sample_width),
        )
        txt = jax.random.normal(
            jax.random.PRNGKey(2), (2, cfg.max_text_seq_length, cfg.text_embed_dim)
        )
        t = jnp.array([100, 900])
        a = dit_forward(p, x, txt, t, cfg, attn_impl="flash",
                        compute_dtype=jnp.float32)
        b = dit_forward(p, x, txt, t, cfg, attn_impl="flash",
                        compute_dtype=jnp.float32, attn_layout="bnhd")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

    def test_cross_attention_lengths(self):
        key = jax.random.PRNGKey(1)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (1, 2, 100, 32))
        k = jax.random.normal(kk, (1, 2, 220, 32))
        v = jax.random.normal(kv, (1, 2, 220, 32))
        got = attention(q, k, v, impl="flash", block_q=128, block_k=128)
        want = mha_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_lagged_max_fallback_on_extreme_logits(self):
        """A pathological block-to-block logit jump (beyond the lag clamp)
        must trigger the lax.cond fallback to the classic exact kernel."""
        key = jax.random.PRNGKey(7)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (1, 2, 300, 64))
        k = jax.random.normal(kk, (1, 2, 300, 64))
        v = jax.random.normal(kv, (1, 2, 300, 64))
        # plant a huge key in the LAST kv block: the lagged frame from block 0
        # underestimates the max by far more than the clamp
        k = k.at[:, :, -1, :].set(40.0)
        got = attention(q, k, v, impl="flash", block_q=128, block_k=128)
        want = mha_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_transposed_stall_fallback_on_extreme_logits(self):
        """The bnhd (pre-laid-operand) guard's fallback is the clamp-free
        STALLING transposed kernel — same qt/k/vt operands, no classic-
        layout rebuild (the old rebuild cost ~2.1 GiB of 2x-lane-padded
        branch buffers at the CogVideoX1.5 flagship shape). Exercise the
        fallback directly with a beyond-clamp logit jump."""
        from videogpa_tpu.ops.attention import (
            _LOG2E,
            _flash_fwd_guarded_pre,
            _round_up,
        )

        key = jax.random.PRNGKey(11)
        kq, kk, kv = jax.random.split(key, 3)
        BH, N, D = 2, 300, 64
        q = jax.random.normal(kq, (BH, N, D), jnp.float32)
        k = jax.random.normal(kk, (BH, N, D), jnp.float32)
        v = jax.random.normal(kv, (BH, N, D), jnp.float32)
        k = k.at[:, -1, :].set(40.0)  # beyond-clamp jump in the last block

        Np = _round_up(N, 128)
        pad = ((0, 0), (0, Np - N), (0, 0))
        qp, kp, vp = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        scale = D ** -0.5
        qt = jnp.swapaxes(qp * (scale * _LOG2E), 1, 2)
        D_aug = _round_up(D + 1, 8)
        vt = jnp.concatenate(
            [jnp.swapaxes(vp, 1, 2), jnp.ones((BH, 1, Np), vp.dtype),
             jnp.zeros((BH, D_aug - D - 1, Np), vp.dtype)], axis=1)
        got = _flash_fwd_guarded_pre(qt, kp, vt, N, 128, 128)[:, :N]
        want = mha_reference(q[None], k[None], v[None])[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    @pytest.mark.parametrize("n", [256, 300])
    def test_head_dim_128_matches_reference(self, n):
        """The lane-full (D = 128) path — the Wan geometry — vs the XLA
        oracle, ragged n included."""
        key = jax.random.PRNGKey(9)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (1, 2, n, 128))
        k = jax.random.normal(kk, (1, 2, n, 128))
        v = jax.random.normal(kv, (1, 2, n, 128))
        got = attention(q, k, v, impl="flash", block_q=128, block_k=128)
        want = mha_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

        # gradients flow through the flash vjp's lse at this geometry
        def loss(f, *args):
            return jnp.sum(jnp.square(f(*args)))

        g1 = jax.grad(
            lambda q: loss(lambda x: attention(x, k, v, impl="flash",
                                               block_q=128, block_k=128), q)
        )(q)
        g2 = jax.grad(lambda q: loss(lambda x: mha_reference(x, k, v), q))(q)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-4)

    def test_head_dim_128_extreme_logits(self):
        key = jax.random.PRNGKey(10)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (1, 2, 300, 128))
        k = jax.random.normal(kk, (1, 2, 300, 128))
        v = jax.random.normal(kv, (1, 2, 300, 128))
        k = k.at[:, :, -1, :].set(40.0)  # huge logit jump in the last block
        got = attention(q, k, v, impl="flash", block_q=128, block_k=128)
        want = mha_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_int8_qk_close_to_reference(self):
        """SageAttention-style int8 QK^T: near-exact (inference mode)."""
        key = jax.random.PRNGKey(8)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (1, 4, 300, 64))
        k = jax.random.normal(kk, (1, 4, 300, 64)) + 0.5  # nonzero mean: tests centering
        v = jax.random.normal(kv, (1, 4, 300, 64))
        got = np.asarray(attention(q, k, v, impl="flash_int8", block_q=128, block_k=128))
        want = np.asarray(mha_reference(q, k, v))
        cos = np.sum(got * want) / np.sqrt(np.sum(got * got) * np.sum(want * want))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert cos > 0.999, cos
        assert rel < 0.02, rel

    def test_int8_qk_head_dim_128_kernel(self):
        """Lane-full int8-QK kernel numerics (classic layout, ragged
        length). The kernel is NOT dispatched by attention() — it measured
        slower than the exact kernel on-chip (see its docstring) — but its
        numerics stay pinned here."""
        from videogpa_tpu.ops.attention import _flash_int8_128

        key = jax.random.PRNGKey(9)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (2, 300, 128))
        k = jax.random.normal(kk, (2, 300, 128)) + 0.5  # tests centering
        v = jax.random.normal(kv, (2, 300, 128))
        pad = [(0, 0), (0, 384 - 300), (0, 0)]
        got = _flash_int8_128(
            jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad), 300, 128, 128
        )[:, :300]
        got = np.asarray(got)
        want = np.asarray(mha_reference(q[None], k[None], v[None]))[0]
        cos = np.sum(got * want) / np.sqrt(np.sum(got * got) * np.sum(want * want))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert cos > 0.999, cos
        assert rel < 0.02, rel

    def test_int8_head_dim_128_dispatches_exact(self):
        """attention(impl="flash_int8") at D >= 128 must route to the exact
        flash kernel (the int8-128 kernel measured slower on-chip)."""
        key = jax.random.PRNGKey(9)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (1, 2, 300, 128))
        k = jax.random.normal(kk, (1, 2, 300, 128))
        v = jax.random.normal(kv, (1, 2, 300, 128))
        got = attention(q, k, v, impl="flash_int8", block_q=128, block_k=128)
        want = attention(q, k, v, impl="flash", block_q=128, block_k=128)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_gradients_match_reference(self):
        key = jax.random.PRNGKey(2)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (1, 2, 150, 32))
        k = jax.random.normal(kk, (1, 2, 150, 32))
        v = jax.random.normal(kv, (1, 2, 150, 32))

        def loss_flash(q, k, v):
            o = attention(q, k, v, impl="flash", block_q=128, block_k=128)
            return jnp.sum(o * o)

        def loss_ref(q, k, v):
            o = mha_reference(q, k, v)
            return jnp.sum(o * o)

        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

    def test_gradients_on_extreme_logits_use_stall_fallback_lse(self):
        """Training path through the exactness guard: a beyond-clamp logit
        jump routes the vjp FORWARD through the transposed stalling kernel's
        with_lse output, which the backward recomputation consumes — the
        gradients must still match the XLA oracle."""
        key = jax.random.PRNGKey(13)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (1, 2, 300, 64))
        k = jax.random.normal(kk, (1, 2, 300, 64))
        v = jax.random.normal(kv, (1, 2, 300, 64))
        # huge key in the LAST kv block: the lagged running max from earlier
        # blocks underestimates by far more than the 2^110 clamp
        k = k.at[:, :, -1, :].set(40.0)

        def loss_flash(q, k, v):
            o = attention(q, k, v, impl="flash", block_q=128, block_k=128)
            return jnp.sum(o * o)

        def loss_ref(q, k, v):
            return jnp.sum(mha_reference(q, k, v) ** 2)

        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            # rtol for the planted huge-key rows (grad magnitudes ~1e2)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-5
            )

    def test_bnhd_layout_gradients_match_reference(self):
        """The inference-layout path (layout='bnhd', the self_attention
        default) must be DIFFERENTIABLE: its vjp falls back to the bhnd
        flash backward (attention._attention_bnhd_vjp), so fine-tuning a
        ViT block never hits a missing-vjp error (ADVICE r4)."""
        key = jax.random.PRNGKey(7)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (1, 150, 2, 32))  # (B, N, H, D)
        k = jax.random.normal(kk, (1, 150, 2, 32))
        v = jax.random.normal(kv, (1, 150, 2, 32))

        def loss_bnhd(q, k, v):
            o = attention(q, k, v, impl="flash", block_q=128, block_k=128,
                          layout="bnhd")
            return jnp.sum(o * o)

        def loss_ref(q, k, v):
            tr = lambda x: jnp.transpose(x, (0, 2, 1, 3))
            return jnp.sum(mha_reference(tr(q), tr(k), tr(v)) ** 2)

        g1 = jax.grad(loss_bnhd, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

    def test_bf16_forward(self):
        key = jax.random.PRNGKey(3)
        q = jax.random.normal(key, (1, 2, 256, 64), jnp.bfloat16)
        got = attention(q, q, q, impl="flash", block_q=128, block_k=128)
        want = mha_reference(q, q, q)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2
        )


class TestRope:
    def test_rope_2d_vs_reference_formula(self):
        """Oracle: direct transcription of the duplicated-angle 2D RoPE math."""
        rng = np.random.default_rng(0)
        B, H, N, D = 2, 3, 10, 16
        x = rng.standard_normal((B, H, N, D)).astype(np.float32)
        pos = rng.integers(0, 20, (B, N, 2))

        def oracle_1d(tok, p, dim, base=100.0):
            inv = 1.0 / base ** (np.arange(0, dim, 2) / dim)
            ang = p[..., None] * inv  # (B,N,dim/2)
            ang = np.concatenate([ang, ang], -1)[:, None]  # (B,1,N,dim)
            cos, sin = np.cos(ang), np.sin(ang)
            x1, x2 = tok[..., : dim // 2], tok[..., dim // 2 :]
            rot = np.concatenate([-x2, x1], -1)
            return tok * cos + rot * sin

        half = D // 2
        want = np.concatenate(
            [
                oracle_1d(x[..., :half], pos[..., 0], half),
                oracle_1d(x[..., half:], pos[..., 1], half),
            ],
            axis=-1,
        )
        got = np.asarray(rope_2d(jnp.asarray(x), jnp.asarray(pos)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_rope_2d_zero_pos_is_identity(self):
        x = jnp.ones((1, 1, 4, 8))
        pos = jnp.zeros((1, 4, 2), jnp.int32)
        np.testing.assert_allclose(np.asarray(rope_2d(x, pos)), np.asarray(x), atol=1e-6)

    def test_rope_3d_preserves_norm(self):
        cos, sin = rope_3d_freqs((2, 3, 4), 64)
        assert cos.shape == (24, 64)
        x = jax.random.normal(jax.random.PRNGKey(0), (24, 64))
        y = apply_rope_interleaved(x, cos, sin)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(y), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-5,
        )


class TestMesh:
    def test_make_mesh_8_devices(self):
        from videogpa_tpu.parallel import MeshAxes, make_mesh

        mesh = make_mesh(MeshAxes(data=2, seq=1, model=4))
        assert mesh.shape == {"data": 2, "seq": 1, "model": 4}

    def test_sharded_matmul_runs(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from videogpa_tpu.parallel import MeshAxes, make_mesh

        mesh = make_mesh(MeshAxes(data=2, model=4))
        x = jnp.ones((8, 16))
        w = jnp.ones((16, 32))
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
        ws = jax.device_put(w, NamedSharding(mesh, P(None, "model")))
        y = jax.jit(jnp.dot)(xs, ws)
        assert y.shape == (8, 32)
        np.testing.assert_allclose(np.asarray(y), 16.0)


class TestConvTranspose:
    def test_matches_torch(self):
        import torch
        import torch.nn as nn

        from videogpa_tpu.ops.layers import conv_transpose2d

        for k in (2, 4):
            m = nn.ConvTranspose2d(6, 10, kernel_size=k, stride=k, padding=0)
            x = torch.randn(2, 6, 5, 7)
            want = m(x).detach().numpy()
            # torch weight (in, out, kh, kw) -> HWIO (kh, kw, in, out)
            wj = jnp.asarray(m.weight.detach().numpy().transpose(2, 3, 0, 1))
            p = {"kernel": wj, "bias": jnp.asarray(m.bias.detach().numpy())}
            got = np.asarray(conv_transpose2d(p, jnp.asarray(x.numpy()), stride=k))
            np.testing.assert_allclose(got, want, atol=1e-5)


class TestRingAttention:
    def test_matches_full_attention_on_mesh(self):
        from videogpa_tpu.ops.ring_attention import ring_attention_sharded
        from videogpa_tpu.parallel import MeshAxes, make_mesh

        mesh = make_mesh(MeshAxes(data=1, seq=8, model=1))
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        B, H, N, D = 1, 2, 8 * 16, 32
        q = jax.random.normal(kq, (B, H, N, D))
        k = jax.random.normal(kk, (B, H, N, D))
        v = jax.random.normal(kv, (B, H, N, D))
        got = ring_attention_sharded(q, k, v, mesh, impl="xla")
        want = mha_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_ring_single_device_degenerates(self):
        from videogpa_tpu.ops.ring_attention import ring_attention_sharded
        from videogpa_tpu.parallel import MeshAxes, make_mesh

        mesh = make_mesh(MeshAxes(data=8, seq=1, model=1))
        q = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 64, 16))
        got = ring_attention_sharded(q, q, q, mesh, impl="xla")
        want = mha_reference(q, q, q)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_ring_gradients_match_reference(self):
        """jax.grad through the backward ring (dk/dv rotating with ppermute)
        must match the XLA reference's gradients."""
        from videogpa_tpu.ops.ring_attention import ring_attention_sharded
        from videogpa_tpu.parallel import MeshAxes, make_mesh

        mesh = make_mesh(MeshAxes(data=1, seq=8, model=1))
        key = jax.random.PRNGKey(4)
        kq, kk, kv = jax.random.split(key, 3)
        B, H, N, D = 1, 2, 8 * 12, 16
        q = jax.random.normal(kq, (B, H, N, D))
        k = jax.random.normal(kk, (B, H, N, D))
        v = jax.random.normal(kv, (B, H, N, D))

        def loss_ring(q, k, v):
            o = ring_attention_sharded(q, k, v, mesh, impl="xla")
            return jnp.sum(o * o)

        def loss_ref(q, k, v):
            return jnp.sum(mha_reference(q, k, v) ** 2)

        g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

    def test_ring_gradients_ragged(self):
        """Gradients through the rotating-mask (padded N) path."""
        from videogpa_tpu.ops.ring_attention import ring_attention_sharded
        from videogpa_tpu.parallel import MeshAxes, make_mesh

        mesh = make_mesh(MeshAxes(data=2, seq=4))
        N = 70  # pads to 72
        q = jax.random.normal(jax.random.PRNGKey(5), (1, 2, N, 16))
        k = jax.random.normal(jax.random.PRNGKey(6), (1, 2, N, 16))
        v = jax.random.normal(jax.random.PRNGKey(7), (1, 2, N, 16))

        def loss_ring(q, k, v):
            return jnp.sum(ring_attention_sharded(q, k, v, mesh, impl="xla") ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(mha_reference(q, k, v) ** 2)

        g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


class TestRingFlashRagged:
    """Padded (non-divisible) N must KEEP the Pallas kernels: per-shard
    validity is statically full/partial/empty, dispatched by lax.switch on
    the rotating resident-shard id (ring_attention.py::_ring_forward)."""

    @pytest.mark.parametrize("n", [300, 5])
    def test_forward_matches_reference(self, n):
        # n=300 over 4 shards: partial tail shard; n=5 over 4 shards of
        # len 2: full, full, partial(1), fully-empty shard
        from videogpa_tpu.ops.ring_attention import ring_attention_sharded
        from videogpa_tpu.parallel.mesh import MeshAxes, make_mesh

        mesh = make_mesh(MeshAxes(data=2, seq=4))
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, n, 64))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, n, 64))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, n, 64))
        out = ring_attention_sharded(q, k, v, mesh, impl="flash")
        ref = mha_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_partial_shard_block_aligned_prefix(self):
        """Regression: a partial shard whose valid prefix is a MULTIPLE of
        block_k but shorter than the block-padded key length must still mask
        the zero-pad keys. The old trace-time skip keyed on
        ``n_valid % block_k != 0``, so nv=128 with the shard padded 129->256
        let 128 zero-keys into the softmax unmasked (measured maxerr ~9e-2
        at ring scale); the fix compares nv against the padded Nk."""
        from videogpa_tpu.ops.ring_attention import _attn_with_lse_flash

        kq, kk, kv = jax.random.split(jax.random.PRNGKey(3), 3)
        B, H, Nq, Nk, D = 1, 2, 64, 129, 64
        q = jax.random.normal(kq, (B, H, Nq, D))
        k = jax.random.normal(kk, (B, H, Nk, D))
        v = jax.random.normal(kv, (B, H, Nk, D))
        nv = 128  # multiple of block_k=128; shard pads to Nk_p=256
        o, _lse = _attn_with_lse_flash(q, k, v, n_valid=nv, block_k=128)
        ref = mha_reference(q, k[:, :, :nv], v[:, :, :nv])
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_bwd_partial_shard_block_aligned_prefix(self):
        """Backward regression for the same boundary: Nk=1025 pads to 2048
        with bk=1024, so nv=1024 is block-aligned but half the padded keys
        are invalid — dq/dk/dv must match the masked reference and the
        padding row's dk/dv must vanish."""
        from videogpa_tpu.ops.ring_attention import (
            _attn_with_lse_flash, _bwd_step_flash)

        kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(8), 4)
        B, H, Nq, Nk, D = 1, 2, 64, 1025, 64
        nv = 1024
        q = jax.random.normal(kq, (B, H, Nq, D))
        k = jax.random.normal(kk, (B, H, Nk, D))
        v = jax.random.normal(kv, (B, H, Nk, D))
        g = jax.random.normal(kg, (B, H, Nq, D))

        o, lse = _attn_with_lse_flash(q, k, v, n_valid=nv)
        dq, dk, dv = _bwd_step_flash(q, k, v, g, o, lse, n_valid=nv)

        def loss(q, kv_, vv):
            return jnp.sum(mha_reference(q, kv_, vv) * g)

        rq, rk, rv = jax.grad(loss, argnums=(0, 1, 2))(
            q, k[:, :, :nv], v[:, :, :nv])
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(dk[:, :, :nv]), np.asarray(rk), atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(dv[:, :, :nv]), np.asarray(rv), atol=5e-4)
        np.testing.assert_allclose(np.asarray(dk[:, :, nv:]), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dv[:, :, nv:]), 0.0, atol=1e-6)

    def test_gradients_match_reference(self):
        from videogpa_tpu.ops.ring_attention import ring_attention_sharded
        from videogpa_tpu.parallel.mesh import MeshAxes, make_mesh

        mesh = make_mesh(MeshAxes(data=2, seq=4))
        N = 300
        q = jax.random.normal(jax.random.PRNGKey(5), (1, 2, N, 64))
        k = jax.random.normal(jax.random.PRNGKey(6), (1, 2, N, 64))
        v = jax.random.normal(jax.random.PRNGKey(7), (1, 2, N, 64))

        def loss_ring(q, k, v):
            return jnp.sum(ring_attention_sharded(q, k, v, mesh, impl="flash") ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(mha_reference(q, k, v) ** 2)

        g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


class TestRingRaggedAndDiT:
    def test_ring_ragged_matches_reference(self):
        """Padded (non-divisible) N through the rotating-mask path."""
        from videogpa_tpu.ops.attention import mha_reference
        from videogpa_tpu.ops.ring_attention import ring_attention_sharded
        from videogpa_tpu.parallel.mesh import MeshAxes, make_mesh

        mesh = make_mesh(MeshAxes(data=2, seq=4))
        N = 70  # not divisible by 4 -> padded to 72 with mask
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, N, 16))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, N, 16))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, N, 16))
        out = ring_attention_sharded(q, k, v, mesh, impl="xla")
        ref = mha_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_dit_forward_with_ring_impl(self):
        """attn_impl='ring' flows through the DiT under a seq mesh."""
        from videogpa_tpu.models.cogvideox import CogVideoXConfig, dit_init
        from videogpa_tpu.models.cogvideox.dit import dit_forward
        from videogpa_tpu.parallel.mesh import MeshAxes, make_mesh

        cfg = CogVideoXConfig.tiny()
        params = dit_init(jax.random.PRNGKey(0), cfg)
        mesh = make_mesh(MeshAxes(data=2, seq=4))
        B = 1
        lat = jax.random.normal(
            jax.random.PRNGKey(1),
            (B, cfg.sample_frames, cfg.in_channels,
             cfg.sample_height, cfg.sample_width))
        txt = jax.random.normal(
            jax.random.PRNGKey(2), (B, cfg.max_text_seq_length, cfg.text_embed_dim))
        t = jnp.array([500])
        with jax.set_mesh(mesh):
            out_ring = dit_forward(params, lat, txt, t, cfg, attn_impl="ring",
                                   compute_dtype=jnp.float32)
        out_xla = dit_forward(params, lat, txt, t, cfg, attn_impl="xla",
                              compute_dtype=jnp.float32)
        assert out_ring.shape == out_xla.shape
        # NOTE: tolerance is bounded by the CPU backend's jit-vs-eager
        # transcendental fusion noise, not by ring attention — jit vs eager
        # of the *identical* xla block differs by ~4e-2 here, while ring vs
        # reference at the op level is exact to 2e-5 (test above).
        np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_xla),
                                   rtol=5e-2, atol=5e-2)

    def test_ring_impl_without_mesh_raises(self):
        from videogpa_tpu.ops.attention import attention

        q = jnp.zeros((1, 2, 64, 16))
        with np.testing.assert_raises(ValueError):
            attention(q, q, q, impl="ring")
