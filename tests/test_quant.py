"""W8A8 dynamic-quantized inference (ops/quant.py): numerics + wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from videogpa_tpu.ops import layers as L
from videogpa_tpu.ops.quant import (
    quantize_dit_int8,
    quantize_linear,
    quantize_wan_int8,
)


def _cos(a, b):
    a, b = a.ravel(), b.ravel()
    return float(jnp.sum(a * b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b)))


class TestQuantizedLinear:
    def test_close_to_exact(self):
        p = L.linear_init(jax.random.PRNGKey(0), 256, 512)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 33, 256))
        y = L.linear(p, x)
        yq = L.linear(quantize_linear(p), x)
        assert _cos(y, yq) > 0.9999
        rel = float(jnp.linalg.norm(y - yq) / jnp.linalg.norm(y))
        assert rel < 0.02, rel

    def test_stacked_kernels_quantize_per_layer(self):
        """lax.scan-stacked (L, in, out) kernels get per-(layer, channel)
        scales — layer 1's magnitude must not leak into layer 0's scale."""
        k0 = L.linear_init(jax.random.PRNGKey(0), 16, 8)
        k1 = {"kernel": k0["kernel"] * 100.0, "bias": k0["bias"]}
        stacked = jax.tree_util.tree_map(
            lambda a, b: jnp.stack([a, b]), k0, k1
        )
        q = quantize_linear(stacked)
        q0 = quantize_linear(k0)
        np.testing.assert_array_equal(np.asarray(q["w_int8"][0]),
                                      np.asarray(q0["w_int8"]))
        np.testing.assert_allclose(np.asarray(q["w_scale"][0]),
                                   np.asarray(q0["w_scale"]))

    def test_no_bias_and_jit_dispatch(self):
        """Bias-less layers quantize, and the dispatch works under jit
        (the DiT folds quantized block params through lax.scan)."""
        p = {"kernel": jax.random.normal(jax.random.PRNGKey(0), (64, 32))}
        q = quantize_linear(p)
        assert "bias" not in q and q["w_int8"].dtype == jnp.int8
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 64))
        y = jax.jit(lambda q, x: L.linear(q, x))(q, x)
        assert _cos(L.linear(p, x), y) > 0.9999


class TestQuantizedDiT:
    def test_cogvideox_forward_cosine(self):
        from videogpa_tpu.models.cogvideox import (
            CogVideoXConfig,
            dit_forward,
            dit_init,
        )

        cfg = CogVideoXConfig.tiny()
        params = dit_init(jax.random.PRNGKey(0), cfg)
        qparams = quantize_dit_int8(params)
        B, F = 1, 2
        x = jax.random.normal(jax.random.PRNGKey(2), (B, F, cfg.in_channels, 8, 12))
        txt = jax.random.normal(jax.random.PRNGKey(3), (B, 7, cfg.text_embed_dim))
        t = jnp.full((B,), 500)
        o1 = dit_forward(params, x, txt, t, cfg, attn_impl="xla",
                         compute_dtype=jnp.float32)
        o2 = dit_forward(qparams, x, txt, t, cfg, attn_impl="xla",
                         compute_dtype=jnp.float32)
        assert _cos(o1, o2) > 0.999

    def test_wan_forward_cosine(self):
        from videogpa_tpu.models.wan import WanConfig
        from videogpa_tpu.models.wan.dit import wan_forward, wan_init

        cfg = WanConfig.tiny()
        params = wan_init(jax.random.PRNGKey(0), cfg)
        qparams = quantize_wan_int8(params)
        x = jax.random.normal(jax.random.PRNGKey(4), (1, cfg.in_channels, 3, 8, 8))
        txt = jax.random.normal(jax.random.PRNGKey(5), (1, 9, cfg.text_dim))
        t = jnp.full((1,), 500.0)
        o1 = wan_forward(params, x, t, txt, cfg, attn_impl="xla")
        o2 = wan_forward(qparams, x, t, txt, cfg, attn_impl="xla")
        assert _cos(o1, o2) > 0.999

    def test_vggt_trunk_cosine(self):
        from videogpa_tpu.models.vggt import VGGTConfig, vggt_forward, vggt_init
        from videogpa_tpu.ops.quant import quantize_vggt_int8

        cfg = VGGTConfig.tiny()
        params = vggt_init(jax.random.PRNGKey(0), cfg)
        qparams = quantize_vggt_int8(params)
        imgs = jax.random.uniform(jax.random.PRNGKey(1),
                                  (1, 2, 3, cfg.img_size, cfg.img_size))
        o1 = vggt_forward(params, imgs, cfg, attn_impl="xla",
                          compute_dtype=jnp.float32)
        o2 = vggt_forward(qparams, imgs, cfg, attn_impl="xla",
                          compute_dtype=jnp.float32)
        assert _cos(o1["depth"], o2["depth"]) > 0.99
        assert _cos(o1["pose_enc"], o2["pose_enc"]) > 0.99

    def test_lora_merges_before_quantization(self):
        """The generate CLI quantizes AFTER merge_lora: a merged-then-
        quantized model must differ from base-quantized."""
        from videogpa_tpu.models.cogvideox import CogVideoXConfig, dit_init
        from videogpa_tpu.train.lora import lora_init, merge_lora

        cfg = CogVideoXConfig.tiny()
        params = dit_init(jax.random.PRNGKey(0), cfg)
        lora = lora_init(jax.random.PRNGKey(1), cfg.num_layers, cfg.hidden_dim,
                         rank=2)
        # lora_init B=0 -> scale A so the delta is nonzero
        lora = jax.tree_util.tree_map(
            lambda x: jnp.ones_like(x) * 0.01, lora
        )
        merged = merge_lora(params, lora, 2, 4.0)
        qa = quantize_dit_int8(params)
        qb = quantize_dit_int8(merged)
        d = np.abs(np.asarray(qa["blocks"]["attn1"]["to_q"]["w_int8"], np.int32)
                   - np.asarray(qb["blocks"]["attn1"]["to_q"]["w_int8"], np.int32))
        assert d.max() > 0


class TestTrajectoryDrift:
    def test_full_sampling_loop_int8_drift(self):
        """Trajectory-level accuracy of the production int8 mode: a full
        10-step CFG DDIM loop (denoise_loop) with W8A8 GEMMs + flash_int8
        attention must track the exact f32 trajectory — per-call cosines
        alone don't rule out compounding drift across steps."""
        import videogpa_tpu.ops.attention as A
        from videogpa_tpu.models.cogvideox import CogVideoXConfig, dit_init
        from videogpa_tpu.models.cogvideox.pipeline import (
            SamplerSettings,
            denoise_loop,
        )

        old = A.INTERPRET
        A.INTERPRET = True
        try:
            cfg = CogVideoXConfig.tiny()
            params = dit_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
            emb = jax.random.normal(
                jax.random.PRNGKey(1),
                (1, cfg.max_text_seq_length, cfg.text_embed_dim),
                jnp.float32,
            )
            neg = jnp.zeros_like(emb)
            shape = (1, cfg.sample_frames, cfg.in_channels,
                     cfg.sample_height, cfg.sample_width)
            st = SamplerSettings(
                num_inference_steps=10, guidance_scale=6.0, sampler="ddim"
            )
            lat = denoise_loop(
                params, emb, neg, jax.random.PRNGKey(2), cfg, st, shape,
                compute_dtype=jnp.float32,
            )
            lat_q = denoise_loop(
                quantize_dit_int8(params), emb, neg, jax.random.PRNGKey(2),
                cfg, st, shape, attn_impl="flash_int8",
                compute_dtype=jnp.float32,
            )
            cos = _cos(lat, lat_q)
            rel = float(jnp.linalg.norm(lat - lat_q) / jnp.linalg.norm(lat))
            # measured 0.9999977 / 0.21% on random tiny weights (pessimistic)
            assert cos > 0.9999, cos
            assert rel < 0.02, rel
        finally:
            A.INTERPRET = old


class TestDA3Quant:
    def test_da3_backbone_cosine(self):
        from videogpa_tpu.models.da3 import DA3Config
        from videogpa_tpu.models.da3.model import da3_forward, da3_init
        from videogpa_tpu.ops.quant import quantize_da3_int8

        cfg = DA3Config.tiny()
        params = da3_init(jax.random.PRNGKey(0), cfg)
        qparams = quantize_da3_int8(params)
        imgs = jax.random.uniform(
            jax.random.PRNGKey(1), (1, 2, 3, cfg.img_size, cfg.img_size)
        )
        o1 = da3_forward(params, imgs, cfg, attn_impl="xla")
        o2 = da3_forward(qparams, imgs, cfg, attn_impl="xla")
        assert _cos(o1["depth"], o2["depth"]) > 0.99


class TestInt8RankAgreement:
    def test_structured_candidates_rank_identically(self):
        """Production-relevant int8-scoring accuracy: DPO consumes only the
        ORDERING of candidate clips (reference ``train/dataset.py:156-188``
        win/lose pair construction), so the signal that must survive
        quantization is the per-group ranking, not the absolute score.

        Builds the closed-loop e2e test's STRUCTURED candidates — a
        geometrically-consistent sliding-crop clip plus three graded noise
        degradations — and scores them with the exact scorer and the full
        production int8 mode (W8A8 trunk GEMMs + flash_int8 attention).
        Asserts (a) the exact scorer orders clean best and degradations by
        amplitude, and (b) the int8 scorer reproduces the exact ordering —
        every win/lose pair DPO would form agrees. CPU-runnable complement
        to the bench's reward_int8_rank_agreement driver artifact.
        """
        import cv2

        import videogpa_tpu.ops.attention as A
        from videogpa_tpu.metrics import ConsistencyScore
        from videogpa_tpu.models.vggt import VGGTConfig, vggt_init
        from videogpa_tpu.ops.quant import quantize_vggt_int8
        from videogpa_tpu.reward import VideoProcessor

        vcfg = VGGTConfig.tiny()
        params = vggt_init(jax.random.PRNGKey(2), vcfg)
        vp_exact = VideoProcessor(
            {"Consistency_Score": ConsistencyScore(None)},
            params=params, config=vcfg,
            compute_dtype=jnp.float32, attn_impl="xla",
        )
        vp_int8 = VideoProcessor(
            {"Consistency_Score": ConsistencyScore(None)},
            params=quantize_vggt_int8(params), config=vcfg,
            attn_impl="flash_int8",
        )

        # sliding crop over a smooth background = consistent camera motion
        NF, H, W = 5, 32, 48
        rng = np.random.default_rng(0)
        bg = cv2.GaussianBlur(
            rng.uniform(0, 255, (128, 128, 3)).astype(np.uint8), (0, 0), 3
        )
        clean = np.stack([
            bg[10 + 2 * t:10 + 2 * t + H, 10 + 3 * t:10 + 3 * t + W]
            for t in range(NF)
        ])
        candidates = [clean]
        for i, amp in enumerate((40, 80, 120)):
            candidates.append(np.clip(
                clean.astype(np.int16)
                + np.random.default_rng(300 + i).integers(
                    -amp, amp, clean.shape),
                0, 255,
            ).astype(np.uint8))

        def score_all(vp):
            return np.array([
                float(vp.process_frames(c, [0])[0]["Consistency_Score"])
                for c in candidates
            ])

        exact = score_all(vp_exact)
        old = A.INTERPRET
        A.INTERPRET = True
        try:
            quant = score_all(vp_int8)
        finally:
            A.INTERPRET = old

        # (a) exact scorer ranks by degradation (lower = better)
        assert np.all(np.diff(exact) > 0), exact
        # (b) the int8 scorer preserves the full ordering — hence every
        # win/lose pair the DPO dataset would construct
        np.testing.assert_array_equal(
            np.argsort(exact), np.argsort(quant),
            err_msg=f"exact scores {exact} vs int8 scores {quant}")
