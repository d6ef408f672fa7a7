"""CogVideoX tests: scheduler math, DiT/VAE behavior, pipeline smoke, converter."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videogpa_tpu.models.cogvideox import (
    CogVideoXConfig,
    CogVideoXScheduler,
    dit_forward,
    dit_init,
)
from videogpa_tpu.models.cogvideox.pipeline import (
    SamplerSettings,
    denoise_loop,
    sample_i2v,
    sample_t2v,
)
from videogpa_tpu.models.cogvideox.vae import vae_decode, vae_encode, vae_init


class TestScheduler:
    def setup_method(self):
        self.s = CogVideoXScheduler()

    def test_zero_terminal_snr(self):
        ac = np.asarray(self.s.alphas_cumprod)
        assert ac[-1] < 1e-10  # terminal SNR is zero after rescale
        assert 0.99 < ac[0] <= 1.0

    def test_snr_shift_monotone(self):
        ac = np.asarray(self.s.alphas_cumprod)
        assert (np.diff(ac) < 0).all()

    def test_add_noise_get_velocity_algebra(self):
        """x0 must be exactly recoverable from (x_t, v)."""
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (2, 3, 4, 8, 8))
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t = jnp.array([100, 700])
        xt = self.s.add_noise(x0, noise, t)
        v = self.s.get_velocity(x0, noise, t)
        ac = self.s.alphas_cumprod[t].reshape(-1, 1, 1, 1, 1)
        x0_rec = jnp.sqrt(ac) * xt - jnp.sqrt(1 - ac) * v
        np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-5)

    def test_trailing_timesteps(self):
        ts = self.s.timesteps(50)
        assert len(ts) == 50
        assert ts[0] == 999 and ts[-1] == 19
        assert (np.diff(ts) == -20).all()

    def test_ddim_perfect_model_recovers_x0(self):
        """If the model always returns the true velocity, DDIM converges to x0."""
        key = jax.random.PRNGKey(2)
        x0 = jax.random.normal(key, (1, 2, 2, 4, 4))
        noise = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
        ts = self.s.timesteps(10)
        # start from pure noise (terminal SNR zero => x_T == noise)
        lat = noise
        for i, t in enumerate(ts):
            t_prev = ts[i + 1] if i + 1 < len(ts) else -1
            ac = self.s.alphas_cumprod[t]
            # true eps for current latent given fixed x0
            eps = (lat - jnp.sqrt(ac) * x0) / jnp.sqrt(1 - ac)
            v = jnp.sqrt(ac) * eps - jnp.sqrt(1 - ac) * x0
            lat = self.s.ddim_step(v, t, t_prev, lat)
        # along the exact trajectory lat_t = sqrt(ac_t) x0 + sqrt(1-ac_t) noise;
        # the final step lands on final_alpha_cumprod (~0.997), not 1
        ac_f = self.s.final_alpha_cumprod
        want = jnp.sqrt(ac_f) * x0 + jnp.sqrt(1 - ac_f) * noise
        np.testing.assert_allclose(np.asarray(lat), np.asarray(want), atol=1e-4)

    def test_dpm_perfect_model_recovers_x0(self):
        key = jax.random.PRNGKey(4)
        x0 = jax.random.normal(key, (1, 2, 2, 4, 4))
        lat = jax.random.normal(jax.random.PRNGKey(5), x0.shape)
        ts = self.s.timesteps(10)
        old_x0 = None
        zero = jnp.zeros_like(x0)  # noise-free run isolates solver behavior
        for i, t in enumerate(ts):
            t_prev = ts[i + 1] if i + 1 < len(ts) else -1
            ac = self.s.alphas_cumprod[t]
            eps = (lat - jnp.sqrt(ac) * x0) / jnp.sqrt(1 - ac)
            v = jnp.sqrt(ac) * eps - jnp.sqrt(1 - ac) * x0
            tb = ts[i - 1] if i > 0 else None
            p1, p2, new_x0 = self.s.dpm_step(
                v, t, t_prev, lat, zero, old_x0=old_x0, timestep_back=tb
            )
            lat = p2 if (i > 0 and t_prev >= 0) else p1
            old_x0 = new_x0
        err = float(jnp.max(jnp.abs(lat - x0)))
        # SDE-DPM++ with zero injected noise on a perfect model converges
        # close to x0 (up to the final-alpha residual and 2nd-order error)
        assert err < 0.2, err


class TestDiT:
    def test_shapes_and_finite(self):
        cfg = CogVideoXConfig.tiny()
        params = dit_init(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(
            jax.random.PRNGKey(1),
            (2, cfg.sample_frames, cfg.in_channels, cfg.sample_height, cfg.sample_width),
        )
        txt = jax.random.normal(
            jax.random.PRNGKey(2), (2, cfg.max_text_seq_length, cfg.text_embed_dim)
        )
        out = dit_forward(
            params, x, txt, jnp.array([10, 500]), cfg,
            attn_impl="xla", compute_dtype=jnp.float32,
        )
        assert out.shape == (2, cfg.sample_frames, cfg.out_channels,
                             cfg.sample_height, cfg.sample_width)
        assert np.isfinite(np.asarray(out)).all()

    def test_timestep_changes_output(self):
        cfg = CogVideoXConfig.tiny()
        params = dit_init(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(
            jax.random.PRNGKey(1),
            (1, cfg.sample_frames, cfg.in_channels, cfg.sample_height, cfg.sample_width),
        )
        txt = jnp.zeros((1, cfg.max_text_seq_length, cfg.text_embed_dim))
        o1 = dit_forward(params, x, txt, jnp.array([10]), cfg, attn_impl="xla", compute_dtype=jnp.float32)
        o2 = dit_forward(params, x, txt, jnp.array([900]), cfg, attn_impl="xla", compute_dtype=jnp.float32)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_patch_t_variant(self):
        cfg = dataclasses.replace(CogVideoXConfig.tiny(), patch_size_t=2, sample_frames=4)
        params = dit_init(jax.random.PRNGKey(3), cfg)
        x = jax.random.normal(
            jax.random.PRNGKey(4),
            (1, 4, cfg.in_channels, cfg.sample_height, cfg.sample_width),
        )
        txt = jnp.zeros((1, cfg.max_text_seq_length, cfg.text_embed_dim))
        out = dit_forward(params, x, txt, jnp.array([100]), cfg, attn_impl="xla", compute_dtype=jnp.float32)
        assert out.shape == (1, 4, cfg.out_channels, cfg.sample_height, cfg.sample_width)

    def test_remat_matches(self):
        cfg = CogVideoXConfig.tiny()
        params = dit_init(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(
            jax.random.PRNGKey(1),
            (1, cfg.sample_frames, cfg.in_channels, cfg.sample_height, cfg.sample_width),
        )
        txt = jnp.zeros((1, cfg.max_text_seq_length, cfg.text_embed_dim))
        o1 = dit_forward(params, x, txt, jnp.array([10]), cfg, attn_impl="xla",
                         compute_dtype=jnp.float32, remat=False)
        o2 = dit_forward(params, x, txt, jnp.array([10]), cfg, attn_impl="xla",
                         compute_dtype=jnp.float32, remat=True)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


class TestVAE:
    def test_roundtrip_shapes(self):
        cfg = CogVideoXConfig.tiny()
        params = vae_init(jax.random.PRNGKey(0), cfg)
        vid = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 9, 32, 48))
        lat = vae_encode(params, vid, cfg, key=jax.random.PRNGKey(2))
        assert lat.shape == (1, cfg.vae_latent_channels, 3, 4, 6)
        rec = vae_decode(params, lat, cfg)
        assert rec.shape == vid.shape

    def test_causal_conv_is_causal(self):
        """causal_conv3d output at frame t must not see frames > t.

        (Full-encoder causality is only approximate because GroupNorm pools
        statistics over time — true of the reference VAE as well.)
        """
        from videogpa_tpu.models.cogvideox.vae import causal_conv3d, conv3d_init

        p = conv3d_init(jax.random.PRNGKey(0), 3, 4, 3)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 7, 8, 8))
        y1 = causal_conv3d(p, x)
        x2 = x.at[:, :, 4:].set(0.0)
        y2 = causal_conv3d(p, x2)
        np.testing.assert_allclose(
            np.asarray(y1[:, :, :4]), np.asarray(y2[:, :, :4]), atol=1e-6
        )
        assert not np.allclose(np.asarray(y1[:, :, 4:]), np.asarray(y2[:, :, 4:]))

    def test_deterministic_mode(self):
        cfg = CogVideoXConfig.tiny()
        params = vae_init(jax.random.PRNGKey(0), cfg)
        vid = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 5, 16, 16))
        l1 = vae_encode(params, vid, cfg, sample=False)
        l2 = vae_encode(params, vid, cfg, sample=False)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


class TestPipeline:
    def _setup(self, i2v=False):
        cfg = CogVideoXConfig.tiny(i2v=i2v)
        dit_params = dit_init(jax.random.PRNGKey(0), cfg)
        vae_params = vae_init(jax.random.PRNGKey(1), cfg)
        txt = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.max_text_seq_length, cfg.text_embed_dim))
        neg = jnp.zeros_like(txt)
        return cfg, dit_params, vae_params, txt, neg

    def test_t2v_smoke(self):
        cfg, dit_params, vae_params, txt, neg = self._setup()
        settings = SamplerSettings(num_inference_steps=3, guidance_scale=6.0)
        video = sample_t2v(
            dit_params, vae_params, txt, neg, cfg, jax.random.PRNGKey(3),
            num_frames=9, height=64, width=96, settings=settings,
            attn_impl="xla", compute_dtype=jnp.float32,
        )
        assert video.shape == (1, 3, 9, 64, 96)
        assert np.isfinite(np.asarray(video)).all()
        assert float(video.min()) >= -1.0 and float(video.max()) <= 1.0

    def test_i2v_smoke(self):
        cfg, dit_params, vae_params, txt, neg = self._setup(i2v=True)
        image = jax.random.uniform(jax.random.PRNGKey(5), (1, 3, 64, 96)) * 2 - 1
        settings = SamplerSettings(num_inference_steps=2, sampler="ddim")
        video = sample_i2v(
            dit_params, vae_params, txt, neg, image, cfg, jax.random.PRNGKey(4),
            num_frames=9, settings=settings, attn_impl="xla", compute_dtype=jnp.float32,
        )
        assert video.shape == (1, 3, 9, 64, 96)
        assert np.isfinite(np.asarray(video)).all()

    def test_seed_determinism(self):
        cfg, dit_params, vae_params, txt, neg = self._setup()
        settings = SamplerSettings(num_inference_steps=2)
        shape = (1, 3, cfg.vae_latent_channels, 8, 12)
        l1 = denoise_loop(dit_params, txt, neg, jax.random.PRNGKey(7), cfg, settings,
                          shape, attn_impl="xla", compute_dtype=jnp.float32)
        l2 = denoise_loop(dit_params, txt, neg, jax.random.PRNGKey(7), cfg, settings,
                          shape, attn_impl="xla", compute_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


class TestConverterRoundTrip:
    def test_dit_export_import_identity(self):
        from videogpa_tpu.models.cogvideox.convert import convert_dit, export_dit

        cfg = CogVideoXConfig.tiny()
        params = dit_init(jax.random.PRNGKey(0), cfg)
        sd = export_dit(params, cfg)
        params2 = convert_dit(sd, cfg)
        flat1 = jax.tree_util.tree_leaves_with_path(params)
        flat2 = jax.tree_util.tree_leaves_with_path(params2)
        assert len(flat1) == len(flat2)
        for (p1, a), (p2, b) in zip(flat1, flat2):
            assert jax.tree_util.keystr(p1) == jax.tree_util.keystr(p2)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0, err_msg=str(p1))


class TestVAETiling:
    def test_tiled_matches_shapes_and_blends(self):
        from videogpa_tpu.models.cogvideox.vae import (
            vae_decode, vae_decode_tiled, vae_encode_tiled, vae_init,
        )

        cfg = CogVideoXConfig.tiny()
        params = vae_init(jax.random.PRNGKey(0), cfg)
        lat = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.vae_latent_channels, 2, 12, 16))
        full = vae_decode(params, lat, cfg)
        tiled = vae_decode_tiled(params, lat, cfg, tile_latent=8, overlap_latent=4)
        assert tiled.shape == full.shape
        assert np.isfinite(np.asarray(tiled)).all()
        # interiors of tiles far from seams should agree with the full decode
        # up to GroupNorm-statistics differences; sanity: correlation high
        a = np.asarray(full).ravel()
        b = np.asarray(tiled).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.5, corr

    def test_tiled_scan_matches_reference_blend(self):
        """The single-program lax.scan stitcher must reproduce the
        straightforward per-tile decode + host weighted blend exactly."""
        from videogpa_tpu.models.cogvideox.vae import (
            _ramp_1d_np, _tile_positions, vae_decode, vae_decode_tiled, vae_init,
        )

        cfg = CogVideoXConfig.tiny()
        params = vae_init(jax.random.PRNGKey(0), cfg)
        lat = jax.random.normal(
            jax.random.PRNGKey(1), (1, cfg.vae_latent_channels, 2, 12, 16)
        )
        th = tw = 8
        overlap = 4
        sc = cfg.spatial_compression_ratio
        got = np.asarray(
            vae_decode_tiled(params, lat, cfg, tile_latent=8, overlap_latent=4)
        )

        pos_h = _tile_positions(12, th, overlap)
        pos_w = _tile_positions(16, tw, overlap)
        acc = np.zeros(got.shape, np.float32)
        wacc = np.zeros(got.shape[-2:], np.float32)
        for hi, i0 in enumerate(pos_h):
            for wi, j0 in enumerate(pos_w):
                tile = np.asarray(
                    vae_decode(params, lat[:, :, :, i0 : i0 + th, j0 : j0 + tw], cfg)
                )
                wh = _ramp_1d_np(th * sc, hi == 0, hi == len(pos_h) - 1)
                ww = _ramp_1d_np(tw * sc, wi == 0, wi == len(pos_w) - 1)
                wmap = wh[:, None] * ww[None, :]
                oi, oj = i0 * sc, j0 * sc
                acc[..., oi : oi + th * sc, oj : oj + tw * sc] += tile * wmap
                wacc[oi : oi + th * sc, oj : oj + tw * sc] += wmap
        want = acc / np.maximum(wacc, 1e-8)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_tiled_encode_shape(self):
        from videogpa_tpu.models.cogvideox.vae import vae_encode_tiled, vae_init

        cfg = CogVideoXConfig.tiny()
        params = vae_init(jax.random.PRNGKey(0), cfg)
        vid = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 5, 96, 128))
        lat = vae_encode_tiled(params, vid, cfg, sample=False,
                               tile_pixels=64, overlap_pixels=32)
        assert lat.shape == (1, cfg.vae_latent_channels, 2, 12, 16)
        assert np.isfinite(np.asarray(lat)).all()
