"""Wan2.2 family tests: flow matching, DiT, VAE, pipeline, DPO step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videogpa_tpu.models.wan import (
    WanConfig,
    flow_add_noise,
    flow_velocity_target,
    sigma_from_timestep,
    ti2v_timestep_tokens,
    wan_forward,
    wan_init,
)
from videogpa_tpu.models.wan.pipeline import sample_ti2v, shifted_sigmas
from videogpa_tpu.models.wan.vae import wan_vae_decode, wan_vae_encode, wan_vae_init
from videogpa_tpu.train.lora import lora_init
from videogpa_tpu.train.trainer import TrainerConfig, init_train_state
from videogpa_tpu.train.wan_trainer import make_wan_dpo_train_step


class TestFlowMatch:
    def test_sigma_endpoints_and_shift(self):
        t = jnp.array([0, 500, 1000])
        s = sigma_from_timestep(t, 1000, shift=5.0)
        np.testing.assert_allclose(np.asarray(s), [0.0, 5 * 0.5 / 3.0, 1.0], atol=1e-6)

    def test_add_noise_and_velocity_consistency(self):
        """d z_sigma / d sigma must equal the velocity target eps - z0."""
        z0 = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 4))
        eps = jax.random.normal(jax.random.PRNGKey(1), z0.shape)
        s1, s2 = jnp.array([0.3]), jnp.array([0.4])
        z1 = flow_add_noise(z0, eps, s1)
        z2 = flow_add_noise(z0, eps, s2)
        v = flow_velocity_target(z0, eps)
        np.testing.assert_allclose(
            np.asarray((z2 - z1) / 0.1), np.asarray(v), atol=1e-5
        )

    def test_ti2v_tokens_first_frame_zero(self):
        t = jnp.array([700.0, 300.0])
        tok = ti2v_timestep_tokens(t, (3, 4, 4), (1, 2, 2))
        assert tok.shape == (2, 3 * 2 * 2)
        np.testing.assert_allclose(np.asarray(tok[0, :4]), 0.0)
        np.testing.assert_allclose(np.asarray(tok[0, 4:]), 700.0)
        np.testing.assert_allclose(np.asarray(tok[1, 4:]), 300.0)


class TestWanDiT:
    def test_shapes_scalar_and_per_token_t(self):
        cfg = WanConfig.tiny()
        params = wan_init(jax.random.PRNGKey(0), cfg)
        B, F, H, W = 2, 3, 8, 8
        x = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.in_channels, F, H, W))
        ctx = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.text_len, cfg.text_dim))
        t = jnp.array([500.0, 100.0])
        out = wan_forward(params, x, t, ctx, cfg, attn_impl="xla", compute_dtype=jnp.float32)
        assert out.shape == (B, cfg.out_channels, F, H, W)
        assert np.isfinite(np.asarray(out)).all()

        t_tok = ti2v_timestep_tokens(t, (F, H, W), cfg.patch_size)
        out2 = wan_forward(params, x, t_tok, ctx, cfg, attn_impl="xla", compute_dtype=jnp.float32)
        assert out2.shape == out.shape
        assert not np.allclose(np.asarray(out), np.asarray(out2))

    def test_rope_axis_dims_sum(self):
        cfg = WanConfig.ti2v_5b()
        assert sum(cfg.rope_axis_dims) == cfg.head_dim
        assert all(d % 2 == 0 for d in cfg.rope_axis_dims)


class TestWanVAE:
    @pytest.mark.slow
    def test_roundtrip_shapes(self):
        cfg = WanConfig.tiny()
        params = wan_vae_init(jax.random.PRNGKey(0), cfg)
        vid = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 9, 64, 64))
        lat = wan_vae_encode(params, vid, cfg, key=jax.random.PRNGKey(2))
        assert lat.shape == (1, cfg.vae_z_dim, 3, 4, 4)  # (4,16,16) compression
        rec = wan_vae_decode(params, lat, cfg)
        assert rec.shape == vid.shape
        assert np.isfinite(np.asarray(rec)).all()


class TestWanPipeline:
    def test_sigma_grid(self):
        s = np.asarray(shifted_sigmas(10, 5.0))
        assert s[0] == 1.0 and abs(s[-1]) < 1e-7
        assert (np.diff(s) < 0).all()

    def test_ti2v_smoke(self):
        cfg = WanConfig.tiny()
        dit_params = wan_init(jax.random.PRNGKey(0), cfg)
        vae_params = wan_vae_init(jax.random.PRNGKey(1), cfg)
        ctx = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.text_len, cfg.text_dim))
        image = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 64, 64)) * 2 - 1
        video = sample_ti2v(
            dit_params, vae_params, ctx, jnp.zeros_like(ctx), cfg,
            jax.random.PRNGKey(4), image=image, num_frames=9,
            height=64, width=64, num_steps=2,
            attn_impl="xla", compute_dtype=jnp.float32,
        )
        assert video.shape == (1, 3, 9, 64, 64)
        assert np.isfinite(np.asarray(video)).all()


class TestWanDPOStep:
    def test_step_runs(self):
        cfg = WanConfig.tiny()
        base = wan_init(jax.random.PRNGKey(0), cfg)
        tcfg = TrainerConfig(
            learning_rate=1e-3, beta=1.0, warmup_steps=2, max_steps=10,
            lora_rank=4, lora_alpha=8.0, compute_dtype=jnp.float32,
            remat=False, attn_impl="xla",
        )
        lora = lora_init(jax.random.PRNGKey(1), cfg.num_layers, cfg.dim, rank=4)
        state = init_train_state(lora, tcfg)
        train_step, eval_step = make_wan_dpo_train_step(base, cfg, tcfg)

        rng = np.random.default_rng(0)
        B, C, F, H, W = 2, cfg.in_channels, 3, 8, 8
        batch = {
            "x_win": jnp.asarray(rng.standard_normal((B, C, F, H, W)), jnp.float32),
            "x_lose": jnp.asarray(rng.standard_normal((B, C, F, H, W)), jnp.float32),
            "prompt_emb": jnp.asarray(
                rng.standard_normal((B, cfg.text_len, cfg.text_dim)), jnp.float32
            ),
            "image_latent": jnp.asarray(
                rng.standard_normal((B, C, 1, H, W)), jnp.float32
            ),
        }
        state, metrics = train_step(state, batch, jax.random.PRNGKey(5))
        # at LoRA zero-init policy == reference -> exact log(2)
        np.testing.assert_allclose(float(metrics["loss"]), np.log(2.0), atol=1e-5)
        state, metrics = train_step(state, batch, jax.random.PRNGKey(5))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 2


class TestWanSolvers:
    def test_heun_matches_euler_on_linear_field(self):
        """On a constant/linear velocity field both solvers integrate the
        flow exactly, and Heun's trapezoidal correction is exercised."""
        import dataclasses

        cfg = WanConfig.tiny()
        dit_params = wan_init(jax.random.PRNGKey(0), cfg)
        vae_params = wan_vae_init(jax.random.PRNGKey(1), cfg)
        ctx = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.text_len, cfg.text_dim))
        kwargs = dict(num_frames=5, height=32, width=32, num_steps=3)
        outs = {}
        for solver in ("euler", "heun", "unipc"):
            outs[solver] = sample_ti2v(
                dit_params, vae_params, ctx, jnp.zeros_like(ctx), cfg,
                jax.random.PRNGKey(4), solver=solver, **kwargs,
            )
        for solver, v in outs.items():
            assert np.isfinite(np.asarray(v)).all(), solver
            assert v.shape == (1, 3, 5, 32, 32)
        # different integrators, same ODE: outputs correlated but not equal
        a = np.asarray(outs["euler"]).ravel()
        b = np.asarray(outs["heun"]).ravel()
        assert not np.allclose(a, b)

    def _ref_unipc(self, x, num_steps, shift, v_fn, order=2):
        """Independent numpy transcription of the stateful UniPC algorithm
        (diffusers UniPCMultistepScheduler / Wan fm_solvers_unipc: bh2,
        predict_x0, lower_order_final, flow matching alpha_t = 1 - sigma_t),
        with general R-matrix solves — used as the oracle for the
        closed-form coefficient tables in videogpa_tpu.models.wan.pipeline.
        """
        s = np.linspace(1.0, 0.0, num_steps + 1)
        sig = shift * s / (1 + (shift - 1) * s)
        with np.errstate(divide="ignore"):
            lam = np.log((1.0 - sig) / sig)

        def bh_terms(h, p, rks):
            hh = -h
            h_phi_1 = np.expm1(hh)
            h_phi_k = h_phi_1 / hh - 1.0
            B_h = np.expm1(hh)
            R, b, fac = [], [], 1
            for k in range(1, p + 1):
                R.append(np.asarray(rks) ** (k - 1))
                b.append(h_phi_k * fac / B_h)
                fac *= k + 1
                h_phi_k = h_phi_k / hh - 1.0 / fac
            return h_phi_1, B_h, np.asarray(R), np.asarray(b)

        mh, th = [], []  # x0-prediction history, newest last
        last_sample, this_order_prev, lon = None, None, 0
        for i in range(num_steps):
            m = x - sig[i] * v_fn(x, sig[i])
            if i > 0:  # corrector (order = previous step's predictor order)
                p = this_order_prev
                s0, t = i - 1, i
                h = lam[t] - lam[s0]
                rks, D1s = [], []
                for k in range(1, p):
                    si = th[-(k + 1)]
                    rk = (lam[si] - lam[s0]) / h
                    rks.append(rk)
                    D1s.append((mh[-(k + 1)] - mh[-1]) / rk)
                rks.append(1.0)
                h_phi_1, B_h, R, b = bh_terms(h, p, rks)
                rhos_c = (np.array([0.5]) if p == 1 else np.linalg.solve(R, b))
                x_t_ = sig[t] / sig[s0] * last_sample - (1 - sig[t]) * h_phi_1 * mh[-1]
                corr = sum(rhos_c[k] * D1s[k] for k in range(p - 1))
                x = x_t_ - (1 - sig[t]) * B_h * (corr + rhos_c[-1] * (m - mh[-1]))
            mh.append(m)
            th.append(i)
            if len(mh) > order:
                mh.pop(0)
                th.pop(0)
            p = min(order, num_steps - i, lon + 1)
            last_sample = x
            # predictor
            s0, t = i, i + 1
            h = lam[t] - lam[s0]
            rks, D1s = [], []
            for k in range(1, p):
                si = th[-(k + 1)]
                rk = (lam[si] - lam[s0]) / h
                rks.append(rk)
                D1s.append((mh[-(k + 1)] - mh[-1]) / rk)
            rks.append(1.0)
            h_phi_1, B_h, R, b = bh_terms(h, p, rks)
            x = sig[t] / sig[s0] * x - (1 - sig[t]) * h_phi_1 * mh[-1]
            if p > 1:
                rhos_p = (np.array([0.5]) if p == 2
                          else np.linalg.solve(R[:-1, :-1], b[:-1]))
                x = x - (1 - sig[t]) * B_h * sum(
                    rhos_p[k] * D1s[k] for k in range(p - 1)
                )
            lon = min(lon + 1, order)
            this_order_prev = p
        return x

    def test_unipc_matches_stateful_reference(self):
        """The trace-time coefficient tables + fori_loop reproduce the
        reference's stateful predictor-corrector recursion exactly."""
        from videogpa_tpu.models.wan.pipeline import unipc_loop

        def v_np(x, s):
            return -(1.0 + s) * x + np.sin(3.0 * s) + 0.1 * np.tanh(x)

        def v_jx(x, s):
            return -(1.0 + s) * x + jnp.sin(3.0 * s) + 0.1 * jnp.tanh(x)

        x0 = np.linspace(-2.0, 2.0, 8)
        for num_steps in (1, 2, 3, 8, 17):
            ref = self._ref_unipc(x0.copy(), num_steps, 5.0, v_np)
            got = jax.jit(
                lambda z: unipc_loop(v_jx, z, num_steps, 5.0)
            )(jnp.asarray(x0, jnp.float32))
            np.testing.assert_allclose(
                np.asarray(got), ref, rtol=2e-5, atol=2e-5,
                err_msg=f"num_steps={num_steps}",
            )

    def test_unipc_beats_euler_accuracy(self):
        """At equal model-eval budget UniPC lands much closer to the true
        flow than Euler (the reason the reference defaults to it)."""
        from videogpa_tpu.models.wan.pipeline import unipc_loop, shifted_sigmas

        def v_jx(x, s):
            return -(1.0 + s) * x + jnp.sin(3.0 * s) + 0.1 * jnp.tanh(x)

        x0 = jnp.linspace(-2.0, 2.0, 8)

        def euler(z, n):
            sig = shifted_sigmas(n, 5.0)
            for i in range(n):
                z = z + (sig[i + 1] - sig[i]) * v_jx(z, sig[i])
            return z

        truth = np.asarray(euler(x0, 4000))
        for n, max_ratio in ((8, 0.55), (16, 0.35)):
            e_err = np.abs(np.asarray(euler(x0, n)) - truth).max()
            u_err = np.abs(np.asarray(unipc_loop(v_jx, x0, n, 5.0))
                           - truth).max()
            assert u_err < max_ratio * e_err, (n, u_err, e_err)

    def test_unknown_solver_raises(self):
        cfg = WanConfig.tiny()
        with pytest.raises(ValueError):
            from videogpa_tpu.models.wan.pipeline import wan_denoise_loop
            wan_denoise_loop(
                None, jnp.zeros((1, cfg.text_len, cfg.text_dim)),
                jnp.zeros((1, cfg.text_len, cfg.text_dim)),
                jax.random.PRNGKey(0), cfg, (1, cfg.vae_z_dim, 2, 2, 2),
                solver="bogus",
            )
