"""CogVideoX parity vs a hand-ported torch oracle of the diffusers internals.

diffusers is not installed in this environment, so — like the Wan VAE oracle
— the reference semantics (diffusers ``CogVideoXTransformer3DModel``,
``CogVideoXDDIMScheduler``/``CogVideoXDPMScheduler``, the 3D RoPE and sincos
position embeddings; the models the reference loads at
``train/CogVideoX-I2V-5B/03_train.py:94-111`` and samples in
``generate/CogVideoX-5B.py``) are re-implemented here in torch with the
exact diffusers module tree and key names. These tests therefore pin down
BOTH the math of videogpa_tpu.models.cogvideox and convert_dit's key mapping.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from videogpa_tpu.models.cogvideox.config import CogVideoXConfig  # noqa: E402
from videogpa_tpu.models.cogvideox.convert import convert_dit  # noqa: E402
from videogpa_tpu.models.cogvideox.dit import (  # noqa: E402
    dit_forward,
    sincos_pos_embed_3d,
    timestep_embedding,
)
from videogpa_tpu.models.cogvideox.scheduler import CogVideoXScheduler  # noqa: E402


# ---------------------------------------------------------------------------
# diffusers embedding math (numpy ports)
# ---------------------------------------------------------------------------


def get_timestep_embedding_torch(timesteps, dim):
    """diffusers get_timestep_embedding(flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    exponent = -math.log(10000) * torch.arange(half, dtype=torch.float32) / half
    emb = timesteps.float()[:, None] * exponent.exp()[None]
    return torch.cat([emb.cos(), emb.sin()], dim=-1)


def get_1d_sincos(embed_dim, pos):
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_3d_sincos_pos_embed(embed_dim, spatial_size, temporal_size,
                            spatial_scale=1.875, temporal_scale=1.0):
    """diffusers get_3d_sincos_pos_embed; spatial_size = (width, height)."""
    dim_spatial = 3 * embed_dim // 4
    dim_temporal = embed_dim // 4
    grid_h = np.arange(spatial_size[1], dtype=np.float32) / spatial_scale
    grid_w = np.arange(spatial_size[0], dtype=np.float32) / spatial_scale
    grid = np.meshgrid(grid_w, grid_h)  # w first (the MAE-inherited quirk)
    grid = np.stack(grid, axis=0).reshape([2, 1, spatial_size[1], spatial_size[0]])
    emb_h = get_1d_sincos(dim_spatial // 2, grid[0])
    emb_w = get_1d_sincos(dim_spatial // 2, grid[1])
    spatial = np.concatenate([emb_h, emb_w], axis=1)  # (H*W, dim_spatial)
    t = get_1d_sincos(dim_temporal, np.arange(temporal_size) / temporal_scale)
    spatial = np.tile(spatial[np.newaxis], (temporal_size, 1, 1))
    t = np.tile(t[:, np.newaxis], (1, spatial_size[0] * spatial_size[1], 1))
    return np.concatenate([t, spatial], axis=-1).reshape(-1, embed_dim)


def get_3d_rotary_pos_embed(embed_dim, grid_t, grid_h, grid_w, theta=10000.0):
    """diffusers get_3d_rotary_pos_embed (use_real, repeat_interleave_real)."""
    def rot1d(dim, pos):
        inv = 1.0 / theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
        freqs = np.outer(pos, inv)
        cos = np.repeat(np.cos(freqs), 2, axis=1)
        sin = np.repeat(np.sin(freqs), 2, axis=1)
        return cos, sin

    dim_t, dim_h, dim_w = embed_dim // 4, embed_dim // 8 * 3, embed_dim // 8 * 3
    cos_t, sin_t = rot1d(dim_t, np.arange(grid_t))
    cos_h, sin_h = rot1d(dim_h, np.arange(grid_h))
    cos_w, sin_w = rot1d(dim_w, np.arange(grid_w))

    def combine(ft, fh, fw):
        full = np.concatenate(
            [
                np.broadcast_to(ft[:, None, None, :], (grid_t, grid_h, grid_w, dim_t)),
                np.broadcast_to(fh[None, :, None, :], (grid_t, grid_h, grid_w, dim_h)),
                np.broadcast_to(fw[None, None, :, :], (grid_t, grid_h, grid_w, dim_w)),
            ],
            axis=-1,
        )
        return full.reshape(-1, embed_dim)

    return combine(cos_t, cos_h, cos_w), combine(sin_t, sin_h, sin_w)


def apply_rotary_emb_torch(x, cos, sin):
    """diffusers apply_rotary_emb(use_real=True, use_real_unbind_dim=-1).
    x: (B, H, N, D); cos/sin: (N, D)."""
    cos = torch.from_numpy(cos).float()[None, None]
    sin = torch.from_numpy(sin).float()[None, None]
    x1, x2 = x.reshape(*x.shape[:-1], -1, 2).unbind(-1)
    x_rot = torch.stack([-x2, x1], dim=-1).flatten(-2)
    return x.float() * cos + x_rot.float() * sin


# ---------------------------------------------------------------------------
# Torch oracle of CogVideoXTransformer3DModel (diffusers key names)
# ---------------------------------------------------------------------------


class LayerNormZero(nn.Module):
    def __init__(self, cond_dim, dim):
        super().__init__()
        self.silu = nn.SiLU()
        self.linear = nn.Linear(cond_dim, 6 * dim)
        self.norm = nn.LayerNorm(dim, eps=1e-5)

    def forward(self, hidden, encoder, temb):
        shift, scale, gate, e_shift, e_scale, e_gate = self.linear(
            self.silu(temb)
        ).chunk(6, dim=1)
        hidden = self.norm(hidden) * (1 + scale)[:, None] + shift[:, None]
        encoder = self.norm(encoder) * (1 + e_scale)[:, None] + e_shift[:, None]
        return hidden, encoder, gate[:, None], e_gate[:, None]


class OracleAttention(nn.Module):
    def __init__(self, dim, heads, head_dim):
        super().__init__()
        self.heads, self.head_dim = heads, head_dim
        self.norm_q = nn.LayerNorm(head_dim, eps=1e-6)
        self.norm_k = nn.LayerNorm(head_dim, eps=1e-6)
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim), nn.Dropout(0.0)])

    def forward(self, hidden, encoder, rope):
        text_len = encoder.shape[1]
        x = torch.cat([encoder, hidden], dim=1)
        B, N, _ = x.shape

        def heads(y):
            return y.view(B, N, self.heads, self.head_dim).transpose(1, 2)

        q, k, v = heads(self.to_q(x)), heads(self.to_k(x)), heads(self.to_v(x))
        q, k = self.norm_q(q), self.norm_k(k)
        if rope is not None:
            cos, sin = rope
            q = torch.cat(
                [q[:, :, :text_len], apply_rotary_emb_torch(q[:, :, text_len:], cos, sin)],
                dim=2,
            )
            k = torch.cat(
                [k[:, :, :text_len], apply_rotary_emb_torch(k[:, :, text_len:], cos, sin)],
                dim=2,
            )
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(B, N, -1)
        o = self.to_out[0](o)
        return o[:, text_len:], o[:, :text_len]


class OracleBlock(nn.Module):
    def __init__(self, dim, heads, head_dim, cond_dim):
        super().__init__()
        self.norm1 = LayerNormZero(cond_dim, dim)
        self.attn1 = OracleAttention(dim, heads, head_dim)
        self.norm2 = LayerNormZero(cond_dim, dim)
        self.ff = nn.ModuleDict(
            {
                "net": nn.ModuleList(
                    [
                        nn.ModuleDict({"proj": nn.Linear(dim, 4 * dim)}),
                        nn.Dropout(0.0),
                        nn.Linear(4 * dim, dim),
                    ]
                )
            }
        )

    def ff_forward(self, x):
        x = F.gelu(self.ff["net"][0]["proj"](x), approximate="tanh")
        return self.ff["net"][2](x)

    def forward(self, hidden, encoder, temb, rope):
        text_len = encoder.shape[1]
        h_n, e_n, gate, e_gate = self.norm1(hidden, encoder, temb)
        attn_h, attn_e = self.attn1(h_n, e_n, rope)
        hidden = hidden + gate * attn_h
        encoder = encoder + e_gate * attn_e
        h_n, e_n, gate, e_gate = self.norm2(hidden, encoder, temb)
        ff = self.ff_forward(torch.cat([e_n, h_n], dim=1))
        hidden = hidden + gate * ff[:, text_len:]
        encoder = encoder + e_gate * ff[:, :text_len]
        return hidden, encoder


class OracleDiT(nn.Module):
    """CogVideoXTransformer3DModel with diffusers parameter names."""

    def __init__(self, cfg: CogVideoXConfig):
        super().__init__()
        self.cfg = cfg
        dim = cfg.hidden_dim
        self.patch_embed = nn.ModuleDict(
            {
                "proj": (
                    nn.Conv2d(cfg.in_channels, dim, cfg.patch_size, cfg.patch_size)
                    if cfg.patch_size_t is None
                    else nn.Linear(
                        cfg.in_channels * cfg.patch_size_t * cfg.patch_size**2, dim
                    )
                ),
                "text_proj": nn.Linear(cfg.text_embed_dim, dim),
            }
        )
        self.time_embedding = nn.ModuleDict(
            {
                "linear_1": nn.Linear(dim, cfg.time_embed_dim),
                "linear_2": nn.Linear(cfg.time_embed_dim, cfg.time_embed_dim),
            }
        )
        self.transformer_blocks = nn.ModuleList(
            [
                OracleBlock(dim, cfg.num_heads, cfg.head_dim, cfg.time_embed_dim)
                for _ in range(cfg.num_layers)
            ]
        )
        self.norm_final = nn.LayerNorm(dim, eps=1e-5)
        self.norm_out = nn.ModuleDict(
            {
                "linear": nn.Linear(cfg.time_embed_dim, 2 * dim),
                "norm": nn.LayerNorm(dim, eps=1e-5),
            }
        )
        self.proj_out = nn.Linear(
            dim, (cfg.patch_size_t or 1) * cfg.patch_size**2 * cfg.out_channels
        )

    @torch.no_grad()
    def forward(self, hidden_states, encoder_hidden_states, timestep):
        cfg = self.cfg
        B, Fn, C, H, W = hidden_states.shape
        p, pt, dim = cfg.patch_size, cfg.patch_size_t, cfg.hidden_dim

        t_emb = get_timestep_embedding_torch(timestep, dim)
        temb = self.time_embedding["linear_2"](
            F.silu(self.time_embedding["linear_1"](t_emb))
        )
        encoder = self.patch_embed["text_proj"](encoder_hidden_states)

        if pt is None:
            x = self.patch_embed["proj"](hidden_states.reshape(B * Fn, C, H, W))
            x = x.reshape(B, Fn, dim, -1).permute(0, 1, 3, 2).reshape(B, -1, dim)
            gt, gh, gw = Fn, H // p, W // p
        else:
            gt, gh, gw = Fn // pt, H // p, W // p
            x = hidden_states.reshape(B, gt, pt, C, gh, p, gw, p)
            x = x.permute(0, 1, 4, 6, 2, 3, 5, 7).reshape(
                B, gt * gh * gw, pt * C * p * p
            )
            x = self.patch_embed["proj"](x)

        rope = None
        if cfg.use_rotary_positional_embeddings:
            rope = get_3d_rotary_pos_embed(cfg.head_dim, gt, gh, gw)

        for blk in self.transformer_blocks:
            x, encoder = blk(x, encoder, temb, rope)

        joint = self.norm_final(torch.cat([encoder, x], dim=1))
        x = joint[:, encoder.shape[1] :]
        shift, scale = self.norm_out["linear"](F.silu(temb)).chunk(2, dim=1)
        x = self.norm_out["norm"](x) * (1 + scale)[:, None] + shift[:, None]
        x = self.proj_out(x)

        if pt is None:
            x = x.reshape(B, Fn, gh, gw, cfg.out_channels, p, p)
            x = x.permute(0, 1, 4, 2, 5, 3, 6).reshape(
                B, Fn, cfg.out_channels, gh * p, gw * p
            )
        else:
            x = x.reshape(B, gt, gh, gw, pt, cfg.out_channels, p, p)
            x = x.permute(0, 1, 4, 5, 2, 6, 3, 7).reshape(
                B, Fn, cfg.out_channels, gh * p, gw * p
            )
        return x


# ---------------------------------------------------------------------------
# Torch oracle of the CogVideoX schedulers
# ---------------------------------------------------------------------------


def oracle_alphas_cumprod(n=1000, beta_start=0.00085, beta_end=0.012, snr_shift=3.0):
    betas = torch.linspace(beta_start**0.5, beta_end**0.5, n) ** 2
    ac = torch.cumprod(1.0 - betas, dim=0)
    ac = ac / (snr_shift + (1 - snr_shift) * ac)
    # rescale_zero_terminal_snr
    s = ac.sqrt()
    s0, sT = s[0].clone(), s[-1].clone()
    s = (s - sT) * s0 / (s0 - sT)
    return s**2


def oracle_ddim_step(ac, final_ac, v, t, t_prev, sample):
    ac_t = ac[t]
    ac_prev = ac[t_prev] if t_prev >= 0 else final_ac
    x0 = ac_t**0.5 * sample - (1 - ac_t) ** 0.5 * v
    a_t = ((1 - ac_prev) / (1 - ac_t)) ** 0.5
    b_t = ac_prev**0.5 - ac_t**0.5 * a_t
    return a_t * sample + b_t * x0


def oracle_dpm_step(ac, final_ac, v, old_x0, t, t_back, sample, noise):
    """diffusers CogVideoXDPMScheduler.step (v-prediction, SDE DPM++)."""
    num_train, num_inf = 1000, 10
    t_prev = t - num_train // num_inf
    ac_t = ac[t]
    ac_prev = ac[t_prev] if t_prev >= 0 else final_ac
    x0 = ac_t**0.5 * sample - (1 - ac_t) ** 0.5 * v

    lamb = ((ac_t / (1 - ac_t)) ** 0.5).log()
    lamb_next = ((ac_prev / (1 - ac_prev)) ** 0.5).log()
    h = lamb_next - lamb
    mult1 = ((1 - ac_prev) / (1 - ac_t)) ** 0.5 * (-h).exp()
    mult2 = (-2 * h).expm1() * ac_prev**0.5
    mult_noise = (1 - ac_prev) ** 0.5 * (1 - (-2 * h).exp()) ** 0.5

    prev = mult1 * sample - mult2 * x0 + mult_noise * noise
    if old_x0 is None or t_prev < 0:
        return prev, x0
    ac_back = ac[t_back]
    lamb_prev = ((ac_back / (1 - ac_back)) ** 0.5).log()
    r = (lamb - lamb_prev) / h
    mult3, mult4 = 1 + 1 / (2 * r), 1 / (2 * r)
    denoised_d = mult3 * x0 - mult4 * old_x0
    return mult1 * sample - mult2 * denoised_d + mult_noise * noise, x0


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


class TestEmbeddings:
    def test_timestep_embedding(self):
        t = torch.tensor([0.0, 1.0, 500.0, 999.0])
        want = get_timestep_embedding_torch(t, 64).numpy()
        got = np.asarray(timestep_embedding(jnp.asarray(t.numpy()), 64))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_3d_sincos_pos_embed(self):
        # non-square grid exposes the h/w ordering (spatial_size = (W, H))
        want = get_3d_sincos_pos_embed(64, (6, 4), 3)
        got = np.asarray(sincos_pos_embed_3d(64, 3, 4, 6))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_3d_rope_tables(self):
        from videogpa_tpu.ops.rope import rope_3d_freqs

        cos_w, sin_w = get_3d_rotary_pos_embed(16, 3, 4, 6)
        cos_g, sin_g = rope_3d_freqs((3, 4, 6), 16)
        np.testing.assert_allclose(np.asarray(cos_g), cos_w, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sin_g), sin_w, atol=1e-6)

    def test_rope_application(self):
        from videogpa_tpu.ops.rope import apply_rope_interleaved, rope_3d_freqs

        x = torch.randn(1, 2, 72, 16)
        cos_w, sin_w = get_3d_rotary_pos_embed(16, 3, 4, 6)
        want = apply_rotary_emb_torch(x, cos_w, sin_w).numpy()
        cos_g, sin_g = rope_3d_freqs((3, 4, 6), 16)
        got = np.asarray(
            apply_rope_interleaved(jnp.asarray(x.numpy()), cos_g, sin_g)
        )
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestDiTParity:
    @pytest.mark.parametrize("variant", ["rope", "v1_5"])
    def test_full_forward_matches_torch(self, variant):
        torch.manual_seed(0)
        cfg = CogVideoXConfig.tiny()
        if variant == "v1_5":
            import dataclasses

            cfg = dataclasses.replace(cfg, patch_size_t=2, sample_frames=4)
        oracle = OracleDiT(cfg).eval()
        sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
        params = convert_dit(sd, cfg)

        B, Fn = 2, 4 if variant == "v1_5" else 3
        x = torch.randn(B, Fn, cfg.in_channels, cfg.sample_height, cfg.sample_width)
        txt = torch.randn(B, cfg.max_text_seq_length, cfg.text_embed_dim)
        t = torch.tensor([100.0, 900.0])

        want = oracle(x, txt, t).numpy()
        got = np.asarray(
            dit_forward(
                params,
                jnp.asarray(x.numpy()),
                jnp.asarray(txt.numpy()),
                jnp.asarray(t.numpy()),
                cfg,
                attn_impl="xla",
                compute_dtype=jnp.float32,
            )
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


class TestSchedulerParity:
    def setup_method(self):
        self.s = CogVideoXScheduler()
        self.ac = oracle_alphas_cumprod()

    def test_alphas_cumprod(self):
        np.testing.assert_allclose(
            np.asarray(self.s.alphas_cumprod), self.ac.numpy(), atol=1e-6
        )

    def test_add_noise_and_velocity(self):
        torch.manual_seed(1)
        x = torch.randn(2, 3, 4)
        n = torch.randn(2, 3, 4)
        ts = torch.tensor([17, 700])
        ac = self.ac[ts].reshape(-1, 1, 1)
        want_noisy = ac.sqrt() * x + (1 - ac).sqrt() * n
        want_v = ac.sqrt() * n - (1 - ac).sqrt() * x
        got_noisy = self.s.add_noise(
            jnp.asarray(x.numpy()), jnp.asarray(n.numpy()), jnp.asarray(ts.numpy())
        )
        got_v = self.s.get_velocity(
            jnp.asarray(x.numpy()), jnp.asarray(n.numpy()), jnp.asarray(ts.numpy())
        )
        np.testing.assert_allclose(np.asarray(got_noisy), want_noisy.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_v), want_v.numpy(), atol=1e-6)

    def test_trailing_timesteps(self):
        # diffusers set_timesteps(timestep_spacing="trailing")
        num_inf = 10
        step = 1000 / num_inf
        want = (np.round(np.arange(1000, 0, -step)) - 1).astype(np.int64)
        np.testing.assert_array_equal(self.s.timesteps(num_inf), want)

    def test_ddim_trajectory(self):
        torch.manual_seed(2)
        sample = torch.randn(1, 2, 4, 4)
        final_ac = self.ac[0]
        ts = self.s.timesteps(10)
        lat_t = sample.clone()
        lat_j = jnp.asarray(sample.numpy())
        for i, t in enumerate(ts):
            t_prev = int(ts[i + 1]) if i + 1 < len(ts) else -1
            v = torch.randn(1, 2, 4, 4)
            lat_t = oracle_ddim_step(self.ac, final_ac, v, int(t), t_prev, lat_t)
            lat_j = self.s.ddim_step(jnp.asarray(v.numpy()), int(t), t_prev, lat_j)
        np.testing.assert_allclose(np.asarray(lat_j), lat_t.numpy(), atol=1e-4)

    def test_dpm_sde_trajectory(self):
        """Full 10-step trajectory with identical injected noise: the SDE
        DPM++ update, the 2nd-order correction, and the first/last-step
        fallbacks must all match the diffusers formulas."""
        torch.manual_seed(3)
        sample = torch.randn(1, 2, 4, 4)
        final_ac = self.ac[0]
        ts = self.s.timesteps(10)
        lat_t = sample.clone()
        lat_j = jnp.asarray(sample.numpy())
        old_x0_t, old_x0_j = None, None
        for i, t in enumerate(ts):
            t_prev = int(ts[i + 1]) if i + 1 < len(ts) else -1
            t_back = int(ts[i - 1]) if i > 0 else None
            v = torch.randn(1, 2, 4, 4)
            noise = torch.randn(1, 2, 4, 4)
            lat_t, x0_t = oracle_dpm_step(
                self.ac, final_ac, v, old_x0_t, int(t), t_back, lat_t, noise
            )
            old_x0_t = x0_t
            p1, p2, x0_j = self.s.dpm_step(
                jnp.asarray(v.numpy()), int(t), t_prev, lat_j,
                jnp.asarray(noise.numpy()),
                old_x0=old_x0_j, timestep_back=t_back if t_back is not None else 0,
            )
            lat_j = p2 if (i > 0 and t_prev >= 0) else p1
            old_x0_j = x0_j
            np.testing.assert_allclose(
                np.asarray(lat_j), lat_t.numpy(), atol=2e-4, rtol=1e-4,
            )
