"""Wan2.2 DiT parity vs a torch oracle of the public WanModel.

Like the Wan VAE / CogVideoX oracles: the Wan2.2 repo is an external
dependency of the reference (``train/Wan2.2-TI2V-5B/03_train.py:139-160``
LoRA-trains ``WanModel``), not vendored, so its semantics are re-implemented
here in torch with the exact module tree and key names
(``wan/modules/model.py``): full-dim qk RMSNorm before the head split,
complex-pair 3D RoPE with the (d-4(d//6), 2(d//6), 2(d//6)) axis split,
per-block learned modulation added to the (per-token, for TI2V) time
projection, affine norm3 before cross attention, and the modulated head.
These tests pin both videogpa_tpu.models.wan.dit and convert_wan.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from videogpa_tpu.models.wan.config import WanConfig  # noqa: E402
from videogpa_tpu.models.wan.convert import convert_wan  # noqa: E402
from videogpa_tpu.models.wan.dit import wan_forward  # noqa: E402


def sinusoidal_embedding_1d(dim, position):
    half = dim // 2
    sinusoid = torch.outer(
        position.float(), torch.pow(10000, -torch.arange(half).float().div(half))
    )
    return torch.cat([torch.cos(sinusoid), torch.sin(sinusoid)], dim=1)


def rope_params(max_seq_len, dim, theta=10000):
    freqs = torch.outer(
        torch.arange(max_seq_len).float(),
        1.0 / torch.pow(theta, torch.arange(0, dim, 2).float().div(dim)),
    )
    return torch.polar(torch.ones_like(freqs), freqs)  # complex64


def rope_apply(x, grid_sizes, freqs):
    """x: (B, L, H, D); complex-pair rotation with per-axis freq split."""
    n, c = x.size(2), x.size(3) // 2
    freqs = freqs.split([c - 2 * (c // 3), c // 3, c // 3], dim=1)
    out = []
    for i, (f, h, w) in enumerate(grid_sizes):
        s = f * h * w
        x_i = torch.view_as_complex(
            x[i, :s].to(torch.float64).reshape(s, n, -1, 2)
        )
        freqs_i = torch.cat(
            [
                freqs[0][:f].view(f, 1, 1, -1).expand(f, h, w, -1),
                freqs[1][:h].view(1, h, 1, -1).expand(f, h, w, -1),
                freqs[2][:w].view(1, 1, w, -1).expand(f, h, w, -1),
            ],
            dim=-1,
        ).reshape(s, 1, -1)
        x_i = torch.view_as_real(x_i * freqs_i).flatten(2)
        out.append(x_i)
    return torch.stack(out).float()


class WanRMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        xf = x.float()
        return (xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + self.eps)).type_as(
            x
        ) * self.weight


class WanLayerNorm(nn.LayerNorm):
    def __init__(self, dim, eps=1e-6, elementwise_affine=False):
        super().__init__(dim, elementwise_affine=elementwise_affine, eps=eps)


class WanSelfAttention(nn.Module):
    def __init__(self, dim, num_heads, eps=1e-6):
        super().__init__()
        self.dim, self.num_heads, self.head_dim = dim, num_heads, dim // num_heads
        self.q = nn.Linear(dim, dim)
        self.k = nn.Linear(dim, dim)
        self.v = nn.Linear(dim, dim)
        self.o = nn.Linear(dim, dim)
        self.norm_q = WanRMSNorm(dim, eps)
        self.norm_k = WanRMSNorm(dim, eps)

    def forward(self, x, grid_sizes, freqs):
        b, s, n, d = *x.shape[:2], self.num_heads, self.head_dim
        q = self.norm_q(self.q(x)).view(b, s, n, d)
        k = self.norm_k(self.k(x)).view(b, s, n, d)
        v = self.v(x).view(b, s, n, d)
        q = rope_apply(q, grid_sizes, freqs)
        k = rope_apply(k, grid_sizes, freqs)
        out = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
        )
        return self.o(out.transpose(1, 2).flatten(2))


class WanCrossAttention(nn.Module):
    def __init__(self, dim, num_heads, eps=1e-6):
        super().__init__()
        self.num_heads, self.head_dim = num_heads, dim // num_heads
        self.q = nn.Linear(dim, dim)
        self.k = nn.Linear(dim, dim)
        self.v = nn.Linear(dim, dim)
        self.o = nn.Linear(dim, dim)
        self.norm_q = WanRMSNorm(dim, eps)
        self.norm_k = WanRMSNorm(dim, eps)

    def forward(self, x, context):
        b, n, d = x.size(0), self.num_heads, self.head_dim
        q = self.norm_q(self.q(x)).view(b, -1, n, d)
        k = self.norm_k(self.k(context)).view(b, -1, n, d)
        v = self.v(context).view(b, -1, n, d)
        out = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
        )
        return self.o(out.transpose(1, 2).flatten(2))


class WanAttentionBlock(nn.Module):
    def __init__(self, dim, ffn_dim, num_heads, eps=1e-6):
        super().__init__()
        self.dim = dim
        self.norm1 = WanLayerNorm(dim, eps)
        self.self_attn = WanSelfAttention(dim, num_heads, eps)
        self.norm3 = WanLayerNorm(dim, eps, elementwise_affine=True)
        self.cross_attn = WanCrossAttention(dim, num_heads, eps)
        self.norm2 = WanLayerNorm(dim, eps)
        self.ffn = nn.Sequential(
            nn.Linear(dim, ffn_dim), nn.GELU(approximate="tanh"),
            nn.Linear(ffn_dim, dim),
        )
        self.modulation = nn.Parameter(torch.randn(1, 6, dim) / dim**0.5)

    def forward(self, x, e, grid_sizes, freqs, context):
        # e: (B, L, 6, dim) per-token (TI2V) — modulation broadcasts over L
        e = (self.modulation.unsqueeze(0) + e).chunk(6, dim=2)
        e = [u.squeeze(2) for u in e]
        y = self.self_attn(
            self.norm1(x).float() * (1 + e[1]) + e[0], grid_sizes, freqs
        )
        x = x + y * e[2]
        x = x + self.cross_attn(self.norm3(x), context)
        y = self.ffn(self.norm2(x).float() * (1 + e[4]) + e[3])
        x = x + y * e[5]
        return x


class Head(nn.Module):
    def __init__(self, dim, out_dim, patch_size, eps=1e-6):
        super().__init__()
        self.norm = WanLayerNorm(dim, eps)
        self.head = nn.Linear(dim, out_dim * math.prod(patch_size))
        self.modulation = nn.Parameter(torch.randn(1, 2, dim) / dim**0.5)

    def forward(self, x, e):
        # e: (B, L, dim) per-token time embedding
        e = (self.modulation.unsqueeze(0) + e.unsqueeze(2)).chunk(2, dim=2)
        return self.head(
            self.norm(x) * (1 + e[1].squeeze(2)) + e[0].squeeze(2)
        )


class WanOracle(nn.Module):
    """WanModel with the wan/modules/model.py key layout."""

    def __init__(self, cfg: WanConfig):
        super().__init__()
        self.cfg = cfg
        d = cfg.dim
        self.patch_embedding = nn.Conv3d(
            cfg.in_channels, d, kernel_size=cfg.patch_size, stride=cfg.patch_size
        )
        self.text_embedding = nn.Sequential(
            nn.Linear(cfg.text_dim, d), nn.GELU(approximate="tanh"), nn.Linear(d, d)
        )
        self.time_embedding = nn.Sequential(
            nn.Linear(cfg.freq_dim, d), nn.SiLU(), nn.Linear(d, d)
        )
        self.time_projection = nn.Sequential(nn.SiLU(), nn.Linear(d, 6 * d))
        self.blocks = nn.ModuleList(
            [
                WanAttentionBlock(d, cfg.ffn_dim, cfg.num_heads, cfg.eps)
                for _ in range(cfg.num_layers)
            ]
        )
        self.head = Head(d, cfg.out_channels, cfg.patch_size, cfg.eps)
        hd = cfg.head_dim
        self.freqs = torch.cat(
            [
                rope_params(1024, hd - 4 * (hd // 6)),
                rope_params(1024, 2 * (hd // 6)),
                rope_params(1024, 2 * (hd // 6)),
            ],
            dim=1,
        )

    @torch.no_grad()
    def forward(self, x, t, context):
        """x: (B, C, F, H, W); t: (B,) or (B, L); context (B, Ltxt, text_dim)."""
        cfg = self.cfg
        B = x.shape[0]
        h = self.patch_embedding(x)
        grid = tuple(h.shape[2:])
        L = math.prod(grid)
        h = h.flatten(2).transpose(1, 2)  # (B, L, d)

        if t.dim() == 1:
            t = t[:, None].expand(B, L)
        e = self.time_embedding(
            sinusoidal_embedding_1d(cfg.freq_dim, t.flatten()).unflatten(0, (B, L))
        )
        e0 = self.time_projection(e).unflatten(2, (6, cfg.dim))  # (B, L, 6, d)

        context = self.text_embedding(context)
        grid_sizes = [grid] * B
        for block in self.blocks:
            h = block(h, e0, grid_sizes, self.freqs, context)
        h = self.head(h, e)
        # unpatchify (einsum fhwpqrc->cfphqwr)
        c = cfg.out_channels
        f, hh, ww = grid
        p, q, r = cfg.patch_size
        out = h.view(B, f, hh, ww, p, q, r, c)
        out = torch.einsum("bfhwpqrc->bcfphqwr", out)
        return out.reshape(B, c, f * p, hh * q, ww * r)


class TestWanDiTParity:
    @pytest.mark.parametrize("per_token_t", [False, True])
    def test_forward_matches_torch(self, per_token_t):
        torch.manual_seed(0)
        cfg = WanConfig.tiny()
        oracle = WanOracle(cfg).eval()
        sd = {k: v.numpy() for k, v in oracle.state_dict().items()
              if not k.startswith("freqs")}
        params = convert_wan(sd, cfg)

        B, C, Fn, H, W = 2, cfg.in_channels, 4, 8, 12
        x = torch.randn(B, C, Fn, H, W)
        ctx = torch.randn(B, cfg.text_len, cfg.text_dim)
        L = (Fn // cfg.patch_size[0]) * (H // cfg.patch_size[1]) * (W // cfg.patch_size[2])
        if per_token_t:
            # TI2V trick: clean first latent frame gets t=0
            t = torch.full((B, L), 500.0)
            t[:, : L // Fn] = 0.0
        else:
            t = torch.tensor([250.0, 750.0])

        want = oracle(x, t, ctx).numpy()
        got = np.asarray(
            wan_forward(
                params,
                jnp.asarray(x.numpy()),
                jnp.asarray(t.numpy()),
                jnp.asarray(ctx.numpy()),
                cfg,
                attn_impl="xla",
                compute_dtype=jnp.float32,
            )
        )
        assert got.shape == want.shape == (B, cfg.out_channels, Fn, H, W)
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
