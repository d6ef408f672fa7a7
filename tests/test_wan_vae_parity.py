"""Wan2.2 VAE parity vs a torch oracle with the genuine STREAMING semantics.

The Wan2.2 repo's ``Wan2_2_VAE`` (``wan/modules/vae2_2.py``, loaded by
reference ``train/Wan2.2-TI2V-5B/02_encode.py:103-107``) pushes frames
through encoder/decoder in chunks of (1, 4, 4, ...) input frames with
per-conv feature caches, a 'Rep' first-chunk slot at the temporal
upsamplers, and a cache-don't-convolve first chunk at the temporal
downsamplers. Our JAX implementation computes the full-sequence equivalent
in one shot. The oracle below re-implements the chunked/cached algorithm
in torch (module tree and key names matching the real checkpoint layout),
so this test locks down BOTH the weight-conversion key mapping and the
streaming-vs-full-sequence equivalence derivation.
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
from videogpa_tpu.models.wan.convert import convert_wan_vae  # noqa: E402
from videogpa_tpu.models.wan.vae import (  # noqa: E402
    wan_vae_decode,
    wan_vae_encode,
    wan_vae_init,
)

CACHE_T = 2


# ---------------------------------------------------------------------------
# Torch oracle (streaming semantics, vae2_2 key layout)
# ---------------------------------------------------------------------------


class CausalConv3d(nn.Conv3d):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._time_pad = 2 * self.padding[0]
        self._space_pad = (self.padding[2], self.padding[2], self.padding[1], self.padding[1])
        self.padding = (0, 0, 0)

    def forward(self, x, cache_x=None):
        t_pad = self._time_pad
        if cache_x is not None and t_pad > 0:
            x = torch.cat([cache_x, x], dim=2)
            t_pad -= cache_x.shape[2]
        x = F.pad(x, self._space_pad + (t_pad, 0))
        return super().forward(x)


def _cached_conv(conv, x, cache, idx):
    """Wan's per-conv streaming cache pattern (keeps last CACHE_T frames)."""
    if cache is None:
        return conv(x)
    i = idx[0]
    cache_x = x[:, :, -CACHE_T:].clone()
    if cache_x.shape[2] < 2 and cache.get(i) is not None:
        cache_x = torch.cat([cache[i][:, :, -1:], cache_x], dim=2)
    out = conv(x, cache.get(i))
    cache[i] = cache_x
    idx[0] += 1
    return out


class RMSNorm(nn.Module):
    def __init__(self, dim, images=True):
        super().__init__()
        shape = (dim, 1, 1) if images else (dim, 1, 1, 1)
        self.gamma = nn.Parameter(torch.ones(shape))
        self.scale = dim**0.5

    def forward(self, x):
        return F.normalize(x, dim=1) * self.scale * self.gamma


class ResidualBlock(nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.residual = nn.Sequential(
            RMSNorm(in_dim, images=False),
            nn.SiLU(),
            CausalConv3d(in_dim, out_dim, 3, padding=1),
            RMSNorm(out_dim, images=False),
            nn.SiLU(),
            nn.Dropout(0.0),
            CausalConv3d(out_dim, out_dim, 3, padding=1),
        )
        self.shortcut = CausalConv3d(in_dim, out_dim, 1) if in_dim != out_dim else nn.Identity()

    def forward(self, x, cache=None, idx=None):
        h = self.shortcut(x)
        for layer in self.residual:
            x = _cached_conv(layer, x, cache, idx) if isinstance(layer, CausalConv3d) else layer(x)
        return x + h


class AttentionBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = RMSNorm(dim)
        self.to_qkv = nn.Conv2d(dim, dim * 3, 1)
        self.proj = nn.Conv2d(dim, dim, 1)

    def forward(self, x):
        identity = x
        b, c, t, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.norm(x)
        q, k, v = (
            self.to_qkv(x).reshape(b * t, 1, c * 3, -1).permute(0, 1, 3, 2).chunk(3, dim=-1)
        )
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(c), dim=-1)
        x = (attn @ v).squeeze(1).permute(0, 2, 1).reshape(b * t, c, h, w)
        x = self.proj(x)
        return x.reshape(b, t, c, h, w).permute(0, 2, 1, 3, 4) + identity


class Resample(nn.Module):
    def __init__(self, dim, mode):
        super().__init__()
        self.dim, self.mode = dim, mode
        if mode == "upsample2d":
            self.resample = nn.Sequential(
                nn.Upsample(scale_factor=(2.0, 2.0), mode="nearest-exact"),
                nn.Conv2d(dim, dim, 3, padding=1),
            )
        elif mode == "upsample3d":
            self.resample = nn.Sequential(
                nn.Upsample(scale_factor=(2.0, 2.0), mode="nearest-exact"),
                nn.Conv2d(dim, dim, 3, padding=1),
            )
            self.time_conv = CausalConv3d(dim, dim * 2, (3, 1, 1), padding=(1, 0, 0))
        elif mode == "downsample2d":
            self.resample = nn.Sequential(
                nn.ZeroPad2d((0, 1, 0, 1)), nn.Conv2d(dim, dim, 3, stride=(2, 2))
            )
        elif mode == "downsample3d":
            self.resample = nn.Sequential(
                nn.ZeroPad2d((0, 1, 0, 1)), nn.Conv2d(dim, dim, 3, stride=(2, 2))
            )
            self.time_conv = CausalConv3d(dim, dim, (3, 1, 1), stride=(2, 1, 1), padding=(0, 0, 0))

    def forward(self, x, cache=None, idx=None):
        b, c, t, h, w = x.shape
        if self.mode == "upsample3d" and cache is not None:
            i = idx[0]
            if i not in cache:
                cache[i] = "Rep"
                idx[0] += 1
            else:
                cache_x = x[:, :, -CACHE_T:].clone()
                if cache_x.shape[2] < 2 and cache[i] is not None and not isinstance(cache[i], str):
                    cache_x = torch.cat([cache[i][:, :, -1:], cache_x], dim=2)
                if cache_x.shape[2] < 2 and isinstance(cache[i], str):
                    cache_x = torch.cat([torch.zeros_like(cache_x), cache_x], dim=2)
                x = self.time_conv(x) if isinstance(cache[i], str) else self.time_conv(x, cache[i])
                cache[i] = cache_x
                idx[0] += 1
                x = x.reshape(b, 2, c, t, h, w)
                x = torch.stack((x[:, 0], x[:, 1]), 3).reshape(b, c, t * 2, h, w)
        t = x.shape[2]
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.resample(x)
        x = x.reshape(b, t, x.shape[1], x.shape[2], x.shape[3]).permute(0, 2, 1, 3, 4)
        if self.mode == "downsample3d" and cache is not None:
            i = idx[0]
            if i not in cache:
                cache[i] = x.clone()
                idx[0] += 1
            else:
                cache_x = x[:, :, -1:].clone()
                x = self.time_conv(torch.cat([cache[i][:, :, -1:], x], 2))
                cache[i] = cache_x
                idx[0] += 1
        return x


class AvgDown3D(nn.Module):
    def __init__(self, in_ch, out_ch, factor_t, factor_s=1):
        super().__init__()
        self.in_ch, self.out_ch, self.ft, self.fs = in_ch, out_ch, factor_t, factor_s
        self.factor = factor_t * factor_s * factor_s
        self.group = in_ch * self.factor // out_ch

    def forward(self, x):
        pad_t = (self.ft - x.shape[2] % self.ft) % self.ft
        x = F.pad(x, (0, 0, 0, 0, pad_t, 0))
        B, C, T, H, W = x.shape
        x = x.view(B, C, T // self.ft, self.ft, H // self.fs, self.fs, W // self.fs, self.fs)
        x = x.permute(0, 1, 3, 5, 7, 2, 4, 6).contiguous()
        x = x.view(B, self.out_ch, self.group, T // self.ft, H // self.fs, W // self.fs)
        return x.mean(dim=2)


class DupUp3D(nn.Module):
    def __init__(self, in_ch, out_ch, factor_t, factor_s=1):
        super().__init__()
        self.out_ch, self.ft, self.fs = out_ch, factor_t, factor_s
        self.repeats = out_ch * factor_t * factor_s * factor_s // in_ch

    def forward(self, x, first_chunk=False):
        x = x.repeat_interleave(self.repeats, dim=1)
        B = x.shape[0]
        x = x.view(B, self.out_ch, self.ft, self.fs, self.fs, x.shape[2], x.shape[3], x.shape[4])
        x = x.permute(0, 1, 5, 2, 6, 3, 7, 4).contiguous()
        x = x.view(B, self.out_ch, x.shape[2] * self.ft, x.shape[4] * self.fs, x.shape[6] * self.fs)
        return x[:, :, self.ft - 1 :] if first_chunk else x


class DownBlock(nn.Module):
    def __init__(self, in_dim, out_dim, n_res, t_down, down_flag):
        super().__init__()
        self.avg_shortcut = AvgDown3D(
            in_dim, out_dim, factor_t=2 if t_down else 1, factor_s=2 if down_flag else 1
        )
        mods, d = [], in_dim
        for _ in range(n_res):
            mods.append(ResidualBlock(d, out_dim))
            d = out_dim
        if down_flag:
            mods.append(Resample(out_dim, "downsample3d" if t_down else "downsample2d"))
        self.downsamples = nn.Sequential(*mods)

    def forward(self, x, cache=None, idx=None):
        sc = self.avg_shortcut(x)
        for m in self.downsamples:
            x = m(x, cache, idx)
        return x + sc


class UpBlock(nn.Module):
    def __init__(self, in_dim, out_dim, n_res, t_up, up_flag):
        super().__init__()
        self.avg_shortcut = (
            DupUp3D(in_dim, out_dim, factor_t=2 if t_up else 1, factor_s=2) if up_flag else None
        )
        mods, d = [], in_dim
        for _ in range(n_res):
            mods.append(ResidualBlock(d, out_dim))
            d = out_dim
        if up_flag:
            mods.append(Resample(out_dim, "upsample3d" if t_up else "upsample2d"))
        self.upsamples = nn.Sequential(*mods)

    def forward(self, x, cache=None, idx=None, first_chunk=False):
        sc = self.avg_shortcut(x, first_chunk) if self.avg_shortcut is not None else None
        for m in self.upsamples:
            x = m(x, cache, idx)
        return x + sc if sc is not None else x


class Encoder3d(nn.Module):
    def __init__(self, dim, z_dim, dim_mult, n_res, t_down):
        super().__init__()
        dims = [dim * u for u in [1] + list(dim_mult)]
        self.conv1 = CausalConv3d(12, dims[0], 3, padding=1)
        blocks = []
        for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
            td = t_down[i] if i < len(t_down) else False
            blocks.append(DownBlock(cin, cout, n_res, td, down_flag=i != len(dim_mult) - 1))
        self.downsamples = nn.Sequential(*blocks)
        self.middle = nn.Sequential(
            ResidualBlock(dims[-1], dims[-1]), AttentionBlock(dims[-1]), ResidualBlock(dims[-1], dims[-1])
        )
        self.head = nn.Sequential(
            RMSNorm(dims[-1], images=False), nn.SiLU(), CausalConv3d(dims[-1], z_dim, 3, padding=1)
        )

    def forward(self, x, cache=None, idx=None):
        x = _cached_conv(self.conv1, x, cache, idx)
        for b in self.downsamples:
            x = b(x, cache, idx)
        for m in self.middle:
            x = m(x, cache, idx) if isinstance(m, ResidualBlock) else m(x)
        for m in self.head:
            x = _cached_conv(m, x, cache, idx) if isinstance(m, CausalConv3d) else m(x)
        return x


class Decoder3d(nn.Module):
    def __init__(self, dim, z_dim, dim_mult, n_res, t_up):
        super().__init__()
        dims = [dim * u for u in [dim_mult[-1]] + list(dim_mult[::-1])]
        self.conv1 = CausalConv3d(z_dim, dims[0], 3, padding=1)
        self.middle = nn.Sequential(
            ResidualBlock(dims[0], dims[0]), AttentionBlock(dims[0]), ResidualBlock(dims[0], dims[0])
        )
        blocks = []
        for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
            tu = t_up[i] if i < len(t_up) else False
            blocks.append(UpBlock(cin, cout, n_res + 1, tu, up_flag=i != len(dim_mult) - 1))
        self.upsamples = nn.Sequential(*blocks)
        self.head = nn.Sequential(
            RMSNorm(dims[-1], images=False), nn.SiLU(), CausalConv3d(dims[-1], 12, 3, padding=1)
        )

    def forward(self, x, cache=None, idx=None, first_chunk=False):
        x = _cached_conv(self.conv1, x, cache, idx)
        for m in self.middle:
            x = m(x, cache, idx) if isinstance(m, ResidualBlock) else m(x)
        for b in self.upsamples:
            x = b(x, cache, idx, first_chunk)
        for m in self.head:
            x = _cached_conv(m, x, cache, idx) if isinstance(m, CausalConv3d) else m(x)
        return x


def _patchify(x, ps):
    b, c, f, H, W = x.shape
    x = x.view(b, c, f, H // ps, ps, W // ps, ps)
    return x.permute(0, 1, 6, 4, 2, 3, 5).reshape(b, c * ps * ps, f, H // ps, W // ps)


def _unpatchify(x, ps):
    b, cp, f, H, W = x.shape
    c = cp // (ps * ps)
    x = x.view(b, c, ps, ps, f, H, W)
    return x.permute(0, 1, 4, 5, 3, 6, 2).reshape(b, c, f, H * ps, W * ps)


class WanVAEOracle(nn.Module):
    """WanVAE_ with the chunked streaming encode/decode protocol."""

    def __init__(self, dim=8, dec_dim=8, z_dim=6, dim_mult=(1, 2, 4, 4), n_res=2,
                 t_down=(False, True, True)):
        super().__init__()
        self.z_dim = z_dim
        self.encoder = Encoder3d(dim, z_dim * 2, dim_mult, n_res, list(t_down))
        self.conv1 = CausalConv3d(z_dim * 2, z_dim * 2, 1)
        self.conv2 = CausalConv3d(z_dim, z_dim, 1)
        self.decoder = Decoder3d(dec_dim, z_dim, dim_mult, n_res, list(t_down)[::-1])

    @torch.no_grad()
    def encode(self, x, scale=None):
        x = _patchify(x, 2)
        t = x.shape[2]
        cache, outs = {}, []
        for i in range(1 + (t - 1) // 4):
            idx = [0]
            chunk = x[:, :, :1] if i == 0 else x[:, :, 1 + 4 * (i - 1) : 1 + 4 * i]
            outs.append(self.encoder(chunk, cache, idx))
        out = torch.cat(outs, 2)
        mu, _ = self.conv1(out).chunk(2, dim=1)
        if scale is not None:
            mu = (mu - scale[0].view(1, -1, 1, 1, 1)) * scale[1].view(1, -1, 1, 1, 1)
        return mu

    @torch.no_grad()
    def decode(self, z, scale=None):
        if scale is not None:
            z = z / scale[1].view(1, -1, 1, 1, 1) + scale[0].view(1, -1, 1, 1, 1)
        cache, outs = {}, []
        x = self.conv2(z)
        for i in range(z.shape[2]):
            idx = [0]
            outs.append(self.decoder(x[:, :, i : i + 1], cache, idx, first_chunk=i == 0))
        return _unpatchify(torch.cat(outs, 2), 2).clamp_(-1, 1)


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def _tiny_cfg():
    return WanConfig.tiny()


@pytest.fixture(scope="module")
def oracle_and_params():
    torch.manual_seed(0)
    cfg = _tiny_cfg()
    oracle = WanVAEOracle(
        dim=cfg.vae_base_ch,
        dec_dim=cfg.vae_dec_base_ch,
        z_dim=cfg.vae_z_dim,
        dim_mult=cfg.vae_dim_mult,
        n_res=cfg.vae_num_res_blocks,
        t_down=cfg.vae_temporal_down,
    ).eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    rng = np.random.default_rng(0)
    mean = rng.standard_normal(cfg.vae_z_dim).astype(np.float32) * 0.3
    std = 1.0 + 0.2 * rng.standard_normal(cfg.vae_z_dim).astype(np.float32) ** 2
    params = convert_wan_vae(sd, cfg, latents_mean=mean, latents_std=std)
    scale = [torch.from_numpy(mean), torch.from_numpy(1.0 / std)]
    return oracle, params, scale, cfg


class TestWanVAEParity:
    def test_random_init_matches_checkpoint_layout(self, oracle_and_params):
        """wan_vae_init produces the same pytree structure as conversion."""
        oracle, params, _, cfg = oracle_and_params
        init = wan_vae_init(jax.random.PRNGKey(0), cfg)
        ref_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(params)}
        init_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(init)}
        assert ref_paths == init_paths
        for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(params), key=lambda t: jax.tree_util.keystr(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(init), key=lambda t: jax.tree_util.keystr(t[0])),
        ):
            assert a.shape == b.shape, (jax.tree_util.keystr(pa), a.shape, b.shape)

    def test_encode_parity_vs_streaming_oracle(self, oracle_and_params):
        oracle, params, scale, cfg = oracle_and_params
        rng = np.random.default_rng(1)
        vid = rng.uniform(-1, 1, (1, 3, 9, 32, 32)).astype(np.float32)
        ref = oracle.encode(torch.from_numpy(vid), scale).numpy()
        got = np.asarray(wan_vae_encode(params, jnp.asarray(vid), cfg, sample=False))
        assert got.shape == ref.shape == (1, cfg.vae_z_dim, 3, 2, 2)
        np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)

    def test_encode_single_frame_image(self, oracle_and_params):
        """TI2V image conditioning: 1-frame encode (T'=1)."""
        oracle, params, scale, cfg = oracle_and_params
        rng = np.random.default_rng(2)
        img = rng.uniform(-1, 1, (1, 3, 1, 32, 32)).astype(np.float32)
        ref = oracle.encode(torch.from_numpy(img), scale).numpy()
        got = np.asarray(wan_vae_encode(params, jnp.asarray(img), cfg, sample=False))
        assert got.shape == ref.shape == (1, cfg.vae_z_dim, 1, 2, 2)
        np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)

    def test_decode_parity_vs_streaming_oracle(self, oracle_and_params):
        oracle, params, scale, cfg = oracle_and_params
        rng = np.random.default_rng(3)
        lat = rng.standard_normal((1, cfg.vae_z_dim, 3, 2, 2)).astype(np.float32)
        ref = oracle.decode(torch.from_numpy(lat), scale).numpy()
        got = np.asarray(wan_vae_decode(params, jnp.asarray(lat), cfg))
        assert got.shape == ref.shape == (1, 3, 9, 32, 32)
        # guard against the clamp masking differences
        assert (np.abs(ref) < 0.999).mean() > 0.5
        np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)

    def test_longer_sequence_roundtrip_shapes(self, oracle_and_params):
        _, params, _, cfg = oracle_and_params
        vid = jnp.zeros((1, 3, 13, 32, 32))
        lat = wan_vae_encode(params, vid, cfg, sample=False)
        assert lat.shape == (1, cfg.vae_z_dim, 4, 2, 2)
        rec = wan_vae_decode(params, lat, cfg)
        assert rec.shape == (1, 3, 13, 32, 32)
        assert bool(jnp.all(jnp.isfinite(rec)))
