"""CogVideoX 3D-causal VAE parity vs a torch oracle of diffusers'
``AutoencoderKLCogVideoX`` (the frozen VAE the reference uses for latent prep
and decode, ``train/CogVideoX-I2V-5B/02_encode.py:100-119``,
``train/CogVideoX-I2V-5B/03_train.py:94-97``). diffusers is not installed;
the oracle re-implements the module tree with diffusers key names, so these
tests pin both the VAE math (causal convs with replicated-first-frame
padding, group/spatial norms, compress_time placement in down/up blocks) and
convert_vae's key mapping.
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
from videogpa_tpu.models.cogvideox.convert import convert_vae  # noqa: E402
from videogpa_tpu.models.cogvideox.vae import vae_decode, vae_encode  # noqa: E402


class CausalConv3d(nn.Module):
    """diffusers CogVideoXCausalConv3d (pad_mode='first')."""

    def __init__(self, in_ch, out_ch, kernel_size, stride=1):
        super().__init__()
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size,) * 3
        kt, kh, kw = kernel_size
        self.time_pad = kt - 1
        self.space_pad = (kw // 2, kw // 2, kh // 2, kh // 2)
        self.conv = nn.Conv3d(in_ch, out_ch, kernel_size, stride=stride)

    def forward(self, x):
        if self.time_pad:
            first = x[:, :, :1].repeat(1, 1, self.time_pad, 1, 1)
            x = torch.cat([first, x], dim=2)
        x = F.pad(x, self.space_pad)
        return self.conv(x)


class SpatialNorm3D(nn.Module):
    """diffusers CogVideoXSpatialNorm3D."""

    def __init__(self, f_ch, zq_ch, groups):
        super().__init__()
        self.norm_layer = nn.GroupNorm(math.gcd(groups, f_ch), f_ch, eps=1e-6)
        self.conv_y = CausalConv3d(zq_ch, f_ch, 1)
        self.conv_b = CausalConv3d(zq_ch, f_ch, 1)

    def forward(self, f, zq):
        if f.shape[2] > 1 and f.shape[2] % 2 == 1:
            f_first, f_rest = f[:, :, :1], f[:, :, 1:]
            z_first, z_rest = zq[:, :, :1], zq[:, :, 1:]
            z_first = F.interpolate(z_first, size=f_first.shape[-3:])
            z_rest = F.interpolate(z_rest, size=f_rest.shape[-3:])
            zq = torch.cat([z_first, z_rest], dim=2)
        else:
            zq = F.interpolate(zq, size=f.shape[-3:])
        return self.norm_layer(f) * self.conv_y(zq) + self.conv_b(zq)


class ResnetBlock3D(nn.Module):
    def __init__(self, in_ch, out_ch, zq_ch=None, groups=32):
        super().__init__()
        if zq_ch is None:
            self.norm1 = nn.GroupNorm(math.gcd(groups, in_ch), in_ch, eps=1e-6)
            self.norm2 = nn.GroupNorm(math.gcd(groups, out_ch), out_ch, eps=1e-6)
        else:
            self.norm1 = SpatialNorm3D(in_ch, zq_ch, groups)
            self.norm2 = SpatialNorm3D(out_ch, zq_ch, groups)
        self.conv1 = CausalConv3d(in_ch, out_ch, 3)
        self.conv2 = CausalConv3d(out_ch, out_ch, 3)
        if in_ch != out_ch:
            self.conv_shortcut = CausalConv3d(in_ch, out_ch, 1)

    def forward(self, x, zq=None):
        h = self.norm1(x) if zq is None else self.norm1(x, zq)
        h = self.conv1(F.silu(h))
        h2 = self.norm2(h) if zq is None else self.norm2(h, zq)
        h = self.conv2(F.silu(h2))
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


class Downsample3D(nn.Module):
    """diffusers CogVideoXDownsample3D: optional temporal avg-pool (first
    frame kept on odd lengths) + asymmetric-padded stride-2 spatial conv."""

    def __init__(self, ch, compress_time):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)
        self.compress_time = compress_time

    def forward(self, x):
        if self.compress_time:
            b, c, t, h, w = x.shape
            x = x.permute(0, 3, 4, 1, 2).reshape(b * h * w, c, t)
            if x.shape[-1] % 2 == 1:
                x_first, x_rest = x[..., 0], x[..., 1:]
                if x_rest.shape[-1] > 0:
                    x_rest = F.avg_pool1d(x_rest, kernel_size=2, stride=2)
                x = torch.cat([x_first[..., None], x_rest], dim=-1)
            else:
                x = F.avg_pool1d(x, kernel_size=2, stride=2)
            x = x.reshape(b, h, w, c, -1).permute(0, 3, 4, 1, 2)
        x = F.pad(x, (0, 1, 0, 1))
        b, c, t, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.conv(x)
        return x.reshape(b, t, *x.shape[1:]).permute(0, 2, 1, 3, 4)


class Upsample3D(nn.Module):
    """diffusers CogVideoXUpsample3D: nearest interpolation (temporal 2x for
    frames after the first on odd lengths) + spatial conv."""

    def __init__(self, ch, compress_time):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)
        self.compress_time = compress_time

    def forward(self, x):
        if self.compress_time:
            if x.shape[2] > 1 and x.shape[2] % 2 == 1:
                x_first, x_rest = x[:, :, 0], x[:, :, 1:]
                x_first = F.interpolate(x_first, scale_factor=2.0)
                x_rest = F.interpolate(x_rest, scale_factor=2.0)
                x = torch.cat([x_first[:, :, None], x_rest], dim=2)
            elif x.shape[2] > 1:
                x = F.interpolate(x, scale_factor=2.0)
            else:
                x = x.squeeze(2)
                x = F.interpolate(x, scale_factor=2.0)
                x = x[:, :, None]
        else:
            b, c, t, h, w = x.shape
            x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
            x = F.interpolate(x, scale_factor=2.0)
            x = x.reshape(b, t, c, *x.shape[2:]).permute(0, 2, 1, 3, 4)
        b, c, t, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.conv(x)
        return x.reshape(b, t, *x.shape[1:]).permute(0, 2, 1, 3, 4)


class DownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, n_res, add_down, compress_time, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock3D(in_ch if j == 0 else out_ch, out_ch, groups=groups)
             for j in range(n_res)]
        )
        if add_down:
            self.downsamplers = nn.ModuleList([Downsample3D(out_ch, compress_time)])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "downsamplers"):
            x = self.downsamplers[0](x)
        return x


class UpBlock(nn.Module):
    def __init__(self, in_ch, out_ch, n_res, add_up, compress_time, zq_ch, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock3D(in_ch if j == 0 else out_ch, out_ch, zq_ch, groups)
             for j in range(n_res)]
        )
        if add_up:
            self.upsamplers = nn.ModuleList([Upsample3D(out_ch, compress_time)])

    def forward(self, x, zq):
        for r in self.resnets:
            x = r(x, zq)
        if hasattr(self, "upsamplers"):
            x = self.upsamplers[0](x)
        return x


class OracleVAE(nn.Module):
    """AutoencoderKLCogVideoX (no quant convs) with diffusers key names."""

    def __init__(self, cfg: CogVideoXConfig, groups=32):
        super().__init__()
        ch = cfg.vae_block_out_channels
        z = cfg.vae_latent_channels
        npb = cfg.vae_layers_per_block
        t_lv = int(math.log2(cfg.temporal_compression_ratio))

        self.encoder = nn.Module()
        self.encoder.conv_in = CausalConv3d(3, ch[0], 3)
        self.encoder.down_blocks = nn.ModuleList()
        in_c = ch[0]
        for i, out_c in enumerate(ch):
            self.encoder.down_blocks.append(
                DownBlock(in_c, out_c, npb, i != len(ch) - 1, i < t_lv, groups)
            )
            in_c = out_c
        self.encoder.mid_block = nn.Module()
        self.encoder.mid_block.resnets = nn.ModuleList(
            [ResnetBlock3D(ch[-1], ch[-1], groups=groups) for _ in range(2)]
        )
        self.encoder.norm_out = nn.GroupNorm(math.gcd(groups, ch[-1]), ch[-1], eps=1e-6)
        self.encoder.conv_out = CausalConv3d(ch[-1], 2 * z, 3)

        rch = ch[::-1]
        self.decoder = nn.Module()
        self.decoder.conv_in = CausalConv3d(z, rch[0], 3)
        self.decoder.mid_block = nn.Module()
        self.decoder.mid_block.resnets = nn.ModuleList(
            [ResnetBlock3D(rch[0], rch[0], z, groups) for _ in range(2)]
        )
        self.decoder.up_blocks = nn.ModuleList()
        in_c = rch[0]
        for i, out_c in enumerate(rch):
            self.decoder.up_blocks.append(
                UpBlock(in_c, out_c, npb + 1, i != len(rch) - 1, i < t_lv, z, groups)
            )
            in_c = out_c
        self.decoder.norm_out = SpatialNorm3D(rch[-1], z, groups)
        self.decoder.conv_out = CausalConv3d(rch[-1], 3, 3)

    @torch.no_grad()
    def encode_mode(self, x):
        h = self.encoder.conv_in(x)
        for b in self.encoder.down_blocks:
            h = b(h)
        for r in self.encoder.mid_block.resnets:
            h = r(h)
        h = self.encoder.conv_out(F.silu(self.encoder.norm_out(h)))
        return h.chunk(2, dim=1)[0]  # posterior mode

    @torch.no_grad()
    def decode(self, z):
        h = self.decoder.conv_in(z)
        for r in self.decoder.mid_block.resnets:
            h = r(h, z)
        for b in self.decoder.up_blocks:
            h = b(h, z)
        h = self.decoder.conv_out(F.silu(self.decoder.norm_out(h, z)))
        return h


@pytest.fixture(scope="module")
def vae_pair():
    torch.manual_seed(0)
    cfg = CogVideoXConfig.tiny()
    oracle = OracleVAE(cfg).eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = convert_vae(sd, cfg)
    return oracle, params, cfg


class TestCogVideoXVAEParity:
    def test_encode_matches_torch(self, vae_pair):
        oracle, params, cfg = vae_pair
        rng = np.random.default_rng(0)
        vid = rng.uniform(-1, 1, (1, 3, 9, 32, 32)).astype(np.float32)
        want = oracle.encode_mode(torch.from_numpy(vid)).numpy()
        got = np.asarray(vae_encode(params, jnp.asarray(vid), cfg, sample=False))
        got = got / cfg.vae_scaling_factor  # ours returns scaled latents
        assert got.shape == want.shape == (1, cfg.vae_latent_channels, 3, 4, 4)
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)

    def test_decode_matches_torch(self, vae_pair):
        oracle, params, cfg = vae_pair
        rng = np.random.default_rng(1)
        lat = rng.standard_normal((1, cfg.vae_latent_channels, 3, 4, 4)).astype(
            np.float32
        )
        want = oracle.decode(torch.from_numpy(lat)).numpy()
        got = np.asarray(
            vae_decode(params, jnp.asarray(lat) * cfg.vae_scaling_factor, cfg)
        )
        assert got.shape == want.shape == (1, 3, 9, 32, 32)
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)

    def test_single_frame_image_encode(self, vae_pair):
        """I2V first-frame conditioning path: T=1 encode."""
        oracle, params, cfg = vae_pair
        rng = np.random.default_rng(2)
        img = rng.uniform(-1, 1, (1, 3, 1, 32, 32)).astype(np.float32)
        want = oracle.encode_mode(torch.from_numpy(img)).numpy()
        got = np.asarray(vae_encode(params, jnp.asarray(img), cfg, sample=False))
        got = got / cfg.vae_scaling_factor
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)
