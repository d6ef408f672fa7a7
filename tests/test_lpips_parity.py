"""LPIPS-VGG parity vs a torch oracle of the lpips package's computation.

The reference scores every video pair with ``lpips.LPIPS(net='vgg')``
(``metrics/lpips.py:12-19``, ``train/01_preference_pair.py:102``). Neither
lpips nor torchvision is installed here, so the oracle re-implements the
exact pipeline in torch with the torchvision ``features.{i}`` /
lpips ``lin{k}.model.1`` key layouts: scaling layer -> VGG16 relu taps
(relu1_2/2_2/3_3/4_3/5_3) -> channel unit-normalize -> squared diff ->
1x1 lin weights -> spatial mean -> sum. Pins both the JAX math and
convert_lpips's key mapping.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from videogpa_tpu.models.lpips.lpips import convert_lpips, lpips_distance  # noqa: E402

# torchvision vgg16.features: conv indices in the Sequential
_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_CHANNELS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
_POOL_IDX = {4, 9, 16, 23, 30}
_TAP_IDX = {3, 8, 15, 22, 29}  # after relu


class OracleVGGFeatures(nn.Module):
    """torchvision-vgg16 'features' Sequential (convs/relu/maxpool)."""

    def __init__(self):
        super().__init__()
        layers = []
        in_ch = 3
        conv_pos = dict(zip(_CONV_IDX, _CHANNELS))
        for i in range(31):
            if i in conv_pos:
                layers.append(nn.Conv2d(in_ch, conv_pos[i], 3, padding=1))
                in_ch = conv_pos[i]
            elif i in _POOL_IDX:
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.ReLU(inplace=False))
        self.features = nn.Sequential(*layers)

    def forward(self, x):
        taps = []
        h = x
        for i, layer in enumerate(self.features):
            h = layer(h)
            if i in _TAP_IDX:
                taps.append(h)
        return taps


class OracleLPIPS(nn.Module):
    SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def __init__(self):
        super().__init__()
        self.net = OracleVGGFeatures()
        tap_ch = [64, 128, 256, 512, 512]
        # lpips package layout: lin{k}.model = Sequential(Dropout, Conv2d)
        self.lins = nn.ModuleList(
            [
                nn.Sequential(nn.Dropout(0.0), nn.Conv2d(c, 1, 1, bias=False))
                for c in tap_ch
            ]
        )

    @staticmethod
    def _unit(x, eps=1e-10):
        return x / (x.pow(2).sum(dim=1, keepdim=True).sqrt() + eps)

    @torch.no_grad()
    def forward(self, x, y):
        fx = self.net((x - self.SHIFT) / self.SCALE)
        fy = self.net((y - self.SHIFT) / self.SCALE)
        total = 0.0
        for a, b, lin in zip(fx, fy, self.lins):
            d = (self._unit(a) - self._unit(b)) ** 2
            total = total + lin(d).mean(dim=(1, 2, 3))
        return total


class TestLPIPSParity:
    def test_distance_matches_torch_oracle(self):
        torch.manual_seed(0)
        oracle = OracleLPIPS().eval()
        # positive lin weights like the real lpips checkpoint
        for lin in oracle.lins:
            lin[1].weight.data.abs_()
        vgg_sd = {
            f"features.{k[len('net.features.'):]}": v.numpy()
            for k, v in oracle.state_dict().items()
            if k.startswith("net.features.")
        }
        lin_sd = {
            f"lin{i}.model.1.weight": oracle.lins[i][1].weight.detach().numpy()
            for i in range(5)
        }
        params = convert_lpips(vgg_sd, lin_sd)

        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
        y = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
        want = oracle(torch.from_numpy(x), torch.from_numpy(y)).numpy()
        got = np.asarray(lpips_distance(params, jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)
        # identical inputs -> zero distance
        zero = np.asarray(lpips_distance(params, jnp.asarray(x), jnp.asarray(x)))
        np.testing.assert_allclose(zero, 0.0, atol=1e-7)
