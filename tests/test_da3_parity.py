"""DA3 weight-conversion parity vs the reference torch modules.

Imports the reference Depth Anything 3 DPT (read-only ``/root/reference``)
as a torch oracle with tiny random weights, converts through our converter,
and compares outputs. Skipped when the reference checkout is absent.
The reference package needs addict/omegaconf, which aren't installed —
minimal shims are registered before import (behavior-neutral for the DPT).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "depth_anything_3")),
    reason="reference checkout absent",
)


def _install_shims():
    if "addict" not in sys.modules:
        class _ADict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

            def __setattr__(self, k, v):
                self[k] = v

        m = types.ModuleType("addict")
        m.Dict = _ADict
        sys.modules["addict"] = m
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        oc.DictConfig = dict
        oc.ListConfig = list
        oc.OmegaConf = object
        sys.modules["omegaconf"] = oc
    if REF not in sys.path:
        sys.path.insert(0, REF)


class TestMonoDPTParity:
    def test_mono_dpt_head_matches_torch(self):
        _install_shims()
        import importlib

        import jax.numpy as jnp
        import torch

        ref_dpt = importlib.import_module("depth_anything_3.model.dpt")

        from videogpa_tpu.models.da3.config import DA3Config
        from videogpa_tpu.models.da3.convert import convert_da3_mono
        from videogpa_tpu.models.da3.mono import _head_vcfg
        from videogpa_tpu.models.vggt.heads import dpt_head_forward

        torch.manual_seed(0)
        C, F = 32, 16
        mod = ref_dpt.DPT(
            dim_in=C, output_dim=1, features=F, out_channels=(16, 16, 16, 16),
            use_sky_head=True,
        ).eval()

        sd = {f"head.{k}": v.numpy() for k, v in mod.state_dict().items()}
        # trunk keys unused by this test; convert only the head
        cfg = DA3Config(
            embed_dim=C, depth=4, alt_start=-1, out_layers=(0, 1, 2, 3),
            dpt_features=F, dpt_out_channels=(16, 16, 16, 16),
        )
        from videogpa_tpu.models.da3 import convert as C_mod

        head = {
            k: v
            for k, v in C_mod.convert_da3_mono(
                {**sd, **_fake_trunk_keys(cfg)}, cfg
            )["head"].items()
        }

        B, S, H, W = 1, 2, 28, 42
        P = (H // 14) * (W // 14) + 1
        rng = np.random.default_rng(0)
        feats = [rng.standard_normal((B, S, P, C)).astype(np.float32)
                 for _ in range(4)]

        with torch.no_grad():
            out_t = mod([(torch.from_numpy(f),) for f in feats], H, W,
                        patch_start_idx=1, chunk_size=None)
        depth_t = out_t["depth"].numpy()
        sky_t = out_t["sky"].numpy()

        tokens = jnp.stack([jnp.asarray(f) for f in feats])  # (4, B, S, P, C)
        depth_j, _, sky_j = dpt_head_forward(
            head, tokens.reshape(4, B * S, 1, P, C), _head_vcfg(cfg), (H, W),
            activation="exp", with_conf=False, use_pos_embed=False,
            inplace_relu=False,
        )
        depth_j = np.asarray(depth_j[:, 0, ..., 0]).reshape(B, S, H, W)
        sky_j = np.asarray(sky_j[:, 0]).reshape(B, S, H, W)

        np.testing.assert_allclose(depth_j, depth_t, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(sky_j, sky_t, rtol=2e-4, atol=2e-4)


def _fake_trunk_keys(cfg):
    """Minimal random trunk keys so convert_da3_mono's backbone path runs."""
    import torch

    sys.path.insert(0, REF) if REF not in sys.path else None
    rng = np.random.default_rng(1)
    C = cfg.embed_dim
    n_grid = cfg.img_size // cfg.patch_size
    sd = {
        "backbone.pretrained.patch_embed.proj.weight": rng.standard_normal(
            (C, 3, 14, 14)).astype(np.float32),
        "backbone.pretrained.patch_embed.proj.bias": np.zeros(C, np.float32),
        "backbone.pretrained.cls_token": np.zeros((1, 1, C), np.float32),
        "backbone.pretrained.pos_embed": np.zeros(
            (1, 1 + n_grid * n_grid, C), np.float32),
        "backbone.pretrained.norm.weight": np.ones(C, np.float32),
        "backbone.pretrained.norm.bias": np.zeros(C, np.float32),
    }
    for i in range(cfg.depth):
        p = f"backbone.pretrained.blocks.{i}"
        sd |= {
            f"{p}.norm1.weight": np.ones(C, np.float32),
            f"{p}.norm1.bias": np.zeros(C, np.float32),
            f"{p}.attn.qkv.weight": rng.standard_normal((3 * C, C)).astype(np.float32),
            f"{p}.attn.qkv.bias": np.zeros(3 * C, np.float32),
            f"{p}.attn.proj.weight": rng.standard_normal((C, C)).astype(np.float32),
            f"{p}.attn.proj.bias": np.zeros(C, np.float32),
            f"{p}.ls1.gamma": np.ones(C, np.float32),
            f"{p}.norm2.weight": np.ones(C, np.float32),
            f"{p}.norm2.bias": np.zeros(C, np.float32),
            f"{p}.mlp.fc1.weight": rng.standard_normal((4 * C, C)).astype(np.float32),
            f"{p}.mlp.fc1.bias": np.zeros(4 * C, np.float32),
            f"{p}.mlp.fc2.weight": rng.standard_normal((C, 4 * C)).astype(np.float32),
            f"{p}.mlp.fc2.bias": np.zeros(C, np.float32),
            f"{p}.ls2.gamma": np.ones(C, np.float32),
        }
    return sd
