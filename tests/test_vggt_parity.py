"""Weight-conversion parity tests vs the reference torch implementation.

These tests import the *reference* VGGT (read-only, ``/root/reference``) as a
numerical oracle: build a small torch module, convert its state dict with our
converter, and compare forward outputs. Skipped when the reference checkout is
absent (e.g. end-user installs).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "vggt")), reason="reference checkout absent"
)
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)


def _sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


class TestBlockParity:
    @pytest.mark.parametrize("qk_norm,use_rope", [(True, True), (False, False)])
    def test_block(self, qk_norm, use_rope):
        import torch
        from vggt.layers.block import Block
        from vggt.layers.rope import PositionGetter, RotaryPositionEmbedding2D

        from videogpa_tpu.models.vggt.convert import _convert_block
        from videogpa_tpu.ops.transformer import BlockConfig, block_apply

        torch.manual_seed(0)
        dim, heads = 64, 4
        rope = RotaryPositionEmbedding2D(frequency=100.0) if use_rope else None
        blk = Block(
            dim=dim, num_heads=heads, qk_norm=qk_norm, init_values=0.01, rope=rope
        ).eval()

        B, N = 2, 20
        x = torch.randn(B, N, dim)
        pos = None
        if use_rope:
            pos = PositionGetter()(B, 4, 5, torch.device("cpu"))
        with torch.no_grad():
            want = blk(x, pos=pos).numpy()

        sd = {f"m.{k}": v for k, v in _sd_numpy(blk).items()}
        p = _convert_block(sd, "m", qk_norm, True)
        cfg = BlockConfig(
            dim=dim,
            num_heads=heads,
            qk_norm=qk_norm,
            init_values=0.01,
            rope_base=100.0 if use_rope else 0.0,
        )
        got = np.asarray(
            block_apply(
                p,
                jnp.asarray(x.numpy()),
                cfg,
                pos=jnp.asarray(pos.numpy()) if pos is not None else None,
                attn_impl="xla",
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestCameraHeadParity:
    def test_camera_head(self):
        import torch
        from vggt.heads.camera_head import CameraHead

        from videogpa_tpu.models.vggt.config import VGGTConfig
        from videogpa_tpu.models.vggt.convert import _convert_camera_head
        from videogpa_tpu.models.vggt.heads import camera_head_forward

        torch.manual_seed(1)
        dim_in = 64
        head = CameraHead(dim_in=dim_in, trunk_depth=2, num_heads=4).eval()
        B, S = 1, 3
        tokens = torch.randn(B, S, 5, dim_in)  # (B, S, P, C); camera token = idx 0
        with torch.no_grad():
            want = head([tokens])[-1].numpy()

        sd = {f"m.{k}": v for k, v in _sd_numpy(head).items()}
        params = _convert_camera_head(sd, "m", trunk_depth=2)
        cfg = VGGTConfig(embed_dim=dim_in // 2, num_heads=4, camera_trunk_depth=2, camera_iterations=4)
        got = np.asarray(
            camera_head_forward(params, jnp.asarray(tokens[:, :, 0].numpy()), cfg, attn_impl="xla")[-1]
        )
        np.testing.assert_allclose(got, want, atol=5e-5)


class TestDPTHeadParity:
    def test_dpt_head(self):
        import torch
        from vggt.heads.dpt_head import DPTHead

        from videogpa_tpu.models.vggt.config import VGGTConfig
        from videogpa_tpu.models.vggt.convert import _convert_dpt_head
        from videogpa_tpu.models.vggt.heads import dpt_head_forward

        torch.manual_seed(2)
        dim_in, feats = 32, 16
        oc = [16, 32, 32, 32]
        head = DPTHead(
            dim_in=dim_in,
            output_dim=2,
            activation="exp",
            conf_activation="expp1",
            features=feats,
            out_channels=oc,
            intermediate_layer_idx=[0, 1, 2, 3],
        ).eval()

        B, S, H, W = 1, 2, 56, 56
        ph = pw = H // 14
        patch_start = 5
        P = patch_start + ph * pw
        tokens = [torch.randn(B, S, P, dim_in) for _ in range(4)]
        images = torch.rand(B, S, 3, H, W)
        with torch.no_grad():
            want_pred, want_conf = head(tokens, images, patch_start_idx=patch_start)

        sd = {f"m.{k}": v for k, v in _sd_numpy(head).items()}
        params = _convert_dpt_head(sd, "m")
        cfg = VGGTConfig(
            embed_dim=dim_in // 2,
            num_register_tokens=patch_start - 1,
            dpt_features=feats,
            dpt_out_channels=tuple(oc),
            dpt_intermediate_layers=(0, 1, 2, 3),
        )
        layer_outputs = jnp.stack([jnp.asarray(t.numpy()) for t in tokens])
        got_pred, got_conf = dpt_head_forward(
            params, layer_outputs, cfg, (H, W), "exp", "expp1"
        )
        np.testing.assert_allclose(
            np.asarray(got_pred), want_pred.numpy(), atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got_conf), want_conf.numpy(), atol=1e-4, rtol=1e-4
        )


class TestDinoV2Parity:
    def test_vit_small(self):
        import torch
        from vggt.layers.vision_transformer import vit_small

        from videogpa_tpu.models.vggt.config import VGGTConfig
        from videogpa_tpu.models.vggt.convert import convert_dinov2
        from videogpa_tpu.models.vggt.vit import dinov2_forward

        torch.manual_seed(3)
        vit = vit_small(
            img_size=518,
            patch_size=14,
            num_register_tokens=4,
            init_values=1.0,
            block_chunks=0,
            interpolate_antialias=True,
            interpolate_offset=0.0,
        ).eval()
        # randomize pos_embed (default init is trunc_normal small)
        x = torch.randn(2, 3, 56, 56)
        with torch.no_grad():
            want = vit.forward_features(x)["x_norm_patchtokens"].numpy()

        sd = {f"pe.{k}": v for k, v in _sd_numpy(vit).items()}
        params = convert_dinov2(sd, "pe", depth=12)
        cfg = VGGTConfig(
            img_size=56,
            backbone_dim=384,
            backbone_depth=12,
            backbone_heads=6,
            backbone_init_values=1.0,
        )
        got = np.asarray(dinov2_forward(params, jnp.asarray(x.numpy()), cfg, attn_impl="xla"))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
