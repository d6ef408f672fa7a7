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


# ---------------------------------------------------------------------------
# AA-ViT / DualDPT / CameraEnc / CameraDec / full-net torch oracles
# ---------------------------------------------------------------------------


def _tiny_cfg(**over):
    from videogpa_tpu.models.da3.config import DA3Config

    base = dict(
        img_size=28, patch_size=14, embed_dim=32, depth=6, num_heads=2,
        alt_start=2, out_layers=(3, 5), rope_base=100.0,
        dpt_features=16, dpt_out_channels=(8, 8, 8, 8), aux_out1_conv_num=5,
    )
    base.update(over)
    return DA3Config(**base)


def _randomize_(mod, seed=0, scale=0.2):
    import torch

    torch.manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            p.normal_(0.0, scale)
    return mod


def _make_torch_aavit(cfg, seed=0):
    _install_shims()
    from depth_anything_3.model.dinov2 import vision_transformer as vt

    vit = vt.DinoVisionTransformer(
        img_size=cfg.img_size, patch_size=cfg.patch_size,
        embed_dim=cfg.embed_dim, depth=cfg.depth, num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio, alt_start=cfg.alt_start,
        qknorm_start=cfg.alt_start, rope_start=cfg.alt_start,
        rope_freq=cfg.rope_base, cat_token=True, ffn_layer=cfg.ffn
        if cfg.ffn != "mlp" else "mlp",
    ).eval()
    return _randomize_(vit, seed)


def _vit_jax_params(vit, cfg):
    from videogpa_tpu.models.da3.convert import _convert_aavit

    sd = {f"backbone.pretrained.{k}": v.detach().numpy()
          for k, v in vit.state_dict().items()}
    return _convert_aavit(sd, cfg, "backbone.pretrained")


def _structured_views(B, S, H, W, seed):
    """Views = shared scene + per-view perturbations of distinct magnitude, so
    the reference-view statistics (similarity/norm/variance) are well
    separated and the argmin/argmax isn't a numerical coin flip."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((B, 1, 3, H, W))
    noise = rng.standard_normal((B, S, 3, H, W))
    alpha = np.linspace(0.2, 1.4, S).reshape(1, S, 1, 1, 1)
    return (base + alpha * noise).astype(np.float32)


def _compare_aavit(cfg, B, S, H, W, cam_token=None, seed=0, tol=5e-4):
    import jax.numpy as jnp
    import torch

    vit = _make_torch_aavit(cfg, seed)
    params = _vit_jax_params(vit, cfg)

    x = _structured_views(B, S, H, W, seed + 1)

    kwargs = {"ref_view_strategy": cfg.ref_view_strategy}
    if cam_token is not None:
        kwargs["cam_token"] = torch.from_numpy(cam_token)
    with torch.no_grad():
        outs_t, _aux = vit.get_intermediate_layers(
            torch.from_numpy(x), list(cfg.out_layers), **kwargs
        )

    from videogpa_tpu.models.da3.vit import aavit_forward

    feats_j = aavit_forward(
        params, jnp.asarray(x), cfg,
        cam_token=None if cam_token is None else jnp.asarray(cam_token),
    )
    assert len(feats_j) == len(outs_t) == len(cfg.out_layers)
    for (tok_j, cam_j), (tok_t, cam_t) in zip(feats_j, outs_t):
        np.testing.assert_allclose(
            np.asarray(tok_j), tok_t.numpy(), rtol=tol, atol=tol
        )
        np.testing.assert_allclose(
            np.asarray(cam_j), cam_t.numpy(), rtol=tol, atol=tol
        )


class TestAAViTParity:
    """Oracle: reference ``model/dinov2/vision_transformer.py:300-398``."""

    def test_s4_selection_reorder_restore(self):
        # S=4 >= THRESH_FOR_REF_SELECTION: saddle_balanced selection at the
        # top of layer alt_start-1, reorder, camera-token slot 0, restore
        _compare_aavit(_tiny_cfg(), B=2, S=4, H=28, W=42)

    def test_s2_no_selection(self):
        _compare_aavit(_tiny_cfg(), B=1, S=2, H=28, W=28)

    def test_user_cam_token_skips_selection(self):
        rng = np.random.default_rng(7)
        ct = rng.standard_normal((1, 5, 32)).astype(np.float32)
        _compare_aavit(_tiny_cfg(), B=1, S=5, H=28, W=42, cam_token=ct)

    def test_middle_strategy_reorder(self):
        # deterministic selection (S//2): exercises reorder/restore with a
        # non-zero reference index regardless of float noise
        _compare_aavit(
            _tiny_cfg(ref_view_strategy="middle"), B=1, S=4, H=42, W=28,
            seed=3,
        )

    def test_selection_strategies_match_reference(self):
        """All four strategies vs reference ``model/reference_view_selector.py``
        on synthetic tokens with well-separated cls statistics."""
        _install_shims()
        import importlib

        import jax.numpy as jnp
        import torch

        ref_sel = importlib.import_module(
            "depth_anything_3.model.reference_view_selector"
        )
        from videogpa_tpu.models.da3.vit import select_reference_view

        rng = np.random.default_rng(33)
        B, S, P, C = 3, 5, 4, 16
        x = rng.standard_normal((B, S, P, C)).astype(np.float32)
        # separate the per-view cls stats: distinct norms and directions
        x[:, :, 0] = (
            rng.standard_normal((B, S, C)) * np.linspace(0.5, 3.0, S)[None, :, None]
        ).astype(np.float32)

        for strategy in ("first", "middle", "saddle_balanced", "saddle_sim_range"):
            b_t = ref_sel.select_reference_view(
                torch.from_numpy(x), strategy=strategy
            ).numpy()
            b_j = np.asarray(select_reference_view(jnp.asarray(x), strategy))
            np.testing.assert_array_equal(b_j, b_t, err_msg=strategy)
            # and the reorder/restore permutations agree with the reference
            from videogpa_tpu.models.da3.vit import _reorder_perm

            perm = np.asarray(_reorder_perm(jnp.asarray(b_t), S))
            re_t = ref_sel.reorder_by_reference(
                torch.from_numpy(x), torch.from_numpy(b_t)
            ).numpy()
            re_j = np.take_along_axis(x, perm[:, :, None, None], axis=1)
            np.testing.assert_array_equal(re_j, re_t, err_msg=strategy)
            inv = np.argsort(perm, axis=1)
            back_t = ref_sel.restore_original_order(
                torch.from_numpy(re_t), torch.from_numpy(b_t)
            ).numpy()
            back_j = np.take_along_axis(re_j, inv[:, :, None, None], axis=1)
            np.testing.assert_array_equal(back_j, back_t, err_msg=strategy)
            np.testing.assert_array_equal(back_j, x, err_msg=strategy)

    def test_swiglu_ffn_giant_style(self):
        _compare_aavit(_tiny_cfg(ffn="swiglu"), B=1, S=3, H=28, W=42, seed=5)


class TestDualDPTParity:
    """Oracle: reference ``model/dualdpt.py:30-364``."""

    def _run(self, aux_convs, B=1, S=2, H=28, W=42, seed=0):
        _install_shims()
        import importlib

        import jax.numpy as jnp
        import torch

        ref_dualdpt = importlib.import_module("depth_anything_3.model.dualdpt")
        cfg = _tiny_cfg(aux_out1_conv_num=aux_convs)
        C2 = cfg.tokens_dim
        mod = ref_dualdpt.DualDPT(
            dim_in=C2, patch_size=cfg.patch_size, output_dim=2,
            features=cfg.dpt_features, out_channels=cfg.dpt_out_channels,
            aux_out1_conv_num=aux_convs,
        ).eval()
        _randomize_(mod, seed, scale=0.1)

        from videogpa_tpu.models.da3.convert import _convert_dualdpt
        from videogpa_tpu.models.da3.heads import dualdpt_forward

        sd = {f"head.{k}": v.detach().numpy() for k, v in mod.state_dict().items()}
        params = _convert_dualdpt(sd, cfg, "head")

        P = (H // 14) * (W // 14)
        rng = np.random.default_rng(seed + 1)
        feats = [rng.standard_normal((B, S, P, C2)).astype(np.float32)
                 for _ in range(4)]

        with torch.no_grad():
            out_t = mod(
                [(torch.from_numpy(f), None) for f in feats], H, W,
                patch_start_idx=0, chunk_size=None,
            )

        feats_j = [(jnp.asarray(f), None) for f in feats]
        out_j = dualdpt_forward(params, feats_j, cfg, (H, W))

        np.testing.assert_allclose(
            np.asarray(out_j["depth"]), out_t["depth"].numpy(),
            rtol=5e-4, atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out_j["depth_conf"]), out_t["depth_conf"].numpy(),
            rtol=5e-4, atol=5e-4,
        )
        # aux ray head: reference layout (B, S, H, W, 6+1) after permute
        np.testing.assert_allclose(
            np.asarray(out_j["ray"]), out_t["ray"].numpy(),
            rtol=5e-4, atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out_j["ray_conf"]), out_t["ray_conf"].numpy(),
            rtol=5e-4, atol=5e-4,
        )

    def test_dualdpt_aux5(self):
        self._run(aux_convs=5)

    def test_dualdpt_aux1(self):
        self._run(aux_convs=1, H=42, W=28, seed=2)


class TestCameraEncDecParity:
    def test_camera_enc_matches_torch(self):
        """Oracle: reference ``model/cam_enc.py:23-80``."""
        _install_shims()
        import importlib

        import jax.numpy as jnp
        import torch

        ref = importlib.import_module("depth_anything_3.model.cam_enc")
        dim = 32
        mod = ref.CameraEnc(dim_out=dim, dim_in=9, trunk_depth=4).eval()
        _randomize_(mod, seed=4)

        from videogpa_tpu.models.da3.convert import convert_camera_enc
        from videogpa_tpu.models.da3.heads import camera_enc_forward

        sd = {f"cam_enc.{k}": v.detach().numpy() for k, v in mod.state_dict().items()}
        params = convert_camera_enc(sd)

        # plausible w2c extrinsics + intrinsics
        rng = np.random.default_rng(5)
        B, S, H, W = 1, 3, 28, 42
        quats = rng.standard_normal((B, S, 4))
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        from scipy.spatial.transform import Rotation  # noqa: F401

        ext = np.zeros((B, S, 4, 4), np.float32)
        for b in range(B):
            for s in range(S):
                ext[b, s] = np.eye(4)
                ext[b, s, :3, :3] = Rotation.from_quat(quats[b, s]).as_matrix()
                ext[b, s, :3, 3] = rng.standard_normal(3) * 0.2
        ixt = np.zeros((B, S, 3, 3), np.float32)
        ixt[..., 0, 0] = 40.0
        ixt[..., 1, 1] = 38.0
        ixt[..., 0, 2] = W / 2
        ixt[..., 1, 2] = H / 2
        ixt[..., 2, 2] = 1.0

        with torch.no_grad():
            out_t = mod(torch.from_numpy(ext), torch.from_numpy(ixt), (H, W))
        out_j = camera_enc_forward(params, jnp.asarray(ext), jnp.asarray(ixt), (H, W))
        np.testing.assert_allclose(
            np.asarray(out_j), out_t.numpy(), rtol=5e-4, atol=5e-4
        )

    def test_camera_dec_matches_torch(self):
        """Oracle: reference ``model/cam_dec.py:19-45``."""
        _install_shims()
        import importlib

        import jax.numpy as jnp
        import torch

        ref = importlib.import_module("depth_anything_3.model.cam_dec")
        dim = 64
        mod = ref.CameraDec(dim_in=dim).eval()
        _randomize_(mod, seed=6)

        from videogpa_tpu.models.da3.convert import convert_camera_dec
        from videogpa_tpu.models.da3.heads import camera_dec_forward

        sd = {f"cam_dec.{k}": v.detach().numpy() for k, v in mod.state_dict().items()}
        params = convert_camera_dec(sd)

        rng = np.random.default_rng(8)
        feat = rng.standard_normal((2, 3, dim)).astype(np.float32)
        with torch.no_grad():
            out_t = mod(torch.from_numpy(feat))
        out_j = camera_dec_forward(params, jnp.asarray(feat))
        np.testing.assert_allclose(
            np.asarray(out_j), out_t.numpy(), rtol=1e-5, atol=1e-5
        )


class TestDA3NetParity:
    """Full DepthAnything3Net forward oracle (reference ``model/da3.py:100-221``)
    at the da3-small preset (``configs/da3-small.yaml``)."""

    def test_small_preset_full_forward(self):
        _install_shims()
        import importlib

        import jax.numpy as jnp
        import torch

        da3_mod = importlib.import_module("depth_anything_3.model.da3")
        dinov2_mod = importlib.import_module("depth_anything_3.model.dinov2.dinov2")
        dualdpt_mod = importlib.import_module("depth_anything_3.model.dualdpt")
        cam_enc_mod = importlib.import_module("depth_anything_3.model.cam_enc")
        cam_dec_mod = importlib.import_module("depth_anything_3.model.cam_dec")

        from videogpa_tpu.models.da3.config import DA3Config
        from videogpa_tpu.models.da3.convert import convert_da3
        from videogpa_tpu.models.da3.model import da3_forward

        cfg = DA3Config.small()
        net = dinov2_mod.DinoV2(
            name="vits", out_layers=list(cfg.out_layers), alt_start=cfg.alt_start,
            qknorm_start=cfg.alt_start, rope_start=cfg.alt_start, cat_token=True,
        )
        head = dualdpt_mod.DualDPT(
            dim_in=cfg.tokens_dim, output_dim=2, features=cfg.dpt_features,
            out_channels=cfg.dpt_out_channels,
        )
        cam_enc = cam_enc_mod.CameraEnc(dim_out=cfg.embed_dim)
        cam_dec = cam_dec_mod.CameraDec(dim_in=cfg.tokens_dim)
        ref_net = da3_mod.DepthAnything3Net(
            net=net, head=head, cam_dec=cam_dec, cam_enc=cam_enc
        ).eval()
        _randomize_(ref_net, seed=11, scale=0.05)

        sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
        params = convert_da3(sd, cfg)

        rng = np.random.default_rng(12)
        B, S, H, W = 1, 4, 28, 42
        x = rng.standard_normal((B, S, 3, H, W)).astype(np.float32)

        with torch.no_grad():
            out_t = ref_net(torch.from_numpy(x))
        out_j = da3_forward(params, jnp.asarray(x), cfg)

        for key in ("depth", "depth_conf", "ray", "ray_conf"):
            np.testing.assert_allclose(
                np.asarray(out_j[key]), out_t[key].numpy(),
                rtol=2e-3, atol=2e-3, err_msg=key,
            )
        np.testing.assert_allclose(
            np.asarray(out_j["extrinsics"]), out_t["extrinsics"].numpy(),
            rtol=2e-3, atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out_j["intrinsics"]), out_t["intrinsics"].numpy(),
            rtol=2e-3, atol=2e-2,
        )


class TestNestedAlignmentParity:
    """Oracle: reference ``model/da3.py:367-435`` (NestedDepthAnything3Net
    metric scaling, LS depth alignment, sky handling)."""

    def test_alignment_matches_torch(self):
        _install_shims()
        import importlib

        import torch
        from addict import Dict as ADict

        da3_mod = importlib.import_module("depth_anything_3.model.da3")

        rng = np.random.default_rng(21)
        S, H, W = 3, 20, 30  # < 100k elements => deterministic quantiles
        depth = np.abs(rng.standard_normal((S, H, W))).astype(np.float32) + 0.1
        conf = np.abs(rng.standard_normal((S, H, W))).astype(np.float32) + 1.0
        metric_raw = (depth * 2.5 + 0.05 * rng.standard_normal((S, H, W))
                      ).astype(np.float32)
        metric_raw = np.abs(metric_raw) + 0.05
        sky = rng.uniform(0, 1, (S, H, W)).astype(np.float32)
        extr = np.broadcast_to(np.eye(4, dtype=np.float32), (S, 4, 4)).copy()
        extr[:, :3, 3] = rng.standard_normal((S, 3))
        intr = np.zeros((S, 3, 3), np.float32)
        intr[:, 0, 0] = 35.0
        intr[:, 1, 1] = 33.0
        intr[:, 0, 2] = W / 2
        intr[:, 1, 2] = H / 2
        intr[:, 2, 2] = 1.0

        # --- reference path (batch dim B=1)
        nested = object.__new__(da3_mod.NestedDepthAnything3Net)
        out_ref = ADict(
            depth=torch.from_numpy(depth[None].copy()),
            depth_conf=torch.from_numpy(conf[None].copy()),
            extrinsics=torch.from_numpy(extr[None].copy()),
            intrinsics=torch.from_numpy(intr[None].copy()),
        )
        metric_ref = ADict(
            depth=torch.from_numpy(metric_raw[None].copy()),
            sky=torch.from_numpy(sky[None].copy()),
        )
        out_ref = nested._apply_metric_scaling(out_ref, metric_ref)
        out_ref = nested._apply_depth_alignment(out_ref, metric_ref)
        out_ref = nested._handle_sky_regions(out_ref, metric_ref)

        # --- ours
        from videogpa_tpu.models.da3.model import DA3Prediction
        from videogpa_tpu.models.da3.nested import (
            align_to_metric,
            apply_metric_scaling,
        )

        pred = DA3Prediction(
            depth=depth.copy(), conf=conf.copy(), extrinsics=extr.copy(),
            intrinsics=intr.copy(), processed_images=np.zeros((S, H, W, 3)),
        )
        metric_depth = apply_metric_scaling(metric_raw, intr)
        ours = align_to_metric(pred, metric_depth, sky)

        np.testing.assert_allclose(
            ours.scale_factor, out_ref["scale_factor"], rtol=1e-5
        )
        np.testing.assert_allclose(
            ours.depth, out_ref["depth"][0].numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            ours.conf, out_ref["depth_conf"][0].numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            ours.extrinsics, out_ref["extrinsics"][0].numpy(), rtol=1e-5,
            atol=1e-6,
        )


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
