"""DA3 torch checkpoint -> JAX params conversion.

Key layout follows the reference module tree (``depth_anything_3/model/da3.py``
assembly: ``backbone.pretrained`` DINOv2 AA-ViT, ``head`` DualDPT,
``cam_dec`` CameraDec; checkpoint keys are normalized by the reference's
``utils/model_loading.py`` remapping before save).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from videogpa_tpu.convert import t_array, t_conv2d, t_conv_transpose2d, t_layernorm, t_linear
from videogpa_tpu.models.da3.config import DA3Config
from videogpa_tpu.models.vggt.convert import _convert_block
from videogpa_tpu.ops import layers as L


def _convert_aavit(sd: Mapping[str, np.ndarray], cfg: DA3Config, pfx: str) -> dict:
    pre = [
        _convert_block(sd, f"{pfx}.blocks.{i}", qk_norm=False, ls=True, ffn=cfg.ffn)
        for i in range(cfg.alt_start)
    ]
    alt = [
        _convert_block(sd, f"{pfx}.blocks.{i}", qk_norm=True, ls=True, ffn=cfg.ffn)
        for i in range(cfg.alt_start, cfg.depth)
    ]
    out = {
        "patch_embed": t_conv2d(sd, f"{pfx}.patch_embed.proj"),
        "cls_token": t_array(sd, f"{pfx}.cls_token"),
        "pos_embed": t_array(sd, f"{pfx}.pos_embed"),
        "blocks_pre": L.stack_params(pre),
        "blocks_alt": alt,
        "norm": t_layernorm(sd, f"{pfx}.norm"),
    }
    if f"{pfx}.camera_token" in sd:  # absent in mono/metric checkpoints
        out["camera_token"] = t_array(sd, f"{pfx}.camera_token")
    return out


def _convert_fusion(sd, pfx):
    def rcu(rp):
        return {"conv1": t_conv2d(sd, f"{rp}.conv1"), "conv2": t_conv2d(sd, f"{rp}.conv2")}

    p = {"out_conv": t_conv2d(sd, f"{pfx}.out_conv"), "rcu2": rcu(f"{pfx}.resConfUnit2")}
    if f"{pfx}.resConfUnit1.conv1.weight" in sd:
        p["rcu1"] = rcu(f"{pfx}.resConfUnit1")
    return p


def _convert_dualdpt(sd: Mapping[str, np.ndarray], cfg: DA3Config, pfx: str) -> dict:
    n_aux_convs = cfg.aux_out1_conv_num
    aux1 = []
    for lvl in range(4):
        aux1.append(
            [
                t_conv2d(sd, f"{pfx}.scratch.output_conv1_aux.{lvl}.{j}")
                for j in range(n_aux_convs)
            ]
        )
    return {
        "norm": t_layernorm(sd, f"{pfx}.norm"),
        "projects": [t_conv2d(sd, f"{pfx}.projects.{i}") for i in range(4)],
        "resize0": t_conv_transpose2d(sd, f"{pfx}.resize_layers.0"),
        "resize1": t_conv_transpose2d(sd, f"{pfx}.resize_layers.1"),
        "resize3": t_conv2d(sd, f"{pfx}.resize_layers.3"),
        "layer_rn": [t_conv2d(sd, f"{pfx}.scratch.layer{i + 1}_rn") for i in range(4)],
        "refinenet1": _convert_fusion(sd, f"{pfx}.scratch.refinenet1"),
        "refinenet2": _convert_fusion(sd, f"{pfx}.scratch.refinenet2"),
        "refinenet3": _convert_fusion(sd, f"{pfx}.scratch.refinenet3"),
        "refinenet4": _convert_fusion(sd, f"{pfx}.scratch.refinenet4"),
        "refinenet1_aux": _convert_fusion(sd, f"{pfx}.scratch.refinenet1_aux"),
        "refinenet2_aux": _convert_fusion(sd, f"{pfx}.scratch.refinenet2_aux"),
        "refinenet3_aux": _convert_fusion(sd, f"{pfx}.scratch.refinenet3_aux"),
        "refinenet4_aux": _convert_fusion(sd, f"{pfx}.scratch.refinenet4_aux"),
        "output_conv1": t_conv2d(sd, f"{pfx}.scratch.output_conv1"),
        "output_conv2a": t_conv2d(sd, f"{pfx}.scratch.output_conv2.0"),
        "output_conv2b": t_conv2d(sd, f"{pfx}.scratch.output_conv2.2"),
        "output_conv1_aux": aux1,
        # Sequential(conv3x3, Permute, LayerNorm, Permute, ReLU, conv1x1)
        "output_conv2a_aux": t_conv2d(sd, f"{pfx}.scratch.output_conv2_aux.3.0"),
        "output_conv2_ln_aux": t_layernorm(sd, f"{pfx}.scratch.output_conv2_aux.3.2"),
        "output_conv2b_aux": t_conv2d(sd, f"{pfx}.scratch.output_conv2_aux.3.5"),
    }


def normalize_da3_state_dict(
    sd: Mapping[str, np.ndarray], is_metric: bool = False
) -> dict:
    """Normalize raw DA3 training-dump checkpoints to the module-tree layout.

    Mirrors reference ``utils/model_loading.py::convert_general_state_dict``
    (:25-72) / ``convert_metric_state_dict`` (:75-88), then strips the api
    wrapper's ``model.`` prefix (``api.py:89`` holds the net at
    ``self.model``) so keys match what :func:`convert_da3` expects.
    HF-hub checkpoints are already normalized — this is a no-op for them.
    """
    if is_metric:
        sd = {"module." + k: v for k, v in sd.items()}
    renames = [
        ("module.", "model."),
        (".net.", ".backbone."),
        (".camera_token_extra", ".camera_token"),
        ("model.all_heads.camera_cond_head", "model.cam_enc"),
        ("model.all_heads.camera_head", "model.cam_dec"),
        (".more_mlps.", ".backbone."),
        (".fc_rot.", ".fc_qvec."),
        ("model.all_heads.head", "model.head"),
        ("output_conv2_additional.sky_mask", "sky_output_conv2"),
        ("_ray.", "_aux."),
        ("gaussian_param_head.", "gs_head."),
    ]
    out = dict(sd)
    for old, new in renames:
        out = {k.replace(old, new): v for k, v in out.items()}
        # the old camera_token is deleted AFTER the module-prefix rename and
        # BEFORE camera_token_extra takes its name (model_loading.py:39-45)
        if old == ".net.":
            out.pop("model.backbone.pretrained.camera_token", None)
    # strip the DepthAnything3 wrapper prefix for our converters
    return {
        (k[len("model."):] if k.startswith("model.") else k): v
        for k, v in out.items()
    }


def convert_camera_dec(sd: Mapping[str, np.ndarray], pfx: str = "cam_dec") -> dict:
    """CameraDec (reference ``model/cam_dec.py:19-45``)."""
    return {
        "backbone1": t_linear(sd, f"{pfx}.backbone.0"),
        "backbone2": t_linear(sd, f"{pfx}.backbone.2"),
        "fc_t": t_linear(sd, f"{pfx}.fc_t"),
        "fc_qvec": t_linear(sd, f"{pfx}.fc_qvec"),
        "fc_fov": t_linear(sd, f"{pfx}.fc_fov.0"),
    }


def convert_camera_enc(sd: Mapping[str, np.ndarray], pfx: str = "cam_enc") -> dict:
    """CameraEnc (reference ``model/cam_enc.py:23-80``)."""
    return {
        "pose_branch": {
            "fc1": t_linear(sd, f"{pfx}.pose_branch.fc1"),
            "fc2": t_linear(sd, f"{pfx}.pose_branch.fc2"),
        },
        "token_norm": t_layernorm(sd, f"{pfx}.token_norm"),
        "trunk": L.stack_params(
            [
                _convert_block(sd, f"{pfx}.trunk.{i}", qk_norm=False, ls=True)
                for i in range(4)
            ]
        ),
        "trunk_norm": t_layernorm(sd, f"{pfx}.trunk_norm"),
    }


def convert_da3(sd: Mapping[str, np.ndarray], cfg: DA3Config) -> dict:
    out = {
        "backbone": _convert_aavit(sd, cfg, "backbone.pretrained"),
        "head": _convert_dualdpt(sd, cfg, "head"),
        "cam_dec": convert_camera_dec(sd),
    }
    if "head.scratch.sky_output_conv2.0.weight" in sd:  # mono/metric DPT
        out["head"]["sky_conv2a"] = t_conv2d(sd, "head.scratch.sky_output_conv2.0")
        out["head"]["sky_conv2b"] = t_conv2d(sd, "head.scratch.sky_output_conv2.2")
    if "cam_enc.token_norm.weight" in sd:
        out["cam_enc"] = convert_camera_enc(sd)
    return out


def convert_da3_mono(sd: Mapping[str, np.ndarray], cfg: DA3Config) -> dict:
    """da3mono/da3metric checkpoints: plain trunk + single DPT w/ sky head.

    Reference module tree per ``configs/da3mono-large.yaml``: all 24 backbone
    blocks are plain DINOv2 blocks (``alt_start: -1``) and the head is
    ``model/dpt.py::DPT`` (same scratch key layout as the DualDPT main
    branch, plus ``scratch.sky_output_conv2``).
    """
    import dataclasses

    pfx = "backbone.pretrained"
    trunk_cfg = dataclasses.replace(cfg, alt_start=cfg.depth)
    backbone = _convert_aavit(sd, trunk_cfg, pfx)
    backbone.pop("camera_token", None)
    backbone.pop("blocks_alt", None)
    hp = "head"
    head = {
        "norm": t_layernorm(sd, f"{hp}.norm"),
        "projects": [t_conv2d(sd, f"{hp}.projects.{i}") for i in range(4)],
        "resize0": t_conv_transpose2d(sd, f"{hp}.resize_layers.0"),
        "resize1": t_conv_transpose2d(sd, f"{hp}.resize_layers.1"),
        "resize3": t_conv2d(sd, f"{hp}.resize_layers.3"),
        "layer_rn": [t_conv2d(sd, f"{hp}.scratch.layer{i + 1}_rn") for i in range(4)],
        "refinenet1": _convert_fusion(sd, f"{hp}.scratch.refinenet1"),
        "refinenet2": _convert_fusion(sd, f"{hp}.scratch.refinenet2"),
        "refinenet3": _convert_fusion(sd, f"{hp}.scratch.refinenet3"),
        "refinenet4": _convert_fusion(sd, f"{hp}.scratch.refinenet4"),
        "output_conv1": t_conv2d(sd, f"{hp}.scratch.output_conv1"),
        "output_conv2a": t_conv2d(sd, f"{hp}.scratch.output_conv2.0"),
        "output_conv2b": t_conv2d(sd, f"{hp}.scratch.output_conv2.2"),
        "sky_conv2a": t_conv2d(sd, f"{hp}.scratch.sky_output_conv2.0"),
        "sky_conv2b": t_conv2d(sd, f"{hp}.scratch.sky_output_conv2.2"),
    }
    return {"backbone": backbone, "head": head}
