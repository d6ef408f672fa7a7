"""VGGT prediction heads: iterative camera head + DPT dense heads (JAX).

Parity targets:
- CameraHead: reference ``vggt/heads/camera_head.py:19-149`` — 4-iteration
  AdaLN-modulated refinement over the camera token, 9-D absT_quaR_FoV output.
- DPTHead: reference ``vggt/heads/dpt_head.py:21-484`` — multi-scale token
  projection pyramid + refinenet fusion + activation head.
- activations: reference ``vggt/heads/head_act.py``.

Heads run in float32 (the reference disables autocast for them,
``vggt/models/vggt.py:65-83``).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from videogpa_tpu.models.vggt.config import VGGTConfig
from videogpa_tpu.ops import layers as L
from videogpa_tpu.ops.resize import resize_bilinear
from videogpa_tpu.ops.transformer import BlockConfig, block_apply, block_init


# ---------------------------------------------------------------------------
# Activations (reference vggt/heads/head_act.py)
# ---------------------------------------------------------------------------

def inverse_log_transform(y: jax.Array) -> jax.Array:
    return jnp.sign(y) * jnp.expm1(jnp.abs(y))


def activate_pose(enc: jax.Array, fl_act: str = "relu") -> jax.Array:
    T, quat, fl = enc[..., :3], enc[..., 3:7], enc[..., 7:]
    if fl_act == "relu":
        fl = jax.nn.relu(fl)
    return jnp.concatenate([T, quat, fl], axis=-1)


def _activate_values(xyz: jax.Array, activation: str) -> jax.Array:
    if activation == "inv_log":
        return inverse_log_transform(xyz)
    if activation == "exp":
        return jnp.exp(xyz)
    if activation == "relu":
        return jax.nn.relu(xyz)
    if activation == "norm_exp":
        d = jnp.maximum(jnp.linalg.norm(xyz, axis=-1, keepdims=True), 1e-8)
        return xyz / d * jnp.expm1(d)
    if activation == "linear":
        return xyz
    raise ValueError(f"Unknown activation: {activation}")


def activate_head(
    out: jax.Array, activation: str, conf_activation: str
) -> Tuple[jax.Array, jax.Array]:
    """out: (B, C, H, W) -> ((B, H, W, C-1) points/depth, (B, H, W) conf)."""
    fmap = jnp.transpose(out, (0, 2, 3, 1)).astype(jnp.float32)
    xyz, conf = fmap[..., :-1], fmap[..., -1]
    pts = _activate_values(xyz, activation)

    if conf_activation == "expp1":
        conf_out = 1 + jnp.exp(conf)
    elif conf_activation == "expp0":
        conf_out = jnp.exp(conf)
    elif conf_activation == "sigmoid":
        conf_out = jax.nn.sigmoid(conf)
    else:
        raise ValueError(f"Unknown conf_activation: {conf_activation}")
    return pts, conf_out


def _activate_single(out: jax.Array, activation: str) -> jax.Array:
    """Activate a conf-less head output: (B, C, H, W) -> (B, H, W, C)."""
    fmap = jnp.transpose(out, (0, 2, 3, 1)).astype(jnp.float32)
    return _activate_values(fmap, activation)


# ---------------------------------------------------------------------------
# Camera head
# ---------------------------------------------------------------------------

def _camera_block_cfg(cfg: VGGTConfig) -> BlockConfig:
    return BlockConfig(
        dim=cfg.tokens_dim, num_heads=cfg.num_heads, mlp_ratio=4.0, init_values=0.01
    )


def camera_head_init(key: jax.Array, cfg: VGGTConfig, dtype=jnp.float32) -> dict:
    dim = cfg.tokens_dim
    keys = jax.random.split(key, cfg.camera_trunk_depth + 4)
    bcfg = _camera_block_cfg(cfg)
    return {
        "trunk": L.stack_params(
            [block_init(keys[i], bcfg, dtype) for i in range(cfg.camera_trunk_depth)]
        ),
        "token_norm": L.layernorm_init(dim, dtype),
        "trunk_norm": L.layernorm_init(dim, dtype),
        "empty_pose_tokens": jnp.zeros((1, 1, 9), dtype),
        "embed_pose": L.linear_init(keys[-1], 9, dim, dtype=dtype),
        "poseLN_modulation": L.linear_init(keys[-2], dim, 3 * dim, dtype=dtype),
        "pose_branch": L.mlp_init(keys[-3], dim, dim // 2, 9, dtype=dtype),
    }


def camera_head_forward(
    params: dict, tokens_last: jax.Array, cfg: VGGTConfig, attn_impl: str = "auto"
) -> List[jax.Array]:
    """tokens_last: (B, S, 2C) camera tokens from the final aggregator layer.

    Returns a list of (B, S, 9) pose encodings, one per refinement iteration.
    """
    bcfg = _camera_block_cfg(cfg)
    pose_tokens = L.layernorm(params["token_norm"], tokens_last)
    B, S, C = pose_tokens.shape

    pred = None
    preds = []
    for _ in range(cfg.camera_iterations):
        if pred is None:
            inp = jnp.broadcast_to(params["empty_pose_tokens"], (B, S, 9))
        else:
            inp = jax.lax.stop_gradient(pred)
        module_input = L.linear(params["embed_pose"], inp)
        mod = L.linear(params["poseLN_modulation"], jax.nn.silu(module_input))
        shift, scale, gate = jnp.split(mod, 3, axis=-1)

        normed = L.layernorm(
            {}, pose_tokens, eps=1e-6
        )  # adaln: no affine params
        modulated = gate * (normed * (1 + scale) + shift) + pose_tokens

        def body(x, layer_params):
            return block_apply(layer_params, x, bcfg, attn_impl=attn_impl), None

        modulated, _ = jax.lax.scan(body, modulated, params["trunk"])
        delta = L.mlp(params["pose_branch"], L.layernorm(params["trunk_norm"], modulated))
        pred = delta if pred is None else pred + delta
        preds.append(activate_pose(pred, fl_act="relu"))
    return preds


# ---------------------------------------------------------------------------
# DPT head
# ---------------------------------------------------------------------------

def dpt_head_init(
    key: jax.Array, cfg: VGGTConfig, output_dim: int, dtype=jnp.float32,
    features: int = None, feature_only: bool = False, dim_in: int = None,
    sky_head: bool = False, input_norm: bool = True,
) -> dict:
    oc = cfg.dpt_out_channels
    f = features or cfg.dpt_features
    keys = iter(jax.random.split(key, 34))
    dim_in = dim_in or cfg.tokens_dim

    def rcu():
        return {
            "conv1": L.conv2d_init(next(keys), f, f, 3, dtype=dtype),
            "conv2": L.conv2d_init(next(keys), f, f, 3, dtype=dtype),
        }

    def fusion(has_residual: bool):
        p = {"out_conv": L.conv2d_init(next(keys), f, f, 1, dtype=dtype), "rcu2": rcu()}
        if has_residual:
            p["rcu1"] = rcu()
        return p

    return {
        # {} = Identity (DA3 mono DPT norm_type="idt", model/dpt.py:88-91)
        "norm": L.layernorm_init(dim_in, dtype) if input_norm else {},
        "projects": [
            L.conv2d_init(next(keys), dim_in, c, 1, dtype=dtype) for c in oc
        ],
        "resize0": L.conv2d_init(next(keys), oc[0], oc[0], 4, dtype=dtype),  # convT s4
        "resize1": L.conv2d_init(next(keys), oc[1], oc[1], 2, dtype=dtype),  # convT s2
        "resize3": L.conv2d_init(next(keys), oc[3], oc[3], 3, dtype=dtype),  # conv s2
        "layer_rn": [
            L.conv2d_init(next(keys), c, f, 3, bias=False, dtype=dtype) for c in oc
        ],
        "refinenet1": fusion(True),
        "refinenet2": fusion(True),
        "refinenet3": fusion(True),
        "refinenet4": fusion(False),
    } | (
        {"output_conv1": L.conv2d_init(next(keys), f, f, 3, dtype=dtype)}
        if feature_only
        else {
            "output_conv1": L.conv2d_init(next(keys), f, f // 2, 3, dtype=dtype),
            "output_conv2a": L.conv2d_init(next(keys), f // 2, 32, 3, dtype=dtype),
            "output_conv2b": L.conv2d_init(next(keys), 32, output_dim, 1, dtype=dtype),
        }
    ) | (
        # DA3 mono DPT sky branch (reference da3 model/dpt.py:146-154):
        # a second head off the shared post-output_conv1 features
        {
            "sky_conv2a": L.conv2d_init(next(keys), f // 2, 32, 3, dtype=dtype),
            "sky_conv2b": L.conv2d_init(next(keys), 32, 1, 1, dtype=dtype),
        }
        if sky_head
        else {}
    )


def _uv_pos_embed(ph: int, pw: int, channels: int, W: int, H: int) -> jax.Array:
    """UV-grid sinusoidal pos embed, (channels, ph, pw), scaled by 0.1.

    Reference ``vggt/heads/utils.py:66-110`` (create_uv_grid +
    position_grid_to_embed with omega_0 = 100).
    """
    aspect = W / H
    diag = (aspect ** 2 + 1.0) ** 0.5
    span_x, span_y = aspect / diag, 1.0 / diag
    xs = jnp.linspace(-span_x * (pw - 1) / pw, span_x * (pw - 1) / pw, pw)
    ys = jnp.linspace(-span_y * (ph - 1) / ph, span_y * (ph - 1) / ph, ph)
    uu, vv = jnp.meshgrid(xs, ys)  # (ph, pw) each

    def sincos(pos_flat, dim):
        omega = jnp.arange(dim // 2, dtype=jnp.float64 if False else jnp.float32)
        omega = omega / (dim / 2.0)
        omega = 1.0 / (100.0 ** omega)
        out = pos_flat[:, None] * omega[None]
        return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)

    half = channels // 2
    emb_x = sincos(uu.reshape(-1), half)
    emb_y = sincos(vv.reshape(-1), half)
    emb = jnp.concatenate([emb_x, emb_y], axis=-1).reshape(ph, pw, channels)
    return jnp.transpose(emb, (2, 0, 1)) * 0.1


def _rcu(p: dict, x: jax.Array, inplace_relu: bool = True) -> jax.Array:
    # NOTE: VGGT's ResidualConvUnit uses ReLU(inplace=True), which mutates
    # its input before the skip-add — so the residual branch adds relu(x),
    # NOT x (reference ``vggt/heads/dpt_head.py:368-383``). DA3's fusion
    # blocks construct ReLU(inplace=False) (``model/dpt.py:342-352``), so the
    # skip adds raw x there — select with ``inplace_relu``.
    xr = jax.nn.relu(x)
    out = L.conv2d(p["conv1"], xr, padding=1)
    out = jax.nn.relu(out)
    out = L.conv2d(p["conv2"], out, padding=1)
    return out + (xr if inplace_relu else x)


def _fusion(p: dict, x: jax.Array, residual=None, size=None,
            inplace_relu: bool = True) -> jax.Array:
    out = x
    if residual is not None:
        out = out + _rcu(p["rcu1"], residual, inplace_relu)
    out = _rcu(p["rcu2"], out, inplace_relu)
    if size is None:
        size = (out.shape[-2] * 2, out.shape[-1] * 2)
    out = resize_bilinear(out, size, align_corners=True)
    return L.conv2d(p["out_conv"], out)


def dpt_head_forward(
    params: dict,
    layer_outputs: jax.Array,
    cfg: VGGTConfig,
    img_hw: Tuple[int, int],
    activation: str = "exp",
    conf_activation: str = "expp1",
    feature_only: bool = False,
    down_ratio: int = 1,
    use_pos_embed: bool = True,
    with_conf: bool = True,
    inplace_relu: bool = True,
    chunk_size: int = 8,
    compute_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """DPT dense prediction.

    Args:
        layer_outputs: (depth, B, S, P, 2C) aggregator outputs.
        img_hw: original (H, W).
        chunk_size: frames per inner step — the full-resolution fusion
            features are the peak-memory tensor (reference chunks at 8,
            ``vggt/heads/dpt_head.py:115-171``); the B*S axis is processed
            in ``lax.map`` chunks of the largest divisor <= chunk_size.
        compute_dtype: dtype of the projection/fusion conv pyramid. f32
            default = the reference's autocast-off policy
            (``vggt/models/vggt.py:65-83``); activations
            (``activate_head``) always compute in f32 regardless. Pass
            bf16 params to run the pyramid in bf16 on TPU.

    Returns:
        (preds (B, S, H, W, out-1), conf (B, S, H, W)).
    """
    H, W = img_hw
    _, B, S, P, C2 = layer_outputs.shape
    BS = B * S
    chunk = max(
        (c for c in range(1, min(chunk_size, BS) + 1) if BS % c == 0),
        default=BS,
    )
    if compute_dtype != jnp.float32:
        # cast the conv pyramid weights once (fused by XLA); f32 x bf16
        # would otherwise promote every conv back to f32
        params = jax.tree.map(
            lambda a: a.astype(compute_dtype)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            params,
        )
    flat = layer_outputs.reshape(layer_outputs.shape[0], BS, P, C2)

    def one_chunk(tokens):  # (depth, chunk, P, C2)
        return _dpt_core(
            params, tokens, cfg, img_hw, activation, conf_activation,
            feature_only, down_ratio, use_pos_embed, with_conf, inplace_relu,
            compute_dtype,
        )

    if chunk == BS:
        outs = one_chunk(flat)
    else:
        g = BS // chunk
        grouped = flat.reshape(flat.shape[0], g, chunk, P, C2)
        # fori_loop + dynamic_update_slice instead of lax.map: map would
        # stack chunk outputs as (g, chunk, H, W), and XLA:TPU lays that
        # buffer out with (g, chunk) as the tiled minor dims — a 25.6x
        # padding expansion (measured 2.05 GiB for 82 MB of f32 at
        # K=8 x 10 frames @ 518^2). Writing each chunk into a flat
        # (B*S, ...) accumulator keeps the spatial dims minor.
        out_sds = jax.eval_shape(
            one_chunk, jax.ShapeDtypeStruct((flat.shape[0], chunk, P, C2),
                                            flat.dtype))
        accs = jax.tree.map(
            lambda s: jnp.zeros((BS, *s.shape[1:]), s.dtype), out_sds)

        def body(i, accs):
            chunk_out = one_chunk(
                jax.lax.dynamic_index_in_dim(grouped, i, axis=1,
                                             keepdims=False))
            return jax.tree.map(
                lambda acc, o: jax.lax.dynamic_update_slice_in_dim(
                    acc, o, i * chunk, axis=0),
                accs, chunk_out)

        outs = jax.lax.fori_loop(0, g, body, accs)
    if feature_only:
        return outs.reshape(B, S, *outs.shape[1:])
    unflat = tuple(
        o.reshape(B, S, *o.shape[1:]) if o is not None else None for o in outs
    )
    return unflat if len(unflat) == 3 else unflat[:2]


def _dpt_core(
    params, layer_outputs, cfg, img_hw, activation, conf_activation,
    feature_only, down_ratio, use_pos_embed, with_conf, inplace_relu,
    compute_dtype=jnp.float32,
):
    """Single-chunk DPT body. layer_outputs: (depth, K, P, C2) flat tokens."""
    H, W = img_hw
    ph, pw = H // cfg.patch_size, W // cfg.patch_size
    _, K, P, C2 = layer_outputs.shape

    pyramid = []
    for i, layer_idx in enumerate(cfg.dpt_intermediate_layers):
        x = layer_outputs[layer_idx][:, cfg.patch_start_idx :]
        x = x.reshape(K, ph * pw, C2).astype(compute_dtype)
        if params["norm"]:  # DA3 mono DPT uses norm_type="idt" (Identity)
            x = L.layernorm(params["norm"], x)
        x = jnp.transpose(x, (0, 2, 1)).reshape(K, C2, ph, pw)
        x = L.conv2d(params["projects"][i], x)
        if use_pos_embed:
            x = x + _uv_pos_embed(ph, pw, x.shape[1], W, H).astype(x.dtype)
        if i == 0:
            x = L.conv_transpose2d(params["resize0"], x, stride=4)
        elif i == 1:
            x = L.conv_transpose2d(params["resize1"], x, stride=2)
        elif i == 3:
            x = L.conv2d(params["resize3"], x, stride=2, padding=1)
        pyramid.append(x)

    l1, l2, l3, l4 = [
        L.conv2d(params["layer_rn"][i], p, padding=1) for i, p in enumerate(pyramid)
    ]
    out = _fusion(params["refinenet4"], l4, size=l3.shape[-2:],
                  inplace_relu=inplace_relu)
    out = _fusion(params["refinenet3"], out, l3, size=l2.shape[-2:],
                  inplace_relu=inplace_relu)
    out = _fusion(params["refinenet2"], out, l2, size=l1.shape[-2:],
                  inplace_relu=inplace_relu)
    out = _fusion(params["refinenet1"], out, l1, inplace_relu=inplace_relu)
    out = L.conv2d(params["output_conv1"], out, padding=1)

    out_hw = (ph * cfg.patch_size // down_ratio, pw * cfg.patch_size // down_ratio)
    out = resize_bilinear(out, out_hw, align_corners=True)
    if use_pos_embed:
        out = out + _uv_pos_embed(
            out.shape[-2], out.shape[-1], out.shape[1], W, H
        ).astype(out.dtype)
    if feature_only:
        return out
    feat = out
    out = L.conv2d(params["output_conv2a"], feat, padding=1)
    out = jax.nn.relu(out)
    out = L.conv2d(params["output_conv2b"], out)

    if with_conf:
        preds, conf = activate_head(out, activation, conf_activation)
    else:  # mono DPT: all channels are the prediction (da3 model/dpt.py:253-256)
        preds = _activate_single(out, activation)
        conf = None
    if "sky_conv2a" not in params:
        return preds, conf
    s = jax.nn.relu(L.conv2d(params["sky_conv2a"], feat, padding=1))
    s = L.conv2d(params["sky_conv2b"], s)
    sky = jax.nn.relu(s[:, 0])  # sky_activation="relu" (da3 model/dpt.py:58)
    return preds, conf, sky
