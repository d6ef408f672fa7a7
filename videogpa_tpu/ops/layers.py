"""Functional NN primitives with explicit parameter pytrees.

Models in this framework are plain functions over nested-dict parameter
pytrees (no Module objects). This keeps three things trivial that matter on
TPU: (1) torch-checkpoint conversion is a key mapping, (2) sharding is a
pytree of PartitionSpecs mirroring the params, (3) ``lax.scan`` over stacked
per-layer params gives O(1) compile time for deep DiTs.

Compute dtype policy: params are stored in ``param_dtype`` (default float32),
matmuls run in the caller's activation dtype (bfloat16 on TPU) with float32
accumulation via ``preferred_element_type``.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def linear_init(
    key: jax.Array,
    in_features: int,
    out_features: int,
    bias: bool = True,
    dtype=jnp.float32,
) -> Params:
    """Kaiming-uniform fan-in init (torch nn.Linear default)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    p = {
        "kernel": jax.random.uniform(
            kw, (in_features, out_features), dtype, -bound, bound
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(kb, (out_features,), dtype, -bound, bound)
    return p


def layernorm_init(dim: int, dtype=jnp.float32, affine: bool = True) -> Params:
    if not affine:
        return {}
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def conv2d_init(
    key: jax.Array,
    in_ch: int,
    out_ch: int,
    kernel_size,
    bias: bool = True,
    groups: int = 1,
    dtype=jnp.float32,
) -> Params:
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    kw, kb = jax.random.split(key)
    fan_in = (in_ch // groups) * kernel_size[0] * kernel_size[1]
    bound = 1.0 / math.sqrt(fan_in)
    # HWIO layout
    p = {
        "kernel": jax.random.uniform(
            kw, kernel_size + (in_ch // groups, out_ch), dtype, -bound, bound
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(kb, (out_ch,), dtype, -bound, bound)
    return p


# ---------------------------------------------------------------------------
# Forward ops
# ---------------------------------------------------------------------------

def linear(p: Params, x: jax.Array) -> jax.Array:
    if "w_int8" in p:  # W8A8 inference mode (ops/quant.py)
        from videogpa_tpu.ops.quant import linear_w8a8

        return linear_w8a8(p, x)
    y = jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def layernorm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if "scale" in p:
        y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def rmsnorm(p: Params, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    if "scale" in p:
        y = y * p["scale"].astype(jnp.float32)
    return y.astype(x.dtype)


def gelu(x: jax.Array, approximate: bool = False) -> jax.Array:
    return jax.nn.gelu(x, approximate=approximate)


def mlp_init(
    key: jax.Array,
    in_features: int,
    hidden_features: int,
    out_features: Optional[int] = None,
    bias: bool = True,
    dtype=jnp.float32,
) -> Params:
    k1, k2 = jax.random.split(key)
    out_features = out_features or in_features
    return {
        "fc1": linear_init(k1, in_features, hidden_features, bias, dtype),
        "fc2": linear_init(k2, hidden_features, out_features, bias, dtype),
    }


def mlp(p: Params, x: jax.Array, act: Callable = gelu) -> jax.Array:
    return linear(p["fc2"], act(linear(p["fc1"], x)))


def swiglu_hidden(dim: int, mlp_ratio: float = 4.0) -> int:
    """SwiGLUFFNFused hidden width: 2/3 of the MLP hidden, rounded up to 8
    (reference DINOv2 ``layers/swiglu_ffn.py:58``)."""
    return (int(int(dim * mlp_ratio) * 2 / 3) + 7) // 8 * 8


def swiglu_init(
    key: jax.Array,
    in_features: int,
    hidden_features: int,
    out_features: Optional[int] = None,
    bias: bool = True,
    dtype=jnp.float32,
) -> Params:
    k1, k2 = jax.random.split(key)
    out_features = out_features or in_features
    return {
        "w12": linear_init(k1, in_features, 2 * hidden_features, bias, dtype),
        "w3": linear_init(k2, hidden_features, out_features, bias, dtype),
    }


def swiglu(p: Params, x: jax.Array) -> jax.Array:
    """silu(x W1) * (x W2) -> W3 (reference ``layers/swiglu_ffn.py:29-33``)."""
    x12 = linear(p["w12"], x)
    x1, x2 = jnp.split(x12, 2, axis=-1)
    return linear(p["w3"], jax.nn.silu(x1) * x2)


def conv2d(
    p: Params,
    x: jax.Array,
    stride=1,
    padding=0,
    groups: int = 1,
) -> jax.Array:
    """NCHW conv with HWIO kernel (torch padding semantics)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)[None, :, None, None]
    return y.astype(x.dtype)


def conv_transpose2d(p: Params, x: jax.Array, stride: int) -> jax.Array:
    """NCHW transposed conv with kernel_size == stride, padding 0.

    Exactly matches torch ``ConvTranspose2d(k, stride=k, padding=0)`` used by
    the DPT resize pyramid (reference ``vggt/heads/dpt_head.py:76-84``):
    each input pixel expands to a k x k block via an outer product with the
    (non-flipped) kernel. Implemented as a single einsum (pure MXU matmul)
    rather than a dilated convolution. Kernel layout HWIO: (k, k, in, out).
    """
    k = stride
    w = p["kernel"].astype(x.dtype)
    assert w.shape[0] == k and w.shape[1] == k, "kernel_size must equal stride"
    B, C, H, W = x.shape
    O = w.shape[-1]
    y = jnp.einsum("bihw,xyio->bohxwy", x, w, preferred_element_type=jnp.float32)
    y = y.reshape(B, O, H * k, W * k)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)[None, :, None, None]
    return y.astype(x.dtype)


def stack_params(param_list: Sequence[Params]) -> Params:
    """Stack a list of identical pytrees along a new leading axis (for scan)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *param_list)
