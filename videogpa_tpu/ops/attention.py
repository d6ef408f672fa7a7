"""Multi-head attention: Pallas TPU flash kernel + XLA reference.

Replaces the reference's ``F.scaled_dot_product_attention`` call sites
(``vggt/layers/attention.py:61``, diffusers CogVideoX attention, Wan blocks)
with an HBM-bandwidth-optimal online-softmax kernel. Non-causal, bidirectional
(every attention in VideoGPA is full bidirectional — SURVEY.md §5).

Design:
- fwd: grid (BH, num_q_blocks, num_kv_blocks); f32 accumulation in VMEM
  scratch; logsumexp saved for the backward pass.
- bwd: two kernels — dq (accumulate over kv blocks) and dk/dv (grid transposed,
  accumulate over q blocks). Standard FlashAttention-2 recurrences.
- Ragged sequence lengths are handled by padding to the block size with key
  masking inside the kernel (static shapes under jit).

On non-TPU backends (CPU tests) we fall back to the XLA reference, which is
numerically equivalent (same f32 softmax).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# LSE/delta are stored with a small broadcast lane axis so their blocks satisfy
# the TPU (8, 128)-tiling rule: block last dim == array last dim (8).
_LSE_LANES = 8

# Set True (e.g. in tests) to run the Pallas kernels in interpreter mode on CPU.
INTERPRET = False


def mha_reference(
    q: jax.Array, k: jax.Array, v: jax.Array, n_valid: Optional[int] = None
) -> jax.Array:
    """XLA attention. q,k,v: (B, H, N, D). Softmax in f32."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if n_valid is not None and n_valid != k.shape[2]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
        s = jnp.where(col < n_valid, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc, m_s, l_s, *, scale, n_valid, block_k):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_s[:] = jnp.full_like(m_s, _NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)

    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0].astype(jnp.float32)  # (BK, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, BK)

    if n_valid % block_k != 0:  # skip the mask pass when block-aligned
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
        s = jnp.where(col < n_valid, s, _NEG_INF)

    m_prev = m_s[:, :1]  # (BQ, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_s[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)

    acc[:] = acc[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_s[:] = jnp.broadcast_to(m_new, m_s.shape)
    l_s[:] = jnp.broadcast_to(l_new, l_s.shape)

    @pl.when(j == nk - 1)
    def _():
        l = l_s[:, :1]
        o_ref[0] = (acc[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        lse = m_s[:, :1] + jnp.log(jnp.maximum(l, 1e-30))  # (BQ, 1)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _flash_fwd(q, k, v, n_valid, block_q, block_k):
    BH, N, D = q.shape
    Nk = k.shape[1]
    scale = D ** -0.5
    grid = (BH, pl.cdiv(N, block_q), pl.cdiv(Nk, block_k))

    kernel = functools.partial(
        _fwd_kernel, scale=scale, n_valid=n_valid, block_k=block_k
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, _LSE_LANES), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, N, D), q.dtype),
            jax.ShapeDtypeStruct((BH, N, _LSE_LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# Pallas backward
# ---------------------------------------------------------------------------

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc,
               *, scale, n_valid, block_k):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse_ref[0][:, :1])
    if n_valid % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
        p = jnp.where(col < n_valid, p, 0.0)

    do = do_ref[0].astype(jnp.float32)
    dp = jax.lax.dot_general(
        do, v_ref[0].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0][:, :1]) * scale
    acc[:] = acc[:] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = acc[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                dk_acc, dv_acc, *, scale, n_valid, block_k):
    i = pl.program_id(2)  # q block index (innermost for accumulation)
    nq = pl.num_programs(2)
    j = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse_ref[0][:, :1])
    if n_valid % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
        p = jnp.where(col < n_valid, p, 0.0)

    do = do_ref[0].astype(jnp.float32)
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v_ref[0].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0][:, :1]) * scale
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd(res, g, block_q, block_k):
    q, k, v, out, lse, n_valid = res
    BH, N, D = q.shape
    Nk = k.shape[1]
    scale = D ** -0.5
    delta = jnp.sum(
        out.astype(jnp.float32) * g.astype(jnp.float32), axis=-1, keepdims=True
    )  # (BH, N, 1)
    delta = jnp.broadcast_to(delta, delta.shape[:2] + (_LSE_LANES,))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, n_valid=n_valid, block_k=block_k),
        grid=(BH, pl.cdiv(N, block_q), pl.cdiv(Nk, block_k)),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, _LSE_LANES), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, _LSE_LANES), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, N, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(q, k, v, g, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, n_valid=n_valid, block_k=block_k),
        grid=(BH, pl.cdiv(Nk, block_k), pl.cdiv(N, block_q)),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_q, D), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, _LSE_LANES), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, _LSE_LANES), lambda b, j, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Nk, D), k.dtype),
            jax.ShapeDtypeStruct((BH, Nk, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(q, k, v, g, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, n_valid, block_q, block_k):
    out, _ = _flash_fwd(q, k, v, n_valid, block_q, block_k)
    return out


def _flash_vjp_fwd(q, k, v, n_valid, block_q, block_k):
    out, lse = _flash_fwd(q, k, v, n_valid, block_q, block_k)
    return out, (q, k, v, out, lse, n_valid)


def _flash_vjp_bwd(n_valid, block_q, block_k, res, g):
    res = res[:4] + (res[4], n_valid)
    dq, dk, dv = _flash_bwd(res, g, block_q, block_k)
    return dq, dk, dv


_flash.defvjp(
    lambda q, k, v, n_valid, bq, bk: _flash_vjp_fwd(q, k, v, n_valid, bq, bk),
    lambda n_valid, bq, bk, res, g: _flash_vjp_bwd(n_valid, bq, bk, res, g),
)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    impl: str = "auto",
    block_q: int = 1024,
    block_k: int = 1024,
) -> jax.Array:
    """Bidirectional multi-head attention.

    Args:
        q, k, v: (B, num_heads, N, head_dim). Self- or cross-attention
            (k/v may have a different sequence length than q).
        impl: "auto" (flash on TPU, XLA elsewhere), "flash", or "xla".

    Returns:
        (B, num_heads, Nq, head_dim), dtype of q.
    """
    if impl == "auto":
        impl = "flash" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return mha_reference(q, k, v)

    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    bq = min(block_q, _round_up(Nq, 128))
    bk = min(block_k, _round_up(Nk, 128))
    Nq_p, Nk_p = _round_up(Nq, bq), _round_up(Nk, bk)

    def pad(x, n_to):
        n = x.shape[2]
        if n == n_to:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_to - n), (0, 0)))

    qp = pad(q, Nq_p).reshape(B * H, Nq_p, D)
    kp = pad(k, Nk_p).reshape(B * H, Nk_p, D)
    vp = pad(v, Nk_p).reshape(B * H, Nk_p, D)

    out = _flash(qp, kp, vp, Nk, bq, bk)
    return out.reshape(B, H, Nq_p, D)[:, :, :Nq]
