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

_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc, m_s, l_s,
                *, n_valid, nk_pad, block_k, head_dim, aug, with_lse=True):
    """Online-softmax forward, VPU-lean formulation.

    The head is VPU-bound at head_dim 64 (the exp/softmax work per MXU flop
    is high), so: scores are computed in base-2 with scale*log2(e) folded
    into q ahead of the kernel (exp2 saves the per-element ln2 multiply);
    when ``aug`` the caller appended a ones-column to V so the softmax
    denominator accumulates inside the PV matmul's otherwise-idle output
    lanes instead of a separate VPU row-sum; and key masking is compiled in
    only when the valid prefix is shorter than the padded key length
    (``nk_pad`` = the grid's block-padded Nk — comparing against it, not
    ``n_valid % block_k``, keeps zero-pad keys masked even when n_valid is
    block-aligned, e.g. a ring-attention partial shard padded past it).
    """
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_s[:] = jnp.full_like(m_s, _NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)

    # bf16 operands + f32 accumulation: native MXU mode
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, BK), base-2 scaled scores

    if n_valid != nk_pad:  # skip the mask pass when every padded key is valid
        # row-bias formulation: build the (1, BK) mask row cheaply, then one
        # broadcast add — ~3x fewer VPU ops than iota+cmp+select at (BQ, BK)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1) + j * block_k
        bias = jnp.where(col < n_valid, 0.0, _NEG_INF)
        s = s + bias

    m_prev = m_s[:, :1]  # (BQ, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)

    acc[:] = acc[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if not aug:  # denominator via explicit row-sum (aug: rides in acc)
        l_s[:] = l_s[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_s[:] = jnp.broadcast_to(m_new, m_s.shape)

    @pl.when(j == nk - 1)
    def _():
        l = acc[:, head_dim : head_dim + 1] if aug else l_s[:, :1]
        l = jnp.maximum(l, 1e-30)
        o_ref[0] = (acc[:, :head_dim] / l).astype(o_ref.dtype)
        if with_lse:
            # natural-log lse from the base-2 running stats
            lse = (m_s[:, :1] + jnp.log2(l)) * _LN2
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _flash_fwd(q, k, v, n_valid, block_q, block_k, with_lse=True):
    """with_lse=False drops the logsumexp output entirely — the inference
    path (custom_vjp primal, no grad) doesn't need it, and the extra output
    pipeline costs real bandwidth per grid step."""
    BH, N, D = q.shape
    Nk = k.shape[1]
    scale = D ** -0.5
    grid = (BH, pl.cdiv(N, block_q), pl.cdiv(Nk, block_k))

    # fold scale and the base-2 conversion into q (one cheap XLA-fused pass)
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)

    # ones-column trick: when D leaves output lanes idle (D % 128 != 0),
    # appending [ones] to V makes the PV matmul produce the softmax
    # denominator for free in lane D. For lane-full D it would add a whole
    # extra MXU pass, so fall back to the VPU row-sum.
    aug = (D % 128) != 0
    if aug:
        D_aug = _round_up(D + 1, 128)
        pad_cols = jnp.zeros((BH, Nk, D_aug - D - 1), v.dtype)
        v_in = jnp.concatenate(
            [v, jnp.ones((BH, Nk, 1), v.dtype), pad_cols], axis=-1
        )
    else:
        D_aug = D
        v_in = v

    kernel = functools.partial(
        _fwd_kernel, n_valid=n_valid, nk_pad=_round_up(Nk, block_k),
        block_k=block_k, head_dim=D, aug=aug, with_lse=with_lse,
    )
    in_specs = [
        pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_k, D_aug), lambda b, i, j: (b, j, 0)),
    ]
    o_spec = pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0))
    o_shape = jax.ShapeDtypeStruct((BH, N, D), q.dtype)
    lse_spec = pl.BlockSpec((1, block_q, _LSE_LANES), lambda b, i, j: (b, i, 0))
    lse_shape = jax.ShapeDtypeStruct((BH, N, _LSE_LANES), jnp.float32)
    scratch = [
        pltpu.VMEM((block_q, D_aug), jnp.float32),
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, 128), jnp.float32),
    ]
    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    if with_lse:
        out, lse = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs,
            out_specs=[o_spec, lse_spec], out_shape=[o_shape, lse_shape],
            scratch_shapes=scratch, compiler_params=cparams,
            interpret=INTERPRET,
        )(q, k, v_in)
        return out, lse

    def kernel_nolse(q_ref, k_ref, v_ref, o_ref, acc, m_s, l_s):
        kernel(q_ref, k_ref, v_ref, o_ref, None, acc, m_s, l_s)

    out = pl.pallas_call(
        kernel_nolse, grid=grid, in_specs=in_specs,
        out_specs=o_spec, out_shape=o_shape,
        scratch_shapes=scratch, compiler_params=cparams,
        interpret=INTERPRET,
    )(q, k, v_in)
    return out, None


# ---------------------------------------------------------------------------
# Pallas forward, transposed lagged-max variant (head_dim < 128)
# ---------------------------------------------------------------------------
#
# At head_dim 64 the PV matmul's 64-wide output half-fills the 128-lane MXU;
# computing O^T = V^T P^T instead makes the output (D, BQ) — full lanes, full
# BK-deep contraction (measured floor 93 vs 74 TF/s on v5e). The second,
# larger win is breaking the softmax serialization: the classic online update
# stalls the pipeline on max(s) before exp can start (measured 70 -> 85 TF/s
# with the dependency removed). The lagged-max reformulation is algebraically
# identical:
#
#   acc_j = alpha_j * (acc_{j-1} + V^T exp2(s_j - M_{j-1})),
#   alpha_j = exp2(M_{j-1} - M_j)
#
# so the exp uses the PREVIOUS step's running max (available at step start)
# and this step's max reduction overlaps with the PV matmul. exp arguments
# are clamped at _LAG_CLAMP (f32/bf16 overflow safety); the kernel emits the
# largest observed block-to-block max jump, and the wrapper falls back to the
# classic kernel via lax.cond when any jump exceeded the clamp — which needs
# a 2^110 attention-weight ratio between kv blocks, unreachable for trained
# models, so the fallback branch exists for exactness, not for speed.

_LAG_CLAMP = 110.0


def _fwd_kernel_T(qt_ref, k_ref, vt_ref, o_ref, jump_ref, lse_ref, acc, m_s,
                  *, n_valid, nk_pad, block_k, head_dim, with_lse):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    # s^T: (BK, BQ) = K (BK, D) @ Q^T (D, BQ); 64-deep contraction (geometry
    # bound, same as untransposed), full 128+ output lanes
    s = jax.lax.dot_general(
        k_ref[0], qt_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if n_valid != nk_pad:  # kv rows in the transposed layout
        row = jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1), 0) + j * block_k
        s = s + jnp.where(row < n_valid, 0.0, _NEG_INF)
    m_loc = jnp.max(s, axis=0, keepdims=True)  # (1, BQ); overlaps with PV

    @pl.when(j == 0)
    def _():
        # only stalled step: exact local max seeds the running frame
        p = jnp.exp2(s - m_loc)
        acc[:] = jax.lax.dot_general(
            vt_ref[0], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_s[0:1] = m_loc
        m_s[1:2] = jnp.full_like(m_loc, _NEG_INF)  # running max jump

    @pl.when(j > 0)
    def _():
        m_prev = m_s[0:1]
        p = jnp.exp2(jnp.minimum(s - m_prev, _LAG_CLAMP))
        pv = jax.lax.dot_general(
            vt_ref[0], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_new = jnp.maximum(m_prev, m_loc)
        acc[:] = (acc[:] + pv) * jnp.exp2(m_prev - m_new)
        m_s[0:1] = m_new
        m_s[1:2] = jnp.maximum(m_s[1:2], m_loc - m_prev)

    @pl.when(j == nk - 1)
    def _():
        l = jnp.maximum(acc[head_dim : head_dim + 1], 1e-30)  # ones-row of V^T
        o_ref[0] = (acc[:head_dim] / l).T.astype(o_ref.dtype)
        jump_ref[0] = jnp.broadcast_to(m_s[1:2], jump_ref.shape[1:])
        if with_lse:
            lse = (m_s[0:1] + jnp.log2(l)) * _LN2  # (1, BQ)
            lse_ref[0] = jnp.broadcast_to(lse.T, lse_ref.shape[1:])


def _flash_fwd_T(q, k, v, n_valid, block_q, block_k, with_lse=True):
    """Transposed lagged-max forward; returns (out, lse, max_jump, qt, vt).

    qt/vt are returned so the exactness guard can rerun the SAME operands
    through the stalling transposed kernel without rebuilding them."""
    BH, N, D = q.shape
    Nk = k.shape[1]
    scale = D ** -0.5
    qt = jnp.swapaxes(
        (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype), 1, 2
    )  # (BH, D, N)

    # V^T with the softmax denominator riding as a ones ROW at row D
    D_aug = _round_up(D + 1, 8)
    vt = jnp.concatenate(
        [
            jnp.swapaxes(v, 1, 2),
            jnp.ones((BH, 1, Nk), v.dtype),
            jnp.zeros((BH, D_aug - D - 1, Nk), v.dtype),
        ],
        axis=1,
    )
    out, lse, jump = _flash_fwd_T_pre(
        qt, k, vt, n_valid, block_q, block_k, with_lse
    )
    return out, lse, jump, qt, vt


def _flash_fwd_T_pre(qt, k, vt, n_valid, block_q, block_k, with_lse=True):
    """Transposed-kernel forward from PRE-LAID-OUT operands.

    qt: (BH, D, N) — q already scaled by D**-0.5 * log2(e) and transposed;
    vt: (BH, D_aug, Nk) — V^T with the ones denominator row at row D.
    Exists so a (B, N, H, D)-layout caller (``attention(layout="bnhd")``)
    can build each operand with ONE transpose instead of the two the
    classic (B, H, N, D) contract costs (model heads-transpose + the
    swapaxes above) — ~22 ms/step per eliminated transpose type at
    CogVideoX-5B geometry.
    """
    BH, D, N = qt.shape
    Nk = k.shape[1]
    D_aug = vt.shape[1]

    grid = (BH, pl.cdiv(N, block_q), pl.cdiv(Nk, block_k))
    kernel = functools.partial(
        _fwd_kernel_T, n_valid=n_valid, nk_pad=_round_up(Nk, block_k),
        block_k=block_k, head_dim=D, with_lse=with_lse,
    )
    in_specs = [
        pl.BlockSpec((1, D, block_q), lambda b, i, j: (b, 0, i)),
        pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, D_aug, block_k), lambda b, i, j: (b, 0, j)),
    ]
    out_specs = [
        pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, _LSE_LANES, block_q), lambda b, i, j: (b, 0, i)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((BH, N, D), qt.dtype),
        jax.ShapeDtypeStruct((BH, _LSE_LANES, N), jnp.float32),
    ]
    if with_lse:
        out_specs.append(pl.BlockSpec((1, block_q, _LSE_LANES), lambda b, i, j: (b, i, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((BH, N, _LSE_LANES), jnp.float32))

    def wrapped(*refs):
        if with_lse:
            qt_ref, k_ref, vt_ref, o_ref, jump_ref, lse_ref, acc, m_s = refs
        else:
            qt_ref, k_ref, vt_ref, o_ref, jump_ref, acc, m_s = refs
            lse_ref = None
        kernel(qt_ref, k_ref, vt_ref, o_ref, jump_ref, lse_ref, acc, m_s)

    res = pl.pallas_call(
        wrapped, grid=grid, in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((D_aug, block_q), jnp.float32),
            pltpu.VMEM((8, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(qt, k, vt)
    if with_lse:
        out, jumps, lse = res
    else:
        out, jumps = res
        lse = None
    return out, lse, jnp.max(jumps)


def _flash_fwd_guarded(q, k, v, n_valid, block_q, block_k, with_lse=True):
    """Lagged-max fast path with an exactness guard: if any block-to-block
    max jump exceeded the clamp (never for trained models), recompute with
    the clamp-free transposed STALLING kernel on the SAME qt/k/vt operands,
    so the guard costs zero extra HBM. (The fallback used to rebuild the
    classic-layout (q, v_in) operands: D=64 minor pads to 128 lanes there,
    and at CogVideoX1.5 flagship scale those branch buffers alone were
    ~2.1 GiB of dead weight — the failure mode that AOT-OOMed the batched
    CFG pair before ``_flash_fwd_guarded_pre`` got the same fix.)"""
    out, lse, jump, qt, vt = _flash_fwd_T(
        q, k, v, n_valid, block_q, block_k, with_lse
    )
    if with_lse:
        def exact(_):
            return _flash_fwd_T_stall_pre(
                qt, k, vt, n_valid, block_q, block_k, with_lse=True
            )

        return jax.lax.cond(
            jump <= _LAG_CLAMP, lambda ol: ol, exact, (out, lse)
        )

    def exact(_):
        return _flash_fwd_T_stall_pre(qt, k, vt, n_valid, block_q, block_k)

    return jax.lax.cond(jump <= _LAG_CLAMP, lambda o: o, exact, out), None


def _fwd_kernel_T_stall(qt_ref, k_ref, vt_ref, o_ref, lse_ref, acc, m_s,
                        *, n_valid, nk_pad, block_k, head_dim, with_lse):
    """Transposed-layout ONLINE-softmax forward (no lag, no clamp): exact
    for any input magnitude. This is the exactness fallback behind the
    lagged kernel's 2^110 clamp guard — it stalls on max->exp like the
    classic kernel, but consumes the SAME qt/k/vt operands, so the guard
    costs zero extra HBM. (The previous fallback rebuilt classic-layout
    (q, v): at the CogVideoX1.5 flagship shape those branch buffers alone
    were ~2.1 GiB of 2x-lane-padded dead weight — D=64 minor pads to 128 —
    and AOT-OOMed the batched CFG pair.)"""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    s = jax.lax.dot_general(
        k_ref[0], qt_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BK, BQ)
    if n_valid != nk_pad:
        row = jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1), 0) + j * block_k
        s = s + jnp.where(row < n_valid, 0.0, _NEG_INF)
    m_loc = jnp.max(s, axis=0, keepdims=True)  # (1, BQ)

    @pl.when(j == 0)
    def _():
        p = jnp.exp2(s - m_loc)
        acc[:] = jax.lax.dot_general(
            vt_ref[0], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_s[0:1] = m_loc

    @pl.when(j > 0)
    def _():
        m_prev = m_s[0:1]
        m_new = jnp.maximum(m_prev, m_loc)
        p = jnp.exp2(s - m_new)
        pv = jax.lax.dot_general(
            vt_ref[0], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc[:] = acc[:] * jnp.exp2(m_prev - m_new) + pv
        m_s[0:1] = m_new

    @pl.when(j == nk - 1)
    def _():
        l = jnp.maximum(acc[head_dim : head_dim + 1], 1e-30)
        o_ref[0] = (acc[:head_dim] / l).T.astype(o_ref.dtype)
        if with_lse:
            lse = (m_s[0:1] + jnp.log2(l)) * _LN2  # (1, BQ)
            lse_ref[0] = jnp.broadcast_to(lse.T, lse_ref.shape[1:])


def _flash_fwd_T_stall_pre(qt, k, vt, n_valid, block_q, block_k,
                           with_lse=False):
    """Exact (clamp-free) transposed forward from pre-laid-out operands.

    Returns ``out`` (``with_lse=False``) or ``(out, lse)`` — the lse output
    matches the lagged kernel's (BH, N, _LSE_LANES) f32 layout so the two
    can sit on the branches of one ``lax.cond``."""
    BH, D, N = qt.shape
    Nk = k.shape[1]
    D_aug = vt.shape[1]
    grid = (BH, pl.cdiv(N, block_q), pl.cdiv(Nk, block_k))
    kernel = functools.partial(
        _fwd_kernel_T_stall, n_valid=n_valid, nk_pad=_round_up(Nk, block_k),
        block_k=block_k, head_dim=D, with_lse=with_lse,
    )
    in_specs = [
        pl.BlockSpec((1, D, block_q), lambda b, i, j: (b, 0, i)),
        pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, D_aug, block_k), lambda b, i, j: (b, 0, j)),
    ]
    o_spec = pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0))
    o_shape = jax.ShapeDtypeStruct((BH, N, D), qt.dtype)
    scratch = [
        pltpu.VMEM((D_aug, block_q), jnp.float32),
        pltpu.VMEM((8, block_q), jnp.float32),
    ]
    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    if with_lse:
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                o_spec,
                pl.BlockSpec((1, block_q, _LSE_LANES), lambda b, i, j: (b, i, 0)),
            ],
            out_shape=[
                o_shape,
                jax.ShapeDtypeStruct((BH, N, _LSE_LANES), jnp.float32),
            ],
            scratch_shapes=scratch,
            compiler_params=cparams,
            interpret=INTERPRET,
        )(qt, k, vt)

    def kernel_nolse(qt_ref, k_ref, vt_ref, o_ref, acc, m_s):
        kernel(qt_ref, k_ref, vt_ref, o_ref, None, acc, m_s)

    return pl.pallas_call(
        kernel_nolse,
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=o_shape,
        scratch_shapes=scratch,
        compiler_params=cparams,
        interpret=INTERPRET,
    )(qt, k, vt)


def _flash_fwd_guarded_pre(qt, k, vt, n_valid, block_q, block_k):
    """Guarded lagged-max forward from pre-laid-out operands (inference
    only, no lse). The exactness fallback reruns the SAME operands through
    the clamp-free stalling transposed kernel — the branch is unreachable
    for trained models (needs a 2^110 attention-weight ratio between kv
    blocks) and costs no extra HBM."""
    out, _lse, jump = _flash_fwd_T_pre(
        qt, k, vt, n_valid, block_q, block_k, with_lse=False
    )

    def exact(_):
        return _flash_fwd_T_stall_pre(qt, k, vt, n_valid, block_q, block_k)

    return jax.lax.cond(jump <= _LAG_CLAMP, lambda o: o, exact, out)


# ---------------------------------------------------------------------------
# Short-sequence full-softmax kernel, native bnhd layout (inference-only)
# ---------------------------------------------------------------------------
#
# At VGGT frame-attention geometry (40 seqs x 1374 tokens, 16 heads x D=64)
# the transposed lagged-max path runs at 22-23 TF/s end to end while the same
# kernel hits 82.7 at seq 13740 (tools/onchip_agg_split.py). On-chip
# decomposition (tools/onchip_short_attn.py): ~60% is the kernel itself —
# with a single kv block the lagged trick degenerates to the stalled
# max->exp->PV chain — and ~40% is the operand layout tax (qt/vt transposes
# + out transpose), which amortizes at long seq but not here. This kernel
# removes the layout tax entirely: BlockSpecs read q/k/v straight out of the
# (B, N, H*D) projection layout (no materialized transpose anywhere), each
# program holds ONE q block x the ENTIRE key row x ALL H heads (per-head 4D
# blocking is not expressible — Mosaic requires the last two block dims to
# divide (8, 128) or equal the array dims), and softmax is one-shot exact
# (full row in VMEM, no online rescaling). The in-kernel heads loop also
# lets head h+1's QK^T issue on the MXU while head h's softmax runs on the
# VPU. Measured at the frame shape: 8.46 ms vs 13.47 dispatch-today (1.6x),
# bit-exact err vs the XLA oracle at bf16 resolution.


def _flash_short(q, k, v, n_valid, block_q=512):
    """Full-softmax bnhd attention for short key rows. q, k, v: (B, N, H, D);
    returns (B, Nq, H, D). Inference-only (no vjp)."""
    B, Nq, H, D = q.shape
    Nk = k.shape[1]
    Nk_pad = _round_up(Nk, 128)
    bq = min(block_q, _round_up(Nq, 128))
    C = H * D
    scale = D ** -0.5

    def kernel(q_ref, k_ref, v_ref, o_ref):
        kt = k_ref[0]  # (Nk_pad, C)
        vt = v_ref[0]
        masked = Nk_pad != Nk or n_valid != Nk
        if masked:
            # overwrite-mask (not additive): out-of-bounds block reads are
            # undefined, so padded k/v rows may hold NaN/Inf
            row = jax.lax.broadcasted_iota(jnp.int32, (Nk_pad, 1), 0)
            vt = jnp.where(row < n_valid, vt, 0)
        outs = []
        for h in range(H):
            qh = q_ref[0, :, h * D:(h + 1) * D]  # (bq, D) lane slice
            kh = kt[:, h * D:(h + 1) * D]
            # s^T (Nk, bq) = K Q^T — D-deep contraction, full output lanes
            s = jax.lax.dot_general(
                kh, qh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * (scale * _LOG2E)
            if masked:
                rr = jax.lax.broadcasted_iota(jnp.int32, (Nk_pad, 1), 0)
                s = jnp.where(rr < n_valid, s, _NEG_INF)
            m = jnp.max(s, axis=0, keepdims=True)  # (1, bq)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=0, keepdims=True)
            # acc (D, bq) = V^T P — sublane-sublane contraction
            acc = jax.lax.dot_general(
                vt[:, h * D:(h + 1) * D], p.astype(v.dtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append((acc / l).T.astype(o_ref.dtype))
        o_ref[0] = jnp.concatenate(outs, axis=1)  # (bq, C) lane concat

    grid = (B, pl.cdiv(Nq, bq))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Nk_pad, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Nk_pad, C), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Nq, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # k/v stay resident across q blocks and all H heads' score tiles
            # pipeline through — worth more than the 16 MB default scoped
            # limit (v5e has 128 MB of VMEM)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(q.reshape(B, Nq, C), k.reshape(B, Nk, C), v.reshape(B, Nk, C))
    return out.reshape(B, Nq, H, D)


# short-kernel eligibility: the whole key row (k and v) must sit in VMEM
_SHORT_SEQ_MAX = 2048
_SHORT_KV_VMEM_MAX = 16 * 1024 * 1024


def _short_eligible(Nk, H, D, itemsize):
    Nk_pad = _round_up(Nk, 128)
    return (
        Nk_pad <= _SHORT_SEQ_MAX
        and 2 * Nk_pad * H * D * itemsize <= _SHORT_KV_VMEM_MAX
    )


# ---------------------------------------------------------------------------
# int8 QK^T variant (SageAttention-style, inference-only)
# ---------------------------------------------------------------------------
#
# The 64-deep QK^T contraction caps the bf16 MXU at ~66 TF/s; the v5e int8
# MXU runs the same contraction at ~2x. Following SageAttention
# (arXiv 2410.02367, validated end-to-end lossless on CogVideoX): K is
# mean-centered over the sequence (an exact transform — subtracting a
# per-(b,h,d) constant shifts every score in a q-row equally, and softmax is
# shift-invariant), then q and k are quantized to int8 with per-row scales.
# s = (q8 k8^T) * sq_row * sk_col in f32; softmax and PV stay bf16/f32.
# Measured at CogVideoX geometry: 94.7 TF/s (vs 84 bf16-exact), cosine
# 0.99998 / rel-L2 0.65% vs f32 attention. Inference-only: the custom_vjp
# backward always uses the exact bf16 kernels.


def _fwd_kernel_T8(qt_ref, sq_ref, k_ref, sk_ref, vt_ref, o_ref, jump_ref,
                   acc, m_s, *, n_valid, nk_pad, block_k, head_dim):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    s_i = jax.lax.dot_general(
        k_ref[0], qt_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (BK, BQ), int32
    s = s_i.astype(jnp.float32) * sk_ref[0][:, :1] * sq_ref[0][:1]
    if n_valid != nk_pad:
        row = jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1), 0) + j * block_k
        s = s + jnp.where(row < n_valid, 0.0, _NEG_INF)
    m_loc = jnp.max(s, axis=0, keepdims=True)

    @pl.when(j == 0)
    def _():
        p = jnp.exp2(s - m_loc)
        acc[:] = jax.lax.dot_general(
            vt_ref[0], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_s[0:1] = m_loc
        m_s[1:2] = jnp.full_like(m_loc, _NEG_INF)

    @pl.when(j > 0)
    def _():
        m_prev = m_s[0:1]
        p = jnp.exp2(jnp.minimum(s - m_prev, _LAG_CLAMP))
        pv = jax.lax.dot_general(
            vt_ref[0], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_new = jnp.maximum(m_prev, m_loc)
        acc[:] = (acc[:] + pv) * jnp.exp2(m_prev - m_new)
        m_s[0:1] = m_new
        m_s[1:2] = jnp.maximum(m_s[1:2], m_loc - m_prev)

    @pl.when(j == nk - 1)
    def _():
        l = jnp.maximum(acc[head_dim : head_dim + 1], 1e-30)
        o_ref[0] = (acc[:head_dim] / l).T.astype(o_ref.dtype)
        jump_ref[0] = jnp.broadcast_to(m_s[1:2], jump_ref.shape[1:])


def _quantize_qk_int8(q, k, n_valid):
    """SageAttention-style QK quantization shared by both int8 kernels:
    K mean-centered over valid tokens (exact — softmax is shift-invariant;
    padding rows are zero), q prescaled by scale*log2e, then per-row
    symmetric int8 scales for both. Returns (q8, sq, k8, sk)."""
    D = q.shape[-1]
    scale = D ** -0.5

    kf = k.astype(jnp.float32)
    k_mean = jnp.sum(kf, axis=1, keepdims=True) / n_valid
    kc = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, kf.shape, 1) < n_valid, kf - k_mean, 0.0
    )
    sk = jnp.max(jnp.abs(kc), axis=-1, keepdims=True) / 127.0 + 1e-12  # (BH, Nk, 1)
    k8 = jnp.round(kc / sk).astype(jnp.int8)
    qf = q.astype(jnp.float32) * (scale * _LOG2E)
    sq = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) / 127.0 + 1e-12  # (BH, N, 1)
    q8 = jnp.round(qf / sq).astype(jnp.int8)
    return q8, sq, k8, sk


def _flash_int8(q, k, v, n_valid, block_q, block_k):
    """int8-QK forward on padded (BH, N, D) operands; exact-bf16 fallback
    when the lag clamp could have bound."""
    BH, N, D = q.shape
    Nk = k.shape[1]

    q8, sq, k8, sk = _quantize_qk_int8(q, k, n_valid)

    qt8 = jnp.swapaxes(q8, 1, 2)  # (BH, D, N)
    sq_t = jnp.broadcast_to(jnp.swapaxes(sq, 1, 2), (BH, 8, N))
    sk_b = jnp.broadcast_to(sk, (BH, Nk, 8))
    D_aug = _round_up(D + 1, 8)
    vt = jnp.concatenate(
        [
            jnp.swapaxes(v, 1, 2),
            jnp.ones((BH, 1, Nk), v.dtype),
            jnp.zeros((BH, D_aug - D - 1, Nk), v.dtype),
        ],
        axis=1,
    )

    grid = (BH, pl.cdiv(N, block_q), pl.cdiv(Nk, block_k))
    kernel = functools.partial(
        _fwd_kernel_T8, n_valid=n_valid, nk_pad=_round_up(Nk, block_k),
        block_k=block_k, head_dim=D
    )
    out, jumps = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((1, D, block_q), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 8, block_q), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, 8), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, D_aug, block_k), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, _LSE_LANES, block_q), lambda b, i, j: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, N, D), q.dtype),
            jax.ShapeDtypeStruct((BH, _LSE_LANES, N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((D_aug, block_q), jnp.float32),
            pltpu.VMEM((8, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(qt8, sq_t, k8, sk_b, vt)

    def exact(_):
        o, _lse = _flash_fwd(q, k, v, n_valid, min(block_q, 1024), block_k, False)
        return o

    return jax.lax.cond(jnp.max(jumps) <= _LAG_CLAMP, lambda o: o, exact, out)


def _fwd_kernel_i8(q_ref, sq_ref, k_ref, sk_ref, v_ref, o_ref, acc, m_s, l_s,
                   *, n_valid, nk_pad, block_k):
    """int8-QK online-softmax forward in the classic (lane-full) layout.

    Same structure as ``_fwd_kernel`` (the D%128==0 path: no ones-column
    augmentation, explicit VPU row-sum denominator, classic max->exp update
    — at a 128-deep contraction the QK/PV matmuls hide the dependency, see
    ARCHITECTURE.md), but QK^T runs on the 2x int8 MXU with s32 accumulation
    and one (row ⊗ col) f32 rescale. No lag clamp / fallback needed: the
    classic update is unconditionally stable."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_s[:] = jnp.full_like(m_s, _NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)

    s_i = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (BQ, BK), int32
    s = s_i.astype(jnp.float32) * sq_ref[0][:, :1] * sk_ref[0][:1, :]

    if n_valid != nk_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1) + j * block_k
        s = s + jnp.where(col < n_valid, 0.0, _NEG_INF)

    m_prev = m_s[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)

    acc[:] = acc[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    l_s[:] = l_s[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_s[:] = jnp.broadcast_to(m_new, m_s.shape)

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        l = jnp.maximum(l_s[:, :1], 1e-30)
        o_ref[0] = (acc[:] / l).astype(o_ref.dtype)


def _flash_int8_128(q, k, v, n_valid, block_q, block_k):
    """int8-QK forward for lane-full head dims (D % 128 == 0, the Wan
    geometry). Quantization transform shared with ``_flash_int8`` via
    ``_quantize_qk_int8``. Inference-only; the custom_vjp backward stays
    exact bf16.

    NOT dispatched by ``attention()``: measured on the chip (v5e, Wan
    flagship shape 48x18480x128, chained-in-jit timing) this kernel runs
    116.6 TF/s vs the exact kernel's 118.5 at bq=bk=1024 (and loses at
    512/1024 too) — at a lane-full 128-deep contraction the dequant work
    (int32->f32 convert + row x col scale multiply over every (BQ, BK)
    score tile) costs the VPU more than the 2x int8 MXU saves, unlike the
    D<128 transposed path where QK^T is the pipeline bottleneck. Kept (with
    its unit test) as the measured record of why; also note bq=2048
    overflows the 16 MB scoped VMEM limit (the f32 score tile doubles)."""
    BH, N, D = q.shape
    Nk = k.shape[1]

    q8, sq, k8, sk = _quantize_qk_int8(q, k, n_valid)

    sq_b = jnp.broadcast_to(sq, (BH, N, _LSE_LANES))
    sk_t = jnp.broadcast_to(jnp.swapaxes(sk, 1, 2), (BH, _LSE_LANES, Nk))

    grid = (BH, pl.cdiv(N, block_q), pl.cdiv(Nk, block_k))
    kernel = functools.partial(
        _fwd_kernel_i8, n_valid=n_valid, nk_pad=_round_up(Nk, block_k),
        block_k=block_k
    )
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, _LSE_LANES), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, _LSE_LANES, block_k), lambda b, i, j: (b, 0, j)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, N, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(q8, sq_b, k8, sk_t, v)


# ---------------------------------------------------------------------------
# Pallas backward
# ---------------------------------------------------------------------------

def _bwd_p(q_ref, k_ref, lse_ref, j, n_valid, nk_pad, block_k):
    """Recompute softmax probs for one (q-block, k-block) tile.

    q arrives prescaled by scale*log2(e) and lse in base-2 (see _flash_bwd),
    so p = exp2(s2 - lse2) with bf16 MXU operands and no per-element scale.
    """
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if n_valid != nk_pad:  # row-bias mask, one broadcast add
        col = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1) + j * block_k
        s = s + jnp.where(col < n_valid, 0.0, _NEG_INF)
    return jnp.exp2(s - lse_ref[0][:, :1])


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc,
               *, scale, n_valid, nk_pad, block_k):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = _bwd_p(q_ref, k_ref, lse_ref, j, n_valid, nk_pad, block_k)
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0][:, :1])  # grad scale folded into final store
    acc[:] = acc[:] + jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = (acc[:] * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                dk_acc, dv_acc, *, scale, n_valid, nk_pad, block_k):
    i = pl.program_id(2)  # q block index (innermost for accumulation)
    nq = pl.num_programs(2)
    j = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    p = _bwd_p(q_ref, k_ref, lse_ref, j, n_valid, nk_pad, block_k)
    pb = p.astype(do_ref.dtype)
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        pb, do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0][:, :1])
    # q here is the prescaled q2 = scale*log2e*q, so dk = scale*ds^T q =
    # ds^T q2 / log2e — fold ln2 into the final store
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = (dk_acc[:] * _LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Transposed backward (head_dim < 128): same PVT trick as the forward — dq,
# dk, dv accumulate as (D, Nblk) so every output-side matmul fills the full
# 128 MXU lanes with a full-depth block contraction (only the s/dp recomputes
# stay at the 64-deep geometry). Measured: 172 -> 139 ms at CogVideoX
# geometry with bit-identical gradients.
# ---------------------------------------------------------------------------

def _dq_kernel_T(qt_ref, k_ref, v_ref, dot_ref, lse_ref, del_ref, dq_ref, acc,
                 *, scale, n_valid, nk_pad, block_k):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    sT = jax.lax.dot_general(
        k_ref[0], qt_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BK, BQ)
    if n_valid != nk_pad:
        row = jax.lax.broadcasted_iota(jnp.int32, (sT.shape[0], 1), 0) + j * block_k
        sT = sT + jnp.where(row < n_valid, 0.0, _NEG_INF)
    pT = jnp.exp2(sT - lse_ref[0][:1])
    dpT = jax.lax.dot_general(
        v_ref[0], dot_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BK, BQ)
    dsT = (pT * (dpT - del_ref[0][:1])).astype(k_ref.dtype)
    acc[:] = acc[:] + jax.lax.dot_general(
        k_ref[0], dsT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, BQ): full-depth BK contraction, full output lanes

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = (acc[:].T * scale).astype(dq_ref.dtype)


def _dkv_kernel_T(qt_ref, k_ref, v_ref, dot_ref, lse_ref, del_ref,
                  dk_ref, dv_ref, dk_acc, dv_acc, *, n_valid, nk_pad, block_k):
    i = pl.program_id(2)
    nq = pl.num_programs(2)
    j = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    sT = jax.lax.dot_general(
        k_ref[0], qt_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if n_valid != nk_pad:
        row = jax.lax.broadcasted_iota(jnp.int32, (sT.shape[0], 1), 0) + j * block_k
        sT = sT + jnp.where(row < n_valid, 0.0, _NEG_INF)
    pT = jnp.exp2(sT - lse_ref[0][:1])
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        dot_ref[0], pT.astype(dot_ref.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, BK)
    dpT = jax.lax.dot_general(
        v_ref[0], dot_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dsT = (pT * (dpT - del_ref[0][:1])).astype(qt_ref.dtype)
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        qt_ref[0], dsT, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, BK); q is prescaled by scale*log2e -> fold ln2 into the store

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = (dk_acc[:].T * _LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].T.astype(dv_ref.dtype)


def _flash_bwd_T(res, g, block_q, block_k):
    q, k, v, out, lse, n_valid = res
    BH, N, D = q.shape
    Nk = k.shape[1]
    scale = D ** -0.5
    block_q = min(block_q, 1024)
    block_k = min(block_k, 1024)

    qt = jnp.swapaxes(
        (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype), 1, 2
    )  # (BH, D, N)
    dot_t = jnp.swapaxes(g, 1, 2)
    lse2 = jnp.swapaxes(lse * _LOG2E, 1, 2)[:, :_LSE_LANES]  # (BH, 8, N)
    delta = jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32), axis=-1)
    deltaT = jnp.broadcast_to(delta[:, None], (BH, _LSE_LANES, N))

    def specs(order):
        # order maps (b, outer, inner) -> (q_idx, kv_idx)
        qi, ki = order
        return [
            pl.BlockSpec((1, D, block_q), lambda b, x, y: (b, 0, (x, y)[qi])),
            pl.BlockSpec((1, block_k, D), lambda b, x, y: (b, (x, y)[ki], 0)),
            pl.BlockSpec((1, block_k, D), lambda b, x, y: (b, (x, y)[ki], 0)),
            pl.BlockSpec((1, D, block_q), lambda b, x, y: (b, 0, (x, y)[qi])),
            pl.BlockSpec((1, _LSE_LANES, block_q), lambda b, x, y: (b, 0, (x, y)[qi])),
            pl.BlockSpec((1, _LSE_LANES, block_q), lambda b, x, y: (b, 0, (x, y)[qi])),
        ]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel_T, scale=scale, n_valid=n_valid,
                          nk_pad=_round_up(Nk, block_k), block_k=block_k),
        grid=(BH, pl.cdiv(N, block_q), pl.cdiv(Nk, block_k)),
        in_specs=specs((0, 1)),
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, N, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((D, block_q), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(qt, k, v, dot_t, lse2, deltaT)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel_T, n_valid=n_valid,
                          nk_pad=_round_up(Nk, block_k), block_k=block_k),
        grid=(BH, pl.cdiv(Nk, block_k), pl.cdiv(N, block_q)),
        in_specs=specs((1, 0)),
        out_specs=[
            pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Nk, D), k.dtype),
            jax.ShapeDtypeStruct((BH, Nk, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, block_k), jnp.float32),
            pltpu.VMEM((D, block_k), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(qt, k, v, dot_t, lse2, deltaT)
    return dq, dk, dv


def _flash_bwd(res, g, block_q, block_k):
    q, k, v, out, lse, n_valid = res
    BH, N, D = q.shape
    Nk = k.shape[1]
    scale = D ** -0.5
    if D < 128:
        return _flash_bwd_T(res, g, block_q, block_k)
    # the bwd kernels hold two (bq, bk) f32 tiles (p and ds) on the stack;
    # 1024x2048 exceeds the 16 MB scoped-vmem limit, so clamp independently
    # of the fwd blocks (padded N stays a multiple of any smaller pow-2)
    block_q = min(block_q, 1024)
    block_k = min(block_k, 1024)
    # base-2 convention (see _fwd_kernel): scores from prescaled q, lse in
    # log2 units, per-element scale multiplies folded into the final stores
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    lse = lse * _LOG2E
    delta = jnp.sum(
        out.astype(jnp.float32) * g.astype(jnp.float32), axis=-1, keepdims=True
    )  # (BH, N, 1)
    delta = jnp.broadcast_to(delta, delta.shape[:2] + (_LSE_LANES,))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, n_valid=n_valid,
                          nk_pad=_round_up(Nk, block_k), block_k=block_k),
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
        functools.partial(_dkv_kernel, scale=scale, n_valid=n_valid,
                          nk_pad=_round_up(Nk, block_k), block_k=block_k),
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
    # primal (inference) path: no grad -> no logsumexp output needed
    if q.shape[-1] < 128:
        out, _ = _flash_fwd_guarded(q, k, v, n_valid, block_q, block_k, with_lse=False)
    else:
        out, _ = _flash_fwd(q, k, v, n_valid, block_q, block_k, with_lse=False)
    return out


def _flash_vjp_fwd(q, k, v, n_valid, block_q, block_k):
    if q.shape[-1] < 128:
        out, lse = _flash_fwd_guarded(q, k, v, n_valid, block_q, block_k)
    else:
        out, lse = _flash_fwd(q, k, v, n_valid, block_q, block_k)
    return out, (q, k, v, out, lse, n_valid)


def _flash_vjp_bwd(n_valid, block_q, block_k, res, g):
    # res[5] already carries n_valid (stored by _flash_vjp_fwd)
    dq, dk, dv = _flash_bwd(res, g, block_q, block_k)
    return dq, dk, dv


_flash.defvjp(
    lambda q, k, v, n_valid, bq, bk: _flash_vjp_fwd(q, k, v, n_valid, bq, bk),
    lambda n_valid, bq, bk, res, g: _flash_vjp_bwd(n_valid, bq, bk, res, g),
)


def _block_geometry(Nq, Nk, block_q, block_k, D):
    """Shared block-size policy for the flash dispatchers (bhnd + bnhd).

    Returns (bq, bk, Nq_padded, Nk_padded)."""
    if D >= 128:
        # measured on v5e at N~18k: D=128 runs 90 TFLOP/s with 1024-wide KV
        # blocks vs 85 at 2048 (and the working set doubles with D)
        block_k = min(block_k, 1024)
    elif (block_q, block_k) == (1024, 2048):
        # caller left the defaults: transposed lagged-max kernel (head_dim
        # < 128) measures best at 2048x1024 (84 TF/s at CogVideoX geometry)
        block_q, block_k = 2048, 1024
    bq = min(block_q, _round_up(Nq, 128))
    bk = min(block_k, _round_up(Nk, 128))
    # short sequences: arrays pad to a block multiple, so a 1024-wide block
    # wastes up to ~2x FLOPs at N ~1.3k (VGGT frame attention) — shrink
    # blocks so the padded shape hugs N
    if _round_up(Nq, 128) < 4 * block_q:
        bq = min(bq, 512)
    if _round_up(Nk, 128) < 4 * block_k:
        bk = min(bk, 512)
    return bq, bk, _round_up(Nq, bq), _round_up(Nk, bk)


def _shard_wrapped(call, q, k, v, h_axis):
    """Run ``call(q, k, v)`` per-shard under an active mesh.

    Mosaic kernels cannot be auto-partitioned by GSPMD: under an active
    mesh (tensor/data parallelism via ``jax.set_mesh``) batch rides the
    data axis and heads the model axis (the Megatron qkv column-sharding
    makes heads the natural TP dimension), so the wrap itself introduces
    no collective. Identity when no mesh is active. ``h_axis`` is the
    position of the heads axis (1 for bhnd, 2 for bnhd); the sequence
    axes stay global either way, so block geometry computed from the
    global shapes is valid per-shard."""
    mesh = jax.sharding.get_abstract_mesh()
    if not mesh.empty:
        from jax.sharding import PartitionSpec as P

        dp = mesh.shape.get("data", 1)
        tp = mesh.shape.get("model", 1)
        if dp > 1 or tp > 1:
            B, H = q.shape[0], q.shape[h_axis]
            axes = [None] * 4
            axes[0] = "data" if dp > 1 and B % dp == 0 else None
            axes[h_axis] = "model" if tp > 1 and H % tp == 0 else None
            spec = P(*axes)
            return jax.shard_map(
                call, mesh=mesh, in_specs=(spec, spec, spec),
                out_specs=spec, check_vma=False,
            )(q, k, v)
    return call(q, k, v)


def _attention_bnhd(q, k, v, block_q, block_k):
    """Inference flash attention from (B, N, H, D) operands, D < 128.

    Feeds the transposed lagged-max kernel with each operand built by ONE
    transpose from the projection-natural layout: qt (BH, D, N) pre-scaled,
    k (BH, N, D), vt (BH, D_aug, N) with the ones denominator row. Output
    returns (B, Nq, H, D) so the caller reshapes straight into the out
    projection. Same block geometry policy as the classic path.
    """
    B, Nq, H, D = q.shape
    Nk = k.shape[1]
    bq, bk, Nq_p, Nk_p = _block_geometry(Nq, Nk, block_q, block_k, D)
    scale = D ** -0.5
    D_aug = _round_up(D + 1, 8)

    def _call(q, k, v):
        Bl, Hl = q.shape[0], q.shape[2]

        if _short_eligible(Nk, Hl, D, q.dtype.itemsize):
            # short key rows: the one-shot native-layout kernel skips the
            # qt/vt/out transposes AND the (degenerate, stalled) single-kv-
            # block lagged path — measured 1.6x at VGGT frame attention
            return _flash_short(q, k, v, Nk)

        def pad(x, n_to):
            n = x.shape[1]
            if n == n_to:
                return x
            return jnp.pad(x, ((0, 0), (0, n_to - n), (0, 0), (0, 0)))

        qp, kp, vp = pad(q, Nq_p), pad(k, Nk_p), pad(v, Nk_p)
        qt = jnp.transpose(
            (qp.astype(jnp.float32) * (scale * _LOG2E)).astype(qp.dtype),
            (0, 2, 3, 1),
        ).reshape(Bl * Hl, D, Nq_p)
        kk = jnp.transpose(kp, (0, 2, 1, 3)).reshape(Bl * Hl, Nk_p, D)
        vt = jnp.concatenate(
            [
                jnp.transpose(vp, (0, 2, 3, 1)).reshape(Bl * Hl, D, Nk_p),
                jnp.ones((Bl * Hl, 1, Nk_p), vp.dtype),
                jnp.zeros((Bl * Hl, D_aug - D - 1, Nk_p), vp.dtype),
            ],
            axis=1,
        )

        out = _flash_fwd_guarded_pre(qt, kk, vt, Nk, bq, bk)
        out = out.reshape(Bl, Hl, Nq_p, D)
        return jnp.transpose(out, (0, 2, 1, 3))[:, :Nq]

    return _shard_wrapped(_call, q, k, v, h_axis=2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention_bnhd_vjp(q, k, v, block_q, block_k):
    """Differentiable wrapper over the inference-layout kernel.

    The transposed-operand forward (``_attention_bnhd``) has no vjp of its
    own — it exists to SKIP transposes, and its backward would reintroduce
    them anyway. So the backward falls back to the bhnd flash path's
    custom vjp (bit-identical grads, transposed accumulators): a ViT block
    that is differentiated through (e.g. fine-tuning VGGT/DINOv2) gets
    correct gradients instead of a missing-vjp error, while the inference
    forward keeps the transpose-free layout win.
    """
    return _attention_bnhd(q, k, v, block_q, block_k)


def _attention_bnhd_vjp_fwd(q, k, v, block_q, block_k):
    return _attention_bnhd(q, k, v, block_q, block_k), (q, k, v)


def _attention_bnhd_vjp_bwd(block_q, block_k, res, g):
    q, k, v = res
    tr = lambda x: jnp.transpose(x, (0, 2, 1, 3))
    _, vjp = jax.vjp(
        lambda q_, k_, v_: attention(
            q_, k_, v_, impl="flash", block_q=block_q, block_k=block_k
        ),
        tr(q), tr(k), tr(v),
    )
    dq, dk, dv = vjp(tr(g))
    return tr(dq), tr(dk), tr(dv)


_attention_bnhd_vjp.defvjp(_attention_bnhd_vjp_fwd, _attention_bnhd_vjp_bwd)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    impl: str = "auto",
    block_q: int = 1024,
    block_k: int = 2048,
    layout: str = "bhnd",
) -> jax.Array:
    """Bidirectional multi-head attention.

    Args:
        q, k, v: (B, num_heads, N, head_dim). Self- or cross-attention
            (k/v may have a different sequence length than q).
        impl: "auto" (flash on TPU, XLA elsewhere), "flash", "xla",
            "flash_int8" (inference-only int8-QK transposed lagged-max
            kernel at head_dim < 128; at D >= 128 it routes to the exact
            kernel, which measured faster than the int8 variant on-chip),
            or "ring" (sequence-parallel over the mesh).
        layout: "bhnd" (default, the contract above) or "bnhd" — q/k/v
            arrive (B, N, num_heads, head_dim), the natural layout out of
            the qkv projections, and the result returns in the same
            layout. At D < 128 on TPU (flash) this feeds the transposed
            kernel with ONE transpose per operand instead of two
            (heads-transpose + kernel swapaxes), saving ~2 full-tensor HBM
            round-trips per attention. Differentiable: the vjp falls back
            to the bhnd flash backward (``_attention_bnhd_vjp``), so the
            layout win applies to inference while grads stay correct.
            Other impls/DTs fall back via an explicit transpose pair.

    Returns:
        (B, num_heads, Nq, head_dim) (or (B, Nq, num_heads, head_dim) for
        layout="bnhd"), dtype of q.
    """
    if impl == "auto":
        impl = "flash" if jax.default_backend() == "tpu" else "xla"
    if layout == "bnhd":
        if impl == "flash" and q.shape[-1] < 128:
            return _attention_bnhd_vjp(q, k, v, block_q, block_k)
        if (
            impl == "flash_int8"
            and q.shape[-1] < 128
            and _short_eligible(k.shape[1], q.shape[2], q.shape[-1],
                                q.dtype.itemsize)
        ):
            # int8-QK pays off on LONG D<64..128 rows (QK^T-bound); at short
            # key rows the layout tax + one-shot stall dominate, and the
            # exact native-layout kernel is faster than the int8 lagged
            # path — same "int8 only where int8 wins" dispatch rule as the
            # D >= 128 exact routing (ARCHITECTURE.md)
            Nk = k.shape[1]
            return _shard_wrapped(
                lambda q, k, v: _flash_short(q, k, v, Nk), q, k, v, h_axis=2
            )
        out = attention(
            jnp.transpose(q, (0, 2, 1, 3)), jnp.transpose(k, (0, 2, 1, 3)),
            jnp.transpose(v, (0, 2, 1, 3)), impl=impl,
            block_q=block_q, block_k=block_k,
        )
        return jnp.transpose(out, (0, 2, 1, 3))
    if impl == "xla":
        return mha_reference(q, k, v)
    if impl == "ring":
        # sequence parallelism: shard N over the ambient mesh's "seq" axis
        # (set via jax.set_mesh); K/V rotate on the ICI (ring_attention.py)
        from videogpa_tpu.ops.ring_attention import ring_attention_sharded

        mesh = jax.sharding.get_abstract_mesh()
        if mesh.empty or "seq" not in mesh.shape:
            raise ValueError(
                "attention(impl='ring') needs an active mesh with a 'seq' "
                "axis — wrap the call in jax.set_mesh(make_mesh(...))"
            )
        return ring_attention_sharded(q, k, v, mesh, seq_axis="seq")

    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    bq, bk, Nq_p, Nk_p = _block_geometry(Nq, Nk, block_q, block_k, D)

    def _call(q, k, v):
        # shapes read inside: under shard_map these are the PER-DEVICE
        # shards (batch/heads sharded); N stays global in both cases, so
        # the block geometry above is valid either way
        Bl, Hl = q.shape[:2]

        def pad(x, n_to):
            n = x.shape[2]
            if n == n_to:
                return x
            return jnp.pad(x, ((0, 0), (0, 0), (0, n_to - n), (0, 0)))

        qp = pad(q, Nq_p).reshape(Bl * Hl, Nq_p, D)
        kp = pad(k, Nk_p).reshape(Bl * Hl, Nk_p, D)
        vp = pad(v, Nk_p).reshape(Bl * Hl, Nk_p, D)

        if impl == "flash_int8" and D < 128:
            # inference-only quantized path (no vjp); see _flash_int8
            out = _flash_int8(qp, kp, vp, Nk, bq, bk)
        else:
            # flash_int8 at D >= 128 routes to the EXACT kernel: measured
            # on-chip (v5e, Wan flagship 48x18480x128, latency-amortized
            # chained timing) the classic-layout int8-QK kernel runs 116.6
            # TF/s vs 118.5 exact — the int32->f32 convert + (row x col)
            # dequant VPU work cancels the 2x int8 MXU gain once the
            # 128-deep contraction already runs lane-full, so exact is both
            # faster and exact (tools/onchip_r3.py; ARCHITECTURE.md).
            out = _flash(qp, kp, vp, Nk, bq, bk)
        return out.reshape(Bl, Hl, Nq_p, D)[:, :, :Nq]

    return _shard_wrapped(_call, q, k, v, h_axis=1)
