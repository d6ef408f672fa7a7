"""Ring attention: sequence-parallel flash attention over a mesh axis.

An upgrade over the reference, which bounds long-video attention by memory
tricks only (SURVEY.md §5): here the token sequence is sharded over the
``seq`` mesh axis, each device computes online-softmax partials for its query
shard against the currently-resident K/V shard, and K/V shards rotate around
the ring with ``lax.ppermute`` — attention FLOPs and memory scale 1/P per
chip while the rotation rides the ICI.

Use inside ``shard_map`` (see ``ring_attention_sharded`` for the wrapper).
Forward-only for now (sampling / scoring); the training path uses the
single-chip Pallas flash kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from videogpa_tpu.ops.attention import _flash_fwd, _round_up


def _attn_with_lse_xla(q, k, v, kv_mask=None) -> Tuple[jax.Array, jax.Array]:
    """(B, H, n, d) x (B, H, m, d) -> (o, lse). f32 softmax.

    kv_mask: optional (m,) bool — False keys are excluded from the softmax
    (ragged global lengths after padding to the ring shard size).
    """
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if kv_mask is not None:
        s = jnp.where(kv_mask[None, None, None, :], s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    m = jnp.maximum(m, -1e30)  # fully-masked shard: avoid inf - inf
    p = jnp.exp(s - m)
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    o = jnp.einsum("bhqk,bhkd->bhqd", (p / l).astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    lse = (m + jnp.log(l))[..., 0]
    return o, lse


def _attn_with_lse_flash(q, k, v, block_q=1024, block_k=1024):
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    bq = min(block_q, _round_up(Nq, 128))
    bk = min(block_k, _round_up(Nk, 128))
    Nq_p, Nk_p = _round_up(Nq, bq), _round_up(Nk, bk)

    def pad(x, n_to):
        return x if x.shape[2] == n_to else jnp.pad(
            x, ((0, 0), (0, 0), (0, n_to - x.shape[2]), (0, 0))
        )

    out, lse = _flash_fwd(
        pad(q, Nq_p).reshape(B * H, Nq_p, D),
        pad(k, Nk_p).reshape(B * H, Nk_p, D),
        pad(v, Nk_p).reshape(B * H, Nk_p, D),
        Nk, bq, bk,
    )
    out = out.reshape(B, H, Nq_p, D)[:, :, :Nq]
    lse = lse.reshape(B, H, Nq_p, -1)[:, :, :Nq, 0]
    return out, lse


def _merge(o, lse, o_i, lse_i):
    """Combine two online-softmax partials."""
    new_lse = jnp.logaddexp(lse, lse_i)
    w0 = jnp.exp(lse - new_lse)[..., None]
    w1 = jnp.exp(lse_i - new_lse)[..., None]
    o = (o.astype(jnp.float32) * w0 + o_i.astype(jnp.float32) * w1).astype(o.dtype)
    return o, new_lse


def ring_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, axis_name: str,
    impl: str = "auto", kv_mask: jax.Array = None,
) -> jax.Array:
    """Sequence-sharded attention body (call inside shard_map).

    Args:
        q, k, v: per-device shards (B, H, N/P, D).
        axis_name: mesh axis carrying the sequence shards.
        kv_mask: optional (N/P,) bool key-validity shard — rotates around the
            ring with K/V so ragged (padded) sequences stay exact. Masked
            paths use the XLA with-lse body (the flash kernel's key mask is
            a trace-time constant, incompatible with a rotating mask).

    Returns:
        per-device output shard (B, H, N/P, D).
    """
    if impl == "auto":
        impl = "flash" if jax.default_backend() == "tpu" else "xla"
    if kv_mask is not None:
        impl = "xla"
    attn = _attn_with_lse_flash if impl == "flash" else _attn_with_lse_xla

    n_dev = jax.lax.axis_size(axis_name)
    perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]

    o = jnp.zeros(q.shape, q.dtype)
    lse = jnp.full(q.shape[:-1], -jnp.inf, jnp.float32)

    def body(i, carry):
        o, lse, k_cur, v_cur, m_cur = carry
        if kv_mask is None:
            o_i, lse_i = attn(q, k_cur, v_cur)
        else:
            o_i, lse_i = attn(q, k_cur, v_cur, kv_mask=m_cur)
        o, lse = _merge(o, lse, o_i, lse_i)
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        if kv_mask is not None:
            m_cur = jax.lax.ppermute(m_cur, axis_name, perm)
        return o, lse, k_cur, v_cur, m_cur

    m0 = kv_mask if kv_mask is not None else jnp.zeros((0,), bool)
    o, lse, _, _, _ = jax.lax.fori_loop(0, n_dev, body, (o, lse, k, v, m0))
    return o


def ring_attention_sharded(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    seq_axis: str = "seq",
    impl: str = "auto",
) -> jax.Array:
    """shard_map wrapper: (B, H, N, D) global arrays, N sharded over seq_axis.

    N is padded to a multiple of the seq-axis size automatically; padded
    keys are excluded via a rotating validity mask (exact softmax).
    """
    n_seq = mesh.shape[seq_axis]
    B, H, N, D = q.shape
    N_pad = _round_up(N, n_seq)
    spec = P(None, None, seq_axis, None)
    if N_pad == N:
        fn = jax.shard_map(
            functools.partial(ring_attention, axis_name=seq_axis, impl=impl),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )
        return fn(q, k, v)

    pad = ((0, 0), (0, 0), (0, N_pad - N), (0, 0))
    qp, kp, vp = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    mask = jnp.arange(N_pad) < N
    fn = jax.shard_map(
        lambda q, k, v, m: ring_attention(
            q, k, v, axis_name=seq_axis, impl=impl, kv_mask=m
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec, P(seq_axis)),
        out_specs=spec,
        check_vma=False,
    )
    return fn(qp, kp, vp, mask)[:, :, :N]
