"""Ring attention: sequence-parallel flash attention over a mesh axis.

An upgrade over the reference, which bounds long-video attention by memory
tricks only (SURVEY.md §5): here the token sequence is sharded over the
``seq`` mesh axis, each device computes online-softmax partials for its query
shard against the currently-resident K/V shard, and K/V shards rotate around
the ring with ``lax.ppermute`` — attention FLOPs and memory scale 1/P per
chip while the rotation rides the ICI.

Use inside ``shard_map`` (see ``ring_attention_sharded`` for the wrapper).
Differentiable: a custom VJP recomputes per-shard probabilities from the
saved logsumexp and runs a second ring in the backward pass — dq accumulates
on the home device while the (k, v, dk, dv) quadruple rotates, so dk/dv
partials arrive back at their shard's home after P hops (seq-parallel DPO
training uses this through ``attn_impl="ring"``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from videogpa_tpu.ops.attention import _flash_fwd, _flash_fwd_guarded, _round_up

# finite stand-in for "no valid keys on this shard": keeps the logsumexp
# merge nan-free (exp(-1e30 - x) == 0) while zeroing the shard's weight,
# matching the XLA body's max clamp
_EMPTY_LSE = -1e30


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


def _attn_with_lse_flash(q, k, v, n_valid=None, block_q=1024, block_k=1024):
    """Pallas flash partial for one kv shard.

    n_valid: STATIC valid-key prefix length within the shard (defaults to the
    full shard) — the kernels' key masking is trace-time, so ragged ring
    shards dispatch between the full/partial variants with ``lax.switch``
    (see ``_ring_forward``) rather than threading a runtime mask.
    """
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    nv = Nk if n_valid is None else n_valid
    bq = min(block_q, _round_up(Nq, 128))
    bk = min(block_k, _round_up(Nk, 128))
    Nq_p, Nk_p = _round_up(Nq, bq), _round_up(Nk, bk)

    def pad(x, n_to):
        return x if x.shape[2] == n_to else jnp.pad(
            x, ((0, 0), (0, 0), (0, n_to - x.shape[2]), (0, 0))
        )

    fwd = _flash_fwd_guarded if D < 128 else _flash_fwd
    res = fwd(
        pad(q, Nq_p).reshape(B * H, Nq_p, D),
        pad(k, Nk_p).reshape(B * H, Nk_p, D),
        pad(v, Nk_p).reshape(B * H, Nk_p, D),
        nv, bq, bk,
    )
    out, lse = res[0], res[1]
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


def _ring_perm(axis_name):
    n_dev = jax.lax.axis_size(axis_name)
    return n_dev, [(j, (j + 1) % n_dev) for j in range(n_dev)]


def _shard_validity(n_valid, shard_len):
    """Static per-shard validity classes for a prefix-valid padded ring.

    Shard r is fully valid when r < full_shards, a valid prefix of
    partial_len keys when r == full_shards and partial_len > 0, and entirely
    padding otherwise.  Both values are trace-time ints, so the flash
    kernels keep their static key masks — the only runtime quantity is
    WHICH shard is resident, dispatched with ``lax.switch``.
    """
    return divmod(n_valid, shard_len)


def _resident_shard(axis_name, i, n_dev):
    """Shard id held by this device at ring step i (rotation is j -> j+1)."""
    return (jax.lax.axis_index(axis_name) - i) % n_dev


def _validity_branch(r, full_shards, partial_len, n_branches):
    """Branch index: 0 = full shard, then partial (if any), last = empty."""
    empty = n_branches - 1
    idx = jnp.where(r < full_shards, 0, empty)
    if partial_len:
        idx = jnp.where(r == full_shards, 1, idx)
    return idx


def _ring_forward(axis_name, impl, use_mask, n_valid, q, k, v, mask):
    """Ring forward; returns (o, lse). mask: f32 (N/P,) key validity.

    n_valid: static GLOBAL valid-token count (prefix of the padded
    sequence); with impl="flash" ragged shards run the Pallas kernels via
    the static-class switch instead of dropping to XLA.
    """
    attn = _attn_with_lse_flash if impl == "flash" else _attn_with_lse_xla
    n_dev, perm = _ring_perm(axis_name)

    o = jnp.zeros(q.shape, q.dtype)
    lse = jnp.full(q.shape[:-1], -jnp.inf, jnp.float32)

    if impl == "flash" and n_valid is not None:
        full_shards, partial_len = _shard_validity(n_valid, k.shape[2])

        def body(i, carry):
            o, lse, k_cur, v_cur, m_cur = carry
            branches = [lambda _: attn(q, k_cur, v_cur)]
            if partial_len:
                branches.append(
                    lambda _: attn(q, k_cur, v_cur, n_valid=partial_len)
                )
            branches.append(
                lambda _: (
                    jnp.zeros(q.shape, q.dtype),
                    jnp.full(q.shape[:-1], _EMPTY_LSE, jnp.float32),
                )
            )
            r = _resident_shard(axis_name, i, n_dev)
            idx = _validity_branch(r, full_shards, partial_len, len(branches))
            o_i, lse_i = jax.lax.switch(idx, branches, None)
            o, lse = _merge(o, lse, o_i, lse_i)
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            return o, lse, k_cur, v_cur, m_cur

    else:

        def body(i, carry):
            o, lse, k_cur, v_cur, m_cur = carry
            if use_mask:
                o_i, lse_i = attn(q, k_cur, v_cur, kv_mask=m_cur > 0)
            else:
                o_i, lse_i = attn(q, k_cur, v_cur)
            o, lse = _merge(o, lse, o_i, lse_i)
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            if use_mask:
                m_cur = jax.lax.ppermute(m_cur, axis_name, perm)
            return o, lse, k_cur, v_cur, m_cur

    o, lse, _, _, _ = jax.lax.fori_loop(0, n_dev, body, (o, lse, k, v, mask))
    return o, lse


def _bwd_step_xla(q, k_cur, v_cur, m_cur, g, lse, delta, use_mask):
    """One backward ring step: (dq_i, dk_i, dv_i) vs the resident kv shard.

    p is recomputed from the GLOBAL logsumexp, so each shard's contribution
    is already correctly normalized (standard flash backward recurrence)."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k_cur, preferred_element_type=jnp.float32
    ) * scale
    if use_mask:
        s = jnp.where(m_cur[None, None, None, :] > 0, s, -jnp.inf)
    p = jnp.exp(s - lse[..., None])  # masked keys: exp(-inf) = 0
    pb = p.astype(g.dtype)
    dv_i = jnp.einsum("bhqk,bhqd->bhkd", pb, g, preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g, v_cur, preferred_element_type=jnp.float32)
    ds = (p * (dp - delta[..., None])).astype(q.dtype)
    dq_i = scale * jnp.einsum(
        "bhqk,bhkd->bhqd", ds, k_cur, preferred_element_type=jnp.float32
    )
    dk_i = scale * jnp.einsum(
        "bhqk,bhqd->bhkd", ds, q, preferred_element_type=jnp.float32
    )
    return dq_i, dk_i.astype(jnp.float32), dv_i


def _bwd_step_flash(q, k_cur, v_cur, g, o, lse, n_valid=None):
    """Pallas flash backward for one (q-shard x kv-shard) pair.

    n_valid: STATIC valid-key prefix of the resident shard (see
    ``_attn_with_lse_flash``); masked keys get p = exp2(-1e30 - lse) = 0 in
    the recompute, so their dk/dv rows and dq contributions vanish exactly.
    """
    from videogpa_tpu.ops.attention import _LSE_LANES, _flash_bwd

    B, H, Nq, D = q.shape
    Nk = k_cur.shape[2]
    bq = min(1024, _round_up(Nq, 128))
    bk = min(1024, _round_up(Nk, 128))
    # explicit zero-pad to block multiples: partial boundary blocks would
    # otherwise read out-of-bounds garbage, which the accumulating dkv grid
    # then mixes into VALID rows (zero rows are exactly neutral: do=0 and
    # delta=0 make ds and the dv contribution vanish)
    Nq_p, Nk_p = _round_up(Nq, bq), _round_up(Nk, bk)

    def flat(x, n_to):
        if x.shape[2] != n_to:
            x = jnp.pad(
                x, ((0, 0), (0, 0), (0, n_to - x.shape[2])) + ((0, 0),) * (x.ndim - 3)
            )
        return x.reshape(B * H, n_to, -1)

    lse_l = jnp.broadcast_to(lse[..., None], lse.shape + (_LSE_LANES,))
    res = (
        flat(q, Nq_p), flat(k_cur, Nk_p), flat(v_cur, Nk_p), flat(o, Nq_p),
        flat(lse_l, Nq_p),
        Nk if n_valid is None else n_valid,
    )
    dq, dk, dv = _flash_bwd(res, flat(g, Nq_p), bq, bk)
    return (
        dq.reshape(B, H, Nq_p, D)[:, :, :Nq],
        dk.reshape(B, H, Nk_p, D)[:, :, :Nk].astype(jnp.float32),
        dv.reshape(B, H, Nk_p, D)[:, :, :Nk].astype(jnp.float32),
    )


def _ring_backward(axis_name, impl, use_mask, n_valid, res, g):
    q, k, v, mask, o, lse = res
    n_dev, perm = _ring_perm(axis_name)
    delta = jnp.sum(
        o.astype(jnp.float32) * g.astype(jnp.float32), axis=-1
    )  # (B, H, N/P)

    dq0 = jnp.zeros(q.shape, jnp.float32)
    dk0 = jnp.zeros(k.shape, jnp.float32)
    dv0 = jnp.zeros(v.shape, jnp.float32)

    flash = impl == "flash" and (not use_mask or n_valid is not None)
    if flash and n_valid is not None:
        full_shards, partial_len = _shard_validity(n_valid, k.shape[2])

    def body(i, carry):
        dq, k_cur, v_cur, dk, dv, m_cur = carry
        if flash and n_valid is not None:
            branches = [
                lambda _: _bwd_step_flash(q, k_cur, v_cur, g, o, lse)
            ]
            if partial_len:
                branches.append(
                    lambda _: _bwd_step_flash(
                        q, k_cur, v_cur, g, o, lse, n_valid=partial_len
                    )
                )
            branches.append(
                lambda _: (
                    jnp.zeros(q.shape, q.dtype),
                    jnp.zeros(k.shape, jnp.float32),
                    jnp.zeros(v.shape, jnp.float32),
                )
            )
            r = _resident_shard(axis_name, i, n_dev)
            idx = _validity_branch(r, full_shards, partial_len, len(branches))
            dq_i, dk_i, dv_i = jax.lax.switch(idx, branches, None)
        elif flash:
            dq_i, dk_i, dv_i = _bwd_step_flash(q, k_cur, v_cur, g, o, lse)
        else:
            dq_i, dk_i, dv_i = _bwd_step_xla(
                q, k_cur, v_cur, m_cur, g, lse, delta, use_mask
            )
        dq = dq + dq_i.astype(jnp.float32)
        dk = dk + dk_i
        dv = dv + dv_i
        # the kv shard AND its grad accumulators rotate together: after
        # n_dev hops the accumulated dk/dv land back on the shard's home
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        dk = jax.lax.ppermute(dk, axis_name, perm)
        dv = jax.lax.ppermute(dv, axis_name, perm)
        if use_mask:
            m_cur = jax.lax.ppermute(m_cur, axis_name, perm)
        return dq, k_cur, v_cur, dk, dv, m_cur

    dq, _, _, dk, dv, _ = jax.lax.fori_loop(
        0, n_dev, body, (dq0, k, v, dk0, dv0, mask)
    )
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        jnp.zeros_like(mask),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _ring(axis_name, impl, use_mask, n_valid, q, k, v, mask):
    o, _ = _ring_forward(axis_name, impl, use_mask, n_valid, q, k, v, mask)
    return o


def _ring_vjp_fwd(axis_name, impl, use_mask, n_valid, q, k, v, mask):
    o, lse = _ring_forward(axis_name, impl, use_mask, n_valid, q, k, v, mask)
    return o, (q, k, v, mask, o, lse)


_ring.defvjp(_ring_vjp_fwd, _ring_backward)


def ring_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, axis_name: str,
    impl: str = "auto", kv_mask: jax.Array = None, n_valid: int = None,
) -> jax.Array:
    """Sequence-sharded attention body (call inside shard_map).

    Args:
        q, k, v: per-device shards (B, H, N/P, D).
        axis_name: mesh axis carrying the sequence shards.
        kv_mask: optional (N/P,) bool key-validity shard — rotates around the
            ring with K/V so ARBITRARY raggedness stays exact; this general
            path uses the XLA with-lse body (a runtime mask can't feed the
            kernels' trace-time key masking).
        n_valid: optional STATIC count of valid tokens in the global padded
            sequence (a valid PREFIX — the layout ``ring_attention_sharded``
            produces). Keeps the Pallas flash kernels on ragged shapes: each
            resident shard is statically full / partial / empty, and a
            ``lax.switch`` on the rotating shard id picks the right
            statically-masked kernel. Mutually exclusive with kv_mask.

    Returns:
        per-device output shard (B, H, N/P, D).
    """
    if kv_mask is not None and n_valid is not None:
        raise ValueError("pass kv_mask or n_valid, not both")
    if impl == "auto":
        impl = "flash" if jax.default_backend() == "tpu" else "xla"
    if kv_mask is not None:
        impl = "xla"
    if n_valid is not None and impl != "flash":
        # non-kernel body: realize the prefix validity as this shard's slice
        # of the global mask (rotates with K/V like any kv_mask)
        L = k.shape[2]
        my = jax.lax.axis_index(axis_name)
        kv_mask = (jnp.arange(L) + my * L) < n_valid
        n_valid = None
    use_mask = kv_mask is not None
    # the dummy must be full-shaped: shard_map infers residual shardings per
    # rank, and a 0-sized stand-in picks up a bogus all-axes spec
    mask = (
        kv_mask.astype(jnp.float32)
        if use_mask
        else jnp.ones((k.shape[2],), jnp.float32)
    )
    return _ring(axis_name, impl, use_mask, n_valid, q, k, v, mask)


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
    keys are excluded exactly — via the static shard-validity switch on the
    flash path (kernel speed preserved on ragged shapes) or a rotating
    boolean mask on the XLA path.
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
    fn = jax.shard_map(
        lambda q, k, v: ring_attention(
            q, k, v, axis_name=seq_axis, impl=impl, n_valid=N
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(qp, kp, vp)[:, :, :N]
