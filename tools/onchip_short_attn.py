"""Prototype: short-seq full-softmax attention kernel in native bnhd layout.

Round-4 scorer finding (tools/onchip_agg_split.py + /tmp/frame_* probes):
VGGT frame attention (40 seqs x 1374 tokens, 16 heads x D=64) runs at
22-23 TF/s end to end while global attention (seq 13740) hits 82.7.
Decomposition on chip:

  - the transposed lagged-max kernel on PRE-LAID operands: 7.89 ms
    (39.2 TF/s at bq=bk=1408) — the one-shot (single k-block) path is
    fully max->exp stalled, and block geometry only matters here
    (1024/2048: 11.95 ms);
  - the bnhd operand transposes (qt/vt build + out): ~3.6-6 ms — at short
    seq the layout tax is ~45% of the wall clock (at 17776 it amortizes).

This kernel removes the layout tax entirely: BlockSpecs read q/k/v
straight out of the (B, N, H, D) projection layout (one head per grid
step, no materialized transpose), compute s^T = K Q^T (D-deep contraction,
same geometry as the production kernel), one-shot softmax over the full
row, and PV as V^T P via sublane-sublane contraction. Scores (1408x1408
f32 = 7.9 MB) sit in VMEM scratch.

Run: PYTHONPATH=/root/repo python tools/onchip_short_attn.py  (TPU)
     INTERPRET=1 ... (CPU numerics check)
"""

import functools
import json
import os
import sys
import time

import numpy as np

INTERPRET = os.environ.get("INTERPRET") == "1"


def _round_up(x, m):
    return (x + m - 1) // m * m


def short_attn(q, k, v, block_q=512, interpret=False):
    """Full-softmax attention for short sequences, bnhd layout in/out.

    q, k, v: (B, N, H, D). The whole key row AND all H heads live in each
    program (Pallas TPU requires the last two block dims to divide (8, 128)
    or equal the array dims, so per-head blocking of a (B, N, H, D) array
    is not expressible — instead the block is (1, bq, H, D) and the kernel
    loops heads, which also lets head h+1's QK^T issue on the MXU while
    head h's softmax runs on the VPU: no online softmax, no lagged max,
    the row max is exact. k/v are fetched once per (b, i) for all heads.
    Returns (B, N, H, D).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, H, D = q.shape
    Nk = k.shape[1]
    Nk_pad = _round_up(Nk, 128)
    bq = min(block_q, _round_up(N, 128))
    C = H * D
    scale = D ** -0.5
    log2e = 1.4426950408889634

    def kernel(q_ref, k_ref, v_ref, o_ref):
        kt = k_ref[0]  # (Nk_pad, C)
        vt = v_ref[0]
        if Nk_pad != Nk:
            # overwrite-mask padded k/v rows: out-of-bounds block reads are
            # undefined (NaN in interpret mode), an additive mask keeps NaN
            row = jax.lax.broadcasted_iota(jnp.int32, (Nk_pad, 1), 0)
            vt = jnp.where(row < Nk, vt, 0)
        outs = []
        for h in range(H):
            qh = q_ref[0, :, h * D:(h + 1) * D]  # (bq, D) lane slice
            kh = kt[:, h * D:(h + 1) * D]  # (Nk_pad, D)
            # s^T (Nk, bq) = K Q^T — D-deep contraction, full output lanes
            s = jax.lax.dot_general(
                kh, qh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * (scale * log2e)
            if Nk_pad != Nk:
                rr = jax.lax.broadcasted_iota(jnp.int32, (Nk_pad, 1), 0)
                s = jnp.where(rr < Nk, s, -1e30)
            m = jnp.max(s, axis=0, keepdims=True)  # (1, bq)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=0, keepdims=True)  # (1, bq)
            # acc (D, bq) = V^T P — sublane-sublane contraction
            acc = jax.lax.dot_general(
                vt[:, h * D:(h + 1) * D], p.astype(v.dtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append((acc / l).T.astype(o_ref.dtype))
        o_ref[0] = jnp.concatenate(outs, axis=1)  # (bq, C) lane concat

    grid = (B, pl.cdiv(N, bq))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Nk_pad, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Nk_pad, C), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # k/v stay resident across q blocks and all H heads' score
            # tiles pipeline through — worth more VMEM than the 16 MB
            # default scoped limit (v5e has 128 MB)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q.reshape(B, N, C), k.reshape(B, Nk, C), v.reshape(B, Nk, C))
    return out.reshape(B, N, H, D)


def main():
    import jax
    import jax.numpy as jnp

    if INTERPRET:
        jax.config.update("jax_platforms", "cpu")
    else:
        from videogpa_tpu.train.memory import _enable_compile_cache

        _enable_compile_cache()
        assert jax.default_backend() == "tpu", jax.default_backend()

    from videogpa_tpu.ops.attention import attention, mha_reference

    BS, P, Hn, D = (4, 222, 4, 32) if INTERPRET else (40, 1374, 16, 64)
    C = Hn * D
    R = 1 if INTERPRET else 8
    tf = 4 * BS * P * P * C / 1e12
    q = jax.random.normal(jax.random.PRNGKey(0), (BS, P, Hn, D), jnp.bfloat16)
    kk = jax.random.normal(jax.random.PRNGKey(1), (BS, P, Hn, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (BS, P, Hn, D), jnp.bfloat16)

    # numerics vs the XLA oracle
    o = short_attn(q, kk, v, interpret=INTERPRET)
    r = jnp.swapaxes(
        mha_reference(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(kk, 1, 2), jnp.swapaxes(v, 1, 2)
        ), 1, 2,
    )
    err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - r.astype(jnp.float32))))
    print(json.dumps({"name": "max_abs_err_vs_oracle", "v": err}), flush=True)
    if INTERPRET:
        assert err < 2e-2, err
        print("interpret OK")
        return

    def bench(name, f, x):
        @jax.jit
        def chained(x):
            return jax.lax.fori_loop(0, R, lambda i, y: f(y), x)

        try:
            float(np.asarray(jnp.sum(chained(x))))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(jnp.sum(chained(x))))
                ts.append(time.perf_counter() - t0)
            dt = min(ts) / R
            print(json.dumps({"name": name, "ms": round(dt * 1e3, 2),
                              "tflops": round(tf / dt, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"name": name, "error": str(e)[:200]}), flush=True)

    bench("short_attn_bq512", lambda x: short_attn(x, x, x, block_q=512), q)
    bench("short_attn_bq1024", lambda x: short_attn(x, x, x, block_q=1024), q)
    bench("short_attn_bq1408", lambda x: short_attn(x, x, x, block_q=1408), q)
    bench("dispatch_today", lambda x: attention(x, x, x, layout="bnhd"), q)


if __name__ == "__main__":
    sys.exit(main())
