"""Aggregator time split at the scorer operating point (round 4).

The K=4 scorer decomposition (tools/onchip_scorer_native.py) leaves the
VGGT aggregator at 1.888 s — the largest single term.  FLOP model at
K=4 x 10 frames @ 518^2 (B*S = 40 seqs of P = 1374 tokens, C = 1024,
16 heads x D = 64, 24 frame + 24 global blocks):

  GEMMs      24 * N * C^2 * 48 blocks   = 66.4 TF   (N = 54,960 tokens)
  frame attn 40 * 4 * 1374^2 * 1024 * 24 =  7.4 TF
  global attn 4 * 4 * 13740^2 * 1024 * 24 = 74.2 TF

This tool measures each piece as its own chained-in-jit program (CLAUDE.md
tunnel rule: R applications inside one jit, sync once) so we can see which
piece is below its measured ceiling (flash D<128 lagged kernel: 82-96 TF/s;
plain bf16 GEMM floor: ~150+ TF/s on v5e).

Run: PYTHONPATH=/root/repo python tools/onchip_agg_split.py
"""

import json
import sys
import time

import numpy as np

R = 8  # chained applications per timed program


def bench(name, f, x, tflop_per_apply):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(x):
        def body(i, y):
            return f(y)
        return jax.lax.fori_loop(0, R, body, x)

    float(np.asarray(jnp.sum(chained(x))))  # compile + first dispatch
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(jnp.sum(chained(x))))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / R
    print(json.dumps({
        "name": name, "ms_per_apply": round(dt * 1e3, 2),
        "tflops": round(tflop_per_apply / dt, 1),
    }), flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.models.vggt import VGGTConfig
    from videogpa_tpu.models.vggt.aggregator import _agg_block_cfg
    from videogpa_tpu.ops.transformer import block_apply, block_init
    from videogpa_tpu.ops.attention import attention
    from videogpa_tpu.train.memory import _enable_compile_cache

    _enable_compile_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()

    cfg = VGGTConfig()
    bcfg = _agg_block_cfg(cfg)
    C, Hn, D = 1024, 16, 64
    BS, P, B = 40, 1374, 4
    key = jax.random.PRNGKey(0)

    # --- attention alone, both shapes (bnhd layout like the trunk) ---
    qf = jax.random.normal(key, (BS, P, Hn, D), jnp.bfloat16)
    bench("frame_attn", lambda q: attention(q, q, q, layout="bnhd"), qf,
          4 * BS * P * P * C / 1e12)

    qg = jax.random.normal(key, (B, BS // B * P, Hn, D), jnp.bfloat16)
    bench("global_attn", lambda q: attention(q, q, q, layout="bnhd"), qg,
          4 * B * (BS // B * P) ** 2 * C / 1e12)

    # --- GEMM chain: qkv + proj + fc1 + fc2 at the token count ---
    N = BS * P
    wqkv = jax.random.normal(key, (C, 3 * C), jnp.bfloat16) * 0.02
    wproj = jax.random.normal(key, (C, C), jnp.bfloat16) * 0.02
    w1 = jax.random.normal(key, (C, 4 * C), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(key, (4 * C, C), jnp.bfloat16) * 0.02
    x = jax.random.normal(key, (N, C), jnp.bfloat16)

    def gemms(x):
        a = (x @ wqkv)[:, :C]
        b = a @ wproj
        c = jax.nn.gelu(b @ w1)
        return (c @ w2).astype(jnp.bfloat16)

    bench("block_gemms", gemms, x, 2 * N * C * C * (3 + 1 + 4 + 4) / 1e12)

    # --- one full aggregator block pair (frame + global), production code ---
    fp = block_init(jax.random.PRNGKey(1), bcfg)
    gp = block_init(jax.random.PRNGKey(2), bcfg)
    pos_f = jnp.zeros((BS, P, 2), jnp.int32)
    pos_g = jnp.zeros((B, BS // B * P, 2), jnp.int32)
    tok = jax.random.normal(key, (BS, P, C), jnp.bfloat16)

    def pair(t):
        t = block_apply(fp, t, bcfg, pos=pos_f, attn_impl="flash")
        t = t.reshape(B, BS // B * P, C)
        t = block_apply(gp, t, bcfg, pos=pos_g, attn_impl="flash")
        return t.reshape(BS, P, C)

    gemm_tf = 2 * N * C * C * 24 / 1e12
    attn_tf = (4 * BS * P * P * C + 4 * B * (BS // B * P) ** 2 * C) / 1e12
    bench("block_pair_full", pair, tok, gemm_tf + attn_tf)


if __name__ == "__main__":
    sys.exit(main())
