"""Round-4 on-chip check: training fwd+bwd after the guarded-fallback rework.

``_flash_fwd_guarded`` (the custom_vjp forward) now falls back to the
transposed stalling kernel with an lse output instead of rebuilding
classic-layout operands. The fallback branch is never *taken* for trained
inputs, but it is *compiled* into the program — this tool confirms the
fwd+bwd time at the CogVideoX flagship shape is unchanged (round-3
reference: 182 ms fwd+bwd, bwd-only 139 ms at 48 x 17776 x 64).

Timing: chained R applications inside one jit (see tools/onchip_r3.py for
the tunnel-overhead rationale), sync once, min of 3.

Run: `PYTHONPATH=/root/repo:/root/.axon_site python tools/onchip_r4_bwd_guard.py`

Measured 2026-08-19 (v5e-1, after the rework):
  fwdbwd 2048/1024: 180.5 ms  (round-3 pre-rework: 182 ms — unchanged)
  fwd    2048/1024:  47.4 ms  (inference dispatcher, 81.9 TF/s)
"""

import json
import sys
import time

import numpy as np

R = 4


def main():
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.ops.attention import attention
    from videogpa_tpu.train.memory import _enable_compile_cache

    _enable_compile_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()

    B, H, N, D = 1, 48, 17776, 64
    bq, bk = 2048, 1024
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, N, D), jnp.bfloat16)

    def loss(q, k, v):
        o = attention(q, k, v, impl="flash", block_q=bq, block_k=bk)
        return jnp.sum((o.astype(jnp.float32)) ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def chained_fwdbwd(q, k, v):
        # all three grads must feed the carry or XLA dead-code-eliminates
        # the dk/dv passes out of the backward kernel
        def body(i, q):
            dq, dk, dv = grad(q, k, v)
            return (q + 1e-6 * (dq + dk + dv).astype(q.dtype)).astype(q.dtype)

        return jnp.sum(jax.lax.fori_loop(0, R, body, q))

    def chained_fwd(q, k, v):
        def body(i, q):
            o = attention(q, k, v, impl="flash", block_q=bq, block_k=bk)
            return (o * 0.125).astype(q.dtype)

        return jnp.sum(jax.lax.fori_loop(0, R, body, q))

    for name, fn in (("fwdbwd", chained_fwdbwd), ("fwd", chained_fwd)):
        f = jax.jit(fn)
        float(np.asarray(f(q, k, v)))  # compile + first dispatch
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f(q, k, v)))
            ts.append((time.perf_counter() - t0) / R)
        dt = min(ts)
        flops = (10.0 if name == "fwdbwd" else 4.0) * B * H * N * N * D
        print(json.dumps({
            "name": name, "bq": bq, "bk": bk, "ms": round(dt * 1e3, 1),
            "tflops_eff": round(flops / dt / 1e12, 1),
        }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
