"""Round-3 on-chip attention microbench: int8-QK vs exact, both head dims.

Times the Wan flagship attention shape (48 heads x 18480 x 128) and the
CogVideoX shape (48 x 17776 x 64) through the exact bf16 flash kernel and
the int8-QK kernels. The D=128 int8 kernel is called directly
(``_flash_int8_128``) because ``attention()`` no longer dispatches it — the
measurement this tool produced is why (exact won).

Timing methodology: the axon tunnel adds a per-dispatch round-trip overhead
that varies day to day (measured ~20 ms on 2026-08-18 — comparable to the
kernel itself), so each measurement chains R serial kernel applications
inside ONE jit (output feeds the next q via lax.fori_loop, forcing serial
execution) and syncs once; per-call time is the total over R. One JSON line
per measurement to stdout.

Run on the real chip: `PYTHONPATH=/root/repo:/root/.axon_site python
tools/onchip_r3.py` (plain PYTHONPATH=/root/repo drops the axon plugin).

Measured 2026-08-18 (v5e-1, chained timing, min of 3):
  cog_exact  D=64  2048/1024: 44.2 ms  87.8 TF/s
  cog_int8   D=64  2048/1024: 39.6 ms  98.1 TF/s  (1.12x — kept)
  wan_exact  D=128 1024/1024: 70.8 ms 118.5 TF/s
  wan_int8   D=128 1024/1024: 72.0 ms 116.6 TF/s  (loses — not dispatched)
  wan_int8   D=128  512/1024: 73.7 ms 113.8 TF/s  (loses)
(bq=2048 for the int8-128 kernel overflows the 16 MB scoped VMEM limit.)
"""

import json
import sys
import time

import numpy as np

R = 8  # chained kernel applications per dispatch


def main():
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.ops import attention as attn_mod
    from videogpa_tpu.ops.attention import attention
    from videogpa_tpu.train.memory import _enable_compile_cache

    _enable_compile_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()

    def bench(name, B, H, N, D, fn, bq, bk, iters=3):
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (B, H, N, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, H, N, D), jnp.bfloat16)
        v = jax.random.normal(kv, (B, H, N, D), jnp.bfloat16)

        def chained(q, k, v):
            def body(i, q):
                return (fn(q, k, v, bq, bk) * 0.125).astype(q.dtype)

            return jnp.sum(jax.lax.fori_loop(0, R, body, q))

        f = jax.jit(chained)
        float(np.asarray(f(q, k, v)))  # compile
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(np.asarray(f(q, k, v)))
            ts.append((time.perf_counter() - t0) / R)
        dt = min(ts)
        tflops = 4.0 * B * H * N * N * D / dt / 1e12
        rec = {
            "name": name, "B": B, "H": H, "N": N, "D": D, "bq": bq, "bk": bk,
            "ms": round(dt * 1e3, 1), "tflops": round(tflops, 1),
        }
        print(json.dumps(rec), flush=True)
        return rec

    def public(impl):
        return lambda q, k, v, bq, bk: attention(
            q, k, v, impl=impl, block_q=bq, block_k=bk
        )

    def int8_128(q, k, v, bq, bk):
        # direct kernel call (attention() routes D>=128 int8 to exact)
        B, H, N, D = q.shape
        Np = (N + bq - 1) // bq * bq
        pad = [(0, 0), (0, Np - N), (0, 0)]
        qp = jnp.pad(q.reshape(B * H, N, D), pad)
        kp = jnp.pad(k.reshape(B * H, N, D), pad)
        vp = jnp.pad(v.reshape(B * H, N, D), pad)
        out = attn_mod._flash_int8_128(qp, kp, vp, N, bq, bk)
        return out[:, :N].reshape(B, H, N, D)

    # CogVideoX shape, D=64: exact vs the dispatched int8 path
    bench("cog_exact", 1, 48, 17776, 64, public("flash"), 2048, 1024)
    bench("cog_int8", 1, 48, 17776, 64, public("flash_int8"), 2048, 1024)
    # Wan flagship shape, D=128: exact vs the (rejected) int8-128 kernel
    bench("wan_exact", 1, 48, 18480, 128, public("flash"), 1024, 1024)
    for bq, bk in ((1024, 1024), (512, 1024), (1024, 512)):
        bench("wan_int8_kernel", 1, 48, 18480, 128, int8_128, bq, bk)


if __name__ == "__main__":
    sys.exit(main())
