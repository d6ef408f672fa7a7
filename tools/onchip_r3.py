"""Round-3 on-chip attention microbench: D=128 int8-QK vs exact.

Times the Wan flagship attention shape (48 heads x 18480 x 128) through
the exact bf16 flash kernel and the new lane-full int8-QK kernel at a few
block geometries, plus the CogVideoX D=64 shape for continuity with the
recorded numbers. One JSON line per measurement to stdout.

Run on the real chip: `python tools/onchip_r3.py` (first compile is slow;
timings use the scalar-reduction sync per CLAUDE.md).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.ops.attention import attention
    from videogpa_tpu.train.memory import _enable_compile_cache

    _enable_compile_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()

    def bench(name, B, H, N, D, impl, bq, bk, iters=3):
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (B, H, N, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, H, N, D), jnp.bfloat16)
        v = jax.random.normal(kv, (B, H, N, D), jnp.bfloat16)
        f = jax.jit(
            lambda q, k, v: jnp.sum(
                attention(q, k, v, impl=impl, block_q=bq, block_k=bk)
            )
        )
        float(np.asarray(f(q, k, v)))  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            s = float(np.asarray(f(q, k, v)))
        dt = (time.perf_counter() - t0) / iters
        tflops = 4.0 * B * H * N * N * D / dt / 1e12
        rec = {
            "name": name, "impl": impl, "B": B, "H": H, "N": N, "D": D,
            "bq": bq, "bk": bk, "ms": round(dt * 1e3, 1),
            "tflops": round(tflops, 1),
        }
        print(json.dumps(rec), flush=True)
        return rec

    # Wan flagship shape: exact baseline then int8 at candidate geometries
    bench("wan_exact", 1, 48, 18480, 128, "flash", 1024, 1024)
    for bq, bk in ((1024, 1024), (512, 1024), (1024, 512), (2048, 1024)):
        bench("wan_int8", 1, 48, 18480, 128, "flash_int8", bq, bk)
    # CogVideoX shape for continuity (existing records: exact 81.8, int8 95)
    bench("cog_exact", 1, 48, 17776, 64, "flash", 1024, 2048)
    bench("cog_int8", 1, 48, 17776, 64, "flash_int8", 1024, 2048)


if __name__ == "__main__":
    sys.exit(main())
