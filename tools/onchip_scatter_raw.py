"""Scatter-min RAW-hazard probe (round 5).

Two same-day measurements disagree: the production-shaped scatter
(tools/onchip_geometry_split.py, keys from projected random clouds) runs at
~72 M updates/s, while a uniform-random-address scatter of the same size
(tools/onchip_sortmin_ab.py) runs at ~110 M/s. Hypothesis: the scalar
read-modify-write loop pipelines at ~8.5 cycles/update for DISTINCT
addresses but stalls on read-after-write when consecutive updates hit the
SAME address — which production data does constantly (every invalid point
goes to its view's single dump slot; spatially-coherent neighbors project
to the same pixel back-to-back).

Measures scatter-min of 26.8M updates into 2.68M slots under:
  1. uniform      — random addresses (the 110 M/s case)
  2. dump_heavy   — 50% of updates to ONE slot (worst RAW chain)
  3. dump_spread  — same 50% invalid, spread over a 1024-slot dump region
  4. coherent     — run-length-8 addresses (spatial coherence stand-in)
  5. coherent_interleaved — same updates, stream transposed so consecutive
     entries come from different views (the production fix)

Run: PYTHONPATH=/root/repo python tools/onchip_scatter_raw.py
"""

import json
import sys
import time

import numpy as np

T, HW_S = 10, 518


def main():
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.train.memory import _enable_compile_cache

    _enable_compile_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()

    S = HW_S
    N = T * S * S
    n_px = S * S
    P = T * (n_px + 1)
    U = T * N
    results = {}

    def timeit(name, fn, *args, iters=3):
        out = fn(*args)
        float(np.asarray(jnp.sum(out.ravel()[:8].astype(jnp.float32))))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            float(np.asarray(jnp.sum(out.ravel()[:8].astype(jnp.float32))))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        results[name] = dt
        print(json.dumps({"name": name, "s": round(dt, 4),
                          "m_updates_per_s": round(U / dt / 1e6, 1)}),
              flush=True)
        return dt

    @jax.jit
    def scat(lin, key32):
        buf = jnp.full((P,), jnp.uint32(0xFFFFFFFF))
        return buf.at[lin].min(key32)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    key32 = jax.random.randint(k2, (U,), 0, 1 << 30, jnp.int32).astype(
        jnp.uint32)

    # 1. uniform random addresses
    lin_u = jax.random.randint(k1, (U,), 0, P, jnp.int32)
    timeit("uniform", scat, lin_u, key32)

    # 2. 50% of updates to one dump slot (per-view layout, view-major order)
    valid = jax.random.bernoulli(k3, 0.5, (T, N))
    vb = jax.lax.broadcasted_iota(jnp.int32, (T, N), 0) * (n_px + 1)
    px = jax.random.randint(k1, (T, N), 0, n_px, jnp.int32)
    lin_d1 = jnp.where(valid, vb + px, vb + n_px).reshape(-1)
    timeit("dump_heavy_1slot", scat, lin_d1, key32)

    # 3. same invalid fraction, dump spread over 1024 slots
    P2 = T * (n_px + 1024)
    pid = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
    vb2 = jax.lax.broadcasted_iota(jnp.int32, (T, N), 0) * (n_px + 1024)
    lin_d2 = jnp.where(valid, vb2 + px, vb2 + n_px + (pid & 1023)).reshape(-1)

    @jax.jit
    def scat2(lin, key32):
        buf = jnp.full((P2,), jnp.uint32(0xFFFFFFFF))
        return buf.at[lin].min(key32)

    timeit("dump_spread_1024", scat2, lin_d2, key32)

    # 4. coherent addresses: runs of 8 consecutive updates per pixel
    px_runs = jnp.repeat(
        jax.random.randint(k1, (T, N // 8), 0, n_px, jnp.int32), 8, axis=1)
    lin_c = (vb + px_runs).reshape(-1)
    timeit("coherent_run8", scat, lin_c, key32)

    # 5. the same coherent updates, view-interleaved stream order
    lin_ci = jnp.transpose(vb + px_runs, (1, 0)).reshape(-1)
    key_ci = jnp.transpose(key32.reshape(T, N), (1, 0)).reshape(-1)
    timeit("coherent_interleaved", scat, lin_ci, key_ci)

    # 6. dump-spread AND interleaved (the candidate production layout)
    lin_best = jnp.transpose(
        jnp.where(valid, vb2 + px, vb2 + n_px + (pid & 1023)), (1, 0)
    ).reshape(-1)
    timeit("spread_and_interleaved", scat2, lin_best, key_ci)

    print(json.dumps({
        "name": "summary",
        "uniform_vs_dump1": round(
            results["dump_heavy_1slot"] / results["uniform"], 3),
        "spread_recovers": round(
            results["dump_heavy_1slot"] / results["dump_spread_1024"], 3),
        "interleave_recovers": round(
            results["coherent_run8"] / results["coherent_interleaved"], 3),
    }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
