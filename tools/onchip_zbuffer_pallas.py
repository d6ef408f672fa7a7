"""Pallas windowed scatter-min A/B vs the XLA scatter (round 5, VERDICT #7).

The packed z-buffer's single fused scatter-min is the scorer's largest
remaining cost (~0.24 s/clip at K=4; XLA:TPU lowers scatter to a serial
~16 cycles/update RMW loop, tools/onchip_geometry_split.py). Every
vectorized alternative needs per-lane routing the VPU doesn't have — EXCEPT
a windowed broadcast-compare: if a sub-chunk of 1024 consecutive updates
lands within a Wn-slot destination window (true for spatially-coherent
projections: consecutive updates are neighboring source pixels), then

    contrib[p] = min over updates u of (key[u] if addr[u] == base + p)

is an all-pairs compare+select+min over (1024 x Wn) elements — pure VPU
work at Wn elem-ops/update, no scatter. At Wn=2048 and the VPU's 4-8
elem-ops/cycle/lane-group this could be 3-5x the scatter's 16 cycles.

This tool measures, on the real chip, with synthetic ALL-IN-WINDOW data
(pure fast-path throughput — the upper bound of the win):

  1. scatter_baseline  — XLA buf.at[lin].min(key), same data
  2. pallas_w{1024,2048,4096} — the windowed kernel at three window sizes
  3. pallas_serial     — in-kernel per-update RMW loop (slow-path cost)
  4. vpu_probe         — raw eq/sel/min elem-op throughput (calibration)

plus an exactness check of every kernel against numpy minimum.at.
CPU validation: VIDEOGPA_INTERPRET=1 runs tiny shapes through the Pallas
interpreter.

MEASURED (2026-08-20, v5e): scatter 19.3 cycles/update; windowed kernel
4.1 / 6.1 / 9.8 at Wn = 1024 / 2048 / 4096 (fast-path speedup 4.7x at
1024); in-kernel serial 47.1. The production verdict on projection-shaped
streams is NEGATIVE — see tools/onchip_zbuffer_prod.py and
geometry/zbuffer_kernel.py (chunk destination footprints span thousands of
slots, ~70% of chunks exceed every window).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/onchip_zbuffer_pallas.py
"""

import json
import os
import sys
import time

import numpy as np

INTERPRET = os.environ.get("VIDEOGPA_INTERPRET") == "1"
SENT = np.uint32(0xFFFFFFFF)


def make_windowed(R, n_sub, Wn, interpret=False):
    """Windowed broadcast-compare scatter-min.

    Args (to the returned fn):
      bases: (n_sub, 1) i32 — window base ROW (multiple of 8) per sub-chunk
      lin:   (n_sub, 8, 128) i32 — absolute flat addresses, all within
             [base*128, base*128 + Wn) for their sub-chunk
      key:   (n_sub, 8, 128) u32 — keys (SENT = no-op)
    Returns: (R, 128) u32 dest, min-reduced.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    WR = Wn // 128  # window rows
    # Mosaic cannot min-reduce unsigned ints; keys enter biased to i32
    # (x ^ 0x8000_0000 preserves order), SENT maps to i32 max
    SENT_I = np.int32(0x7FFFFFFF)

    def kernel(base_ref, lin_ref, key_ref, dest_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dest_ref[:] = jnp.full((R, 128), SENT_I, jnp.int32)

        rb = pl.multiple_of(base_ref[i % 8, 0], 8)
        a = lin_ref[0]  # (8,128) i32
        kv = key_ref[0]  # (8,128) i32 biased
        rel = a - rb * 128  # in [0, Wn)

        win = dest_ref[pl.ds(rb, WR), :]  # (WR,128) i32 biased
        rows = []
        for pb in range(WR):
            pos = pb * 128 + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, 128), 2
            )
            eq = rel[:, :, None] == pos  # (8,128,128) all-pairs
            sel = jnp.where(eq, kv[:, :, None], SENT_I)
            m = jnp.min(sel, axis=0)  # (128,128)
            rows.append(jnp.min(m, axis=0, keepdims=True))  # (1,128)
        contrib = jnp.concatenate(rows, axis=0)  # (WR,128)
        dest_ref[pl.ds(rb, WR), :] = jnp.minimum(win, contrib)

    grid = (n_sub,)
    f = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, 1), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def run(bases, lin, key_u32):
        bias = jnp.uint32(0x80000000)
        kb = jax.lax.bitcast_convert_type(key_u32 ^ bias, jnp.int32)
        out = f(bases, lin, kb)
        return jax.lax.bitcast_convert_type(out, jnp.uint32) ^ bias

    return jax.jit(run)


def make_serial(R, n_sub, interpret=False):
    """In-kernel serial per-update RMW loop (the slow-path / fallback cost)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SENT_I = np.int32(0x7FFFFFFF)

    def kernel(lin_ref, key_ref, dest_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dest_ref[:] = jnp.full((R, 128), SENT_I, jnp.int32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(j, _):
            s, l = j // 128, j % 128
            addr = lin_ref[0, s, l]
            kv = key_ref[0, s, l]
            r, c = addr // 128, addr % 128
            row = dest_ref[pl.ds(r, 1), :]
            hit = (lane == c) & (kv < row)
            dest_ref[pl.ds(r, 1), :] = jnp.where(hit, kv, row)
            return 0

        jax.lax.fori_loop(0, 1024, body, 0)

    f = pl.pallas_call(
        kernel,
        grid=(n_sub,),
        in_specs=[
            # scalar per-update reads need SMEM (Mosaic can't do (1,1,1)
            # vector loads from VMEM)
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def run(lin, key_u32):
        bias = jnp.uint32(0x80000000)
        kb = jax.lax.bitcast_convert_type(key_u32 ^ bias, jnp.int32)
        out = f(lin, kb)
        return jax.lax.bitcast_convert_type(out, jnp.uint32) ^ bias

    return jax.jit(run)


def make_vpu_probe(iters, interpret=False):
    """Raw eq/select/min elem-op throughput on (8,128,128) operands."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SENT_I = np.int32(0x7FFFFFFF)

    def kernel(a_ref, k_ref, o_ref):
        a = a_ref[:]
        kv = k_ref[:]

        def body(pb, acc):
            pos = pb + jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
            eq = a[:, :, None] == pos
            sel = jnp.where(eq, kv[:, :, None], SENT_I)
            m = jnp.min(sel, axis=0)
            return jnp.minimum(acc, jnp.min(m, axis=0, keepdims=True))

        acc = jnp.full((1, 128), SENT_I, jnp.int32)
        o_ref[:] = jax.lax.fori_loop(0, iters, body, acc)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        interpret=interpret,
    )
    return jax.jit(f)


def gen_data(rng, R, n_sub, Wn, P):
    """Synthetic all-in-window sub-chunks: base rows + addresses + keys."""
    WR = Wn // 128
    bases = rng.integers(0, (R - WR) // 8 + 1, (n_sub, 1)).astype(np.int32) * 8
    rel = rng.integers(0, Wn, (n_sub, 8, 128)).astype(np.int32)
    lin = bases[:, :, None] * 128 + rel
    key = rng.integers(0, 1 << 32, (n_sub, 8, 128), dtype=np.int64).astype(
        np.uint32
    )
    return bases, lin, key


def reference_dest(lin, key, R):
    buf = np.full((R * 128,), SENT, np.uint32)
    np.minimum.at(buf, lin.reshape(-1), key.reshape(-1))
    return buf.reshape(R, 128)


def main():
    import jax
    import jax.numpy as jnp

    if INTERPRET:
        jax.config.update("jax_platforms", "cpu")
        R, n_sub = 64, 8
        windows = [1024]
    else:
        from videogpa_tpu.train.memory import _enable_compile_cache

        _enable_compile_cache()
        assert jax.default_backend() == "tpu", jax.default_backend()
        # production clip shape: U = 26.8M updates, P = 2.68M slots
        R, n_sub = 20968, 26176
        windows = [1024, 2048, 4096]

    P = R * 128
    U = n_sub * 1024
    rng = np.random.default_rng(0)
    results = {}

    def timeit(name, fn, *args, iters=3):
        out = fn(*args)
        float(np.asarray(jnp.sum(out.ravel()[:8].astype(jnp.float32))))
        dt = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            float(np.asarray(jnp.sum(out.ravel()[:8].astype(jnp.float32))))
            dt = min(dt, time.perf_counter() - t0)
        results[name] = dt
        print(
            json.dumps(
                {
                    "name": name,
                    "s": round(dt, 4),
                    "m_updates_per_s": round(U / dt / 1e6, 1),
                    "cycles_per_update": round(dt * 1.74e9 / U, 1),
                }
            ),
            flush=True,
        )
        return out

    # exactness on a tiny case first (any backend)
    Rs, ns, Wns = 64, 8, 1024
    bs, ls, ks = gen_data(np.random.default_rng(7), Rs, ns, Wns, Rs * 128)
    want = reference_dest(ls, ks, Rs)
    got = np.asarray(
        make_windowed(Rs, ns, Wns, interpret=INTERPRET)(
            jnp.asarray(bs), jnp.asarray(ls), jnp.asarray(ks)
        )
    )
    ok_w = bool(np.array_equal(want, got))
    got_s = np.asarray(
        make_serial(Rs, ns, interpret=INTERPRET)(
            jnp.asarray(ls), jnp.asarray(ks)
        )
    )
    ok_s = bool(np.array_equal(want, got_s))
    print(json.dumps({"name": "exactness", "windowed": ok_w, "serial": ok_s}),
          flush=True)
    if INTERPRET:
        return 0 if (ok_w and ok_s) else 1

    for Wn in windows:
        bases, lin, key = gen_data(rng, R, n_sub, Wn, P)
        jb, jl, jk = jnp.asarray(bases), jnp.asarray(lin), jnp.asarray(key)

        if Wn == windows[0]:
            # XLA scatter baseline on identical data
            @jax.jit
            def scat(lin, key):
                buf = jnp.full((P,), SENT, jnp.uint32)
                return buf.at[lin.reshape(-1)].min(key.reshape(-1))

            timeit("scatter_baseline", scat, jl, jk)
            timeit("pallas_serial", make_serial(R, n_sub), jl, jk)

        timeit(f"pallas_w{Wn}", make_windowed(R, n_sub, Wn), jb, jl, jk)

    # VPU calibration: elem-ops/cycle on the kernel's inner shapes
    probe_iters = 4096
    a = jnp.asarray(rng.integers(0, 128, (8, 128), dtype=np.int32))
    kv = jnp.asarray(rng.integers(0, 1 << 31, (8, 128)).astype(np.int32))
    probe = make_vpu_probe(probe_iters)
    probe(a, kv)
    t0 = time.perf_counter()
    float(np.asarray(jnp.sum(probe(a, kv).astype(jnp.float32))))
    dt = time.perf_counter() - t0
    elems = probe_iters * 8 * 128 * 128 * 3  # eq + sel + min
    print(
        json.dumps(
            {
                "name": "vpu_probe",
                "s": round(dt, 4),
                "elem_ops_per_cycle": round(elems / (dt * 1.74e9), 1),
            }
        ),
        flush=True,
    )

    base = results.get("scatter_baseline")
    best = min(
        (v for k, v in results.items() if k.startswith("pallas_w")),
        default=None,
    )
    if base and best:
        print(
            json.dumps(
                {"name": "summary", "fast_path_speedup": round(base / best, 2)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    sys.exit(main())
