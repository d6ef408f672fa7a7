"""On-chip microbench of the z-buffer reprojection stage (round 4).

tools/onchip_scorer_native.py showed the fused scorer is GEOMETRY-bound:
unproject -> z-buffer reproject costs 3.19 s at K=4 — more than the entire
VGGT-1B backbone forward (2.77 s). This tool isolates the primitives at the
production shape (N = 10 x 518² = 2.68M points, T = 10 views, K = 4 clips)
and A/Bs candidate lowerings:

  scatter1        one scatter-min (f32) of N values into HW+1 slots
  gather1         one gather of N values from HW+1 slots
  project_math    the projection matmuls + rounding (no scatter)
  one_view        full project_points_zbuffer, one view
  full_scatter    production batch_reproject (lax.map over T, vmap over K)
  full_sorted     the sorted variant
  packed          single-scatter packed-key variant (z quantized to 10 bits
                  + 22-bit point id in one uint32; candidate fast path)
  per_frame       S separate near-unique scatters (268k each) + minimum tree

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/onchip_zbuffer_ab.py
"""

import functools
import json
import sys
import time

import numpy as np

K = 4
S = 10
HW_SIDE = 518


def main():
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.geometry.projection import batch_reproject
    from videogpa_tpu.train.memory import _enable_compile_cache

    _enable_compile_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()

    H = W = HW_SIDE
    N = S * H * W
    n_px = H * W
    rng = np.random.default_rng(0)

    # synthetic but realistically-distributed inputs
    points = jnp.asarray(rng.standard_normal((K, N, 3)).astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 255, (K, N, 3)).astype(np.float32))
    intr = jnp.asarray(
        np.broadcast_to(
            np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32),
            (K, S, 3, 3),
        ).copy()
    )
    extr = jnp.asarray(
        np.broadcast_to(np.eye(4, dtype=np.float32)[None, None, :3], (K, S, 3, 4)).copy()
    )
    lin = jnp.asarray(rng.integers(0, n_px + 1, (K, N), dtype=np.int32))
    zvals = jnp.asarray(rng.uniform(0.1, 10.0, (K, N)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(K, N)) > 0.1)
    jax.block_until_ready((points, colors, intr, extr, lin, zvals))

    def timeit(name, fn, *args, iters=3):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        float(np.asarray(jnp.sum(leaves[0].ravel()[:8])))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            float(np.asarray(jnp.sum(leaves[0].ravel()[:8])))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(json.dumps({"name": name, "s": round(dt, 4)}), flush=True)
        return dt

    # --- primitives (single clip) ---
    @jax.jit
    def scatter1(lin, z):
        zbuf = jnp.full((n_px + 1,), jnp.inf, jnp.float32)
        return zbuf.at[lin[0]].min(z[0])

    timeit("scatter1_2.68M", scatter1, lin, zvals)

    @jax.jit
    def scatter1_batched(lin, z):  # vmapped over K like production
        def one(l, zz):
            zbuf = jnp.full((n_px + 1,), jnp.inf, jnp.float32)
            return zbuf.at[l].min(zz)

        return jax.vmap(one)(lin, z)

    timeit("scatter_K4", scatter1_batched, lin, zvals)

    @jax.jit
    def gather1(lin, z):
        zbuf = jnp.cumsum(jnp.ones((n_px + 1,), jnp.float32))
        return jnp.sum(zbuf[lin[0]] * z[0])

    timeit("gather1_2.68M", gather1, lin, zvals)

    # --- production path ---
    @jax.jit
    def full_scatter(points, colors, intr, extr, valid):
        return jax.vmap(
            lambda p, c, Ki, Ei, v: batch_reproject(p, c, Ki, Ei, H, W, valid=v)
        )(points, colors, intr, extr, valid)

    timeit("full_scatter_K4xT10", full_scatter, points, colors, intr, extr, valid)

    @jax.jit
    def full_sorted(points, colors, intr, extr, valid):
        return jax.vmap(
            lambda p, c, Ki, Ei, v: batch_reproject(
                p, c, Ki, Ei, H, W, valid=v, zbuffer_impl="sorted"
            )
        )(points, colors, intr, extr, valid)

    timeit("full_sorted_K4xT10", full_sorted, points, colors, intr, extr, valid)

    # --- packed-key single-scatter candidate ---
    # quantize z to 10 bits within [z_min, z_max], pack pid in the low 22
    # bits; ONE scatter-min resolves both passes (winner = lowest packed key
    # = nearest quantized depth, lowest pid among quantization ties)
    @jax.jit
    def packed(lin, z, valid):
        def one(l, zz, v):
            zmin = jnp.min(jnp.where(v, zz, jnp.inf))
            zmax = jnp.max(jnp.where(v, zz, -jnp.inf))
            zq = jnp.clip(
                ((zz - zmin) / (zmax - zmin + 1e-9) * 1023.0), 0, 1023
            ).astype(jnp.int32)
            pid = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]
            key = (zq << 22) | pid
            key = jnp.where(v, key, jnp.int32(2**31 - 1))
            buf = jnp.full((n_px + 1,), jnp.int32(2**31 - 1))
            buf = buf.at[jnp.where(v, l, n_px)].min(key)
            win = buf[:n_px] & ((1 << 22) - 1)
            hit = buf[:n_px] < (2**31 - 1)
            return win, hit

        return jax.vmap(one)(lin, z, valid)

    timeit("packed_single_scatter_K4x1view", packed, lin, zvals, valid)

    # --- per-source-frame scatters (near-unique indices) + min-combine ---
    @jax.jit
    def per_frame(lin, z, valid):
        def one(l, zz, v):
            lf = l.reshape(S, H * W)
            zf = jnp.where(v, zz, jnp.inf).reshape(S, H * W)

            def body(s_buf, inp):
                lfi, zfi = inp
                buf = jnp.full((n_px + 1,), jnp.inf, jnp.float32)
                buf = buf.at[lfi].min(zfi, unique_indices=False)
                return jnp.minimum(s_buf, buf), None

            init = jnp.full((n_px + 1,), jnp.inf, jnp.float32)
            out, _ = jax.lax.scan(body, init, (lf, zf))
            return out

        return jax.vmap(one)(lin, z, valid)

    timeit("per_frame_scatters_K4x1view", per_frame, lin, zvals, valid)


if __name__ == "__main__":
    sys.exit(main())
