"""On-chip split of the scorer's metric suite (round 5).

tools/onchip_scorer_native.py pins the fused scored program's metric stage
at ~0.60 s (of 4.3 s at K=4) — the last block without its own decomposition.
This times each metric as its own jitted program at the production shape
(K=4 clips, T=10 frames @ 518², gt vs reprojected):

  mse_psnr  — elementwise (expected ~free)
  ssim      — gaussian 11-tap separable blurs
  mvcs      — 9 pairwise bilinear depth warps per clip: 4-tap gathers at
              268k pixels x 9 pairs x K = 38.6M gathers (the suspect:
              XLA:TPU gathers serialize like scatters)
  grid_sample_raw — one 518² bilinear sample (the primitive alone)

plus two slice-gather reformulations of the bilinear sample (one (2,2)-slice
gather per sample / two (1,2)-slice gathers) that would win if XLA:TPU's
gather cost were per-INDEX.

MEASURED (2026-08-20, v5e): mse+psnr 0.027 s, ssim 0.044, **mvcs 0.571** —
the metric stage is 95% MVCS, and MVCS is ~entirely bilinear-warp gathers
(36 per-pair warps x 268k pixels x 4 taps; one raw 518² sample = 0.035 s
incl. ~20 ms dispatch ≈ 56 cycles/pixel). Both slice-gather variants are
bit-exact and DON'T help: (2,2) slices lower 15x SLOWER (0.593 s/sample),
(1,2) is a wash (0.036) — gather cost is per-ELEMENT, not per-index, so
there is no cheap reformulation. Verdict: the metric stage is at the same
scalar-bound floor as the z-buffer scatter; together the scorer's
scatter+gather tax is ~1.6 s of the 4.3 s K=4 program, and the remaining
headroom is nowhere (backbone is at the attention-kernel floor, geometry at
the scatter floor, metrics at the gather floor). See ARCHITECTURE.md.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/onchip_metrics_split.py
"""

import json
import sys
import time

import numpy as np

K, T, S = 4, 10, 518


def main():
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.metrics import functional as F
    from videogpa_tpu.train.memory import _enable_compile_cache

    _enable_compile_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()

    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(0, 1, (K, T, 3, S, S)).astype(np.float32))
    rep = jnp.asarray(rng.uniform(0, 1, (K, T, 3, S, S)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1, 5, (K, T, S, S)).astype(np.float32))
    Kmat = np.array([[400.0, 0, S / 2], [0, 400.0, S / 2], [0, 0, 1]],
                    np.float32)
    intr = jnp.asarray(np.tile(Kmat, (K, T, 1, 1)))
    E = np.tile(np.eye(4, dtype=np.float32), (K, T, 1, 1))
    E[:, :, 0, 3] = rng.uniform(-0.2, 0.2, (K, T))
    extr = jnp.asarray(E)

    def timeit(name, fn, *args, iters=3):
        out = fn(*args)
        float(np.asarray(jnp.sum(out)))
        dt = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            float(np.asarray(jnp.sum(out)))
            dt = min(dt, time.perf_counter() - t0)
        print(json.dumps({"name": name, "s": round(dt, 4)}), flush=True)
        return dt

    @jax.jit
    def mse_psnr(gt, rep):
        return jax.vmap(F.mse)(gt, rep) + jax.vmap(F.psnr)(gt, rep)

    timeit("mse_psnr", mse_psnr, gt, rep)

    @jax.jit
    def ssim_all(gt, rep):
        return jax.vmap(F.ssim)(gt, rep)

    timeit("ssim", ssim_all, gt, rep)

    @jax.jit
    def mvcs_all(depth, intr, extr):
        return jax.vmap(F.mvcs)(depth, intr, extr)

    timeit("mvcs", mvcs_all, depth, intr, extr)

    from videogpa_tpu.ops.resize import grid_sample_bilinear

    u = jnp.asarray(rng.uniform(0, S - 1, (S, S)).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, S - 1, (S, S)).astype(np.float32))

    @jax.jit
    def gs(img, u, v):
        return grid_sample_bilinear(img, u, v, align_corners=True)

    timeit("grid_sample_518sq_x1", gs, depth[0, 0], u, v)

    # candidate: ONE (2,2)-slice gather per sample instead of four scalar
    # taps — 4x fewer gather indices if XLA:TPU's per-index cost dominates
    def gs22(img, u, v):
        H, W = img.shape
        x0 = jnp.floor(u).astype(jnp.int32)
        y0 = jnp.floor(v).astype(jnp.int32)
        wx = u - x0.astype(u.dtype)
        wy = v - y0.astype(v.dtype)
        ys = jnp.clip(y0, 0, H - 2)
        xs = jnp.clip(x0, 0, W - 2)
        idx = jnp.stack([ys.ravel(), xs.ravel()], axis=-1)
        patches = jax.lax.gather(
            img, idx,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0, 1)),
            slice_sizes=(2, 2), mode="clip",
        ).reshape(u.shape + (2, 2))

        def tap(yi, xi, pch):
            dy = jnp.clip(yi - ys, 0, 1)
            dx = jnp.clip(xi - xs, 0, 1)
            val = jnp.where(
                dy == 0,
                jnp.where(dx == 0, pch[..., 0, 0], pch[..., 0, 1]),
                jnp.where(dx == 0, pch[..., 1, 0], pch[..., 1, 1]),
            )
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            return jnp.where(inb, val, 0.0)

        return (
            tap(y0, x0, patches) * (1 - wy) * (1 - wx)
            + tap(y0, x0 + 1, patches) * (1 - wy) * wx
            + tap(y0 + 1, x0, patches) * wy * (1 - wx)
            + tap(y0 + 1, x0 + 1, patches) * wy * wx
        )

    jgs22 = jax.jit(gs22)
    a = np.asarray(gs(depth[0, 0], u, v))
    b = np.asarray(jgs22(depth[0, 0], u, v))
    print(json.dumps({"name": "gs22_exact",
                      "max_abs_diff": float(np.max(np.abs(a - b)))}),
          flush=True)
    timeit("grid_sample_slice22_518sq_x1", jgs22, depth[0, 0], u, v)

    # and a (1,2)-slice variant: two row-pair gathers per sample
    def gs12(img, u, v):
        H, W = img.shape
        x0 = jnp.floor(u).astype(jnp.int32)
        y0 = jnp.floor(v).astype(jnp.int32)
        wx = u - x0.astype(u.dtype)
        wy = v - y0.astype(v.dtype)
        xs = jnp.clip(x0, 0, W - 2)

        def rowpair(yi):
            yc = jnp.clip(yi, 0, H - 1)
            idx = jnp.stack([yc.ravel(), xs.ravel()], axis=-1)
            pr = jax.lax.gather(
                img, idx,
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(0,),
                    start_index_map=(0, 1)),
                slice_sizes=(1, 2), mode="clip",
            ).reshape(u.shape + (2,))
            return pr, yc == yi

        def tap_from(pr, ok_y, xi):
            dx = jnp.clip(xi - xs, 0, 1)
            val = jnp.where(dx == 0, pr[..., 0], pr[..., 1])
            inb = (xi >= 0) & (xi < W) & ok_y
            return jnp.where(inb, val, 0.0)

        pr0, ok0 = rowpair(y0)
        pr1, ok1 = rowpair(y0 + 1)
        ok0 = ok0 & (y0 >= 0) & (y0 < H)
        ok1 = ok1 & (y0 + 1 >= 0) & (y0 + 1 < H)
        return (
            tap_from(pr0, ok0, x0) * (1 - wy) * (1 - wx)
            + tap_from(pr0, ok0, x0 + 1) * (1 - wy) * wx
            + tap_from(pr1, ok1, x0) * wy * (1 - wx)
            + tap_from(pr1, ok1, x0 + 1) * wy * wx
        )

    jgs12 = jax.jit(gs12)
    c = np.asarray(jgs12(depth[0, 0], u, v))
    print(json.dumps({"name": "gs12_exact",
                      "max_abs_diff": float(np.max(np.abs(a - c)))}),
          flush=True)
    timeit("grid_sample_slice12_518sq_x1", jgs12, depth[0, 0], u, v)


if __name__ == "__main__":
    sys.exit(main())
