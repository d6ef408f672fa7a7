"""Geometry stage split at the scorer operating point (round 4).

After the short-seq attention kernel the fused scorer reads:
backbone 2.55 s | geometry 1.74 s | metrics 0.58 s  (49.3 clips/min, K=4).
Geometry = per-clip unproject -> conf mask -> packed z-buffer reproject,
vmapped over K. This tool times the pieces as separate chained programs
to find the next lever:

  1. unproject+cloud  — depth_to_world_points + colored_pointcloud
  2. key_build        — project to all T views, quantize z, pack keys
                        (everything in reproject_views_packed EXCEPT the
                        scatter/gather)
  3. scatter_kt       — the fused scatter-min, (K,) batched over clips
                        (production shape: K buffers of T*(HW+1))
  4. scatter_flat     — same updates as ONE flat unbatched scatter
  5. gather_colors    — winner decode + color gather + normalize

Run: PYTHONPATH=/root/repo python tools/onchip_geometry_split.py
"""

import json
import sys
import time

import numpy as np

K, T, HW_S = 4, 10, 518


def main():
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.geometry.projection import reproject_views_packed
    from videogpa_tpu.train.memory import _enable_compile_cache

    _enable_compile_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()

    S = HW_S
    N = T * S * S  # points per clip
    n_px = S * S
    key = jax.random.PRNGKey(0)

    pts = jax.random.normal(key, (K, N, 3), jnp.float32)
    cols = jax.random.uniform(key, (K, N, 3), jnp.float32) * 255
    intr = jnp.broadcast_to(
        jnp.asarray([[450.0, 0, S / 2], [0, 450.0, S / 2], [0, 0, 1]]),
        (K, T, 3, 3)).astype(jnp.float32)
    extr = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.asarray([[0.0], [0], [4.0]])], 1),
        (K, T, 3, 4)).astype(jnp.float32)
    depth = jax.random.uniform(key, (K, T, S, S), jnp.float32) * 3 + 1
    results = {}

    def timeit(name, fn, *args, iters=3):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        float(np.asarray(jnp.sum(leaves[0].ravel()[:8].astype(jnp.float32))))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            float(np.asarray(jnp.sum(leaves[0].ravel()[:8].astype(jnp.float32))))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        results[name] = dt
        print(json.dumps({"name": name, "s": round(dt, 4)}), flush=True)
        return dt

    # 1. unproject + cloud assembly (mirrors processor per_clip preamble)
    from videogpa_tpu.geometry.transforms import depth_to_world_points

    @jax.jit
    def unproject(depth, extr, intr):
        def per_clip(d, e, i):
            return depth_to_world_points(d, e, i)
        return jax.vmap(per_clip)(depth, extr, intr)

    timeit("unproject", unproject, depth, extr[:, :, :3, :], intr)

    # 2+3+5. full packed render (production per_clip render, vmapped)
    @jax.jit
    def full_render(pts, cols, intr, extr):
        return jax.vmap(
            lambda p, c, ii, ee: reproject_views_packed(p, c, ii, ee, S, S)
        )(pts, cols, intr, extr)

    timeit("packed_render_full", full_render, pts, cols, intr, extr)

    # 2. key build only (no scatter): project, quantize, pack
    @jax.jit
    def key_build(pts, intr, extr):
        def one(points, intrinsics, extrinsics):
            R = extrinsics[:, :3, :3]
            t = extrinsics[:, :3, 3]
            pc_cam = jnp.einsum("nd,tkd->tnk", points, R) + t[:, None, :]
            pc_proj = jnp.einsum("tnk,tmk->tnm", pc_cam, intrinsics)
            z = pc_proj[..., 2]
            u = jnp.round(pc_proj[..., 0] / (z + 1e-8)).astype(jnp.int32)
            v = jnp.round(pc_proj[..., 1] / (z + 1e-8)).astype(jnp.int32)
            ok = (u >= 0) & (u < S) & (v >= 0) & (v < S) & (z > 0)
            zmin = jnp.min(jnp.where(ok, z, jnp.inf), axis=1, keepdims=True)
            zmax = jnp.max(jnp.where(ok, z, -jnp.inf), axis=1, keepdims=True)
            scale = 1022.0 / jnp.maximum(zmax - zmin, 1e-9)
            zq = jnp.clip((z - zmin) * scale, 0.0, 1022.0).astype(jnp.uint32)
            pid = jax.lax.broadcasted_iota(jnp.uint32, (T, points.shape[0]), 1)
            keyv = jnp.where(ok, (zq << 22) | pid, jnp.uint32(0xFFFFFFFF))
            base = jax.lax.broadcasted_iota(jnp.int32, (T, points.shape[0]), 0) * (n_px + 1)
            lin = base + jnp.where(ok, v * S + u, n_px)
            return keyv, lin
        return jax.vmap(one)(pts, intr, extr)

    keys, lins = jax.block_until_ready(key_build(pts, intr, extr))
    timeit("key_build", key_build, pts, intr, extr)

    # 3. the scatter alone, production batching: (K,) vmapped buffers
    @jax.jit
    def scatter_kt(keys, lins):
        def one(kv, lv):
            buf = jnp.full((T * (n_px + 1),), jnp.uint32(0xFFFFFFFF))
            return buf.at[lv.reshape(-1)].min(kv.reshape(-1))
        return jax.vmap(one)(keys, lins)

    timeit("scatter_K_batched", scatter_kt, keys, lins)

    # 4. same updates, one flat scatter (K folded into the buffer)
    @jax.jit
    def scatter_flat(keys, lins):
        base = (jnp.arange(K, dtype=jnp.int32) * (T * (n_px + 1)))[:, None, None]
        lin_all = (lins + base).reshape(-1)
        buf = jnp.full((K * T * (n_px + 1),), jnp.uint32(0xFFFFFFFF))
        return buf.at[lin_all].min(keys.reshape(-1))

    timeit("scatter_flat", scatter_flat, keys, lins)

    # 4b. K*T-batched: one buffer per (clip, view) pair
    @jax.jit
    def scatter_kt_batched(keys, lins):
        base = jax.lax.broadcasted_iota(jnp.int32, (K, T, 1), 1) * (n_px + 1)
        lv = (lins.reshape(K, T, -1) - base).reshape(K * T, -1)
        kv = keys.reshape(K * T, -1)

        def one(kk, ll):
            buf = jnp.full((n_px + 1,), jnp.uint32(0xFFFFFFFF))
            return buf.at[ll].min(kk)

        return jax.vmap(one)(kv, lv)

    timeit("scatter_KT_batched", scatter_kt_batched, keys, lins)

    # 5. winner decode + color gather + normalize
    buf = jax.block_until_ready(scatter_kt(keys, lins))

    @jax.jit
    def decode(buf, cols):
        def one(b, c):
            win = b.reshape(T, n_px + 1)[:, :n_px]
            hit = win != jnp.uint32(0xFFFFFFFF)
            ids = (win & jnp.uint32((1 << 22) - 1)).astype(jnp.int32)
            c8 = jnp.floor(jnp.clip(c, 0.0, 255.0))
            px = jnp.where(hit[..., None], c8[jnp.where(hit, ids, 0)], 0.0)
            fr = jnp.transpose(px.reshape(T, S, S, 3), (0, 3, 1, 2))
            return (fr / 255.0) * 2.0 - 1.0
        return jax.vmap(one)(buf, cols)

    timeit("gather_decode", decode, buf, cols)

    print(json.dumps({
        "name": "summary",
        "render_minus_parts": round(
            results["packed_render_full"] - results["key_build"]
            - results["scatter_K_batched"] - results["gather_decode"], 4),
    }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
