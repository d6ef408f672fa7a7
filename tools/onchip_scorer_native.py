"""On-chip decomposition round 2: where does the fused scorer's time go?

tools/onchip_scorer_stages.py (round 4) measured the VGGT stages at K=4 as
separate programs summing to ~3.1 s, yet round 3 recorded the fused scored
program at 6.54 s with "88% backbone" — a number measured on a VMAPPED
backbone (onchip_scorer_ab.py timed jax.vmap(vggt_forward) per clip, not the
production B=K native batch). This tool separates the remaining suspects,
all at the production shape (K=4 x 10 frames @ 518², VGGT-1B, bf16, auto
attn, dpt_chunk 8):

  1. native_full   — vggt_forward at B=4 native (exact production backbone)
  2. batched       — _device_fn_batched: backbone + pose decode + unproject
                     + top-k mask + z-buffer reproject (no metrics)
  3. scored        — _device_fn_scored: the full production program
  4. vmapped_full  — jax.vmap(vggt_forward) per clip (round-3's "backbone")

batched - native_full = geometry/z-buffer cost; scored - batched = metric
suite cost; vmapped_full - native_full = the vmap penalty (if any).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/onchip_scorer_native.py
"""

import json
import sys
import time

import numpy as np

K = 4
S_FRAMES = 10


def main():
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.metrics import (
        ConsistencyScore, MSEMetric, MVCSMetric, PSNRMetric, SSIMMetric,
    )
    from videogpa_tpu.models.vggt import VGGTConfig, vggt_forward, vggt_init
    from videogpa_tpu.reward import VideoProcessor
    from videogpa_tpu.train.memory import _enable_compile_cache

    _enable_compile_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()

    cfg = VGGTConfig()
    params = vggt_init(jax.random.PRNGKey(0), cfg)
    S = cfg.img_size
    images_u8 = jnp.asarray(
        np.random.default_rng(1).integers(0, 255, (K, S_FRAMES, S, S, 3),
                                          dtype=np.uint8)
    )
    images_f32 = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (K, S_FRAMES, 3, S, S)).astype(np.float32) * 0.2 + 0.5
    )
    jax.block_until_ready((params, images_u8, images_f32))

    results = {}

    def timeit(name, fn, *args, iters=3):
        out = fn(*args)  # compile
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
        results[name] = round(dt, 3)
        print(json.dumps({"name": name, "s": round(dt, 3),
                          "clips_per_min": round(K * 60.0 / dt, 1)}),
              flush=True)
        return dt

    # 1. production backbone: B=4 native
    @jax.jit
    def native_full(params, images):
        out = vggt_forward(params, images, cfg)
        return out["depth"], out["pose_enc"], out["depth_conf"]

    timeit("native_full", native_full, params, images_f32)

    vp = VideoProcessor(
        {"MSE": MSEMetric(), "Consistency_Score": ConsistencyScore(None),
         "MVCS": MVCSMetric(), "PSNR": PSNRMetric(), "SSIM": SSIMMetric()},
        params=params, config=cfg,
    )

    # 2. backbone + geometry + z-buffer reprojection (no metrics)
    batched = vp._device_fn_batched(0.0, K)
    timeit("batched_reproj", batched, params, images_u8)

    # 3. full production scored program
    lp = vp._fused_lpips_params() or {}
    run = vp._device_fn_scored(0.0, K)

    def scored(params, lp, images):
        sc, _extr = run(params, lp, images)
        return sc

    timeit("scored", scored, params, lp, images_u8)

    # 4. the round-3 "backbone_only" shape: vmapped per clip
    @jax.jit
    def vmapped_full(params, images):
        out = jax.vmap(lambda im: vggt_forward(params, im, cfg))(images)
        return out["depth"]

    timeit("vmapped_full", vmapped_full, params, images_f32)

    print(json.dumps({
        "name": "decomposition",
        "geometry_zbuffer_s": round(results["batched_reproj"] - results["native_full"], 3),
        "metrics_s": round(results["scored"] - results["batched_reproj"], 3),
        "vmap_penalty_s": round(results["vmapped_full"] - results["native_full"], 3),
    }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
