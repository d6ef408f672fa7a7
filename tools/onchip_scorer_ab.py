"""On-chip decomposition + A/B of the fused reward scorer (round 3).

Times, on the real chip at production shapes (K=4 clips x 10 frames @ 518²,
full VGGT-1B):
  1. the backbone forward alone,
  2. the full fused scored program with the scatter z-buffer (default),
  3. the same with the scatter-free sorted z-buffer
     (``batch_reproject(zbuffer_impl="sorted")``),
so the z-buffer choice is settled by measurement (ARCHITECTURE.md: "A/B
on-chip and keep whichever wins") and the scorer's time budget is known.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/onchip_scorer_ab.py
"""

import functools
import json
import sys
import time

import numpy as np

K = 4


def main():
    import jax
    import jax.numpy as jnp

    import videogpa_tpu.reward.processor as proc_mod
    from videogpa_tpu.metrics import ConsistencyScore, MSEMetric, MVCSMetric, PSNRMetric, SSIMMetric
    from videogpa_tpu.models.vggt import VGGTConfig, vggt_forward, vggt_init
    from videogpa_tpu.reward import VideoProcessor
    from videogpa_tpu.train.memory import _enable_compile_cache

    _enable_compile_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()

    cfg = VGGTConfig()
    params = vggt_init(jax.random.PRNGKey(0), cfg)
    S = cfg.img_size
    images = jnp.asarray(
        np.random.default_rng(1).integers(0, 255, (K, 10, S, S, 3), dtype=np.uint8)
    )
    jax.block_until_ready((params, images))

    def timeit(name, fn, *args, iters=3):
        out = fn(*args)  # compile
        jax.tree_util.tree_map(np.asarray, jax.tree_util.tree_leaves(out)[:1])
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            # sync on a scalar from every leaf group
            leaves = jax.tree_util.tree_leaves(out)
            float(np.asarray(jnp.sum(leaves[0])))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(json.dumps({"name": name, "s": round(dt, 3),
                          "clips_per_min": round(K * 60.0 / dt, 1)}), flush=True)
        return dt

    # 1. backbone alone (same normalization as the scorer's uint8 path)
    @jax.jit
    def backbone_only(params, images):
        x = images.astype(jnp.float32).transpose(0, 1, 4, 2, 3) / 255.0
        out = jax.vmap(lambda im: vggt_forward(params, im, cfg))(x)
        return out["depth"]

    timeit("backbone_only", backbone_only, params, images)

    def build_vp():
        return VideoProcessor(
            {"MSE": MSEMetric(), "Consistency_Score": ConsistencyScore(None),
             "MVCS": MVCSMetric(), "PSNR": PSNRMetric(), "SSIM": SSIMMetric()},
            params=params, config=cfg,
        )

    # 2. full fused scored program, scatter z-buffer (production default)
    vp = build_vp()
    lp = vp._fused_lpips_params() or {}
    run = vp._device_fn_scored(0.0, K)

    def scored(params, lp, images):
        sc, _extr = run(params, lp, images)
        return sc

    t_scatter = timeit("scored_scatter", scored, params, lp, images)

    # 3. same with the sorted z-buffer
    orig = proc_mod.batch_reproject
    try:
        proc_mod.batch_reproject = functools.partial(orig, zbuffer_impl="sorted")
        vp2 = build_vp()
        run2 = vp2._device_fn_scored(0.0, K)

        def scored2(params, lp, images):
            sc, _extr = run2(params, lp, images)
            return sc

        t_sorted = timeit("scored_sorted", scored2, params, lp, images)
    finally:
        proc_mod.batch_reproject = orig

    print(json.dumps({"name": "verdict",
                      "sorted_vs_scatter": round(t_sorted / t_scatter, 3)}),
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
