"""Single-clip reward decomposition (VERDICT r4 #6).

Round-4 driver measured 35.6 single-clip clips/min vs the 40 baseline while
the K=4 batched path does 47.9. The single-clip protocol is the reference's
(one clip per call, train/01_preference_pair.py:169-175). This tool splits
the ~1.69 s/clip into its parts:

  1. upload_8mb      — the per-call (1, 10, 518, 518, 3) uint8 host->device
     transfer (the tunnel moves ~50 MB/s; a local TPU host would not pay)
  2. sync_per_call   — R separate dispatches, synced per call (the
     production loop before round 5)
  3. dispatch_pipelined — R dispatches issued back-to-back, synced once:
     what the round-5 async scoring loop (process_frames_async) gets
  4. full_call       — vp.process_frames end to end (the bench number)

NOTE: a chained-in-jit variant (R full scored programs in one fori_loop,
the tools/onchip_r3.py pattern) CRASHED the TPU worker — the pattern is
for kernels and small programs, not a full backbone+geometry+metrics
graph (CLAUDE.md "TPU measurement"). Dispatch pipelining bounds the
per-call overhead instead.

Run: PYTHONPATH=/root/repo python tools/onchip_single_clip.py
"""

import json
import sys
import time

import numpy as np

R = 4


def main():
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.metrics import ConsistencyScore, MSEMetric
    from videogpa_tpu.models.vggt import VGGTConfig, vggt_init
    from videogpa_tpu.reward import VideoProcessor
    from videogpa_tpu.train.memory import _enable_compile_cache

    _enable_compile_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()

    cfg = VGGTConfig()
    params = vggt_init(jax.random.PRNGKey(0), cfg)
    vp = VideoProcessor(
        {"MSE": MSEMetric(), "Consistency_Score": ConsistencyScore(None)},
        params=params, config=cfg,
    )
    S = cfg.img_size
    frames = np.random.default_rng(0).integers(
        0, 255, (10, S, S, 3), dtype=np.uint8
    )
    results = {}

    def rec(name, dt):
        results[name] = dt
        print(json.dumps({"name": name, "s": round(dt, 4)}), flush=True)

    # 1. upload alone (8.05 MB uint8)
    up = jnp.asarray(frames[None])
    float(np.asarray(jnp.sum(up[..., :1, :1, :1].astype(jnp.float32))))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        up = jnp.asarray(np.ascontiguousarray(frames[None]) + i % 2)
        float(np.asarray(jnp.sum(up[..., :1, :1, :1].astype(jnp.float32))))
        ts.append(time.perf_counter() - t0)
    rec("upload_8mb", min(ts))

    # the fused K=1 scored program on device-resident images
    run = vp._device_fn_scored(0.0, 1)
    lp = vp._fused_lpips_params() or {}
    images = jnp.asarray(frames[None])
    sc, _ = run(vp.params, lp, images)
    {k: np.asarray(v) for k, v in sc.items()}  # warm (host pull)

    # 2. R separate dispatches, sync per call (pre-round-5 production loop)
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(R):
            sc, _ = run(vp.params, lp, images)
            {k: np.asarray(v) for k, v in sc.items()}
        ts.append(time.perf_counter() - t0)
    rec("sync_per_call_per_clip", min(ts) / R)

    # 4. R dispatches issued back-to-back, synced once (async pipeline)
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [run(vp.params, lp, images)[0] for _ in range(R)]
        for sc in outs:
            {k: np.asarray(v) for k, v in sc.items()}
        ts.append(time.perf_counter() - t0)
    rec("dispatch_pipelined_per_clip", min(ts) / R)

    # 5. the full production call (upload + program + assemble)
    vp.process_frames(frames, thresholds=[0])
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(R):
            vp.process_frames(frames, thresholds=[0])
        ts.append(time.perf_counter() - t0)
    rec("full_call_per_clip", min(ts) / R)

    print(json.dumps({
        "name": "summary",
        "clips_per_min_full": round(60.0 / results["full_call_per_clip"], 2),
        "clips_per_min_pipelined": round(
            60.0 / results["dispatch_pipelined_per_clip"], 2),
        "per_call_overhead_s": round(
            results["sync_per_call_per_clip"]
            - results["dispatch_pipelined_per_clip"], 4),
    }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
