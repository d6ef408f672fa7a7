"""Headline benchmarks: all three BASELINE.json north stars, one JSON line.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
The driver-facing headline (metric/value/vs_baseline) is the CogVideoX-5B
denoise rate; the other two north stars — Wan2.2-TI2V-5B denoise steps/s and
VGGT reward scoring clips/min — run BY DEFAULT and are carried both as flat
extras (back-compat names) and as the nested "denoise"/"wan"/"reward"
blocks, each with its own vs_baseline. Disable with VIDEOGPA_BENCH_WAN=0 /
VIDEOGPA_BENCH_REWARD=0 (e.g. on a broken-tunnel day).

The metric matches BASELINE.json's north star ("Denoise steps/sec/chip,
CogVideoX-5B 49f@720p"): one CFG denoising step = one DiT forward at batch 2
(uncond + cond), 13 latent frames x 60 x 90, bf16. The reference publishes no
number (BASELINE.md).

Baseline denominator (revised round 2, see BASELINE.md "Revised baseline"):
0.15 steps/sec — the reference diffusers pipeline on an A100-80G (the
reference's GPU class; public diffusers timing is ~6 min for a 50-step
49f@480x720 sample, ~6.8 s/denoise-step once text-encode/VAE are excluded).
Round 1 recorded 0.20, an H100-flavored guess made without measurement; the
measured v5e physics (QK^T at head_dim 64 caps the MXU at 50%; the exact-bf16
attention kernel floor is 85-93 TF/s, and we run at ~96% of it — see
CLAUDE.md) put the exact-bf16 per-chip ceiling at ~0.155 steps/s, so 0.20 was
unreachable by any exact kernel on this chip. Both ratios are reported
(vs_baseline for the revised number, vs_h100_estimate for 0.20-class) so
nothing is hidden. For hardware context: v5e has 63% of A100's bf16 FLOPs and
40% of its HBM bandwidth.

Reported numbers:
- value: exact-bf16 attention (numerics match the reference's SDPA)
- int8_steps_per_sec: SageAttention-style int8-QK production inference mode
  (attn_impl="flash_int8", cosine 0.99998 vs f32 attention)

A secondary metric (reward clips/min through full-size VGGT) is included in
the JSON extras when VIDEOGPA_BENCH_REWARD=1.
"""

import json
import os
import sys
import time

import numpy as np

# Smoke mode: VIDEOGPA_BENCH_TINY=1 swaps every model for its tiny() preset
# (shapes derived from the config, same code paths) and VIDEOGPA_BENCH_CPU=1
# forces the CPU backend with interpreted Pallas kernels — together they let
# the test suite execute this file's full glue end to end in minutes, so the
# real-chip round-end run can't be broken by an unexercised code path. Tiny
# numbers are meaningless as throughput; the JSON carries "tiny": true.
_TINY = os.environ.get("VIDEOGPA_BENCH_TINY") == "1"

BASELINE_STEPS_PER_SEC = 0.15  # A100-class diffusers estimate (see docstring)
H100_ESTIMATE_STEPS_PER_SEC = 0.20  # round-1 denominator, kept for comparison
# A100-class denominators for the other two headline metrics, derived from
# exact step-FLOP counts at the same publicly-anchored 97.7 TF/s stack
# throughput as the CogVideoX number (BASELINE.md "Round-3 denominators"):
WAN_BASELINE_STEPS_PER_SEC = 0.17  # 580.8 TFLOP/step (CFG pair, 81f@704x1280)
REWARD_BASELINE_CLIPS_PER_MIN = 40.0  # ~1.5 s/clip reference pipeline on A100
# CogVideoX1.5-5B flagship (CFG pair, 81f@768x1360 -> 22 latent frames at
# patch_size_t=2, 45,106 tokens): 2,958 TFLOP/step by the same exact count
# as the 49f number (858.1 GEMM + 2,100.2 attention), at the same 97.7 TF/s
# A100-class anchor -> 30.3 s/step (BASELINE.md "Round-4 denominator").
COG15_BASELINE_STEPS_PER_SEC = 0.033


def _enable_compile_cache():
    """Persistent XLA compile cache: the remote (axon) compiler takes minutes
    per program; cached recompiles are near-instant across processes."""
    from videogpa_tpu.train.memory import _enable_compile_cache as enable

    enable()


def bench_denoise(attn_impl="auto", w8a8=False, cfg=None, cfg_pair=True):
    """One denoise step. cfg_pair=False runs the CFG pair as TWO sequential
    B=1 forwards (same math, half the activation HBM) and reports the
    per-STEP rate — the exact-bf16 CogVideoX1.5 flagship operating point on
    one 16 GB v5e, where the batched pair AOT-OOMs at 16.82 GiB."""
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.models.cogvideox import CogVideoXConfig, dit_forward, dit_init

    if cfg is None:
        cfg = CogVideoXConfig.tiny() if _TINY else CogVideoXConfig.cogvideox_5b()
    params = dit_init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if w8a8:
        from videogpa_tpu.ops.quant import quantize_dit_int8, quantize_on_device

        params = quantize_on_device(quantize_dit_int8, params)
    jax.block_until_ready(params)

    B, F = (2 if cfg_pair else 1), cfg.sample_frames
    if cfg.patch_size_t:
        # 1.5 models round latent frames up to patch_size_t (pipeline.py)
        F += (-F) % cfg.patch_size_t
    x = jax.random.normal(
        jax.random.PRNGKey(1),
        (B, F, cfg.in_channels, cfg.sample_height, cfg.sample_width),
        jnp.bfloat16,
    )
    txt = jax.random.normal(
        jax.random.PRNGKey(2),
        (B, cfg.max_text_seq_length, cfg.text_embed_dim),
        jnp.bfloat16,
    )
    t = jnp.full((B,), 500)

    f = jax.jit(
        lambda p, x, txt, t: jnp.sum(
            dit_forward(p, x, txt, t, cfg, attn_impl=attn_impl,
                        attn_layout="bnhd")
        )
    )
    float(np.asarray(f(params, x, txt, t)))  # compile
    n_iter = 3
    t0 = time.perf_counter()
    r = None
    for _ in range(n_iter):
        r = f(params, x, txt, t)
    float(np.asarray(r))
    dt = (time.perf_counter() - t0) / n_iter
    if not cfg_pair:
        dt = 2 * dt  # one step = uncond + cond forwards, run sequentially
    return 1.0 / dt, dt


def bench_reward(attn_impl="auto", params=None):
    """Returns (single clips/min, batched clips/min, per-clip score dict).

    attn_impl="flash_int8" benches the SageAttention-style int8-QK scoring
    mode: the VGGT trunk is head_dim 64 — exactly the geometry the int8
    kernel doubles — and scoring only RANKS candidate videos, the most
    quantization-tolerant consumer in the system. The returned score dict
    lets the caller report int8-vs-exact score drift alongside the speed.
    """
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.metrics import (
        ConsistencyScore,
        MSEMetric,
        MVCSMetric,
        PSNRMetric,
        SSIMMetric,
    )
    from videogpa_tpu.models.vggt import VGGTConfig, vggt_init
    from videogpa_tpu.reward import VideoProcessor

    cfg = VGGTConfig.tiny() if _TINY else VGGTConfig()
    if params is None:
        params = vggt_init(jax.random.PRNGKey(0), cfg)
        if attn_impl == "flash_int8":
            # full int8 scoring mode: int8-QK attention + W8A8 trunk GEMMs
            from videogpa_tpu.ops.quant import (
                quantize_on_device,
                quantize_vggt_int8,
            )

            params = quantize_on_device(quantize_vggt_int8, params)
    metrics = {
        "MSE": MSEMetric(),
        "Consistency_Score": ConsistencyScore(None),
        "MVCS": MVCSMetric(),
        "PSNR": PSNRMetric(),
        "SSIM": SSIMMetric(),
    }
    vp = VideoProcessor(metrics, params=params, config=cfg, attn_impl=attn_impl)
    S = cfg.img_size
    frames = np.random.default_rng(0).integers(
        0, 255, (10, S, S, 3), dtype=np.uint8
    )
    vp.process_frames(frames, thresholds=[0])  # compile
    t0 = time.perf_counter()
    n_iter = 3  # single-clip timing is tunnel-latency noisy; average
    scores = None
    for _ in range(n_iter):
        scores = vp.process_frames(frames, thresholds=[0])
    dt = (time.perf_counter() - t0) / n_iter

    # pipelined single-clip (depth 2): dispatch clip i+1 before pulling
    # clip i — hides upload/dispatch/pull behind device compute while
    # keeping the reference's one-clip-per-call protocol
    # (process_frames_async; decomposition in tools/onchip_single_clip.py)
    handle = vp.process_frames_async(frames, [0])
    t0 = time.perf_counter()
    for _ in range(n_iter):
        nxt = vp.process_frames_async(frames, [0])
        handle()
        handle = nxt
    dt_pipe = (time.perf_counter() - t0) / n_iter
    handle()

    # batched scoring throughput (K clips per device program) through the
    # fused scored program: backbone + geometry + reprojection + metric
    # scalars in ONE jit, timed to the host-side scalar pull — the real
    # per-clip cost of the production scoring path
    K = int(os.environ.get("VIDEOGPA_BENCH_REWARD_BATCH", "4"))
    images = jnp.asarray(np.random.default_rng(1).standard_normal(
        (K, 10, 3, S, S)).astype(np.float32) * 0.2 + 0.5)
    runs = vp._device_fn_scored(0.0, K)
    lp = vp._fused_lpips_params() or {}
    # warm up with a HOST PULL, not block_until_ready: the axon backend's
    # block_until_ready does not reliably block (CLAUDE.md), so the compile
    # + first-kernel-execution stall (~minutes on a bad tunnel day) would
    # land inside the timed call (observed: 0.18 clips/min in an otherwise
    # healthy run). Then time min-of-2 — one stalled dispatch can't own
    # the reported number.
    sc, _extr = runs(vp.params, lp, images)
    {k: np.asarray(v) for k, v in sc.items()}
    dtb = float("inf")
    pulled = None
    for _ in range(2):
        t0 = time.perf_counter()
        sc, _extr = runs(vp.params, lp, images)
        pulled = {k: np.asarray(v) for k, v in sc.items()}
        dtb = min(dtb, time.perf_counter() - t0)
    # per-clip consistency scores of the batched run: the int8 extra uses
    # these for the production-relevant drift signal — DPO consumes only
    # the RANKING of candidate clips (train/dataset.py win/lose pairs), so
    # rank agreement matters more than absolute score drift
    per_clip = pulled.get("Consistency_Score")
    return 60.0 / dt, K * 60.0 / dtb, scores[0], per_clip, 60.0 / dt_pipe


def bench_wan(attn_impl="auto", w8a8=False):
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.models.wan import WanConfig
    from videogpa_tpu.models.wan.dit import wan_forward, wan_init

    cfg = WanConfig.tiny() if _TINY else WanConfig.ti2v_5b()
    params = wan_init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if w8a8:
        from videogpa_tpu.ops.quant import quantize_on_device, quantize_wan_int8

        params = quantize_on_device(quantize_wan_int8, params)
    jax.block_until_ready(params)
    B = 2  # CFG pair
    F, Hh, Ww = (3, 8, 8) if _TINY else (21, 44, 80)  # 81f@704x1280 latents
    x = jax.random.normal(
        jax.random.PRNGKey(1), (B, cfg.in_channels, F, Hh, Ww), jnp.bfloat16
    )
    txt = jax.random.normal(
        jax.random.PRNGKey(2), (B, cfg.text_len, cfg.text_dim), jnp.bfloat16
    )
    t = jnp.full((B,), 500.0)
    f = jax.jit(
        lambda p, x, txt, t: jnp.sum(
            wan_forward(p, x, t, txt, cfg, attn_impl=attn_impl)
        )
    )
    float(np.asarray(f(params, x, txt, t)))
    t0 = time.perf_counter()
    for _ in range(3):
        s = float(np.asarray(f(params, x, txt, t)))
    return 3 / (time.perf_counter() - t0)


def bench_train():
    """DPO train step throughput — the reference's ``stats/samples_per_sec``
    telemetry point (``train/CogVideoX-I2V-5B/03_train.py:166-177``). One
    step = policy fwd+bwd on the win/lose pair plus the frozen-reference
    forwards, sharing a single base-weight copy in HBM.

    Defaults to the 2B-scale config: the 5B step needs ~25.5 GB HBM
    (measured: 11.2 GB bf16 base + win/lose remat residuals), which exceeds
    a single 16 GB v5e — the reason the reference trains on 8 GPUs and this
    repo ships the DP/TP/ring mesh path. Set VIDEOGPA_BENCH_TRAIN_5B=1 on a
    bigger chip (v5p/v6e) or a mesh to bench the 5B operating point.
    Returns (steps/sec, step_seconds, scale_label)."""
    from videogpa_tpu.models.cogvideox import CogVideoXConfig

    if _TINY:
        return _bench_train_cfg(CogVideoXConfig.tiny()) + ("tiny",)
    if os.environ.get("VIDEOGPA_BENCH_TRAIN_5B") == "1":
        return _bench_train_cfg(CogVideoXConfig.cogvideox_5b()) + ("5b",)
    return _bench_train_cfg(CogVideoXConfig.cogvideox_2b()) + ("2b",)


def _bench_train_cfg(cfg):
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.models.cogvideox import dit_init
    from videogpa_tpu.train.lora import lora_init
    from videogpa_tpu.train.trainer import (
        TrainerConfig,
        init_train_state,
        make_dpo_train_step,
    )

    base = dit_init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    tcfg = TrainerConfig(lora_rank=64, lora_alpha=128.0,
                         compute_dtype=jnp.bfloat16, remat=True)
    lora = lora_init(jax.random.PRNGKey(1), cfg.num_layers, cfg.hidden_dim, rank=64)
    state = init_train_state(lora, tcfg)
    train_step, _ = make_dpo_train_step(base, cfg, tcfg)

    B, F = 1, cfg.sample_frames
    C, Hh, Ww = cfg.in_channels, cfg.sample_height, cfg.sample_width
    key = jax.random.PRNGKey(2)
    batch = {
        "x_win": jax.random.normal(key, (B, C, F, Hh, Ww), jnp.float32),
        "x_lose": jax.random.normal(key, (B, C, F, Hh, Ww), jnp.float32),
        "prompt_emb": jax.random.normal(
            key, (B, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32
        ),
    }
    state, m = train_step(state, batch, jax.random.PRNGKey(3))  # compile
    float(np.asarray(m["loss"]))
    t0 = time.perf_counter()
    n_iter = 2
    for _ in range(n_iter):
        state, m = train_step(state, batch, jax.random.PRNGKey(4))
    float(np.asarray(m["loss"]))
    dt = (time.perf_counter() - t0) / n_iter
    return 1.0 / dt, dt


def bench_overlap():
    """Full-scale generate+score pipeline: reference two-phase semantics vs
    the TPU-native device-resident stream.

    Per clip, BOTH modes run the REAL flagship stages: CogVideoX-5B DiT
    denoise steps (CFG pair, 17,776 tokens), full tiled 3D-causal-VAE decode
    to 49f@480x720, frame sampling/crop/resize to 10x518x518, and VGGT-1B
    scoring.

    - sequential mirrors the reference's file round-trip
      (replicate.sh:73-103: generate writes mp4s, the scorer re-reads them):
      the decoded video is pulled to host (the "mp4 write"), frames are
      sampled host-side (decord+numpy in the reference) and re-uploaded for
      scoring, with a full sync between phases.
    - overlapped keeps the video DEVICE-RESIDENT end to end: the decoded
      tiles are stitched on device (vae_decode_tiled), frames flow into the
      scorer with no host hop at all, and the uint8 video download for
      archival (the only host artifact) is dispatched asynchronously behind
      the next clip's denoise compute. On a pod the same structure schedules
      sampler and scorer on disjoint mesh slices.

    Set VIDEOGPA_BENCH_OVERLAP_STEPS (default 2) for the denoise steps per
    clip and VIDEOGPA_BENCH_OVERLAP_CLIPS (default 2).
    Returns (sequential clips/min, overlapped clips/min, decomposition).
    """
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.models.cogvideox import CogVideoXConfig, dit_forward, dit_init
    from videogpa_tpu.models.cogvideox.vae import vae_decode_tiled, vae_init
    from videogpa_tpu.models.vggt import VGGTConfig, vggt_init
    from videogpa_tpu.ops.resize import resize_bilinear
    from videogpa_tpu.reward import VideoProcessor

    cfg = CogVideoXConfig.tiny() if _TINY else CogVideoXConfig.cogvideox_5b()
    dit = dit_init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    # production int8 inference mode (W8A8 GEMMs + int8-QK attention): the
    # quantized 5B DiT is ~6.0 GiB resident vs 10.4 bf16 (AOT
    # memory_analysis), which is what lets the full generate+score stream
    # co-reside on one 16 GB chip. VIDEOGPA_OVERLAP_EXACT=1 keeps bf16.
    overlap_exact = os.environ.get("VIDEOGPA_OVERLAP_EXACT") == "1"
    denoise_attn = "auto"
    if not overlap_exact:
        from videogpa_tpu.ops.quant import quantize_dit_int8, quantize_on_device

        dit = quantize_on_device(quantize_dit_int8, dit)
        denoise_attn = "flash_int8"
    vae = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), vae_init(jax.random.PRNGKey(1), cfg)
    )
    vcfg = VGGTConfig.tiny() if _TINY else VGGTConfig()
    # init directly in bf16: an f32 VGGT-1B init (~4.9 GB transient) next to
    # the resident 5B bf16 DiT overflows the 16 GB chip
    vggt = vggt_init(jax.random.PRNGKey(2), vcfg, dtype=jnp.bfloat16)
    from videogpa_tpu.metrics import ConsistencyScore, MSEMetric

    # dpt_chunk=2: the DPT fusion features are the scorer's peak-memory
    # tensor; at the default chunk the scorer's temp arena (2.4 GiB, AOT
    # memory_analysis) does not co-reside with the 10.4 GiB resident DiT.
    # Scoring runs the fused scored program (metric scalars on device).
    vp = VideoProcessor(
        {"MSE": MSEMetric(), "Consistency_Score": ConsistencyScore(None)},
        params=vggt, config=vcfg, dpt_chunk=2,
    )
    scored = vp._device_fn_scored(0.0, 1)
    lp = vp._fused_lpips_params() or {}

    def scorer(params, frames_dev):
        sc, _extr = scored(params, lp, frames_dev)
        return sc

    B, F = 2, cfg.sample_frames
    txt = jax.random.normal(
        jax.random.PRNGKey(3),
        (B, cfg.max_text_seq_length, cfg.text_embed_dim),
        jnp.bfloat16,
    )
    t = jnp.full((B,), 500)
    steps_per_clip = int(os.environ.get("VIDEOGPA_BENCH_OVERLAP_STEPS", "2"))
    n_clips = int(os.environ.get("VIDEOGPA_BENCH_OVERLAP_CLIPS", "2"))
    tile = int(os.environ.get("VIDEOGPA_VAE_TILE", "16"))

    denoise = jax.jit(
        lambda p, x: dit_forward(p, x, txt, t, cfg, attn_impl=denoise_attn)
        .astype(jnp.bfloat16)[:, :, : cfg.in_channels]
    )

    pixel_T = (F - 1) * cfg.temporal_compression_ratio + 1
    n_score_frames = min(10, pixel_T)
    S = vcfg.img_size

    @jax.jit
    def to_score_frames(video):
        # (1, 3, 49, 480, 720) [-1,1] -> (1, 10, 3, 518, 518) [0,1] on device
        T = video.shape[2]
        idx = jnp.linspace(0, T - 1, n_score_frames).round().astype(jnp.int32)
        frames = video[0, :, idx]  # (10, 3, 480, 720)
        Hh, Ww = frames.shape[-2:]
        side = min(Hh, Ww)
        y0, x0_ = (Hh - side) // 2, (Ww - side) // 2
        crop = frames[..., y0 : y0 + side, x0_ : x0_ + side]
        out = resize_bilinear(crop.astype(jnp.float32), (S, S))
        return (jnp.clip(out, -1, 1)[None] + 1.0) / 2.0

    @jax.jit
    def to_u8(video):
        return jnp.clip((video + 1.0) * 127.5, 0, 255).astype(jnp.uint8)

    resize_up = jax.jit(lambda v: resize_bilinear(v, (S, S)))

    x0 = jax.random.normal(
        jax.random.PRNGKey(4),
        (B, F, cfg.in_channels, cfg.sample_height, cfg.sample_width),
        jnp.bfloat16,
    )

    def run_denoise(x):
        for _ in range(steps_per_clip):
            x = denoise(dit, x)
        return x

    def decode(x):
        lat = jnp.transpose(x[:1], (0, 2, 1, 3, 4))  # (1, C, F, h, w)
        return vae_decode_tiled(params=vae, latents=lat, cfg=cfg, tile_latent=tile)

    def reward_sum(out):
        # pull the metric scalars (the production artifact of scoring)
        return float(np.asarray(out["Consistency_Score"]).ravel()[0]) + float(
            np.asarray(out["motion_norm"]).ravel()[0]
        )

    # warm up / compile every program
    x = run_denoise(x0)
    video = decode(x)
    frames_dev = to_score_frames(video)
    reward_sum(scorer(vp.params, frames_dev))
    _ = np.asarray(to_u8(video))
    pix_side = min(video.shape[-2:])
    float(np.asarray(jnp.sum(resize_up(
        jnp.zeros((1, n_score_frames, 3, pix_side, pix_side))))))

    # --- sequential (reference file-round-trip semantics) ---
    decomp = {}
    t0 = time.perf_counter()
    for i in range(n_clips):
        t1 = time.perf_counter()
        x = jax.block_until_ready(run_denoise(x0))
        float(np.asarray(jnp.sum(x)))  # hard sync (axon block_until_ready caveat)
        t2 = time.perf_counter()
        video_host = np.asarray(to_u8(decode(x)))  # the "mp4 write" download
        t3 = time.perf_counter()
        # host-side frame sampling (the scorer re-reads the mp4)
        idx = np.linspace(0, video_host.shape[2] - 1, n_score_frames).round().astype(int)
        fr = video_host[0, :, idx]  # (10, 3, 480, 720) uint8
        side = min(fr.shape[-2:])
        y0, x0_ = (fr.shape[-2] - side) // 2, (fr.shape[-1] - side) // 2
        fr = fr[..., y0 : y0 + side, x0_ : x0_ + side].astype(np.float32) / 255.0
        up = resize_up(jax.device_put(jnp.asarray(fr[None])))
        out = scorer(vp.params, up)
        reward_sum(out)
        t4 = time.perf_counter()
        decomp = {
            "denoise_s": round(t2 - t1, 2),
            "decode_and_download_s": round(t3 - t2, 2),
            "score_s": round(t4 - t3, 2),
        }
    dt_seq = time.perf_counter() - t0

    # --- overlapped (device-resident; async archival download) ---
    t0 = time.perf_counter()
    outs = []
    pending_u8 = []
    for i in range(n_clips):
        x = run_denoise(x0)  # queued
        video = decode(x)  # tiles stitch on device
        outs.append(scorer(vp.params, to_score_frames(video)))
        u8 = to_u8(video)
        u8.copy_to_host_async()  # archival download hides behind next clip
        pending_u8.append(u8)
    for out in outs:
        reward_sum(out)
    for u8 in pending_u8:
        np.asarray(u8)
    dt_ovl = time.perf_counter() - t0

    decomp["tile_latent"] = tile
    decomp["steps_per_clip"] = steps_per_clip
    decomp["n_clips"] = n_clips
    decomp["dit_mode"] = "bf16" if overlap_exact else "w8a8+flash_int8"
    return n_clips * 60.0 / dt_seq, n_clips * 60.0 / dt_ovl, decomp


def _setup_backend():
    """Per-process backend setup (runs in every block subprocess)."""
    if os.environ.get("VIDEOGPA_BENCH_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
        import videogpa_tpu.ops.attention as _att

        _att.INTERPRET = True
    else:
        _enable_compile_cache()


def _run_block(name):
    """Child entry: run ONE bench block, return its flat result dict.

    Errors are caught and returned as ``<block>_error`` keys so the parent
    always gets a parseable JSON line; process-fatal failures (OOM killing
    the runtime, a wedged tunnel) are handled by the parent's subprocess
    timeout/rc path instead.
    """
    out = {}
    if name == "denoise":
        try:
            steps_per_sec, dt = bench_denoise()
            out.update({
                "value": round(steps_per_sec, 4),
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
                "vs_h100_estimate": round(
                    steps_per_sec / H100_ESTIMATE_STEPS_PER_SEC, 3
                ),
                "step_ms": round(dt * 1000, 1),
            })
        except Exception as e:  # pragma: no cover
            out["denoise_error"] = str(e)[:200]
    elif name == "wan":
        try:
            wan_sps = bench_wan()
            out["wan_steps_per_sec"] = round(wan_sps, 4)
            out["wan_vs_baseline"] = round(wan_sps / WAN_BASELINE_STEPS_PER_SEC, 3)
        except Exception as e:  # pragma: no cover
            out["wan_error"] = str(e)[:200]
    elif name == "reward":
        try:
            single, batched, scores, per_clip, single_pipe = bench_reward()
            out["reward_clips_per_min"] = round(single, 2)
            out["reward_clips_per_min_pipelined"] = round(single_pipe, 2)
            out["reward_clips_per_min_batched"] = round(batched, 2)
            out["reward_vs_baseline"] = round(
                batched / REWARD_BASELINE_CLIPS_PER_MIN, 3
            )
            # private keys: the parent compares these against the int8
            # block's to compute drift + rank agreement, then strips them
            out["_reward_consistency"] = float(scores["Consistency_Score"])
            if per_clip is not None:
                out["_reward_per_clip"] = [
                    float(x) for x in np.asarray(per_clip).ravel()
                ]
        except Exception as e:  # pragma: no cover
            out["reward_error"] = str(e)[:200]
    elif name == "int8":
        try:
            sps_i8, dt_i8 = bench_denoise(attn_impl="flash_int8")
            out["int8_steps_per_sec"] = round(sps_i8, 4)
            out["int8_step_ms"] = round(dt_i8 * 1000, 1)
            out["int8_vs_baseline"] = round(sps_i8 / BASELINE_STEPS_PER_SEC, 3)
        except Exception as e:  # pragma: no cover - environment hiccups
            out["int8_error"] = str(e)[:200]
    elif name == "w8a8":
        try:
            # full int8 inference mode: W8A8 projections/FFN + int8-QK attn
            sps_q, dt_q = bench_denoise(attn_impl="flash_int8", w8a8=True)
            out["w8a8_steps_per_sec"] = round(sps_q, 4)
            out["w8a8_step_ms"] = round(dt_q * 1000, 1)
            out["w8a8_vs_baseline"] = round(sps_q / BASELINE_STEPS_PER_SEC, 3)
        except Exception as e:  # pragma: no cover
            out["w8a8_error"] = str(e)[:200]
    elif name == "wan_w8a8":
        try:
            # Wan production int8 inference mode (W8A8 GEMMs + int8-QK)
            wan_q = bench_wan(attn_impl="flash_int8", w8a8=True)
            out["wan_w8a8_steps_per_sec"] = round(wan_q, 4)
            out["wan_w8a8_vs_baseline"] = round(
                wan_q / WAN_BASELINE_STEPS_PER_SEC, 3
            )
        except Exception as e:  # pragma: no cover
            out["wan_w8a8_error"] = str(e)[:200]
    elif name == "reward_int8":
        try:
            # int8-QK scoring mode; the parent computes score drift / rank
            # agreement vs the exact block (absolute drift on RANDOM weights
            # + noise frames is the chaotic worst case — top-k confidence
            # masks and z-buffer winners flip discontinuously at any numeric
            # difference; the production signal is rank agreement, since DPO
            # consumes only the ORDERING of candidate clips,
            # train/dataset.py win/lose pair construction)
            s8, b8, scores8, per_clip8, _ = bench_reward(attn_impl="flash_int8")
            out["reward_int8_clips_per_min_batched"] = round(b8, 2)
            out["reward_int8_vs_baseline"] = round(
                b8 / REWARD_BASELINE_CLIPS_PER_MIN, 3
            )
            out["_reward_int8_consistency"] = float(scores8["Consistency_Score"])
            if per_clip8 is not None:
                out["_reward_int8_per_clip"] = [
                    float(x) for x in np.asarray(per_clip8).ravel()
                ]
        except Exception as e:  # pragma: no cover
            out["reward_int8_error"] = str(e)[:200]
    elif name in ("cog15", "cog15_w8a8"):
        # CogVideoX1.5-5B flagship operating point: 81f@768x1360, the longest
        # sequence in the system (45,106 tokens; generate/CogVideoX1.5-5B.py)
        import dataclasses as _dc

        from videogpa_tpu.models.cogvideox import CogVideoXConfig

        cfg15 = (
            _dc.replace(CogVideoXConfig.tiny(), patch_size_t=2)
            if _TINY else CogVideoXConfig.cogvideox_1_5_5b()
        )
        if name == "cog15":
            try:
                # exact bf16 BATCHED CFG pair: fits one v5e since the
                # attention exactness-guard fallback moved to the transposed
                # stalling kernel (its classic-layout branch buffers were
                # ~2.1 GiB of 2x-lane-padded dead weight; temps 6.93 -> 6.23
                # GiB AOT). Falls back to sequential B=1 pairs if a
                # leaner-HBM part OOMs it — recording which mode ran (the
                # two operating points differ: 1.082 vs 1.012 vs_baseline),
                # so a regression in the batched-pair memory fix is visible
                # in BENCH_r*.json.
                try:
                    sps15, dt15 = bench_denoise(cfg=cfg15)
                    out["cog15_mode"] = "batched_pair"
                except Exception as e:
                    out["cog15_batched_error"] = str(e)[:200]
                    out["cog15_mode"] = "sequential"
                    sps15, dt15 = bench_denoise(cfg=cfg15, cfg_pair=False)
                out["cog15_steps_per_sec"] = round(sps15, 4)
                out["cog15_step_ms"] = round(dt15 * 1000, 1)
                out["cog15_vs_baseline"] = round(
                    sps15 / COG15_BASELINE_STEPS_PER_SEC, 3
                )
            except Exception as e:  # pragma: no cover
                out["cog15_error"] = str(e)[:200]
        else:
            try:
                # batched pair first; fall back to sequential B=1 pairs like
                # the exact block (r05: the batched W8A8 pair at 45,106
                # tokens OOMed in a FRESH process — recording which mode ran
                # keeps the regression visible in BENCH_r*.json)
                try:
                    sps15q, dt15q = bench_denoise(
                        attn_impl="flash_int8", w8a8=True, cfg=cfg15
                    )
                    out["cog15_w8a8_mode"] = "batched_pair"
                except Exception as e:
                    out["cog15_w8a8_batched_error"] = str(e)[:200]
                    out["cog15_w8a8_mode"] = "sequential"
                    sps15q, dt15q = bench_denoise(
                        attn_impl="flash_int8", w8a8=True, cfg=cfg15,
                        cfg_pair=False,
                    )
                out["cog15_w8a8_steps_per_sec"] = round(sps15q, 4)
                out["cog15_w8a8_vs_baseline"] = round(
                    sps15q / COG15_BASELINE_STEPS_PER_SEC, 3
                )
            except Exception as e:  # pragma: no cover
                out["cog15_w8a8_error"] = str(e)[:200]
    elif name == "train":
        try:
            tps, tdt, scale = bench_train()
            out[f"dpo_steps_per_sec_{scale}"] = round(tps, 4)
            out[f"dpo_step_ms_{scale}"] = round(tdt * 1000, 1)
        except Exception as e:  # pragma: no cover
            out["train_error"] = str(e)[:200]
    elif name == "overlap":
        try:
            seq, ovl, decomp = bench_overlap()
            out["genscore_clips_per_min_sequential"] = round(seq, 2)
            out["genscore_clips_per_min_overlapped"] = round(ovl, 2)
            out["overlap_speedup"] = round(ovl / seq, 3)
            out["overlap_decomposition"] = decomp
        except Exception as e:  # pragma: no cover
            out["overlap_error"] = str(e)[:200]
    else:  # pragma: no cover
        out[f"{name}_error"] = f"unknown bench block '{name}'"
    return out


def _spawn_block(name, timeout_s):
    """Run one block in a fresh subprocess; return (result dict, error str).

    Why subprocesses: round-4's single-process bench accumulated HBM
    residue/fragmentation across the 5B/1B-scale blocks and everything from
    `denoise w8a8` on died RESOURCE_EXHAUSTED (BENCH_r04.json) — erasing
    five results from the round's artifact. A fresh process gets a fresh
    arena, and the reference runs its phases as separate processes too
    (replicate.sh:73-103). The persistent compile cache
    (utils/compile_cache.py, armed per-child) makes the recompiles
    near-free; the per-process cost is the ~2-3 min axon client init.
    """
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), "--block", name]
    try:
        proc = subprocess.run(
            cmd,
            capture_output=True,
            text=True,
            timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        return None, f"block subprocess timeout after {int(timeout_s)}s"
    for line in reversed((proc.stdout or "").strip().splitlines() or [""]):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line), None
            except json.JSONDecodeError:
                continue  # stray '{'-line after the result; keep scanning up
    tail = (proc.stderr or "")[-250:].replace("\n", " ")
    return None, f"block subprocess rc={proc.returncode}: {tail}"


def main():
    # Child mode: run exactly one block in this process and print its JSON.
    if len(sys.argv) >= 3 and sys.argv[1] == "--block":
        _setup_backend()
        print(json.dumps(_run_block(sys.argv[2])))
        return

    # Parent mode: orchestrate the blocks as FRESH SUBPROCESSES (one block's
    # HBM residue cannot OOM the next — see _spawn_block) and merge their
    # JSON. Wall-clock discipline: the three north stars (denoise, wan,
    # reward — BASELINE.json) run FIRST and unconditionally; every extra
    # (int8/W8A8 modes, cog15 flagship, train step) is skipped once the
    # budget is spent, so the driver's BENCH_r*.json always carries the full
    # exact scoreboard even on a stall-y tunnel day (first dispatch of a
    # kernel-bearing program can stall minutes regardless of compile-cache
    # state — CLAUDE.md).
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("VIDEOGPA_BENCH_BUDGET_S", "3900"))
    skipped = []
    result = {
        "metric": "denoise_steps_per_sec_per_chip",
        "value": None,
        "unit": "steps/sec (CogVideoX-5B, CFG pair, 49f@480x720, bf16 exact)",
    }
    if _TINY:
        result["tiny"] = True  # smoke-mode shapes; throughput is meaningless

    def _elapsed():
        return time.perf_counter() - t_start

    def run(name, label, error_key, north_star=False):
        remaining = budget_s - _elapsed()
        if not north_star and budget_s > 0 and remaining <= 0:
            skipped.append(label)
            print(f"bench: budget spent, skipping extra '{label}'",
                  file=sys.stderr, flush=True)
            return
        print(f"bench: [{_elapsed():.0f}s] {label}", file=sys.stderr, flush=True)
        # North stars get a generous floor (a stall-day first dispatch can
        # take ~10 min); extras may overshoot the budget by at most their
        # floor before the NEXT extra gets skipped.
        if budget_s <= 0:
            timeout_s = 3600.0
        elif north_star:
            timeout_s = max(1500.0, remaining)
        else:
            timeout_s = max(600.0, remaining)
        out, err = _spawn_block(name, timeout_s)

        # transient-OOM retry: a child that starts before the PREVIOUS
        # child's HBM is released server-side can die RESOURCE_EXHAUSTED
        # even though the block fits a fresh chip (observed r05: the cog15
        # w8a8 block OOMed in-sequence, then ran clean standalone at 1.307).
        # One retry after a settle delay recovers it. The check keys on the
        # block's OWN error (child crash or its <block>_error key), NOT on
        # the string appearing anywhere in the JSON: informational keys like
        # cog15_batched_error coexist with a VALID sequential-fallback result
        # and must not trigger a duplicate multi-minute run.
        def _oom_failed(o, e):
            if e is not None and "RESOURCE_EXHAUSTED" in e:
                return True
            return o is not None and "RESOURCE_EXHAUSTED" in str(
                o.get(error_key, ""))

        if _oom_failed(out, err):
            print(f"bench: {label} hit RESOURCE_EXHAUSTED; retrying once "
                  f"after settle", file=sys.stderr, flush=True)
            time.sleep(45)
            out2, err2 = _spawn_block(name, timeout_s)
            if err2 is None and not _oom_failed(out2, err2):
                out, err = out2, err2
        if err is not None:
            result[error_key] = err[:200]
        else:
            result.update(out)

    def gate(var, default="1"):
        return os.environ.get(var, default) == "1"

    # ---- north stars (always run; each isolated so one failure cannot
    # erase the other two from the round's BENCH_r*.json) ----
    run("denoise", "denoise exact", "denoise_error", north_star=True)
    if gate("VIDEOGPA_BENCH_WAN"):
        run("wan", "wan exact", "wan_error", north_star=True)
    if gate("VIDEOGPA_BENCH_REWARD"):
        run("reward", "reward exact", "reward_error", north_star=True)

    # ---- extras (budget-gated, priority order) ----
    if gate("VIDEOGPA_BENCH_INT8"):
        run("int8", "denoise int8", "int8_error")
    if gate("VIDEOGPA_BENCH_W8A8"):
        run("w8a8", "denoise w8a8", "w8a8_error")
    if gate("VIDEOGPA_BENCH_WAN") and gate("VIDEOGPA_BENCH_W8A8"):
        run("wan_w8a8", "wan w8a8", "wan_w8a8_error")
    if gate("VIDEOGPA_BENCH_REWARD") and gate("VIDEOGPA_BENCH_INT8"):
        run("reward_int8", "reward int8", "reward_int8_error")
    if gate("VIDEOGPA_BENCH_COG15"):
        run("cog15", "cog15", "cog15_error")
        if gate("VIDEOGPA_BENCH_W8A8"):
            run("cog15_w8a8", "cog15 w8a8", "cog15_w8a8_error")
    # DPO train-step throughput — the reference's stats/samples_per_sec
    # telemetry point (train/CogVideoX-I2V-5B/03_train.py:166-177); a
    # budget-gated DEFAULT so BENCH_r*.json carries dpo_steps_per_sec_2b
    if gate("VIDEOGPA_BENCH_TRAIN"):
        run("train", "train 2b", "train_error")
    if gate("VIDEOGPA_BENCH_OVERLAP", default="0"):
        run("overlap", "overlap", "overlap_error")

    # derived int8-scoring quality signals (exact vs int8 block outputs)
    cs = result.pop("_reward_consistency", None)
    pc = result.pop("_reward_per_clip", None)
    cs8 = result.pop("_reward_int8_consistency", None)
    pc8 = result.pop("_reward_int8_per_clip", None)
    if cs is not None and cs8 is not None:
        result["reward_int8_consistency_drift"] = round(
            abs(cs8 - cs) / max(abs(cs), 1e-9), 5
        )
    if pc is not None and pc8 is not None:
        a, b = np.asarray(pc).ravel(), np.asarray(pc8).ravel()
        result["reward_int8_rank_agreement"] = bool(
            np.array_equal(np.argsort(a), np.argsort(b))
        )
    if skipped:
        result["budget_skipped"] = skipped

    # nested north-star blocks: the full scoreboard in one place (the flat
    # keys above are kept for back-compat with docs/older BENCH_r* files)
    def _block(mapping):
        b = {dst: result[src] for dst, src in mapping.items() if src in result}
        return b or None

    for name, mapping in (
        ("denoise", {
            "steps_per_sec": "value", "vs_baseline": "vs_baseline",
            "step_ms": "step_ms",
            "int8_steps_per_sec": "int8_steps_per_sec",
            "int8_vs_baseline": "int8_vs_baseline",
            "w8a8_steps_per_sec": "w8a8_steps_per_sec",
            "w8a8_vs_baseline": "w8a8_vs_baseline",
            "error": "denoise_error",
        }),
        ("cog15", {
            "steps_per_sec": "cog15_steps_per_sec",
            "vs_baseline": "cog15_vs_baseline",
            "mode": "cog15_mode",
            "batched_error": "cog15_batched_error",
            "w8a8_steps_per_sec": "cog15_w8a8_steps_per_sec",
            "w8a8_vs_baseline": "cog15_w8a8_vs_baseline",
            "w8a8_mode": "cog15_w8a8_mode",
            "error": "cog15_error",
        }),
        ("wan", {
            "steps_per_sec": "wan_steps_per_sec",
            "vs_baseline": "wan_vs_baseline",
            "w8a8_steps_per_sec": "wan_w8a8_steps_per_sec",
            "w8a8_vs_baseline": "wan_w8a8_vs_baseline",
            "error": "wan_error",
        }),
        ("reward", {
            "clips_per_min": "reward_clips_per_min_batched",
            "clips_per_min_single": "reward_clips_per_min",
            "clips_per_min_single_pipelined": "reward_clips_per_min_pipelined",
            "vs_baseline": "reward_vs_baseline",
            "int8_clips_per_min": "reward_int8_clips_per_min_batched",
            "int8_vs_baseline": "reward_int8_vs_baseline",
            "int8_rank_agreement": "reward_int8_rank_agreement",
            "error": "reward_error",
        }),
    ):
        block = _block(mapping)
        if block:
            result[name] = block
    print(json.dumps(result))


if __name__ == "__main__":
    main()
