"""On-chip stage split of the VGGT reward scorer (round 4, VERDICT item 1).

The round-3 decomposition (tools/onchip_scorer_ab.py) showed the K=4 fused
scoring program is 88% VGGT forward (5.76 of 6.54 s) — ~12% MFU — but never
split the forward itself. This tool times each stage as its own jitted
program at the production shape (K=4 clips x 10 frames @ 518², VGGT-1B):

  1. dinov2       — preprocess + DINOv2 ViT-L/14 patch embed (40 frames)
  2. aggregator   — 24x(frame+global) alternating blocks, from patch tokens
  3. depth_head   — DPT depth head from the kept layer stack (f32, chunk 8)
  4. point_head   — DPT point head (same)
  5. camera_head  — iterative pose head from the final layer
  6. full         — vggt_forward end to end (cross-check: ~= 1+2+3+4+5)

plus A/B variants of the suspects:
  - depth head with bf16 fusion pyramid (f32 output convs)
  - dpt_chunk 4 / 8 / 40
  - aggregator with frame-attention block sizes 512 vs padded-1536

Timing: per CLAUDE.md the tunnel adds ~20 ms per dispatch, so every stage is
timed over `iters` dispatches and synced via a pulled scalar. Stage times
here are multi-hundred-ms, so dispatch overhead is <5% noise.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/onchip_scorer_stages.py
"""

import json
import os
import sys
import time

import numpy as np

K = 4
S_FRAMES = 10
_TINY = os.environ.get("VIDEOGPA_STAGES_TINY") == "1"  # CPU shape smoke


def main():
    import jax

    if _TINY:
        jax.config.update("jax_platforms", "cpu")
        import videogpa_tpu.ops.attention as _att

        _att.INTERPRET = True
    import jax.numpy as jnp

    from videogpa_tpu.models.vggt import VGGTConfig, vggt_init
    from videogpa_tpu.models.vggt.aggregator import (
        aggregator_forward,
        slice_expand_and_flatten,
    )
    from videogpa_tpu.models.vggt.heads import (
        camera_head_forward,
        dpt_head_forward,
    )
    from videogpa_tpu.models.vggt.vit import dinov2_forward
    from videogpa_tpu.train.memory import _enable_compile_cache

    if not _TINY:
        _enable_compile_cache()
        assert jax.default_backend() == "tpu", jax.default_backend()

    cfg = VGGTConfig.tiny() if _TINY else VGGTConfig()
    params = vggt_init(jax.random.PRNGKey(0), cfg)
    S = cfg.img_size
    images = jnp.asarray(
        np.random.default_rng(1)
        .standard_normal((K, S_FRAMES, 3, S, S))
        .astype(np.float32)
        * 0.2
        + 0.5
    )
    jax.block_until_ready((params, images))

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
        print(json.dumps({"name": name, "s": round(dt, 3)}), flush=True)
        return out, dt

    # ---- stage 1: preprocess + DINOv2 patch embed (40 frames) ----
    mean = jnp.asarray((0.485, 0.456, 0.406), jnp.float32).reshape(1, 3, 1, 1)
    std = jnp.asarray((0.229, 0.224, 0.225), jnp.float32).reshape(1, 3, 1, 1)

    @jax.jit
    def s1_dinov2(params, images):
        flat = images.reshape(K * S_FRAMES, 3, S, S)
        flat = ((flat - mean) / std).astype(jnp.bfloat16)
        return dinov2_forward(params["aggregator"]["patch_embed"], flat, cfg, "auto")

    patch_tokens, _ = timeit("dinov2", s1_dinov2, params, images)
    patch_tokens = jax.block_until_ready(patch_tokens)

    # ---- stage 2: aggregator blocks from patch tokens ----
    keep = tuple(sorted(set(cfg.dpt_intermediate_layers) | {cfg.depth - 1}))

    def _agg_from_tokens(agg_params, patch_tokens):
        """Everything aggregator_forward does after dinov2 (special tokens,
        RoPE positions, 24x2 scanned blocks), kept-layer stack out."""
        from videogpa_tpu.models.vggt.aggregator import _agg_block_cfg
        from videogpa_tpu.ops.transformer import block_apply

        B, Sf = K, S_FRAMES
        Pp, C = patch_tokens.shape[1], patch_tokens.shape[2]
        camera_token = slice_expand_and_flatten(
            agg_params["camera_token"].astype(patch_tokens.dtype), B, Sf
        )
        register_token = slice_expand_and_flatten(
            agg_params["register_token"].astype(patch_tokens.dtype), B, Sf
        )
        tokens = jnp.concatenate([camera_token, register_token, patch_tokens], axis=1)
        P = tokens.shape[1]
        hg = wg = S // cfg.patch_size
        yy = jax.lax.broadcasted_iota(jnp.int32, (hg, wg), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (hg, wg), 1)
        patch_pos = jnp.stack([yy, xx], axis=-1).reshape(1, hg * wg, 2) + 1
        special_pos = jnp.zeros((1, cfg.patch_start_idx, 2), jnp.int32)
        pos = jnp.concatenate(
            [special_pos, jnp.broadcast_to(patch_pos, (1, Pp, 2))], axis=1
        )
        pos_frame = jnp.broadcast_to(pos, (B * Sf, P, 2))
        pos_global = pos_frame.reshape(B, Sf * P, 2)
        bcfg = _agg_block_cfg(cfg)

        def body(tokens, layer_params):
            fp, gp = layer_params
            t = block_apply(fp, tokens, bcfg, pos=pos_frame, attn_impl="auto")
            frame_inter = t
            t = t.reshape(B, Sf * P, C)
            t = block_apply(gp, t, bcfg, pos=pos_global, attn_impl="auto")
            global_inter = t.reshape(B * Sf, P, C)
            out = jnp.concatenate([frame_inter, global_inter], axis=-1)
            return global_inter, out.reshape(B, Sf, P, 2 * C)

        blocks = (agg_params["frame_blocks"], agg_params["global_blocks"])
        outs = []
        t = tokens
        start = 0
        for kk in keep:
            if kk > start:
                seg = jax.tree.map(lambda a: a[start:kk], blocks)

                def seg_body(t, lp):
                    return body(t, lp)[0], None

                t, _ = jax.lax.scan(seg_body, t, seg)
            t, out = body(t, jax.tree.map(lambda a: a[kk], blocks))
            outs.append(out)
            start = kk + 1
        return jnp.stack(outs)

    s2_agg = jax.jit(_agg_from_tokens)
    layer_outputs, _ = timeit("aggregator", s2_agg, params["aggregator"], patch_tokens)
    layer_outputs = jax.block_until_ready(layer_outputs)
    pos = {layer: i for i, layer in enumerate(keep)}
    import dataclasses

    hcfg = dataclasses.replace(
        cfg,
        dpt_intermediate_layers=tuple(pos[l] for l in cfg.dpt_intermediate_layers),
    )

    # ---- stage 3/4: DPT heads from the layer stack ----
    def mk_head(head_key, activation, conf_act, chunk):
        @jax.jit
        def run(hp, lo):
            return dpt_head_forward(
                hp, lo, hcfg, (S, S), activation, conf_act, chunk_size=chunk
            )

        return run

    timeit("depth_head_c8", mk_head("depth_head", "exp", "expp1", 8),
           params["depth_head"], layer_outputs)
    timeit("point_head_c8", mk_head("point_head", "inv_log", "expp1", 8),
           params["point_head"], layer_outputs)

    # ---- stage 5: camera head ----
    @jax.jit
    def s5_camera(cp, lo):
        cam_tokens = lo[pos[cfg.depth - 1]][:, :, 0].astype(jnp.float32)
        return camera_head_forward(cp, cam_tokens, cfg, "auto")[-1]

    timeit("camera_head", s5_camera, params["camera_head"], layer_outputs)

    # ---- cross-check: full forward ----
    from videogpa_tpu.models.vggt import vggt_forward

    @jax.jit
    def s6_full(params, images):
        out = jax.vmap(lambda im: vggt_forward(params, im, cfg))(images)
        return out["depth"]

    timeit("full_forward", s6_full, params, images)

    # ---- A/B: dpt chunk sizes ----
    timeit("depth_head_c4", mk_head("depth_head", "exp", "expp1", 4),
           params["depth_head"], layer_outputs)
    timeit("depth_head_c40", mk_head("depth_head", "exp", "expp1", 40),
           params["depth_head"], layer_outputs)

    # ---- A/B: bf16 DPT head (bf16 pyramid/fusion, f32 activations) ----
    bf16_head = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params["depth_head"])

    @jax.jit
    def depth_bf16(hp, lo):
        return dpt_head_forward(
            hp, lo, hcfg, (S, S), "exp", "expp1",
            chunk_size=8, compute_dtype=jnp.bfloat16,
        )

    try:
        timeit("depth_head_bf16_c8", depth_bf16, bf16_head, layer_outputs)
    except Exception as e:  # pragma: no cover
        print(json.dumps({"name": "depth_head_bf16_c8", "error": str(e)[:200]}),
              flush=True)

    total = sum(
        results.get(k, 0.0)
        for k in ("dinov2", "aggregator", "depth_head_c8", "point_head_c8",
                  "camera_head")
    )
    print(json.dumps({"name": "sum_of_stages", "s": round(total, 3),
                      "full_forward": results.get("full_forward")}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
