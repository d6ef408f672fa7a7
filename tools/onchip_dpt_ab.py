"""On-chip A/B of the VGGT DPT head: dtype x chunk (round 4).

The round-4 stage split (tools/onchip_scorer_stages.py) measured the two
f32 DPT heads at 0.32 + 0.33 s of the K=4 scorer — the next term after the
z-buffer fix. This probes, from a precomputed (5, K, S, P, 2C) layer stack:

  depth_f32_c8   — production setting (reference autocast-off policy)
  depth_f32_c40  — no chunking (whole batch per fusion pyramid)
  depth_bf16_c8  — bf16 pyramid/fusion, f32 activations
  depth_bf16_c40

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/onchip_dpt_ab.py
"""

import dataclasses
import json
import sys
import time

import numpy as np

K = 4
S_FRAMES = 10


def main():
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.models.vggt import VGGTConfig, vggt_init
    from videogpa_tpu.models.vggt.heads import dpt_head_forward
    from videogpa_tpu.train.memory import _enable_compile_cache

    _enable_compile_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()

    cfg = VGGTConfig()
    params = vggt_init(jax.random.PRNGKey(0), cfg)
    S = cfg.img_size
    P = (S // cfg.patch_size) ** 2 + cfg.patch_start_idx
    keep = tuple(sorted(set(cfg.dpt_intermediate_layers) | {cfg.depth - 1}))
    pos = {layer: i for i, layer in enumerate(keep)}
    hcfg = dataclasses.replace(
        cfg,
        dpt_intermediate_layers=tuple(pos[l] for l in cfg.dpt_intermediate_layers),
    )
    lo = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (len(keep), K, S_FRAMES, P, 2 * cfg.embed_dim)
        ).astype(np.float32),
        jnp.bfloat16,
    )
    head_f32 = params["depth_head"]
    head_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), head_f32)
    jax.block_until_ready((lo, head_f32, head_bf16))

    def timeit(name, fn, *args, iters=3):
        try:
            out = fn(*args)
            float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:8])))
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                out = fn(*args)
                float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:8])))
                ts.append(time.perf_counter() - t0)
            print(json.dumps({"name": name, "s": round(min(ts), 3)}), flush=True)
        except Exception as e:  # e.g. chunk=40 OOMs the fusion pyramid
            print(json.dumps({"name": name, "error": str(e)[:120]}), flush=True)

    def mk(chunk, dtype):
        @jax.jit
        def run(hp, lo):
            return dpt_head_forward(
                hp, lo, hcfg, (S, S), "exp", "expp1",
                chunk_size=chunk, compute_dtype=dtype,
            )

        return run

    timeit("depth_f32_c8", mk(8, jnp.float32), head_f32, lo)
    timeit("depth_bf16_c8", mk(8, jnp.bfloat16), head_bf16, lo)
    timeit("depth_bf16_c10", mk(10, jnp.bfloat16), head_bf16, lo)

    # numeric drift of the bf16 pyramid on this random stack
    d32, c32 = mk(8, jnp.float32)(head_f32, lo)
    d16, c16 = mk(8, jnp.bfloat16)(head_bf16, lo)
    rel = float(jnp.linalg.norm((d16 - d32).astype(jnp.float32))
                / jnp.linalg.norm(d32.astype(jnp.float32)))
    print(json.dumps({"name": "bf16_rel_l2_depth", "v": round(rel, 5)}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
