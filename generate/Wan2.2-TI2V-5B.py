"""Wan2.2-TI2V-5B text/image-to-video generation on TPU.

Surface parity with reference ``generate/Wan2.2-TI2V-5B.py``: 50 steps,
cfg 5.0, shift 5.0, 81 frames, fps 24; RELATIVE LoRA scaling (scaling *=
lora_weight, default 0.2 — reference :66-70).
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Wan2.2-TI2V-5B generation")
    parser.add_argument("--base_model", type=str, default="Wan-AI/Wan2.2-TI2V-5B")
    parser.add_argument("--prompt_json", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--lora_path", type=str, default=None)
    parser.add_argument("--lora_weight", type=float, default=0.2)
    parser.add_argument("--gpu_id", type=int, default=0)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--num_prompts", type=int, default=None)
    parser.add_argument("--num_inference_steps", type=int, default=50)
    parser.add_argument("--guidance_scale", type=float, default=5.0)
    parser.add_argument("--fps", type=int, default=24)
    parser.add_argument(
        "--solver", type=str, default="unipc",
        choices=["unipc", "euler", "heun"],
        help="flow solver; unipc matches the reference engine default",
    )
    parser.add_argument("--base_dir", type=str, default=None)
    parser.add_argument(
        "--w8a8", action="store_true",
        help="int8-quantize the DiT attention/FFN weights; dynamic W8A8 "
             "GEMMs on the int8 MXU (inference-only; ops/quant.py)",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from videogpa_tpu.cli.generate import load_tasks
    from videogpa_tpu.data.video_io import write_video
    from videogpa_tpu.models.loader import load_safetensors_dir, resolve_model_dir, _to_f32
    from videogpa_tpu.models.t5.encoder import T5Config, convert_t5_encoder, t5_encode
    from videogpa_tpu.models.wan import WanConfig
    from videogpa_tpu.models.wan.pipeline import sample_ti2v
    from videogpa_tpu.models.wan.vae import wan_vae_init

    cfg = WanConfig.ti2v_5b()
    sd = _to_f32(load_safetensors_dir(resolve_model_dir(args.base_model)))
    from videogpa_tpu.models.wan.convert import convert_wan

    dit = convert_wan(sd, cfg)
    try:
        from videogpa_tpu.models.loader import load_wan_vae

        vae = load_wan_vae(args.base_model, cfg)
    except FileNotFoundError:
        vae = wan_vae_init(jax.random.PRNGKey(0), cfg)
        print("WARNING: Wan VAE weights not found; using random VAE")
    t5_cfg = T5Config.umt5_xxl()
    t5 = convert_t5_encoder(
        _to_f32(load_safetensors_dir(resolve_model_dir(args.base_model, "text_encoder"))),
        t5_cfg,
    )
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(resolve_model_dir(args.base_model, "tokenizer"))

    if args.lora_path and os.path.exists(args.lora_path):
        from videogpa_tpu.train.lora import import_peft, merge_lora

        with open(os.path.join(args.lora_path, "adapter_config.json")) as f:
            acfg = json.load(f)
        lora = import_peft(args.lora_path, cfg.num_layers, block_prefix="blocks")
        dit = merge_lora(dit, lora, acfg["r"], acfg["lora_alpha"], weight=args.lora_weight, layout="wan")
        print(f"LoRA merged (relative weight {args.lora_weight})")

    if args.w8a8:
        from videogpa_tpu.ops.quant import quantize_on_device, quantize_wan_int8

        dit = quantize_on_device(quantize_wan_int8, dit)
        print("Wan DiT attention/FFN weights quantized to int8 (W8A8)")

    def encode(text):
        t = tok(text, padding="max_length", truncation=True,
                max_length=cfg.text_len, return_tensors="np")
        return t5_encode(t5, jnp.asarray(t["input_ids"]),
                         jnp.asarray(t["attention_mask"]), t5_cfg)

    tasks = load_tasks(args.prompt_json, args.num_prompts)
    out_root = Path(args.output_dir)
    out_root.mkdir(parents=True, exist_ok=True)
    for idx, item in enumerate(tasks):
        group_id = str(item.get("group_id", idx)).replace("/", "_")
        prompt = item.get("text_prompt", item.get("prompt", "")).strip()
        if not prompt:
            continue
        out_dir = out_root / group_id
        out_dir.mkdir(parents=True, exist_ok=True)
        video_path = out_dir / f"seed_{args.seed}.mp4"
        if video_path.exists():
            continue
        try:
            image = None
            image_path = item.get("image_path", item.get("input_image_path"))
            if image_path:
                if args.base_dir and not os.path.isabs(image_path):
                    image_path = os.path.join(args.base_dir, image_path)
                import cv2

                img = cv2.cvtColor(cv2.imread(image_path), cv2.COLOR_BGR2RGB)
                img = cv2.resize(img, (1280, 704), interpolation=cv2.INTER_AREA)
                image = jnp.asarray(img.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)[None]
            video = sample_ti2v(
                dit, vae, encode(prompt), encode(""), cfg,
                jax.random.PRNGKey(args.seed), image=image, num_frames=81,
                num_steps=args.num_inference_steps,
                guidance_scale=args.guidance_scale,
                solver=args.solver,
            )
            v = np.asarray(video)[0]
            frames = ((v.transpose(1, 2, 3, 0) + 1) * 127.5).clip(0, 255).astype(np.uint8)
            write_video(str(video_path), frames, fps=args.fps)
            print(f"[{idx + 1}/{len(tasks)}] wrote {video_path}")
        except Exception as e:
            print(f"  Failed: {e}")
    print("Done.")


if __name__ == "__main__":
    main()
