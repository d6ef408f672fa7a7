"""Shared CogVideoX generation driver.

CLI surface parity: reference ``generate/CogVideoX-5B.py`` /
``CogVideoX-5B-I2V.py`` / ``CogVideoX1.5-5B.py`` — same flags, prompt-JSON
formats, skip-existing resume, per-prompt error isolation, seed naming; the
``--gpu_id`` flag is accepted for CLI compatibility (single-TPU process).
LoRA mounting honors all three reference scaling conventions (PEFT merge,
CogVideoX1.5 absolute override, relative weight).
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path
from typing import Optional

import numpy as np


def add_common_args(parser: argparse.ArgumentParser, base_model: str):
    parser.add_argument("--base_model", type=str, default=base_model)
    parser.add_argument("--prompt_json", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--lora_path", type=str, default=None)
    parser.add_argument("--gpu_id", type=int, default=0)  # accepted, unused on TPU
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--num_prompts", type=int, default=None)
    parser.add_argument("--num_inference_steps", type=int, default=50)
    parser.add_argument("--guidance_scale", type=float, default=6.0)
    parser.add_argument("--fps", type=int, default=8)
    parser.add_argument(
        "--attn_impl", type=str, default="auto",
        choices=["auto", "flash", "flash_int8", "xla"],
        help="attention kernel; flash_int8 = SageAttention-style int8 QK "
             "production-inference mode (~7%% faster, cosine 0.999995)",
    )
    parser.add_argument(
        "--w8a8", action="store_true",
        help="quantize the DiT projection/FFN weights to int8 and run "
             "dynamic per-token W8A8 GEMMs on the int8 MXU "
             "(inference-only; ops/quant.py)",
    )
    return parser


def load_tasks(prompt_json: str, num_prompts: Optional[int]):
    with open(prompt_json, encoding="utf-8") as f:
        raw = json.load(f)
    if isinstance(raw, dict):
        tasks = [
            {
                "group_id": k,
                "text_prompt": v if isinstance(v, str)
                else v.get("text_prompt", v.get("prompt", "")),
                **({} if isinstance(v, str) else v),
            }
            for k, v in raw.items()
        ]
    elif isinstance(raw, list):
        tasks = raw
    else:
        raise ValueError("Unsupported prompt JSON format")
    return tasks[:num_prompts] if num_prompts else tasks


class CogVideoXGenerator:
    """Holds converted params + jitted pipelines for batch generation."""

    def __init__(self, args, cfg, i2v: bool = False, dynamic_cfg: bool = False,
                 lora_weight: Optional[float] = None, absolute_lora: bool = False):
        import jax.numpy as jnp

        from videogpa_tpu.models.cogvideox.pipeline import SamplerSettings
        from videogpa_tpu.models.loader import load_cogvideox, load_t5, resolve_model_dir

        self.cfg = cfg
        self.i2v = i2v
        self.args = args
        self.settings = SamplerSettings(
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale,
            use_dynamic_cfg=dynamic_cfg,
        )
        self.attn_impl = getattr(args, "attn_impl", "auto")
        self.dit, self.vae = load_cogvideox(args.base_model, cfg, dtype=jnp.bfloat16)
        self.t5, self.t5_cfg = load_t5(args.base_model)
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(
            resolve_model_dir(args.base_model, "tokenizer")
        )
        if args.lora_path and os.path.exists(args.lora_path):
            from videogpa_tpu.train.lora import import_peft, merge_lora

            with open(os.path.join(args.lora_path, "adapter_config.json")) as f:
                acfg = json.load(f)
            lora = import_peft(args.lora_path, cfg.num_layers)
            self.dit = merge_lora(
                self.dit, lora, acfg["r"], acfg["lora_alpha"],
                weight=lora_weight if (lora_weight is not None and not absolute_lora) else 1.0,
                absolute_scaling=lora_weight if absolute_lora else None,
            )
            print(f"LoRA merged from {args.lora_path}")
        elif args.lora_path:
            print(f"LoRA path not found: {args.lora_path}, using base model")
        if getattr(args, "w8a8", False):
            # after any LoRA merge, so the adapter quantizes with the base
            from videogpa_tpu.ops.quant import (
                quantize_dit_int8,
                quantize_on_device,
            )

            self.dit = quantize_on_device(quantize_dit_int8, self.dit)
            # --w8a8 alone is the documented full production int8 mode
            # (W8A8 GEMMs + int8-QK attention — what bench.py measures);
            # the int8 kernel only dispatches at head_dim < 128, so this
            # stays exact for the Wan geometry. --attn_impl overrides.
            if self.attn_impl == "auto":
                self.attn_impl = "flash_int8"
            print("DiT projection/FFN weights quantized to int8 (W8A8); "
                  f"attention impl: {self.attn_impl}")

    def encode_prompt(self, prompt: str):
        import jax.numpy as jnp

        from videogpa_tpu.models.t5.encoder import t5_encode

        def enc(text):
            toks = self.tokenizer(
                text, padding="max_length", truncation=True,
                max_length=self.cfg.max_text_seq_length, return_tensors="np",
            )
            return t5_encode(
                self.t5, jnp.asarray(toks["input_ids"]), None, self.t5_cfg
            )

        return enc(prompt), enc("")

    def generate_one(self, prompt: str, seed: int, image: Optional[np.ndarray] = None,
                     num_frames: int = 49, height: int = 480, width: int = 720):
        import jax
        import jax.numpy as jnp

        from videogpa_tpu.models.cogvideox.pipeline import (
            sample_i2v, sample_t2v, video_to_uint8,
        )

        text_emb, neg_emb = self.encode_prompt(prompt)
        key = jax.random.PRNGKey(seed)
        if self.i2v:
            img = jnp.asarray(image.astype(np.float32) / 127.5 - 1.0)
            img = jnp.transpose(img, (2, 0, 1))[None]
            video = sample_i2v(
                self.dit, self.vae, text_emb, neg_emb, img, self.cfg, key,
                num_frames=num_frames, settings=self.settings,
                attn_impl=self.attn_impl,
            )
        else:
            video = sample_t2v(
                self.dit, self.vae, text_emb, neg_emb, self.cfg, key,
                num_frames=num_frames, height=height, width=width,
                settings=self.settings, attn_impl=self.attn_impl,
            )
        return video_to_uint8(video)[0]  # (T, H, W, 3)


def run_generation(args, cfg, i2v=False, dynamic_cfg=False,
                   lora_weight=None, absolute_lora=False,
                   num_frames=49, height=480, width=720, base_dir=None):
    from videogpa_tpu.data.video_io import write_video

    gen = CogVideoXGenerator(args, cfg, i2v, dynamic_cfg, lora_weight, absolute_lora)
    tasks = load_tasks(args.prompt_json, args.num_prompts)
    out_root = Path(args.output_dir)
    out_root.mkdir(parents=True, exist_ok=True)
    print(f"Generating {len(tasks)} prompts, seed={args.seed}")

    for idx, item in enumerate(tasks):
        group_id = str(item.get("group_id", idx)).replace("/", "_")
        prompt = item.get("text_prompt", item.get("prompt", "")).strip()
        if not prompt:
            continue
        out_dir = out_root / group_id
        out_dir.mkdir(parents=True, exist_ok=True)
        video_path = out_dir / f"seed_{args.seed}.mp4"
        if video_path.exists():
            print(f"[{idx + 1}/{len(tasks)}] Skip existing: {group_id}")
            continue
        print(f"[{idx + 1}/{len(tasks)}] Generating: {group_id}")
        try:
            image = None
            if i2v:
                image_path = item.get("image_path", item.get("input_image_path"))
                if image_path and base_dir and not os.path.isabs(image_path):
                    image_path = os.path.join(base_dir, image_path)
                if not image_path or not os.path.exists(image_path):
                    print("  missing input image, skipping")
                    continue
                import cv2

                img = cv2.cvtColor(cv2.imread(image_path), cv2.COLOR_BGR2RGB)
                img = cv2.resize(img, (width, height), interpolation=cv2.INTER_AREA)
                image = img
            frames = gen.generate_one(
                prompt, args.seed, image, num_frames, height, width
            )
            write_video(str(video_path), frames, fps=args.fps)
        except Exception as e:  # per-prompt isolation (reference behavior)
            print(f"  Failed: {e}")
    print("Done.")
