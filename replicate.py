"""Benchmark generation over DL3DV first frames (I2V) on TPU.

Surface parity: reference ``replicate.py`` — env-configured (RUN_MODE,
RUN_LORA_PATH, RUN_OUTPUT_DIR, PROMPT_JSON, DL3DV_BASE_DIR, RUN_NUM_PROMPTS,
RUN_SEEDS), captions keyed "<subset>/<hash>/images_8", frame_00001.png
lookup, per-seed/per-weight outputs ``seed_{s}_{mode}_w{w}.mp4``, runtime
LoRA scaling w * alpha / r, skip-existing resume.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))


def parse_int_list_env(name, default):
    raw = os.getenv(name)
    if raw is None:
        return list(default)
    return [int(x) for x in raw.split(",") if x.strip()]


CONFIG = {
    "mode": os.getenv("RUN_MODE", "dpo"),
    "weight_list": [float(x) for x in os.getenv("RUN_WEIGHTS", "1.0").split(",")],
    "base_model": os.getenv("RUN_BASE_MODEL", "THUDM/CogVideoX-5B-I2V"),
    "lora_path": os.getenv(
        "RUN_LORA_PATH", os.path.join(_HERE, "checkpoints/VideoGPA-I2V-lora")
    ),
    "prompt_json": os.getenv(
        "PROMPT_JSON", os.path.join(_HERE, "dl3dv_video_captions/captions_1K.json")
    ),
    "dl3dv_base_dir": os.getenv("DL3DV_BASE_DIR", "/datasets/DL3DV-10K"),
    "output_dir": os.getenv("RUN_OUTPUT_DIR", os.path.join(_HERE, "output/replicate")),
    "num_prompts": int(os.getenv("RUN_NUM_PROMPTS", "100")),
    "seeds_per_prompt": parse_int_list_env("RUN_SEEDS", [456]),
    "num_inference_steps": 50,
    "guidance_scale": 6.0,
    "fps": 8,
}


def extract_pure_hash(json_key):
    parts = json_key.split("/")
    return parts[1] if len(parts) >= 2 else json_key


def find_dl3dv_first_frame(base_dir, scene_hash):
    for sub in sorted(os.listdir(base_dir)) if os.path.isdir(base_dir) else []:
        cand = os.path.join(base_dir, sub, scene_hash, "images_8", "frame_00001.png")
        if os.path.exists(cand):
            return cand
        cand = os.path.join(base_dir, scene_hash, "images_8", "frame_00001.png")
        if os.path.exists(cand):
            return cand
    return None


def main():
    import argparse

    import cv2
    import jax

    from videogpa_tpu.cli.generate import CogVideoXGenerator
    from videogpa_tpu.data.video_io import write_video
    from videogpa_tpu.models.cogvideox import CogVideoXConfig

    cfg_model = CogVideoXConfig.cogvideox_5b_i2v()
    with open(CONFIG["prompt_json"], encoding="utf-8") as f:
        captions = json.load(f)
    items = list(captions.items())[: CONFIG["num_prompts"]]
    print(f"{len(items)} prompts, seeds={CONFIG['seeds_per_prompt']}, "
          f"mode={CONFIG['mode']}")

    args = argparse.Namespace(
        base_model=CONFIG["base_model"],
        lora_path=CONFIG["lora_path"] if CONFIG["mode"] != "original" else None,
        num_inference_steps=CONFIG["num_inference_steps"],
        guidance_scale=CONFIG["guidance_scale"],
    )

    for w in CONFIG["weight_list"]:
        gen = CogVideoXGenerator(args, cfg_model, i2v=True, lora_weight=w)
        for key, caption in items:
            scene = extract_pure_hash(key)
            out_dir = os.path.join(CONFIG["output_dir"], scene)
            os.makedirs(out_dir, exist_ok=True)
            frame = find_dl3dv_first_frame(CONFIG["dl3dv_base_dir"], scene)
            if frame is None:
                print(f"missing first frame for {scene}")
                continue
            img = cv2.cvtColor(cv2.imread(frame), cv2.COLOR_BGR2RGB)
            img = cv2.resize(img, (720, 480), interpolation=cv2.INTER_AREA)
            prompt = caption if isinstance(caption, str) else caption.get("caption", "")
            for seed in CONFIG["seeds_per_prompt"]:
                name = f"seed_{seed}_{CONFIG['mode']}_w{w}.mp4"
                out_path = os.path.join(out_dir, name)
                if os.path.exists(out_path):
                    continue
                try:
                    frames = gen.generate_one(prompt, seed, image=img)
                    write_video(out_path, frames, fps=CONFIG["fps"])
                    print(f"wrote {out_path}")
                except Exception as e:
                    print(f"failed {scene} seed {seed}: {e}")
    print("Done.")


if __name__ == "__main__":
    main()
