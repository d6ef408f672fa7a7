"""Encode candidate videos + conditions to latent artifacts (CogVideoX-I2V).

Surface parity: reference ``train/CogVideoX-I2V-5B/02_encode.py`` — per
group: T5 prompt embedding (max_len 226) + raw first-frame image tensor into
one condition artifact; per candidate video: 49 frames VAE-encoded to a
sampled latent. Artifacts are .npz (the DPO dataset also reads reference .pt
files); cached-file skip gives resume.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "../..")))

import numpy as np

NUM_FRAMES = 49


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--metadata", required=True)
    parser.add_argument("--base_dir", required=True)
    parser.add_argument("--output_dir", default="dpo_latents")
    parser.add_argument("--model_path", default="THUDM/CogVideoX-5B-I2V")
    parser.add_argument("--num_frames", type=int, default=NUM_FRAMES)
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--width", type=int, default=720)
    args = parser.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from videogpa_tpu.data.video_io import read_video_frames
    from videogpa_tpu.models.cogvideox import CogVideoXConfig
    from videogpa_tpu.models.cogvideox.vae import vae_encode
    from videogpa_tpu.models.loader import load_cogvideox, load_t5, resolve_model_dir
    from videogpa_tpu.models.t5.encoder import t5_encode
    from videogpa_tpu.utils import safe_load_json, safe_save_json

    cfg = CogVideoXConfig.cogvideox_5b_i2v()
    _, vae = load_cogvideox(args.model_path, cfg)
    t5, t5_cfg = load_t5(args.model_path)
    tokenizer = AutoTokenizer.from_pretrained(resolve_model_dir(args.model_path, "tokenizer"))

    out_root = os.path.join(args.base_dir, args.output_dir)
    os.makedirs(out_root, exist_ok=True)
    data = safe_load_json(args.metadata)

    @jax.jit
    def encode_video(video, key):
        return vae_encode(vae, video, cfg, key=key, sample=True)

    for gi, group in enumerate(data["groups"]):
        gid = str(group.get("group_id", gi)).replace("/", "_")
        cond_path = os.path.join(args.output_dir, f"condition_{gid}.npz")
        full_cond = os.path.join(args.base_dir, cond_path)
        if not os.path.exists(full_cond):
            toks = tokenizer(
                group.get("text_prompt", group.get("prompt", "")),
                padding="max_length", truncation=True,
                max_length=cfg.max_text_seq_length, return_tensors="np",
            )
            emb = t5_encode(t5, jnp.asarray(toks["input_ids"]), None, t5_cfg)
            cond = {"encoder_hidden_states": np.asarray(emb[0], np.float32)}
            image_path = group.get("image_path", group.get("input_image_path"))
            if image_path:
                ip = image_path if os.path.isabs(image_path) else os.path.join(args.base_dir, image_path)
                img = cv2.cvtColor(cv2.imread(ip), cv2.COLOR_BGR2RGB)
                img = cv2.resize(img, (args.width, args.height), interpolation=cv2.INTER_AREA)
                cond["image_embeds"] = (
                    img.astype(np.float32).transpose(2, 0, 1) / 127.5 - 1.0
                )
            np.savez(full_cond, **cond)
        for video in group.get("videos", []):
            lat_rel = os.path.join(args.output_dir, f"latent_{gid}_{video.get('generation_id', 0)}.npz")
            full_lat = os.path.join(args.base_dir, lat_rel)
            video["latent_path"] = lat_rel
            video["condition_path"] = cond_path
            if os.path.exists(full_lat):
                continue
            try:
                vpath = video["video_path"]
                if not os.path.isabs(vpath):
                    vpath = os.path.join(args.base_dir, vpath)
                frames = read_video_frames(vpath, np.arange(args.num_frames))
                frames = np.stack([
                    cv2.resize(f, (args.width, args.height), interpolation=cv2.INTER_AREA)
                    for f in frames
                ])
                vid = jnp.asarray(
                    frames.astype(np.float32).transpose(3, 0, 1, 2)[None] / 127.5 - 1.0
                )
                lat = encode_video(vid, jax.random.PRNGKey(gi))
                np.savez(full_lat, data=np.asarray(lat[0], np.float32))
            except Exception as e:
                print(f"  encode failed {video['video_path']}: {e}")
        safe_save_json(data, args.metadata)
        print(f"[{gi + 1}/{len(data['groups'])}] {gid}")
    print("Done.")


if __name__ == "__main__":
    main()
