"""Encode candidate videos + conditions for Wan2.2-TI2V DPO.

Surface parity: reference ``train/Wan2.2-TI2V-5B/02_encode.py`` — umT5 prompt
embeddings (padded to text_len 512), Wan VAE latents for 81-frame videos, and
the first-frame image resized/cropped to the video resolution encoded to
``image_latent``; cached-file skip gives resume.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "../..")))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--metadata", required=True)
    parser.add_argument("--base_dir", required=True)
    parser.add_argument("--output_dir", default="dpo_latents")
    parser.add_argument("--model_path", default="Wan-AI/Wan2.2-TI2V-5B")
    parser.add_argument("--num_frames", type=int, default=81)
    parser.add_argument("--height", type=int, default=704)
    parser.add_argument("--width", type=int, default=1280)
    args = parser.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from videogpa_tpu.data.video_io import read_video_frames
    from videogpa_tpu.models.loader import _to_f32, load_safetensors_dir, resolve_model_dir
    from videogpa_tpu.models.t5.encoder import T5Config, convert_t5_encoder, t5_encode
    from videogpa_tpu.models.wan import WanConfig
    from videogpa_tpu.models.wan.vae import wan_vae_encode, wan_vae_init
    from videogpa_tpu.utils import safe_load_json, safe_save_json

    cfg = WanConfig.ti2v_5b()
    try:
        from videogpa_tpu.models.loader import load_wan_vae

        vae = load_wan_vae(args.model_path, cfg)
    except Exception as e:
        print(f"WARNING: Wan VAE weights unavailable ({e}); random init")
        vae = wan_vae_init(jax.random.PRNGKey(0), cfg)
    t5_cfg = T5Config.umt5_xxl()
    t5 = convert_t5_encoder(
        _to_f32(load_safetensors_dir(resolve_model_dir(args.model_path, "text_encoder"))),
        t5_cfg,
    )
    tok = AutoTokenizer.from_pretrained(resolve_model_dir(args.model_path, "tokenizer"))

    data = safe_load_json(args.metadata)
    out_root = os.path.join(args.base_dir, args.output_dir)
    os.makedirs(out_root, exist_ok=True)

    @jax.jit
    def encode_video(video, key):
        # Wan2_2_VAE.encode is deterministic (returns the posterior mean);
        # key is threaded for signature stability but unused.
        del key
        return wan_vae_encode(vae, video, cfg, sample=False)

    for gi, group in enumerate(data["groups"]):
        gid = str(group.get("group_id", gi)).replace("/", "_")
        cond_rel = os.path.join(args.output_dir, f"condition_{gid}.npz")
        full_cond = os.path.join(args.base_dir, cond_rel)
        if not os.path.exists(full_cond):
            t = tok(group.get("text_prompt", group.get("prompt", "")),
                    padding="max_length", truncation=True,
                    max_length=cfg.text_len, return_tensors="np")
            emb = t5_encode(t5, jnp.asarray(t["input_ids"]),
                            jnp.asarray(t["attention_mask"]), t5_cfg)
            cond = {"encoder_hidden_states": np.asarray(emb[0], np.float32)}
            image_path = group.get("image_path", group.get("input_image_path"))
            if image_path:
                ip = image_path if os.path.isabs(image_path) else os.path.join(args.base_dir, image_path)
                img = cv2.cvtColor(cv2.imread(ip), cv2.COLOR_BGR2RGB)
                img = cv2.resize(img, (args.width, args.height), interpolation=cv2.INTER_AREA)
                vid = jnp.asarray(
                    img.astype(np.float32).transpose(2, 0, 1)[None, :, None] / 127.5 - 1.0
                )
                lat = encode_video(vid, jax.random.PRNGKey(1000 + gi))
                cond["image_latent"] = np.asarray(lat[0], np.float32)
            np.savez(full_cond, **cond)
        for video in group.get("videos", []):
            lat_rel = os.path.join(
                args.output_dir, f"latent_{gid}_{video.get('generation_id', 0)}.npz"
            )
            full_lat = os.path.join(args.base_dir, lat_rel)
            video["latent_path"] = lat_rel
            video["condition_path"] = cond_rel
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
