"""Download the released VideoGPA LoRA adapters (GitHub release v1.0.0-weights).

Surface parity: reference ``download_ckpt.py`` — streams the five adapter
safetensors into checkpoints/<name>/. Network access is required; in
air-gapped environments place the files manually.
"""

import argparse
import os
import urllib.request

RELEASE = "https://github.com/Hongyang-Du/VideoGPA/releases/download/v1.0.0-weights"
ADAPTERS = [
    "VideoGPA-I2V-lora",
    "VideoGPA-I2V-1K-lora",
    "VideoGPA-T2V-lora",
    "VideoGPA-T2V1.5-lora",
    "VideoGPA-Wan2.2TI2V-lora",
]


def download_file(url: str, dest: str, chunk: int = 1 << 20) -> None:
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    tmp = dest + ".part"
    with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
        while True:
            buf = r.read(chunk)
            if not buf:
                break
            f.write(buf)
    os.replace(tmp, dest)
    print(f"downloaded {dest}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out_dir", default="checkpoints")
    args = parser.parse_args()
    for name in ADAPTERS:
        url = f"{RELEASE}/{name}.safetensors"
        dest = os.path.join(args.out_dir, name, "adapter_model.safetensors")
        if os.path.exists(dest):
            print(f"skip existing {dest}")
            continue
        try:
            download_file(url, dest)
        except Exception as e:
            print(f"failed {name}: {e}")


if __name__ == "__main__":
    main()
