"""Build I2V prompt JSON from a folder of first frames.

Surface parity: reference ``data_prep/generate_i2v_prompts.py`` — static-scene
prefix prompt plus a randomly composed 2-3 stage camera-motion phrase
(translations / rotations / orbits), keyed by scene folder.
"""

import argparse
import json
import os
import random

STATIC_PREFIX = (
    "A completely static scene with no moving objects. "
    "The camera moves smoothly through the environment. "
)

TRANSLATIONS = [
    "the camera slowly moves forward",
    "the camera slowly moves backward",
    "the camera pans to the left",
    "the camera pans to the right",
    "the camera rises upward",
    "the camera descends downward",
]
ROTATIONS = [
    "the camera rotates to the left",
    "the camera rotates to the right",
    "the camera tilts upward",
    "the camera tilts downward",
]
ORBITS = [
    "the camera orbits around the scene to the left",
    "the camera orbits around the scene to the right",
]
CONNECTORS = [", then ", ", after that ", ", and finally "]


def generate_multi_stage_motion(rng: random.Random) -> str:
    n_stages = rng.choice([2, 3])
    pools = [TRANSLATIONS, ROTATIONS, ORBITS]
    stages = []
    for _ in range(n_stages):
        pool = rng.choice(pools)
        phrase = rng.choice(pool)
        if phrase not in stages:
            stages.append(phrase)
    out = stages[0]
    for i, s in enumerate(stages[1:]):
        out += CONNECTORS[min(i, len(CONNECTORS) - 1)] + s
    return out + "."


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames_dir", required=True,
                        help="folder with one sub-folder (or image) per scene")
    parser.add_argument("--output_json", required=True)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()

    rng = random.Random(args.seed)
    entries = {}
    for name in sorted(os.listdir(args.frames_dir)):
        path = os.path.join(args.frames_dir, name)
        scene = os.path.splitext(name)[0]
        image_path = path
        if os.path.isdir(path):
            imgs = sorted(
                f for f in os.listdir(path)
                if f.lower().endswith((".png", ".jpg", ".jpeg"))
            )
            if not imgs:
                continue
            image_path = os.path.join(path, imgs[0])
        entries[scene] = {
            "group_id": scene,
            "text_prompt": STATIC_PREFIX + generate_multi_stage_motion(rng),
            "image_path": image_path,
        }

    with open(args.output_json, "w") as f:
        json.dump(entries, f, indent=2)
    print(f"wrote {len(entries)} prompts -> {args.output_json}")


if __name__ == "__main__":
    main()
