"""Score candidate videos per prompt group -> preference metadata.

Surface parity: reference ``train/01_preference_pair.py`` — reads a groups
metadata JSON, scores every candidate video with the geometry reward
(Consistency_Score + motion_norm at conf threshold 0, 10 frames/video),
writes the scores back into the metadata with resume support and atomic
saves. The multi-GPU spawn pool becomes a single TPU process streaming
videos through one jitted scoring graph.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

NUM_FRAMES = 10
THRESHOLDS = [0]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_json", required=True)
    parser.add_argument("--output_json", required=True)
    parser.add_argument("--base_dir", default="")
    parser.add_argument("--backbone", default=os.environ.get("VIDEO_PROCESSOR_BACKBONE", "vggt"))
    parser.add_argument("--model_name", default=None)
    parser.add_argument("--num_frames", type=int, default=NUM_FRAMES)
    args = parser.parse_args()

    from videogpa_tpu.metrics import ConsistencyScore
    from videogpa_tpu.reward import VideoProcessor
    from videogpa_tpu.utils import safe_load_json, safe_save_json

    if args.backbone == "da3":
        from videogpa_tpu.models.loader import load_da3

        params, cfg = load_da3(args.model_name or "depth-anything/DA3-Large")
    else:
        from videogpa_tpu.models.loader import load_vggt

        params, cfg = load_vggt(args.model_name or "facebook/VGGT-1B")

    vp = VideoProcessor(
        {"Consistency_Score": ConsistencyScore()},
        params=params, config=cfg, backbone=args.backbone,
    )

    data = safe_load_json(args.input_json)
    groups = data["groups"]

    # resume: previously scored videos keep their scores
    scored = {}
    if os.path.exists(args.output_json):
        prev = safe_load_json(args.output_json)
        for g in prev.get("groups", []):
            for v in g.get("videos", []):
                if "consistency_score" in v:
                    scored[v["video_path"]] = (
                        v["consistency_score"], v.get("motion_norm", 0.0)
                    )

    t0 = time.time()
    n_done = n_fail = 0
    for gi, group in enumerate(groups):
        for video in group.get("videos", []):
            vp_path = video["video_path"]
            if vp_path in scored:
                video["consistency_score"], video["motion_norm"] = scored[vp_path]
                continue
            full = os.path.join(args.base_dir, vp_path) if args.base_dir else vp_path
            try:
                res = vp.process(full, thresholds=THRESHOLDS, num_frames=args.num_frames)
                video["consistency_score"] = float(res[0]["Consistency_Score"])
                video["motion_norm"] = float(res[0]["motion_norm"])
                n_done += 1
            except Exception as e:  # per-item isolation (reference behavior)
                print(f"  failed {vp_path}: {e}")
                n_fail += 1
        safe_save_json(data, args.output_json)  # atomic incremental save
        print(f"[{gi + 1}/{len(groups)}] scored={n_done} failed={n_fail}")
    hours = (time.time() - t0) / 3600
    print(f"Done in {hours:.2f} h -> {args.output_json}")


if __name__ == "__main__":
    main()
