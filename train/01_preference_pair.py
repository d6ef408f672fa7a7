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
    parser.add_argument("--batch_size", type=int, default=1,
                        help="clips per device program (TPU batched scoring)")
    parser.add_argument("--int8", action="store_true",
                        help="production int8 scoring (W8A8 trunk GEMMs + "
                             "int8-QK attention; scoring only ranks "
                             "candidates, the most quantization-tolerant "
                             "consumer)")
    args = parser.parse_args()

    from videogpa_tpu.cli.score import score_groups
    from videogpa_tpu.metrics import ConsistencyScore
    from videogpa_tpu.reward import VideoProcessor
    from videogpa_tpu.utils import safe_load_json

    if args.backbone == "da3":
        from videogpa_tpu.models.loader import load_da3

        params, cfg = load_da3(args.model_name or "depth-anything/DA3-Large")
    else:
        from videogpa_tpu.models.loader import load_vggt

        params, cfg = load_vggt(args.model_name or "facebook/VGGT-1B")

    attn_impl = "auto"
    if args.int8:
        from videogpa_tpu.ops.quant import quantize_scorer_params

        params, attn_impl = quantize_scorer_params(args.backbone, params)

    vp = VideoProcessor(
        {"Consistency_Score": ConsistencyScore()},
        params=params, config=cfg, backbone=args.backbone,
        attn_impl=attn_impl,
    )

    data = safe_load_json(args.input_json)
    t0 = time.time()
    stats = score_groups(
        vp, data, args.output_json, base_dir=args.base_dir,
        num_frames=args.num_frames, thresholds=THRESHOLDS,
        batch_size=args.batch_size,
    )
    hours = (time.time() - t0) / 3600
    print(f"Done in {hours:.2f} h ({stats}) -> {args.output_json}")


if __name__ == "__main__":
    main()
