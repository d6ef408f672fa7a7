"""DA3 command-line interface.

Functional equivalent of the reference typer app
(``depth_anything_3/cli.py``): subcommands auto / image / images / video /
backend with input-type autodetection, fps-based video frame sampling and the
export dispatch. (argparse instead of typer — typer is not available in this
environment.)

Usage: python -m videogpa_tpu.models.da3.cli <command> [args]
"""

from __future__ import annotations

import argparse
import os
from typing import List

IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".webp"}
VIDEO_EXTS = {".mp4", ".mov", ".avi", ".mkv", ".webm"}


def _load_model(model_dir: str):
    from videogpa_tpu.models.loader import load_da3

    return load_da3(model_dir or "depth-anything/DA3-Large")


def _pad14(img):
    import cv2

    h, w = img.shape[:2]
    # resize so the long side is 518 and both sides are /14-divisible
    scale = 518 / max(h, w)
    nh = max(14, round(h * scale / 14) * 14)
    nw = max(14, round(w * scale / 14) * 14)
    return cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA)


def _run(frames, model_dir: str, export_format: str, out_dir: str):
    import numpy as np

    from videogpa_tpu.models.da3.export import export
    from videogpa_tpu.models.da3.model import da3_inference

    params, cfg = _load_model(model_dir)
    frames = np.stack([_pad14(f) for f in frames])
    pred = da3_inference(params, frames, cfg)
    path = export(pred, export_format, out_dir)
    print(f"exported {export_format} -> {path}")
    return pred


def cmd_auto(args):
    ext = os.path.splitext(args.input)[1].lower()
    if os.path.isdir(args.input):
        return cmd_images(args)
    if ext in VIDEO_EXTS:
        return cmd_video(args)
    if ext in IMAGE_EXTS:
        return cmd_image(args)
    raise SystemExit(f"cannot autodetect input type of {args.input}")


def _read_images(paths: List[str]):
    import cv2

    return [cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB) for p in paths]


def cmd_image(args):
    _run(_read_images([args.input]), args.model_dir, args.export_format, args.out_dir)


def cmd_images(args):
    if os.path.isdir(args.input):
        paths = sorted(
            os.path.join(args.input, f)
            for f in os.listdir(args.input)
            if os.path.splitext(f)[1].lower() in IMAGE_EXTS
        )
    else:
        paths = args.input.split(",")
    _run(_read_images(paths), args.model_dir, args.export_format, args.out_dir)


def cmd_video(args):
    import numpy as np

    from videogpa_tpu.data.video_io import read_video_frames, video_frame_count

    total = video_frame_count(args.input)
    step = max(1, round(30 / args.fps))  # assume ~30fps containers like the reference
    idx = np.arange(0, max(total, 1), step)[: args.max_frames]
    frames = read_video_frames(args.input, idx)
    _run(list(frames), args.model_dir, args.export_format, args.out_dir)


def cmd_backend(args):
    from videogpa_tpu.models.da3.service import serve

    serve(model_dir=args.model_dir, host=args.host, port=args.port)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="da3", description="Depth Anything 3 (TPU)")
    sub = parser.add_subparsers(dest="command", required=True)

    def common(p):
        p.add_argument("--model_dir", default=None)
        p.add_argument("--export_format", default="glb",
                       choices=["glb", "npz", "mini_npz", "ply", "colmap", "depth_vis"])
        p.add_argument("--out_dir", default="da3_out")

    for name, fn in [("auto", cmd_auto), ("image", cmd_image),
                     ("images", cmd_images), ("video", cmd_video)]:
        p = sub.add_parser(name)
        p.add_argument("input")
        common(p)
        if name in ("auto", "video"):
            p.add_argument("--fps", type=float, default=1.0)
            p.add_argument("--max_frames", type=int, default=100)
        p.set_defaults(fn=fn)

    p = sub.add_parser("backend")
    p.add_argument("--model_dir", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.set_defaults(fn=cmd_backend)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
