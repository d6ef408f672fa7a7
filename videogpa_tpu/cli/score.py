"""Scoring driver core: write consistency scores into groups metadata.

The logic of reference ``train/01_preference_pair.py:126-191`` factored into
a callable (the CLI wraps it): per candidate video run the reward processor,
record consistency_score + motion_norm, resume previously-scored entries,
isolate per-item failures, save atomically after every group.
"""

from __future__ import annotations

import os
from typing import Any, Dict

from videogpa_tpu.utils import safe_load_json, safe_save_json


def load_resume_map(output_json: str) -> Dict[str, Any]:
    scored: Dict[str, Any] = {}
    if os.path.exists(output_json):
        prev = safe_load_json(output_json)
        for g in prev.get("groups", []):
            for v in g.get("videos", []):
                if "consistency_score" in v:
                    scored[v["video_path"]] = (
                        v["consistency_score"],
                        v.get("motion_norm", 0.0),
                    )
    return scored


def score_groups(
    processor,
    data: dict,
    output_json: str,
    base_dir: str = "",
    num_frames: int = 10,
    thresholds=(0,),
    resume: bool = True,
    batch_size: int = 1,
) -> dict:
    """Score every candidate video in data['groups'] in place; returns stats.

    With batch_size > 1, pending clips are scored through
    ``processor.process_paths`` — one device program per fixed-size chunk
    (a TPU upgrade over the reference's one-clip-at-a-time loop).
    """
    scored = load_resume_map(output_json) if resume else {}
    n_done = n_fail = n_skip = 0
    groups = data["groups"]
    th0 = thresholds[0]

    def apply_result(video, res):
        video["consistency_score"] = float(res[th0]["Consistency_Score"])
        video["motion_norm"] = float(res[th0]["motion_norm"])

    if batch_size > 1:
        from concurrent.futures import ThreadPoolExecutor

        from videogpa_tpu.data.video_io import sample_uniform_frames

        pending = []  # (video dict, full path)
        for group in groups:
            for video in group.get("videos", []):
                vp_path = video["video_path"]
                if vp_path in scored:
                    video["consistency_score"], video["motion_norm"] = scored[vp_path]
                    n_skip += 1
                else:
                    full = os.path.join(base_dir, vp_path) if base_dir else vp_path
                    pending.append((video, full))
        chunks = [
            pending[c0 : c0 + batch_size]
            for c0 in range(0, len(pending), batch_size)
        ]

        def decode(chunk):
            return [
                sample_uniform_frames(p, n_frames=num_frames) for _, p in chunk
            ]

        # prefetch: decode chunk i+1 on a worker thread while chunk i runs
        # on device (the reference hides decode behind its per-GPU process
        # pool; here one pipelined stream does the same)
        with ThreadPoolExecutor(max_workers=1) as prefetcher:
            fut = prefetcher.submit(decode, chunks[0]) if chunks else None
            for ci, chunk in enumerate(chunks):
                try:
                    frames = fut.result()
                except Exception as e:
                    print(f"  chunk decode failed ({e}); retrying per clip")
                    frames = None
                # always advance the prefetch, whatever happened to chunk i
                fut = (prefetcher.submit(decode, chunks[ci + 1])
                       if ci + 1 < len(chunks) else None)
                batch_err = None
                if frames is not None:
                    try:
                        res_list = processor.process_frames_batch(
                            frames, list(thresholds)
                        )
                        for (video, _), res in zip(chunk, res_list):
                            apply_result(video, res)
                        n_done += len(chunk)
                    except Exception as e:
                        batch_err = e
                if frames is None or batch_err is not None:
                    if batch_err is not None:
                        print(f"  batch failed ({batch_err}); retrying per clip")
                    for video, full in chunk:  # per-item isolation
                        try:
                            res = processor.process(
                                full, thresholds=list(thresholds),
                                num_frames=num_frames,
                            )
                            apply_result(video, res)
                            n_done += 1
                        except Exception as e2:
                            print(f"  failed {video['video_path']}: {e2}")
                            n_fail += 1
                safe_save_json(data, output_json)
        return {"scored": n_done, "failed": n_fail, "resumed": n_skip}

    # single-clip loop (the reference protocol: one clip per call,
    # train/01_preference_pair.py:169-175) — pipelined at depth 2: clip
    # i+1's decode + dispatch overlap clip i's device compute + pull
    # (processor.process_frames_async; decomposition in
    # tools/onchip_single_clip.py). Falls back to the synchronous call
    # per clip on any async-path error (per-item isolation).
    pending = None  # (video, vp_path, frames, result_fn)
    async_err_noted = False

    def note_async_error(e):
        # a systematic async-path failure (e.g. an unfusable metric set or
        # VIDEOGPA_NO_FUSED_METRICS=1) degrades EVERY clip to the synchronous
        # path — say so once, with the actual error, instead of silently
        # paying the fallback for the whole run
        nonlocal async_err_noted
        if not async_err_noted:
            async_err_noted = True
            print(f"  async scoring unavailable ({e}); "
                  f"using the synchronous per-clip path")

    def drain(p):
        nonlocal n_done, n_fail
        video, vp_path, frames, result_fn = p
        try:
            apply_result(video, result_fn())
            n_done += 1
        except Exception as e:
            note_async_error(e)
            try:  # sync retry isolates a poisoned dispatch; the decoded
                # frames are host-side and not suspect, so reuse them
                apply_result(video, processor.process_frames(
                    frames, list(thresholds)
                ))
                n_done += 1
            except Exception as e2:
                print(f"  failed {vp_path}: {e2}")
                n_fail += 1

    for gi, group in enumerate(groups):
        for video in group.get("videos", []):
            vp_path = video["video_path"]
            if vp_path in scored:
                video["consistency_score"], video["motion_norm"] = scored[vp_path]
                n_skip += 1
                continue
            full = os.path.join(base_dir, vp_path) if base_dir else vp_path
            frames = None
            try:
                from videogpa_tpu.data.video_io import sample_uniform_frames

                frames = sample_uniform_frames(full, n_frames=num_frames)
                result_fn = processor.process_frames_async(
                    frames, list(thresholds)
                )
                if pending is not None:
                    drain(pending)
                pending = (video, vp_path, frames, result_fn)
            except Exception as e:  # per-item isolation (reference behavior)
                if frames is not None:  # decode succeeded; async dispatch died
                    note_async_error(e)
                if pending is not None:
                    drain(pending)
                    pending = None
                try:
                    if frames is None:
                        # the decode itself failed — retry from the file
                        res = processor.process(
                            full, thresholds=list(thresholds),
                            num_frames=num_frames,
                        )
                    else:
                        # reuse the decoded frames: no double decode+preprocess
                        res = processor.process_frames(frames, list(thresholds))
                    apply_result(video, res)
                    n_done += 1
                except Exception as e2:
                    print(f"  failed {vp_path}: {e2}")
                    n_fail += 1
        if pending is not None:
            drain(pending)
            pending = None
        safe_save_json(data, output_json)
    return {"scored": n_done, "failed": n_fail, "resumed": n_skip}


def main(argv=None):
    """``videogpa-score`` console entry point — the preference-pair scorer
    (surface parity: reference ``train/01_preference_pair.py``; the
    ``train/01_preference_pair.py`` script wraps this)."""
    import argparse
    import time

    parser = argparse.ArgumentParser(prog="videogpa-score")
    parser.add_argument("--input_json", required=True)
    parser.add_argument("--output_json", required=True)
    parser.add_argument("--base_dir", default="")
    parser.add_argument(
        "--backbone",
        default=os.environ.get("VIDEO_PROCESSOR_BACKBONE", "vggt"),
    )
    parser.add_argument("--model_name", default=None)
    parser.add_argument("--num_frames", type=int, default=10)
    parser.add_argument("--batch_size", type=int, default=1,
                        help="clips per device program (TPU batched scoring)")
    parser.add_argument(
        "--int8", action="store_true",
        help="production int8 scoring (W8A8 trunk GEMMs + int8-QK "
             "attention). Scoring only RANKS candidates — the most "
             "quantization-tolerant consumer — but the rank-agreement "
             "evidence so far is random-weights + noise-frames only "
             "(bench.py reward_int8_rank_agreement); validate on real "
             "checkpoints before trusting it for production pair-building.",
    )
    args = parser.parse_args(argv)

    from videogpa_tpu.metrics import ConsistencyScore
    from videogpa_tpu.reward import VideoProcessor

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
        num_frames=args.num_frames, thresholds=[0],
        batch_size=args.batch_size,
    )
    hours = (time.time() - t0) / 3600
    print(f"Done in {hours:.2f} h ({stats}) -> {args.output_json}")


if __name__ == "__main__":
    main()
