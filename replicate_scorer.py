"""Benchmark scoring of replicate outputs on TPU.

Surface parity: reference ``replicate_scorer.py`` — SCORE_* env config
(backbone default da3), scans base_dir/<prompt_id>/*.mp4 with optional seed
filter, resume from JSON, per-video rows -> CSV + JSON report with per-mode
summary means over the metric set psnr/ssim/lpips/mvcs/consistency_score/
epipolar(+mse, motion_score).
"""

import csv
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_VGGT_MODEL = "facebook/VGGT-1B"
DEFAULT_DA3_MODEL = "depth-anything/DA3-Large"
METRIC_COLS = ["psnr", "ssim", "lpips", "mvcs", "consistency_score", "epipolar"]


def parse_bool_env(name, default):
    raw = os.getenv(name)
    if raw is None:
        return default
    return raw.strip().lower() in {"1", "true", "yes", "y", "on"}


def build_score_config():
    backbone = os.getenv("SCORE_BACKBONE", "da3").strip().lower()
    default_model = DEFAULT_DA3_MODEL if backbone == "da3" else DEFAULT_VGGT_MODEL
    return {
        "base_dir": os.getenv("SCORE_BASE_DIR", "output/replicate"),
        "output_csv": os.getenv("SCORE_OUTPUT_CSV", "output/replicate/scores.csv"),
        "output_json": os.getenv("SCORE_OUTPUT_JSON", ""),
        "num_frames": int(os.getenv("SCORE_NUM_FRAMES", "10")),
        "conf_thres": int(os.getenv("SCORE_CONF_THRES", "0")),
        "ignore_seed": parse_bool_env("SCORE_IGNORE_SEED", True),
        "descriptor_type": os.getenv("SCORE_DESCRIPTOR_TYPE", "sift"),
        "backbone": backbone,
        "model_name": os.getenv("SCORE_MODEL_NAME", default_model),
        "resume": parse_bool_env("SCORE_RESUME", False),
        "max_videos": int(os.getenv("SCORE_MAX_VIDEOS", "0")),
        "seed_filter": os.getenv("SCORE_SEED_FILTER", ""),
        # clips per device program (TPU upgrade over the reference's
        # one-process-per-GPU pools; 1 = reference-identical per-video loop)
        "score_batch": int(os.getenv("SCORE_BATCH", "1")),
        # production int8 scoring: W8A8 trunk GEMMs + int8-QK attention.
        # Scoring only RANKS candidates (the most quantization-tolerant
        # consumer); measured trunk cosine >0.999 vs exact per family.
        # Caveat: the rank-agreement evidence (bench.py
        # reward_int8_rank_agreement) is measured on RANDOM weights + noise
        # frames — absolute consistency-score drift is chaotic there (top-k
        # masks / z-buffer winners flip discontinuously), and ranking
        # behavior on trained checkpoints may differ; validate against a
        # small exact-scored subset before trusting int8 for production
        # preference pairs. Off by default.
        "int8": parse_bool_env("SCORE_INT8", False),
    }


SCORE_CONFIG = build_score_config()


def collect_tasks(cfg):
    base = Path(cfg["base_dir"])
    tasks = []
    for prompt_dir in sorted(p for p in base.iterdir() if p.is_dir()):
        for mp4 in sorted(prompt_dir.glob("*.mp4")):
            if cfg["seed_filter"] and f"seed_{cfg['seed_filter']}" not in mp4.name:
                continue
            tasks.append({
                "prompt_id": prompt_dir.name,
                "path": str(mp4),
                "relative_path": str(mp4.relative_to(base)),
            })
    if cfg["max_videos"]:
        tasks = tasks[: cfg["max_videos"]]
    return tasks


def infer_mode(video_name):
    for mode in ("dpo", "sft", "original"):
        if f"_{mode}_" in video_name or video_name.endswith(f"_{mode}.mp4"):
            return mode
    return "unknown"


def build_summary(rows):
    by_mode = {}
    for row in rows:
        if row.get("error"):
            continue
        by_mode.setdefault(infer_mode(row["video_name"]), []).append(row)
    summary = {}
    for mode, items in by_mode.items():
        summary[mode] = {"count": len(items)}
        for col in METRIC_COLS + ["mse", "motion_score"]:
            vals = [r[col] for r in items if r.get(col) is not None]
            if vals:
                summary[mode][f"mean_{col}"] = sum(vals) / len(vals)
    return summary


def main():
    cfg = SCORE_CONFIG
    from videogpa_tpu.metrics import build_metrics
    from videogpa_tpu.reward import VideoProcessor

    if cfg["backbone"] == "da3":
        from videogpa_tpu.models.loader import load_da3

        params, model_cfg = load_da3(cfg["model_name"])
    else:
        from videogpa_tpu.models.loader import load_vggt

        params, model_cfg = load_vggt(cfg["model_name"])

    attn_impl = "auto"
    if cfg["int8"]:
        from videogpa_tpu.ops.quant import quantize_scorer_params

        params, attn_impl = quantize_scorer_params(cfg["backbone"], params)

    metrics = build_metrics(descriptor_type=cfg["descriptor_type"])
    vp = VideoProcessor(metrics, params=params, config=model_cfg,
                        backbone=cfg["backbone"], attn_impl=attn_impl)

    tasks = collect_tasks(cfg)
    print(f"{len(tasks)} videos to score (backbone={cfg['backbone']})")

    rows = []
    done_paths = set()
    out_json = cfg["output_json"] or cfg["output_csv"].replace(".csv", ".json")
    if cfg["resume"] and os.path.exists(out_json):
        with open(out_json) as f:
            prev = json.load(f)
        rows = prev.get("rows", [])
        done_paths = {r["video_path"] for r in rows}
        print(f"resuming: {len(rows)} already scored")

    def row_for(task):
        return {
            "prompt_id": task["prompt_id"],
            "video_name": os.path.basename(task["path"]),
            "video_path": task["path"],
            "relative_path": task["relative_path"],
            "backbone": cfg["backbone"],
        }

    def fill(row, res):
        row.update({
            "mse": float(res.get("MSE", 0.0)),
            "consistency_score": float(res.get("Consistency_Score", 0.0)),
            "motion_score": float(res.get("motion_norm", 0.0)),
            "psnr": float(res.get("PSNR", 0.0)),
            "ssim": float(res.get("SSIM", 0.0)),
            "lpips": float(res.get("LPIPS", 0.0)),
            "mvcs": float(res.get("MVCS", 0.0)),
            "epipolar": float(res.get("Epipolar", 0.0)),
        })

    def score_single(task):
        row = row_for(task)
        try:
            results = vp.process(task["path"], thresholds=[cfg["conf_thres"]],
                                 num_frames=cfg["num_frames"])
            fill(row, results.get(cfg["conf_thres"], {}))
        except Exception as e:
            print(f"failed {task['path']}: {e}")
            row["error"] = str(e)
            for col in METRIC_COLS:
                row.setdefault(col, None)
        return row

    pending = [t for t in tasks if t["path"] not in done_paths]
    B = max(1, cfg["score_batch"])
    done = 0
    for start in range(0, len(pending), B):
        chunk = pending[start : start + B]
        if len(chunk) > 1:
            # K clips per device program (fused scored graph); on any
            # failure fall back to the per-video loop for this chunk so one
            # bad file doesn't lose the batch
            try:
                batch_res = vp.process_paths(
                    [t["path"] for t in chunk], thresholds=[cfg["conf_thres"]],
                    num_frames=cfg["num_frames"],
                )
                for task, res in zip(chunk, batch_res):
                    row = row_for(task)
                    fill(row, res.get(cfg["conf_thres"], {}))
                    rows.append(row)
            except Exception as e:
                print(f"batch failed ({e}); retrying singly")
                rows.extend(score_single(t) for t in chunk)
        else:
            rows.extend(score_single(t) for t in chunk)
        done += len(chunk)
        if done % 10 < len(chunk):
            print(f"[{done}/{len(pending)}]")

    os.makedirs(os.path.dirname(os.path.abspath(cfg["output_csv"])), exist_ok=True)
    cols = ["prompt_id", "video_name", "video_path", "relative_path", "backbone",
            "mse", "consistency_score", "motion_score"] + METRIC_COLS + ["error"]
    with open(cfg["output_csv"], "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=cols, extrasaction="ignore")
        writer.writeheader()
        writer.writerows(rows)
    report = {"config": cfg, "rows": rows, "summary": build_summary(rows)}
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {cfg['output_csv']} and {out_json}")
    for mode, s in report["summary"].items():
        print(mode, {k: round(v, 4) for k, v in s.items() if isinstance(v, float)})


if __name__ == "__main__":
    main()
