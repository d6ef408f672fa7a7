"""Shared host-side utilities (atomic JSON IO, score summaries, logging)."""

from videogpa_tpu.utils.json_io import safe_load_json, safe_save_json, save_score_json
from videogpa_tpu.utils.logging import MetricLogger
from videogpa_tpu.utils.timing import StageTimer

__all__ = ["safe_load_json", "safe_save_json", "save_score_json", "MetricLogger", "StageTimer"]
