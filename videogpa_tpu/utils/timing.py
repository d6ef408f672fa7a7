"""Lightweight per-stage wall-clock timing.

Parity: the reference logs per-stage timers in the DA3 api
(``depth_anything_3/api.py:284-298,377-389``: input processing / forward /
output processing, with a cuda synchronize around the forward) and total-run
hours in the scoring driver (``train/01_preference_pair.py:288-296``). Here
one ``StageTimer`` covers both, with an optional device-sync callable for
accurate accelerator timing (pass a function that materializes a scalar —
``block_until_ready`` is unreliable on some remote TPU backends).
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Callable, Dict, Optional


class StageTimer:
    def __init__(self, sync: Optional[Callable[[], None]] = None,
                 verbose: bool = False):
        self.sync = sync
        self.verbose = verbose
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextmanager
    def stage(self, name: str):
        if self.sync is not None:
            self.sync()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync is not None:
                self.sync()
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            if self.verbose:
                print(f"[timer] {name}: {dt * 1000:.1f} ms")

    def mean(self, name: str) -> float:
        return self.totals.get(name, 0.0) / max(self.counts.get(name, 0), 1)

    def summary(self) -> Dict[str, dict]:
        return {
            k: {"total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "mean_ms": round(1000 * self.mean(k), 2)}
            for k in self.totals
        }

    def report(self) -> str:
        lines = [
            f"{k}: {v['total_s']:.2f}s total, {v['count']}x, "
            f"{v['mean_ms']:.1f} ms/it"
            for k, v in self.summary().items()
        ]
        return "\n".join(lines)
