"""Param-pytree persistence.

Two layers:
- ``save_pytree`` / ``load_pytree``: flat .npz files for converted model
  weights (dicts/lists of arrays; keys are '/'-joined paths, integer path
  segments rebuild lists).
- ``TrainCheckpointer``: orbax-backed training state checkpointing with
  top-k retention by a monitored metric (replaces Lightning's
  ModelCheckpoint, reference ``train/CogVideoX-I2V-5B/03_train.py:260-267``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_pytree(tree: Any, path: str) -> None:
    flat = _flatten(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)


def load_pytree(path: str, to_device: bool = True) -> Any:
    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        path = path + ".npz"
    data = np.load(path)
    root: Dict[str, Any] = {}
    for key in data.files:
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key]) if to_device else data[key]

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


class TrainCheckpointer:
    """Orbax checkpointing with top-k retention by a monitored metric."""

    def __init__(self, directory: str, save_top_k: int = 10, mode: str = "min"):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_top_k = save_top_k
        self.mode = mode
        self._ckpt = ocp.StandardCheckpointer()
        self._scores_path = os.path.join(self.directory, "scores.json")
        self._scores: Dict[str, float] = {}
        if os.path.exists(self._scores_path):
            with open(self._scores_path) as f:
                self._scores = json.load(f)

    def save(self, step: int, state: Any, metric: Optional[float] = None) -> None:
        name = f"step_{step:08d}"
        path = os.path.join(self.directory, name)
        self._ckpt.save(path, state, force=True)
        self._scores[name] = float(metric) if metric is not None else float("inf")
        self._prune()
        with open(self._scores_path, "w") as f:
            json.dump(self._scores, f, indent=2)

    def _prune(self) -> None:
        if self.save_top_k <= 0 or len(self._scores) <= self.save_top_k:
            return
        reverse = self.mode == "max"
        ranked = sorted(self._scores.items(), key=lambda kv: kv[1], reverse=reverse)
        for name, _ in ranked[self.save_top_k :]:
            import shutil

            p = os.path.join(self.directory, name)
            if os.path.exists(p):
                shutil.rmtree(p)
            self._scores.pop(name, None)

    def latest(self) -> Optional[str]:
        names = sorted(n for n in self._scores)
        return os.path.join(self.directory, names[-1]) if names else None

    def restore(self, path: str, target: Any) -> Any:
        return self._ckpt.restore(path, target)
