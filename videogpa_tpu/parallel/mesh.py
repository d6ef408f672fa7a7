"""Mesh bootstrap + sharding helpers.

Axis conventions used across the framework:

- ``data``: batch / preference-pair parallelism (gradient ``pmean`` rides ICI —
  replaces Lightning DDP over NCCL, reference
  ``train/CogVideoX-I2V-5B/03_train.py:249-258``).
- ``model``: tensor parallelism for DiT/ViT attention heads and FFN shards
  (an upgrade over the reference, which has no TP — SURVEY.md §2.5).
- ``seq``: optional sequence/context parallelism for long-video attention.

The same mesh also carries the "embarrassing" data parallelism the reference
gets from multiprocessing spawn pools (scoring/encoding): those become
batch-sharded jit programs over the ``data`` axis.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    data: int = 1
    seq: int = 1
    model: int = 1

    @property
    def size(self) -> int:
        return self.data * self.seq * self.model


def make_mesh(
    axes: Optional[MeshAxes] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over the given devices.

    With ``axes=None``, all devices go to the ``data`` axis (pure DP — the
    reference's only strategy). Axis sizes must multiply to the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = MeshAxes(data=len(devices))
    if axes.size != len(devices):
        raise ValueError(
            f"mesh axes {axes} need {axes.size} devices, got {len(devices)}"
        )
    dev_array = np.asarray(devices).reshape(axes.data, axes.seq, axes.model)
    return Mesh(dev_array, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))


def shard(mesh: Mesh, *spec) -> NamedSharding:
    """NamedSharding for the given PartitionSpec entries."""
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain(x, *spec):
    """In-jit sharding constraint (no-op outside jit / without a mesh)."""
    return jax.lax.with_sharding_constraint(x, P(*spec))
