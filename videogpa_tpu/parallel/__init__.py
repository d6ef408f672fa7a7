"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's runtime layer (Lightning
DDP/NCCL + spawn pools, SURVEY.md §2.5): a single ``jax.sharding.Mesh`` with
named axes, parameter/activation PartitionSpecs, and XLA collectives over ICI.
"""

from videogpa_tpu.parallel.mesh import (
    MeshAxes,
    make_mesh,
    shard,
    replicate,
    constrain,
)

__all__ = ["MeshAxes", "make_mesh", "shard", "replicate", "constrain"]
