"""Mesh / sharding utilities — the NCCL/DDP replacement (SURVEY.md section 2.5).

The reference scales via torch DDP process groups (dino-main/utils.py:467-499)
and shards nothing else.  Here scaling is declarative: one
``jax.sharding.Mesh``, batch axes sharded on "dp", and either XLA's
auto-partitioner (jit over sharded arrays) or explicit ``shard_map`` blocks
whose collectives (all_gather over ICI) are spelled out — used for the
alpha computation where each device owns a slice of the image set.
"""

from tpu_ac.distributed.mesh import (
    get_mesh,
    dp_mesh,
    shard_batch,
    replicate,
    sharded_weight_distance_unsupervised,
    sharded_weight_distance_supervised,
    triangle_weights_local,
    multihost_init,
)

__all__ = [
    "get_mesh",
    "dp_mesh",
    "shard_batch",
    "replicate",
    "sharded_weight_distance_unsupervised",
    "sharded_weight_distance_supervised",
    "triangle_weights_local",
    "multihost_init",
]
