"""Parallelism (SPMD): mesh construction, DP/TP sharding rules, and the
sequence-parallel ring-attention demonstrator."""

from sttode_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding,
    shard_batch,
)

__all__ = ["batch_sharding", "make_mesh", "param_sharding", "shard_batch"]
