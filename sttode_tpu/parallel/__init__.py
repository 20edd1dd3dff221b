"""Parallelism (SPMD): mesh construction, DP/TP sharding rules, and the two
sequence-parallel attention decompositions (ring/ppermute and
Ulysses/all-to-all)."""

from sttode_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding,
    shard_batch,
)

__all__ = ["batch_sharding", "make_mesh", "param_sharding", "shard_batch"]
