"""Data pipelines (L5): ETH-UCY / SDD / NBA loaders, scene preparation, and
bucketed padded batching for SPMD."""

from sttode_tpu.data.batching import (
    DEFAULT_BUCKETS,
    bucket_for,
    compiled_shape_count,
    scene_batches,
)
from sttode_tpu.data.eth_ucy import load_eth_ucy, poly_fit_nonlinear
from sttode_tpu.data.nba import load_nba, nba_batches
from sttode_tpu.data.preprocess import (
    prepare_nba_batch,
    prepare_scene,
    rotate_2d,
    stack_scenes,
)
from sttode_tpu.data.sdd import load_sdd

__all__ = [
    "DEFAULT_BUCKETS", "bucket_for", "compiled_shape_count", "scene_batches",
    "load_eth_ucy", "poly_fit_nonlinear", "load_nba", "nba_batches",
    "prepare_nba_batch", "prepare_scene", "rotate_2d", "stack_scenes",
    "load_sdd",
]
