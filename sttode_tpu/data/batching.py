"""Bucketed padded scene batching — the TPU-critical data component.

The reference steps one variable-N scene at a time (batch_size=1 for ETH/SDD,
train.py:175-179) because torch tolerates dynamic shapes. Under XLA every new N
is a recompile, so scenes are padded to a small ladder of bucket sizes and
(optionally) stacked into multi-scene batches: a handful of compiled programs
total, dense [B·N_pad] tensors, validity masks carrying correctness
(SURVEY.md §7 item 5).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np

from sttode_tpu.data.preprocess import prepare_scene, stack_scenes
from sttode_tpu.models.sttode import Batch

DEFAULT_BUCKETS = (8, 16, 32, 64, 128)


def bucket_for(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    """Smallest bucket ≥ n (last bucket caps — callers subsample above it)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def scene_batches(scenes: list[dict], *, training: bool,
                  rng: np.random.Generator | None = None,
                  scenes_per_batch: int = 1,
                  buckets: Sequence[int] = DEFAULT_BUCKETS,
                  max_train_agent: int = 100, rand_rot: bool = True,
                  shuffle: bool | None = None) -> Iterator[tuple[Batch, np.ndarray]]:
    """Yield (Batch, scene_origs [B, 2]) with static per-bucket shapes.

    scenes_per_batch=1 reproduces the reference's per-scene stepping (padded);
    >1 groups same-bucket scenes into one SPMD batch (use attn_axis='agent').
    """
    if shuffle is None:
        shuffle = training
    order = np.arange(len(scenes))
    if shuffle and rng is not None:
        rng.shuffle(order)

    pending: dict[int, list] = {}
    for i in order:
        scene = scenes[i]
        n = min(len(scene["obs"]), max_train_agent) if training \
            else len(scene["obs"])
        b = bucket_for(n, buckets)
        batch, orig = prepare_scene(
            scene, training=training, rng=rng,
            max_train_agent=min(max_train_agent, buckets[-1]),
            rand_rot=rand_rot, pad_to=b)
        pending.setdefault(b, []).append((batch, orig))
        if len(pending[b]) == scenes_per_batch:
            group = pending.pop(b)
            yield (stack_scenes([g[0] for g in group]),
                   np.stack([g[1] for g in group]))
    # flush remainders (padded with repeats of the last scene would change
    # eval statistics — emit short groups as-is instead; the per-bucket
    # program count stays bounded by |buckets|·|batch sizes seen|)
    for b, group in pending.items():
        yield (stack_scenes([g[0] for g in group]),
               np.stack([g[1] for g in group]))


def compiled_shape_count(scenes: list[dict],
                         buckets: Sequence[int] = DEFAULT_BUCKETS,
                         max_train_agent: int = 100) -> dict[int, int]:
    """Diagnostic: scenes per bucket — how many XLA programs a sweep costs."""
    counts: dict[int, int] = {}
    for s in scenes:
        b = bucket_for(min(len(s["obs"]), max_train_agent), buckets)
        counts[b] = counts.get(b, 0) + 1
    return counts
