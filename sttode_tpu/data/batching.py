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

from sttode_tpu.data.preprocess import prepare_scene_group
from sttode_tpu.models.sttode import Batch

DEFAULT_BUCKETS = (8, 16, 32, 64, 128)


def bucket_for(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    """Smallest bucket ≥ n. Beyond the ladder (eval never subsamples), extend
    by multiples of the largest bucket so huge scenes still get a valid padded
    shape instead of a broadcast crash."""
    for b in buckets:
        if n <= b:
            return b
    top = buckets[-1]
    return ((n + top - 1) // top) * top


def _emit_group(group: list[dict], bucket: int, *, training: bool,
                rng, rand_rot: bool, compat: str = "tpu"):
    """Stack raw scenes of one bucket and run the vectorized preparation
    (one numpy pass for origin/rotation/velocities — the host hot path)."""
    B = len(group)
    obs = np.zeros((B, bucket) + group[0]["obs"].shape[1:], np.float32)
    pred = np.zeros((B, bucket) + group[0]["pred"].shape[1:], np.float32)
    valid = np.zeros((B, bucket), np.float32)
    for j, s in enumerate(group):
        n = s["obs"].shape[0]
        obs[j, :n] = s["obs"]
        pred[j, :n] = s["pred"]
        valid[j, :n] = 1.0
    if compat == "reference" and B > 1:
        # Under reference compat the model DROPS attention masks (quirk Q2)
        # and attends over the scene axis (Q4): with B > 1 the grouped
        # scenes CROSS-ATTEND (the reference's ETH/SDD protocol steps one
        # scene at a time) and any padded agent slot of one scene enters the
        # softmax of every other scene's token for that slot — numerics
        # silently diverge from the reference whether or not the bucket is
        # exactly full. (B == 1 padded is safe: softmax over a single scene
        # token, and the losses mask padded rows.)
        raise ValueError(
            "compat='reference' with scenes_per_batch>1 "
            f"(bucket {bucket}, fills {[len(s['obs']) for s in group]}): "
            "grouped scenes cross-attend on the maskless scene axis and "
            "padded agents would leak into its softmax — reference ETH/SDD "
            "numerics are per-scene. Use compat='tpu' with "
            "attn_axis='agent', or scenes_per_batch=1.")
    return prepare_scene_group(obs, pred, valid, training=training, rng=rng,
                               rand_rot=rand_rot)


def scene_batches(scenes: list[dict], *, training: bool,
                  rng: np.random.Generator | None = None,
                  scenes_per_batch: int = 1,
                  buckets: Sequence[int] = DEFAULT_BUCKETS,
                  max_train_agent: int = 100, rand_rot: bool = True,
                  shuffle: bool | None = None,
                  compat: str = "tpu") -> Iterator[tuple[Batch, np.ndarray]]:
    """Yield (Batch, scene_origs [B, 2]) with static per-bucket shapes.

    scenes_per_batch=1 reproduces the reference's per-scene stepping (padded);
    >1 groups same-bucket scenes into one SPMD batch (use attn_axis='agent').

    ``compat`` enables the reference-faithfulness guard: 'reference' +
    scenes_per_batch>1 + a padded group is a hard error (padded agents would
    leak into the maskless scene-axis softmax — quirks Q2/Q4)."""
    if training and rng is None:
        raise ValueError("scene_batches(training=True) needs an rng — "
                         "shuffling, augmentation, and agent subsampling all "
                         "draw from it (silently skipping them would change "
                         "training statistics)")
    if shuffle is None:
        shuffle = training
    if shuffle and rng is None:
        raise ValueError("shuffle=True needs an rng (silently yielding "
                         "dataset order would defeat the explicit request)")
    order = np.arange(len(scenes))
    if shuffle:
        rng.shuffle(order)

    # the reference cap semantics exactly: subsample above max_train_agent;
    # the bucket ladder extends as needed (bucket_for), so no silent re-cap
    cap = max_train_agent
    pending: dict[int, list] = {}
    for i in order:
        scene = scenes[i]
        n = scene["obs"].shape[0]
        if training and n > cap:
            # quirk Q6: subsample WITH replacement above the cap
            idx = rng.choice(n, cap)
            scene = {"obs": scene["obs"][idx], "pred": scene["pred"][idx]}
            n = cap
        b = bucket_for(n, buckets)
        pending.setdefault(b, []).append(scene)
        if len(pending[b]) == scenes_per_batch:
            yield _emit_group(pending.pop(b), b, training=training, rng=rng,
                              rand_rot=rand_rot, compat=compat)
    # flush remainders (padded with repeats of the last scene would change
    # eval statistics — emit short groups as-is instead; the per-bucket
    # program count stays bounded by |buckets|·|batch sizes seen|)
    for b, group in pending.items():
        yield _emit_group(group, b, training=training, rng=rng,
                          rand_rot=rand_rot, compat=compat)


def compiled_shape_count(scenes: list[dict],
                         buckets: Sequence[int] = DEFAULT_BUCKETS,
                         max_train_agent: int = 100, *,
                         training: bool = True) -> dict[int, int]:
    """Diagnostic: scenes per bucket — how many XLA programs a sweep costs.
    ``training=False`` skips the subsampling cap (eval never subsamples, so
    oversized scenes land in extended buckets)."""
    counts: dict[int, int] = {}
    for s in scenes:
        n = len(s["obs"])
        if training:
            n = min(n, max_train_agent)
        b = bucket_for(n, buckets)
        counts[b] = counts.get(b, 0) + 1
    return counts
