"""Evaluation harness (reference test.py / test_sampler.py eval loops).

Best-of-K min-ADE/FDE over scene sweeps, and the NBA horizon table (per-0.4s
prefix errors with the reference's 1s/3s adjacent-prefix averaging,
test.py:495-588). The 20-sample decode AND the best-of-K reductions run
inside one jitted dispatch per bucket shape (``device_reduce=True``); the
host-numpy path remains as the tested oracle.
"""

from __future__ import annotations

import functools
from typing import Iterable

import numpy as np
import jax

from sttode_tpu.data.batching import scene_batches
from sttode_tpu.data.preprocess import prepare_nba_batch
from sttode_tpu.models.sttode import (
    Batch, STTODEConfig, sttode_inference,
)
from sttode_tpu.utils.metrics import AverageMeter, compute_ade, compute_fde, \
    count_miss_samples


@functools.partial(jax.jit, static_argnames=("cfg", "sample_k"))
def _infer(params, cfg: STTODEConfig, batch: Batch, key, sample_k: int):
    return sttode_inference(params, cfg, batch, key, sample_k=sample_k)


@functools.partial(jax.jit, static_argnames=("cfg", "sample_k"))
def _infer_and_reduce(params, cfg: STTODEConfig, batch: Batch, key,
                      sample_k: int, miss_threshold: float):
    """Best-of-K decode AND the min/ADE/FDE reduction in one device dispatch
    (round-1 VERDICT item 8 — the host loop shipped only K·M·T floats less).

    Scene origins cancel in pred−gt (both sides get +orig), so the reduction
    is origin-free. Returns per-batch sums masked by validity:
    (Σ ade, Σ fde, Σ missed, Σ valid)."""
    import jax.numpy as jnp

    preds = sttode_inference(params, cfg, batch, key, sample_k=sample_k)
    err = jnp.linalg.norm(preds - batch.future[None], axis=-1)   # [K, M, T]
    ade_per = jnp.min(jnp.mean(err, axis=-1), axis=0)            # [M]
    fde_per = jnp.min(err[..., -1], axis=0)                      # [M]
    v = batch.valid
    return (jnp.sum(ade_per * v), jnp.sum(fde_per * v),
            jnp.sum((fde_per > miss_threshold) * v), jnp.sum(v))


def evaluate_scenes(params, cfg: STTODEConfig, scenes: list[dict], key, *,
                    sample_k: int = 20, scenes_per_batch: int = 1,
                    miss_threshold: float = 1.0,
                    device_reduce: bool = True) -> dict:
    """ETH/SDD protocol: per-scene best-of-K ADE/FDE averaged per agent
    (reference test.py:163-208). Returns {'ade', 'fde', 'miss_rate', 'agents'}.

    ``device_reduce=True`` (default) runs the best-of-K min/mean reductions
    inside the jitted dispatch; False keeps the host-numpy path — the oracle
    the device path is tested against (tests/test_evaluation.py)."""
    if device_reduce:
        # accumulate DEVICE scalars and materialize once after the loop —
        # a float() per batch would host-sync every dispatch and serialize
        # the loop (same rationale as train_epoch's metric accumulation)
        ade_s = fde_s = miss_s = n_s = None
        for batch, _origs in scene_batches(scenes, training=False,
                                           scenes_per_batch=scenes_per_batch,
                                           compat=cfg.compat):
            key, sub = jax.random.split(key)
            a, f, m, n = _infer_and_reduce(params, cfg, batch, sub, sample_k,
                                           miss_threshold)
            if ade_s is None:
                ade_s, fde_s, miss_s, n_s = a, f, m, n
            else:
                ade_s, fde_s, miss_s, n_s = (ade_s + a, fde_s + f,
                                             miss_s + m, n_s + n)
        if ade_s is None:
            return {"ade": 0.0, "fde": 0.0, "miss_rate": 0.0, "agents": 0}
        n_f = max(float(n_s), 1.0)
        return {"ade": float(ade_s) / n_f, "fde": float(fde_s) / n_f,
                "miss_rate": float(miss_s) / n_f, "agents": int(n_f)}

    ade_m, fde_m = AverageMeter(), AverageMeter()
    missed, total = 0, 0
    for batch, origs in scene_batches(scenes, training=False,
                                      scenes_per_batch=scenes_per_batch,
                                      compat=cfg.compat):
        key, sub = jax.random.split(key)
        preds = np.asarray(_infer(params, cfg, batch, sub, sample_k))
        K, M, T, _ = preds.shape
        B, N = batch.batch_size, batch.agent_num
        # re-add each scene's origin (reference inference tail,
        # model/STTODE.py:621-623)
        preds = preds.reshape(K, B, N, T, 2) + origs[None, :, None, None, :]
        gt = np.asarray(batch.future).reshape(B, N, T, 2) + \
            origs[:, None, None, :]
        valid = np.asarray(batch.valid).reshape(B, N)
        pred_nk = np.transpose(preds, (1, 2, 0, 3, 4))     # [B, N, K, T, 2]
        for b in range(B):
            v = valid[b]
            n_real = int(v.sum())
            if n_real == 0:
                continue
            ade = compute_ade(pred_nk[b], gt[b], v)
            fde = compute_fde(pred_nk[b], gt[b], v)
            ade_m.update(ade, n=n_real)
            fde_m.update(fde, n=n_real)
            real = v > 0
            missed += count_miss_samples(pred_nk[b][real], gt[b][real],
                                         miss_threshold)
            total += n_real
    return {"ade": ade_m.avg, "fde": fde_m.avg,
            "miss_rate": missed / max(total, 1), "agents": total}


@functools.partial(jax.jit, static_argnames=("cfg", "sample_k"))
def _infer_and_reduce_nba(params, cfg: STTODEConfig, batch: Batch, key,
                          sample_k: int, traj_scale: float):
    """Device-side NBA horizon reduction (round-2 VERDICT item 9): the
    20-sample decode AND every per-horizon best-of-K min/mean collapse run in
    ONE dispatch; the host receives 2·T scalars instead of K·M·T floats.
    Returns (avg[T], dest[T]) — per-horizon prefix-ADE and step-FDE means
    over agents, matching the host-numpy oracle loop below."""
    import jax.numpy as jnp

    T = cfg.future_length
    preds = sttode_inference(params, cfg, batch, key, sample_k=sample_k)
    d = jnp.linalg.norm(preds - batch.future[None], axis=-1) * traj_scale
    d = jnp.transpose(d, (1, 0, 2))                          # [M, K, T]
    # prefix means d[:, :, :t+1].mean(-1) for all t at once via cumsum
    prefix = jnp.cumsum(d, axis=-1) / jnp.arange(1, T + 1)   # [M, K, T]
    avg = jnp.mean(jnp.min(prefix, axis=1), axis=0)          # [T]
    dest = jnp.mean(jnp.min(d, axis=1), axis=0)              # [T]
    return avg, dest


def evaluate_nba(params, cfg: STTODEConfig, batches: Iterable[dict], key, *,
                 sample_k: int = 20, traj_scale: float = 1.0,
                 device_reduce: bool = True) -> dict:
    """NBA horizon table (reference test_model_all, test.py:495-588): per-agent
    best-of-K prefix ADE / step FDE at each 0.4s horizon; 1.0s/3.0s reported as
    the mean of the two adjacent prefixes.

    ``device_reduce=True`` (default) runs the per-horizon reductions inside
    the jitted dispatch; False keeps the host-numpy loop — the oracle the
    device path is locked against (tests/test_evaluation.py)."""
    T = cfg.future_length
    if T != 10:
        raise ValueError(
            f"evaluate_nba assumes the NBA protocol: 10 prediction steps at "
            f"0.4 s (horizon rows 1.0s-4.0s index that grid); got "
            f"future_length={T}")
    avg_acc = np.zeros(T)
    dest_acc = np.zeros(T)
    n_scenes = 0
    if device_reduce:
        # accumulate device values; materialize once after the loop
        pairs = []
        weights = []
        for data in batches:
            batch = prepare_nba_batch(data)
            batch = jax.tree_util.tree_map(jax.numpy.asarray, batch)
            key, sub = jax.random.split(key)
            pairs.append(_infer_and_reduce_nba(params, cfg, batch, sub,
                                               sample_k, float(traj_scale)))
            weights.append(batch.batch_size)
            n_scenes += batch.batch_size
        for (avg, dest), B in zip(pairs, weights):
            avg_acc += np.asarray(avg) * B
            dest_acc += np.asarray(dest) * B
    else:
        for data in batches:
            batch = prepare_nba_batch(data)
            batch = jax.tree_util.tree_map(jax.numpy.asarray, batch)
            key, sub = jax.random.split(key)
            preds = np.asarray(_infer(params, cfg, batch, sub, sample_k))
            preds = np.transpose(preds, (1, 0, 2, 3)) * traj_scale
            gt = np.asarray(batch.future) * traj_scale          # [M, T, 2]
            d = np.linalg.norm(preds - gt[:, None], axis=-1)    # [M, K, T]
            B = batch.batch_size
            for t in range(T):
                avg_acc[t] += d[:, :, :t + 1].mean(-1).min(-1).mean() * B
                dest_acc[t] += d[:, :, t].min(-1).mean() * B
            n_scenes += B
    avg = avg_acc / max(n_scenes, 1)
    dest = dest_acc / max(n_scenes, 1)
    return {
        "ade": {"1.0s": (avg[1] + avg[2]) / 2, "2.0s": avg[4],
                "3.0s": (avg[6] + avg[7]) / 2, "4.0s": avg[T - 1]},
        "fde": {"1.0s": (dest[1] + dest[2]) / 2, "2.0s": dest[4],
                "3.0s": (dest[6] + dest[7]) / 2, "4.0s": dest[T - 1]},
        "scenes": n_scenes,
    }
