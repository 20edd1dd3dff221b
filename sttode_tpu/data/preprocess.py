"""Scene → model-Batch preparation (the reference's ``set_data`` family as pure
host-side functions).

Reference semantics (model/STTODE.py:397-486):
- train-time agent subsampling above ``max_train_agent`` uses
  ``np.random.choice`` with replacement (quirk Q6 — duplicates possible),
- scene origin = mean last-observed position over agents,
- random scene rotation about the origin (train only, continuous by default),
- velocity features: past diffs with the first step repeated; future diffs
  seeded from the last past position,
- inputs = scene-normalized positions ‖ velocities.

Everything is numpy on the host: shapes are decided here (incl. padding to a
bucket size) so the jitted device step sees static shapes only.

NBA (set_data_nba, model/STTODE.py:463-486) keeps absolute coordinates (no
scene normalization, no augmentation) — reproduced in ``prepare_nba_batch``.
"""

from __future__ import annotations

import numpy as np

from sttode_tpu.models.sttode import Batch


def rotate_2d(xy: np.ndarray, theta: float, origin: np.ndarray):
    """Rotate points about ``origin``. Returns (absolute, origin-relative)
    (reference rotation_2d_torch, model/STTODE.py:6-14)."""
    rel = xy - origin
    c, s = np.cos(theta), np.sin(theta)
    rot = np.stack([rel[..., 0] * c - rel[..., 1] * s,
                    rel[..., 0] * s + rel[..., 1] * c], axis=-1)
    return rot + origin, rot


def _velocities(past: np.ndarray, future: np.ndarray):
    past_vel = np.concatenate([past[:, 1:2] - past[:, 0:1],
                               past[:, 1:] - past[:, :-1]], axis=1)
    prev = np.concatenate([past[:, -1:], future[:, :-1]], axis=1)
    future_vel = future - prev
    return past_vel.astype(np.float32), future_vel.astype(np.float32)


def prepare_scene(scene: dict, *, training: bool,
                  rng: np.random.Generator | None = None,
                  max_train_agent: int = 100, rand_rot: bool = True,
                  pad_to: int | None = None):
    """One ETH/SDD scene dict → (Batch [B=1], scene_orig [2]).

    ``pad_to`` zero-pads the agent axis to a bucket size with a validity mask —
    the TPU-native replacement for the reference's batch_size=1 dynamic shapes
    (SURVEY.md §7 item 5)."""
    obs = np.asarray(scene["obs"], np.float32)       # [N, T_p, 2]
    pred = np.asarray(scene["pred"], np.float32)     # [N, T_f, 2]
    N = obs.shape[0]

    if training and rng is None and (N > max_train_agent or rand_rot):
        # loud, not silent: dropping the subsample/augmentation would change
        # training statistics vs the reference recipe (same contract as
        # scene_batches, which enforces this for the batched path)
        raise ValueError(
            "prepare_scene(training=True) needs an rng for agent "
            "subsampling / rotation augmentation; pass "
            "rng=np.random.default_rng(seed), or rand_rot=False with "
            f"N <= max_train_agent (got N={N}, max={max_train_agent})")

    if training and rng is not None and N > max_train_agent:
        idx = rng.choice(N, max_train_agent)          # with replacement (Q6)
        obs, pred = obs[idx], pred[idx]
        N = max_train_agent

    scene_orig = obs[:, -1].mean(axis=0)              # [2]

    if training and rand_rot and rng is not None:
        theta = rng.uniform(0.0, 2.0 * np.pi)
        obs_abs, obs_norm = rotate_2d(obs, theta, scene_orig)
        pred_abs, pred_norm = rotate_2d(pred, theta, scene_orig)
    else:
        obs_abs, obs_norm = obs, obs - scene_orig
        pred_abs, pred_norm = pred, pred - scene_orig

    past_vel, future_vel = _velocities(obs_abs, pred_abs)
    valid = np.ones((N,), np.float32)

    if pad_to is not None and pad_to < N:
        raise ValueError(f"pad_to={pad_to} smaller than agent count {N}")
    if pad_to is not None and pad_to > N:
        def pad(x):
            width = [(0, pad_to - N)] + [(0, 0)] * (x.ndim - 1)
            return np.pad(x, width)
        obs_norm, pred_norm = pad(obs_norm), pad(pred_norm)
        past_vel, future_vel, valid = pad(past_vel), pad(future_vel), pad(valid)
        N = pad_to

    batch = Batch(past=obs_norm, past_vel=past_vel, future=pred_norm,
                  future_vel=future_vel, valid=valid, batch_size=1,
                  agent_num=N)
    return batch, scene_orig


def stack_scenes(batches: list[Batch]) -> Batch:
    """Stack same-padded-size single-scene Batches into one [B·N] Batch —
    multi-scene SPMD batching, new capability over the reference's per-scene
    stepping (use with attn_axis='agent')."""
    assert len({b.agent_num for b in batches}) == 1, "pad to a common size first"
    cat = lambda xs: np.concatenate(xs, axis=0)
    return Batch(
        past=cat([b.past for b in batches]),
        past_vel=cat([b.past_vel for b in batches]),
        future=cat([b.future for b in batches]),
        future_vel=cat([b.future_vel for b in batches]),
        valid=cat([b.valid for b in batches]),
        batch_size=len(batches),
        agent_num=batches[0].agent_num,
    )


def prepare_scene_group(obs: np.ndarray, pred: np.ndarray, valid: np.ndarray,
                        *, training: bool,
                        rng: np.random.Generator | None = None,
                        rand_rot: bool = True):
    """Vectorized multi-scene preparation: the group-stacked equivalent of
    ``prepare_scene`` (same per-scene origin/rotation/velocity semantics), one
    numpy pass over [B, Np, T, 2] stacks instead of B python iterations — the
    host-side hot path when feeding the device with multi-scene batches.

    Returns (Batch [B·Np rows], scene_origs [B, 2]).
    """
    obs = np.asarray(obs, np.float32)       # [B, Np, Tp, 2]
    pred = np.asarray(pred, np.float32)     # [B, Np, Tf, 2]
    valid = np.asarray(valid, np.float32)   # [B, Np]
    B, Np = obs.shape[:2]

    denom = np.maximum(valid.sum(axis=1, keepdims=True), 1.0)       # [B, 1]
    orig = (obs[:, :, -1] * valid[..., None]).sum(axis=1) / denom   # [B, 2]

    if training and rand_rot and rng is not None:
        theta = rng.uniform(0.0, 2.0 * np.pi, size=(B,)).astype(np.float32)
        c = np.cos(theta)[:, None, None]
        s = np.sin(theta)[:, None, None]

        def rot(x):
            rel = x - orig[:, None, None, :]
            out = np.stack([rel[..., 0] * c - rel[..., 1] * s,
                            rel[..., 0] * s + rel[..., 1] * c], axis=-1)
            return out + orig[:, None, None, :], out

        obs_abs, obs_norm = rot(obs)
        pred_abs, pred_norm = rot(pred)
    else:
        obs_abs, obs_norm = obs, obs - orig[:, None, None, :]
        pred_abs, pred_norm = pred, pred - orig[:, None, None, :]

    # zero-out padded rows so downstream masked math sees clean zeros
    obs_norm = obs_norm * valid[..., None, None]
    pred_norm = pred_norm * valid[..., None, None]

    flat = lambda x: x.reshape(B * Np, *x.shape[2:])
    past_vel, future_vel = _velocities(flat(obs_abs), flat(pred_abs))
    vmask = valid.reshape(B * Np, 1, 1)
    past_vel = past_vel * vmask
    future_vel = future_vel * vmask

    batch = Batch(past=flat(obs_norm), past_vel=past_vel,
                  future=flat(pred_norm), future_vel=future_vel,
                  valid=valid.reshape(B * Np), batch_size=B, agent_num=Np)
    return batch, orig


def prepare_nba_batch(data: dict) -> Batch:
    """NBA collated dict {'past_traj': [B, N, T_p, 2], 'future_traj': ...} →
    Batch with absolute coordinates (reference set_data_nba)."""
    past = np.asarray(data["past_traj"], np.float32)
    future = np.asarray(data["future_traj"], np.float32)
    B, N = past.shape[:2]
    past = past.reshape(B * N, *past.shape[2:])
    future = future.reshape(B * N, *future.shape[2:])
    past_vel, future_vel = _velocities(past, future)
    return Batch(past=past, past_vel=past_vel, future=future,
                 future_vel=future_vel,
                 valid=np.ones((B * N,), np.float32),
                 batch_size=B, agent_num=N)
