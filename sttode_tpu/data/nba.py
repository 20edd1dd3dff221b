"""NBA SportVU dataset (L5).

Reference data/dataloader_nba.py:20-61: ``train.npy`` / ``test.npy`` of shape
[S, seq_len, N=11, 2] in feet, converted to meters by ÷(94/28), capped at
32500 train / 12500 test samples. Emitted here as dense arrays
[S, N, seq_len, 2] ready for fixed-shape SPMD batching (the shapes are static —
the TPU-friendly case)."""

from __future__ import annotations

import os

import numpy as np

FEET_TO_METERS = 94.0 / 28.0   # court feet → meters divisor
TRAIN_CAP = 32500
TEST_CAP = 12500


def load_nba(data_dir: str, *, obs_len: int = 5, pred_len: int = 10,
             training: bool = True, cap: int | None = None):
    """Returns (past [S, N, obs_len, 2], future [S, N, pred_len, 2]) meters."""
    fname = "train.npy" if training else "test.npy"
    trajs = np.load(os.path.join(data_dir, fname)).astype(np.float32)
    trajs = trajs / FEET_TO_METERS
    if cap is None:
        cap = TRAIN_CAP if training else TEST_CAP
    trajs = trajs[:cap]
    # stored [S, seq_len, N, 2] → agent-major [S, N, seq_len, 2]
    trajs = np.transpose(trajs, (0, 2, 1, 3))
    return trajs[:, :, :obs_len], trajs[:, :, obs_len:obs_len + pred_len]


def nba_batches(past: np.ndarray, future: np.ndarray, batch_size: int, *,
                rng: np.random.Generator | None = None, drop_last: bool = True):
    """Yield dict batches {'past_traj': [B, N, T_p, 2], 'future_traj': ...}
    (the reference seq_collate contract, data/dataloader_nba.py:7-18)."""
    S = past.shape[0]
    order = np.arange(S)
    if rng is not None:
        rng.shuffle(order)
    end = S - (S % batch_size) if drop_last else S
    for i in range(0, end, batch_size):
        idx = order[i:i + batch_size]
        yield {"past_traj": past[idx], "future_traj": future[idx],
               "seq": "nba"}
