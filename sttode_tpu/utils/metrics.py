"""Evaluation metrics (reference utils/metrics.py) — vectorized numpy.

The reference loops per agent; these take the whole [N, K, T, 2] block at once.
Semantics identical: best-of-K min over samples of the time-averaged (ADE) or
final (FDE) L2 error, averaged over agents.
"""

from __future__ import annotations

import numpy as np


def _dists(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """pred [N, K, T, 2], gt [N, T, 2] → L2 per step [N, K, T]."""
    return np.linalg.norm(pred - gt[:, None], axis=-1)


def compute_ade(pred: np.ndarray, gt: np.ndarray,
                valid: np.ndarray | None = None) -> float:
    """min-of-K ADE averaged over (valid) agents (reference metrics.py:7-15)."""
    best = _dists(pred, gt).mean(axis=-1).min(axis=-1)      # [N]
    if valid is not None:
        return float((best * valid).sum() / max(valid.sum(), 1.0))
    return float(best.mean())


def compute_fde(pred: np.ndarray, gt: np.ndarray,
                valid: np.ndarray | None = None) -> float:
    """min-of-K FDE averaged over (valid) agents (reference metrics.py:18-26)."""
    best = _dists(pred, gt)[..., -1].min(axis=-1)           # [N]
    if valid is not None:
        return float((best * valid).sum() / max(valid.sum(), 1.0))
    return float(best.mean())


def best_sample_indices(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Per-agent argmin-ADE sample index (reference metrics.py:29-36)."""
    return _dists(pred, gt).mean(axis=-1).argmin(axis=-1)


def count_miss_samples(pred: np.ndarray, gt: np.ndarray,
                       mr_threshold: float = 1.0) -> int:
    """Agents whose best-of-K FDE exceeds the threshold
    (reference metrics.py:39-48)."""
    best_fde = _dists(pred, gt)[..., -1].min(axis=-1)
    return int((best_fde > mr_threshold).sum())


class AverageMeter:
    """Streaming weighted average (reference utils/utils.py:16-34)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)
