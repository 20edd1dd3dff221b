"""Gromov δ-hyperbolicity estimation (reference hyptorch/delta.py — offline
analysis tool for choosing the curvature / validating that a feature space is
hyperbolic).

``delta_hyp`` is the exact O(n³) min-max computation on a distance matrix;
``batched_delta_hyp`` estimates the relative delta on random subsamples.
``features_delta`` replaces the reference's hard-wired VGG16 extractor
(delta.py:47-72) with an arbitrary feature function — no pretrained-download
dependency, works on trajectory embeddings directly.
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np


def delta_hyp(dismat: np.ndarray) -> float:
    """δ-hyperbolicity of a metric space from its distance matrix via Gromov
    products w.r.t. the basepoint 0 (reference delta.py:12-23)."""
    row = dismat[0, :][None, :]
    col = dismat[:, 0][:, None]
    gromov = 0.5 * (row + col - dismat)
    maxmin = np.max(np.minimum(gromov[:, :, None], gromov[None, :, :]), axis=1)
    return float(np.max(maxmin - gromov))


def batched_delta_hyp(X: np.ndarray, n_tries: int = 10,
                      batch_size: int = 1500,
                      rng: np.random.Generator | None = None):
    """Mean/std of diameter-relative delta over random subsamples
    (reference delta.py:26-35)."""
    if rng is None:
        rng = np.random.default_rng(0)
    vals = []
    for _ in range(n_tries):
        idx = rng.choice(len(X), min(batch_size, len(X)), replace=False)
        batch = X[idx]
        d = np.linalg.norm(batch[:, None] - batch[None, :], axis=-1)
        diam = np.max(d)
        vals.append(delta_hyp(d) / max(diam, 1e-12))
    return float(np.mean(vals)), float(np.std(vals))


def features_delta(batches: Iterable, feature_fn: Callable[[np.ndarray], np.ndarray],
                   sample: int = 1500, rng: np.random.Generator | None = None):
    """Extract features with ``feature_fn`` over ``batches``, subsample, and
    return (delta, diameter) (reference get_delta, delta.py:47-72, with the
    VGG16 extractor generalized to any callable)."""
    if rng is None:
        rng = np.random.default_rng(0)
    feats = np.concatenate([np.asarray(feature_fn(np.asarray(b)))
                            for b in batches])
    idx = rng.choice(len(feats), min(sample, len(feats)), replace=False)
    sub = feats[idx]
    d = np.linalg.norm(sub[:, None] - sub[None, :], axis=-1)
    return delta_hyp(d), float(np.max(d))
