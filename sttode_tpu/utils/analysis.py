"""Analysis toolbox: the load-bearing capabilities of the reference's legacy
``core/utils.py`` zoo, rebuilt as pure jnp functions.

The reference file has ZERO call sites (SURVEY.md §2.1 — vestigial from a
meta-learning codebase), but its analysis utilities are real capabilities a
user might reach for; this module provides TPU-friendly equivalents:

- similarity kernels (``compute_similarity``, reference core/utils.py:49-86)
- label-smoothing cross-entropy + accuracy (``smooth_one_hot``,
  ``label_smoothing_loss_acc``, reference :195-239)
- 95% confidence interval over episode metrics (reference :274-284)
- Grassmannian geodesic distance between feature matrices via SVD
  (``grassmann_distance``, reference :459-506 — its only consumer family)

Everything is jit-compatible except where noted; matmuls pin HIGHEST
precision (the similarity/SVD paths feed analysis decisions, not training
throughput).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_PRECISION = jax.lax.Precision.HIGHEST


def compute_similarity(x1: jnp.ndarray, x2: jnp.ndarray, *,
                       metric: str = "euclidean", normalize: bool = True,
                       centering: bool = True) -> jnp.ndarray:
    """Pairwise similarity [B, P, R] between x1 [B, P, M] and x2 [B, R, M]
    (reference core/utils.py:49-86).

    - "euclidean": reciprocal of the (optionally centered / M-normalized)
      squared Euclidean distance, computed via the Gram expansion
      ‖a−b‖² = ‖a‖² − 2⟨a,b⟩ + ‖b‖² (one MXU matmul, no [P,R,M] broadcast).
    - "cosine": cosine similarity of L2-normalized rows.
    - "cosine_v2": cosine rescaled to [0, 1].
    """
    if metric == "euclidean":
        if centering:
            x1 = x1 - x1.mean(axis=1, keepdims=True)
            x2 = x2 - x2.mean(axis=1, keepdims=True)
        ab = jnp.einsum("bpm,brm->bpr", x1, x2, precision=_PRECISION)
        aa = jnp.sum(x1 * x1, axis=2, keepdims=True)           # [B, P, 1]
        bb = jnp.sum(x2 * x2, axis=2)[:, None, :]              # [B, 1, R]
        distance = aa - 2.0 * ab + bb
        if normalize:
            distance = distance / x1.shape[-1]
        return 1.0 / (distance + 1e-8)
    if metric in ("cosine", "cosine_v2"):
        n1 = x1 / jnp.maximum(jnp.linalg.norm(x1, axis=-1, keepdims=True),
                              1e-12)
        n2 = x2 / jnp.maximum(jnp.linalg.norm(x2, axis=-1, keepdims=True),
                              1e-12)
        sim = jnp.einsum("bpm,brm->bpr", n1, n2, precision=_PRECISION)
        return (sim + 1.0) / 2.0 if metric == "cosine_v2" else sim
    raise NotImplementedError(metric)


def smooth_one_hot(labels: jnp.ndarray, num_classes: int,
                   smoothing: float = 0.1) -> jnp.ndarray:
    """Label-smoothed one-hot targets [N, C] (reference core/utils.py:226-239):
    confidence 1−s on the true class, s/(C−1) elsewhere."""
    assert 0.0 <= smoothing < 1.0
    off = smoothing / (num_classes - 1)
    base = jnp.full((labels.shape[0], num_classes), off)
    return base.at[jnp.arange(labels.shape[0]), labels].set(1.0 - smoothing)


def cross_entropy(logits: jnp.ndarray, one_hot_targets: jnp.ndarray) -> jnp.ndarray:
    """Mean CE against (possibly soft) targets (reference core/utils.py:195-199)."""
    logp = jax.nn.log_softmax(logits, axis=1)
    return -jnp.mean(jnp.sum(one_hot_targets * logp, axis=1))


def compute_acc(logits: jnp.ndarray, one_hot_gts: jnp.ndarray) -> jnp.ndarray:
    """Argmax accuracy against one-hot targets (reference core/utils.py:201-206)."""
    pred = jnp.argmax(logits, axis=-1)
    gts = jnp.argmax(one_hot_gts, axis=-1)
    return jnp.mean((pred == gts).astype(jnp.float32))


def label_smoothing_loss_acc(logits: jnp.ndarray, labels: jnp.ndarray,
                             num_classes: int, smoothing: float = 0.1,
                             softmaxed: bool = False):
    """(loss, accuracy) with label smoothing (reference core/utils.py:209-223)."""
    logp = jnp.log(logits) if softmaxed else jax.nn.log_softmax(logits, axis=1)
    targets = smooth_one_hot(labels, num_classes, smoothing)
    loss = jnp.mean(jnp.sum(-targets * logp, axis=1))
    acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
    return loss, acc


def compute_confidence_interval(data) -> tuple[float, float]:
    """(mean, ±95% CI half-width) over episode metrics
    (reference core/utils.py:274-284). Host-side numpy — this consumes
    per-episode scalars, not device tensors."""
    a = np.asarray(data, dtype=np.float64)
    m = float(a.mean())
    pm = float(1.96 * a.std() / np.sqrt(len(a)))
    return m, pm


def grassmann_distance(x1: jnp.ndarray, x2: jnp.ndarray, p: int = 5) -> jnp.ndarray:
    """Grassmannian geodesic distance between the column spaces of two
    feature matrices [N, M] (reference core/utils.py:477-494): principal
    p-dim subspaces via SVD, plus a spectrum term.

    distance = mean((s1 − s2)²) + mean(σ(U2ᵀ U1)²) where σ are the singular
    values of the p-basis overlap — the reference's exact recipe, including
    its (unconventional) additive combination. fp32 on device; jit-safe
    (jnp.linalg.svd lowers to XLA).
    """
    u1, s1, _ = jnp.linalg.svd(x1, full_matrices=False)
    u2, s2, _ = jnp.linalg.svd(x2, full_matrices=False)
    overlap = jnp.matmul(u2[:, :p].T, u1[:, :p],
                         precision=_PRECISION)               # [p, p]
    s = jnp.linalg.svd(overlap, compute_uv=False)
    return jnp.mean((s1 - s2) ** 2) + jnp.mean(s * s)
