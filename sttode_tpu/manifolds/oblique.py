"""Oblique manifold: product of unit spheres (rows live on S^{d-1}).

This is the metric that powers Multi-Head Geodesic Self-Attention in the live
reference path (reference core/manifolds/oblique.py:15-74; consumed by
hyptransformerlib.py:251-255). Geodesic distance between row-normalized points is
``acos(u · v)``; attention scores are its negation.

All functions are pure jnp and operate on the trailing dimension, broadcasting over
leading dims — so they vmap/pjit cleanly and can be fused by XLA or inlined into
Pallas kernels.

Stability (reference quirk Q9): the reference clamps the acos input to
``±(1 - EPS)`` with EPS = 1e-4 (fp32) / 1e-7 (fp64) (oblique.py:7,37). We keep the
same clamp; the gradient through ``jnp.clip`` is zero outside the bounds, matching
torch's ``clamp`` autograd exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Reference oblique.py:7 — dtype-dependent clamp epsilon.
EPS = {jnp.dtype(jnp.float32): 1e-4, jnp.dtype(jnp.float64): 1e-7}
# bfloat16 has ~3 decimal digits; a tighter clamp is needed to keep acos finite.
EPS[jnp.dtype(jnp.bfloat16)] = 1e-2

_NORM_FLOOR = 1e-12  # guards 0/0 on exactly-zero rows (torch reference would NaN)


def _eps(dtype) -> float:
    return EPS.get(jnp.dtype(dtype), 1e-4)


def proj(x: jnp.ndarray) -> jnp.ndarray:
    """Row-normalize onto the unit sphere (reference oblique.py:15-16)."""
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, _NORM_FLOOR)


def proj_tan(u: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Project u onto the tangent space at x: subtract the radial component
    (reference oblique.py:18-20)."""
    return u - jnp.sum(x * u, axis=-1, keepdims=True) * x


def inner(x: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray | None = None) -> jnp.ndarray:
    """Pairwise Gram matrix ``u @ v^T`` over the trailing two dims.

    NOTE: the reference intentionally returns the full [..., L, S] Gram matrix
    rather than a reduced tangent inner product (oblique.py:40-45) — `dist`
    consumes it to produce the attention score matrix in one shot.
    """
    if v is None:
        v = u
    # HIGHEST precision is load-bearing: acos'(g) ~ 1/sqrt(1-g²) near g=1, so
    # bf16-truncated MXU passes (~2e-3 Gram error) would inject ~0.06 rad of
    # noise into every self-distance. Full-precision accumulate keeps geodesic
    # scores accurate to ~1e-4 rad.
    return jnp.einsum("...ld,...sd->...ls", u, v,
                      precision=jax.lax.Precision.HIGHEST)


def dist(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Pairwise geodesic distance matrix acos(clamp(u @ v^T)).

    reference oblique.py:36-38. Inputs are assumed row-normalized (`proj`).
    Returns [..., L, S] where u is [..., L, D], v is [..., S, D].
    """
    eps = _eps(u.dtype)
    g = inner(u, u, v)
    g = jnp.clip(g, -1.0 + eps, 1.0 - eps)
    return jnp.arccos(g)


def dist_point(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Pointwise geodesic distance between matching rows: acos(<u, v>)."""
    eps = _eps(u.dtype)
    g = jnp.sum(u * v, axis=-1)
    g = jnp.clip(g, -1.0 + eps, 1.0 - eps)
    return jnp.arccos(g)


def expmap(u: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Great-circle exponential map at x with small-norm retraction fallback
    (reference oblique.py:22-27)."""
    eps = _eps(x.dtype)
    norm_u = jnp.linalg.norm(u, axis=-1, keepdims=True)
    safe_norm = jnp.maximum(norm_u, _NORM_FLOOR)
    exp = x * jnp.cos(norm_u) + (u / safe_norm) * jnp.sin(norm_u)
    return jnp.where(norm_u > eps, exp, retr(u, x))


def logmap(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of expmap: tangent vector at x pointing to y
    (reference oblique.py:29-34)."""
    eps = _eps(x.dtype)
    u = proj_tan(y - x, x)
    d = dist_point(x, y)[..., None]
    norm_u = jnp.linalg.norm(u, axis=-1, keepdims=True)
    scaled = u * d / jnp.maximum(norm_u, _NORM_FLOOR)
    return jnp.where(norm_u > eps, scaled, u)


def retr(u: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """First-order retraction: normalize(x + u) (reference oblique.py:67-68)."""
    return proj(x + u)


def retr_transp(u: jnp.ndarray, x: jnp.ndarray, v: jnp.ndarray):
    """Retract and transport v to the new point (reference oblique.py:70-74)."""
    y = retr(u, x)
    return y, proj_tan(v, y)


def ptransp(v: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Parallel transport of tangent v from x to y — projection approximation
    (reference oblique.py:60-62)."""
    return proj_tan(v, y)


def egrad2rgrad(grad: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Euclidean → Riemannian gradient: tangent projection
    (reference oblique.py:64-65)."""
    return proj_tan(grad, x)


class Oblique:
    """Thin namespace object mirroring the reference `Manifold` interface
    (reference core/manifolds/base.py:6-65) for call sites that want an object."""

    name = "Oblique"

    proj = staticmethod(proj)
    proj_tan = staticmethod(proj_tan)
    inner = staticmethod(inner)
    dist = staticmethod(dist)
    expmap = staticmethod(expmap)
    logmap = staticmethod(logmap)
    retr = staticmethod(retr)
    retr_transp = staticmethod(retr_transp)
    ptransp = staticmethod(ptransp)
    egrad2rgrad = staticmethod(egrad2rgrad)
