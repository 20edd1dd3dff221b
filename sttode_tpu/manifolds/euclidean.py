"""Euclidean manifold — the trivial instance of the manifold interface.

Reference core/manifolds/euclidean.py:1-74 (exported but never instantiated on the
live path; kept for API parity and as the degenerate baseline in tests: geodesic
attention on Euclidean reduces to (negated) distance attention with d(u,v)=|u-v|).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def proj(x: jnp.ndarray) -> jnp.ndarray:
    return x


def proj_tan(u: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return u


def inner(x: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray | None = None) -> jnp.ndarray:
    if v is None:
        v = u
    return jnp.einsum("...ld,...sd->...ls", u, v,
                      precision=jax.lax.Precision.HIGHEST)


def dist(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Euclidean distance matrix [..., L, S]."""
    diff = u[..., :, None, :] - v[..., None, :, :]
    return jnp.linalg.norm(diff, axis=-1)


def dist_point(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(u - v, axis=-1)


def expmap(u: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return x + u


def logmap(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return y - x


def retr(u: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return x + u


def ptransp(v: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return v


def egrad2rgrad(grad: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return grad


def mobius_add(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Degenerate Möbius addition (reference euclidean.py:46-48)."""
    return x + y


def mobius_matvec(m: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Degenerate Möbius matvec (reference euclidean.py:49-51)."""
    return x @ m.T


class Euclidean:
    name = "Euclidean"

    proj = staticmethod(proj)
    proj_tan = staticmethod(proj_tan)
    inner = staticmethod(inner)
    dist = staticmethod(dist)
    expmap = staticmethod(expmap)
    logmap = staticmethod(logmap)
    retr = staticmethod(retr)
    ptransp = staticmethod(ptransp)
    egrad2rgrad = staticmethod(egrad2rgrad)
    mobius_add = staticmethod(mobius_add)
    mobius_matvec = staticmethod(mobius_matvec)
