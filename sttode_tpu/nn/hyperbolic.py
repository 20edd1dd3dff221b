"""Hyperbolic (Poincaré-ball) NN layers — the paper-level MHGSA toolbox.

Reference surface: hyptorch/nn.py (HyperbolicMLR :10-43, HypLinear :46-79,
ConcatPoincareLayer :82-99, HyperbolicDistanceLayer :102-113, ToPoincare with
feature clipping + Riemannian-gradient fix :116-168, FromPoincare :171-207).
The reference ships these wildcard-imported but with no live call sites
(SURVEY.md §2.3); here they are first-class layers in the same functional
init/apply style as the rest of ``sttode_tpu.nn`` so a Poincaré-metric MHGSA
variant can be assembled from them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sttode_tpu.manifolds import pmath
from sttode_tpu.nn import core


# --------------------------------------------------------------------------- #
# Hyperbolic multinomial logistic regression                                   #
# --------------------------------------------------------------------------- #

def hyperbolic_mlr_init(key, ball_dim: int, n_classes: int,
                        dtype=jnp.float32) -> dict:
    """a_vals/p_vals kaiming-uniform(a=√5) over [n_classes, ball_dim]
    (reference nn.py:41-43 — same distribution as torch Linear's default)."""
    k1, k2 = jax.random.split(key)
    return {
        "a_vals": core.torch_linear_weight(k1, ball_dim, n_classes,
                                           dtype=dtype).T,
        "p_vals": core.torch_linear_weight(k2, ball_dim, n_classes,
                                           dtype=dtype).T,
    }


def hyperbolic_mlr(params: dict, x: jnp.ndarray, *, c: float = 1.0) -> jnp.ndarray:
    """Softmax-classifier logits in the Poincaré ball (reference nn.py:25-34):
    p lifted via expmap0, a scaled by the conformal factor at p, then the
    hyperbolic-softmax margin logits."""
    p_ball = pmath.expmap0(params["p_vals"], c=c)
    conformal = 1.0 - c * jnp.sum(jnp.square(p_ball), axis=1, keepdims=True)
    a_ball = params["a_vals"] * conformal
    return pmath.hyperbolic_softmax(x, a_ball, p_ball, c=c)


# --------------------------------------------------------------------------- #
# Möbius linear layer                                                         #
# --------------------------------------------------------------------------- #

def hyp_linear_init(key, in_features: int, out_features: int, *,
                    bias: bool = True, dtype=jnp.float32) -> dict:
    kw, kb = jax.random.split(key)
    p = {"w": core.torch_linear_weight(kw, in_features, out_features,
                                       dtype=dtype)}
    if bias:
        p["b"] = core.torch_linear_bias(kb, in_features, out_features,
                                        dtype=dtype)
    return p


def hyp_linear(params: dict, x: jnp.ndarray, *, c: float = 1.0) -> jnp.ndarray:
    """Möbius matrix-vector product + Möbius bias, projected back to the ball
    (reference nn.py:66-75)."""
    mv = pmath.mobius_matvec(params["w"].T, x, c=c)
    if "b" not in params:
        return pmath.project(mv, c=c)
    bias = pmath.expmap0(params["b"], c=c)
    return pmath.project(pmath.mobius_add(mv, bias, c=c), c=c)


# --------------------------------------------------------------------------- #
# composition layers                                                          #
# --------------------------------------------------------------------------- #

def concat_poincare_init(key, d1: int, d2: int, d_out: int,
                         dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "l1": hyp_linear_init(k1, d1, d_out, bias=False, dtype=dtype),
        "l2": hyp_linear_init(k2, d2, d_out, bias=False, dtype=dtype),
    }


def concat_poincare(params: dict, x1: jnp.ndarray, x2: jnp.ndarray, *,
                    c: float = 1.0) -> jnp.ndarray:
    """"Concatenation" on the ball: Möbius sum of two Möbius-linear images
    (reference nn.py:95-98)."""
    return pmath.mobius_add(hyp_linear(params["l1"], x1, c=c),
                            hyp_linear(params["l2"], x2, c=c), c=c)


def hyperbolic_distance(x1: jnp.ndarray, x2: jnp.ndarray, *,
                        c: float = 1.0) -> jnp.ndarray:
    """Pointwise geodesic distance feature (reference nn.py:107-110)."""
    return pmath.dist(x1, x2, c=c, keepdims=True)


# --------------------------------------------------------------------------- #
# Euclidean ↔ ball maps                                                       #
# --------------------------------------------------------------------------- #

def to_poincare(x: jnp.ndarray, *, c: float = 1.0,
                clip_r: float | None = None,
                riemannian: bool = True,
                xp: jnp.ndarray | None = None) -> jnp.ndarray:
    """Map Euclidean features onto the ball (reference nn.py:153-165):
    optional feature-norm clipping (Guo et al. 2021), expmap0 (or expmap at a
    trainable base point ``xp``), projection, and the Riemannian gradient
    rescale ((1-c‖x‖²)²/4 on the backward pass) when ``riemannian``."""
    if clip_r is not None:
        x_norm = jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-5
        x = x * jnp.minimum(1.0, clip_r / x_norm)
    if xp is not None:
        base = pmath.project(pmath.expmap0(xp, c=c), c=c)
        out = pmath.project(pmath.expmap(base, x, c=c), c=c)
    else:
        out = pmath.project(pmath.expmap0(x, c=c), c=c)
    if riemannian:
        out = pmath.riemannian_gradient(out, c=c)
    return out


def from_poincare(x: jnp.ndarray, *, c: float = 1.0,
                  xp: jnp.ndarray | None = None) -> jnp.ndarray:
    """Map ball points back to Euclidean space via logmap (reference
    nn.py:200-203)."""
    if xp is not None:
        base = pmath.project(pmath.expmap0(xp, c=c), c=c)
        return pmath.logmap(base, x, c=c)
    return pmath.logmap0(x, c=c)
