"""Poincaré-ball math toolbox (constant negative curvature c).

TPU-native re-derivation of the reference's hyperbolic functional API
(/root/reference/hyptorch/pmath.py:16-505). This is the paper-level framing of
Multi-Head Geodesic Self-Attention; the live reference attention path uses the
Oblique manifold, but the full ball toolbox ships as a first-class capability.

Design notes (vs the torch original):
- ``artanh`` / ``arsinh`` are ``jax.custom_vjp`` primitives whose backward rule
  matches the reference's hand-written autograd (pmath.py:16-27,51-60): the
  cotangent is divided by ``1 - x²`` (resp. ``sqrt(1 + x²)``) of the *clamped*
  input, which keeps gradients finite at the clamp boundary instead of zeroing
  them the way a clip-composition would.
- ``riemannian_gradient`` reproduces RiemannianGradient (pmath.py:30-45):
  identity forward, backward scaled by ``(1 - c‖x‖²)²/4`` (the inverse squared
  conformal factor) so Euclidean optimizers take Riemannian steps.
- Stability constants are identical to the reference (quirk Q9): artanh clamp
  ``±(1 - 1e-5)``, Möbius denominator ``+1e-5``, norm floors ``1e-5``, ball
  projection radius ``(1 - 1e-3)/√c``.
- Everything is pure jnp over the trailing dim; `c` may be a python float or a
  traced scalar.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_BALL_EPS = 1e-3      # projection margin (reference pmath.py:101)
_NORM_MIN = 1e-5      # norm floors (reference pmath.py:99,270,302)
_DENOM_EPS = 1e-5     # Möbius denominator guard (reference pmath.py:177)
_TANH_CLAMP = 15.0    # tanh input clamp (reference pmath.py:11-12)


def tanh(x: jnp.ndarray) -> jnp.ndarray:
    """tanh with input clamped to ±15 (reference pmath.py:11-12)."""
    return jnp.tanh(jnp.clip(x, -_TANH_CLAMP, _TANH_CLAMP))


# --------------------------------------------------------------------------- #
# Stable inverse hyperbolics with reference-matching custom gradients          #
# --------------------------------------------------------------------------- #

@jax.custom_vjp
def artanh(x: jnp.ndarray) -> jnp.ndarray:
    xc = jnp.clip(x, -1 + _NORM_MIN, 1 - _NORM_MIN)
    return 0.5 * (jnp.log1p(xc) - jnp.log1p(-xc))


def _artanh_fwd(x):
    xc = jnp.clip(x, -1 + _NORM_MIN, 1 - _NORM_MIN)
    return 0.5 * (jnp.log1p(xc) - jnp.log1p(-xc)), xc


def _artanh_bwd(xc, g):
    # reference pmath.py:24-27 — denominator uses the clamped input, so the
    # gradient saturates at ~1/(2e-5) instead of vanishing or exploding.
    return (g / (1 - xc ** 2),)


artanh.defvjp(_artanh_fwd, _artanh_bwd)


@jax.custom_vjp
def arsinh(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(jnp.maximum(x + jnp.sqrt(1 + x ** 2), _NORM_MIN))


def _arsinh_fwd(x):
    return arsinh(x), x


def _arsinh_bwd(x, g):
    # reference pmath.py:57-60
    return (g / jnp.sqrt(1 + x ** 2),)


arsinh.defvjp(_arsinh_fwd, _arsinh_bwd)


def arcosh(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """reference pmath.py:70-72 (note: keeps the reference's odd clamp to
    ±(1-eps), making this the degenerate branch — kept for API parity)."""
    xc = jnp.clip(x, -1 + eps, 1 - eps)
    return jnp.log(xc + jnp.sqrt(jnp.abs(1 + xc)) * jnp.sqrt(jnp.abs(xc - 1)))


@jax.custom_vjp
def riemannian_gradient(x: jnp.ndarray, c: float = 1.0) -> jnp.ndarray:
    return x


def _rgrad_fwd(x, c):
    return x, (x, c)


def _rgrad_bwd(res, g):
    x, c = res
    scale = (1 - c * jnp.sum(x ** 2, axis=-1, keepdims=True)) ** 2 / 4
    return (g * scale, None)


riemannian_gradient.defvjp(_rgrad_fwd, _rgrad_bwd)


# --------------------------------------------------------------------------- #
# Ball operations                                                              #
# --------------------------------------------------------------------------- #

def project(x: jnp.ndarray, *, c: float = 1.0) -> jnp.ndarray:
    """Clip points back inside the ball of radius (1-1e-3)/√c
    (reference pmath.py:76-103). Uses the grad-safe norm: `where` evaluates
    both branches' gradients, and d‖x‖/dx is NaN at x=0."""
    norm = jnp.maximum(_safe_norm(x, keepdims=True), _NORM_MIN)
    maxnorm = (1 - _BALL_EPS) / jnp.sqrt(c)
    return jnp.where(norm > maxnorm, x / norm * maxnorm, x)


def lambda_x(x: jnp.ndarray, *, c: float = 1.0, keepdims: bool = False) -> jnp.ndarray:
    """Conformal factor λ_x = 2 / (1 - c‖x‖²) (reference pmath.py:106-129)."""
    return 2 / (1 - c * jnp.sum(x ** 2, axis=-1, keepdims=keepdims))


def mobius_add(x: jnp.ndarray, y: jnp.ndarray, *, c: float = 1.0) -> jnp.ndarray:
    """Möbius addition x ⊕_c y (reference pmath.py:132-177)."""
    x2 = jnp.sum(x ** 2, axis=-1, keepdims=True)
    y2 = jnp.sum(y ** 2, axis=-1, keepdims=True)
    xy = jnp.sum(x * y, axis=-1, keepdims=True)
    num = (1 + 2 * c * xy + c * y2) * x + (1 - c * x2) * y
    denom = 1 + 2 * c * xy + c ** 2 * x2 * y2
    return num / (denom + _DENOM_EPS)


def _safe_norm(x: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    """‖x‖ with a finite gradient at x=0 (d‖x‖/dx is NaN at the origin, which
    a plain jnp.linalg.norm hits on every self-distance d(x, x))."""
    sq = jnp.sum(x * x, axis=-1, keepdims=keepdims)
    return jnp.sqrt(sq + 1e-15)


def dist(x: jnp.ndarray, y: jnp.ndarray, *, c: float = 1.0,
         keepdims: bool = False) -> jnp.ndarray:
    """Geodesic distance 2/√c·artanh(√c‖(−x)⊕y‖) (reference pmath.py:180-208)."""
    sqrt_c = c ** 0.5
    n = _safe_norm(mobius_add(-x, y, c=c), keepdims=keepdims)
    return artanh(sqrt_c * n) * 2 / sqrt_c


def dist0(x: jnp.ndarray, *, c: float = 1.0, keepdims: bool = False) -> jnp.ndarray:
    """Distance to the origin (reference pmath.py:211-234)."""
    sqrt_c = c ** 0.5
    n = _safe_norm(x, keepdims=keepdims)
    return artanh(sqrt_c * n) * 2 / sqrt_c


def expmap(x: jnp.ndarray, u: jnp.ndarray, *, c: float = 1.0) -> jnp.ndarray:
    """Exp_x(u) = x ⊕ tanh(√c λ_x ‖u‖ / 2) u/(√c‖u‖) (reference pmath.py:237-276)."""
    sqrt_c = c ** 0.5
    u_norm = jnp.maximum(_safe_norm(u, keepdims=True), _NORM_MIN)
    second = tanh(sqrt_c / 2 * lambda_x(x, c=c, keepdims=True) * u_norm) * u / (sqrt_c * u_norm)
    return mobius_add(x, second, c=c)


def expmap0(u: jnp.ndarray, *, c: float = 1.0) -> jnp.ndarray:
    """Exp_0(u) (reference pmath.py:279-304)."""
    sqrt_c = c ** 0.5
    u_norm = jnp.maximum(_safe_norm(u, keepdims=True), _NORM_MIN)
    return tanh(sqrt_c * u_norm) * u / (sqrt_c * u_norm)


def logmap(x: jnp.ndarray, y: jnp.ndarray, *, c: float = 1.0) -> jnp.ndarray:
    """Log_x(y) (reference pmath.py:307-338)."""
    sub = mobius_add(-x, y, c=c)
    sub_norm = jnp.maximum(_safe_norm(sub, keepdims=True), _NORM_MIN)
    lam = lambda_x(x, c=c, keepdims=True)
    sqrt_c = c ** 0.5
    return 2 / sqrt_c / lam * artanh(sqrt_c * sub_norm) * sub / sub_norm


def logmap0(y: jnp.ndarray, *, c: float = 1.0) -> jnp.ndarray:
    """Log_0(y) (reference pmath.py:341-368)."""
    sqrt_c = c ** 0.5
    y_norm = jnp.maximum(_safe_norm(y, keepdims=True), _NORM_MIN)
    return y / y_norm / sqrt_c * artanh(sqrt_c * y_norm)


def mobius_matvec(m: jnp.ndarray, x: jnp.ndarray, *, c: float = 1.0) -> jnp.ndarray:
    """Möbius matrix-vector product M ⊗_c x (reference pmath.py:371-408)."""
    sqrt_c = c ** 0.5
    x_norm = jnp.maximum(_safe_norm(x, keepdims=True), _NORM_MIN)
    mx = x @ m.T
    mx_norm = jnp.maximum(_safe_norm(mx, keepdims=True), _NORM_MIN)
    res = tanh(mx_norm / x_norm * artanh(sqrt_c * x_norm)) * mx / (mx_norm * sqrt_c)
    zero_mx = jnp.all(mx == 0, axis=-1, keepdims=True)
    res = jnp.where(zero_mx, jnp.zeros_like(res), res)
    return project(res, c=c)


def mobius_addition_batch(x: jnp.ndarray, y: jnp.ndarray, *, c: float = 1.0) -> jnp.ndarray:
    """All-pairs Möbius addition: x [B,D], y [C,D] → [B,C,D]
    (reference pmath.py:416-427)."""
    xy = x @ y.T                                   # [B, C]
    x2 = jnp.sum(x ** 2, axis=-1, keepdims=True)   # [B, 1]
    y2 = jnp.sum(y ** 2, axis=-1, keepdims=True)   # [C, 1]
    num = 1 + 2 * c * xy + c * y2.T                # [B, C]
    num = num[..., None] * x[:, None, :] + (1 - c * x2)[..., None] * y[None, :, :]
    denom = 1 + 2 * c * xy + c ** 2 * x2 * y2.T
    return num / (denom[..., None] + _DENOM_EPS)


def hyperbolic_softmax(x: jnp.ndarray, a: jnp.ndarray, p: jnp.ndarray,
                       c: float = 1.0) -> jnp.ndarray:
    """Hyperbolic multinomial-logistic-regression logits
    (reference pmath.py:430-437). x [B,D] points; a [K,D] normals; p [K,D]
    offsets → logits [B,K]."""
    lambda_pkc = 2 / (1 - c * jnp.sum(p ** 2, axis=1))
    k = lambda_pkc * jnp.linalg.norm(a, axis=1) / jnp.sqrt(c)
    mob = mobius_addition_batch(-p, x, c=c)                       # [K, B, D]
    num = 2 * jnp.sqrt(c) * jnp.sum(mob * a[:, None, :], axis=-1)  # [K, B]
    denom = jnp.linalg.norm(a, axis=1, keepdims=True) * (
        1 - c * jnp.sum(mob ** 2, axis=2))
    logit = k[:, None] * arsinh(num / denom)
    return logit.T


def p2k(x: jnp.ndarray, c: float = 1.0) -> jnp.ndarray:
    """Poincaré → Klein coordinates (reference pmath.py:440-442)."""
    denom = 1 + c * jnp.sum(x ** 2, axis=-1, keepdims=True)
    return 2 * x / denom


def k2p(x: jnp.ndarray, c: float = 1.0) -> jnp.ndarray:
    """Klein → Poincaré coordinates (reference pmath.py:445-447)."""
    denom = 1 + jnp.sqrt(1 - c * jnp.sum(x ** 2, axis=-1, keepdims=True))
    return x / denom


def lorenz_factor(x: jnp.ndarray, *, c: float = 1.0, axis: int = -1,
                  keepdims: bool = False) -> jnp.ndarray:
    """Lorentz factor on the Klein disk (reference pmath.py:450-469)."""
    return 1 / jnp.sqrt(1 - c * jnp.sum(x ** 2, axis=axis, keepdims=keepdims))


def poincare_mean(x: jnp.ndarray, axis: int = 0, c: float = 1.0) -> jnp.ndarray:
    """Einstein-midpoint mean via the Klein model (reference pmath.py:472-479)."""
    xk = p2k(x, c)
    lamb = lorenz_factor(xk, c=c, keepdims=True)
    mean = jnp.sum(lamb * xk, axis=axis, keepdims=True) / jnp.sum(
        lamb, axis=axis, keepdims=True)
    return jnp.squeeze(k2p(mean, c), axis=axis)


def dist_matrix(x: jnp.ndarray, y: jnp.ndarray, c: float = 1.0) -> jnp.ndarray:
    """All-pairs geodesic distance matrix [B,C] (reference pmath.py:482-493)."""
    sqrt_c = c ** 0.5
    n = jnp.linalg.norm(mobius_addition_batch(-x, y, c=c), axis=-1)
    return 2 / sqrt_c * artanh(sqrt_c * n)


def dist_matrix_gram(x: jnp.ndarray, y: jnp.ndarray, *,
                     c: float = 1.0) -> jnp.ndarray:
    """All-pairs Poincaré geodesic distance over the trailing two dims WITHOUT
    materializing the [L, S, D] Möbius sums (``dist_matrix`` /
    ``mobius_addition_batch`` build that tensor — reference pmath.py:416-427 —
    which is O(L·S·D) memory and pure VPU work).

    Derivation (Ungar's gyrodistance identity, verifiable by expanding the
    Möbius sum): with g = <x,y>, x2 = ‖x‖², y2 = ‖y‖²,

        ‖−x ⊕_c y‖² = ‖x − y‖² / den,   den = 1 − 2c·g + c²·x2·y2

    and ‖x − y‖² = x2 − 2g + y2 — one MXU Gram matmul plus an O(L·S)
    epilogue, the exact structure of the oblique acos kernel. The reference's
    ``+1e-5`` denominator convention (pmath.py:177) is reproduced as
    ``den/(den+ε)²``.

    Accuracy note (measured, fp32): recovering ‖x−y‖² from the Gram cancels
    for close pairs, so small distances carry absolute error growing toward
    the boundary — typically ~1e-3–2.5e-3 max over random near-boundary
    batches (across seeds), up to ~0.13 for artanh-saturated *coincident*
    points — where the pairs form stays ~1e-5. Post-softmax this is
    negligible: the affected entries are the already-dominant near-zero
    distances; max softmax-weight deviation vs the pairs form measured
    ≤ 5e-4 across mid-ball and saturated scales (tests lock this in). Use
    ``dist_matrix`` when exact near-coincident distances matter and [L,S,D]
    memory is affordable.

    x [..., L, D], y [..., S, D] → [..., L, S].
    """
    g = jnp.einsum("...ld,...sd->...ls", x, y,
                   precision=jax.lax.Precision.HIGHEST)
    x2 = jnp.sum(x * x, axis=-1)[..., :, None]
    y2 = jnp.sum(y * y, axis=-1)[..., None, :]
    den = 1 - 2 * c * g + c * c * x2 * y2
    n2 = jnp.maximum(x2 - 2 * g + y2, 0.0) * den / (den + _DENOM_EPS) ** 2
    n = jnp.sqrt(n2 + 1e-15)
    sqrt_c = c ** 0.5
    return 2 / sqrt_c * artanh(sqrt_c * n)


def auto_select_c(d: int) -> float:
    """Curvature giving a d-ball of constant volume π (reference pmath.py:496-505)."""
    dim2 = d / 2.0
    r = math.gamma(dim2 + 1) / (math.pi ** (dim2 - 1))
    r = r ** (1 / float(d))
    return 1 / (r ** 2)
