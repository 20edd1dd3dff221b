"""Fused Pallas TPU kernel for Multi-Head Geodesic Self-Attention.

Fuses the whole score path of reference hyptransformerlib.py:251-305 —
row-normalize → Gram (MXU) → clip → acos → negate → (+mask) → softmax →
weights·V (MXU) — into one VMEM-resident kernel, with a custom VJP whose
backward recomputes the score matrix instead of materializing it to HBM
(flash-attention-style recompute; the O(L·S) intermediate never leaves VMEM).

Orientation: the kernel always computes ``scores[i,j] = -acos(q̂_i · k̂_j)``
with softmax over j. The reference's transposed square-case orientation
(quirk Q3) is the SAME program with q and k swapped — handled by the caller
(`sttode_tpu.nn.attention` routes through :func:`fused_geodesic_attention`).

Numerics: all accumulation in fp32 (``preferred_element_type``) — the acos
gradient ~(1-g²)^(-1/2) amplifies Gram error near ±1, so bf16 Gram passes are
not acceptable here (same reasoning as manifolds.oblique.inner). The clip
constant matches the reference's EPS table (oblique.py:7).

Backward math (derived, not traced):
    dv  = pᵀ·do
    dp  = do·vᵀ
    ds  = p ⊙ (dp - rowsum(dp ⊙ p))          (softmax VJP)
    dg  = ds ⊙ 1/√(1-g²) ⊙ 1{|g| < 1-ε}      (-acos VJP incl. clip gate)
    dq̂ = dg·k̂ ;  dk̂ = dgᵀ·q̂
    dq  = (dq̂ - q̂ ⊙ rowsum(dq̂ ⊙ q̂)) / ‖q‖   (row-normalize VJP), dk analog.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-4            # fp32 acos clip (reference core/manifolds/oblique.py:7)
NORM_FLOOR = 1e-12
NEG_INF = -1e30

_LANE = 128
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _normalize_rows(x):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, NORM_FLOOR), norm


# acos is not lowerable inside Pallas TPU kernels (no inverse-trig primitives
# in the Mosaic lowering) — evaluate it from primitives that are: the classical
# Abramowitz & Stegun 4.4.46 minimax polynomial, |error| ≤ 2e-8 on [0, 1]:
#   acos(x) = sqrt(1-x) · Σ a_i x^i   (x ≥ 0),  acos(x) = π - acos(-x) (x < 0)
_ACOS_COEFFS = (1.5707963050, -0.2145988016, 0.0889789874, -0.0501743046,
                0.0308918810, -0.0170881256, 0.0066700901, -0.0012624911)


def _acos(x):
    ax = jnp.abs(x)
    p = jnp.full_like(ax, _ACOS_COEFFS[-1])
    for c in _ACOS_COEFFS[-2::-1]:
        p = p * ax + c
    r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
    return jnp.where(x >= 0, r, jnp.pi - r)


def _scores(qn, kn):
    g = jax.lax.dot_general(qn, kn, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    gc = jnp.clip(g, -1.0 + EPS, 1.0 - EPS)
    return g, gc, -_acos(gc)


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    """One (batch·head, q-tile) program: full-S fused attention row block."""
    q = q_ref[0]                      # [TL, Dh]
    k = k_ref[0]                      # [S, Dh]
    v = v_ref[0]                      # [S, Dh]
    qn, _ = _normalize_rows(q)
    kn, _ = _normalize_rows(k)
    _, _, s = _scores(qn, kn)         # [TL, S]
    s = s + mask_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref):
    """Recompute scores, apply the derived VJP chain. One program per
    batch·head (full L×S block — model-scale L,S stay VMEM-resident)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    qn, q_norm = _normalize_rows(q)
    kn, k_norm = _normalize_rows(k)
    g, gc, s = _scores(qn, kn)
    s = s + mask_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)           # [L, S]

    dv_ref[0] = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    inside = jnp.abs(g) < (1.0 - EPS)
    dg = jnp.where(inside, ds * jax.lax.rsqrt(
        jnp.maximum(1.0 - gc * gc, 1e-12)), 0.0)         # [L, S]
    dqn = jax.lax.dot_general(dg, kn, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dkn = jax.lax.dot_general(dg, qn, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dq_ref[0] = (dqn - qn * jnp.sum(dqn * qn, axis=-1, keepdims=True)) / \
        jnp.maximum(q_norm, NORM_FLOOR)
    dk_ref[0] = (dkn - kn * jnp.sum(dkn * kn, axis=-1, keepdims=True)) / \
        jnp.maximum(k_norm, NORM_FLOOR)


def _pad_inputs(q, k, v, mask):
    """Pad (L, S, Dh) to hardware tiles; padded S columns get -inf mask."""
    B, L, Dh = q.shape
    S = k.shape[1]
    Lp = _round_up(L, _SUBLANE)
    Sp = _round_up(S, _LANE)
    Dp = _round_up(Dh, _LANE)

    qp = jnp.zeros((B, Lp, Dp), jnp.float32).at[:, :L, :Dh].set(q)
    kp = jnp.zeros((B, Sp, Dp), jnp.float32).at[:, :S, :Dh].set(k)
    vp = jnp.zeros((B, Sp, Dp), jnp.float32).at[:, :S, :Dh].set(v)
    mp = jnp.full((B, Lp, Sp), NEG_INF, jnp.float32)
    base = jnp.zeros((B, L, S), jnp.float32) if mask is None else \
        jnp.broadcast_to(mask, (B, L, S)).astype(jnp.float32)
    mp = mp.at[:, :L, :S].set(base)
    return qp, kp, vp, mp, (L, S, Dh, Lp, Sp, Dp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_core(q, k, v, mask, interpret):
    out, _ = _fused_fwd(q, k, v, mask, interpret)
    return out


def _pallas_fwd(qp, kp, vp, mp, dims, interpret):
    B = qp.shape[0]
    L, S, Dh, Lp, Sp, Dp = dims
    tile_l = min(Lp, 256)
    grid = (B, Lp // tile_l)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_l, Dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, Dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, Dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_l, Sp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_l, Dp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lp, Dp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Lp * Sp * (2 * Dp + 1),
            bytes_accessed=4 * B * (Lp * Dp * 2 + 2 * Sp * Dp + Lp * Sp),
            transcendentals=B * Lp * Sp,
        ),
        interpret=interpret,
    )(qp, kp, vp, mp)


def _fused_fwd(q, k, v, mask, interpret):
    qp, kp, vp, mp, dims = _pad_inputs(q, k, v, mask)
    L, S, Dh = dims[:3]
    op = _pallas_fwd(qp, kp, vp, mp, dims, interpret)
    return op[:, :L, :Dh], (q, k, v, mask)


def _fused_bwd(interpret, res, do):
    q, k, v, mask = res
    qp, kp, vp, mp, dims = _pad_inputs(q, k, v, mask)
    B = qp.shape[0]
    L, S, Dh, Lp, Sp, Dp = dims
    dop = jnp.zeros((B, Lp, Dp), jnp.float32).at[:, :L, :Dh].set(do)
    grid = (B,)
    spec_q = pl.BlockSpec((1, Lp, Dp), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, Sp, Dp), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_m = pl.BlockSpec((1, Lp, Sp), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[spec_q, spec_k, spec_k, spec_m, spec_q],
        out_specs=[spec_q, spec_k, spec_k],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lp, Dp), jnp.float32),
            jax.ShapeDtypeStruct((B, Sp, Dp), jnp.float32),
            jax.ShapeDtypeStruct((B, Sp, Dp), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, mp, dop)
    d_mask = None if mask is None else jnp.zeros_like(mask)
    return (dq[:, :L, :Dh], dk[:, :S, :Dh], dv[:, :S, :Dh], d_mask)


_fused_core.defvjp(lambda q, k, v, m, interp: _fused_fwd(q, k, v, m, interp),
                   _fused_bwd)


def fused_geodesic_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                             *, mask: jnp.ndarray | None = None,
                             interpret: bool | None = None) -> jnp.ndarray:
    """Fused MHGSA core: softmax_j(-acos(q̂_i·k̂_j) + mask)·V.

    q: [..., L, Dh], k/v: [..., S, Dh], mask additive [..., L, S] or None.
    Leading dims are flattened into the kernel grid's batch axis. fp32 only.
    ``interpret`` defaults to True off-TPU so the same code path runs (slowly,
    exactly) on the CPU test mesh.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, L, Dh = q.shape
    S = k.shape[-2]
    B = 1
    for d in lead:
        B *= d
    q3 = q.reshape(B, L, Dh).astype(jnp.float32)
    k3 = k.reshape(B, S, Dh).astype(jnp.float32)
    v3 = v.reshape(B, S, Dh).astype(jnp.float32)
    m3 = None if mask is None else \
        jnp.broadcast_to(mask, (*lead, L, S)).reshape(B, L, S)
    out = _fused_core(q3, k3, v3, m3, interpret)
    return out.reshape(*lead, L, Dh)
