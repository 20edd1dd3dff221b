"""Fused Pallas TPU kernel for Multi-Head Geodesic Self-Attention.

Fuses the whole score path of reference hyptransformerlib.py:251-305 —
row-normalize → Gram (MXU) → clip → acos → negate → (+mask) → softmax →
weights·V — into one VMEM-resident kernel, with a custom VJP whose backward
recomputes the score matrix instead of materializing it to HBM
(flash-attention-style recompute; the O(L·S) intermediate never leaves VMEM).

Orientation: the kernel always computes ``scores[i,j] = -acos(q̂_i · k̂_j)``
with softmax over j. The reference's transposed square-case orientation
(quirk Q3) is the SAME program with q and k swapped — handled by the caller.

Numerics: Gram accumulates with ``Precision.HIGHEST`` — the acos gradient
~(1-g²)^(-1/2) amplifies Gram error near ±1, so bf16 MXU passes are not
acceptable here (same reasoning as manifolds.oblique.inner; measured 3.4e-3
output error with default precision vs 1e-5 with HIGHEST). The clip constant
matches the reference's EPS table (oblique.py:7).

HBM traffic: the unmasked path (the model's common case — quirk Q2 drops
masks) carries NO [L, S] mask array; padded key columns are disabled by an
in-kernel iota predicate, so the kernel reads only q, k, v.

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

# The kernels run a MAXLESS softmax (no running-max pass): valid because the
# geodesic scores are clamp-bounded above by 0 and below by a static constant
# (oblique ∈ [-π, 0]; poincaré ≥ -(2/√c)·artanh(1-1e-5) = -12.21/√c). The
# OPERATIVE bound is not fp32 exp underflow (~-87) but the kernels' 1e-30
# softmax-denominator floor (the all-masked-row guard): a row whose every
# valid lane sits near the score bound has denominator ≈ S·e^{-12.21/√c},
# and once that drops under the floor the weights stop summing to 1 and the
# output silently shrinks (measured 26× too small at c=0.025 with all keys
# at the artanh clamp). Require e^{-12.21/√c} ≥ 1e-30 ⇔ 12.21/√c ≤ 69.08
# ⇔ c ≥ 0.03124; enforced with margin here. Callers wanting more extreme
# negative curvature route to the jnp/XLA dense path, which keeps the
# classic max-subtracted softmax. Additive masks cannot break the bound:
# _canonicalize_mask row-max-shifts finite entries, so each row's BEST lane
# enters exp with mask contribution 0 — i.e. at its raw score, which the
# curvature guard keeps above the floor — and that lane alone keeps the
# row's denominator alive no matter how negative the other (floored,
# ≈1e-13-weight) lanes go.
MIN_MAXLESS_CURVATURE = 0.032


def _canonicalize_mask(m: jnp.ndarray) -> jnp.ndarray:
    """Make an arbitrary additive mask safe for the maxless in-kernel softmax
    (see the MASK CONTRACT in fused_geodesic_attention): subtract the per-row
    max of the finite entries (softmax-invariant — positive biases and large
    uniform penalties become exact, and every finite lane lands ≤ 0), floor
    the remainder at -30, and preserve the ≤ -1e29 exclusion sentinel as
    NEG_INF. All intermediates are finite (no ±inf), so gradients into a
    differentiable mask stay NaN-free; the floor's zero-gradient region only
    covers lanes already at ≤ 1e-13 relative weight."""
    m = m.astype(jnp.float32)
    finite = m > -1e29
    # -3e38 stands in for "excluded" inside the max: finite (no inf-grads),
    # and smaller than any representable penalty a caller could pass
    row_max = jnp.max(jnp.where(finite, m, jnp.float32(-3e38)),
                      axis=-1, keepdims=True)
    any_finite = jnp.any(finite, axis=-1, keepdims=True)
    row_max = jnp.where(any_finite, row_max, 0.0)
    # lower bound only: shifted ≤ 0 by construction for the finite lanes
    # (their row max was just subtracted), and an upper clamp at 0 would sit
    # exactly ON the row-max lane's value, where min's tie-splitting halves
    # the mask cotangent vs the dense softmax's
    shifted = jnp.maximum(jnp.where(finite, m, 0.0) - row_max, -30.0)
    return jnp.where(finite, shifted, NEG_INF)


def _check_maxless_bounds(metric: str, curvature: float) -> None:
    if metric == "poincare" and curvature < MIN_MAXLESS_CURVATURE:
        raise ValueError(
            f"Pallas MHGSA kernels require curvature >= "
            f"{MIN_MAXLESS_CURVATURE} for metric='poincare': their maxless "
            f"softmax relies on the score lower bound -12.21/sqrt(c) staying "
            f"above the 1e-30 denominator floor (got c={curvature}). Use the dense "
            f"route (fused=False / attn_impl='dense') for smaller curvature.")

_LANE = 128
_SUBLANE = 8
_PRECISION = jax.lax.Precision.HIGHEST


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


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_PRECISION)


# The FLASH kernels run their matmuls through a compensated 3-pass bf16
# split instead of HIGHEST's 6 passes: hi·hi + hi·lo + lo·hi (only the
# O(2^-16)-relative lo·lo term is dropped), each pass at DEFAULT precision.
# Round-4 adoption measurement (scripts/flash_gram_ab.py, 4096²·B8, 5
# alternating rounds): fwd ×1.211 / f+b ×1.199 vs HIGHEST, fwd error vs an
# fp64 oracle 6.2e-6 (HIGHEST: 1.8e-6; both 16×+ inside the EPS=1e-4 acos
# clamp granularity), grads within 1.2e-5 of HIGHEST. The fused/packed
# kernels KEEP HIGHEST: they are VPU-epilogue-bound at their routed shapes
# and the same swap measured a wash there (round-2 notes, 512²/1024²).
# EXCEPTION — the poincaré SCORE-path Gram stays HIGHEST: its epilogue
# subtracts 2g from x²+y² (catastrophic cancellation for nearby points)
# and artanh's clamp bounds amplification only at 1/(2·ARTANH_EPS)=5e4
# vs acos's ≈70. Measured on-chip at 1024²·B2 vs the XLA-HIGHEST oracle
# (max-abs error / max|output|): shipped split 5.6e-4, score-Gram also
# 3-pass 7.9e-4 — a ×1.4 error increase for one matmul's speedup, on a
# path where the baseline error is already dominated by the kernel's
# artanh/exp recompute, so the conservative route costs ~nothing.
# Value/cotangent-side matmuls (p·V, dV, dP, dg·K propagation) are
# plain linear maps and take the 3-pass route for both metrics.
FLASH_GRAM_3PASS = True


def _dot3(a, b, dims):
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(x, y, (dims, ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _fdot(a, b, dims):
    """Matmul implementation for the flash kernels (see FLASH_GRAM_3PASS)."""
    return _dot3(a, b, dims) if FLASH_GRAM_3PASS else _dot(a, b, dims)


def _scores(qn, kn, s_real: int, col_offset: int = 0, dot=None):
    """Normalized-input Gram → clipped acos scores; padded key columns are
    disabled by the GLOBAL column index (``col_offset`` positions the block
    inside the full S axis for S-tiled callers) without a materialized mask."""
    g = (dot or _dot)(qn, kn, ((1,), (1,)))
    gc = jnp.clip(g, -1.0 + EPS, 1.0 - EPS)
    s = -_acos(gc)
    col = col_offset + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < s_real, s, NEG_INF)
    return g, gc, s


def _normalize_rows_vjp(dxn, xn, norm):
    """VJP of row-normalization x ↦ x/max(‖x‖, floor) given the cotangent on
    the normalized rows, the normalized rows, and the row norms."""
    return (dxn - xn * jnp.sum(dxn * xn, axis=-1, keepdims=True)) / \
        jnp.maximum(norm, NORM_FLOOR)


# --------------------------------------------------------------------------- #
# Poincaré-metric epilogue (Gram closed form; see pmath.dist_matrix_gram).    #
# Inputs are BALL POINTS (the caller applies expmap0→project outside the      #
# kernel, so that map's autodiff stays in XLA); scores are                    #
#   s = -(2/√c)·artanh(√c·n),  n² = max(x2-2g+y2, 0)·den/(den+ε)²,            #
#   den = 1-2c·g+c²·x2·y2                                                     #
# artanh evaluates from primitives Mosaic lowers (log), with the reference's  #
# input clamp (pmath.py:19): z ≤ 1-1e-5, gradient passing through the clamp   #
# exactly like the hand-written torch backward (grad/(1-z_c²)).              #
# --------------------------------------------------------------------------- #

ARTANH_EPS = 1e-5
DENOM_EPS = 1e-5


def _poincare_pieces(qb, kb, c: float):
    """Shared fwd recompute: returns (g, x2, y2, m, den, n2, n, zc).

    The Gram here is deliberately HIGHEST (never ``_fdot``): the x²−2g+y²
    cancellation plus artanh amplification make the score path the one
    place the 3-pass split measurably hurts (see FLASH_GRAM_3PASS note)."""
    g = _dot(qb, kb, ((1,), (1,)))                       # [TL, S]
    x2 = jnp.sum(qb * qb, axis=-1, keepdims=True)        # [TL, 1]
    y2 = jnp.sum(kb * kb, axis=-1)[None, :]              # [1, S]
    m = jnp.maximum(x2 - 2.0 * g + y2, 0.0)
    den = 1.0 - 2.0 * c * g + (c * c) * x2 * y2
    n2 = m * den / ((den + DENOM_EPS) ** 2)
    n = jnp.sqrt(n2 + 1e-15)
    zc = jnp.minimum((c ** 0.5) * n, 1.0 - ARTANH_EPS)
    return g, x2, y2, m, den, n2, n, zc


def _poincare_score_from_pieces(zc, c: float, s_real: int,
                                col_offset: int = 0):
    sqrt_c = c ** 0.5
    s = -(2.0 / sqrt_c) * 0.5 * jnp.log((1.0 + zc) / (1.0 - zc))
    col = col_offset + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(col < s_real, s, NEG_INF)


def _poincare_scores(qb, kb, c: float, s_real: int, col_offset: int = 0):
    *_, zc = _poincare_pieces(qb, kb, c)
    return _poincare_score_from_pieces(zc, c, s_real, col_offset)


def _poincare_grad_pieces(pieces, ds, c: float):
    """Tile-level hand-derived VJP pieces of the poincare score epilogue.

    ``pieces`` is the tuple ``_poincare_pieces`` returned for this block
    (passed in so the HIGHEST-precision Gram and the epilogue are computed
    ONCE per backward tile, shared with the score recompute). Given
    ds = dL/dscores [TL, TS] on one (q-tile × k-tile) block, returns
    (dg [TL, TS], dx2_part [TL, 1], dy2_part [TS, 1]) — the score-Gram
    cotangent and the partial row/column-sum contributions to the squared-
    norm cotangents. Both partials are plain sums over the block, so tiled
    callers accumulate them across the other axis.

    Chain: s = -(2/√c)·artanh(clip(√c·n)) ⇒ ds/dn = -2/(1-z_c²);
    dn/dn² = 1/(2n); n² = m·den/(den+ε)² with m = relu(x2-2g+y2) ⇒
       ∂n²/∂m = den/(den+ε)²,   ∂n²/∂den = m·(ε-den)/(den+ε)³
       ∂m/∂g = -2·gate, ∂m/∂x2 = ∂m/∂y2 = gate
       ∂den/∂g = -2c,  ∂den/∂x2 = c²y2, ∂den/∂y2 = c²x2
    """
    g, x2, y2, m, den, n2, n, zc = pieces
    dn = ds * (-2.0 / jnp.maximum(1.0 - zc * zc, 1e-12))      # [TL, TS]
    dn2 = dn * (0.5 / n)
    dA = den / ((den + DENOM_EPS) ** 2)                        # ∂n²/∂m
    dB = m * (DENOM_EPS - den) / ((den + DENOM_EPS) ** 3)      # ∂n²/∂den
    gate = jnp.where(x2 - 2.0 * g + y2 > 0.0, 1.0, 0.0)
    dg = dn2 * (dA * (-2.0 * gate) + dB * (-2.0 * c))
    dx2_part = jnp.sum(dn2 * (dA * gate + dB * (c * c) * y2),
                       axis=1, keepdims=True)                  # [TL, 1]
    dy2_part = jnp.sum(dn2 * (dA * gate + dB * (c * c) * x2),
                       axis=0)[:, None]                        # [TS, 1]
    return dg, dx2_part, dy2_part


def _poincare_bwd_terms(qb, kb, ds, c: float):
    """Whole-S VJP of the poincare score epilogue: (dq_tile [TL, Dp],
    dk_part [S, Dp]). dk_part is this q-tile's complete additive contribution
    to dk (no cross-tile fixup needed: the y2 chain term 2·dy2ᵀ⊙kb is linear
    in the per-tile column sums, so per-tile contributions just add).
    Final assembly from the pieces: dq = dg·kb + 2·dx2⊙qb,
    dk = dgᵀ·qb + 2·dy2ᵀ⊙kb (from x2 = Σ qb², y2 = Σ kb²).

    Recomputes ``_poincare_pieces`` rather than taking the score pass's
    tuple: in the whole-S kernel, keeping all [TL, S] pieces live across
    the softmax OVERFLOWS scoped VMEM at S=1024 (measured 17.2M > 16M
    limit) — the recompute keeps peak liveness bounded and Mosaic
    schedules it without a measured cost. The S-tiled flash kernels DO
    share the tuple (``_poincare_grad_pieces(pieces, ...)``): their
    [TL, TS] blocks are small enough."""
    dg, dx2, dy2 = _poincare_grad_pieces(_poincare_pieces(qb, kb, c), ds, c)
    dq_tile = _dot(dg, kb, ((1,), (0,))) + 2.0 * dx2 * qb
    dk_part = _dot(dg, qb, ((0,), (0,))) + 2.0 * dy2 * kb
    return dq_tile, dk_part


def _make_fwd_kernel(s_real: int, has_mask: bool, metric: str = "oblique",
                     curvature: float = 1.0):
    def kernel(q_ref, k_ref, v_ref, *rest):
        if has_mask:
            mask_ref, o_ref = rest
        else:
            (o_ref,) = rest
        if metric == "poincare":
            s = _poincare_scores(q_ref[0], k_ref[0], curvature, s_real)
        else:
            qn, _ = _normalize_rows(q_ref[0])
            kn, _ = _normalize_rows(k_ref[0])
            _, _, s = _scores(qn, kn, s_real)
        if has_mask:
            s = s + mask_ref[0]
        # Maxless softmax: geodesic scores are CLAMP-BOUNDED above by 0 and
        # below by the clip/artanh constants (oblique ∈ [-π, 0]; poincaré
        # ≥ -(2/√c)·artanh(1-1e-5)), so exp cannot overflow and valid lanes
        # cannot underflow — the running-max pass is pure VPU waste here.
        # Masked lanes are exp(-1e30) = 0 exactly; an all-masked row hits
        # the denominator floor and outputs 0.
        e = jnp.exp(s)
        p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        o_ref[0] = _dot(p, v_ref[0], ((1,), (0,)))
    return kernel


def _make_bwd_kernel(s_real: int, has_mask: bool, metric: str = "oblique",
                     curvature: float = 1.0):
    """Backward, tiled over q-rows (grid dim 1). dq is per-tile; dk̂/dv
    accumulate across the sequential TPU grid into full-S output blocks
    (initialized at tile 0). Oblique: the k-side normalization VJP needs the
    COMPLETE dk̂ sum, so it is applied outside the kernel on the accumulated
    dkn. Poincaré: per-tile dk contributions are already complete
    (``_poincare_bwd_terms``), the accumulated buffer IS dk."""
    def kernel(q_ref, k_ref, v_ref, *rest):
        if has_mask:
            mask_ref, do_ref, dq_ref, dkn_ref, dv_ref, dmask_ref = rest
        else:
            do_ref, dq_ref, dkn_ref, dv_ref = rest
        i = pl.program_id(1)
        q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
        if metric == "poincare":
            s = _poincare_scores(q, k, curvature, s_real)
        else:
            qn, q_norm = _normalize_rows(q)
            kn, _ = _normalize_rows(k)
            g, gc, s = _scores(qn, kn, s_real)
        if has_mask:
            s = s + mask_ref[0]
        # maxless softmax recompute (see _make_fwd_kernel: scores are
        # clamp-bounded, the running max is VPU waste)
        e = jnp.exp(s)
        p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True),
                            1e-30)                           # [TL, S]

        dp = _dot(do, v, ((1,), (1,)))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        if has_mask:
            # the mask enters additively in the scores: dL/dmask = ds
            dmask_ref[0] = ds
        if metric == "poincare":
            dq_tile, dkn_part = _poincare_bwd_terms(q, k, ds, curvature)
            dq_ref[0] = dq_tile
        else:
            inside = jnp.abs(g) < (1.0 - EPS)
            dg = jnp.where(inside, ds * jax.lax.rsqrt(
                jnp.maximum(1.0 - gc * gc, 1e-12)), 0.0)     # [TL, S]
            dq_ref[0] = _normalize_rows_vjp(
                _dot(dg, kn, ((1,), (0,))), qn, q_norm)
            dkn_part = _dot(dg, qn, ((0,), (0,)))            # [S, Dh]

        dv_part = _dot(p, do, ((0,), (0,)))                  # [S, Dh]

        @pl.when(i == 0)
        def _():
            dv_ref[0] = dv_part
            dkn_ref[0] = dkn_part

        @pl.when(i > 0)
        def _():
            dv_ref[0] += dv_part
            dkn_ref[0] += dkn_part
    return kernel


def _pad_inputs(q, k, v, mask, l_mult: int = _SUBLANE, s_mult: int = _LANE):
    """Pad (L, S, Dh) to hardware tiles (or the caller's tile multiples).
    Padded key columns are ALWAYS disabled by the in-kernel iota predicate
    (_scores); the padded region of an explicit mask is zero-filled and
    contributes nothing — do not remove the iota predicate."""
    B, L, Dh = q.shape
    S = k.shape[1]
    Lp = _round_up(L, l_mult)
    Sp = _round_up(S, s_mult)
    Dp = _round_up(Dh, _LANE)

    qp = jnp.zeros((B, Lp, Dp), jnp.float32).at[:, :L, :Dh].set(q)
    kp = jnp.zeros((B, Sp, Dp), jnp.float32).at[:, :S, :Dh].set(k)
    vp = jnp.zeros((B, Sp, Dp), jnp.float32).at[:, :S, :Dh].set(v)
    mp = None
    if mask is not None:
        mp = jnp.zeros((B, Lp, Sp), jnp.float32)
        mp = mp.at[:, :L, :S].set(mask.astype(jnp.float32))
    return qp, kp, vp, mp, (L, S, Dh, Lp, Sp, Dp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_core(q, k, v, mask, interpret, metric="oblique", curvature=1.0):
    out, _ = _fused_fwd(q, k, v, mask, interpret, metric, curvature)
    return out


def _fused_fwd(q, k, v, mask, interpret, metric="oblique", curvature=1.0):
    qp, kp, vp, mp, dims = _pad_inputs(q, k, v, mask)
    B = qp.shape[0]
    L, S, Dh, Lp, Sp, Dp = dims
    tile_l = min(Lp, 256)
    if Lp % tile_l:
        # q-rows must tile exactly: pad L up to a tile multiple (padded rows
        # compute garbage that is sliced off; padded K columns are already
        # masked)
        extra = tile_l - (Lp % tile_l)
        qp = jnp.pad(qp, ((0, 0), (0, extra), (0, 0)))
        if mp is not None:
            mp = jnp.pad(mp, ((0, 0), (0, extra), (0, 0)))
        Lp += extra
    grid = (B, Lp // tile_l)
    has_mask = mp is not None

    in_specs = [
        pl.BlockSpec((1, tile_l, Dp), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Sp, Dp), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Sp, Dp), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qp, kp, vp]
    if has_mask:
        in_specs.append(pl.BlockSpec((1, tile_l, Sp), lambda b, i: (b, i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mp)

    op = pl.pallas_call(
        _make_fwd_kernel(S, has_mask, metric, curvature),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_l, Dp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lp, Dp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Lp * Sp * (2 * Dp + 1),
            bytes_accessed=4 * B * (Lp * Dp * 2 + 2 * Sp * Dp),
            transcendentals=B * Lp * Sp,
        ),
        interpret=interpret,
    )(*args)
    return op[:, :L, :Dh], (q, k, v, mask)


def _fused_bwd(interpret, metric, curvature, res, do):
    q, k, v, mask = res
    qp, kp, vp, mp, dims = _pad_inputs(q, k, v, mask)
    B = qp.shape[0]
    L, S, Dh, Lp, Sp, Dp = dims
    dop = jnp.zeros((B, Lp, Dp), jnp.float32).at[:, :L, :Dh].set(do)
    has_mask = mp is not None

    # poincare's backward keeps more [TL, S] intermediates live (the x2/y2
    # chain terms on top of the softmax VJP): at TL=256, S=1024 it measures
    # 17.2M scoped VMEM vs the 16M limit — halve the q-tile for headroom
    tile_l = min(Lp, 128 if metric == "poincare" else 256)
    if Lp % tile_l:
        extra = tile_l - (Lp % tile_l)
        qp = jnp.pad(qp, ((0, 0), (0, extra), (0, 0)))
        dop = jnp.pad(dop, ((0, 0), (0, extra), (0, 0)))
        if mp is not None:
            mp = jnp.pad(mp, ((0, 0), (0, extra), (0, 0)))
        Lp += extra
    grid = (B, Lp // tile_l)

    spec_q = pl.BlockSpec((1, tile_l, Dp), lambda b, i: (b, i, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, Sp, Dp), lambda b, i: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_m = pl.BlockSpec((1, tile_l, Sp), lambda b, i: (b, i, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [spec_q, spec_k, spec_k]
    args = [qp, kp, vp]
    if has_mask:
        in_specs.append(spec_m)
        args.append(mp)
    in_specs.append(spec_q)
    args.append(dop)

    out_specs = [spec_q, spec_k, spec_k]
    out_shape = [
        jax.ShapeDtypeStruct((B, Lp, Dp), jnp.float32),
        jax.ShapeDtypeStruct((B, Sp, Dp), jnp.float32),
        jax.ShapeDtypeStruct((B, Sp, Dp), jnp.float32),
    ]
    if has_mask:
        out_specs.append(spec_m)
        out_shape.append(jax.ShapeDtypeStruct((B, Lp, Sp), jnp.float32))
    outs = pl.pallas_call(
        _make_bwd_kernel(S, has_mask, metric, curvature),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    dq, dkn, dv = outs[:3]
    d_mask_full = outs[3] if has_mask else None
    dkn = dkn[:, :S, :Dh]
    if metric == "poincare":
        # per-tile dk contributions were complete; the accumulation IS dk
        dk = dkn
    else:
        # k-side row-normalize VJP outside the kernel: it needs the full
        # dk-hat sum over all q-tiles, which only exists after the grid
        # completes.
        kn, k_norm = _normalize_rows(k.astype(jnp.float32))
        dk = _normalize_rows_vjp(dkn, kn, k_norm)
    d_mask = None if mask is None else d_mask_full[:, :L, :S]
    return (dq[:, :L, :Dh], dk, dv[:, :S, :Dh], d_mask)


_fused_core.defvjp(_fused_fwd, _fused_bwd)


# --------------------------------------------------------------------------- #
# Flash-style S-tiled variant: online-softmax forward + LSE-replay backward.  #
# Removes the whole-S-in-VMEM requirement of the kernel above (its practical  #
# ceiling is S ≈ 2k): K/V stream through VMEM in tiles, so context length is  #
# bounded by HBM, not VMEM. Maskless (the model's hot case — quirk Q2); the   #
# padded-column iota predicate still applies. Numerics: compensated 3-pass    #
# bf16 matmuls (_fdot / FLASH_GRAM_3PASS — round-4 adoption, ×1.2 at 4096²,   #
# error 6e-6 ≪ the 1e-4 clamp) EXCEPT the poincaré score-path Gram, which     #
# stays HIGHEST (see FLASH_GRAM_3PASS note); polynomial acos, clip-gated      #
# acos gradient.                                                              #
# --------------------------------------------------------------------------- #

_FLASH_TILE_L = 256
_FLASH_TILE_S = 512
_LSE_LANES = 128          # per-row stats are carried in (tile, 128) blocks


def _flash_tile_scores(q_block, k_block, ki: int, tile_s: int, s_real: int,
                       val_row=None):
    """Per-tile normalize + ``_scores`` with the block's global column
    offset. ``val_row`` [1, TS] (1 = real key) additionally disables
    user-masked key columns (agent-validity masks at long context —
    round-2 VERDICT item 6); padding is already folded into it by the
    caller, the iota predicate stays as the maskless path's guard."""
    qn, q_norm = _normalize_rows(q_block)
    kn, _ = _normalize_rows(k_block)
    g, gc, s = _scores(qn, kn, s_real, col_offset=ki * tile_s, dot=_fdot)
    if val_row is not None:
        s = jnp.where(val_row > 0, s, NEG_INF)
    return qn, q_norm, kn, g, gc, s


def _make_flash_fwd_kernel(s_real: int, n_ktiles: int, tile_s: int,
                           metric: str = "oblique", curvature: float = 1.0,
                           has_val: bool = False):
    """Maxless streaming softmax: geodesic scores are CLAMP-BOUNDED above by
    0 and below by the clip/artanh constants (oblique ∈ [-π, 0]; poincaré
    ≥ -(2/√c)·artanh(1-1e-5)), so exp can neither overflow nor underflow on
    valid lanes — the classic online-max machinery (running m, α-rescale of
    l and acc every tile) is pure VPU cost with zero numerical benefit here
    and is dropped. Masked/padded lanes are exp(-1e30) = 0 exactly; a row
    with no valid key hits the denominator floor and outputs 0. The emitted
    per-row statistic is still the true LSE (= log Σe), so the backward
    replay kernels are unchanged."""
    def kernel(q_ref, k_ref, v_ref, *rest):
        if has_val:
            val_ref, o_ref, lse_ref, l_scr, acc_scr = rest
            val_row = val_ref[...]
        else:
            o_ref, lse_ref, l_scr, acc_scr = rest
            val_row = None
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        if metric == "poincare":
            s = _poincare_scores(q_ref[0], k_ref[0], curvature, s_real,
                                 col_offset=ki * tile_s)
            if val_row is not None:
                s = jnp.where(val_row > 0, s, NEG_INF)
        else:
            _, _, _, _, _, s = _flash_tile_scores(q_ref[0], k_ref[0], ki,
                                                  tile_s, s_real, val_row)
        p = jnp.exp(s)                                    # [TL, TS]
        l_new = l_scr[...][:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[...] += _fdot(p, v_ref[0], ((1,), (0,)))
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

        @pl.when(ki == n_ktiles - 1)
        def _():
            l = jnp.maximum(l_scr[...][:, :1], 1e-30)
            o_ref[0] = acc_scr[...] / l
            lse_ref[0] = jnp.broadcast_to(jnp.log(l), lse_ref.shape[1:])
    return kernel


def _make_flash_poincare_dq_kernel(s_real: int, n_ktiles: int, tile_s: int,
                                   c: float, has_val: bool = False):
    """dq sweep for the poincare metric: accumulates the Gram-side term
    dg·kb across k-tiles plus the scalar dx2 row sums; assembles
    dq = Σ dg·kb + 2·dx2⊙qb at the last tile."""
    def kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *rest):
        if has_val:
            val_ref, dq_ref, dqg_scr, dx2_scr = rest
        else:
            dq_ref, dqg_scr, dx2_scr = rest
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            dqg_scr[...] = jnp.zeros_like(dqg_scr)
            dx2_scr[...] = jnp.zeros_like(dx2_scr)

        qb, kb = q_ref[0], k_ref[0]
        pieces = _poincare_pieces(qb, kb, c)
        s = _poincare_score_from_pieces(pieces[-1], c, s_real,
                                        col_offset=ki * tile_s)
        if has_val:
            s = jnp.where(val_ref[...] > 0, s, NEG_INF)
        p = jnp.exp(s - lse_ref[0][:, :1])
        dp = _fdot(do_ref[0], v_ref[0], ((1,), (1,)))
        ds = p * (dp - delta_ref[0][:, :1])
        dg, dx2p, _ = _poincare_grad_pieces(pieces, ds, c)
        dqg_scr[...] += _fdot(dg, kb, ((1,), (0,)))
        dx2_scr[...] += jnp.broadcast_to(dx2p, dx2_scr.shape)

        @pl.when(ki == n_ktiles - 1)
        def _():
            dq_ref[0] = dqg_scr[...] + 2.0 * dx2_scr[...][:, :1] * qb
    return kernel


def _make_flash_poincare_dkv_kernel(s_real: int, n_qtiles: int, tile_s: int,
                                    c: float, has_val: bool = False):
    """dk/dv sweep for the poincare metric (grid (B, k_tiles, q_tiles)):
    accumulates dgᵀ·qb, pᵀ·do and the scalar dy2 column sums over q-tiles;
    assembles dk = Σ dgᵀ·qb + 2·dy2⊙kb at the last q-tile."""
    def kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *rest):
        if has_val:
            val_ref, dk_ref, dv_ref, dkg_scr, dv_scr, dy2_scr = rest
        else:
            dk_ref, dv_ref, dkg_scr, dv_scr, dy2_scr = rest
        ki = pl.program_id(1)
        qi = pl.program_id(2)

        @pl.when(qi == 0)
        def _():
            dkg_scr[...] = jnp.zeros_like(dkg_scr)
            dv_scr[...] = jnp.zeros_like(dv_scr)
            dy2_scr[...] = jnp.zeros_like(dy2_scr)

        qb, kb = q_ref[0], k_ref[0]
        pieces = _poincare_pieces(qb, kb, c)
        s = _poincare_score_from_pieces(pieces[-1], c, s_real,
                                        col_offset=ki * tile_s)
        if has_val:
            s = jnp.where(val_ref[...] > 0, s, NEG_INF)
        p = jnp.exp(s - lse_ref[0][:, :1])
        dv_scr[...] += _fdot(p, do_ref[0], ((0,), (0,)))
        dp = _fdot(do_ref[0], v_ref[0], ((1,), (1,)))
        ds = p * (dp - delta_ref[0][:, :1])
        dg, _, dy2p = _poincare_grad_pieces(pieces, ds, c)
        dkg_scr[...] += _fdot(dg, qb, ((0,), (0,)))
        dy2_scr[...] += jnp.broadcast_to(dy2p, dy2_scr.shape)

        @pl.when(qi == n_qtiles - 1)
        def _():
            dk_ref[0] = dkg_scr[...] + 2.0 * dy2_scr[...][:, :1] * kb
            dv_ref[0] = dv_scr[...]
    return kernel


def _make_flash_dq_kernel(s_real: int, n_ktiles: int, tile_s: int,
                          has_val: bool = False):
    def kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *rest):
        if has_val:
            val_ref, dq_ref, dqn_scr = rest
            val_row = val_ref[...]
        else:
            dq_ref, dqn_scr = rest
            val_row = None
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            dqn_scr[...] = jnp.zeros_like(dqn_scr)

        qn, q_norm, kn, g, gc, s = _flash_tile_scores(
            q_ref[0], k_ref[0], ki, tile_s, s_real, val_row)
        p = jnp.exp(s - lse_ref[0][:, :1])                # [TL, TS]
        dp = _fdot(do_ref[0], v_ref[0], ((1,), (1,)))
        ds = p * (dp - delta_ref[0][:, :1])
        inside = jnp.abs(g) < (1.0 - EPS)
        dg = jnp.where(inside, ds * jax.lax.rsqrt(
            jnp.maximum(1.0 - gc * gc, 1e-12)), 0.0)
        dqn_scr[...] += _fdot(dg, kn, ((1,), (0,)))

        @pl.when(ki == n_ktiles - 1)
        def _():
            dq_ref[0] = _normalize_rows_vjp(dqn_scr[...], qn, q_norm)
    return kernel


def _make_flash_dkv_kernel(s_real: int, n_qtiles: int, tile_s: int,
                           has_val: bool = False):
    """Grid (B, k_tiles, q_tiles) — q innermost so dk/dv accumulate per
    k-tile in scratch; the k-side normalize VJP applies in-kernel once the
    q sweep completes (the accumulated dk̂ is then total)."""
    def kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *rest):
        if has_val:
            val_ref, dk_ref, dv_ref, dkn_scr, dv_scr = rest
            val_row = val_ref[...]
        else:
            dk_ref, dv_ref, dkn_scr, dv_scr = rest
            val_row = None
        ki = pl.program_id(1)
        qi = pl.program_id(2)

        @pl.when(qi == 0)
        def _():
            dkn_scr[...] = jnp.zeros_like(dkn_scr)
            dv_scr[...] = jnp.zeros_like(dv_scr)

        qn, _, kn, g, gc, s = _flash_tile_scores(
            q_ref[0], k_ref[0], ki, tile_s, s_real, val_row)
        p = jnp.exp(s - lse_ref[0][:, :1])
        dv_scr[...] += _fdot(p, do_ref[0], ((0,), (0,)))
        dp = _fdot(do_ref[0], v_ref[0], ((1,), (1,)))
        ds = p * (dp - delta_ref[0][:, :1])
        inside = jnp.abs(g) < (1.0 - EPS)
        dg = jnp.where(inside, ds * jax.lax.rsqrt(
            jnp.maximum(1.0 - gc * gc, 1e-12)), 0.0)
        dkn_scr[...] += _fdot(dg, qn, ((0,), (0,)))

        @pl.when(qi == n_qtiles - 1)
        def _():
            kn_full, k_norm = _normalize_rows(k_ref[0])
            dk_ref[0] = _normalize_rows_vjp(dkn_scr[...], kn_full, k_norm)
            dv_ref[0] = dv_scr[...]
    return kernel


def _flash_pad(q, k, v):
    qp, kp, vp, _, dims = _pad_inputs(q, k, v, None,
                                      l_mult=_FLASH_TILE_L,
                                      s_mult=_FLASH_TILE_S)
    return qp, kp, vp, dims


def _flash_specs(tile_l, tile_s, Dp):
    """(q, k, v) block specs for a (B, q_tiles, k_tiles) grid."""
    return [
        pl.BlockSpec((1, tile_l, Dp), lambda b, qi, ki: (b, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_s, Dp), lambda b, qi, ki: (b, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_s, Dp), lambda b, qi, ki: (b, ki, 0),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_core(q, k, v, val, interpret, metric="oblique", curvature=1.0):
    out, _ = _flash_fwd(q, k, v, val, interpret, metric, curvature)
    return out


def _flash_fwd(q, k, v, val, interpret, metric="oblique", curvature=1.0):
    qp, kp, vp, dims = _flash_pad(q, k, v)
    B = qp.shape[0]
    L, S, Dh, Lp, Sp, Dp = dims
    tl, ts = _FLASH_TILE_L, _FLASH_TILE_S
    n_k = Sp // ts
    grid = (B, Lp // tl, n_k)
    has_val = val is not None
    spec_row = pl.BlockSpec((1, tl, Dp), lambda b, qi, ki: (b, qi, 0),
                            memory_space=pltpu.VMEM)
    spec_lse = pl.BlockSpec((1, tl, _LSE_LANES), lambda b, qi, ki: (b, qi, 0),
                            memory_space=pltpu.VMEM)
    in_specs = _flash_specs(tl, ts, Dp)
    args = [qp, kp, vp]
    if has_val:
        # padding folds into the validity row (zeros beyond S), so the
        # kernel's single predicate handles both
        valp = jnp.zeros((B, Sp), jnp.float32).at[:, :S].set(val)
        in_specs.append(pl.BlockSpec((1, ts), lambda b, qi, ki: (b, ki),
                                     memory_space=pltpu.VMEM))
        args.append(valp)
    out, lse = pl.pallas_call(
        _make_flash_fwd_kernel(S, n_k, ts, metric, curvature, has_val),
        grid=grid,
        in_specs=in_specs,
        out_specs=[spec_row, spec_lse],
        out_shape=[jax.ShapeDtypeStruct((B, Lp, Dp), jnp.float32),
                   jax.ShapeDtypeStruct((B, Lp, _LSE_LANES), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((tl, _LSE_LANES), jnp.float32),
                        pltpu.VMEM((tl, Dp), jnp.float32)],
        interpret=interpret,
    )(*args)
    return out[:, :L, :Dh], (q, k, v, val, out[:, :L, :Dh], lse)


def _flash_bwd(interpret, metric, curvature, res, do):
    q, k, v, val, out, lse = res
    qp, kp, vp, dims = _flash_pad(q, k, v)
    B = qp.shape[0]
    L, S, Dh, Lp, Sp, Dp = dims
    tl, ts = _FLASH_TILE_L, _FLASH_TILE_S
    n_q, n_k = Lp // tl, Sp // ts
    has_val = val is not None
    dop = jnp.zeros((B, Lp, Dp), jnp.float32).at[:, :L, :Dh].set(do)
    # delta_i = Σ_d do_id · out_id == rowsum(dP ⊙ P) (flash identity) — the
    # softmax-VJP row correction, computed once outside the kernels
    delta = jnp.sum(do.astype(jnp.float32) * out, axis=-1)          # [B, L]
    deltap = jnp.zeros((B, Lp), jnp.float32).at[:, :L].set(delta)
    deltap = jnp.broadcast_to(deltap[..., None], (B, Lp, _LSE_LANES))
    valp = None
    if has_val:
        valp = jnp.zeros((B, Sp), jnp.float32).at[:, :S].set(val)

    spec_row = pl.BlockSpec((1, tl, Dp), lambda b, qi, ki: (b, qi, 0),
                            memory_space=pltpu.VMEM)
    spec_lse = pl.BlockSpec((1, tl, _LSE_LANES), lambda b, qi, ki: (b, qi, 0),
                            memory_space=pltpu.VMEM)
    if metric == "poincare":
        dq_kernel = _make_flash_poincare_dq_kernel(S, n_k, ts, curvature,
                                                   has_val)
        dq_scratch = [pltpu.VMEM((tl, Dp), jnp.float32),
                      pltpu.VMEM((tl, _LSE_LANES), jnp.float32)]
    else:
        dq_kernel = _make_flash_dq_kernel(S, n_k, ts, has_val)
        dq_scratch = [pltpu.VMEM((tl, Dp), jnp.float32)]
    dq_specs = _flash_specs(tl, ts, Dp) + [spec_row, spec_lse, spec_lse]
    dq_args = [qp, kp, vp, dop, lse, deltap]
    if has_val:
        dq_specs.append(pl.BlockSpec((1, ts), lambda b, qi, ki: (b, ki),
                                     memory_space=pltpu.VMEM))
        dq_args.append(valp)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(B, n_q, n_k),
        in_specs=dq_specs,
        out_specs=spec_row,
        out_shape=jax.ShapeDtypeStruct((B, Lp, Dp), jnp.float32),
        scratch_shapes=dq_scratch,
        interpret=interpret,
    )(*dq_args)

    # dk/dv sweep: grid reorders to (B, k_tiles, q_tiles)
    spec_q2 = pl.BlockSpec((1, tl, Dp), lambda b, ki, qi: (b, qi, 0),
                           memory_space=pltpu.VMEM)
    spec_k2 = pl.BlockSpec((1, ts, Dp), lambda b, ki, qi: (b, ki, 0),
                           memory_space=pltpu.VMEM)
    spec_lse2 = pl.BlockSpec((1, tl, _LSE_LANES), lambda b, ki, qi: (b, qi, 0),
                             memory_space=pltpu.VMEM)
    if metric == "poincare":
        dkv_kernel = _make_flash_poincare_dkv_kernel(S, n_q, ts, curvature,
                                                     has_val)
        dkv_scratch = [pltpu.VMEM((ts, Dp), jnp.float32),
                       pltpu.VMEM((ts, Dp), jnp.float32),
                       pltpu.VMEM((ts, _LSE_LANES), jnp.float32)]
    else:
        dkv_kernel = _make_flash_dkv_kernel(S, n_q, ts, has_val)
        dkv_scratch = [pltpu.VMEM((ts, Dp), jnp.float32),
                       pltpu.VMEM((ts, Dp), jnp.float32)]
    dkv_specs = [spec_q2, spec_k2, spec_k2, spec_q2, spec_lse2, spec_lse2]
    dkv_args = [qp, kp, vp, dop, lse, deltap]
    if has_val:
        dkv_specs.append(pl.BlockSpec((1, ts), lambda b, ki, qi: (b, ki),
                                      memory_space=pltpu.VMEM))
        dkv_args.append(valp)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(B, n_k, n_q),
        in_specs=dkv_specs,
        out_specs=[spec_k2, spec_k2],
        out_shape=[jax.ShapeDtypeStruct((B, Sp, Dp), jnp.float32),
                   jax.ShapeDtypeStruct((B, Sp, Dp), jnp.float32)],
        scratch_shapes=dkv_scratch,
        interpret=interpret,
    )(*dkv_args)
    d_val = None if val is None else jnp.zeros_like(val)
    return (dq[:, :L, :Dh], dk[:, :S, :Dh], dv[:, :S, :Dh], d_val)


_flash_core.defvjp(_flash_fwd, _flash_bwd)


def flash_geodesic_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                             *, kv_valid: jnp.ndarray | None = None,
                             interpret: bool | None = None,
                             metric: str = "oblique",
                             curvature: float = 1.0) -> jnp.ndarray:
    """S-tiled MHGSA: softmax_j(score(q_i, k_j))·V with online softmax —
    context length bounded by HBM, not VMEM.

    ``kv_valid`` [..., S] (1 = real key, broadcastable over the leading dims)
    disables masked key columns inside the kernel (round-2 VERDICT item 6) —
    the key-validity mask form is all the model ever needs (its agent mask is
    exactly this); arbitrary additive biases still route to
    ``fused_geodesic_attention`` or the jnp path.

    ``metric``: "oblique" (-acos) or "poincare" (Möbius geodesic distance at
    ``curvature`` ≥ MIN_MAXLESS_CURVATURE — the maxless streaming softmax
    needs the static score bound above exp underflow; smaller c raises).
    q/k must already be ball points — see ``fused_geodesic_attention``.

    q: [..., L, Dh], k/v: [..., S, Dh]; fp32."""
    _check_maxless_bounds(metric, curvature)
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
    val = None
    if kv_valid is not None:
        val = jnp.broadcast_to(kv_valid, (*lead, S)) \
            .reshape(B, S).astype(jnp.float32)
    out = _flash_core(q3, k3, v3, val, interpret, metric, float(curvature))
    return out.reshape(*lead, L, Dh)


def fused_geodesic_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                             *, mask: jnp.ndarray | None = None,
                             interpret: bool | None = None,
                             metric: str = "oblique",
                             curvature: float = 1.0) -> jnp.ndarray:
    """Fused MHGSA core: softmax_j(score(q_i, k_j) + mask)·V.

    ``metric``: "oblique" scores -acos(q̂_i·k̂_j); "poincare" scores the
    negated Möbius geodesic distance at ``curvature`` — q/k must then ALREADY
    be ball points (apply ``pmath.project(pmath.expmap0(x))`` first; keeping
    that map outside the kernel leaves its autodiff to XLA).
    ``curvature`` must be ≥ MIN_MAXLESS_CURVATURE (maxless-softmax bound;
    smaller c raises — use the dense route).

    q: [..., L, Dh], k/v: [..., S, Dh], mask additive [..., L, S] or None.
    MASK CONTRACT: entries ≤ -1e29 are the exclusion sentinel (weight exactly
    0; an all-excluded row outputs 0). Any OTHER finite values — positive
    bias or negative penalty — are canonicalized before entering the kernel:
    the per-row max of the finite entries is subtracted (a softmax-invariant
    shift, so arbitrary finite masks give the same weights as the dense
    max-subtracted softmax, and every finite lane lands ≤ 0) and the
    remainder floored at -30 (a lane 30 below its row's best already weighs
    ≤ e⁻³⁰ ≈ 1e-13 — numerically excluded; without the floor a large finite
    penalty could push score+mask below fp32 exp underflow and flush lanes
    to EXACT 0 inside the maxless kernel). The shift guarantees each row's
    best lane enters exp at its raw
    score (≥ the maxless bound), so valid rows can never flush to all-zero.
    Leading dims are flattened into the kernel grid's batch axis. fp32 only.
    ``interpret`` defaults to True off-TPU so the same code path runs (slowly,
    exactly) on the CPU test mesh.
    """
    _check_maxless_bounds(metric, curvature)
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
    m3 = None if mask is None else _canonicalize_mask(
        jnp.broadcast_to(mask, (*lead, L, S)).reshape(B, L, S))
    out = _fused_core(q3, k3, v3, m3, interpret, metric, float(curvature))
    return out.reshape(*lead, L, Dh)
