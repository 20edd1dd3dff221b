"""Head-packed Pallas kernel for SMALL-shape MHGSA — the flagship model shape.

The model's own hot attention shape (reference hyptransformerlib.py:214-218,
251-255 at the recorded training recipes) is thousands of tiny independent
problems: L = S ≈ 16-128 tokens, Dh = 8, batched over (scenes·samples·heads).
Both XLA fusion and the whole-S fused kernel treat each (batch, head) slice as
its own [L, Dh] matmul problem and pad pathologically on TPU tiles:

  - Dh = 8 pads to the 128-wide lane dim → 16× VMEM/HBM inflation on q/k/v
  - each [L, S] score tile uses S of 128 lanes → 4× waste at S = 32 on every
    VPU epilogue op (clip → acos polynomial → exp → divide)

This kernel repacks the problem so lanes are FULL and the per-head structure
becomes block structure inside ordinary MXU ops:

  - heads live in the lane dim of q/k/v: ``[B·L, H·Dh]`` with H·Dh ≤ 128
    (this is the natural output layout of the QKV projection — the [H, L, Dh]
    head split is what costs the transpose, not this)
  - the scores of ALL H heads of one problem form one ``[L, H·S]`` tile,
    produced by a single MXU contraction against a block-diagonal key matrix
        K_bd[(h,d), (h',s)] = k̂[s, (h,d)] · 1{h = h'}        [H·Dh, H·S]
    built in-kernel from constant structural 0/1 matrices; every reshuffle is
    a ``dot_general`` with chosen contracting dims — no transposes anywhere
  - per-head row-normalization and per-head softmax run as SEGMENTED
    reductions over Dh- and S-lane groups, the segment sums produced by one
    matmul against a block-ones matrix (MXU does the reduction+broadcast)
  - oblique scores are bounded in [-π, 0], so the softmax needs no max
    subtraction: exp never overflows, masked keys multiply the exp by 0
  - at this scale the cost is MXU *op issue* (tiny matrices), not FLOPs —
    so each grid step processes G problems and every matmul whose right
    operand is problem-independent (normalization, softmax denominator and
    VJP row sums, assembly segment sums) runs ONCE on the whole
    ``[G·L, ·]`` row block; only the four genuinely per-problem contractions
    (K_bd build, Gram, V_bd build, attention·V) stay in the unrolled loop

The VPU epilogue therefore touches exactly H·S useful lanes per row — zero
padding waste — and q/k/v stream at their true 4-byte-per-element size.

Backward is a hand-derived VJP (same math as kernels/mhgsa.py:23-29) executed
in the same packed layout with flash-style recompute: the [L, H·S] score tile
never leaves VMEM in either pass.

Scope: oblique metric, key-validity masks (``kv_valid``; the model's
agent-axis mask is exactly this form — models/sttode.py:_agent_attn_mask).
Large shapes (L·S ≥ 256²) stay with the fused/flash kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sttode_tpu.kernels.mhgsa import (EPS, NORM_FLOOR, _acos, _dot,
                                      _round_up)

_SUBLANE = 8


class _Structural:
    """Compile-time 0/1 matrices encoding the packed block structure.

    mseg_hd [HD, HD]   block-ones over Dh-lane groups (per-head ‖·‖² sums)
    r_tile  [Sp, HSp]  R[s, h·Sp+s'] = δ_{ss'}  (lane-tiling by matmul)
    mhead_k [HD, HSp]  1{head(row) = head(col)} (block-diag gate, K_bd form)
    mseg_hs [HSp, HSp] block-ones over Sp-lane groups (segmented softmax sums)
    rv      [HSp, Sp]  R^T (sublane-tiling / un-tiling by matmul)
    mhead_v [HSp, HD]  1{head(row) = head(col)} (block-diag gate, V_bd form)
    """

    def __init__(self, H: int, Dh: int, Sp: int):
        HD, HSp = H * Dh, H * Sp
        r_hd = np.arange(HD)
        r_hs = np.arange(HSp)
        self.mseg_hd = (r_hd[:, None] // Dh == r_hd[None, :] // Dh)
        self.r_tile = (np.arange(Sp)[:, None] == r_hs[None, :] % Sp)
        self.mhead_k = (r_hd[:, None] // Dh == r_hs[None, :] // Sp)
        self.mseg_hs = (r_hs[:, None] // Sp == r_hs[None, :] // Sp)
        self.rv = self.r_tile.T
        self.mhead_v = self.mhead_k.T

    def arrays(self):
        return tuple(jnp.asarray(m, jnp.float32) for m in
                     (self.mseg_hd, self.r_tile, self.mhead_k,
                      self.mseg_hs, self.rv, self.mhead_v))


def _norm_rows_seg(x, mseg_hd):
    """Per-head row normalization in packed layout: the squared-norm of each
    Dh-lane segment, broadcast back over the segment by one matmul."""
    n2 = _dot(x * x, mseg_hd, ((1,), (0,)))
    norm = jnp.sqrt(n2)
    return x / jnp.maximum(norm, NORM_FLOOR), norm


def _masked_exp_scores(qn_all, kn_all, val, st, G, Lp, Sp):
    """Shared fwd/bwd recompute: per-problem Gram + acos scores + masked exp,
    concatenated back into row blocks. Returns (g_cat [G·Lp, HSp],
    e_cat [G·Lp, HSp])."""
    _, r_tile, mhead_k, _, _, _ = st
    gs, es = [], []
    for g in range(G):
        kn = kn_all[g * Sp:(g + 1) * Sp]
        kbd = _dot(kn, r_tile, ((0,), (0,))) * mhead_k       # [HD, HSp]
        gg = _dot(qn_all[g * Lp:(g + 1) * Lp], kbd, ((1,), (0,)))
        gc = jnp.clip(gg, -1.0 + EPS, 1.0 - EPS)
        # masking as a multiply on exp: exp(-acos) ∈ [e^-π, 1] is finite, so
        # e·0 ≡ exp(score + NEG_INF) without materializing masked scores
        e = jnp.exp(-_acos(gc)) * val[g:g + 1, :]
        gs.append(gg)
        es.append(e)
    return jnp.concatenate(gs, axis=0), jnp.concatenate(es, axis=0)


def _make_packed_fwd_kernel(G: int, Lp: int, Sp: int):
    def kernel(q_ref, k_ref, v_ref, val_ref, mseg_hd_ref, r_tile_ref,
               mhead_k_ref, mseg_hs_ref, rv_ref, mhead_v_ref, o_ref):
        st = (mseg_hd_ref[...], r_tile_ref[...], mhead_k_ref[...],
              mseg_hs_ref[...], rv_ref[...], mhead_v_ref[...])
        mseg_hd, _, _, mseg_hs, rv, mhead_v = st
        qn_all, _ = _norm_rows_seg(q_ref[...], mseg_hd)      # [G·Lp, HD]
        kn_all, _ = _norm_rows_seg(k_ref[...], mseg_hd)      # [G·Sp, HD]
        v_all = v_ref[...]
        _, e_cat = _masked_exp_scores(qn_all, kn_all, val_ref[...], st,
                                      G, Lp, Sp)
        denom = _dot(e_cat, mseg_hs, ((1,), (0,)))           # batched
        p_cat = e_cat / jnp.maximum(denom, 1e-30)
        outs = []
        for g in range(G):
            vbd = _dot(rv, v_all[g * Sp:(g + 1) * Sp],
                       ((1,), (0,))) * mhead_v               # [HSp, HD]
            outs.append(_dot(p_cat[g * Lp:(g + 1) * Lp], vbd, ((1,), (0,))))
        o_ref[...] = jnp.concatenate(outs, axis=0)
    return kernel


def _make_packed_bwd_kernel(G: int, Lp: int, Sp: int):
    def kernel(q_ref, k_ref, v_ref, val_ref, do_ref,
               mseg_hd_ref, r_tile_ref, mhead_k_ref, mseg_hs_ref,
               rv_ref, mhead_v_ref, dq_ref, dk_ref, dv_ref):
        st = (mseg_hd_ref[...], r_tile_ref[...], mhead_k_ref[...],
              mseg_hs_ref[...], rv_ref[...], mhead_v_ref[...])
        mseg_hd, r_tile, mhead_k, mseg_hs, rv, mhead_v = st
        qn_all, q_norm = _norm_rows_seg(q_ref[...], mseg_hd)
        kn_all, k_norm = _norm_rows_seg(k_ref[...], mseg_hd)
        v_all, do_all = v_ref[...], do_ref[...]
        g_cat, e_cat = _masked_exp_scores(qn_all, kn_all, val_ref[...], st,
                                          G, Lp, Sp)
        denom = _dot(e_cat, mseg_hs, ((1,), (0,)))
        p_cat = e_cat / jnp.maximum(denom, 1e-30)
        # dv and dp need the per-problem V_bd
        dps, dvs = [], []
        for g in range(G):
            sl_l = slice(g * Lp, (g + 1) * Lp)
            sl_s = slice(g * Sp, (g + 1) * Sp)
            vbd = _dot(rv, v_all[sl_s], ((1,), (0,))) * mhead_v
            dps.append(_dot(do_all[sl_l], vbd, ((1,), (1,))))
            dvbd = _dot(p_cat[sl_l], do_all[sl_l], ((0,), (0,)))
            dvs.append(_dot(rv, dvbd * mhead_v, ((0,), (0,))))
        dp_cat = jnp.concatenate(dps, axis=0)                # [G·Lp, HSp]
        # softmax VJP with the segmented row correction (batched)
        rowseg = _dot(dp_cat * p_cat, mseg_hs, ((1,), (0,)))
        ds = p_cat * (dp_cat - rowseg)
        # -acos VJP incl. the clip gate (batched)
        gc = jnp.clip(g_cat, -1.0 + EPS, 1.0 - EPS)
        inside = jnp.abs(g_cat) < (1.0 - EPS)
        dg_cat = jnp.where(inside, ds * jax.lax.rsqrt(
            jnp.maximum(1.0 - gc * gc, 1e-12)), 0.0)
        dqns, dkns = [], []
        for g in range(G):
            sl_l = slice(g * Lp, (g + 1) * Lp)
            sl_s = slice(g * Sp, (g + 1) * Sp)
            dg = dg_cat[sl_l]
            # dq̂ = dg·K_bd2 with K_bd2[(h,s),(h,d)] = k̂[s,(h,d)]
            kbd2 = _dot(rv, kn_all[sl_s], ((1,), (0,))) * mhead_v
            dqns.append(_dot(dg, kbd2, ((1,), (0,))))
            # dk̂ via dK_bd = q̂ᵀ·dg, un-tiled back to [Sp, HD]
            dkbd = _dot(qn_all[sl_l], dg, ((0,), (0,)))      # [HD, HSp]
            dkns.append(_dot(r_tile, dkbd * mhead_k, ((1,), (1,))))
        dqn_cat = jnp.concatenate(dqns, axis=0)
        dkn_cat = jnp.concatenate(dkns, axis=0)
        # row-normalize VJPs, segment sums batched over the whole block
        dq_ref[...] = (dqn_cat - qn_all * _dot(
            dqn_cat * qn_all, mseg_hd, ((1,), (0,)))) \
            / jnp.maximum(q_norm, NORM_FLOOR)
        dk_ref[...] = (dkn_cat - kn_all * _dot(
            dkn_cat * kn_all, mseg_hd, ((1,), (0,)))) \
            / jnp.maximum(k_norm, NORM_FLOOR)
        dv_ref[...] = jnp.concatenate(dvs, axis=0)
    return kernel


def _pack_pad(q, k, v, val, G: int):
    """Pad packed [B, L, HD] inputs to sublane/grid multiples and flatten to
    the row-major 2D kernel layout [Bp·Lp, HD]. Padded keys are disabled
    through ``val``; padded query rows and padded problems compute
    zeros/garbage that the caller slices off (their do-cotangents are zero in
    backward, so they cannot pollute dk/dv)."""
    B, L, HD = q.shape
    S = k.shape[1]
    Lp = _round_up(L, _SUBLANE)
    Sp = _round_up(S, _SUBLANE)
    Bp = _round_up(B, G)
    qp = jnp.zeros((Bp, Lp, HD), jnp.float32).at[:B, :L].set(q)
    kp = jnp.zeros((Bp, Sp, HD), jnp.float32).at[:B, :S].set(k)
    vp = jnp.zeros((Bp, Sp, HD), jnp.float32).at[:B, :S].set(v)
    valp = jnp.zeros((Bp, Sp), jnp.float32).at[:B, :S].set(val)
    return (qp.reshape(Bp * Lp, HD), kp.reshape(Bp * Sp, HD),
            vp.reshape(Bp * Sp, HD), valp, (B, L, S, HD, Bp, Lp, Sp))


def _grid_specs(G, Lp, Sp, HD, H):
    HSp = H * Sp
    spec_q = pl.BlockSpec((G * Lp, HD), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((G * Sp, HD), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    # (G, HSp) is always a legal tile: G is either a multiple of 8 or the
    # whole (B < G) batch axis
    spec_val = pl.BlockSpec((G, HSp), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    def _const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)
    st = _Structural(H, HD // H, Sp)
    st_arrays = st.arrays()
    st_specs = [_const(a.shape) for a in st_arrays]
    return spec_q, spec_k, spec_val, st_arrays, st_specs


_PACKED_G = 8     # problems per grid step (unrolled in-kernel)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _packed_core(q, k, v, val, H, interpret):
    out, _ = _packed_fwd(q, k, v, val, H, interpret)
    return out


def _packed_fwd(q, k, v, val, H, interpret):
    G = min(_PACKED_G, q.shape[0])
    qp, kp, vp, valp, dims = _pack_pad(q, k, v, val, G)
    B, L, S, HD, Bp, Lp, Sp = dims
    # lane-tile validity outside the kernel: val_hs[:, h·Sp+s] = val[:, s]
    val_hs = jnp.tile(valp, (1, H))
    spec_q, spec_k, spec_val, st_arrays, st_specs = \
        _grid_specs(G, Lp, Sp, HD, H)
    out = pl.pallas_call(
        _make_packed_fwd_kernel(G, Lp, Sp),
        grid=(Bp // G,),
        in_specs=[spec_q, spec_k, spec_k, spec_val] + st_specs,
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((Bp * Lp, HD), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Lp * H * Sp * (2 * HD + Sp),
            bytes_accessed=4 * Bp * (2 * Lp * HD + 2 * Sp * HD),
            transcendentals=Bp * Lp * H * Sp,
        ),
        interpret=interpret,
    )(qp, kp, vp, val_hs, *st_arrays)
    return out.reshape(Bp, Lp, HD)[:B, :L], (q, k, v, val)


def _packed_bwd(H, interpret, res, do):
    q, k, v, val = res
    G = min(_PACKED_G, q.shape[0])
    qp, kp, vp, valp, dims = _pack_pad(q, k, v, val, G)
    B, L, S, HD, Bp, Lp, Sp = dims
    val_hs = jnp.tile(valp, (1, H))
    dop = jnp.zeros((Bp, Lp, HD), jnp.float32).at[:B, :L].set(do) \
        .reshape(Bp * Lp, HD)
    spec_q, spec_k, spec_val, st_arrays, st_specs = \
        _grid_specs(G, Lp, Sp, HD, H)
    dq, dk, dv = pl.pallas_call(
        _make_packed_bwd_kernel(G, Lp, Sp),
        grid=(Bp // G,),
        in_specs=[spec_q, spec_k, spec_k, spec_val, spec_q] + st_specs,
        out_specs=[spec_q, spec_k, spec_k],
        out_shape=[jax.ShapeDtypeStruct((Bp * Lp, HD), jnp.float32),
                   jax.ShapeDtypeStruct((Bp * Sp, HD), jnp.float32),
                   jax.ShapeDtypeStruct((Bp * Sp, HD), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, val_hs, dop, *st_arrays)
    return (dq.reshape(Bp, Lp, HD)[:B, :L],
            dk.reshape(Bp, Sp, HD)[:B, :S],
            dv.reshape(Bp, Sp, HD)[:B, :S], jnp.zeros_like(val))


_packed_core.defvjp(_packed_fwd, _packed_bwd)


def packed_geodesic_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                              *, kv_valid: jnp.ndarray | None = None,
                              interpret: bool | None = None) -> jnp.ndarray:
    """Head-packed small-shape MHGSA: softmax_j(-acos(q̂_i·k̂_j))·V.

    q [..., H, L, Dh], k/v [..., H, S, Dh] with H·Dh ≤ 128; kv_valid
    [..., S] (no head axis; 1 = real key) or None. Returns [..., H, L, Dh].

    The head axis is an execution-layout hint: results are identical for any
    independent batch axis in that position. fp32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, H, L, Dh = q.shape
    S = k.shape[-2]
    if H * Dh > 128:
        raise ValueError(f"packed kernel needs H*Dh <= 128, got {H}*{Dh}")
    B = 1
    for d in lead:
        B *= d
    def pack(x, n):
        x = x.reshape(B, H, n, Dh).astype(jnp.float32)
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(B, n, H * Dh)
    qp, kp, vp = pack(q, L), pack(k, S), pack(v, S)
    if kv_valid is None:
        val = jnp.ones((B, S), jnp.float32)
    else:
        val = jnp.broadcast_to(kv_valid, (*lead, S)) \
            .reshape(B, S).astype(jnp.float32)
    out = _packed_core(qp, kp, vp, val, H, interpret)
    out = out.reshape(B, L, H, Dh)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(*lead, H, L, Dh)
