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

from sttode_tpu.kernels.mhgsa import (EPS, NORM_FLOOR, _SUBLANE, _acos,
                                      _dot, _round_up)


class _Structural:
    """Compile-time 0/1 matrices encoding the packed block structure.

    mseg_hd [HD, HD]   block-ones over Dh-lane groups (per-head ‖·‖² sums)
    r_tile  [Sp, HSp]  R[s, h·Sp+s'] = δ_{ss'}  (lane-tiling by matmul)
    mhead_k [HD, HSp]  1{head(row) = head(col)} (block-diag gate, K_bd form)
    mseg_hs [HSp, HSp] block-ones over Sp-lane groups (segmented softmax sums)
    rv      [HSp, Sp]  R^T (sublane-tiling / un-tiling by matmul)
    mhead_v [HSp, HD]  1{head(row) = head(col)} (block-diag gate, V_bd form)

    ``factorized``: mseg_hs is quadratic in H·Sp (4 MB of VMEM at HSp=1024);
    beyond HSp=512 it is replaced by an 8×128 placeholder and the segmented
    sums run as mhead_v·mhead_k/Dh instead (two thin matmuls — see
    ``_make_seg_hs``), which is exact: (x·mhead_v)[i,(h,d)] = Σ_{head(j)=h}
    x[i,j] independent of d, and ·mhead_k broadcasts it back Dh times.
    """

    def __init__(self, H: int, Dh: int, Sp: int, factorized: bool = False):
        HD, HSp = H * Dh, H * Sp
        r_hd = np.arange(HD)
        r_hs = np.arange(HSp)
        self.mseg_hd = (r_hd[:, None] // Dh == r_hd[None, :] // Dh)
        self.r_tile = (np.arange(Sp)[:, None] == r_hs[None, :] % Sp)
        self.mhead_k = (r_hd[:, None] // Dh == r_hs[None, :] // Sp)
        self.mseg_hs = np.zeros((8, 128)) if factorized else \
            (r_hs[:, None] // Sp == r_hs[None, :] // Sp)
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


def _masked_exp_scores(qn_all, kn_all, val, st, g0, n, Lp, Sp,
                       want_g: bool = False):
    """Shared fwd/bwd recompute for problems [g0, g0+n): per-problem Gram +
    acos scores + masked exp, concatenated back into row blocks. Returns
    (g_cat [n·Lp, HSp] or None, e_cat [n·Lp, HSp])."""
    _, r_tile, mhead_k, _, _, _ = st
    gs, es = [], []
    for g in range(g0, g0 + n):
        kn = kn_all[g * Sp:(g + 1) * Sp]
        kbd = _dot(kn, r_tile, ((0,), (0,))) * mhead_k       # [HD, HSp]
        gg = _dot(qn_all[g * Lp:(g + 1) * Lp], kbd, ((1,), (0,)))
        gc = jnp.clip(gg, -1.0 + EPS, 1.0 - EPS)
        # masking as a multiply on exp: exp(-acos) ∈ [e^-π, 1] is finite, so
        # e·0 ≡ exp(score + NEG_INF) without materializing masked scores
        e = jnp.exp(-_acos(gc)) * val[g:g + 1, :]
        if want_g:
            gs.append(gg)
        es.append(e)
    g_cat = jnp.concatenate(gs, axis=0) if want_g else None
    return g_cat, jnp.concatenate(es, axis=0)


def _make_seg_hs(st, Dh: int, factorized: bool):
    """Segmented row-sum over Sp-lane groups, broadcast back over each group:
    one matmul against the block-ones mseg_hs, or — when that matrix is too
    big for VMEM — two thin matmuls against the block-diag head gates
    (exactly Dh× the segment sum, hence the 1/Dh)."""
    _, _, mhead_k, mseg_hs, _, mhead_v = st
    if factorized:
        return lambda x: _dot(_dot(x, mhead_v, ((1,), (0,))),
                              mhead_k, ((1,), (0,))) * (1.0 / Dh)
    return lambda x: _dot(x, mseg_hs, ((1,), (0,)))


def _make_packed_fwd_kernel(G: int, C: int, Dh: int, Lp: int, Sp: int,
                            factorized: bool):
    """``C`` problems are processed per sequential in-kernel chunk (C | G):
    every [·, HSp] score-sized temporary is chunk-local and its output rows
    are stored before the next chunk's temporaries go live, bounding the
    Mosaic VMEM stack at fat shapes (at the flagship shape C == G and the
    program is the fully batched one)."""
    def kernel(q_ref, k_ref, v_ref, val_ref, mseg_hd_ref, r_tile_ref,
               mhead_k_ref, mseg_hs_ref, rv_ref, mhead_v_ref, o_ref):
        st = (mseg_hd_ref[...], r_tile_ref[...], mhead_k_ref[...],
              mseg_hs_ref[...], rv_ref[...], mhead_v_ref[...])
        mseg_hd, _, _, _, rv, mhead_v = st
        seg_hs = _make_seg_hs(st, Dh, factorized)
        qn_all, _ = _norm_rows_seg(q_ref[...], mseg_hd)      # [G·Lp, HD]
        kn_all, _ = _norm_rows_seg(k_ref[...], mseg_hd)      # [G·Sp, HD]
        v_all = v_ref[...]
        val = val_ref[...]
        for c0 in range(0, G, C):
            _, e_cat = _masked_exp_scores(qn_all, kn_all, val, st,
                                          c0, C, Lp, Sp)
            denom = seg_hs(e_cat)                            # chunk-batched
            p_cat = e_cat / jnp.maximum(denom, 1e-30)
            outs = []
            for j in range(C):
                g = c0 + j
                vbd = _dot(rv, v_all[g * Sp:(g + 1) * Sp],
                           ((1,), (0,))) * mhead_v           # [HSp, HD]
                outs.append(_dot(p_cat[j * Lp:(j + 1) * Lp], vbd,
                                 ((1,), (0,))))
            o_ref[c0 * Lp:(c0 + C) * Lp] = jnp.concatenate(outs, axis=0)
    return kernel


def _make_packed_bwd_kernel(G: int, C: int, Dh: int, Lp: int, Sp: int,
                            factorized: bool):
    """Chunked like the forward (see _make_packed_fwd_kernel): the backward
    holds ~2× more live score-sized temporaries per problem, so its C is
    chosen separately (usually smaller)."""
    def kernel(q_ref, k_ref, v_ref, val_ref, do_ref,
               mseg_hd_ref, r_tile_ref, mhead_k_ref, mseg_hs_ref,
               rv_ref, mhead_v_ref, dq_ref, dk_ref, dv_ref):
        st = (mseg_hd_ref[...], r_tile_ref[...], mhead_k_ref[...],
              mseg_hs_ref[...], rv_ref[...], mhead_v_ref[...])
        mseg_hd, r_tile, mhead_k, _, rv, mhead_v = st
        seg_hs = _make_seg_hs(st, Dh, factorized)
        qn_all, q_norm = _norm_rows_seg(q_ref[...], mseg_hd)
        kn_all, k_norm = _norm_rows_seg(k_ref[...], mseg_hd)
        v_all, do_all = v_ref[...], do_ref[...]
        val = val_ref[...]
        for c0 in range(0, G, C):
            sl_cl = slice(c0 * Lp, (c0 + C) * Lp)
            sl_cs = slice(c0 * Sp, (c0 + C) * Sp)
            g_cat, e_cat = _masked_exp_scores(qn_all, kn_all, val, st,
                                              c0, C, Lp, Sp, want_g=True)
            denom = seg_hs(e_cat)
            p_cat = e_cat / jnp.maximum(denom, 1e-30)
            # dv and dp need the per-problem V_bd
            dps, dvs = [], []
            for j in range(C):
                sl_l = slice(j * Lp, (j + 1) * Lp)
                sl_s = slice((c0 + j) * Sp, (c0 + j + 1) * Sp)
                do_g = do_all[(c0 + j) * Lp:(c0 + j + 1) * Lp]
                vbd = _dot(rv, v_all[sl_s], ((1,), (0,))) * mhead_v
                dps.append(_dot(do_g, vbd, ((1,), (1,))))
                dvbd = _dot(p_cat[sl_l], do_g, ((0,), (0,)))
                dvs.append(_dot(rv, dvbd * mhead_v, ((0,), (0,))))
            dp_cat = jnp.concatenate(dps, axis=0)            # [C·Lp, HSp]
            # softmax VJP with the segmented row correction (chunk-batched)
            rowseg = seg_hs(dp_cat * p_cat)
            ds = p_cat * (dp_cat - rowseg)
            # -acos VJP incl. the clip gate (chunk-batched)
            gc = jnp.clip(g_cat, -1.0 + EPS, 1.0 - EPS)
            inside = jnp.abs(g_cat) < (1.0 - EPS)
            dg_cat = jnp.where(inside, ds * jax.lax.rsqrt(
                jnp.maximum(1.0 - gc * gc, 1e-12)), 0.0)
            dqns, dkns = [], []
            for j in range(C):
                sl_l = slice(j * Lp, (j + 1) * Lp)
                sl_s = slice((c0 + j) * Sp, (c0 + j + 1) * Sp)
                dg = dg_cat[sl_l]
                # dq̂ = dg·K_bd2 with K_bd2[(h,s),(h,d)] = k̂[s,(h,d)]
                kbd2 = _dot(rv, kn_all[sl_s], ((1,), (0,))) * mhead_v
                dqns.append(_dot(dg, kbd2, ((1,), (0,))))
                # dk̂ via dK_bd = q̂ᵀ·dg, un-tiled back to [Sp, HD]
                dkbd = _dot(qn_all[c0 * Lp + j * Lp:
                                   c0 * Lp + (j + 1) * Lp], dg,
                            ((0,), (0,)))                    # [HD, HSp]
                dkns.append(_dot(r_tile, dkbd * mhead_k, ((1,), (1,))))
            dqn_cat = jnp.concatenate(dqns, axis=0)
            dkn_cat = jnp.concatenate(dkns, axis=0)
            # row-normalize VJPs, segment sums batched over the chunk
            dq_ref[sl_cl] = (dqn_cat - qn_all[sl_cl] * _dot(
                dqn_cat * qn_all[sl_cl], mseg_hd, ((1,), (0,)))) \
                / jnp.maximum(q_norm[sl_cl], NORM_FLOOR)
            dk_ref[sl_cs] = (dkn_cat - kn_all[sl_cs] * _dot(
                dkn_cat * kn_all[sl_cs], mseg_hd, ((1,), (0,)))) \
                / jnp.maximum(k_norm[sl_cs], NORM_FLOOR)
            dv_ref[sl_cs] = jnp.concatenate(dvs, axis=0)
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


def _grid_specs(G, Lp, Sp, HD, H, factorized):
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
    st = _Structural(H, HD // H, Sp, factorized)
    st_arrays = st.arrays()
    st_specs = [_const(a.shape) for a in st_arrays]
    return spec_q, spec_k, spec_val, st_arrays, st_specs


_PACKED_G = 8     # problems per grid step (unrolled in-kernel)
_VMEM_BUDGET = 13 * 1024 * 1024   # vs the 16 MB scoped-VMEM limit, with
                                  # headroom for Mosaic's own spills
_FACTORIZE_HSP = 512              # beyond this, mseg_hs (4·HSp² bytes) is
                                  # dropped for the two-matmul segment sum


def _vmem_plan(G, Lp, Sp, HD, H, n_temps, extra_blocks=0):
    """(C, factorized, fits): largest chunk C | G whose estimated VMEM stack
    fits the budget. The estimate counts the grid-step input blocks
    (+``extra_blocks`` q-sized ones, e.g. the backward's do), the whole-block
    q̂/k̂/norm copies, the structural constants, and ``n_temps`` live
    [C·Lp, H·Sp]-sized fp32 temporaries per chunk (the dominant term at fat
    shapes — Mosaic's stack allocator was measured OOMing at exactly the sum
    of these, see the B=128 train-step compile failure this guards against).
    """
    HSp = H * Sp
    factorized = HSp > _FACTORIZE_HSP
    structural = 4 * (HD * HD + 2 * Sp * HSp + 2 * HD * HSp
                      + (8 * 128 if factorized else HSp * HSp))
    # ×2: Mosaic double-buffers the grid-step input blocks for its DMA
    # pipeline
    inputs = 2 * 4 * G * ((1 + extra_blocks) * Lp * HD + 2 * Sp * HD + HSp)
    whole_block = 4 * G * 3 * (Lp + Sp) * HD   # q̂/k̂ + norms + x·x slack
    fixed = structural + inputs + whole_block
    c = G
    while c > 1 and fixed + n_temps * 4 * c * Lp * HSp > _VMEM_BUDGET:
        c = max(d for d in range(1, c) if G % d == 0)
    fits = fixed + n_temps * 4 * c * Lp * HSp <= _VMEM_BUDGET
    return c, factorized, fits


def packed_vmem_fit(L: int, S: int, H: int, Dh: int) -> bool:
    """True iff both packed passes compile within the scoped-VMEM budget at
    their smallest chunk — the routing guard (`nn.attention._kernel_route`)
    that keeps `auto` from selecting an uncompilable kernel at fat shapes."""
    Lp, Sp = _round_up(L, _SUBLANE), _round_up(S, _SUBLANE)
    _, _, fwd_ok = _vmem_plan(_PACKED_G, Lp, Sp, H * Dh, H, _FWD_TEMPS)
    _, _, bwd_ok = _vmem_plan(_PACKED_G, Lp, Sp, H * Dh, H, _BWD_TEMPS,
                              extra_blocks=1)
    return fwd_ok and bwd_ok


# Live [C·Lp, H·Sp]-sized temporaries Mosaic's stack actually holds per
# chunk, CALIBRATED against real compile failures, not just the named
# values: the nominal fwd set is {e_cat, denom, p_cat} and bwd
# {g_cat, e_cat, denom, p_cat, dp_cat, rowseg, ds, dg_cat}, but the
# measured bwd stacks at Lp=Sp=128/HSp=1024 were 16.45 MB at C=2 and
# 17.02 MB even at C=1 (⇒ ~23 score-temps/problem once per-g partials,
# the clip/where select operands, and Mosaic's own copies are counted).
# Under-modeling here reproduces the compile-time OOM this module guards
# against, so the backward carries the full calibrated count plus margin.
_FWD_TEMPS = 6
_BWD_TEMPS = 26


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _packed_core(q, k, v, val, H, interpret):
    out, _ = _packed_fwd(q, k, v, val, H, interpret)
    return out


def _packed_fwd(q, k, v, val, H, interpret):
    G = min(_PACKED_G, q.shape[0])
    qp, kp, vp, valp, dims = _pack_pad(q, k, v, val, G)
    B, L, S, HD, Bp, Lp, Sp = dims
    C, factorized, fits = _vmem_plan(G, Lp, Sp, HD, H, _FWD_TEMPS)
    if not (fits or interpret):
        raise ValueError(
            f"packed kernel cannot fit L={L} S={S} H={H} Dh={HD // H} in "
            "scoped VMEM even one problem at a time; use the fused/flash "
            "kernels (auto routes around this via packed_vmem_fit)")
    # lane-tile validity outside the kernel: val_hs[:, h·Sp+s] = val[:, s]
    val_hs = jnp.tile(valp, (1, H))
    spec_q, spec_k, spec_val, st_arrays, st_specs = \
        _grid_specs(G, Lp, Sp, HD, H, factorized)
    out = pl.pallas_call(
        _make_packed_fwd_kernel(G, C, HD // H, Lp, Sp, factorized),
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
    C, factorized, fits = _vmem_plan(G, Lp, Sp, HD, H, _BWD_TEMPS,
                                     extra_blocks=1)
    if not (fits or interpret):
        raise ValueError(
            f"packed backward cannot fit L={L} S={S} H={H} Dh={HD // H} in "
            "scoped VMEM even one problem at a time; use the fused/flash "
            "kernels (auto routes around this via packed_vmem_fit)")
    val_hs = jnp.tile(valp, (1, H))
    dop = jnp.zeros((Bp, Lp, HD), jnp.float32).at[:B, :L].set(do) \
        .reshape(Bp * Lp, HD)
    spec_q, spec_k, spec_val, st_arrays, st_specs = \
        _grid_specs(G, Lp, Sp, HD, H, factorized)
    dq, dk, dv = pl.pallas_call(
        _make_packed_bwd_kernel(G, C, HD // H, Lp, Sp, factorized),
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
