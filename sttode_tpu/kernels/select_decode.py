"""Fused Pallas kernel for the gradient-free best-of-K selection decode.

The selection decode is the flagship train step's dominant component (the
named owner of the B≥256 falloff, BENCHMARKS.md round-3 notes): it decodes
all K=20 latent samples per agent — R = scenes·agents·K ≈ 10⁴-10⁵ rows —
purely to pick the argmin winner, which is then recomputed differentiably.
Under XLA every matmul boundary of that decode round-trips an [R, 512]-class
intermediate through HBM (231 MB per MLP layer at B=512), which is why bf16
selection (`select_dtype`) and GRU un-hoisting were the two levers that paid.

This kernel runs the ENTIRE per-row decode chain of reference
model/STTODE.py:320-347 (num_decompose=2, block-1 state precomputed by
``decode_block0_state``) inside one VMEM-resident tile program:

    block0:  y0 = MLP_y0(pf, z, state0)          x0 = MLP_x0(pf, z, state0)
    block1:  res = x_true − x0
             h   = relu(conv1d(res))             (conv folded to ONE matmul
                                                  against a band matrix)
             state = GRU(h)  (T unrolled; ALL T·3 gate input projections are
                              ONE band-folded matmul, gate lanes padded to
                              128 so every slice is tile-aligned)
             y1 = MLP_y1(pf, z, state)
    out:     pred_rel = y0 + y1                  (caller re-adds cur_location)
    dist:    Σ (future_rel − pred_rel)²          (mode="dist": ONE fp32 scalar
                                                  per row leaves the chip)

Grid and data layout exploit the K-repeat structure instead of materializing
it (v3 — the v1/v2 flat-row layouts measured BEHIND XLA at step level because
every repeated operand had to be written to HBM for the kernel to read;
BENCHMARKS.md round-3 notes):

  - grid = (M/TM, K) with k innermost; per-scene operands (past_feature,
    block-0 state, x_true, future) use index maps that IGNORE k, so Mosaic
    fetches each block once per m-tile and the K-fold repeat never exists
    in HBM at all — only z [K, M, Z] is truly per-(m,k)
  - the z-independent first-layer partials (pf/state0 contributions of both
    blocks' first MLP layers) are computed at k=0 into VMEM scratch and
    reused for the remaining K−1 samples: ~17% of the kernel's FLOPs and
    two matmul issues per k-step saved

HBM traffic per (scene, K) collapses to reading the true per-scene inputs
once plus z, and writing K fp32 scalars; the MLP contractions
([TM,·]×[·,512]-class) keep the MXU fed. All weights (~1.8 MB bf16) stay
VMEM-resident across the whole grid via constant index maps.

Everything computes in ``dtype`` (bf16 by default — the exact numerics the
shipped ``select_dtype="bfloat16"`` XLA path uses) with fp32 accumulation;
``mode="traj"`` returns the relative trajectories instead (the inference
decode's shape). Forward-only by design: the selection decode runs under
``stop_gradient``, so no VJP exists or is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sttode_tpu.kernels.mhgsa import _round_up

_GRU_H = 96          # fixed by the DecomposeBlock (models/_decompose_init)
_CONV_C = 32
_GATE_PAD = 128      # each GRU gate padded 96→128 lanes so every in-kernel
                     # slice is tile-aligned; padded lanes are provably zero
                     # (zero fold cols × zero w_hh pad rows × zero bias pad)


def _mm(a, b):
    """MXU contraction with fp32 accumulation at DEFAULT precision — on bf16
    operands this is the single-pass MXU mode (the selection decode's shipped
    numerics); the geodesic kernels' HIGHEST-precision helper is deliberately
    NOT used here."""
    return jax.lax.dot_general(a, b, ((((a.ndim - 1),), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


# --------------------------------------------------------------------------- #
# weight preparation (host side, jit-traceable)                               #
# --------------------------------------------------------------------------- #

def _band_conv_matrix(w, b, t_past: int, dtype):
    """Fold Conv1d(2→32, k=3, pad=1) over T=t_past into one [2T, 32T] band
    matrix: h_flat = relu(res_flat @ W + b_full) equals the conv exactly.
    w: [3, 2, 32] (WIO), b: [32]."""
    k_size, c_in, c_out = w.shape
    # ones at [t_in, t_out] where t_in = t_out + k − 1: constant shifted
    # identities — the einsum costs ONE fused op per train step instead of
    # the 15 scatters a .at[].set loop would put inside the scan body
    eyes = jnp.stack([jnp.eye(t_past, t_past, k=-(k - 1), dtype=w.dtype)
                      for k in range(k_size)])
    full = jnp.einsum("kts,kco->tcso", eyes, w)
    wc = full.reshape(t_past * c_in, t_past * c_out).astype(dtype)
    bc = jnp.tile(b, (t_past,)).reshape(1, -1).astype(dtype)
    return wc, bc


def _band_gru_fold(w_ih, t_past: int, c_in: int, dtype):
    """ALL steps' × ALL gates' input projections as ONE band matrix over the
    flat conv output: gi_all = h_flat @ fold, gi_all[:, 384·t + 128·g : +96]
    = h_t @ w_ih_g. Shape [T·C, T·3·128]; slices land on 128-lane tiles."""
    h = w_ih.shape[1] // 3
    w_pad = jnp.pad(w_ih.reshape(c_in, 3, h),
                    ((0, 0), (0, 0), (0, _GATE_PAD - h)))
    eye = jnp.eye(t_past, dtype=w_ih.dtype)
    f = jnp.einsum("ts,cgp->tcsgp", eye, w_pad)
    return f.reshape(t_past * c_in, t_past * 3 * _GATE_PAD).astype(dtype)


def _pad_gru_recurrent(w_hh, dtype):
    """w_hh [H, 3H] → [128, 3·128]: rows ≥ H and each gate's lanes ≥ H are
    zero, so the padded state lanes can never leak into real ones."""
    h = w_hh.shape[0]
    out = jnp.pad(w_hh.reshape(h, 3, h),
                  ((0, _GATE_PAD - h), (0, 0), (0, _GATE_PAD - h)))
    return out.reshape(_GATE_PAD, 3 * _GATE_PAD).astype(dtype)


def _pad_bias(b, width: int):
    return jnp.pad(b.astype(jnp.float32), (0, width - b.shape[0])) \
        .reshape(1, -1)


def _mlp_tail(mlp, dtype):
    """Layers 2..3 of a decoder MLP (the first layer is fused across heads)."""
    _, l1, l2 = mlp["layers"]
    return (l1["w"].astype(dtype), l1["b"].reshape(1, -1).astype(dtype),
            l2["w"].astype(dtype), l2["b"].reshape(1, -1).astype(dtype))


def prep_select_weights(params: dict, pf_width: int, z_width: int,
                        t_past: int, dtype=jnp.bfloat16):
    """Flatten the two decompose blocks into the kernel's weight tuple.
    First MLP layers split three ways (pf rows | z rows | state rows) so the
    kernel never concatenates operands and can cache the z-independent
    partials across the K loop."""
    assert len(params["decoder"]) == 2, \
        "select_decode kernel supports num_decompose=2 (the reference config)"
    b0, b1 = params["decoder"]
    d2, zw = pf_width, z_width

    def l0(mlp):
        return mlp["layers"][0]

    # block 0: fused first layer — lanes [0:512) = decoder_y, [512:1024) = x
    w1cat = jnp.concatenate([l0(b0["decoder_y"])["w"],
                             l0(b0["decoder_x"])["w"]], axis=1)
    b1cat = jnp.concatenate([l0(b0["decoder_y"])["b"],
                             l0(b0["decoder_x"])["b"]]).reshape(1, -1)
    out = [w1cat[:d2].astype(dtype), w1cat[d2:d2 + zw].astype(dtype),
           w1cat[d2 + zw:].astype(dtype), b1cat.astype(jnp.float32)]
    out += _mlp_tail(b0["decoder_y"], dtype)
    out += _mlp_tail(b0["decoder_x"], dtype)

    # block 1: conv band + GRU folds + decoder_y (state rows padded to 128)
    conv = b1["conv_past"]
    wc, bc = _band_conv_matrix(conv.w, conv.b, t_past, dtype)
    out += [wc, bc]
    gru = b1["gru"]
    out += [_band_gru_fold(gru.w_ih, t_past, _CONV_C, dtype),
            _pad_gru_recurrent(gru.w_hh, dtype)]
    h = _GRU_H
    b_ih, b_hh = gru.b_ih, gru.b_hh
    out += [_pad_bias(b_ih[:h] + b_hh[:h], _GATE_PAD),
            _pad_bias(b_ih[h:2 * h] + b_hh[h:2 * h], _GATE_PAD),
            _pad_bias(b_ih[2 * h:], _GATE_PAD),
            _pad_bias(b_hh[2 * h:], _GATE_PAD)]
    w1y1 = l0(b1["decoder_y"])["w"]
    w1y1s_pad = jnp.pad(w1y1[d2 + zw:], ((0, _GATE_PAD - _GRU_H), (0, 0)))
    out += [w1y1[:d2].astype(dtype), w1y1[d2:d2 + zw].astype(dtype),
            w1y1s_pad.astype(dtype),
            l0(b1["decoder_y"])["b"].reshape(1, -1).astype(jnp.float32)]
    out += _mlp_tail(b1["decoder_y"], dtype)
    return tuple(out)


# --------------------------------------------------------------------------- #
# kernel                                                                      #
# --------------------------------------------------------------------------- #

def _select_kernel(pf_ref, z_ref, state0_ref, xt_ref, fut_ref,
                   w1c_pf, w1c_z, w1c_s, b1c, w2y0, b2y0, w3y0, b3y0,
                   w2x, b2x, w3x, b3x,
                   wc, bc, fold, whh,
                   b_r, b_z, b_in, b_hn,
                   w1y1_pf, w1y1_z, w1y1_s, b1y1, w2y1, b2y1, w3y1, b3y1,
                   out_ref, base0_ref, base1_ref,
                   *, mode: str, dtype, t_past: int):
    f32 = jnp.float32
    gp = _GATE_PAD
    k_block = z_ref.shape[0]

    # z-independent first-layer partials: computed once per m-tile (k == 0),
    # reused for the remaining K−1 samples from VMEM scratch
    @pl.when(pl.program_id(1) == 0)
    def _():
        pf = pf_ref[...]
        s0 = state0_ref[...]
        base0_ref[...] = (_mm(pf, w1c_pf[...]) + _mm(s0, w1c_s[...])
                          + b1c[...])                             # [TM, 1024]
        base1_ref[...] = _mm(pf, w1y1_pf[...]) + b1y1[...]        # [TM, 512]

    # k_block > 1 emits several INDEPENDENT per-sample chains per grid step —
    # interleavable work for the scheduler to hide each chain's serial
    # latency (the GRU loop's recurrent matmul chain is the kernel's floor)
    for kb in range(k_block):
        z = z_ref[kb]                                             # [TM, Z]

        # block 0 — ONE fused first layer for both heads, lanes [y | x]
        acat = jax.nn.relu(base0_ref[...] + _mm(z, w1c_z[...]))   # [TM, 1024]
        w512 = w2y0.shape[0]
        a_y = acat[:, :w512].astype(dtype)
        a_x = acat[:, w512:].astype(dtype)
        a2y = jax.nn.relu(_mm(a_y, w2y0[...]) + b2y0[...].astype(f32))
        y0 = _mm(a2y.astype(dtype), w3y0[...]) + b3y0[...].astype(f32)
        a2x = jax.nn.relu(_mm(a_x, w2x[...]) + b2x[...].astype(f32))
        x0 = _mm(a2x.astype(dtype), w3x[...]) + b3x[...].astype(f32)

        # block 1 — conv band matmul, ONE folded input projection for all
        # T·3 gates (gate lanes padded to 128: all slices tile-aligned), then
        # only the recurrent matmul stays in the sequential loop
        res = (xt_ref[...] - x0).astype(dtype)                    # [TM, 2T]
        hflat = jax.nn.relu(_mm(res, wc[...]) +
                            bc[...].astype(f32)).astype(dtype)
        gi = _mm(hflat, fold[...]).astype(dtype)                  # [TM, T·384]

        st = jnp.zeros((z.shape[0], gp), dtype)  # fresh GRU state (h0=None)
        for t in range(t_past):
            gh = _mm(st, whh[...])                                # [TM, 384]
            o = 3 * gp * t
            r = jax.nn.sigmoid(gi[:, o:o + gp] + gh[:, :gp] + b_r[...])
            zz = jax.nn.sigmoid(gi[:, o + gp:o + 2 * gp] + gh[:, gp:2 * gp]
                                + b_z[...])
            n = jnp.tanh(gi[:, o + 2 * gp:o + 3 * gp] + b_in[...]
                         + r * (gh[:, 2 * gp:] + b_hn[...]))
            st = ((1.0 - zz) * n + zz * st.astype(f32)).astype(dtype)

        a1 = jax.nn.relu(base1_ref[...] + _mm(z, w1y1_z[...])
                         + _mm(st, w1y1_s[...]))
        a2 = jax.nn.relu(_mm(a1.astype(dtype), w2y1[...])
                         + b2y1[...].astype(f32))
        y1 = _mm(a2.astype(dtype), w3y1[...]) + b3y1[...].astype(f32)

        pred = y0 + y1                                             # fp32
        if mode == "dist":
            d = fut_ref[...] - pred
            out_ref[kb] = jnp.sum(d * d, axis=1, keepdims=True)
        else:
            out_ref[kb] = pred


def _default_m_tile(M: int, dtype) -> int:
    """Waste-aware default scene tile.

    The dtype-aware CAP comes from Mosaic's scoped-VMEM stack: measured
    17.31 MB at fp32/512 (over the 16 MB limit — compile OOM), fits at
    fp32/256 and bf16/512. But ``round_up(M, cap)`` alone pads the scene
    axis up to ~2× (M = cap+8 would decode 2·cap rows) and this kernel IS
    the step's dominant component — so spread M over the minimal tile count
    at the cap, then shrink the tile to just cover it: padding drops to
    < one 8-row sublane group per tile. Perf-safe: the round-4 tile sweep
    (128/256/384/512) measured ±1% (BENCHMARKS.md round-4 notes)."""
    cap = 512 if dtype == jnp.bfloat16 else 256
    n_tiles = -(-M // cap)
    return min(cap, max(128, _round_up(-(-M // n_tiles), 8)))


def select_decode(params: dict, past_feature: jnp.ndarray, z_km: jnp.ndarray,
                  state0: jnp.ndarray, x_true_flat: jnp.ndarray,
                  future_rel_flat: jnp.ndarray,
                  *, mode: str = "dist", m_tile: int | None = None,
                  k_block: int = 1, dtype=jnp.bfloat16,
                  interpret: bool = False) -> jnp.ndarray:
    """Fused selection decode over M scenes·agents × K samples.

    past_feature [M, 2D] and state0 [M, 96] UNREPEATED (the kernel's index
    maps realize the K-repeat for free); z_km [K, M, Z] (k-major — transpose
    of the sampler's [M·K, Z] layout); x_true_flat [M, 2·T_p];
    future_rel_flat [M, 2·T_f] fp32 (future − cur_location; pass zeros under
    mode="traj", it is only shape-read).
    Returns dist [M, K] fp32 (mode="dist" — argmin over axis 1) or relative
    trajectories [K, M, 2·T_f] fp32 (mode="traj" — caller re-adds
    cur_location).
    """
    # not asserts: under python -O an assert vanishes and a K % k_block
    # mismatch would silently truncate the grid's K axis (uninitialized
    # output rows feeding the argmin)
    if mode not in ("dist", "traj"):
        raise ValueError(f"mode must be 'dist' or 'traj', got {mode!r}")
    M, d2 = past_feature.shape
    K, _, zw = z_km.shape
    if K % k_block != 0:
        raise ValueError(f"K ({K}) must be divisible by k_block ({k_block})")
    t_fut2 = future_rel_flat.shape[1]
    t_past = x_true_flat.shape[1] // 2
    weights = prep_select_weights(params, d2, zw, t_past, dtype)

    if m_tile is None:
        m_tile = _default_m_tile(M, dtype)
    m_tile = min(m_tile, _round_up(M, 16))
    mp = _round_up(M, m_tile)

    def _pad(a, dt):
        a = a.astype(dt)
        if mp == M:
            return a
        pad = [(0, 0)] * a.ndim
        pad[-2] = (0, mp - M)
        return jnp.pad(a, pad)

    # per-scene operands stream at the compute dtype; x_true and the fp32
    # distance target stay fp32 (the XLA select path computes dist in fp32)
    pf = _pad(past_feature, dtype)
    z_km = _pad(z_km, dtype)
    state0 = _pad(state0, dtype)
    x_true_flat = _pad(x_true_flat, jnp.float32)
    future_rel_flat = _pad(future_rel_flat, jnp.float32)

    assert K % k_block == 0, (K, k_block)
    scene_spec = lambda w: pl.BlockSpec((m_tile, w), lambda i, k: (i, 0))
    const_spec = lambda a: pl.BlockSpec(a.shape, lambda i, k: (0,) * a.ndim)
    if mode == "dist":
        # Mosaic wants the last two block dims divisible by (8, 128) or
        # equal to the array dims — a [·, K] column write violates that, so
        # dist lands k-major [K, mp, 1] and transposes on the way out (tiny)
        out_spec = pl.BlockSpec((k_block, m_tile, 1), lambda i, k: (k, i, 0))
        out_shape = (K, mp, 1)
    else:
        out_spec = pl.BlockSpec((k_block, m_tile, t_fut2),
                                lambda i, k: (k, i, 0))
        out_shape = (K, mp, t_fut2)
    base0_w = weights[0].shape[1]                 # fused block-0 L1 width
    base1_w = weights[-4].shape[0]                # block-1 L1 width

    out = pl.pallas_call(
        functools.partial(_select_kernel, mode=mode, dtype=dtype,
                          t_past=t_past),
        grid=(mp // m_tile, K // k_block),
        in_specs=[scene_spec(d2),
                  pl.BlockSpec((k_block, m_tile, zw), lambda i, k: (k, i, 0)),
                  scene_spec(_GRU_H), scene_spec(2 * t_past),
                  scene_spec(t_fut2)]
                 + [const_spec(w) for w in weights],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((m_tile, base0_w), jnp.float32),
                        pltpu.VMEM((m_tile, base1_w), jnp.float32)],
        interpret=interpret,
    )(pf, z_km, state0, x_true_flat, future_rel_flat, *weights)
    return out[:, :M, 0].T if mode == "dist" else out[:, :M, :]
