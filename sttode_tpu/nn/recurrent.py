"""Sequence primitives: GRU on ``lax.scan`` and temporal Conv1d.

TPU-native replacements for the cuDNN GRU / Conv1d the reference's
DecomposeBlock consumes (model/STTODE.py:30-31,65-68; SURVEY.md §2.4):

- GRU: torch gate equations (r, z, n with the hidden-bias-inside-r·(W_hn h)
  form), one fused [D, 3H] input matmul and one fused [H, 3H] hidden matmul per
  step. T is tiny (5-12) so the scan's serial critical path is short; the
  per-step matmuls batch over N·samples on the MXU, which is where the FLOPs
  are.
- Conv1d: ``lax.conv_general_dilated`` in NCT layout feature-major on the MXU.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sttode_tpu.nn import core


class GRUParams(NamedTuple):
    w_ih: jnp.ndarray  # [D, 3H]  (gate order: r, z, n — torch convention)
    w_hh: jnp.ndarray  # [H, 3H]
    b_ih: jnp.ndarray  # [3H]
    b_hh: jnp.ndarray  # [3H]


def gru_init(key, input_dim: int, hidden_dim: int, *, w_init=None,
             dtype=jnp.float32) -> GRUParams:
    """Default init matches the reference DecomposeBlock's override:
    kaiming_normal weights, zero biases (model/STTODE.py:41-49)."""
    if w_init is None:
        w_init = core.kaiming_normal
    k1, k2 = jax.random.split(key)
    # torch stores [3H, D]; kaiming fan_in there is D — same std per element
    # when sampling our [D, 3H] transposed layout with fan_in=D.
    return GRUParams(
        w_ih=w_init(k1, input_dim, 3 * hidden_dim, dtype=dtype),
        w_hh=w_init(k2, hidden_dim, 3 * hidden_dim, dtype=dtype),
        b_ih=jnp.zeros((3 * hidden_dim,), dtype),
        b_hh=jnp.zeros((3 * hidden_dim,), dtype),
    )


def _gru_gates(gi: jnp.ndarray, gh: jnp.ndarray,
               h: jnp.ndarray) -> jnp.ndarray:
    """torch gate equations from the two fused projections — the ONE copy of
    the gate math every GRU form (cell, hoisted scan, unhoisted scan) uses."""
    H = h.shape[-1]
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def gru_cell(params: GRUParams, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """One GRU step. x: [..., D], h: [..., H] → new h."""
    gi = x @ params.w_ih + params.b_ih
    gh = h @ params.w_hh + params.b_hh
    return _gru_gates(gi, gh, h)


def gru(params: GRUParams, xs: jnp.ndarray,
        h0: jnp.ndarray | None = None, *,
        hoist: bool = True,
        unroll: int | bool = 1) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run a GRU over the time axis. xs: [B, T, D] → (ys [B, T, H], h_T [B, H]).

    With ``hoist=True`` (default) the input projection ``xs @ w_ih`` moves
    out of the scan into ONE [B·T, D]×[D, 3H] MXU matmul; the scan body
    keeps only the recurrent ``h @ w_hh`` — half the sequential kernels on
    the latency-bound critical path (T is 5-12 here; at small B the
    per-step matmuls are tiny, so launch latency dominates). At huge row
    counts the tradeoff inverts: the hoisted gi_all [B, T, 3H] costs a full
    HBM round trip (3H = 9× the D=32 input width), so ``hoist=False`` keeps
    the input projection inside the scan and reads only xs — the best-of-K
    selection decode (B = scenes·agents·K ≈ 10⁵ rows) uses this. Both forms
    compute the same recurrence; only the input projection's matmul
    batching reassociates (~1e-7 under jax's default matmul precision).

    ``unroll`` forwards to ``lax.scan`` (True = full unroll): the recurrence
    stays serial either way, this only trades XLA while-loop machinery for
    code size. Measured a wash-to-LOSS at every train-step batch size on
    v5e (unroll speedup ×0.905/×0.973/×0.983 at B=32/128/512,
    scripts/gru_unroll_ab.py) — kept at 1 by default."""
    B, T, _ = xs.shape
    H = params.w_hh.shape[0]
    if h0 is None:
        h0 = jnp.zeros((B, H), xs.dtype)

    def cell(h, gi):
        gh = h @ params.w_hh + params.b_hh
        h_new = _gru_gates(gi, gh, h)
        return h_new, h_new

    if hoist:
        gi_all = xs @ params.w_ih + params.b_ih        # [B, T, 3H], one matmul
        h_final, ys = jax.lax.scan(cell, h0, jnp.swapaxes(gi_all, 0, 1),
                                   unroll=unroll)
    else:
        def step(h, x_t):
            h_new = gru_cell(params, h, x_t)
            return h_new, h_new
        h_final, ys = jax.lax.scan(step, h0, jnp.swapaxes(xs, 0, 1),
                                   unroll=unroll)
    return jnp.swapaxes(ys, 0, 1), h_final


class Conv1dParams(NamedTuple):
    w: jnp.ndarray  # [K, C_in, C_out]
    b: jnp.ndarray  # [C_out]


def conv1d_init(key, c_in: int, c_out: int, kernel: int, *,
                kaiming: bool = True, dtype=jnp.float32) -> Conv1dParams:
    """kaiming_normal(fan_in = C_in·K) weights + zero bias, the reference
    DecomposeBlock's conv init (model/STTODE.py:42,46)."""
    fan_in = c_in * kernel
    if kaiming:
        std = math.sqrt(2.0 / fan_in)
        w = std * jax.random.normal(key, (kernel, c_in, c_out), dtype)
    else:
        bound = math.sqrt(1.0 / fan_in)
        w = jax.random.uniform(key, (kernel, c_in, c_out), dtype, -bound, bound)
    return Conv1dParams(w=w, b=jnp.zeros((c_out,), dtype))


def conv1d(params: Conv1dParams, x: jnp.ndarray, *, padding: int = 1) -> jnp.ndarray:
    """x: [B, T, C_in] → [B, T', C_out] (stride 1)."""
    y = jax.lax.conv_general_dilated(
        x, params.w,
        window_strides=(1,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + params.b
