"""Ulysses-style sequence-parallel geodesic attention (SP via all-to-all).

The second of the two sequence-parallel decompositions SURVEY.md §2.6 names
for MHGSA (the first, ring/blockwise, lives in ``ring_attention.py``): instead
of rotating K/V shards around the ring, Ulysses (DeepSpeed-Ulysses, Jacobs et
al. 2023) redistributes *heads against tokens* with one ``all_to_all`` on each
side of the attention core:

    tokens sharded, heads replicated   [B, H,   L/n, Dh]
      -- all_to_all (scatter heads, gather tokens) -->
    heads sharded, tokens full         [B, H/n, L,   Dh]
      -- local dense geodesic attention over the FULL token axis -->
      -- all_to_all (scatter tokens, gather heads) -->
    tokens sharded, heads replicated   [B, H,   L/n, Dh]

Because every device sees the full key axis locally, the attention core is
exactly the dense ``softmax_j(-acos(q̂·k̂ᵀ))·V`` — no online-softmax state
machine — and per-key validity masking is a plain ``where``. The trade vs the
ring: two all-to-alls of activation size (ICI-friendly, one shot each) instead
of n ppermute hops, but head count bounds the degree of parallelism
(``H % n == 0``), whereas the ring scales with the token axis alone.

MHGSA specifics carry over unchanged from the ring path: scores are per-pair
``-acos(q̂·k̂)`` (reference hyptransformerlib.py:251-255), so the head/token
redistribution is oblivious to the metric; the reference's transposed
square-case orientation (quirk Q3) is handled by the caller swapping q and k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sttode_tpu.parallel.ring_attention import (_block_scores, _map_to_ball,
                                                NEG_INF)


def _ulysses_body(q, k, v, axis_name: str, kv_valid=None,
                  metric: str = "oblique", curvature: float = 1.0):
    """Runs inside shard_map. Local shapes: q [B, H, Lb, Dh],
    k/v [B, H, Sb, Dh] (token axes sharded, heads replicated);
    kv_valid [B, Sb] marks real key tokens of the local shard. For the
    poincare metric q/k are already ball points (mapped by the wrapper)."""
    # scatter heads, gather tokens: [B, H, Lb, Dh] -> [B, H/n, L, Dh]
    def head_to_token(x):
        return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2,
                                  tiled=True)

    qh = head_to_token(q)
    kh = head_to_token(k)
    vh = head_to_token(v)
    B, Hn, L, Dh = qh.shape
    S = kh.shape[2]

    s = _block_scores(qh.reshape(B * Hn, L, Dh), kh.reshape(B * Hn, S, Dh),
                      metric, curvature).reshape(B, Hn, L, S)
    if kv_valid is not None:
        valid = jax.lax.all_gather(kv_valid, axis_name, axis=1, tiled=True)
        s = jnp.where(valid[:, None, None, :] > 0, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhls,bhsd->bhld", p, vh,
                     precision=jax.lax.Precision.HIGHEST)
    # scatter tokens, gather heads: [B, H/n, L, Dh] -> [B, H, Lb, Dh]
    return jax.lax.all_to_all(out, axis_name, split_axis=2, concat_axis=1,
                              tiled=True)


def ulysses_geodesic_attention(q: jnp.ndarray, k: jnp.ndarray,
                               v: jnp.ndarray, mesh: Mesh, *,
                               axis: str = "data",
                               kv_valid: jnp.ndarray | None = None,
                               metric: str = "oblique",
                               curvature: float = 1.0) -> jnp.ndarray:
    """Sequence-parallel MHGSA core over ``mesh[axis]`` via head↔token
    all-to-all.

    q [B, H, L, Dh], k/v [B, H, S, Dh]; H, L and S must all divide over the
    axis size (heads because they shard during the core, tokens because they
    shard at rest). ``kv_valid`` [B, S] (1 = real key token) or None. Returns
    [B, H, L, Dh] sharded like q. Numerics match the dense softmax(scores)·V
    to fp32 tolerance for both metrics ("oblique" -acos, "poincare" Möbius
    geodesic distance at curvature c).
    """
    from sttode_tpu.parallel.ring_attention import resolve_sp_axes
    axis, b_ax = resolve_sp_axes(mesh, axis)
    n = mesh.shape[axis]
    H, L, S = q.shape[1], q.shape[2], k.shape[2]
    assert H % n == 0, f"heads H={H} must divide over {axis}={n}"
    assert L % n == 0, f"L={L} must divide over {axis}={n}"
    assert S % n == 0, f"S={S} must divide over {axis}={n}"

    q = _map_to_ball(q, metric, curvature)
    k = _map_to_ball(k, metric, curvature)
    body = functools.partial(_ulysses_body, axis_name=axis, metric=metric,
                             curvature=curvature)
    spec_tok = P(b_ax, None, axis, None)
    if kv_valid is not None:
        fn = jax.shard_map(
            lambda q, k, v, val: body(q, k, v, kv_valid=val),
            mesh=mesh, in_specs=(spec_tok, spec_tok, spec_tok, P(b_ax, axis)),
            out_specs=spec_tok)
        return fn(q, k, v, kv_valid)
    fn = jax.shard_map(lambda q, k, v: body(q, k, v),
                       mesh=mesh, in_specs=(spec_tok, spec_tok, spec_tok),
                       out_specs=spec_tok)
    return fn(q, k, v)
