"""Ring sequence-parallel geodesic attention (SP/CP demonstrator).

The reference has no sequence parallelism and none is *needed* at its scale
(≤128 attended tokens — SURVEY.md §5.7); this is the capability hook §2.6
identifies: MHGSA's score is a per-pair ``-acos(q̂·k̂)``, so blockwise/streaming
softmax decompositions carry over from dot-product attention unchanged.

Mechanics (ring attention à la Liu et al., blockwise-parallel transformers):
the key/value token axis is sharded over a mesh axis; each device keeps its
query shard resident and accumulates online-softmax statistics (running max m,
normalizer l, weighted accumulator acc) while K/V shards rotate around the
ring via ``lax.ppermute`` — ICI traffic overlaps the per-block MXU work, and
no device ever materializes the full [L, S] score matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sttode_tpu.manifolds import oblique

NEG_INF = -1e30


def _block_scores(q, k, metric: str = "oblique", curvature: float = 1.0):
    """Negated geodesic scores for one block: [B, L, D] × [B, S, D] →
    [B, L, S]. Both metrics are per-pair functions of the Gram and row norms,
    so they stream through blockwise/online softmax identically.

    - "oblique": row-normalize, -acos(q̂·k̂ᵀ) (the reference's live metric).
    - "poincare": inputs must ALREADY be ball points (the caller applies
      expmap0+project once, before any ring rotation); scores are the Möbius
      geodesic distances via the Gram closed form (pmath.dist_matrix_gram).
    """
    if metric == "poincare":
        from sttode_tpu.manifolds import pmath
        return -pmath.dist_matrix_gram(q, k, c=curvature)
    qn = oblique.proj(q)
    kn = oblique.proj(k)
    g = jnp.einsum("bld,bsd->bls", qn, kn,
                   precision=jax.lax.Precision.HIGHEST)
    eps = 1e-4
    return -jnp.arccos(jnp.clip(g, -1.0 + eps, 1.0 - eps))


def _map_to_ball(x, metric: str, curvature: float):
    """Apply the poincare input map (expmap0 → project) when needed; identity
    for the oblique metric (its normalization lives in ``_block_scores``)."""
    if metric != "poincare":
        return x
    from sttode_tpu.manifolds import pmath
    return pmath.project(pmath.expmap0(x, c=curvature), c=curvature)


def _ring_body(q, k0, v0, axis_name: str, kv_valid0=None,
               metric: str = "oblique", curvature: float = 1.0,
               varying: tuple = ()):
    """Runs inside shard_map: q local [B, L, D]; k0/v0 local KV shard
    [B, Sb, D]; kv_valid0 [B, Sb] 1/0 marks real tokens of the local shard.
    For the poincare metric q/k0 are already ball points (mapped once by the
    wrapper — the rotation only moves shards, never re-maps values).
    ``varying`` names every mesh axis the inputs vary over (the ring axis
    plus, on the dp×sp mesh, the batch axis) — scan carries must be typed
    varying over all of them."""
    n = jax.lax.psum(1, axis_name)
    B, L, D = q.shape
    Sb = k0.shape[1]
    varying = varying or (axis_name,)
    if kv_valid0 is None:
        kv_valid0 = jax.lax.pvary(jnp.ones((B, Sb), q.dtype), varying)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        k, v, valid, m, l, acc = carry
        s = _block_scores(q, k, metric, curvature)       # [B, L, Sb]
        s = jnp.where(valid[:, None, :] > 0, s, NEG_INF)
        blk_max = jnp.max(s, axis=-1)                    # [B, L]
        m_new = jnp.maximum(m, blk_max)
        scale = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])                # [B, L, Sb]
        l_new = l * scale + jnp.sum(p, axis=-1)
        acc_new = acc * scale[..., None] + jnp.einsum(
            "bls,bsd->bld", p, v, precision=jax.lax.Precision.HIGHEST)
        # rotate the KV shard (and its validity) around the ring
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        valid = jax.lax.ppermute(valid, axis_name, perm)
        return (k, v, valid, m_new, l_new, acc_new), None

    # initial accumulators must be typed as device-varying for the scan carry
    # (shard_map varying-manual-axes typing)
    m0 = jax.lax.pvary(jnp.full((B, L), NEG_INF, q.dtype), varying)
    l0 = jax.lax.pvary(jnp.zeros((B, L), q.dtype), varying)
    acc0 = jax.lax.pvary(jnp.zeros((B, L, D), q.dtype), varying)
    (_, _, _, m, l, acc), _ = jax.lax.scan(
        step, (k0, v0, kv_valid0, m0, l0, acc0), None, length=n)
    return acc / jnp.maximum(l, 1e-30)[..., None]


def resolve_sp_axes(mesh: Mesh, axis: str) -> tuple[str, str | None]:
    """(token_axis, batch_axis) for the SP paths on this mesh.

    On a 3-axis dp×sp×tp mesh (``make_mesh(sp=...)``) the token collectives
    ride the dedicated "seq" axis and the batch shards over "data" — DP and
    SP compose (round-2 VERDICT item 3). On the 2-axis mesh the historical
    layout stands: tokens over ``axis`` (default "data"), batch replicated.
    """
    if axis == "data" and "seq" in mesh.axis_names:
        axis = "seq"
    batch_axis = "data" if axis != "data" and "data" in mesh.axis_names \
        else None
    return axis, batch_axis


def ring_geodesic_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            mesh: Mesh, *, axis: str = "data",
                            kv_valid: jnp.ndarray | None = None,
                            metric: str = "oblique",
                            curvature: float = 1.0) -> jnp.ndarray:
    """Sequence-parallel MHGSA core over ``mesh[axis]``.

    q [B, L, D], k/v [B, S, D] with S divisible by the axis size; the token
    axes of q and k/v are sharded. On a 3-axis mesh ("data", "seq", "model")
    the token axis rides "seq" and the batch axis shards over "data"
    (DP×SP); on the 2-axis mesh batch is replicated. Returns [B, L, D]
    sharded like q. Numerics match the dense softmax(scores)·V to fp32
    tolerance for both metrics ("oblique" -acos, "poincare" Möbius geodesic
    distance at curvature c).
    """
    axis, b_ax = resolve_sp_axes(mesh, axis)
    n = mesh.shape[axis]
    assert k.shape[1] % n == 0, f"S={k.shape[1]} must divide over {axis}={n}"
    assert q.shape[1] % n == 0, f"L={q.shape[1]} must divide over {axis}={n}"

    q = _map_to_ball(q, metric, curvature)
    k = _map_to_ball(k, metric, curvature)
    varying = (axis,) if b_ax is None else (b_ax, axis)
    body = functools.partial(_ring_body, axis_name=axis, metric=metric,
                             curvature=curvature, varying=varying)
    spec = P(b_ax, axis, None)
    specs_in = (spec, spec, spec)
    if kv_valid is not None:
        fn = jax.shard_map(
            lambda q, k, v, val: body(q, k, v, kv_valid0=val),
            mesh=mesh, in_specs=specs_in + (P(b_ax, axis),),
            out_specs=spec)
        return fn(q, k, v, kv_valid)
    fn = jax.shard_map(lambda q, k, v: body(q, k, v),
                       mesh=mesh, in_specs=specs_in,
                       out_specs=spec)
    return fn(q, k, v)


def dense_reference(q, k, v, kv_valid=None, metric="oblique", curvature=1.0):
    """Unsharded oracle for tests: softmax_j(scores)·V."""
    q = _map_to_ball(q, metric, curvature)
    k = _map_to_ball(k, metric, curvature)
    s = _block_scores(q, k, metric, curvature)
    if kv_valid is not None:
        s = jnp.where(kv_valid[:, None, :] > 0, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bls,bsd->bld", p, v,
                      precision=jax.lax.Precision.HIGHEST)
