"""Multi-Head Geodesic Self-Attention (MHGSA) — the framework's hot kernel, L1.

Attention scores are *negated geodesic distances on the oblique manifold*
instead of scaled dot products (reference hyptransformerlib.py:251-265 consuming
core/manifolds/oblique.py:36-45):

    score(q, k) = -acos(clip(q̂ · k̂, ±(1-ε)))

The pure-jnp path here is the semantic ground truth the fused Pallas kernel
(`sttode_tpu.kernels`) is validated against.

Two score orientations are exposed:

- ``compat="reference"`` reproduces quirk Q3 (SURVEY.md §2.5): the reference
  builds ``acos(k̂ q̂ᵀ)`` (shape [..., S, L]) and transposes **only when L≠S**,
  so for self-attention the matrix actually used is
  ``scores[i, j] = -d(k_i, q_j)`` — softmax normalizes over *queries* for a
  fixed key row. Masks are dropped (quirk Q2: the reference's mask/softmax
  plumbing for the dot-product path is commented out and Hypattention never
  forwards masks into hyp_mhsa).
- ``compat="tpu"`` is the corrected orientation ``scores[i, j] = -d(q_i, k_j)``
  with additive-mask support — the mode the [N,N] agent-mask shape says was
  intended, and the one padded SPMD batches need.

Head layout is [..., H, L, Dh] throughout (no [B·H] flattening — XLA batches the
Gram matmuls over leading dims onto the MXU directly). The per-head q-scaling by
``head_dim^-0.5`` before row normalization (quirk Q10, a forward no-op erased by
the normalize) is reproduced so gradient statistics match the reference.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sttode_tpu.manifolds import oblique
from sttode_tpu.nn import core


class MHGSAParams(NamedTuple):
    """Packed projections, mirroring the reference module's parameter surface
    (hyptransformerlib.py Hyp_mhsa: in_proj_weight [3E,E] xavier-uniform,
    in_proj_bias zeros, out_proj Linear with zeroed bias).

    Stored JAX-layout: ``in_proj_w`` is [E, 3E] so q,k,v slices are contiguous
    output columns of one MXU matmul.
    """
    in_proj_w: jnp.ndarray   # [E, 3E]
    in_proj_b: jnp.ndarray   # [3E]
    out_proj_w: jnp.ndarray  # [E, E]
    out_proj_b: jnp.ndarray  # [E]


def mhgsa_init(key, embed_dim: int, dtype=jnp.float32) -> MHGSAParams:
    k1, k2 = jax.random.split(key)
    # torch xavier_uniform_ on the [3E, E] packed weight sees fan_in=E,
    # fan_out=3E; sampling the transposed [E, 3E] layout with the same bound
    # gives the identical per-element distribution.
    in_w = core.xavier_uniform(k1, embed_dim, 3 * embed_dim, dtype=dtype)
    out_w = core.torch_linear_weight(k2, embed_dim, embed_dim, dtype=dtype)
    return MHGSAParams(
        in_proj_w=in_w,
        in_proj_b=jnp.zeros((3 * embed_dim,), dtype),
        out_proj_w=out_w,
        out_proj_b=jnp.zeros((embed_dim,), dtype),
    )


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[..., L, E] -> [..., H, L, Dh]."""
    *lead, L, E = x.shape
    x = x.reshape(*lead, L, num_heads, E // num_heads)
    return jnp.moveaxis(x, -2, -3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[..., H, L, Dh] -> [..., L, E]."""
    x = jnp.moveaxis(x, -3, -2)
    *lead, L, H, Dh = x.shape
    return x.reshape(*lead, L, H * Dh)


def geodesic_scores(q: jnp.ndarray, k: jnp.ndarray, *,
                    compat: str = "reference",
                    metric: str = "oblique",
                    curvature: float = 1.0) -> jnp.ndarray:
    """Negated geodesic distance score matrix over the trailing two dims.

    q: [..., L, Dh], k: [..., S, Dh] → [..., L, S].

    ``metric``:
    - "oblique" (the reference's live path): row-normalize to the unit
      sphere, distance = acos(q̂·k̂ᵀ).
    - "poincare" (the paper's framing — the reference ships the pmath toolbox
      wildcard-imported but never wires it in, SURVEY.md §2.1): points are
      mapped onto the ball via expmap0 and scored by the Möbius geodesic
      distance, ``curvature`` = c.
    """
    if metric == "poincare":
        from sttode_tpu.manifolds import pmath
        qb = pmath.project(pmath.expmap0(q, c=curvature), c=curvature)
        kb = pmath.project(pmath.expmap0(k, c=curvature), c=curvature)
        # pairwise Möbius geodesic distances via the Gram closed form: one
        # MXU matmul + O(L·S) epilogue instead of broadcasting [L, S, D]
        # Möbius sums (pmath.dist_matrix_gram docstring has the derivation)
        d = pmath.dist_matrix_gram(qb, kb, c=curvature)
        if compat == "reference" and q.shape[-2] == k.shape[-2]:
            d = jnp.swapaxes(d, -1, -2)   # match the Q3 orientation
        return -d
    qn = oblique.proj(q)
    kn = oblique.proj(k)
    if compat == "reference":
        # Quirk Q3: the reference computes acos(k̂ q̂ᵀ) = d(k, q) with shape
        # [..., S, L] and keeps it untransposed when S == L. We build that
        # orientation directly: row i ↔ key_i when square.
        L, S = q.shape[-2], k.shape[-2]
        d = oblique.dist(kn, qn)          # [..., S, L]
        if L != S:
            d = jnp.swapaxes(d, -1, -2)   # [..., L, S] — the corrected orient.
        return -d
    return -oblique.dist(qn, kn)          # [..., L, S]


def _kv_valid_mask(kv_valid, q):
    """Additive mask from key validity, aligned to the score shape
    [..., (H,) L, S]: insert broadcast axes before S until kv_valid aligns
    with q's batch(+head) dims, then add the query-row axis."""
    kvv = kv_valid
    while kvv.ndim < q.ndim - 1:
        kvv = kvv[..., None, :]
    neg = jnp.asarray(jnp.finfo(q.dtype).min, q.dtype)
    return jnp.where(kvv[..., None, :] > 0, 0.0, neg)


def _kernel_route(q, k, mask, kv_valid, dropout_active: bool,
                  need_weights: bool, fused: str | bool,
                  metric: str, curvature: float = 1.0) -> str | None:
    """Pick the Pallas execution path, or None for jnp/XLA fusion.

    - "packed" (head-packed small-shape kernel) at the model's own hot
      shapes: L·S ≤ 32² with an explicit head axis whose H·Dh ≤ 128 — heads
      pack into the lane dim so Dh=8 stops padding 16× on the MXU and the
      [L,S] score tiles stop wasting their lanes. Measured win region on
      v5e (f+b, B352·H8·D8): ×1.12 at L=S=8-11 (the agent-axis shape),
      parity at 16-32, XLA wins beyond (0.62-0.82 at 48-128) — so the
      route stops at 32² (the whole-S fused kernel loses these shapes ~3×;
      full crossover in BENCHMARKS.md). Oblique metric; masks in
      key-validity form only.
    - "fused" (whole-S-in-VMEM kernel) where it measured faster than XLA
      fusion: large score matrices, L·S ≥ 256², up to its VMEM ceiling
      S ≈ 2k.
    - "flash" (S-tiled online-softmax kernel) beyond that ceiling — context
      bounded by HBM, not VMEM; masks in key-validity form only (in-kernel
      column predicate). For contexts that outgrow one chip entirely, the
      ring/sequence-parallel path is the tool.
    """
    if fused is True or fused in ("flash", "packed"):
        route = "fused" if fused is True else fused
        # forced routes get the same loud guards the auto route enforces by
        # exclusion — the kernels implement neither attention dropout nor
        # (for packed) the poincaré metric, and silently diverging from the
        # dense route is exactly what the ring/ulysses ValueErrors forbid
        if dropout_active:
            raise ValueError(
                f"attn_impl='{route}' does not implement attention dropout; "
                "set dropout=0 (the reference default) or use a dense route")
        if route == "packed" and metric != "oblique":
            raise ValueError(
                "the packed kernel implements the oblique metric only; use "
                "fused/flash/dense for metric='poincare'")
        return route
    if fused != "auto" or dropout_active or need_weights:
        return None
    if jax.default_backend() != "tpu":
        return None
    if metric == "poincare":
        from sttode_tpu.kernels.mhgsa import MIN_MAXLESS_CURVATURE
        if curvature < MIN_MAXLESS_CURVATURE:
            # the Pallas kernels' maxless softmax would underflow at this
            # score bound (-12.21/√c < exp's fp32 floor); dense keeps the
            # max-subtracted softmax
            return None
    L, S = q.shape[-2], k.shape[-2]
    if L * S < 256 * 256:
        # packed's measured win region is the SMALLEST shapes, where XLA's
        # 128-lane padding waste on Dh=8 is worst (same-session crossover,
        # f+b xla/packed: L=S=8 → 1.12, 11 → 1.12, 16 → 1.03, 24-32 →
        # parity, 48 → 0.76, 64 → 0.62, 96-128 → 0.62-0.82 — BENCHMARKS.md
        # round-3 notes); beyond 32² XLA wins AND the packed VMEM stack
        # grows with L·(H·S) toward the 16 MB scoped limit (the B≥128 train
        # step's L=S=128 scene-axis attention compiled at 17 MB → OOM), so
        # both perf and compilability route fat small shapes to XLA fusion.
        if (metric == "oblique" and mask is None and q.ndim >= 4
                and q.shape[-3] * q.shape[-1] <= 128
                and L * S <= 32 * 32):
            from sttode_tpu.kernels.packed_mhgsa import packed_vmem_fit
            if packed_vmem_fit(L, S, q.shape[-3], q.shape[-1]):
                return "packed"
        return None
    if S > 2048:
        return "flash" if mask is None else None
    return "fused"


def geodesic_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                       mask: jnp.ndarray | None = None,
                       dropout_rate: float = 0.0,
                       dropout_key=None,
                       deterministic: bool = True,
                       compat: str = "reference",
                       fused: str | bool = "auto",
                       need_weights: bool = True,
                       metric: str = "oblique",
                       curvature: float = 1.0,
                       mesh=None,
                       ring_axis: str = "data",
                       kv_valid: jnp.ndarray | None = None):
    """Core attention: geodesic scores → (+mask) → softmax → dropout → @v.

    q [..., L, Dh], k/v [..., S, Dh], mask additive [..., L, S] or broadcastable.
    Returns (out [..., L, Dh], weights [..., L, S] or None when the fused
    kernel path is taken).

    Mask semantics are ROUTE-INDEPENDENT: arbitrary finite biases (positive
    or negative) give the dense softmax(s + mask) result on every route —
    the fused kernel canonicalizes the mask with a softmax-invariant
    per-row shift (see fused_geodesic_attention's MASK CONTRACT; entries
    ≤ -1e29 mean exclusion, finite penalties floor at -30 ≈ 1e-13 weight).
    The packed/flash/ring/ulysses kernels accept masks only in key-validity
    form (``kv_valid``) and raise on additive masks rather than dropping
    them.

    ``fused``: True forces the whole-S Pallas kernel, "flash" the S-tiled
    online-softmax kernel, False the jnp path, "auto" routes by measured
    crossover and VMEM ceiling (see `_kernel_route`), "ring" the
    sequence-parallel shard_map path (requires ``mesh``; the token axes shard
    over ``mesh[ring_axis]`` and K/V shards rotate via ppermute with
    online-softmax accumulation — SURVEY.md §2.6 SP/CP), "ulysses" the
    all-to-all sequence-parallel path (heads scatter against tokens, dense
    local attention, all-to-all back; requires ``mesh``, an explicit head axis
    [..., H, L, Dh], and head count divisible by the axis size). Both compat
    orientations are served by all kernels — the reference's transposed square
    case (quirk Q3) is the kernel with q/k swapped.

    ``kv_valid``: per-key validity [..., S] (1 = real token), the mask form
    the ring path supports (padding, not arbitrary additive biases).
    """
    dropout_active = (not deterministic) and dropout_rate > 0.0
    if dropout_active and fused in ("ring", "ulysses"):
        # loud, not silent: the SP paths have no attention-weight dropout
        # (the reference trains with dropout=0); dropping it quietly would
        # change training behavior vs the dense route
        raise ValueError(
            f"attn_impl='{fused}' does not implement attention dropout; "
            "set dropout=0 (the reference default) or use a dense route")
    if fused == "ulysses":
        if mesh is None:
            raise ValueError("attn_impl='ulysses' needs a mesh — pass it "
                             "through sttode_forward(..., mesh=) / "
                             "make_train_step")
        if mask is not None:
            raise ValueError("ulysses path supports key-validity masks only; "
                             "pass kv_valid instead of an additive mask")
        if q.ndim < 4:
            raise ValueError("ulysses attention needs an explicit head axis: "
                             "q/k/v must be [..., H, L, Dh]")
        from sttode_tpu.parallel.ulysses import ulysses_geodesic_attention
        *batch, H, L, Dh = q.shape
        S = k.shape[-2]
        square = L == S
        qq, kk = (k, q) if (compat == "reference" and square) else (q, k)
        B = 1
        for d in batch:
            B *= d
        val = None
        if kv_valid is not None:
            # kv_valid carries no head axis at rest: squeeze any explicit
            # singleton (e.g. a broadcast head axis a dense-route caller
            # added), then broadcast over the batch dims only
            kvv = kv_valid
            while kvv.ndim > len(batch) + 1 and kvv.shape[-2] == 1:
                kvv = jnp.squeeze(kvv, axis=-2)
            val = jnp.broadcast_to(kvv, (*batch, S)).reshape(B, S)
        out = ulysses_geodesic_attention(
            qq.reshape(B, H, L, Dh), kk.reshape(B, H, S, Dh),
            v.reshape(B, H, S, Dh), mesh, axis=ring_axis, kv_valid=val,
            metric=metric, curvature=curvature)
        return out.reshape(*batch, H, L, Dh), None
    if fused == "ring":
        if mesh is None:
            raise ValueError("attn_impl='ring' needs a mesh — pass it through "
                             "sttode_forward(..., mesh=) / make_train_step")
        if mask is not None:
            raise ValueError("ring path supports key-validity masks only; "
                             "pass kv_valid instead of an additive mask")
        from sttode_tpu.parallel.ring_attention import ring_geodesic_attention
        *lead, L, Dh = q.shape
        S = k.shape[-2]
        square = L == S
        qq, kk = (k, q) if (compat == "reference" and square) else (q, k)
        B = 1
        for d in lead:
            B *= d
        val = None
        if kv_valid is not None:
            kvv = kv_valid
            while kvv.ndim < len(lead) + 1:   # insert axes before S (e.g.
                kvv = kvv[..., None, :]       # the folded head axis)
            val = jnp.broadcast_to(kvv, (*lead, S)).reshape(B, S)
        out = ring_geodesic_attention(
            qq.reshape(B, L, Dh), kk.reshape(B, S, Dh), v.reshape(B, S, Dh),
            mesh, axis=ring_axis, kv_valid=val, metric=metric,
            curvature=curvature)
        return out.reshape(*lead, L, Dh), None
    square = q.shape[-2] == k.shape[-2]
    swapped = compat == "reference" and square
    kv_as_mask = False
    if kv_valid is not None and swapped:
        # under the Q3 swapped orientation "key validity" would mark the
        # wrong axis inside the swapped kernels — express it as an additive
        # mask on the unswapped scores instead (dense/fused path); when an
        # additive mask is ALSO present the two merge (dropping either
        # silently would attend to padding)
        kvm = _kv_valid_mask(kv_valid, q)
        mask = kvm if mask is None else mask + kvm
        kv_valid = None
        kv_as_mask = True
    _swapped_hint = (
        " (note: compat='reference' square self-attention expresses kv_valid "
        "as an additive mask internally — quirk Q3's swapped orientation — "
        "so packed/flash cannot serve it; use fused=True/'auto' or "
        "compat='tpu')") if kv_as_mask else ""
    route = _kernel_route(q, k, mask, kv_valid, dropout_active, need_weights,
                          fused, metric, curvature)
    if route is not None:
        from sttode_tpu.kernels.mhgsa import (flash_geodesic_attention,
                                              fused_geodesic_attention)
        from sttode_tpu.kernels.packed_mhgsa import packed_geodesic_attention
        qq, kk = (k, q) if swapped else (q, k)
        if route == "packed":
            if mask is not None:
                raise ValueError(
                    "packed kernel supports key-validity masks only; pass "
                    "kv_valid instead of an additive mask, or fused=False"
                    + _swapped_hint)
            # kv_valid carries no head axis (it is [batch..., S], shared by
            # the heads the kernel packs into lanes) — pass through as-is
            return packed_geodesic_attention(qq, kk, v,
                                             kv_valid=kv_valid), None
        if route == "flash" and mask is not None:
            # not an assert: under python -O an assert would vanish and
            # the mask would be silently dropped
            raise ValueError(
                "flash kernel supports key-validity masks only; pass "
                "kv_valid instead of an additive mask, or use fused=True "
                "(S ≤ ~2k) / fused=False" + _swapped_hint)
        if metric == "poincare":
            # ball map outside the kernels: its autodiff stays in XLA, the
            # custom VJPs cover the Gram-closed-form score epilogue
            from sttode_tpu.manifolds import pmath
            qq = pmath.project(pmath.expmap0(qq, c=curvature), c=curvature)
            kk = pmath.project(pmath.expmap0(kk, c=curvature), c=curvature)
        if route == "flash":
            kvv = kv_valid
            if kvv is not None:
                while kvv.ndim < qq.ndim - 1:   # insert axes before S (e.g.
                    kvv = kvv[..., None, :]     # the head axis)
            out = flash_geodesic_attention(qq, kk, v, kv_valid=kvv,
                                           metric=metric,
                                           curvature=curvature)
        else:
            if kv_valid is not None:
                # merge with any additive mask — dropping kv_valid when both
                # are passed would silently attend to padded keys
                kvm = _kv_valid_mask(kv_valid, qq)
                mask = kvm if mask is None else mask + kvm
            out = fused_geodesic_attention(qq, kk, v, mask=mask,
                                           metric=metric,
                                           curvature=curvature)
        return out, None

    if kv_valid is not None:
        kvm = _kv_valid_mask(kv_valid, q)
        mask = kvm if mask is None else mask + kvm

    scores = geodesic_scores(q, k, compat=compat, metric=metric,
                             curvature=curvature)
    if mask is not None:
        scores = scores + mask
    w = jax.nn.softmax(scores, axis=-1)
    w = core.dropout(dropout_key, w, dropout_rate, deterministic)
    out = jnp.einsum("...ls,...sd->...ld", w, v,
                     precision=jax.lax.Precision.HIGHEST)
    return out, w


def mhgsa(params: MHGSAParams, query: jnp.ndarray, key: jnp.ndarray,
          value: jnp.ndarray, num_heads: int, *,
          mask: jnp.ndarray | None = None,
          dropout_rate: float = 0.0,
          dropout_key=None,
          deterministic: bool = True,
          compat: str = "reference",
          need_weights: bool = False,
          bias_kv: tuple | None = None,
          add_zero_attn: bool = False,
          fused: str | bool = "auto",
          mesh=None,
          ring_axis: str = "data",
          kv_valid: jnp.ndarray | None = None,
          metric: str = "oblique",
          curvature: float = 1.0):
    """Full multi-head geodesic attention (reference hyp_mhsa semantics).

    query [..., L, E]; key/value [..., S, E]. Leading dims are batch. The packed
    projection follows the reference's fast paths: one fused [E,3E] matmul when
    q is k is v (self-attention), split projections otherwise
    (hyptransformerlib.py:112-190).

    ``bias_kv`` — optional learned (bias_k [E], bias_v [E]) appended as one
    extra attendable position (reference add_bias_kv plumbing,
    hyptransformerlib.py:196-216); ``add_zero_attn`` appends an all-zero
    position (reference :241-255).

    Returns (out [..., L, E], head-averaged weights [..., L, S'] or None).
    """
    E = query.shape[-1]
    head_dim = E // num_heads
    assert head_dim * num_heads == E, "embed_dim must divide num_heads"

    if query is key and key is value:
        qkv = query @ params.in_proj_w + params.in_proj_b
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        wq, wk, wv = jnp.split(params.in_proj_w, 3, axis=1)
        bq, bk, bv = jnp.split(params.in_proj_b, 3)
        q = query @ wq + bq
        k = key @ wk + bk
        v = value @ wv + bv

    def _append_position(k, v, mask, kv_valid, k_extra, v_extra):
        shape = (*k.shape[:-2], 1, k.shape[-1])
        k = jnp.concatenate([k, jnp.broadcast_to(k_extra, shape)], axis=-2)
        v = jnp.concatenate([v, jnp.broadcast_to(v_extra, shape)], axis=-2)
        if mask is not None:
            mask = jnp.pad(mask, [(0, 0)] * (mask.ndim - 1) + [(0, 1)])
        if kv_valid is not None:
            # the appended bias/zero position is a real attendable key: mark
            # it valid, or the validity mask stays one short of the scores
            kv_valid = jnp.pad(
                kv_valid, [(0, 0)] * (kv_valid.ndim - 1) + [(0, 1)],
                constant_values=1.0)
        return k, v, mask, kv_valid

    if bias_kv is not None:
        k, v, mask, kv_valid = _append_position(k, v, mask, kv_valid,
                                                bias_kv[0], bias_kv[1])
    if add_zero_attn:
        zero = jnp.zeros((k.shape[-1],), k.dtype)
        k, v, mask, kv_valid = _append_position(k, v, mask, kv_valid,
                                                zero, zero)

    # Quirk Q10: forward no-op after row normalization (oblique metric only
    # — the scale is erased by Oblique.proj); kept for grad parity. Under
    # the poincaré metric it would NOT be a no-op: q would be pulled toward
    # the ball origin before expmap0 while k is not, silently skewing the
    # geodesic distances — so it applies only where the reference's
    # normalization makes it inert (the reference ships oblique only).
    if metric == "oblique":
        q = q * (head_dim ** -0.5)

    qh = split_heads(q, num_heads)   # [..., H, L, Dh]
    kh = split_heads(k, num_heads)
    vh = split_heads(v, num_heads)

    if mask is not None:
        mask = mask[..., None, :, :]  # broadcast over heads

    out_h, w = geodesic_attention(
        qh, kh, vh, mask=mask, dropout_rate=dropout_rate,
        dropout_key=dropout_key, deterministic=deterministic, compat=compat,
        need_weights=need_weights, fused=fused, mesh=mesh,
        ring_axis=ring_axis, kv_valid=kv_valid, metric=metric,
        curvature=curvature)

    out = merge_heads(out_h) @ params.out_proj_w + params.out_proj_b
    if need_weights and w is not None:
        return out, jnp.mean(w, axis=-3)  # average over heads
    return out, None
