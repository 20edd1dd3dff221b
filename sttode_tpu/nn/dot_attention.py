"""Euclidean (scaled dot-product) attention twin.

Reference transformerlib.py:30-293 keeps the stock dot-product
multi-head-attention implementation alongside the geodesic fork as its A/B
baseline (zero imports in the live model — SURVEY.md §2.3). Same role here:
identical API to ``sttode_tpu.nn.attention.mhgsa`` with scores
``q·kᵀ/√Dh`` instead of ``-acos(q̂·k̂ᵀ)``, so a geodesic-vs-dot ablation is a
one-line swap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sttode_tpu.nn import core
from sttode_tpu.nn.attention import MHGSAParams, merge_heads, mhgsa_init, \
    split_heads

# the module shares the packed-projection parameter surface
dot_mhsa_init = mhgsa_init


def dot_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                  mask: jnp.ndarray | None = None, dropout_rate: float = 0.0,
                  dropout_key=None, deterministic: bool = True):
    """Scaled dot-product core. q [..., L, Dh], k/v [..., S, Dh]."""
    scores = jnp.einsum("...ld,...sd->...ls", q, k) * (q.shape[-1] ** -0.5)
    if mask is not None:
        scores = scores + mask
    w = jax.nn.softmax(scores, axis=-1)
    w = core.dropout(dropout_key, w, dropout_rate, deterministic)
    return jnp.einsum("...ls,...sd->...ld", w, v), w


def dot_mhsa(params: MHGSAParams, query: jnp.ndarray, key: jnp.ndarray,
             value: jnp.ndarray, num_heads: int, *,
             mask: jnp.ndarray | None = None, dropout_rate: float = 0.0,
             dropout_key=None, deterministic: bool = True,
             need_weights: bool = False):
    """Multi-head dot-product attention with the packed QKV projection
    (reference transformerlib.py multi_head_attention_forward semantics)."""
    E = query.shape[-1]

    if query is key and key is value:
        qkv = query @ params.in_proj_w + params.in_proj_b
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        wq, wk, wv = jnp.split(params.in_proj_w, 3, axis=1)
        bq, bk, bv = jnp.split(params.in_proj_b, 3)
        q, k, v = query @ wq + bq, key @ wk + bk, value @ wv + bv

    qh = split_heads(q, num_heads)
    kh = split_heads(k, num_heads)
    vh = split_heads(v, num_heads)
    if mask is not None:
        mask = mask[..., None, :, :]
    out_h, w = dot_attention(qh, kh, vh, mask=mask,
                             dropout_rate=dropout_rate,
                             dropout_key=dropout_key,
                             deterministic=deterministic)
    out = merge_heads(out_h) @ params.out_proj_w + params.out_proj_b
    if need_weights:
        return out, jnp.mean(w, axis=-3)
    return out, None
