"""Geodesic transformer layers (L2): gated attention block, encoder/decoder
layers and stacks.

Reference surface: hypertransformer.py —
- ``Hypattention`` (:19-89): wraps the MHGSA kernel over 4-D
  [L, N, S, D] input by flattening the (agent, sample) axes into the batch,
  then applies a post-attention tanh×sigmoid gate
  ``tanh(W_info·a) * sigmoid(W_gate·a)`` (:81-85).
- ``TransformerEncoderLayer`` (:91-153): gated attention → residual+dropout →
  LayerNorm → FFN(relu) → residual+dropout → LayerNorm (post-norm).
- ``TransformerDecoderLayer`` (:156-236): self-attention + cross-attention +
  FFN with three post-norms.
- plain stacks (:239-341).

Masks: under ``compat="reference"`` masks are built but never reach the kernel
(quirk Q2) — we drop them identically. Under ``compat="tpu"`` the additive mask
is forwarded so padded SPMD batches attend correctly.

Layout note (TPU-first): tokens here are batch-leading ``[..., L, D]``; the
reference's seq-leading [L, batch, D] torch convention is absorbed at the call
boundary by the 4-D gated block, which takes the reference's [L, N, S, D] and
internally rearranges to [N·S, L, D] so every matmul is batched on the MXU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sttode_tpu.nn import core
from sttode_tpu.nn.attention import MHGSAParams, mhgsa, mhgsa_init


class GatedAttentionParams(NamedTuple):
    """Hypattention parameters: MHGSA + the info/gate projections
    (reference hypertransformer.py:28-32)."""
    attn: MHGSAParams
    info: dict   # dense d_model -> d_model
    gate: dict   # dense d_model -> d_model


def gated_attention_init(key, d_model: int, dtype=jnp.float32) -> GatedAttentionParams:
    k1, k2, k3 = jax.random.split(key, 3)
    return GatedAttentionParams(
        attn=mhgsa_init(k1, d_model, dtype=dtype),
        info=core.dense_init(k2, d_model, d_model, dtype=dtype),
        gate=core.dense_init(k3, d_model, d_model, dtype=dtype),
    )


def gated_attention(params: GatedAttentionParams, query: jnp.ndarray,
                    key: jnp.ndarray, value: jnp.ndarray, num_heads: int, *,
                    mask: jnp.ndarray | None = None,
                    dropout_rate: float = 0.0, dropout_key=None,
                    deterministic: bool = True, compat: str = "reference",
                    need_weights: bool = False,
                    fused: str | bool = "auto", mesh=None,
                    ring_axis: str = "data",
                    kv_valid: jnp.ndarray | None = None,
                    metric: str = "oblique", curvature: float = 1.0):
    """Gated geodesic attention over 4-D input [L, N, S, D].

    L is the attended token axis (the reference feeds the *scene/batch* axis
    here — quirk Q4), N the agent axis, S the sample axis. Rearranged to
    [N·S, L, D] so heads/Gram/AV batch over N·S on the MXU.
    Returns (out [L, N, S, D], attn_weights or None).

    ``fused`` selects the kernel route (see ``geodesic_attention``), incl.
    "ring" — token-axis sequence parallelism over ``mesh[ring_axis]`` with
    ``kv_valid`` [N·S, L] (or broadcastable) marking real key tokens.
    """
    L, N, S, D = query.shape

    def to_batch_first(x):
        ln = x.shape[0]
        return jnp.transpose(x.reshape(ln, N * S, D), (1, 0, 2))

    q = to_batch_first(query)
    if key is query and value is query:
        k = v = q  # preserve self-attention identity for the packed fast path
    else:
        k = to_batch_first(key)
        v = to_batch_first(value) if value is not key else k

    if compat == "reference":
        # quirk Q2: Hypattention never forwards masks into the kernel
        mask = None
        kv_valid = None
    out, w = mhgsa(params.attn, q, k, v, num_heads, mask=mask,
                   dropout_rate=dropout_rate, dropout_key=dropout_key,
                   deterministic=deterministic, compat=compat,
                   need_weights=need_weights, fused=fused, mesh=mesh,
                   ring_axis=ring_axis, kv_valid=kv_valid, metric=metric,
                   curvature=curvature)
    gated = jnp.tanh(core.dense(params.info, out)) * \
        jax.nn.sigmoid(core.dense(params.gate, out))
    gated = jnp.transpose(gated, (1, 0, 2)).reshape(L, N, S, D)
    return gated, w


class FFNParams(NamedTuple):
    linear1: dict
    linear2: dict


class EncoderLayerParams(NamedTuple):
    self_attn: GatedAttentionParams
    ffn: FFNParams
    norm1: dict
    norm2: dict


class DecoderLayerParams(NamedTuple):
    self_attn: GatedAttentionParams
    cross_attn: GatedAttentionParams
    ffn: FFNParams
    norm1: dict
    norm2: dict
    norm3: dict


class LayerConfig(NamedTuple):
    """Static hyperparameters of one transformer layer (reference defaults at
    model/STTODE.py:190-195: d_model=64, nhead=8, ff_dim=1024, dropout=0).

    ``attn_impl`` routes the attention core: "auto" (measured crossover),
    "dense" (jnp/XLA), "fused"/"flash" (Pallas kernels), "ring" / "ulysses"
    (sequence-parallel shard_map — need a mesh threaded through the call)."""
    d_model: int = 64
    num_heads: int = 8
    ff_dim: int = 1024
    dropout: float = 0.0
    activation: str = "relu"
    compat: str = "reference"
    attn_impl: str = "auto"
    attn_metric: str = "oblique"   # "oblique" (reference live path) |
                                   # "poincare" (the paper's framing — ball
                                   # geodesic distance via expmap0/project)
    curvature: float = 1.0         # Poincaré ball c (attn_metric="poincare")


_ATTN_IMPL_TO_FUSED = {"auto": "auto", "dense": False, "fused": True,
                       "flash": "flash", "packed": "packed",
                       "ring": "ring", "ulysses": "ulysses"}


def _ffn_init(key, d_model: int, ff_dim: int, dtype=jnp.float32) -> FFNParams:
    k1, k2 = jax.random.split(key)
    return FFNParams(
        linear1=core.dense_init(k1, d_model, ff_dim, dtype=dtype),
        linear2=core.dense_init(k2, ff_dim, d_model, dtype=dtype),
    )


def _ffn(p: FFNParams, x, cfg: LayerConfig, key, deterministic):
    y = core.dense(p.linear1, x)
    y = core._ACTIVATIONS[cfg.activation](y)
    y = core.dropout(key, y, cfg.dropout, deterministic)
    return core.dense(p.linear2, y)


def encoder_layer_init(key, cfg: LayerConfig, dtype=jnp.float32) -> EncoderLayerParams:
    k1, k2 = jax.random.split(key)
    return EncoderLayerParams(
        self_attn=gated_attention_init(k1, cfg.d_model, dtype=dtype),
        ffn=_ffn_init(k2, cfg.d_model, cfg.ff_dim, dtype=dtype),
        norm1=core.layer_norm_init(cfg.d_model, dtype),
        norm2=core.layer_norm_init(cfg.d_model, dtype),
    )


def encoder_layer(params: EncoderLayerParams, src: jnp.ndarray,
                  cfg: LayerConfig, *, mask: jnp.ndarray | None = None,
                  rng=None, deterministic: bool = True, mesh=None,
                  kv_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Post-norm encoder layer over [L, N, S, D] tokens
    (reference hypertransformer.py:134-153)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k_attn, k_d1, k_ffn, k_d2 = jax.random.split(rng, 4)
    attn_out, _ = gated_attention(
        params.self_attn, src, src, src, cfg.num_heads, mask=mask,
        dropout_rate=cfg.dropout, dropout_key=k_attn,
        deterministic=deterministic, compat=cfg.compat,
        fused=_ATTN_IMPL_TO_FUSED[cfg.attn_impl], mesh=mesh,
        kv_valid=kv_valid, metric=cfg.attn_metric, curvature=cfg.curvature)
    src = src + core.dropout(k_d1, attn_out, cfg.dropout, deterministic)
    src = core.layer_norm(params.norm1, src)
    ffn_out = _ffn(params.ffn, src, cfg, k_ffn, deterministic)
    src = src + core.dropout(k_d2, ffn_out, cfg.dropout, deterministic)
    return core.layer_norm(params.norm2, src)


def decoder_layer_init(key, cfg: LayerConfig, dtype=jnp.float32) -> DecoderLayerParams:
    k1, k2, k3 = jax.random.split(key, 3)
    return DecoderLayerParams(
        self_attn=gated_attention_init(k1, cfg.d_model, dtype=dtype),
        cross_attn=gated_attention_init(k2, cfg.d_model, dtype=dtype),
        ffn=_ffn_init(k3, cfg.d_model, cfg.ff_dim, dtype=dtype),
        norm1=core.layer_norm_init(cfg.d_model, dtype),
        norm2=core.layer_norm_init(cfg.d_model, dtype),
        norm3=core.layer_norm_init(cfg.d_model, dtype),
    )


def decoder_layer(params: DecoderLayerParams, tgt: jnp.ndarray,
                  memory: jnp.ndarray, cfg: LayerConfig, *,
                  tgt_mask=None, memory_mask=None, rng=None,
                  deterministic: bool = True):
    """Post-norm decoder layer: self-attn, cross-attn, FFN
    (reference hypertransformer.py:207-236).

    ``cfg.attn_impl`` routes both attentions like the encoder's (it was
    previously ignored here — 'fused' silently ran the default route). The
    sequence-parallel impls are rejected: the decoder is capability parity
    for a component the reference never instantiates and carries no mesh
    plumbing. Returned weights are None on forced kernel routes (kernels
    don't materialize the [L, S] weights)."""
    if cfg.attn_impl in ("ring", "ulysses"):
        raise ValueError(
            f"decoder layers do not support attn_impl='{cfg.attn_impl}' "
            "(no mesh plumbing on the decoder side); use "
            "auto/dense/fused/flash/packed")
    fused = _ATTN_IMPL_TO_FUSED[cfg.attn_impl]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 6)
    sa, sw = gated_attention(
        params.self_attn, tgt, tgt, tgt, cfg.num_heads, mask=tgt_mask,
        dropout_rate=cfg.dropout, dropout_key=ks[0],
        deterministic=deterministic, compat=cfg.compat, need_weights=True,
        fused=fused, metric=cfg.attn_metric, curvature=cfg.curvature)
    tgt = core.layer_norm(params.norm1,
                          tgt + core.dropout(ks[1], sa, cfg.dropout, deterministic))
    ca, cw = gated_attention(
        params.cross_attn, tgt, memory, memory, cfg.num_heads,
        mask=memory_mask, dropout_rate=cfg.dropout, dropout_key=ks[2],
        deterministic=deterministic, compat=cfg.compat, need_weights=True,
        fused=fused, metric=cfg.attn_metric, curvature=cfg.curvature)
    tgt = core.layer_norm(params.norm2,
                          tgt + core.dropout(ks[3], ca, cfg.dropout, deterministic))
    ffn_out = _ffn(params.ffn, tgt, cfg, ks[4], deterministic)
    tgt = core.layer_norm(params.norm3,
                          tgt + core.dropout(ks[5], ffn_out, cfg.dropout,
                                             deterministic))
    return tgt, sw, cw


def encoder_stack_init(key, cfg: LayerConfig, num_layers: int,
                       dtype=jnp.float32) -> list:
    keys = jax.random.split(key, num_layers)
    return [encoder_layer_init(k, cfg, dtype) for k in keys]


def encoder_stack(params: list, src: jnp.ndarray, cfg: LayerConfig, *,
                  mask=None, rng=None, deterministic: bool = True,
                  mesh=None, kv_valid=None) -> jnp.ndarray:
    """Stack of encoder layers (reference hypertransformer.py:239-281). With
    nlayer=1 (the reference's only configuration) this is one layer; deeper
    stacks unroll — each layer has distinct params, matching _get_clones."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, max(len(params), 1))
    for p, k in zip(params, keys):
        src = encoder_layer(p, src, cfg, mask=mask, rng=k,
                            deterministic=deterministic, mesh=mesh,
                            kv_valid=kv_valid)
    return src


def decoder_stack_init(key, cfg: LayerConfig, num_layers: int,
                       dtype=jnp.float32) -> list:
    keys = jax.random.split(key, num_layers)
    return [decoder_layer_init(k, cfg, dtype) for k in keys]


def decoder_stack(params: list, tgt: jnp.ndarray, memory: jnp.ndarray,
                  cfg: LayerConfig, *, tgt_mask=None, memory_mask=None,
                  rng=None, deterministic: bool = True):
    """Stack of decoder layers returning the last layer's attention weights
    (reference hypertransformer.py:284-341)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, max(len(params), 1))
    sw = cw = None
    for p, k in zip(params, keys):
        tgt, sw, cw = decoder_layer(p, tgt, memory, cfg, tgt_mask=tgt_mask,
                                    memory_mask=memory_mask, rng=k,
                                    deterministic=deterministic)
    return tgt, sw, cw
