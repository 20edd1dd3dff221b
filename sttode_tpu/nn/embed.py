"""Positional/agent encodings (reference model/STTODE.py:137-176).

Sinusoidal time encoding, concatenated with the features and fused through a
linear layer (``concat=True``, the only mode the model uses), followed by
dropout 0.1. The table is precomputed at init as a param-tree constant so it
lives in HBM next to the weights and the gather is a static slice under jit.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from sttode_tpu.nn import core


def positional_encoding_table(max_len: int, d_model: int) -> jnp.ndarray:
    """Standard sin/cos table [max_len, d_model]."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                      * (-np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe)


def positional_agent_encoding_init(key, d_model: int, max_t_len: int = 200,
                                   dtype=jnp.float32) -> dict:
    return {
        "fc": core.dense_init(key, 2 * d_model, d_model, dtype=dtype),
        "pe": positional_encoding_table(max_t_len, d_model).astype(dtype),
    }


def positional_agent_encoding(params: dict, x: jnp.ndarray, *,
                              t_offset: int = 0, dropout_rate: float = 0.1,
                              rng=None, deterministic: bool = True) -> jnp.ndarray:
    """x: [..., T, D] → concat time PE → fuse linear → dropout → [..., T, D]."""
    T = x.shape[-2]
    pe = jax.lax.dynamic_slice_in_dim(params["pe"], t_offset, T, axis=0)
    pe = jnp.broadcast_to(pe, x.shape)
    fused = core.dense(params["fc"], jnp.concatenate([x, pe], axis=-1))
    return core.dropout(rng, fused, dropout_rate, deterministic)
