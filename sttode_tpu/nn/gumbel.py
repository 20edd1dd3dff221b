"""Gumbel-softmax dictionary MLPs.

The reference ships ``MLP_dict`` / ``MLP_dict_softmax`` (model/utils.py:46-64,
98-110) that call an *undefined* ``gumbel_softmax`` — dead as shipped
(SURVEY.md §2.3). This is the working version of that capability: an MLP whose
output is a (relaxed) one-hot code over a learned dictionary of edge-type
embeddings, with a sigmoid factor gate — the GroupNet-style discrete relation
head the reference's code sketches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sttode_tpu.nn import core


def gumbel_softmax(key, logits: jnp.ndarray, *, temperature: float = 1.0,
                   hard: bool = False) -> jnp.ndarray:
    """Reparameterized draw from the concrete/Gumbel-softmax distribution;
    ``hard`` returns a straight-through one-hot."""
    g = jax.random.gumbel(key, logits.shape, logits.dtype)
    y = jax.nn.softmax((logits + g) / temperature, axis=-1)
    if hard:
        one_hot = jax.nn.one_hot(jnp.argmax(y, axis=-1), y.shape[-1],
                                 dtype=y.dtype)
        y = y + jax.lax.stop_gradient(one_hot - y)   # straight-through
    return y


def mlp_dict_init(key, input_dim: int, hidden, *, edge_types: int = 10,
                  embed_dim: int | None = None, dtype=jnp.float32) -> dict:
    """Logit MLP + dictionary of ``edge_types`` embeddings + factor gate."""
    if embed_dim is None:
        embed_dim = edge_types
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "mlp": core.mlp_init(k1, input_dim, list(hidden), edge_types,
                             dtype=dtype),
        "dictionary": 0.1 * jax.random.normal(k2, (edge_types, embed_dim),
                                              dtype),
        "factor": core.dense_init(k3, input_dim, 1, dtype=dtype),
    }


def mlp_dict(params: dict, x: jnp.ndarray, key, *, temperature: float = 0.5,
             hard: bool = True):
    """x → edge-type logits → gumbel one-hot → dictionary lookup, gated by a
    sigmoid factor of the input. Returns (gated_embed, code)."""
    logits = core.mlp(params["mlp"], x)
    code = gumbel_softmax(key, logits, temperature=temperature, hard=hard)
    embed = code @ params["dictionary"]
    factor = jax.nn.sigmoid(core.dense(params["factor"], x))
    return factor * embed, code


def mlp_dict_softmax(params: dict, x: jnp.ndarray):
    """Deterministic variant: plain softmax code over the dictionary."""
    logits = core.mlp(params["mlp"], x)
    code = jax.nn.softmax(logits, axis=-1)
    embed = code @ params["dictionary"]
    factor = jax.nn.sigmoid(core.dense(params["factor"], x))
    return factor * embed, code
