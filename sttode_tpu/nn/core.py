"""Functional NN core: initializers + primitive layers over explicit param pytrees.

Design stance (SURVEY.md §7): the framework's layers are pairs of pure functions —
``*_init(key, ...) -> params`` and an apply function ``f(params, x, ...) -> y`` over
nested dicts of jnp arrays. No module objects, no hidden state: params are plain
pytrees, so they thread through ``jit`` / ``pjit`` / ``lax.scan`` closures / orbax
checkpoints without lifted-transform machinery, and sharding is a pytree-of-
PartitionSpec away.

Initializer distributions intentionally reproduce the torch ones the reference
relies on so retrained-parity is statistical like-for-like:

- ``xavier_uniform``    — torch nn.init.xavier_uniform_ (reference
  hyptransformerlib.py attention in_proj reset)
- ``torch_linear_*``    — torch nn.Linear's default reset (kaiming_uniform with
  a=sqrt(5) → U(±sqrt(1/fan_in)); bias U(±1/sqrt(fan_in)))
- ``kaiming_normal``    — torch nn.init.kaiming_normal_ (fan_in, gain sqrt(2));
  reference model/STTODE.py DecomposeBlock.init_parameters
- ``normal_001``        — N(0, 0.01²), reference model/utils.py initialize_weights

Dense weights are stored ``[d_in, d_out]`` (JAX convention, column-major output)
and applied as ``x @ w + b`` — the MXU-friendly layout.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------- #
# initializers — each samples a [d_in, d_out] weight (fan_in = d_in)          #
# --------------------------------------------------------------------------- #

def xavier_uniform(key, d_in: int, d_out: int, dtype=jnp.float32) -> jnp.ndarray:
    bound = math.sqrt(6.0 / (d_in + d_out))
    return jax.random.uniform(key, (d_in, d_out), dtype, -bound, bound)


def torch_linear_weight(key, d_in: int, d_out: int, dtype=jnp.float32) -> jnp.ndarray:
    """torch nn.Linear default weight reset: kaiming_uniform(a=√5) → U(±√(1/fan_in))."""
    bound = math.sqrt(1.0 / d_in)
    return jax.random.uniform(key, (d_in, d_out), dtype, -bound, bound)


def torch_linear_bias(key, d_in: int, d_out: int, dtype=jnp.float32) -> jnp.ndarray:
    bound = math.sqrt(1.0 / d_in) if d_in > 0 else 0.0
    return jax.random.uniform(key, (d_out,), dtype, -bound, bound)


def kaiming_normal(key, d_in: int, d_out: int, dtype=jnp.float32) -> jnp.ndarray:
    """torch kaiming_normal_ defaults: mode=fan_in, nonlinearity=leaky_relu(a=0)
    → std = sqrt(2 / fan_in)."""
    std = math.sqrt(2.0 / d_in)
    return std * jax.random.normal(key, (d_in, d_out), dtype)


def kaiming_normal_fan_out(key, d_in: int, d_out: int, dtype=jnp.float32) -> jnp.ndarray:
    std = math.sqrt(2.0 / d_out)
    return std * jax.random.normal(key, (d_in, d_out), dtype)


def normal_001(key, d_in: int, d_out: int, dtype=jnp.float32) -> jnp.ndarray:
    return 0.01 * jax.random.normal(key, (d_in, d_out), dtype)


def zeros(_key, *shape, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.zeros(shape, dtype)


# --------------------------------------------------------------------------- #
# dense                                                                       #
# --------------------------------------------------------------------------- #

def dense_init(key, d_in: int, d_out: int, *, w_init=torch_linear_weight,
               bias: bool = True, b_init=torch_linear_bias,
               dtype=jnp.float32) -> dict:
    kw, kb = jax.random.split(key)
    p = {"w": w_init(kw, d_in, d_out, dtype=dtype)}
    if bias:
        p["b"] = b_init(kb, d_in, d_out, dtype=dtype) if b_init is torch_linear_bias \
            else b_init(kb, d_out, dtype=dtype)
    return p


def dense(p: dict, x: jnp.ndarray, *, compute_dtype=None) -> jnp.ndarray:
    """x @ w + b. With ``compute_dtype`` (e.g. bfloat16) the operands are cast
    down for the matmul while accumulation stays fp32 — halves HBM traffic on
    bandwidth-bound layers; bias adds in fp32."""
    w = p["w"]
    if compute_dtype is not None:
        y = jax.lax.dot_general(
            x.astype(compute_dtype), w.astype(compute_dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        y = x @ w
    if "b" in p:
        y = y + p["b"]
    return y


# --------------------------------------------------------------------------- #
# layer norm (torch-default affine, eps=1e-5)                                 #
# --------------------------------------------------------------------------- #

def layer_norm_init(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    normed = (x - mean) * jax.lax.rsqrt(var + eps)
    return normed * p["scale"] + p["bias"]


# --------------------------------------------------------------------------- #
# dropout — explicit rng, inverted scaling (torch semantics)                  #
# --------------------------------------------------------------------------- #

def dropout(key, x: jnp.ndarray, rate: float, deterministic: bool) -> jnp.ndarray:
    if deterministic or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# --------------------------------------------------------------------------- #
# MLPs                                                                        #
# --------------------------------------------------------------------------- #

_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "gelu": jax.nn.gelu,
}


def mlp_init(key, d_in: int, hidden: Sequence[int], d_out: int | None = None, *,
             w_init=torch_linear_weight, dtype=jnp.float32) -> dict:
    """An MLP as a list of dense params.

    With ``d_out`` set, the last layer is a plain (un-activated) output head —
    the shape of the reference's GroupNet MLP (model/utils.py:67-95, hidden
    (512,256)). Without it, every layer is activated — the shape of the
    reference's tanh MLP (utils/mlp.py:5-28) and MLP2 (model/STTODE.py:111-133).
    """
    dims = [d_in, *hidden] + ([d_out] if d_out is not None else [])
    keys = jax.random.split(key, len(dims) - 1)
    layers = [dense_init(k, a, b, w_init=w_init, dtype=dtype)
              for k, a, b in zip(keys, dims[:-1], dims[1:])]
    return {"layers": layers}


def mlp(p: dict, x: jnp.ndarray, *, activation: str = "relu",
        activate_final: bool = False, compute_dtype=None) -> jnp.ndarray:
    act = _ACTIVATIONS[activation]
    n = len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        x = dense(lp, x, compute_dtype=compute_dtype)
        if i < n - 1 or activate_final:
            x = act(x)
    return x


def mlp_init_normal001(key, d_in: int, hidden: Sequence[int],
                       dtype=jnp.float32) -> dict:
    """Activated-everywhere MLP with N(0,0.01) weights and zero bias — matches
    reference MLP2 / utils.mlp.MLP after initialize_weights
    (model/utils.py:11-21 applied at model/STTODE.py:131, utils/mlp.py:24)."""
    dims = [d_in, *hidden]
    keys = jax.random.split(key, len(dims) - 1)
    layers = [
        {"w": normal_001(k, a, b, dtype=dtype), "b": jnp.zeros((b,), dtype)}
        for k, a, b in zip(keys, dims[:-1], dims[1:])
    ]
    return {"layers": layers}
