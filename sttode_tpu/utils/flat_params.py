"""Flat parameter/gradient views (reference utils/torchutils.py:98-158:
get_flat_params_from / set_flat_params_to / get_flat_grad_from, used by
second-order and DLow-style methods). jnp-native via jax.flatten_util."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


def get_flat_params(params: Any) -> tuple[jnp.ndarray, Any]:
    """Returns (flat [P] vector, unravel_fn)."""
    return ravel_pytree(params)


def set_flat_params(flat: jnp.ndarray, unravel_fn) -> Any:
    return unravel_fn(flat)


def get_flat_grad(grad_tree: Any) -> jnp.ndarray:
    flat, _ = ravel_pytree(grad_tree)
    return flat


def param_l2(params: Any) -> jnp.ndarray:
    """Global L2 norm of a pytree (weight-decay / monitoring helper)."""
    return jnp.sqrt(sum(jnp.sum(jnp.square(l))
                        for l in jax.tree_util.tree_leaves(params)))
