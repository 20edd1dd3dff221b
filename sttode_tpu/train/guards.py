"""Training robustness guards.

Reference core/utils.py:268-271 ships an (unused) ``detect_grad_nan`` that
zeroes NaN gradients in-place; here the same protection is a composable optax
transform, plus a global-norm clip and a finiteness check usable inside jitted
steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def zero_nan_grads() -> optax.GradientTransformation:
    """Replace NaN/Inf gradient entries with 0 (reference detect_grad_nan
    semantics, as a chainable optax transform)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)),
            updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


def all_finite(tree) -> jnp.ndarray:
    """Scalar bool: every leaf of the pytree is finite (use in metrics to
    detect divergence without host sync per-leaf)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.all(jnp.stack([jnp.all(jnp.isfinite(l)) for l in leaves]))


def guarded_adam(learning_rate, *, max_grad_norm: float | None = None,
                 **adam_kwargs) -> optax.GradientTransformation:
    """Adam wrapped with NaN-zeroing and optional global-norm clipping."""
    chain = [zero_nan_grads()]
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adam(learning_rate, **adam_kwargs))
    return optax.chain(*chain)
