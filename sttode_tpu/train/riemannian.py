"""Riemannian optimization over manifold-constrained parameters.

The reference's ``ManifoldParameter`` (core/manifolds/base.py:68-81) tags
parameters with a manifold so Riemannian optimizers can apply
``egrad2rgrad`` + retraction instead of a Euclidean step. JAX has no parameter
objects, so the same capability is expressed structurally: a pytree *mask*
marks which params live on which manifold, and ``riemannian_sgd`` applies

    p ← retr(p, -lr · egrad2rgrad(p, g))

to marked leaves (Euclidean SGD elsewhere). Works with any manifold namespace
exposing ``egrad2rgrad(grad, x)`` and ``retr(u, x)`` — e.g.
``sttode_tpu.manifolds.oblique``.
"""

from __future__ import annotations

from typing import Any

import jax
import optax

from sttode_tpu.manifolds import oblique


def riemannian_sgd(learning_rate: float, manifold_mask: Any,
                   manifold=oblique) -> optax.GradientTransformation:
    """SGD whose update on masked leaves is the Riemannian step.

    ``manifold_mask``: pytree (or prefix) of bools matching the params —
    True leaves are treated as points on ``manifold`` (rows on the manifold,
    trailing dim = ambient coords).

    Because a retraction is not an additive update, the transform returns
    ``retr(p, -lr·rgrad) - p`` so ``optax.apply_updates`` lands exactly on the
    retracted point.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        assert params is not None, "riemannian_sgd needs params"
        mask = manifold_mask
        if callable(mask):
            mask = mask(params)

        def one(is_manifold, g, p):
            # mask may be a PREFIX of the params tree: tree_map with the
            # mask first pairs each mask leaf with whole g/p SUBTREES, so
            # apply the per-leaf rule through an inner tree_map (a no-op
            # wrapper when g/p are already arrays)
            def leaf(gg, pp):
                if is_manifold:
                    rgrad = manifold.egrad2rgrad(gg, pp)
                    target = manifold.retr(-learning_rate * rgrad, pp)
                    return target - pp
                return -learning_rate * gg

            return jax.tree_util.tree_map(leaf, g, p)

        updates = jax.tree_util.tree_map(one, mask, updates, params)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def project_to_manifold(params: Any, manifold_mask: Any,
                        manifold=oblique) -> Any:
    """Project marked leaves onto the manifold (init-time normalization —
    ManifoldParameter's invariant that points stay on-manifold). The mask
    may be a prefix of the params tree (see riemannian_sgd)."""
    mask = manifold_mask(params) if callable(manifold_mask) else manifold_mask
    return jax.tree_util.tree_map(
        lambda m, p: jax.tree_util.tree_map(
            manifold.proj if m else (lambda x: x), p),
        mask, params)
