"""Riemannian optimizer, gumbel-dict MLPs, flat params, attention extras."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from sttode_tpu.manifolds import oblique
from sttode_tpu.nn.attention import mhgsa, mhgsa_init
from sttode_tpu.nn.gumbel import gumbel_softmax, mlp_dict, mlp_dict_init, \
    mlp_dict_softmax
from sttode_tpu.train.riemannian import project_to_manifold, riemannian_sgd
from sttode_tpu.utils.flat_params import (
    get_flat_grad, get_flat_params, param_l2, set_flat_params,
)


class TestRiemannianSGD:
    def test_stays_on_manifold(self, rng):
        params = {"sphere": jnp.asarray(rng.standard_normal((5, 8)),
                                        jnp.float32),
                  "flat": jnp.zeros((3,))}
        mask = {"sphere": True, "flat": False}
        params = project_to_manifold(params, mask)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(params["sphere"]), axis=-1), 1.0,
            atol=1e-6)
        target = jnp.asarray(rng.standard_normal((5, 8)), jnp.float32)

        opt = riemannian_sgd(0.1, mask)
        state = opt.init(params)

        def loss(p):
            return -jnp.sum(p["sphere"] * oblique.proj(target)) + \
                jnp.sum(p["flat"] ** 2)

        for _ in range(50):
            grads = jax.grad(loss)(params)
            updates, state = opt.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        norms = np.linalg.norm(np.asarray(params["sphere"]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
        # converged to the target directions
        align = np.sum(np.asarray(params["sphere"]) *
                       np.asarray(oblique.proj(target)), axis=-1)
        assert np.all(align > 0.99)


class TestGumbel:
    def test_gumbel_softmax_simplex(self, rng):
        logits = jnp.asarray(rng.standard_normal((6, 5)), jnp.float32)
        y = gumbel_softmax(jax.random.PRNGKey(0), logits, temperature=0.5)
        np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-5)
        y_hard = gumbel_softmax(jax.random.PRNGKey(0), logits, hard=True)
        assert set(np.unique(np.asarray(y_hard))) <= {0.0, 1.0} or \
            np.allclose(np.asarray(y_hard.sum(-1)), 1.0)

    def test_mlp_dict_forward_and_grad(self, rng):
        p = mlp_dict_init(jax.random.PRNGKey(0), 12, [16], edge_types=4)
        x = jnp.asarray(rng.standard_normal((7, 12)), jnp.float32)
        out, code = mlp_dict(p, x, jax.random.PRNGKey(1))
        assert out.shape == (7, 4) and code.shape == (7, 4)
        np.testing.assert_allclose(np.asarray(code.sum(-1)), 1.0, atol=1e-5)

        def loss(p):
            o, _ = mlp_dict(p, x, jax.random.PRNGKey(1))
            return jnp.sum(o ** 2)

        g = jax.grad(loss)(p)
        assert all(np.all(np.isfinite(np.asarray(l)))
                   for l in jax.tree_util.tree_leaves(g))
        out_s, code_s = mlp_dict_softmax(p, x)
        assert out_s.shape == (7, 4)


class TestFlatParams:
    def test_roundtrip(self, rng):
        params = {"a": jnp.asarray(rng.standard_normal((3, 4)), jnp.float32),
                  "b": [jnp.zeros(2), jnp.ones((2, 2))]}
        flat, unravel = get_flat_params(params)
        assert flat.shape == (3 * 4 + 2 + 4,)
        back = set_flat_params(flat, unravel)
        for x, y in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(back)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert get_flat_grad(params).shape == flat.shape
        assert float(param_l2(params)) > 0


class TestAttentionExtras:
    def test_bias_kv_and_zero_attn(self, rng):
        p = mhgsa_init(jax.random.PRNGKey(0), 32)
        x = jnp.asarray(rng.standard_normal((2, 5, 32)), jnp.float32)
        bias_k = jnp.asarray(rng.standard_normal((32,)), jnp.float32)
        bias_v = jnp.asarray(rng.standard_normal((32,)), jnp.float32)
        out, w = mhgsa(p, x, x, x, num_heads=4, bias_kv=(bias_k, bias_v),
                       add_zero_attn=True, need_weights=True, compat="tpu")
        assert out.shape == (2, 5, 32)
        assert w.shape == (2, 5, 7)  # S + bias + zero positions
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)
