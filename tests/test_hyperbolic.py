"""Hyperbolic NN layers + δ-hyperbolicity tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sttode_tpu.manifolds import pmath
from sttode_tpu.nn import hyperbolic as H
from sttode_tpu.utils.delta import batched_delta_hyp, delta_hyp, features_delta


def ball_points(rng, n, d, c=1.0, scale=0.3):
    x = rng.standard_normal((n, d)).astype(np.float32) * scale
    return np.asarray(pmath.project(jnp.asarray(x), c=c))


class TestHypLinear:
    def test_output_in_ball(self, rng):
        p = H.hyp_linear_init(jax.random.PRNGKey(0), 8, 16)
        x = jnp.asarray(ball_points(rng, 10, 8))
        y = H.hyp_linear(p, x, c=1.0)
        norms = np.linalg.norm(np.asarray(y), axis=-1)
        assert np.all(norms < 1.0)

    def test_no_bias(self, rng):
        p = H.hyp_linear_init(jax.random.PRNGKey(0), 8, 8, bias=False)
        x = jnp.asarray(ball_points(rng, 4, 8))
        y = H.hyp_linear(p, x)
        assert "b" not in p and y.shape == (4, 8)

    def test_identity_weight_keeps_points(self, rng):
        """Möbius matvec with the identity is the identity on the ball."""
        p = {"w": jnp.eye(6)}
        x = jnp.asarray(ball_points(rng, 5, 6))
        y = H.hyp_linear(p, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


class TestHyperbolicMLR:
    def test_logits_shape_and_grad(self, rng):
        p = H.hyperbolic_mlr_init(jax.random.PRNGKey(0), 8, 5)
        x = jnp.asarray(ball_points(rng, 12, 8))
        logits = H.hyperbolic_mlr(p, x, c=1.0)
        assert logits.shape == (12, 5)

        def loss(p):
            return -jnp.mean(jax.nn.log_softmax(H.hyperbolic_mlr(p, x))[:, 0])

        g = jax.grad(loss)(p)
        assert all(np.all(np.isfinite(np.asarray(l)))
                   for l in jax.tree_util.tree_leaves(g))


class TestPoincareMaps:
    def test_to_from_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((6, 8)).astype(np.float32) * 0.2)
        ball = H.to_poincare(x, c=1.0, riemannian=False)
        back = H.from_poincare(ball, c=1.0)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)

    def test_clip_r_bounds_norm(self, rng):
        x = jnp.asarray(rng.standard_normal((6, 8)).astype(np.float32) * 100)
        ball = H.to_poincare(x, c=1.0, clip_r=1.0, riemannian=False)
        # expmap0 of norm ≤ 1 tangents: ball norm ≤ tanh(1)
        assert np.all(np.linalg.norm(np.asarray(ball), axis=-1)
                      <= np.tanh(1.0) + 1e-4)

    def test_riemannian_rescales_grad_only(self, rng):
        x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32) * 0.2)
        b1 = H.to_poincare(x, riemannian=False)
        b2 = H.to_poincare(x, riemannian=True)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-7)
        g1 = jax.grad(lambda x: jnp.sum(H.to_poincare(x, riemannian=False)))(x)
        g2 = jax.grad(lambda x: jnp.sum(H.to_poincare(x, riemannian=True)))(x)
        assert not np.allclose(np.asarray(g1), np.asarray(g2))

    def test_concat_and_distance(self, rng):
        p = H.concat_poincare_init(jax.random.PRNGKey(0), 4, 6, 8)
        x1 = jnp.asarray(ball_points(rng, 5, 4))
        x2 = jnp.asarray(ball_points(rng, 5, 6))
        y = H.concat_poincare(p, x1, x2)
        assert y.shape == (5, 8)
        d = H.hyperbolic_distance(y, y)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-3)


class TestDelta:
    def test_tree_metric_is_zero_delta(self):
        """A star tree (all pairs through the hub) is 0-hyperbolic."""
        n = 6
        d = np.full((n, n), 2.0)
        np.fill_diagonal(d, 0.0)
        d[0, :] = d[:, 0] = 1.0
        d[0, 0] = 0.0
        assert delta_hyp(d) == pytest.approx(0.0, abs=1e-9)

    def test_euclidean_plane_positive_delta(self, rng):
        x = rng.standard_normal((100, 2))
        mean, std = batched_delta_hyp(x, n_tries=3, batch_size=50,
                                      rng=np.random.default_rng(0))
        assert mean > 0.05  # flat space is far from 0-hyperbolic

    def test_features_delta(self, rng):
        batches = [rng.standard_normal((20, 4)) for _ in range(3)]
        delta, diam = features_delta(batches, lambda b: b, sample=30,
                                     rng=np.random.default_rng(0))
        assert delta >= 0 and diam > 0
