"""L0 unit tests: oblique + Poincaré math vs closed forms (SURVEY.md §4a)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sttode_tpu.manifolds import oblique, euclidean, pmath


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)


class TestOblique:
    def test_proj_unit_norm(self, rng):
        x = _rand(rng, 4, 7, 16)
        p = oblique.proj(x)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(p), axis=-1), 1.0, atol=1e-5)

    def test_dist_identity_is_clamped_zero(self, rng):
        x = oblique.proj(_rand(rng, 3, 5, 8))
        d = oblique.dist(x, x)
        diag = np.asarray(jnp.diagonal(d, axis1=-2, axis2=-1))
        # clamp at 1-1e-4 ⇒ acos ≈ sqrt(2e-4) ≈ 0.0141, reference quirk Q9
        assert np.all(diag < 0.02)

    def test_dist_orthogonal(self):
        u = jnp.array([[1.0, 0.0]])
        v = jnp.array([[0.0, 1.0]])
        d = oblique.dist(u, v)
        np.testing.assert_allclose(float(d[0, 0]), np.pi / 2, atol=1e-4)

    def test_dist_antipodal_clamped(self):
        u = jnp.array([[1.0, 0.0]])
        d = oblique.dist(u, -u)
        # clamped below π by sqrt(2 eps)
        assert float(d[0, 0]) < np.pi
        assert float(d[0, 0]) > np.pi - 0.02

    def test_exp_log_roundtrip(self, rng):
        x = oblique.proj(_rand(rng, 5, 8))
        u = oblique.proj_tan(_rand(rng, 5, 8) * 0.3, x)
        y = oblique.expmap(u, x)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(y), axis=-1), 1.0, atol=1e-5)
        u_back = oblique.logmap(y, x)
        np.testing.assert_allclose(np.asarray(u_back), np.asarray(u),
                                   atol=2e-2, rtol=2e-2)

    def test_expmap_great_circle(self):
        # moving π/2 along a tangent great circle from e1 lands on the tangent dir
        x = jnp.array([[1.0, 0.0]])
        u = jnp.array([[0.0, np.pi / 2]])
        y = oblique.expmap(u, x)
        np.testing.assert_allclose(np.asarray(y), [[0.0, 1.0]], atol=1e-6)

    def test_egrad2rgrad_tangent(self, rng):
        x = oblique.proj(_rand(rng, 6, 4))
        g = _rand(rng, 6, 4)
        rg = oblique.egrad2rgrad(g, x)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(rg * x, axis=-1)), 0.0, atol=1e-5)

    def test_dist_grad_finite_at_clamp(self):
        # ∂acos explodes at ±1; the clamp keeps gradients finite (quirk Q9)
        u = jnp.array([[1.0, 0.0]])

        def f(v):
            return jnp.sum(oblique.dist(u, oblique.proj(v)))

        g = jax.grad(f)(jnp.array([[1.0, 1e-8]]))
        assert np.all(np.isfinite(np.asarray(g)))


class TestEuclidean:
    def test_dist_closed_form(self, rng):
        u = _rand(rng, 3, 4)
        v = _rand(rng, 5, 4)
        d = euclidean.dist(u, v)
        expect = np.linalg.norm(
            np.asarray(u)[:, None, :] - np.asarray(v)[None, :, :], axis=-1)
        np.testing.assert_allclose(np.asarray(d), expect, atol=1e-5)

    def test_trivial_maps(self, rng):
        x, u = _rand(rng, 4, 3), _rand(rng, 4, 3)
        np.testing.assert_allclose(np.asarray(euclidean.expmap(u, x)),
                                   np.asarray(x + u))
        np.testing.assert_allclose(np.asarray(euclidean.logmap(x + u, x)),
                                   np.asarray(u), atol=1e-6)


class TestPoincare:
    def test_artanh_matches_closed_form(self, rng):
        x = jnp.asarray(rng.uniform(-0.9, 0.9, size=(32,)), dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(pmath.artanh(x)),
                                   np.arctanh(np.asarray(x)), atol=5e-5,
                                   rtol=5e-4)

    def test_artanh_grad_matches_reference_rule(self):
        # backward = g/(1-x_clamped²), finite at |x|≥1 (reference pmath.py:24-27)
        g = jax.grad(lambda x: pmath.artanh(x))(jnp.float32(0.5))
        np.testing.assert_allclose(float(g), 1 / (1 - 0.25), atol=1e-5)
        g_edge = jax.grad(lambda x: pmath.artanh(x))(jnp.float32(1.5))
        assert np.isfinite(float(g_edge))
        np.testing.assert_allclose(float(g_edge), 1 / (1 - (1 - 1e-5) ** 2),
                                   rtol=5e-3)

    def test_arsinh(self, rng):
        x = _rand(rng, 16)
        np.testing.assert_allclose(np.asarray(pmath.arsinh(x)),
                                   np.arcsinh(np.asarray(x)), atol=2e-4,
                                   rtol=2e-4)
        g = jax.grad(lambda v: pmath.arsinh(v))(jnp.float32(2.0))
        np.testing.assert_allclose(float(g), 1 / np.sqrt(5.0), atol=1e-6)

    def test_mobius_add_zero_identity(self, rng):
        x = pmath.project(_rand(rng, 8, 4) * 0.3)
        z = jnp.zeros_like(x)
        np.testing.assert_allclose(np.asarray(pmath.mobius_add(z, x)),
                                   np.asarray(x), atol=1e-4)
        np.testing.assert_allclose(np.asarray(pmath.mobius_add(x, z)),
                                   np.asarray(x), atol=1e-4)

    def test_mobius_left_cancellation(self, rng):
        x = pmath.project(_rand(rng, 8, 4) * 0.3)
        y = pmath.project(_rand(rng, 8, 4) * 0.3)
        lhs = pmath.mobius_add(-x, pmath.mobius_add(x, y))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(y),
                                   atol=2e-3, rtol=1e-2)

    def test_exp0_log0_roundtrip(self, rng):
        u = _rand(rng, 8, 4) * 0.5
        y = pmath.expmap0(u)
        np.testing.assert_allclose(np.asarray(pmath.logmap0(y)), np.asarray(u),
                                   atol=1e-3, rtol=1e-3)

    def test_exp_log_roundtrip(self, rng):
        x = pmath.project(_rand(rng, 8, 4) * 0.2)
        u = _rand(rng, 8, 4) * 0.3
        y = pmath.expmap(x, u)
        np.testing.assert_allclose(np.asarray(pmath.logmap(x, y)), np.asarray(u),
                                   atol=2e-3, rtol=2e-2)

    def test_dist_symmetry_and_zero(self, rng):
        x = pmath.project(_rand(rng, 8, 4) * 0.3)
        y = pmath.project(_rand(rng, 8, 4) * 0.3)
        np.testing.assert_allclose(np.asarray(pmath.dist(x, y)),
                                   np.asarray(pmath.dist(y, x)), atol=1e-4,
                                   rtol=1e-3)
        assert np.all(np.asarray(pmath.dist(x, x)) < 1e-2)

    def test_dist0_closed_form(self):
        # d(0, x) = 2 artanh(‖x‖) for c=1
        x = jnp.array([[0.5, 0.0]])
        np.testing.assert_allclose(float(pmath.dist0(x)[0]),
                                   2 * np.arctanh(0.5), atol=1e-4)

    def test_mobius_matvec_vs_exp_log(self, rng):
        # M ⊗ x = exp0(M log0(x)) — Möbius matvec defining property
        m = _rand(rng, 4, 4) * 0.5
        x = pmath.project(_rand(rng, 6, 4) * 0.3)
        lhs = pmath.mobius_matvec(m, x)
        rhs = pmath.expmap0(pmath.logmap0(x) @ jnp.asarray(m).T)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   atol=2e-3, rtol=2e-2)

    def test_dist_matrix_matches_pairwise(self, rng):
        x = pmath.project(_rand(rng, 5, 3) * 0.3)
        y = pmath.project(_rand(rng, 7, 3) * 0.3)
        dm = np.asarray(pmath.dist_matrix(x, y))
        for i in range(5):
            for j in range(7):
                np.testing.assert_allclose(
                    dm[i, j], float(pmath.dist(x[i], y[j])), atol=1e-4,
                    rtol=1e-3)

    def test_dist_matrix_gram_matches_pairs(self, rng):
        """Gram closed form == materialized Möbius-pairs oracle, values and
        gradients, for several curvatures."""
        x = pmath.project(_rand(rng, 6, 4) * 0.4)
        y = pmath.project(_rand(rng, 9, 4) * 0.4)
        for c in (0.5, 1.0, 2.0):
            fast = np.asarray(pmath.dist_matrix_gram(x, y, c=c))
            ref = np.asarray(pmath.dist_matrix(x, y, c=c))
            # atol per the documented cancellation bound: near-coincident
            # pairs can deviate ~1e-3 absolute (seed-dependent); distant
            # pairs agree to ~1e-5
            np.testing.assert_allclose(fast, ref, atol=2e-3, rtol=1e-3)

            def loss_fast(x, y):
                return jnp.sum(jnp.sin(pmath.dist_matrix_gram(x, y, c=c)))

            def loss_ref(x, y):
                return jnp.sum(jnp.sin(pmath.dist_matrix(x, y, c=c)))

            gf = jax.grad(loss_fast, argnums=(0, 1))(x, y)
            gr = jax.grad(loss_ref, argnums=(0, 1))(x, y)
            for a, b in zip(gf, gr):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=5e-3, rtol=5e-3)

    def test_dist_matrix_gram_batched_and_self(self, rng):
        """Leading batch dims broadcast; the self-distance diagonal is small
        (the documented Gram-cancellation bound, not exactly 0) and its
        gradient is finite."""
        x = pmath.project(_rand(rng, 2, 3, 5, 4) * 0.3)
        d = pmath.dist_matrix_gram(x, x)
        assert d.shape == (2, 3, 5, 5)
        diag = np.asarray(jnp.diagonal(d, axis1=-2, axis2=-1))
        np.testing.assert_allclose(diag, 0.0, atol=5e-3)
        g = jax.grad(lambda x: jnp.sum(pmath.dist_matrix_gram(x, x)))(x)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_dist_matrix_gram_softmax_deviation_bounded(self, rng):
        """The property the attention path relies on: even for boundary-
        saturated points (where the docstring's cancellation note applies),
        softmax over the Gram-form scores deviates from the pairs form by
        < 2e-3 per weight."""
        for scale in (0.3, 3.0):
            q = pmath.project(pmath.expmap0(_rand(rng, 48, 8) * scale))
            fast = pmath.dist_matrix_gram(q, q)
            pairs = pmath.dist(q[:, None, :], q[None, :, :])
            w_f = jax.nn.softmax(-fast, axis=-1)
            w_p = jax.nn.softmax(-pairs, axis=-1)
            assert float(jnp.abs(w_f - w_p).max()) < 2e-3

    def test_poincare_mean_of_identical_points(self, rng):
        p = pmath.project(_rand(rng, 1, 4) * 0.3)
        stack = jnp.tile(p, (5, 1))
        m = pmath.poincare_mean(stack, axis=0)
        np.testing.assert_allclose(np.asarray(m), np.asarray(p[0]), atol=1e-4)

    def test_p2k_k2p_roundtrip(self, rng):
        x = pmath.project(_rand(rng, 8, 4) * 0.3)
        np.testing.assert_allclose(np.asarray(pmath.k2p(pmath.p2k(x, 1.0), 1.0)),
                                   np.asarray(x), atol=1e-5)

    def test_riemannian_gradient_scale(self):
        x = jnp.array([[0.5, 0.0]])
        g = jax.grad(lambda v: jnp.sum(pmath.riemannian_gradient(v)))(x)
        expect = (1 - 0.25) ** 2 / 4
        np.testing.assert_allclose(np.asarray(g), expect, atol=1e-6)

    def test_auto_select_c(self):
        c = pmath.auto_select_c(2)
        assert 0 < c < 10
        # d=2: R² = Γ(2)/π⁰ = 1 → wait, R = (Γ(2)/π^0)^(1/2) = 1 → c=1
        np.testing.assert_allclose(c, 1.0, atol=1e-6)

    def test_hyperbolic_softmax_shapes(self, rng):
        x = pmath.project(_rand(rng, 6, 4) * 0.3)
        a = _rand(rng, 3, 4)
        p = pmath.project(_rand(rng, 3, 4) * 0.2)
        logits = pmath.hyperbolic_softmax(x, a, p, 1.0)
        assert logits.shape == (6, 3)
        assert np.all(np.isfinite(np.asarray(logits)))
