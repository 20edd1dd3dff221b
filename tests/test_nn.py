"""L1-L3 unit tests: geodesic attention semantics (incl. quirk Q3), transformer
layers, ODE blocks (quirk Q1 one-step euler), GRU/Conv1d golden parity vs torch.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sttode_tpu.nn import (
    LayerConfig, encoder_layer, encoder_layer_init, encoder_stack,
    encoder_stack_init, mhgsa, mhgsa_init, ode_encoder,
)
from sttode_tpu.nn import core, embed, recurrent
from sttode_tpu.nn.attention import geodesic_scores
from sttode_tpu.nn.ode_block import ode_decoder
from sttode_tpu.nn.transformer import decoder_stack, decoder_stack_init


class TestGeodesicScores:
    def test_reference_orientation_square(self, rng):
        """Quirk Q3: for L==S the score matrix is -acos(k̂ q̂ᵀ) UNtransposed,
        i.e. entry [i,j] = -d(k_i, q_j)."""
        q = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
        s = geodesic_scores(q, k, compat="reference")
        qn = np.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))
        kn = np.asarray(k / np.linalg.norm(k, axis=-1, keepdims=True))
        expected = -np.arccos(np.clip(kn @ qn.T, -1 + 1e-4, 1 - 1e-4))
        np.testing.assert_allclose(np.asarray(s), expected, atol=1e-5)

    def test_reference_orientation_rect_transposes(self, rng):
        """L≠S: the reference transposes, giving the normal orientation."""
        q = jnp.asarray(rng.standard_normal((3, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((5, 8)), jnp.float32)
        s_ref = geodesic_scores(q, k, compat="reference")
        s_tpu = geodesic_scores(q, k, compat="tpu")
        assert s_ref.shape == (3, 5)
        np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_tpu),
                                   atol=1e-6)

    def test_self_distance_near_zero(self, rng):
        x = jnp.asarray(rng.standard_normal((6, 8)), jnp.float32)
        s = geodesic_scores(x, x, compat="tpu")
        # diagonal ≈ -acos(1-ε) ≈ -0.014, not exactly 0 due to the clamp
        assert np.all(np.abs(np.diag(np.asarray(s))) < 0.02)

    def test_grad_finite_at_clamp(self, rng):
        """∂acos explodes near ±1; the clip keeps gradients finite for
        identical (q == k) rows."""
        x = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)

        def loss(x):
            return jnp.sum(geodesic_scores(x, x, compat="tpu"))

        g = jax.grad(loss)(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestMHGSA:
    def test_shapes_and_softmax(self, rng):
        p = mhgsa_init(jax.random.PRNGKey(0), 64)
        x = jnp.asarray(rng.standard_normal((5, 7, 64)), jnp.float32)
        out, w = mhgsa(p, x, x, x, num_heads=8, need_weights=True)
        assert out.shape == (5, 7, 64)
        assert w.shape == (5, 7, 7)
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)

    def test_mask_applied_in_tpu_mode(self, rng):
        p = mhgsa_init(jax.random.PRNGKey(0), 32)
        x = jnp.asarray(rng.standard_normal((2, 6, 32)), jnp.float32)
        mask = jnp.zeros((2, 6, 6)).at[:, :, -2:].set(-jnp.inf)
        _, w = mhgsa(p, x, x, x, num_heads=4, mask=mask, compat="tpu",
                     need_weights=True)
        assert np.all(np.asarray(w)[:, :, -2:] < 1e-7)

    def test_cross_attention_path(self, rng):
        p = mhgsa_init(jax.random.PRNGKey(1), 32)
        q = jnp.asarray(rng.standard_normal((2, 3, 32)), jnp.float32)
        kv = jnp.asarray(rng.standard_normal((2, 9, 32)), jnp.float32)
        out, w = mhgsa(p, q, kv, kv, num_heads=4, need_weights=True)
        assert out.shape == (2, 3, 32)
        assert w.shape == (2, 3, 9)


class TestEncoderLayer:
    def test_forward_shape_finite(self, rng):
        cfg = LayerConfig(d_model=64, num_heads=8, ff_dim=128)
        p = encoder_layer_init(jax.random.PRNGKey(0), cfg)
        src = jnp.asarray(rng.standard_normal((4, 5, 1, 64)), jnp.float32)
        out = encoder_layer(p, src, cfg)
        assert out.shape == src.shape
        assert np.all(np.isfinite(np.asarray(out)))

    def test_deterministic_without_dropout(self, rng):
        cfg = LayerConfig(d_model=32, num_heads=4, ff_dim=64, dropout=0.0)
        p = encoder_layer_init(jax.random.PRNGKey(0), cfg)
        src = jnp.asarray(rng.standard_normal((3, 4, 1, 32)), jnp.float32)
        o1 = encoder_layer(p, src, cfg, rng=jax.random.PRNGKey(1))
        o2 = encoder_layer(p, src, cfg, rng=jax.random.PRNGKey(2))
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


class TestODEEncoder:
    def test_one_step_euler_is_scaled_residual(self, rng):
        """Quirk Q1: steps=1 euler over [0, T] == relu(x + T·layer(x))."""
        cfg = LayerConfig(d_model=32, num_heads=4, ff_dim=64)
        params = encoder_stack_init(jax.random.PRNGKey(0), cfg, 1)
        x = jnp.asarray(rng.standard_normal((4, 3, 1, 32)), jnp.float32)
        z = ode_encoder(params, x, cfg, time=12.0, method="euler", steps=1)
        fx = encoder_stack(params, x, cfg)
        expected = jax.nn.relu(x + 12.0 * fx)
        np.testing.assert_allclose(np.asarray(z), np.asarray(expected),
                                   rtol=2e-5, atol=2e-5)

    def test_multi_step_changes_result(self, rng):
        cfg = LayerConfig(d_model=32, num_heads=4, ff_dim=64)
        params = encoder_stack_init(jax.random.PRNGKey(0), cfg, 1)
        x = jnp.asarray(rng.standard_normal((2, 3, 1, 32)), jnp.float32)
        z1 = ode_encoder(params, x, cfg, time=1.0, steps=1)
        z4 = ode_encoder(params, x, cfg, time=1.0, method="rk4", steps=4)
        assert not np.allclose(np.asarray(z1), np.asarray(z4))
        assert np.all(np.isfinite(np.asarray(z4)))

    def test_ode_decoder_runs(self, rng):
        cfg = LayerConfig(d_model=32, num_heads=4, ff_dim=64)
        params = decoder_stack_init(jax.random.PRNGKey(0), cfg, 1)
        tgt = jnp.asarray(rng.standard_normal((2, 3, 1, 32)), jnp.float32)
        mem = jnp.asarray(rng.standard_normal((5, 3, 1, 32)), jnp.float32)
        z, w = ode_decoder(params, tgt, mem, cfg, time=2.0)
        assert z.shape == tgt.shape
        assert np.all(np.asarray(z) >= 0)  # relu epilogue


class TestGRUConvParity:
    def test_gru_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        B, T, D, H = 3, 7, 10, 16
        p = recurrent.gru_init(jax.random.PRNGKey(0), D, H)
        xs = rng.standard_normal((B, T, D)).astype(np.float32)

        tg = torch.nn.GRU(D, H, 1, batch_first=True)
        with torch.no_grad():
            tg.weight_ih_l0.copy_(torch.tensor(np.asarray(p.w_ih).T))
            tg.weight_hh_l0.copy_(torch.tensor(np.asarray(p.w_hh).T))
            tg.bias_ih_l0.copy_(torch.tensor(np.asarray(p.b_ih)))
            tg.bias_hh_l0.copy_(torch.tensor(np.asarray(p.b_hh)))
            t_ys, t_h = tg(torch.tensor(xs))

        ys, h = recurrent.gru(p, jnp.asarray(xs))
        np.testing.assert_allclose(np.asarray(ys), t_ys.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(h), t_h.numpy()[0], atol=1e-5)

    def test_gru_unhoisted_matches_hoisted(self, rng):
        """hoist=False (input projection inside the scan — the selection
        decode's large-row form) computes the same recurrence; only the
        input projection's matmul batching reassociates (jax's default
        matmul precision truncates operands to bf16 even on CPU, so the
        two batchings differ at ~1e-7)."""
        p = recurrent.gru_init(jax.random.PRNGKey(0), 32, 96)
        xs = jnp.asarray(rng.standard_normal((16, 8, 32)).astype(np.float32))
        ys_h, h_h = recurrent.gru(p, xs, hoist=True)
        ys_u, h_u = recurrent.gru(p, xs, hoist=False)
        np.testing.assert_allclose(np.asarray(ys_h), np.asarray(ys_u),
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(h_h), np.asarray(h_u),
                                   atol=2e-6)

    def test_gru_unroll_matches_loop(self, rng):
        """unroll=True (full lax.scan unroll) is the same recurrence with the
        same per-step operations — bitwise-equal to the while-loop form, in
        both hoist modes."""
        p = recurrent.gru_init(jax.random.PRNGKey(0), 32, 96)
        xs = jnp.asarray(rng.standard_normal((16, 8, 32)).astype(np.float32))
        for hoist in (True, False):
            ys_l, h_l = jax.jit(recurrent.gru, static_argnames=(
                "hoist", "unroll"))(p, xs, hoist=hoist, unroll=1)
            ys_u, h_u = jax.jit(recurrent.gru, static_argnames=(
                "hoist", "unroll"))(p, xs, hoist=hoist, unroll=True)
            np.testing.assert_array_equal(np.asarray(ys_l), np.asarray(ys_u))
            np.testing.assert_array_equal(np.asarray(h_l), np.asarray(h_u))

    def test_conv1d_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        B, T, Cin, Cout, K = 4, 8, 2, 32, 3
        p = recurrent.conv1d_init(jax.random.PRNGKey(0), Cin, Cout, K)
        x = rng.standard_normal((B, T, Cin)).astype(np.float32)

        tc = torch.nn.Conv1d(Cin, Cout, K, stride=1, padding=1)
        with torch.no_grad():
            tc.weight.copy_(torch.tensor(np.asarray(p.w).transpose(2, 1, 0)))
            tc.bias.copy_(torch.tensor(np.asarray(p.b)))
            t_out = tc(torch.tensor(x.transpose(0, 2, 1)))

        out = recurrent.conv1d(p, jnp.asarray(x), padding=1)
        np.testing.assert_allclose(np.asarray(out),
                                   t_out.numpy().transpose(0, 2, 1), atol=1e-5)


class TestEmbed:
    def test_pe_table_values(self):
        pe = np.asarray(embed.positional_encoding_table(50, 16))
        pos, i = 7, 3
        np.testing.assert_allclose(
            pe[pos, 2 * i], np.sin(pos * np.exp(2 * i * -np.log(1e4) / 16)),
            atol=1e-6)
        np.testing.assert_allclose(
            pe[pos, 2 * i + 1], np.cos(pos * np.exp(2 * i * -np.log(1e4) / 16)),
            atol=1e-6)

    def test_forward_shape(self, rng):
        p = embed.positional_agent_encoding_init(jax.random.PRNGKey(0), 32)
        x = jnp.asarray(rng.standard_normal((6, 12, 32)), jnp.float32)
        y = embed.positional_agent_encoding(p, x)
        assert y.shape == x.shape


class TestCore:
    def test_mlp_output_head_not_activated(self, rng):
        p = core.mlp_init(jax.random.PRNGKey(0), 8, [16, 16], 4)
        x = jnp.asarray(rng.standard_normal((5, 8)), jnp.float32)
        y = core.mlp(p, x, activation="relu")
        assert y.shape == (5, 4)
        assert np.any(np.asarray(y) < 0)  # linear head can go negative

    def test_layer_norm_zero_mean_unit_var(self, rng):
        p = core.layer_norm_init(64)
        x = jnp.asarray(rng.standard_normal((10, 64)) * 5 + 3, jnp.float32)
        y = np.asarray(core.layer_norm(p, x))
        np.testing.assert_allclose(y.mean(-1), 0.0, atol=1e-5)
        np.testing.assert_allclose(y.std(-1), 1.0, atol=1e-2)

    def test_dropout_scales(self, rng):
        x = jnp.ones((1000,))
        y = core.dropout(jax.random.PRNGKey(0), x, 0.5, deterministic=False)
        kept = np.asarray(y) > 0
        np.testing.assert_allclose(np.asarray(y)[kept], 2.0)
        assert 0.4 < kept.mean() < 0.6


class TestPoincareMetricAttention:
    def test_poincare_scores_finite_and_distinct(self, rng):
        q = jnp.asarray(rng.standard_normal((4, 8)) * 0.3, jnp.float32)
        k = jnp.asarray(rng.standard_normal((4, 8)) * 0.3, jnp.float32)
        s_obl = geodesic_scores(q, k, compat="tpu", metric="oblique")
        s_poi = geodesic_scores(q, k, compat="tpu", metric="poincare")
        assert s_poi.shape == (4, 4)
        assert np.all(np.isfinite(np.asarray(s_poi)))
        assert np.all(np.asarray(s_poi) <= 0)
        assert not np.allclose(np.asarray(s_obl), np.asarray(s_poi))

    def test_poincare_self_distance_zero(self, rng):
        x = jnp.asarray(rng.standard_normal((5, 8)) * 0.3, jnp.float32)
        s = geodesic_scores(x, x, compat="tpu", metric="poincare")
        np.testing.assert_allclose(np.asarray(jnp.diag(s)), 0.0, atol=1e-3)

    def test_poincare_scores_match_broadcast_pairs(self, rng):
        """The Gram closed form the score path now uses must equal the
        original broadcasted Möbius-pairs computation (incl. Q3 compat)."""
        from sttode_tpu.manifolds import pmath
        q = jnp.asarray(rng.standard_normal((2, 6, 8)) * 0.5, jnp.float32)
        k = jnp.asarray(rng.standard_normal((2, 6, 8)) * 0.5, jnp.float32)
        for c in (0.4, 1.0):
            for compat in ("tpu", "reference"):
                s = geodesic_scores(q, k, compat=compat, metric="poincare",
                                    curvature=c)
                qb = pmath.project(pmath.expmap0(q, c=c), c=c)
                kb = pmath.project(pmath.expmap0(k, c=c), c=c)
                d = pmath.dist(qb[..., :, None, :], kb[..., None, :, :], c=c)
                if compat == "reference":      # square → transposed (Q3)
                    d = jnp.swapaxes(d, -1, -2)
                # tolerance per the documented Gram-cancellation bound
                np.testing.assert_allclose(np.asarray(s), np.asarray(-d),
                                           atol=5e-3, rtol=1e-3)

    def test_poincare_attention_grads(self, rng):
        from sttode_tpu.nn.attention import geodesic_attention
        q = jnp.asarray(rng.standard_normal((2, 4, 8)) * 0.3, jnp.float32)
        v = jnp.asarray(rng.standard_normal((2, 4, 8)), jnp.float32)

        def loss(q):
            out, _ = geodesic_attention(q, q, v, compat="tpu",
                                        metric="poincare", curvature=0.5)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(q)
        assert np.all(np.isfinite(np.asarray(g)))
