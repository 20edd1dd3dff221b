"""Regression tests for the round-1 code-review findings."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sttode_tpu.data.batching import bucket_for
from sttode_tpu.models import Batch, STTODEConfig, sttode_init, sttode_forward
from sttode_tpu.nn import LayerConfig, encoder_stack_init, ode_encoder
from sttode_tpu.nn.attention import geodesic_scores
from sttode_tpu.nn.hyperbolic import to_poincare
from sttode_tpu.nn.ode_block import ode_decoder
from sttode_tpu.nn.transformer import decoder_stack_init


class TestAdjointParamGrads:
    def test_ode_encoder_adjoint_trains(self, rng):
        """Continuous adjoint must deliver nonzero parameter gradients —
        params flow through odeint_adjoint's *args, not a closure."""
        cfg = LayerConfig(d_model=16, num_heads=4, ff_dim=32)
        params = encoder_stack_init(jax.random.PRNGKey(0), cfg, 1)
        x = jnp.asarray(rng.standard_normal((2, 3, 1, 16)), jnp.float32)

        def loss(p):
            z = ode_encoder(p, x, cfg, time=1.0, method="rk4", steps=2,
                            adjoint=True)
            return jnp.sum(z ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
        assert total > 0, "adjoint produced zero parameter gradients"

    def test_adjoint_matches_direct_grads(self, rng):
        cfg = LayerConfig(d_model=16, num_heads=4, ff_dim=32)
        params = encoder_stack_init(jax.random.PRNGKey(0), cfg, 1)
        x = jnp.asarray(rng.standard_normal((2, 2, 1, 16)) * 0.1, jnp.float32)

        def loss(p, adjoint):
            z = ode_encoder(p, x, cfg, time=0.5, method="rk4", steps=4,
                            adjoint=adjoint)
            return jnp.sum(z ** 2)

        g_dir = jax.grad(lambda p: loss(p, False))(params)
        g_adj = jax.grad(lambda p: loss(p, True))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_dir),
                        jax.tree_util.tree_leaves(g_adj)):
            # continuous vs discrete adjoint differ by the discretization
            # error of the backward augmented integration — ~1% relative at
            # h=0.125 rk4 (measured); assert the agreement, not identity
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-2, rtol=1e-1)


class TestOdeDecoderWeights:
    def test_weights_are_materializable(self, rng):
        cfg = LayerConfig(d_model=16, num_heads=4, ff_dim=32)
        params = decoder_stack_init(jax.random.PRNGKey(0), cfg, 1)
        tgt = jnp.asarray(rng.standard_normal((2, 3, 1, 16)), jnp.float32)
        mem = jnp.asarray(rng.standard_normal((4, 3, 1, 16)), jnp.float32)
        z, w = ode_decoder(params, tgt, mem, cfg, time=1.0)
        # no escaped tracers: weights convert to numpy cleanly
        assert np.all(np.isfinite(np.asarray(w["self"])))
        assert np.all(np.isfinite(np.asarray(w["cross"])))


class TestAgentAxisGuard:
    def test_agent_axis_with_reference_compat_raises(self, rng):
        cfg = STTODEConfig(hidden_dim=16, zdim=8, num_heads=4, ff_dim=32,
                           compat="reference", attn_axis="agent", sample_k=2)
        with pytest.raises(AssertionError):
            cfg.validate()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        M = 4
        past = jnp.zeros((M, 8, 2))
        batch = Batch(past=past, past_vel=past,
                      future=jnp.zeros((M, 12, 2)),
                      future_vel=jnp.zeros((M, 12, 2)),
                      valid=jnp.ones((M,)), batch_size=1, agent_num=4)
        with pytest.raises(ValueError, match="agent"):
            sttode_forward(params, cfg, batch, jax.random.PRNGKey(1))


class TestBucketOverflow:
    def test_bucket_beyond_ladder(self):
        assert bucket_for(150) == 256
        assert bucket_for(129) == 256
        assert bucket_for(300) == 384

    def test_eval_huge_scene_does_not_crash(self, rng):
        from sttode_tpu.data.batching import scene_batches
        scenes = [{"obs": rng.standard_normal((150, 8, 2)).astype(np.float32),
                   "pred": rng.standard_normal((150, 12, 2)).astype(
                       np.float32)}]
        (batch, origs), = scene_batches(scenes, training=False)
        assert batch.agent_num == 256
        assert float(batch.valid.sum()) == 150


class TestPoincareGradAtZero:
    def test_zero_rows_grad_finite(self):
        x = jnp.zeros((3, 8)).at[0].set(0.3)

        def loss_scores(x):
            return jnp.sum(geodesic_scores(x, x, compat="tpu",
                                           metric="poincare"))

        def loss_ball(x):
            return jnp.sum(to_poincare(x, riemannian=False) ** 2)

        for fn in (loss_scores, loss_ball):
            g = jax.grad(fn)(x)
            assert np.all(np.isfinite(np.asarray(g))), fn.__name__


class TestServingIsolation:
    def test_scene_axis_requests_isolated(self, rng):
        """With scene-axis attention (default), a request's prediction must
        not depend on other requests in the micro-batch."""
        from sttode_tpu.serving import Predictor
        cfg = STTODEConfig(hidden_dim=16, zdim=8, num_heads=4, ff_dim=32,
                           past_length=8, future_length=12, sample_k=2)
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        pred = Predictor(params, cfg)
        a = rng.standard_normal((3, 8, 2)).astype(np.float32)
        b = rng.standard_normal((3, 8, 2)).astype(np.float32) * 10
        solo = pred.predict_many([a], seed=0)[0]
        together = pred.predict_many([a, b], seed=0)[0]
        np.testing.assert_allclose(together, solo, atol=1e-5)


class TestSecondReviewFixes:
    def test_serving_determinism_across_compositions(self, rng):
        """Same (seed, scene) → same samples regardless of batch company."""
        from sttode_tpu.serving import Predictor
        cfg = STTODEConfig(hidden_dim=16, zdim=8, num_heads=4, ff_dim=32,
                           sample_k=2)
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        p = Predictor(params, cfg)
        a = rng.standard_normal((3, 8, 2)).astype(np.float32)
        b = rng.standard_normal((4, 8, 2)).astype(np.float32)
        solo = p.predict(b, seed=9)
        batched = p.predict_many([a, b], seed=9)[1]
        np.testing.assert_array_equal(solo, batched)

    def test_serving_group_cap(self, rng):
        from sttode_tpu.serving import Predictor
        cfg = STTODEConfig(hidden_dim=16, zdim=8, num_heads=4, ff_dim=32,
                           sample_k=2, compat="tpu", attn_axis="agent")
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        p = Predictor(params, cfg, max_group=2)
        scenes = [rng.standard_normal((3, 8, 2)).astype(np.float32)
                  for _ in range(5)]
        outs = p.predict_many(scenes, seed=0)
        assert all(o.shape == (2, 3, 12, 2) for o in outs)

    def test_training_without_rng_raises(self, rng):
        from sttode_tpu.data.batching import scene_batches
        scenes = [{"obs": rng.standard_normal((3, 8, 2)).astype(np.float32),
                   "pred": rng.standard_normal((3, 12, 2)).astype(np.float32)}]
        with pytest.raises(ValueError, match="rng"):
            list(scene_batches(scenes, training=True))

    def test_prefetch_abandonment_releases_producer(self):
        import threading
        import time
        from sttode_tpu.data.prefetch import prefetch

        n_before = threading.active_count()
        it = prefetch(iter(range(100)), size=1, device_put=lambda x: x)
        next(it)
        it.close()          # abandon mid-stream
        time.sleep(0.5)     # bounded-wait put should let the thread exit
        assert threading.active_count() <= n_before + 1

    def test_max_train_agent_respected_beyond_ladder(self, rng):
        """max_train_agent above the ladder top is honored, not silently
        re-capped to 128."""
        from sttode_tpu.data.batching import scene_batches
        scenes = [{"obs": rng.standard_normal((200, 8, 2)).astype(np.float32),
                   "pred": rng.standard_normal((200, 12, 2)).astype(
                       np.float32)}]
        (batch, _), = scene_batches(scenes, training=True,
                                    rng=np.random.default_rng(0),
                                    max_train_agent=150)
        assert float(batch.valid.sum()) == 150
        assert batch.agent_num == 256


class TestRound4ReviewFixes:
    """Regression tests for the round-4 self-review findings."""

    def test_dopri5_scan_budget_grad_constant_field(self):
        """A constant vector field makes _initial_step's probe diff exactly
        zero; the unguarded sqrt(0) there poisoned every gradient of the
        direct reverse-mode (scan_budget) solve with NaN."""
        from sttode_tpu.ode.solvers import odeint

        def f(t, y):
            return jnp.ones_like(y)

        g = jax.grad(lambda y0: jnp.sum(
            odeint(f, y0, jnp.array([0.0, 1.0]), method="dopri5",
                   scan_budget=16)[-1]))(jnp.array([0.5, 0.5]))
        np.testing.assert_allclose(np.asarray(g), [1.0, 1.0], atol=1e-5)

    def test_dopri5_scan_budget_exhaustion_warns(self, capfd):
        """Budget exhaustion is loud (jax.debug.print from inside the jitted
        solve), not a silent mid-interval truncation."""
        from sttode_tpu.ode.solvers import odeint

        def f(t, y):
            return -50.0 * y          # stiff enough that 2 attempts cannot

        ys = odeint(f, jnp.ones((2,)), jnp.array([0.0, 1.0]),
                    method="dopri5", scan_budget=2)
        jax.block_until_ready(ys)
        out = capfd.readouterr()
        assert "scan_budget=2 exhausted" in out.out + out.err

    def test_adjoint_backward_scan_budget_doubled(self):
        """odeint_adjoint's backward integrates the larger augmented system;
        a forward-sized budget must not silently truncate gradients — grads
        of a simple linear field stay close to analytic."""
        from sttode_tpu.ode.solvers import odeint_adjoint

        def f(t, y):
            return 0.5 * y

        def loss(y0):
            ys = odeint_adjoint(f, y0, jnp.array([0.0, 1.0]),
                                method="dopri5", rtol=1e-6, atol=1e-8,
                                scan_budget=48)
            return jnp.sum(ys[-1])

        g = jax.grad(loss)(jnp.array([1.0, 2.0]))
        np.testing.assert_allclose(np.asarray(g),
                                   np.full(2, np.exp(0.5)), rtol=1e-3)

    def test_fused_mask_uniform_shift_is_softmax_noop(self, rng):
        """A uniform -100 additive mask is a softmax no-op; the maxless
        kernel previously flushed every lane to exact 0."""
        from sttode_tpu.kernels.mhgsa import fused_geodesic_attention

        q = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
        out0 = fused_geodesic_attention(q, k, v)
        out = fused_geodesic_attention(
            q, k, v, mask=jnp.full((2, 8, 8), -100.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(out0),
                                   atol=1e-5)

    def test_fused_mask_positive_bias_matches_dense(self, rng):
        """Positive additive biases are handled exactly (row-max shift), so
        the fused route agrees with the dense max-subtracted softmax instead
        of silently clamping the bias to 0."""
        from sttode_tpu.kernels.mhgsa import fused_geodesic_attention

        HI = jax.lax.Precision.HIGHEST
        q = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
        mask = jnp.where(jnp.arange(8) % 2 == 0, 2.0, 0.0) * \
            jnp.ones((2, 8, 8))

        qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        kn = k / jnp.linalg.norm(k, axis=-1, keepdims=True)
        s = -jnp.arccos(jnp.clip(
            jnp.einsum("bld,bsd->bls", qn, kn, precision=HI),
            -1 + 1e-4, 1 - 1e-4)) + mask
        dense = jnp.einsum("bls,bsd->bld", jax.nn.softmax(s, axis=-1), v,
                           precision=HI)
        out = fused_geodesic_attention(q, k, v, mask=mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                                   atol=1e-5)
        # all-masked-row semantics preserved: sentinel rows still output 0
        m_all = jnp.full((2, 8, 8), -1e30)
        out_z = fused_geodesic_attention(q, k, v, mask=m_all)
        assert float(jnp.max(jnp.abs(out_z))) == 0.0
        # gradients into a differentiable mask stay finite
        g = jax.grad(lambda m: jnp.sum(
            fused_geodesic_attention(q, k, v, mask=m)))(mask)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_cli_distributed_without_coordinator_fails_fast(self, monkeypatch,
                                                            tmp_path):
        """--distributed with no coordinator env must exit, not quietly train
        standalone (duplicated work racing the shared checkpoint dir)."""
        from sttode_tpu.cli import train as train_cli

        for var in ("JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"):
            monkeypatch.delenv(var, raising=False)
        with pytest.raises(SystemExit, match="no coordinator"):
            train_cli.main(["--dataset", "eth", "--distributed",
                            "--data_root", str(tmp_path)])


class TestKernelReviewFixes:
    """Regression tests for the round-4 kernels-package review findings."""

    def test_poincare_bound_covers_denominator_floor(self, rng):
        """c in [0.024, 0.0312) passed the old exp-underflow-derived bound
        but broke the kernels' 1e-30 softmax-denominator floor (a saturated
        row's weights stopped summing to 1 — outputs measured 26x too
        small); the bound now covers the floor."""
        from sttode_tpu.kernels.mhgsa import (MIN_MAXLESS_CURVATURE,
                                              fused_geodesic_attention)

        assert MIN_MAXLESS_CURVATURE >= (12.21 / 69.07) ** 2
        q = jnp.asarray(rng.standard_normal((1, 8, 8)), jnp.float32)
        with pytest.raises(ValueError, match="curvature"):
            fused_geodesic_attention(q, q, q, metric="poincare",
                                     curvature=0.025, interpret=True)

    def test_kv_valid_merges_with_additive_mask(self, rng):
        """kv_valid must not be dropped when an additive mask is also
        passed — padded keys would silently receive attention weight."""
        from sttode_tpu.nn.attention import geodesic_attention

        q = jnp.asarray(rng.standard_normal((1, 5, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 6, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 6, 8)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((1, 5, 6)), jnp.float32)
        kvv = jnp.array([[1.0, 1.0, 1.0, 1.0, 0.0, 0.0]])
        _, w = geodesic_attention(q, k, v, mask=bias, kv_valid=kvv,
                                  fused=False, need_weights=True)
        assert float(jnp.max(jnp.abs(w[..., 4:]))) < 1e-12
        # fused route agrees with the dense merge
        from sttode_tpu.kernels.mhgsa import fused_geodesic_attention
        out_d, _ = geodesic_attention(q, k, v, mask=bias, kv_valid=kvv,
                                      fused=False)
        out_f, _ = geodesic_attention(q, k, v, mask=bias, kv_valid=kvv,
                                      fused=True)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d),
                                   atol=2e-5)

    def test_forced_packed_poincare_raises(self, rng):
        """fused='packed' with metric='poincare' used to silently compute
        OBLIQUE attention (the packed kernel has no poincaré path)."""
        from sttode_tpu.nn.attention import geodesic_attention

        q = jnp.asarray(rng.standard_normal((1, 2, 4, 8)), jnp.float32)
        with pytest.raises(ValueError, match="oblique"):
            geodesic_attention(q, q, q, fused="packed", metric="poincare")

    def test_forced_kernel_route_dropout_raises(self, rng):
        """Forced Pallas routes have no attention dropout; silently skipping
        it diverges training from the dense route — raise like ring/ulysses
        do."""
        from sttode_tpu.nn.attention import geodesic_attention

        q = jnp.asarray(rng.standard_normal((1, 4, 8)), jnp.float32)
        for route in (True, "flash", "packed"):
            with pytest.raises(ValueError, match="dropout"):
                geodesic_attention(q, q, q, fused=route, dropout_rate=0.1,
                                   deterministic=False,
                                   dropout_key=jax.random.PRNGKey(0))

    def test_select_decode_k_block_validated(self, rng):
        """K % k_block mismatches raise (an assert would vanish under
        python -O and silently truncate the K grid axis)."""
        from sttode_tpu.kernels import select_decode as sd

        with pytest.raises(ValueError, match="k_block"):
            sd.select_decode({}, jnp.zeros((4, 8)), jnp.zeros((20, 4, 4)),
                             jnp.zeros((4, 96)), jnp.zeros((4, 10)),
                             jnp.zeros((4, 20)), k_block=3)
        with pytest.raises(ValueError, match="mode"):
            sd.select_decode({}, jnp.zeros((4, 8)), jnp.zeros((20, 4, 4)),
                             jnp.zeros((4, 96)), jnp.zeros((4, 10)),
                             jnp.zeros((4, 20)), mode="nope")

    def test_select_decode_default_tile_bounds_padding(self):
        """The default scene tile spreads M over the minimal tile count and
        shrinks to cover it: padding stays under one 8-row group per tile
        instead of up to ~2x the scene axis."""
        from sttode_tpu.kernels.select_decode import (_default_m_tile,
                                                      _round_up)

        for M in (520, 600, 28160, 112640, 300, 1025):
            for dt in (jnp.bfloat16, jnp.float32):
                cap = 512 if dt == jnp.bfloat16 else 256
                t = _default_m_tile(M, dt)
                assert 128 <= t <= cap
                n_tiles = -(-M // t)
                waste = _round_up(M, t) - M
                assert waste < 8 * n_tiles, (M, dt, t, waste)
        # production row counts keep their measured tile exactly
        assert _default_m_tile(28160, jnp.bfloat16) == 512
        assert _default_m_tile(112640, jnp.bfloat16) == 512


class TestModelTrainParallelReviewFixes:
    """Regression tests for the round-4 models/train/parallel review."""

    def test_loss_kl_padded_matches_unpadded(self, rng):
        """loss_kl on 5-valid-of-8 padded rows must equal the same 5 rows
        unpadded — the old padded denominator (B·N_pad) deflated the term
        and crossed the min_clip floor early (zero KL gradient)."""
        from sttode_tpu.models.sttode import loss_kl
        from sttode_tpu.utils.distributions import DiagNormal

        mu = jnp.asarray(rng.standard_normal((8, 4)), jnp.float32)
        lv = jnp.asarray(rng.standard_normal((8, 4)), jnp.float32) * 0.1
        qz = DiagNormal(mu, lv)
        pz = DiagNormal(jnp.zeros_like(mu), jnp.zeros_like(lv))
        valid = jnp.asarray([1, 1, 1, 1, 1, 0, 0, 0], jnp.float32)

        padded = loss_kl(qz, pz, 1, 8, min_clip=0.0, valid=valid)
        unpadded = loss_kl(DiagNormal(mu[:5], lv[:5]),
                           DiagNormal(mu[:5] * 0, lv[:5] * 0),
                           1, 5, min_clip=0.0)
        np.testing.assert_allclose(float(padded), float(unpadded), rtol=1e-6)

    def test_sampler_losses_padded_match_unpadded(self, rng):
        """Stage-2 KLD + diversity must normalize by the REAL agent count,
        not the padded one."""
        from sttode_tpu.models.sampler import sampler_diversity, sampler_kld
        from sttode_tpu.utils.distributions import DiagNormal

        M, K, T = 6, 4, 5
        valid = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)
        mu = jnp.asarray(rng.standard_normal((M * K, 3)), jnp.float32)
        lv = jnp.asarray(rng.standard_normal((M * K, 3)), jnp.float32) * 0.1
        sd = DiagNormal(mu, lv)
        vd = DiagNormal(jnp.zeros_like(mu), jnp.zeros_like(lv))

        _, kld_pad = sampler_kld(sd, vd, M, 0.0, 1.0, valid)
        keep = jnp.repeat(valid, K).astype(bool)
        sd4 = DiagNormal(mu[keep], lv[keep])
        vd4 = DiagNormal(mu[keep] * 0, lv[keep] * 0)
        _, kld_ref = sampler_kld(sd4, vd4, 4, 0.0, 1.0)
        np.testing.assert_allclose(float(kld_pad), float(kld_ref), rtol=1e-6)

        dec = jnp.asarray(rng.standard_normal((M, K, T, 2)), jnp.float32)
        _, div_pad = sampler_diversity(dec, M, 1.0, 1.0, valid)
        _, div_ref = sampler_diversity(dec[:4], 4, 1.0, 1.0)
        np.testing.assert_allclose(float(div_pad), float(div_ref), rtol=1e-6)

    def test_riemannian_prefix_mask(self, rng):
        """The documented 'pytree (or prefix)' mask form must work: a prefix
        mask pairs mask leaves with whole param subtrees."""
        import optax
        from sttode_tpu.train.riemannian import (project_to_manifold,
                                                 riemannian_sgd)

        params = {"enc": {"w": jnp.asarray(rng.standard_normal((4, 3)),
                                           jnp.float32),
                          "b": jnp.asarray(rng.standard_normal((4, 3)),
                                           jnp.float32)},
                  "head": {"w": jnp.asarray(rng.standard_normal((2, 3)),
                                            jnp.float32)}}
        mask = {"enc": True, "head": False}          # PREFIX of params
        params = project_to_manifold(params, mask)
        norms = jnp.linalg.norm(params["enc"]["w"], axis=-1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-6)

        opt = riemannian_sgd(1e-2, manifold_mask=mask)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = opt.update(grads, opt.init(params), params)
        new = optax.apply_updates(params, updates)
        # manifold leaves stay on the sphere; euclidean leaf moved additively
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(new["enc"]["w"], axis=-1)), 1.0,
            atol=1e-5)
        np.testing.assert_allclose(np.asarray(new["head"]["w"]),
                                   np.asarray(params["head"]["w"] - 1e-2),
                                   atol=1e-7)

    def test_make_mesh_rejects_oversized_tp(self):
        """tp·sp > device count must raise immediately, not build a
        zero-device mesh that crashes later inside jit."""
        from sttode_tpu.parallel.mesh import make_mesh

        n = len(jax.devices())
        with pytest.raises(ValueError, match="exceeds"):
            make_mesh(tp=2 * n)

    def test_remat_covers_future_encoder(self, rng):
        """cfg.remat must checkpoint BOTH encoder trunks; forward/backward
        numerics are unchanged by remat."""
        from tests.test_model import make_batch, tiny_cfg

        cfg = tiny_cfg().validate()
        cfg_r = tiny_cfg(remat=True).validate()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        batch = make_batch(rng)
        key = jax.random.PRNGKey(1)

        def loss(c):
            return lambda p: sttode_forward(p, c, batch, key).total_loss

        l0, g0 = jax.value_and_grad(loss(cfg))(params)
        l1, g1 = jax.value_and_grad(loss(cfg_r))(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestNnOdeDataReviewFixes:
    """Regression tests for the round-4 nn/ode/data review findings."""

    def test_bias_kv_with_kv_valid(self, rng):
        """bias_kv/add_zero_attn + kv_valid crashed (the appended position
        extended k/v and the mask but not the validity); the appended
        position is a real attendable key and must be marked valid."""
        from sttode_tpu.nn.attention import mhgsa, mhgsa_init

        B, S, D, H = 2, 6, 8, 4
        params = mhgsa_init(jax.random.PRNGKey(0), D)
        x = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
        bias_k = jnp.asarray(rng.standard_normal((D,)), jnp.float32)
        bias_v = jnp.asarray(rng.standard_normal((D,)), jnp.float32)
        kvv = jnp.ones((B, S)).at[:, -2:].set(0.0)
        out, _ = mhgsa(params, x, x, x, H, bias_kv=(bias_k, bias_v),
                       kv_valid=kvv, compat="tpu")
        assert out.shape == (B, S, D)
        assert bool(jnp.all(jnp.isfinite(out)))
        out2, _ = mhgsa(params, x, x, x, H, add_zero_attn=True,
                        kv_valid=kvv, compat="tpu")
        assert bool(jnp.all(jnp.isfinite(out2)))

    def test_poincare_skips_q10_scale(self, rng):
        """Quirk Q10's q-scale is a no-op only under oblique row
        normalization; under poincaré it pulled q toward the ball origin
        while k stayed put, skewing the geometry. With identity projections,
        q_i == k_i, so d(q_i, k_i) = 0 must be each row's max score — the
        old scaled q made token i land exactly on a DIFFERENT token's ball
        point for colinear inputs."""
        from sttode_tpu.nn.attention import MHGSAParams, mhgsa

        D, H = 8, 2
        eye = jnp.eye(D, dtype=jnp.float32)
        params = MHGSAParams(
            in_proj_w=jnp.concatenate([eye, eye, eye], axis=1),
            in_proj_b=jnp.zeros((3 * D,)),
            out_proj_w=eye, out_proj_b=jnp.zeros((D,)))
        u = jnp.asarray(rng.standard_normal((D,)), jnp.float32)
        u = u / jnp.linalg.norm(u)
        # colinear tokens at distinct radii: distances along one geodesic
        # through the origin are monotone in |a−b|, so the diagonal is the
        # strict argmax iff q is NOT rescaled (Dh^-0.5 = 0.5 would map token
        # 2u onto exactly token 1u's ball point)
        x = jnp.stack([0.5 * u, 1.0 * u, 2.0 * u, 3.0 * u])[None]  # [1, 4, D]
        _, w = mhgsa(params, x, x, x, H, compat="tpu", need_weights=True,
                     metric="poincare")
        assert w is not None
        np.testing.assert_array_equal(
            np.asarray(jnp.argmax(w, axis=-1))[0], np.arange(4))

    def test_dopri5_max_steps_exhaustion_warns(self, capfd):
        """The while-form's max_steps cap must warn as loudly as the
        scan-budget form (same silent mid-interval truncation otherwise)."""
        from sttode_tpu.ode.solvers import odeint

        def f(t, y):
            return -50.0 * y

        ys = odeint(f, jnp.ones((2,)), jnp.array([0.0, 1.0]),
                    method="dopri5", max_steps=2)
        jax.block_until_ready(ys)
        out = capfd.readouterr()
        assert "max_steps=2 exhausted" in out.out + out.err

    def test_eth_loader_rejects_duplicate_plus_gap(self, tmp_path):
        """A ped with a duplicated row in one frame and a missing interior
        frame passed the span+count filter and produced a time-misaligned
        trajectory; the filter now requires exactly one row per frame."""
        from sttode_tpu.data.eth_ucy import load_eth_ucy

        rows = []
        for f in range(20):
            rows.append((f, 1, float(f), float(f)))        # clean ped
            if f != 5:
                rows.append((f, 2, float(f), -float(f)))   # gap at frame 5
            if f == 7:
                rows.append((f, 2, 7.5, -7.5))             # dup at frame 7
            rows.append((f, 3, -float(f), float(f)))       # second clean ped
        d = tmp_path / "train"
        d.mkdir()
        with open(d / "scene.csv", "w") as fh:
            for r in rows:
                fh.write(",".join(str(x) for x in r) + "\n")
        scenes = load_eth_ucy(str(d), obs_len=8, pred_len=12, min_ped=0)
        assert scenes, "clean peds must still produce a scene"
        for s in scenes:
            assert 2.0 not in set(np.asarray(s["ped_ids"]).tolist()), \
                "corrupted ped must be filtered"
            assert set(np.asarray(s["ped_ids"]).tolist()) == {1.0, 3.0}

    def test_decoder_layer_honors_attn_impl(self, rng):
        """decoder_layer previously ignored cfg.attn_impl entirely."""
        from sttode_tpu.nn.transformer import (LayerConfig, decoder_layer,
                                               decoder_layer_init)

        cfg = LayerConfig(d_model=16, num_heads=4, ff_dim=32,
                          attn_impl="fused")
        params = decoder_layer_init(jax.random.PRNGKey(0), cfg)
        tgt = jnp.asarray(rng.standard_normal((3, 2, 1, 16)), jnp.float32)
        mem = jnp.asarray(rng.standard_normal((4, 2, 1, 16)), jnp.float32)
        out, sw, cw = decoder_layer(params, tgt, mem, cfg)
        # the forced kernel route is actually taken: kernels return no
        # weight matrices
        assert sw is None and cw is None
        assert bool(jnp.all(jnp.isfinite(out)))
        cfg_ring = LayerConfig(d_model=16, num_heads=4, ff_dim=32,
                               attn_impl="ring")
        with pytest.raises(ValueError, match="decoder"):
            decoder_layer(params, tgt, mem, cfg_ring)

    def test_prepare_scene_training_needs_rng(self, rng):
        """training=True without an rng must raise, not silently skip the
        subsample/augmentation (same contract as scene_batches)."""
        from sttode_tpu.data.preprocess import prepare_scene

        scene = {"obs": rng.standard_normal((5, 8, 2)).astype(np.float32),
                 "pred": rng.standard_normal((5, 12, 2)).astype(np.float32)}
        with pytest.raises(ValueError, match="rng"):
            prepare_scene(scene, training=True)
        # eval path unaffected
        batch, orig = prepare_scene(scene, training=False)
        assert batch.past.shape[0] == 5
