"""L4 model tests: shapes, loss structure, gradient flow, frozen-net sampler
semantics, and a jitted overfit-one-batch smoke run (SURVEY.md §4(e))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sttode_tpu.models import (
    Batch, STTODEConfig, SamplerConfig, sampler_forward, sampler_init,
    sampler_loss, sttode_forward, sttode_inference, sttode_init,
)


def tiny_cfg(**kw):
    base = dict(hidden_dim=16, zdim=8, num_heads=4, ff_dim=32,
                past_length=8, future_length=12, sample_k=5)
    base.update(kw)
    return STTODEConfig(**base)


def make_batch(rng, B=2, N=3, Tp=8, Tf=12):
    M = B * N
    past = rng.standard_normal((M, Tp, 2)).astype(np.float32)
    fut = rng.standard_normal((M, Tf, 2)).astype(np.float32)
    past_vel = np.diff(past, axis=1, prepend=past[:, :1])
    fut_vel = np.diff(np.concatenate([past[:, -1:], fut], 1), axis=1)
    return Batch(
        past=jnp.asarray(past), past_vel=jnp.asarray(past_vel),
        future=jnp.asarray(fut), future_vel=jnp.asarray(fut_vel),
        valid=jnp.ones((M,), jnp.float32), batch_size=B, agent_num=N)


class TestForward:
    def test_shapes_and_losses(self, rng):
        cfg = tiny_cfg()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        batch = make_batch(rng)
        out = sttode_forward(params, cfg, batch, jax.random.PRNGKey(1))
        M = batch.batch_size * batch.agent_num
        assert out.pred_traj.shape == (M, 12, 2)
        assert out.diverse_pred.shape == (M, cfg.sample_k, 12, 2)
        for l in (out.total_loss, out.loss_pred, out.loss_recover,
                  out.loss_kl, out.loss_diverse):
            assert np.isfinite(float(l))
        # KL floor: with a near-standard posterior init, Σkl/(B·N) < min_clip
        # so the floored value is exactly min_clip (quirk Q5 semantics)
        assert float(out.loss_kl) >= cfg.min_clip - 1e-6

    def test_vae_only_loss_terms(self, rng):
        """loss_terms=('pred','recover','kl') — the trainvae objective: total
        excludes diverse, the K-decode is skipped (diverse outputs zero),
        gradients flow."""
        cfg = tiny_cfg(loss_terms=("pred", "recover", "kl")).validate()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        batch = make_batch(rng)
        key = jax.random.PRNGKey(1)
        out = sttode_forward(params, cfg, batch, key)
        np.testing.assert_allclose(
            float(out.total_loss),
            float(out.loss_pred + out.loss_recover + out.loss_kl), rtol=1e-6)
        assert float(out.loss_diverse) == 0.0
        assert float(jnp.abs(out.diverse_pred).max()) == 0.0
        g = jax.grad(lambda p: sttode_forward(p, cfg, batch, key).total_loss)(
            params)
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)

    def test_poincare_metric_full_model(self, rng):
        """attn_metric='poincare' (the paper's MHGSA framing, never wired in
        by the reference): full forward runs, differs from the oblique
        metric, responds to curvature, and gradients flow."""
        cfg_obl = tiny_cfg()
        cfg_ball = tiny_cfg(attn_metric="poincare").validate()
        cfg_ball2 = tiny_cfg(attn_metric="poincare", curvature=0.3).validate()
        params = sttode_init(jax.random.PRNGKey(0), cfg_obl)
        batch = make_batch(rng)
        key = jax.random.PRNGKey(1)
        out_obl = sttode_forward(params, cfg_obl, batch, key, train=False)
        out_ball = sttode_forward(params, cfg_ball, batch, key, train=False)
        out_ball2 = sttode_forward(params, cfg_ball2, batch, key, train=False)
        for o in (out_ball, out_ball2):
            assert np.isfinite(float(o.total_loss))
        assert abs(float(out_ball.loss_pred) - float(out_obl.loss_pred)) > 1e-6
        assert abs(float(out_ball.loss_pred) - float(out_ball2.loss_pred)) > 1e-8

        g = jax.grad(lambda p: sttode_forward(
            p, cfg_ball, batch, key, train=False).total_loss)(params)
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
        assert any(float(np.abs(np.asarray(x)).max()) > 0 for x in flat)

    def test_poincare_metric_serves_all_impls(self):
        for impl in ("auto", "dense", "fused", "flash", "ring", "ulysses"):
            tiny_cfg(attn_metric="poincare", attn_impl=impl).validate()

    def test_bfloat16_compute_dtype(self, rng):
        """compute_dtype='bfloat16' (decode-MLP operands cast, fp32
        accumulate): losses stay finite/fp32 and track the fp32 run within
        bf16 resolution; gradients flow."""
        cfg32 = tiny_cfg()
        cfg16 = tiny_cfg(compute_dtype="bfloat16")
        params = sttode_init(jax.random.PRNGKey(0), cfg32)
        batch = make_batch(rng)
        key = jax.random.PRNGKey(1)
        out32 = sttode_forward(params, cfg32, batch, key)
        out16 = sttode_forward(params, cfg16, batch, key)
        assert out16.total_loss.dtype == jnp.float32
        np.testing.assert_allclose(float(out16.total_loss),
                                   float(out32.total_loss), rtol=2e-2)

        g = jax.grad(lambda p: sttode_forward(p, cfg16, batch, key).total_loss)(
            params)
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
        assert any(float(np.abs(np.asarray(x)).max()) > 0 for x in flat)

    def test_agent_axis_mode(self, rng):
        cfg = tiny_cfg(compat="tpu", attn_axis="agent")
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        batch = make_batch(rng)
        out = sttode_forward(params, cfg, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(out.total_loss))

    def test_padded_agents_features_invariant(self, rng):
        """agent-axis mode: zero-padded agents with valid=0 must not perturb
        the real agents' encoder features (mask-correct attention). The
        stochastic losses can't be compared directly (different RNG shapes),
        so the deterministic feature path is the invariant."""
        from sttode_tpu.models import encode_past
        cfg = tiny_cfg(compat="tpu", attn_axis="agent")
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        B, N, Npad = 1, 3, 5
        batch = make_batch(rng, B=B, N=N)

        # Pad in the MIDDLE so the category one-hot (which marks the last
        # slot — the NBA ball) stays on the same real agent in both layouts:
        # [a0, a1, a2] → [a0, a1, 0, 0, a2].
        def pad_mid(x, n_extra):
            zeros = jnp.zeros((n_extra,) + x.shape[1:], x.dtype)
            return jnp.concatenate([x[:N - 1], zeros, x[N - 1:]], 0)

        extra = B * (Npad - N)
        padded = Batch(
            past=pad_mid(batch.past, extra),
            past_vel=pad_mid(batch.past_vel, extra),
            future=pad_mid(batch.future, extra),
            future_vel=pad_mid(batch.future_vel, extra),
            valid=pad_mid(batch.valid, extra), batch_size=B, agent_num=Npad)
        key = jax.random.PRNGKey(1)
        f1 = encode_past(params, cfg, batch, rng=key, train=False)
        f2 = encode_past(params, cfg, padded, rng=key, train=False)
        real_slots = [0, 1, Npad - 1]
        np.testing.assert_allclose(np.asarray(f1),
                                   np.asarray(f2[jnp.asarray(real_slots)]),
                                   atol=2e-5)

    def test_masked_losses_ignore_padded(self, rng):
        """Loss masking: corrupting padded agents' targets/preds must not
        change any masked loss value."""
        from sttode_tpu.models.sttode import loss_pred, loss_diverse
        M, Mp, T, K = 3, 5, 4, 2
        pred = jnp.asarray(rng.standard_normal((Mp, T, 2)), jnp.float32)
        tgt = jnp.asarray(rng.standard_normal((Mp, T, 2)), jnp.float32)
        valid = jnp.asarray([1, 1, 1, 0, 0], jnp.float32)
        base = float(loss_pred(pred, tgt, 1, valid))
        corrupted = tgt.at[M:].add(100.0)
        assert float(loss_pred(pred, corrupted, 1, valid)) == base
        pk = jnp.asarray(rng.standard_normal((Mp, K, T, 2)), jnp.float32)
        d1 = float(loss_diverse(pk, tgt, valid))
        d2 = float(loss_diverse(pk.at[M:].add(50.0), tgt, valid))
        np.testing.assert_allclose(d1, d2, rtol=1e-6)

    def test_dopri5_tolerance_knobs_plumb_through(self, rng):
        """ode_rtol/ode_atol reach the adaptive solver: a loose-tolerance
        forward runs and differs (slightly) from the tight one."""
        cfg_t = tiny_cfg(ode_method="dopri5").validate()
        cfg_l = cfg_t._replace(ode_rtol=1e-2, ode_atol=1e-4).validate()
        params = sttode_init(jax.random.PRNGKey(0), cfg_t)
        batch = make_batch(rng, B=1, N=2)
        key = jax.random.PRNGKey(1)
        out_t = sttode_forward(params, cfg_t, batch, key, train=False)
        out_l = sttode_forward(params, cfg_l, batch, key, train=False)
        assert np.isfinite(float(out_l.total_loss))
        # loose tolerance changes the integration result measurably but not
        # wildly
        d = float(jnp.abs(out_t.pred_traj - out_l.pred_traj).max())
        assert 0 < d < 1.0

    def test_inference_shape(self, rng):
        cfg = tiny_cfg()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        batch = make_batch(rng)
        preds = sttode_inference(params, cfg, batch, jax.random.PRNGKey(2))
        M = batch.batch_size * batch.agent_num
        assert preds.shape == (cfg.sample_k, M, 12, 2)
        # samples differ (stochastic prior)
        assert not np.allclose(np.asarray(preds[0]), np.asarray(preds[1]))


class TestGradients:
    def test_sparse_diverse_grad_matches_dense(self, rng):
        """diverse_grad="sparse" (select winner gradient-free, recompute only
        it differentiably) must produce the same total loss AND the same
        parameter gradients as plain autodiff through all K samples — the min
        flows through the argmin branch only, so the two are identical up to
        fp reassociation."""
        cfg_d = tiny_cfg(diverse_grad="dense").validate()
        cfg_s = cfg_d._replace(diverse_grad="sparse").validate()
        params = sttode_init(jax.random.PRNGKey(0), cfg_d)
        batch = make_batch(rng)
        key = jax.random.PRNGKey(3)

        def loss(p, cfg):
            return sttode_forward(p, cfg, batch, key, train=True).total_loss

        ld, gd = jax.value_and_grad(lambda p: loss(p, cfg_d))(params)
        ls, gs = jax.value_and_grad(lambda p: loss(p, cfg_s))(params)
        np.testing.assert_allclose(float(ld), float(ls), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(gd),
                        jax.tree_util.tree_leaves(gs)):
            a, b = np.asarray(a), np.asarray(b)
            # absolute tolerance scaled per-leaf: near-zero entries of large
            # gradients differ by fp reassociation between the two layouts
            np.testing.assert_allclose(
                a, b, rtol=1e-4, atol=1e-5 * max(np.max(np.abs(a)), 1.0))

    def test_bf16_selection_matches_fp32(self, rng):
        """select_dtype="bfloat16" only changes HOW the argmin winner is
        found (the selection decode runs in bf16); the winner itself is
        recomputed in fp32, so whenever the bf16 and fp32 selections agree —
        which they do on this fixture, where the K samples' errors are
        well-separated — loss and gradients match the fp32 path exactly up
        to fp reassociation."""
        cfg_f = tiny_cfg(diverse_grad="sparse").validate()
        cfg_b = cfg_f._replace(select_dtype="bfloat16").validate()
        params = sttode_init(jax.random.PRNGKey(0), cfg_f)
        batch = make_batch(rng)
        key = jax.random.PRNGKey(3)

        def loss(p, cfg):
            return sttode_forward(p, cfg, batch, key, train=True).total_loss

        lf, gf = jax.value_and_grad(lambda p: loss(p, cfg_f))(params)
        lb, gb = jax.value_and_grad(lambda p: loss(p, cfg_b))(params)
        np.testing.assert_allclose(float(lf), float(lb), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gb)):
            a, b = np.asarray(a), np.asarray(b)
            np.testing.assert_allclose(
                a, b, rtol=1e-4, atol=1e-5 * max(np.max(np.abs(a)), 1.0))

    def test_bf16_selection_requires_sparse(self):
        import pytest
        with pytest.raises(AssertionError, match="sparse"):
            tiny_cfg(diverse_grad="dense",
                     select_dtype="bfloat16").validate()

    def test_grads_flow_everywhere(self, rng):
        cfg = tiny_cfg()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        batch = make_batch(rng, B=1, N=2)

        def loss_fn(p):
            return sttode_forward(p, cfg, batch, jax.random.PRNGKey(1),
                                  train=False).total_loss

        grads = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        nonzero = sum(float(jnp.sum(jnp.abs(g))) > 0 for g in leaves)
        # every major component gets gradient (PE table is a buffer, allowed 0)
        assert nonzero / len(leaves) > 0.8

    def test_overfit_one_batch(self, rng):
        """End-to-end sanity: jitted Adam steps reduce pred loss on one batch."""
        import optax
        cfg = tiny_cfg(min_clip=0.0, sample_k=3)
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        batch = make_batch(rng, B=1, N=2)
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                o = sttode_forward(p, cfg, batch, key, train=False)
                return o.total_loss, o
            (loss, o), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, o

        key = jax.random.PRNGKey(7)
        first = None
        for i in range(30):
            key, sub = jax.random.split(key)
            params, opt_state, o = step(params, opt_state, sub)
            if first is None:
                first = float(o.loss_pred) + float(o.loss_recover)
        last = float(o.loss_pred) + float(o.loss_recover)
        assert last < first * 0.7, (first, last)


class TestSampler:
    def test_forward_shapes(self, rng):
        cfg = tiny_cfg()
        scfg = SamplerConfig(nk=cfg.sample_k, nz=cfg.zdim, qnet_mlp=(32, 16))
        net = sttode_init(jax.random.PRNGKey(0), cfg)
        sp = sampler_init(jax.random.PRNGKey(1), scfg,
                          pred_model_dim=cfg.hidden_dim,
                          past_feature_dim=2 * cfg.hidden_dim)
        batch = make_batch(rng)
        out = sampler_forward(sp, net, scfg, cfg, batch, jax.random.PRNGKey(2))
        M = batch.batch_size * batch.agent_num
        assert out.dec_motion.shape == (M, scfg.nk, 12, 2)
        assert out.sampler_dist.mu.shape == (M * scfg.nk, scfg.nz)
        total, parts = sampler_loss(out, scfg, batch)
        assert np.isfinite(float(total))
        assert set(parts) == {"kld", "diverse"}

    def test_net_params_frozen(self, rng):
        """Gradients w.r.t. net params through sampler_forward must be zero
        (stop_gradient), while sampler grads are nonzero."""
        cfg = tiny_cfg()
        scfg = SamplerConfig(nk=3, nz=cfg.zdim, qnet_mlp=(32, 16),
                             kld_min_clamp=0.0)
        net = sttode_init(jax.random.PRNGKey(0), cfg)
        sp = sampler_init(jax.random.PRNGKey(1), scfg,
                          pred_model_dim=cfg.hidden_dim,
                          past_feature_dim=2 * cfg.hidden_dim)
        batch = make_batch(rng, B=1, N=2)

        def loss_fn(sp, net):
            out = sampler_forward(sp, net, scfg, cfg, batch,
                                  jax.random.PRNGKey(2), mean=False)
            return sampler_loss(out, scfg, batch)[0]

        g_s, g_n = jax.grad(loss_fn, argnums=(0, 1))(sp, net)
        s_norm = sum(float(jnp.sum(jnp.abs(g)))
                     for g in jax.tree_util.tree_leaves(g_s))
        n_norm = sum(float(jnp.sum(jnp.abs(g)))
                     for g in jax.tree_util.tree_leaves(g_n))
        assert s_norm > 0
        assert n_norm == 0.0

    def test_mean_vs_sampled_paths(self, rng):
        cfg = tiny_cfg()
        scfg = SamplerConfig(nk=3, nz=cfg.zdim, qnet_mlp=(32, 16),
                             share_eps=False)
        net = sttode_init(jax.random.PRNGKey(0), cfg)
        sp = sampler_init(jax.random.PRNGKey(1), scfg,
                          pred_model_dim=cfg.hidden_dim,
                          past_feature_dim=2 * cfg.hidden_dim)
        batch = make_batch(rng, B=1, N=2)
        o_mean = sampler_forward(sp, net, scfg, cfg, batch,
                                 jax.random.PRNGKey(2), mean=True)
        o_samp = sampler_forward(sp, net, scfg, cfg, batch,
                                 jax.random.PRNGKey(2), mean=False)
        assert not np.allclose(np.asarray(o_mean.dec_motion),
                               np.asarray(o_samp.dec_motion))


class TestRemat:
    def test_remat_matches_plain(self, rng):
        cfg = tiny_cfg()
        cfg_r = tiny_cfg(remat=True)
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        batch = make_batch(rng, B=1, N=2)

        def loss(p, c):
            return sttode_forward(p, c, batch, jax.random.PRNGKey(1),
                                  train=False).total_loss

        l1, g1 = jax.value_and_grad(loss)(params, cfg)
        l2, g2 = jax.value_and_grad(loss)(params, cfg_r)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestSamplerPoincareMetric:
    def test_stage2_over_poincare_net(self, rng):
        """The DLow sampler drives a frozen net configured with the poincare
        MHGSA metric: forward, loss, and sampler-only gradients stay finite
        (the stage-2 path composes with every attn_metric)."""
        cfg = tiny_cfg(attn_metric="poincare", curvature=0.5)
        scfg = SamplerConfig(nk=cfg.sample_k, nz=cfg.zdim, qnet_mlp=(32, 16))
        net = sttode_init(jax.random.PRNGKey(0), cfg)
        sp = sampler_init(jax.random.PRNGKey(1), scfg,
                          pred_model_dim=cfg.hidden_dim,
                          past_feature_dim=2 * cfg.hidden_dim)
        batch = make_batch(rng)

        def loss(sp):
            out = sampler_forward(sp, net, scfg, cfg, batch,
                                  jax.random.PRNGKey(2))
            return sampler_loss(out, scfg, batch)[0]

        total, g = jax.value_and_grad(loss)(sp)
        assert np.isfinite(float(total))
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
        assert any(float(np.abs(np.asarray(x)).max()) > 0 for x in flat)
