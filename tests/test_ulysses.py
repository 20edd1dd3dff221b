"""Ulysses (all-to-all) sequence-parallel attention — unit + model integration.

The second SP decomposition SURVEY.md §2.6 names for MHGSA: heads scatter
against tokens with one all_to_all on each side of a locally-dense attention
core (parallel/ulysses.py). These tests run on the 8-device CPU mesh and
assert the kernel and the FULL model match the dense single-pass run.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sttode_tpu.models import Batch, STTODEConfig, sttode_forward, sttode_init
from sttode_tpu.parallel import make_mesh
from sttode_tpu.parallel.ring_attention import dense_reference
from sttode_tpu.parallel.ulysses import ulysses_geodesic_attention


def _qkv(rng, B, H, L, D):
    q = rng.standard_normal((B, H, L, D)).astype(np.float32)
    k = rng.standard_normal((B, H, L, D)).astype(np.float32)
    v = rng.standard_normal((B, H, L, D)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def _dense_heads(q, k, v, kv_valid=None):
    """Oracle: dense softmax(-acos)·V applied per (batch, head)."""
    B, H, L, D = q.shape
    S = k.shape[2]
    val = None
    if kv_valid is not None:
        val = jnp.repeat(kv_valid, H, axis=0)
    out = dense_reference(q.reshape(B * H, L, D), k.reshape(B * H, S, D),
                          v.reshape(B * H, S, D), val)
    return out.reshape(B, H, L, D)


class TestUlyssesKernel:
    def test_matches_dense_oracle(self, rng):
        mesh = make_mesh(dp=8, tp=1)
        q, k, v = _qkv(rng, B=3, H=8, L=16, D=12)
        out = ulysses_geodesic_attention(q, k, v, mesh)
        ref = _dense_heads(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_kv_valid_matches_dense_oracle(self, rng):
        mesh = make_mesh(dp=8, tp=1)
        B, H, L, D = 2, 8, 16, 8
        q, k, v = _qkv(rng, B, H, L, D)
        valid = np.ones((B, L), np.float32)
        valid[0, 13:] = 0.0
        valid[1, 5] = 0.0
        valid = jnp.asarray(valid)
        out = ulysses_geodesic_attention(q, k, v, mesh, kv_valid=valid)
        ref = _dense_heads(q, k, v, kv_valid=valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_grads_match_dense_oracle(self, rng):
        mesh = make_mesh(dp=8, tp=1)
        q, k, v = _qkv(rng, B=2, H=8, L=8, D=8)

        def loss_ulysses(q, k, v):
            return jnp.sum(jnp.sin(
                ulysses_geodesic_attention(q, k, v, mesh)))

        def loss_dense(q, k, v):
            return jnp.sum(jnp.sin(_dense_heads(q, k, v)))

        gu = jax.grad(loss_ulysses, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gu, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=2e-3)

    def test_head_divisibility_enforced(self, rng):
        mesh = make_mesh(dp=8, tp=1)
        q, k, v = _qkv(rng, B=2, H=4, L=16, D=8)   # 4 heads over 8 devices
        with pytest.raises(AssertionError, match="heads"):
            ulysses_geodesic_attention(q, k, v, mesh)


def _batch(rng, B, N, T_p=4, T_f=6, valid=None):
    M = B * N
    past = rng.standard_normal((M, T_p, 2)).astype(np.float32)
    fut = rng.standard_normal((M, T_f, 2)).astype(np.float32)
    past_vel = np.diff(past, axis=1, prepend=past[:, :1])
    fut_vel = np.diff(np.concatenate([past[:, -1:], fut], 1), axis=1)
    if valid is None:
        valid = np.ones((M,), np.float32)
    return Batch(past=jnp.asarray(past), past_vel=jnp.asarray(past_vel),
                 future=jnp.asarray(fut), future_vel=jnp.asarray(fut_vel),
                 valid=jnp.asarray(valid), batch_size=B, agent_num=N)


def _cfg(**kw):
    # num_heads=8 so the head axis divides over the 8-device mesh
    base = dict(hidden_dim=32, ff_dim=64, num_heads=8, zdim=16, sample_k=4,
                past_length=4, future_length=6)
    base.update(kw)
    return STTODEConfig(**base).validate()


def _loss_and_grads(cfg, params, batch, mesh=None):
    def loss(p):
        return sttode_forward(p, cfg, batch, jax.random.PRNGKey(3),
                              train=False, mesh=mesh).total_loss

    # jit the whole fwd+bwd into ONE program: eager per-op backward
    # dispatch over the 8-device host platform proved fragile at
    # full-suite scale (a C++-level abort in an eager concatenate
    # transpose once hundreds of programs have accumulated)
    return jax.jit(jax.value_and_grad(loss))(params)


def _assert_trees_close(g1, g2, atol, rtol):
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=atol, rtol=rtol)


class TestUlyssesModelIntegration:
    def test_agent_axis_loss_and_grads_match_dense(self, rng):
        mesh = make_mesh(dp=8, tp=1)
        cfg_u = _cfg(compat="tpu", attn_axis="agent", attn_impl="ulysses")
        cfg_dense = cfg_u._replace(attn_impl="dense")
        batch = _batch(rng, B=2, N=8)
        params = sttode_init(jax.random.PRNGKey(0), cfg_dense)

        l_u, g_u = _loss_and_grads(cfg_u, params, batch, mesh=mesh)
        l_dense, g_dense = _loss_and_grads(cfg_dense, params, batch)
        np.testing.assert_allclose(float(l_u), float(l_dense), rtol=2e-5)
        _assert_trees_close(g_u, g_dense, atol=2e-5, rtol=2e-3)

    def test_agent_axis_respects_validity_mask(self, rng):
        mesh = make_mesh(dp=8, tp=1)
        cfg = _cfg(compat="tpu", attn_axis="agent", attn_impl="ulysses")
        B, N = 2, 8
        valid = np.ones((B * N,), np.float32)
        valid[7] = 0.0
        valid[15] = 0.0
        b1 = _batch(rng, B, N, valid=valid)
        past2 = np.asarray(b1.past).copy()
        past2[7] += 100.0
        past2[15] -= 50.0
        b2 = Batch(past=jnp.asarray(past2), past_vel=b1.past_vel,
                   future=b1.future, future_vel=b1.future_vel,
                   valid=b1.valid, batch_size=B, agent_num=N)
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        key = jax.random.PRNGKey(3)
        out1 = sttode_forward(params, cfg, b1, key, train=False, mesh=mesh)
        out2 = sttode_forward(params, cfg, b2, key, train=False, mesh=mesh)
        pf1 = np.asarray(out1.past_feature).reshape(B, N, -1)
        pf2 = np.asarray(out2.past_feature).reshape(B, N, -1)
        mask = np.asarray(valid).reshape(B, N) > 0
        np.testing.assert_allclose(pf1[mask], pf2[mask], atol=1e-5)

    def test_scene_axis_reference_compat(self, rng):
        """Quirk Q3/Q4 semantics through the all-to-all path: 8 scene tokens
        over 8 devices."""
        mesh = make_mesh(dp=8, tp=1)
        cfg_u = _cfg(attn_impl="ulysses")      # reference compat, scene axis
        cfg_dense = cfg_u._replace(attn_impl="dense")
        batch = _batch(rng, B=8, N=3)
        params = sttode_init(jax.random.PRNGKey(1), cfg_dense)
        l_u, g_u = _loss_and_grads(cfg_u, params, batch, mesh=mesh)
        l_dense, g_dense = _loss_and_grads(cfg_dense, params, batch)
        np.testing.assert_allclose(float(l_u), float(l_dense), rtol=2e-5)
        _assert_trees_close(g_u, g_dense, atol=2e-5, rtol=2e-3)

    def test_ulysses_under_jitted_train_step(self, rng):
        import optax

        from sttode_tpu.parallel import param_sharding, shard_batch
        from sttode_tpu.train import make_train_step

        mesh = make_mesh(dp=8, tp=1)
        cfg = _cfg(compat="tpu", attn_axis="agent", attn_impl="ulysses")
        batch = _batch(rng, B=2, N=8)
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        step = make_train_step(cfg, opt, mesh=mesh, params_like=params,
                               donate=False)
        params = jax.device_put(params, param_sharding(params, mesh))
        batch = shard_batch(batch, mesh)
        _, _, metrics = step(params, opt_state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["total"]))

    def test_ulysses_requires_mesh(self, rng):
        cfg = _cfg(compat="tpu", attn_axis="agent", attn_impl="ulysses")
        batch = _batch(rng, B=2, N=8)
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError, match="mesh"):
            sttode_forward(params, cfg, batch, jax.random.PRNGKey(3),
                           train=False)


class TestUlyssesPoincareMetric:
    def test_matches_dense(self, rng):
        """Poincare Möbius-distance scores through the head<->token
        all-to-all decomposition match the dense oracle."""
        mesh = make_mesh(dp=8, tp=1)
        B, H, L, D = 2, 8, 16, 8
        q = jnp.asarray(rng.standard_normal((B, H, L, D)) * 0.5, jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, H, L, D)) * 0.5, jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
        out = ulysses_geodesic_attention(q, k, v, mesh, metric="poincare",
                                         curvature=0.7)
        ref = dense_reference(q.reshape(B * H, L, D), k.reshape(B * H, L, D),
                              v.reshape(B * H, L, D), metric="poincare",
                              curvature=0.7).reshape(B, H, L, D)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_full_model_poincare_ulysses_matches_dense(self, rng):
        """attn_metric='poincare' + attn_impl='ulysses': full-model loss on
        the mesh equals the dense single-device run."""
        mesh = make_mesh(dp=8, tp=1)
        cfg_u = _cfg(compat="tpu", attn_axis="agent", attn_impl="ulysses",
                     attn_metric="poincare", curvature=0.5)
        cfg_dense = cfg_u._replace(attn_impl="dense")
        batch = _batch(rng, B=2, N=8)
        params = sttode_init(jax.random.PRNGKey(0), cfg_dense)
        l_u, _ = _loss_and_grads(cfg_u, params, batch, mesh=mesh)
        l_d, _ = _loss_and_grads(cfg_dense, params, batch)
        np.testing.assert_allclose(float(l_u), float(l_d), rtol=2e-5)


class TestUlyssesEdgeCases:
    def test_kv_valid_with_singleton_head_axis(self, rng):
        """kv_valid shaped [B, 1, S] (a broadcast head axis, valid for the
        dense route) must work through the ulysses glue too."""
        mesh = make_mesh(dp=8, tp=1)
        B, H, L, D = 2, 8, 16, 8
        q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
        valid = np.ones((B, L), np.float32)
        valid[0, 12:] = 0.0
        from sttode_tpu.nn.attention import geodesic_attention
        out1, _ = geodesic_attention(q, q, v, compat="tpu", fused="ulysses",
                                     mesh=mesh, kv_valid=jnp.asarray(valid))
        out2, _ = geodesic_attention(q, q, v, compat="tpu", fused="ulysses",
                                     mesh=mesh,
                                     kv_valid=jnp.asarray(valid)[:, None, :])
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   atol=1e-6)

    def test_active_dropout_raises_loudly(self, rng):
        """SP paths have no attention dropout: active dropout must raise,
        not silently change training behavior vs the dense route."""
        mesh = make_mesh(dp=8, tp=1)
        q = jnp.asarray(rng.standard_normal((2, 8, 16, 8)), jnp.float32)
        from sttode_tpu.nn.attention import geodesic_attention
        for impl in ("ring", "ulysses"):
            with pytest.raises(ValueError, match="dropout"):
                geodesic_attention(q, q, q, compat="tpu", fused=impl,
                                   mesh=mesh, dropout_rate=0.1,
                                   dropout_key=jax.random.PRNGKey(0),
                                   deterministic=False)
