"""Ring attention integrated into the model path (round-1 VERDICT item 4).

``STTODEConfig(attn_impl="ring")`` routes the encoder trunks' geodesic
attention through the sequence-parallel shard_map kernel
(parallel/ring_attention.py) — these tests run the FULL model on the 8-device
CPU mesh and assert loss and gradients match the dense single-pass run.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sttode_tpu.models import Batch, STTODEConfig, sttode_forward, sttode_init
from sttode_tpu.parallel import make_mesh


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
    base = dict(hidden_dim=32, ff_dim=64, num_heads=4, zdim=16, sample_k=4,
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


class TestRingModelIntegration:
    def test_agent_axis_loss_and_grads_match_dense(self, rng):
        """attn_axis='agent' (masked, compat='tpu') — the SP/CP target mode:
        8 agent tokens sharded over the 8-device data axis."""
        mesh = make_mesh(dp=8, tp=1)
        cfg_ring = _cfg(compat="tpu", attn_axis="agent", attn_impl="ring")
        cfg_dense = cfg_ring._replace(attn_impl="dense")
        batch = _batch(rng, B=2, N=8)
        params = sttode_init(jax.random.PRNGKey(0), cfg_dense)

        l_ring, g_ring = _loss_and_grads(cfg_ring, params, batch, mesh=mesh)
        l_dense, g_dense = _loss_and_grads(cfg_dense, params, batch)
        np.testing.assert_allclose(float(l_ring), float(l_dense), rtol=2e-5)
        _assert_trees_close(g_ring, g_dense, atol=2e-5, rtol=2e-3)

    def test_agent_axis_respects_validity_mask(self, rng):
        """Padded agents must not leak into ring attention: zeroing a padded
        agent's features must not change the loss when it's masked out."""
        mesh = make_mesh(dp=8, tp=1)
        cfg = _cfg(compat="tpu", attn_axis="agent", attn_impl="ring")
        B, N = 2, 8
        valid = np.ones((B * N,), np.float32)
        valid[7] = 0.0          # last agent of scene 0 is padding
        valid[15] = 0.0
        b1 = _batch(rng, B, N, valid=valid)
        # perturb the padded agents' inputs
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
        # interaction features of VALID agents must be identical: the padded
        # token is excluded from every softmax it could have leaked through
        pf1 = np.asarray(out1.past_feature).reshape(B, N, -1)
        pf2 = np.asarray(out2.past_feature).reshape(B, N, -1)
        mask = np.asarray(valid).reshape(B, N) > 0
        np.testing.assert_allclose(pf1[mask], pf2[mask], atol=1e-5)

    def test_scene_axis_reference_compat(self, rng):
        """attn_axis='scene' + compat='reference' (quirk Q3/Q4 semantics)
        through the ring kernel: 8 scene tokens over 8 devices."""
        mesh = make_mesh(dp=8, tp=1)
        cfg_ring = _cfg(attn_impl="ring")        # reference compat, scene axis
        cfg_dense = cfg_ring._replace(attn_impl="dense")
        batch = _batch(rng, B=8, N=3)
        params = sttode_init(jax.random.PRNGKey(1), cfg_dense)
        l_ring, g_ring = _loss_and_grads(cfg_ring, params, batch, mesh=mesh)
        l_dense, g_dense = _loss_and_grads(cfg_dense, params, batch)
        np.testing.assert_allclose(float(l_ring), float(l_dense), rtol=2e-5)
        _assert_trees_close(g_ring, g_dense, atol=2e-5, rtol=2e-3)

    def test_ring_under_jitted_train_step(self, rng):
        """One optimizer step with attn_impl='ring' through make_train_step on
        the mesh — the driver-facing path."""
        import optax

        from sttode_tpu.parallel import param_sharding, shard_batch
        from sttode_tpu.train import make_train_step

        mesh = make_mesh(dp=8, tp=1)
        cfg = _cfg(compat="tpu", attn_axis="agent", attn_impl="ring")
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

    def test_ring_requires_mesh(self, rng):
        cfg = _cfg(compat="tpu", attn_axis="agent", attn_impl="ring")
        batch = _batch(rng, B=2, N=8)
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError, match="mesh"):
            sttode_forward(params, cfg, batch, jax.random.PRNGKey(3),
                           train=False)
