"""Ring sequence-parallel attention vs the dense oracle on the 8-device CPU
mesh (sharded == unsharded numerics, SURVEY.md §4(f))."""

import numpy as np
import jax
import jax.numpy as jnp

from sttode_tpu.parallel import make_mesh
from sttode_tpu.parallel.ring_attention import (
    dense_reference, ring_geodesic_attention,
)


class TestRingAttention:
    def test_matches_dense(self, rng):
        mesh = make_mesh(dp=8, tp=1)
        B, L, S, D = 2, 16, 24, 8    # L, S divisible by 8
        q = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
        out = ring_geodesic_attention(q, k, v, mesh)
        ref = dense_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_with_padding_mask(self, rng):
        mesh = make_mesh(dp=8, tp=1)
        B, L, S, D = 1, 8, 32, 8
        q = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
        valid = jnp.ones((B, S)).at[:, -10:].set(0.0)
        out = ring_geodesic_attention(q, k, v, mesh, kv_valid=valid)
        ref = dense_reference(q, k, v, kv_valid=valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_grads_flow(self, rng):
        mesh = make_mesh(dp=8, tp=1)
        B, L, S, D = 1, 8, 8, 8
        q = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)

        def loss_ring(q):
            return jnp.sum(ring_geodesic_attention(q, k, v, mesh) ** 2)

        def loss_dense(q):
            return jnp.sum(dense_reference(q, k, v) ** 2)

        g_ring = jax.grad(loss_ring)(q)
        g_dense = jax.grad(loss_dense)(q)
        np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_dense),
                                   atol=5e-5)


class TestRingPoincareMetric:
    """The poincare metric through the ring decomposition: per-pair Möbius
    geodesic scores (Gram closed form) stream through the online softmax
    exactly like the oblique -acos scores."""

    def test_matches_dense(self, rng):
        mesh = make_mesh(dp=8, tp=1)
        B, L, S, D = 2, 16, 24, 8
        q = jnp.asarray(rng.standard_normal((B, L, D)) * 0.5, jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, S, D)) * 0.5, jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
        out = ring_geodesic_attention(q, k, v, mesh, metric="poincare",
                                      curvature=0.7)
        ref = dense_reference(q, k, v, metric="poincare", curvature=0.7)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)
        # and it is genuinely a different metric than the oblique default
        obl = dense_reference(q, k, v)
        assert not np.allclose(np.asarray(out), np.asarray(obl), atol=1e-3)

    def test_grads_and_padding(self, rng):
        mesh = make_mesh(dp=8, tp=1)
        B, L, S, D = 1, 8, 16, 8
        q = jnp.asarray(rng.standard_normal((B, L, D)) * 0.5, jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, S, D)) * 0.5, jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
        valid = jnp.ones((B, S)).at[:, -5:].set(0.0)

        def loss_ring(q):
            return jnp.sum(ring_geodesic_attention(
                q, k, v, mesh, kv_valid=valid, metric="poincare") ** 2)

        def loss_dense(q):
            return jnp.sum(dense_reference(
                q, k, v, kv_valid=valid, metric="poincare") ** 2)

        np.testing.assert_allclose(np.asarray(jax.grad(loss_ring)(q)),
                                   np.asarray(jax.grad(loss_dense)(q)),
                                   atol=5e-5)


class TestDpSpComposition:
    """DP×SP on the 3-axis dp×sp×tp mesh (round-2 VERDICT item 3): the batch
    shards over "data" WHILE tokens shard over "seq", and sharded == dense."""

    def test_mesh3_shape(self):
        mesh = make_mesh(dp=2, sp=2, tp=2)
        assert mesh.shape == {"data": 2, "seq": 2, "model": 2}
        mesh2 = make_mesh(dp=4, tp=2)
        assert mesh2.shape == {"data": 4, "model": 2}   # 2-axis unchanged

    def test_ring_dp_sp_matches_dense(self, rng):
        mesh = make_mesh(dp=2, sp=4, tp=1)
        B, L, S, D = 4, 8, 16, 8     # B divides dp=2, tokens divide sp=4
        q = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
        valid = jnp.ones((B, S)).at[:, -5:].set(0.0)
        out = ring_geodesic_attention(q, k, v, mesh, kv_valid=valid)
        ref = dense_reference(q, k, v, kv_valid=valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_ring_dp_sp_grads_match_dense(self, rng):
        mesh = make_mesh(dp=2, sp=2, tp=2)
        B, L, S, D = 2, 8, 8, 8
        q = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)

        g_ring = jax.grad(lambda q: jnp.sum(
            ring_geodesic_attention(q, k, v, mesh) ** 2))(q)
        g_dense = jax.grad(lambda q: jnp.sum(
            dense_reference(q, k, v) ** 2))(q)
        np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_dense),
                                   atol=5e-5)

    def test_ulysses_dp_sp_matches_dense(self, rng):
        from sttode_tpu.parallel.ulysses import ulysses_geodesic_attention
        mesh = make_mesh(dp=2, sp=4, tp=1)
        B, H, L, S, D = 4, 4, 8, 16, 8   # H=4 divides sp=4
        q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
        valid = jnp.ones((B, S)).at[:, -3:].set(0.0)
        out = ulysses_geodesic_attention(q, k, v, mesh, kv_valid=valid)
        BH = B * H
        ref = dense_reference(
            q.reshape(BH, L, D), k.reshape(BH, S, D), v.reshape(BH, S, D),
            kv_valid=jnp.repeat(valid, H, axis=0)).reshape(B, H, L, D)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)
