"""Pallas fused MHGSA kernel vs the pure-jnp reference path (interpret mode on
the CPU mesh — same program, exact semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from sttode_tpu.kernels import (flash_geodesic_attention,
                               fused_geodesic_attention)
from sttode_tpu.nn.attention import geodesic_attention


def ref_attention(q, k, v, mask=None):
    out, _ = geodesic_attention(q, k, v, mask=mask, compat="tpu")
    return out


class TestFusedForward:
    def test_matches_jnp_path(self, rng):
        q = jnp.asarray(rng.standard_normal((3, 2, 16, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 2, 16, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((3, 2, 16, 8)), jnp.float32)
        fused = fused_geodesic_attention(q, k, v, interpret=True)
        ref = ref_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=3e-5)

    def test_rectangular_and_mask(self, rng):
        q = jnp.asarray(rng.standard_normal((2, 5, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((2, 9, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((2, 9, 8)), jnp.float32)
        mask = jnp.zeros((2, 5, 9)).at[:, :, -3:].set(-jnp.inf)
        fused = fused_geodesic_attention(q, k, v, mask=mask, interpret=True)
        ref = ref_attention(q, k, v, mask=mask)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=3e-5)

    def test_unaligned_shapes_pad_correctly(self, rng):
        # L=7, S=13, Dh=5 — nothing aligned to (8, 128)
        q = jnp.asarray(rng.standard_normal((1, 7, 5)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 13, 5)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 13, 5)), jnp.float32)
        fused = fused_geodesic_attention(q, k, v, interpret=True)
        ref = ref_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=3e-5)


class TestFusedBackward:
    def test_grads_match_jnp_path(self, rng):
        q = jnp.asarray(rng.standard_normal((2, 6, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((2, 6, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((2, 6, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((2, 6, 8)), jnp.float32)

        def loss_fused(q, k, v):
            return jnp.sum(fused_geodesic_attention(q, k, v, interpret=True)
                           * w)

        def loss_ref(q, k, v):
            return jnp.sum(ref_attention(q, k, v) * w)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, err_msg=f"d{name}")

    def test_grads_with_mask(self, rng):
        q = jnp.asarray(rng.standard_normal((1, 4, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 7, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 7, 8)), jnp.float32)
        mask = jnp.zeros((1, 4, 7)).at[:, :, -2:].set(-jnp.inf)

        def loss_fused(q, k, v):
            return jnp.sum(fused_geodesic_attention(
                q, k, v, mask=mask, interpret=True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(ref_attention(q, k, v, mask=mask) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    def test_grad_finite_identical_qk(self, rng):
        """q == k puts the diagonal at the clip boundary — the clip gate must
        zero those grads, not NaN them."""
        x = jnp.asarray(rng.standard_normal((1, 5, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 5, 8)), jnp.float32)

        def loss(x):
            return jnp.sum(fused_geodesic_attention(x, x, v, interpret=True))

        g = jax.grad(loss)(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestLargeUnalignedL:
    def test_L_not_multiple_of_tile(self, rng):
        """Regression: L in (256, 512) not a multiple of 256 must not leave
        output rows unwritten (grid floor-division bug)."""
        q = jnp.asarray(rng.standard_normal((1, 300, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 300, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 300, 8)), jnp.float32)
        fused = fused_geodesic_attention(q, k, v, interpret=True)
        ref = ref_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=5e-5)


class TestMaskGradient:
    def test_mask_cotangent_matches_jnp(self, rng):
        """Regression: the fused VJP must produce the softmax-VJP mask
        gradient, not zeros. The public contract clamps masks to <= 0
        (maxless softmax), so the parity check uses a non-positive mask."""
        q = jnp.asarray(rng.standard_normal((1, 6, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 9, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 9, 8)), jnp.float32)
        m0 = -jnp.abs(jnp.asarray(rng.standard_normal((1, 6, 9)) * 0.1,
                                  jnp.float32))

        def loss_fused(m):
            return jnp.sum(fused_geodesic_attention(
                q, k, v, mask=m, interpret=True) ** 2)

        def loss_ref(m):
            return jnp.sum(ref_attention(q, k, v, mask=m) ** 2)

        gf = jax.grad(loss_fused)(m0)
        gr = jax.grad(loss_ref)(m0)
        assert float(jnp.abs(gr).max()) > 1e-3  # the oracle grad is nonzero
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-5)

    def test_positive_mask_handled_exactly(self, rng):
        """Positive mask entries are canonicalized by a softmax-invariant
        per-row shift (MASK CONTRACT), so arbitrary finite biases — positive
        included — match the dense max-subtracted softmax exactly instead of
        being clamped away."""
        q = jnp.asarray(rng.standard_normal((1, 4, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 5, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 5, 8)), jnp.float32)
        # non-uniform positive/zero pattern: actually reweights the softmax
        bias = jnp.where(jnp.arange(5) % 2 == 0, 3.0, 0.0) * \
            jnp.ones((1, 4, 5), jnp.float32)

        out = fused_geodesic_attention(q, k, v, mask=bias, interpret=True)
        ref = ref_attention(q, k, v, mask=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5)
        # a UNIFORM bias (positive or hugely negative) is a softmax no-op
        for shift in (3.0, -100.0):
            out_u = fused_geodesic_attention(
                q, k, v, mask=jnp.full((1, 4, 5), shift), interpret=True)
            ref_u = ref_attention(q, k, v)
            np.testing.assert_allclose(np.asarray(out_u), np.asarray(ref_u),
                                       atol=5e-5)
        # gradients into the mask are finite and match the dense oracle
        g = jax.grad(lambda m: jnp.sum(fused_geodesic_attention(
            q, k, v, mask=m, interpret=True) ** 2))(bias)
        gr = jax.grad(lambda m: jnp.sum(
            ref_attention(q, k, v, mask=m) ** 2))(bias)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=5e-5)


class TestFlash:
    """S-tiled online-softmax kernel vs the jnp oracle (interpret mode)."""

    def test_forward_matches_jnp(self, rng):
        from sttode_tpu.kernels import flash_geodesic_attention
        q = jnp.asarray(rng.standard_normal((2, 2, 10, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((2, 2, 14, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((2, 2, 14, 8)), jnp.float32)
        out = flash_geodesic_attention(q, k, v, interpret=True)
        ref = ref_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5)

    def test_forward_multi_ktile_unaligned(self, rng):
        # S=1100 spans 3 k-tiles of 512 with a ragged tail; L=300 spans 2
        # q-tiles of 256 with padding; Dh=5 pads the lane dim
        from sttode_tpu.kernels import flash_geodesic_attention
        q = jnp.asarray(rng.standard_normal((1, 300, 5)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 1100, 5)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 1100, 5)), jnp.float32)
        out = flash_geodesic_attention(q, k, v, interpret=True)
        ref = ref_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5)

    def test_grads_match_jnp(self, rng):
        from sttode_tpu.kernels import flash_geodesic_attention
        q = jnp.asarray(rng.standard_normal((1, 9, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 600, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 600, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((1, 9, 8)), jnp.float32)

        def loss_flash(q, k, v):
            return jnp.sum(
                flash_geodesic_attention(q, k, v, interpret=True) * w)

        def loss_ref(q, k, v):
            return jnp.sum(ref_attention(q, k, v) * w)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, err_msg=f"d{name}")

    def test_kv_valid_matches_dense_masked_oracle(self, rng):
        """Flash with kv_valid equals the dense additive-masked path,
        including a FULLY masked k-tile (exercises the running-max floor)
        and masked-column gradients (round-2 VERDICT item 6)."""
        B, L, S, Dh = 1, 12, 520, 8          # Sp=1024 → 2 k-tiles
        q = jnp.asarray(rng.standard_normal((B, L, Dh)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, S, Dh)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, S, Dh)), jnp.float32)
        # columns ≥ 100 invalid → the second tile is ENTIRELY invalid
        kv = jnp.ones((B, S)).at[:, 100:].set(0.0)
        neg = jnp.finfo(jnp.float32).min
        mask = jnp.where(kv[:, None, :] > 0, 0.0, neg)
        w = jnp.asarray(rng.standard_normal((B, L, Dh)), jnp.float32)

        def loss_flash(q, k, v):
            return jnp.sum(flash_geodesic_attention(
                q, k, v, kv_valid=kv, interpret=True) * w)

        def loss_ref(q, k, v):
            return jnp.sum(ref_attention(q, k, v, mask=mask) * w)

        np.testing.assert_allclose(
            np.asarray(flash_geodesic_attention(q, k, v, kv_valid=kv,
                                                interpret=True)),
            np.asarray(ref_attention(q, k, v, mask=mask)), atol=3e-5)
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, err_msg=f"d{name}")

    def test_kv_valid_via_public_route(self, rng):
        """geodesic_attention(fused='flash', kv_valid=...) reaches the
        kernel (no ValueError) and matches the dense path."""
        q = jnp.asarray(rng.standard_normal((2, 4, 10, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((2, 4, 40, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((2, 4, 40, 8)), jnp.float32)
        kv = jnp.ones((2, 40)).at[:, -7:].set(0.0)
        out, _ = geodesic_attention(q, k, v, kv_valid=kv, compat="tpu",
                                    fused="flash")
        neg = jnp.finfo(jnp.float32).min
        mask = jnp.where(kv[:, None, None, :] > 0, 0.0, neg)
        ref, _ = geodesic_attention(q, k, v, mask=mask, compat="tpu",
                                    fused=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5)

    def test_routing_beyond_vmem_cap(self, rng):
        """fused='auto' with S > 2048 and no mask selects the flash path."""
        from sttode_tpu.nn.attention import _kernel_route
        q = jnp.zeros((1, 256, 8))
        k = jnp.zeros((1, 4096, 8))
        assert _kernel_route(q, k, None, None, False, False, "auto",
                             "oblique") in \
            (None, "flash")  # None off-TPU; flash on TPU
        if jax.default_backend() == "tpu":
            assert _kernel_route(q, k, None, None, False, False, "auto",
                                 "oblique") == "flash"
        mask = jnp.zeros((1, 256, 4096))
        assert _kernel_route(q, k, mask, None, False, False, "auto",
                             "oblique") != "flash"


class TestPoincareFusedKernel:
    """metric='poincare' through the fused kernel: Gram-closed-form scores
    (pmath.dist_matrix_gram) + artanh epilogue, hand-derived VJP — validated
    against the jnp closed-form oracle (the semantic the model's dense path
    uses)."""

    C = 0.7

    @staticmethod
    def _ball(rng, shape, scale=0.5):
        from sttode_tpu.manifolds import pmath
        x = jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)
        return pmath.project(pmath.expmap0(x, c=TestPoincareFusedKernel.C),
                             c=TestPoincareFusedKernel.C)

    @staticmethod
    def _oracle(qb, kb, v, mask=None):
        from sttode_tpu.manifolds import pmath
        s = -pmath.dist_matrix_gram(qb, kb, c=TestPoincareFusedKernel.C)
        if mask is not None:
            s = s + mask
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bls,bsd->bld", p, v,
                          precision=jax.lax.Precision.HIGHEST)

    def test_forward_matches_oracle(self, rng):
        qb = self._ball(rng, (2, 10, 8))
        kb = self._ball(rng, (2, 13, 8))
        v = jnp.asarray(rng.standard_normal((2, 13, 8)), jnp.float32)
        out = fused_geodesic_attention(qb, kb, v, metric="poincare",
                                       curvature=self.C)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(self._oracle(qb, kb, v)),
                                   atol=1e-5)

    def test_grads_match_oracle(self, rng):
        qb = self._ball(rng, (2, 9, 8))
        kb = self._ball(rng, (2, 11, 8))
        v = jnp.asarray(rng.standard_normal((2, 11, 8)), jnp.float32)

        def loss_fused(qb, kb, v):
            return jnp.sum(jnp.sin(fused_geodesic_attention(
                qb, kb, v, metric="poincare", curvature=self.C)))

        def loss_ref(qb, kb, v):
            return jnp.sum(jnp.sin(self._oracle(qb, kb, v)))

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(qb, kb, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(qb, kb, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, err_msg=f"d{name}")

    def test_masked_grads_match_oracle(self, rng):
        B, L, S = 1, 8, 12
        qb = self._ball(rng, (B, L, 8))
        kb = self._ball(rng, (B, S, 8))
        v = jnp.asarray(rng.standard_normal((B, S, 8)), jnp.float32)
        mask = jnp.where(jnp.arange(S)[None, None, :] < 9, 0.0, -1e30)
        mask = jnp.broadcast_to(mask, (B, L, S))

        def loss_fused(qb):
            return jnp.sum(fused_geodesic_attention(
                qb, kb, v, mask=mask, metric="poincare",
                curvature=self.C) ** 2)

        def loss_ref(qb):
            return jnp.sum(self._oracle(qb, kb, v, mask=mask) ** 2)

        np.testing.assert_allclose(np.asarray(jax.grad(loss_fused)(qb)),
                                   np.asarray(jax.grad(loss_ref)(qb)),
                                   atol=5e-5)

    def test_grad_finite_identical_qk(self, rng):
        """Self-attention with q==k hits the n→0 diagonal; the 1e-15 norm
        guard must keep gradients finite (same guard as the jnp path)."""
        x = self._ball(rng, (1, 8, 8))
        v = jnp.asarray(rng.standard_normal((1, 8, 8)), jnp.float32)

        def loss(x):
            return jnp.sum(fused_geodesic_attention(
                x, x, v, metric="poincare", curvature=self.C) ** 2)

        g = jax.grad(loss)(x)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_model_route_fused_poincare(self, rng):
        """geodesic_attention(fused=True, metric='poincare') == the dense jnp
        path (which maps to the ball internally), both compat orientations."""
        from sttode_tpu.nn.attention import geodesic_attention
        q = jnp.asarray(rng.standard_normal((2, 8, 8)) * 0.5, jnp.float32)
        k = jnp.asarray(rng.standard_normal((2, 8, 8)) * 0.5, jnp.float32)
        v = jnp.asarray(rng.standard_normal((2, 8, 8)), jnp.float32)
        for compat in ("tpu", "reference"):
            out_f, _ = geodesic_attention(q, k, v, compat=compat, fused=True,
                                          metric="poincare", curvature=self.C)
            out_d, _ = geodesic_attention(q, k, v, compat=compat, fused=False,
                                          metric="poincare", curvature=self.C)
            np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d),
                                       atol=1e-5, err_msg=compat)


class TestPoincareFlashKernel:
    """metric='poincare' through the S-tiled flash kernel: online softmax
    with the Gram-closed-form scores; dq/dkv sweeps carry the extra x2/y2
    scalar accumulators."""

    C = 0.7

    def test_forward_multi_ktile_matches_oracle(self, rng):
        # S spans 2 k-tiles at the 512 tile size, unaligned on purpose
        qb = TestPoincareFusedKernel._ball(rng, (2, 80, 8), scale=0.3)
        kb = TestPoincareFusedKernel._ball(rng, (2, 700, 8), scale=0.3)
        v = jnp.asarray(rng.standard_normal((2, 700, 8)), jnp.float32)
        out = flash_geodesic_attention(qb, kb, v, metric="poincare",
                                       curvature=self.C)
        ref = TestPoincareFusedKernel._oracle(qb, kb, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_grads_match_oracle(self, rng):
        qb = TestPoincareFusedKernel._ball(rng, (1, 64, 8), scale=0.3)
        kb = TestPoincareFusedKernel._ball(rng, (1, 600, 8), scale=0.3)
        v = jnp.asarray(rng.standard_normal((1, 600, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((1, 64, 8)), jnp.float32)

        def loss_flash(qb, kb, v):
            return jnp.sum(flash_geodesic_attention(
                qb, kb, v, metric="poincare", curvature=self.C) * w)

        def loss_ref(qb, kb, v):
            return jnp.sum(TestPoincareFusedKernel._oracle(qb, kb, v) * w)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(qb, kb, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(qb, kb, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, err_msg=f"d{name}")

    def test_fused_multi_qtile_grads(self, rng):
        """L > 256 spans multiple q-tiles: the poincare dk/dv accumulation
        across the sequential grid (and the per-tile-complete dk property)
        must match the oracle."""
        C = TestPoincareFusedKernel.C
        qb = TestPoincareFusedKernel._ball(rng, (1, 300, 8), scale=0.3)
        kb = TestPoincareFusedKernel._ball(rng, (1, 20, 8), scale=0.3)
        v = jnp.asarray(rng.standard_normal((1, 20, 8)), jnp.float32)

        def loss_fused(qb, kb, v):
            return jnp.sum(jnp.sin(fused_geodesic_attention(
                qb, kb, v, metric="poincare", curvature=C)))

        def loss_ref(qb, kb, v):
            return jnp.sum(jnp.sin(TestPoincareFusedKernel._oracle(qb, kb, v)))

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(qb, kb, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(qb, kb, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, err_msg=f"d{name}")

    def test_flash_multi_qtile_and_ktile_grads(self, rng):
        """Both sweep axes multi-tile (L=600 -> 3 q-tiles, S=600 -> 2
        k-tiles): exercises the poincare dq k-sweep AND the dkv q-sweep
        accumulators across tiles."""
        C = TestPoincareFusedKernel.C
        qb = TestPoincareFusedKernel._ball(rng, (1, 600, 8), scale=0.3)
        kb = TestPoincareFusedKernel._ball(rng, (1, 600, 8), scale=0.3)
        v = jnp.asarray(rng.standard_normal((1, 600, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((1, 600, 8)), jnp.float32)

        def loss_flash(qb, kb, v):
            return jnp.sum(flash_geodesic_attention(
                qb, kb, v, metric="poincare", curvature=C) * w)

        def loss_ref(qb, kb, v):
            return jnp.sum(TestPoincareFusedKernel._oracle(qb, kb, v) * w)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(qb, kb, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(qb, kb, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, err_msg=f"d{name}")


class TestMaxlessSoftmaxContract:
    """The kernels' maxless softmax is valid only within its documented
    bounds (ADVICE r3 + round-4 review): masks are canonicalized by a
    softmax-invariant row shift (so any uniform bias is a no-op), and the
    poincaré score lower bound -12.21/√c must stay above the 1e-30
    denominator floor. Curvature violations are rejected loudly."""

    def test_positive_mask_clamped_to_zero(self, rng):
        q = jnp.asarray(rng.standard_normal((2, 8, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((2, 8, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((2, 8, 8)), jnp.float32)
        # a huge positive UNIFORM bias is a softmax no-op; canonicalization
        # row-shifts it away, so this equals the zero-mask program (and exp
        # can never overflow in the maxless kernel)
        hot = jnp.full((2, 8, 8), 500.0)
        out_hot = fused_geodesic_attention(q, k, v, mask=hot, interpret=True)
        out_zero = fused_geodesic_attention(q, k, v, interpret=True)
        assert bool(jnp.all(jnp.isfinite(out_hot)))
        np.testing.assert_allclose(np.asarray(out_hot), np.asarray(out_zero),
                                   atol=1e-6)

    def test_tiny_curvature_rejected(self, rng):
        import pytest
        q = jnp.asarray(rng.standard_normal((1, 8, 8)), jnp.float32)
        with pytest.raises(ValueError, match="curvature"):
            fused_geodesic_attention(q, q, q, metric="poincare",
                                     curvature=0.005, interpret=True)
        with pytest.raises(ValueError, match="curvature"):
            flash_geodesic_attention(q, q, q, metric="poincare",
                                     curvature=0.005, interpret=True)

    def test_auto_route_dense_at_tiny_curvature(self, monkeypatch):
        """_kernel_route must not pick a maxless Pallas kernel when the
        poincaré bound can underflow — dense keeps max-subtraction."""
        from sttode_tpu.nn.attention import _kernel_route
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        q = jnp.zeros((1, 512, 64))
        k = jnp.zeros((1, 512, 64))
        assert _kernel_route(q, k, None, None, False, False, "auto",
                             "poincare", curvature=1.0) == "fused"
        assert _kernel_route(q, k, None, None, False, False, "auto",
                             "poincare", curvature=0.005) is None
