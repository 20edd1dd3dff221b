"""Pallas fused MHGSA kernel vs the pure-jnp reference path (interpret mode on
the CPU mesh — same program, exact semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from sttode_tpu.kernels import fused_geodesic_attention
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
        gradient, not zeros."""
        q = jnp.asarray(rng.standard_normal((1, 6, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 9, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 9, 8)), jnp.float32)
        m0 = jnp.asarray(rng.standard_normal((1, 6, 9)) * 0.1, jnp.float32)

        def loss_fused(m):
            return jnp.sum(fused_geodesic_attention(
                q, k, v, mask=m, interpret=True) ** 2)

        def loss_ref(m):
            return jnp.sum(ref_attention(q, k, v, mask=m) ** 2)

        gf = jax.grad(loss_fused)(m0)
        gr = jax.grad(loss_ref)(m0)
        assert float(jnp.abs(gr).max()) > 1e-3  # the oracle grad is nonzero
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-5)


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

    def test_routing_beyond_vmem_cap(self, rng):
        """fused='auto' with S > 2048 and no mask selects the flash path."""
        from sttode_tpu.nn.attention import _kernel_route
        q = jnp.zeros((1, 256, 8))
        k = jnp.zeros((1, 4096, 8))
        assert _kernel_route(q, k, None, False, False, "auto") in \
            (None, "flash")  # None off-TPU; flash on TPU
        if jax.default_backend() == "tpu":
            assert _kernel_route(q, k, None, False, False, "auto") == "flash"
        mask = jnp.zeros((1, 256, 4096))
        assert _kernel_route(q, k, mask, False, False, "auto") != "flash"
