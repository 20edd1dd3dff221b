"""Head-packed small-shape MHGSA kernel vs the pure-jnp path (interpret mode
on CPU — same program, exact semantics). The packed kernel is the flagship
model shape's route (L=S≤128, Dh=8 — reference hyptransformerlib.py:214-218);
these lock its numerics incl. the hand-derived packed backward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sttode_tpu.kernels.packed_mhgsa import packed_geodesic_attention
from sttode_tpu.nn.attention import geodesic_attention


def ref_attention(q, k, v, kv_valid=None):
    mask = None
    if kv_valid is not None:
        neg = jnp.finfo(jnp.float32).min
        mask = jnp.where(kv_valid[..., None, None, :] > 0, 0.0, neg)
    out, _ = geodesic_attention(q, k, v, mask=mask, compat="tpu", fused=False)
    return out


CASES = [
    # (B, H, L, S, Dh, masked) — flagship proxy, agent-axis, rectangular,
    # odd sizes, H*Dh = 128 boundary
    (3, 8, 32, 32, 8, False),
    (2, 8, 11, 11, 8, True),
    (1, 4, 16, 24, 16, False),
    (5, 8, 32, 32, 8, True),
    (2, 16, 8, 8, 8, False),
    (1, 2, 7, 13, 8, True),
]


def _case(rng, B, H, L, S, Dh, masked):
    ks = jax.random.split(jax.random.PRNGKey(rng.integers(1 << 30)), 4)
    q = jax.random.normal(ks[0], (B, H, L, Dh))
    k = jax.random.normal(ks[1], (B, H, S, Dh))
    v = jax.random.normal(ks[2], (B, H, S, Dh))
    kv = None
    if masked:
        kv = (jax.random.uniform(ks[3], (B, S)) > 0.3).astype(jnp.float32)
        kv = kv.at[:, 0].set(1.0)      # at least one valid key per problem
    return q, k, v, kv


class TestPackedKernel:
    @pytest.mark.parametrize("case", CASES)
    def test_forward_matches_jnp(self, rng, case):
        q, k, v, kv = _case(rng, *case)
        out = packed_geodesic_attention(q, k, v, kv_valid=kv)
        ref = ref_attention(q, k, v, kv_valid=kv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5)

    @pytest.mark.parametrize("case", CASES[:4])
    def test_grads_match_jnp(self, rng, case):
        q, k, v, kv = _case(rng, *case)
        w = jax.random.normal(jax.random.PRNGKey(7), q.shape[:-1] + v.shape[-1:])

        def loss_packed(q, k, v):
            return jnp.sum(packed_geodesic_attention(q, k, v, kv_valid=kv) * w)

        def loss_ref(q, k, v):
            return jnp.sum(ref_attention(q, k, v, kv_valid=kv) * w)

        gp = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gp, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, err_msg=f"d{name}")

    def test_all_keys_invalid_row_is_zero(self, rng):
        """A problem whose every key is masked returns zeros (guarded
        denominator), with finite zero gradients — no NaN poisoning."""
        q, k, v, _ = _case(rng, 2, 4, 8, 8, 8, False)
        kv = jnp.ones((2, 8)).at[1].set(0.0)
        out = packed_geodesic_attention(q, k, v, kv_valid=kv)
        assert np.all(np.isfinite(np.asarray(out)))
        np.testing.assert_allclose(np.asarray(out[1]), 0.0)
        g = jax.grad(lambda q: jnp.sum(
            packed_geodesic_attention(q, k, v, kv_valid=kv)))(q)
        assert np.all(np.isfinite(np.asarray(g)))
        np.testing.assert_allclose(np.asarray(g[1]), 0.0)

    def test_h_dh_cap_rejected(self, rng):
        q = jnp.zeros((1, 32, 8, 8))   # H*Dh = 256 > 128
        with pytest.raises(ValueError, match="128"):
            packed_geodesic_attention(q, q, q)

    def test_grad_finite_identical_qk(self, rng):
        """q == k puts the diagonal at the acos clip boundary: the clip gate
        must zero those gradient elements, not NaN them."""
        q, _, v, _ = _case(rng, 2, 4, 12, 12, 8, False)
        g = jax.grad(lambda q: jnp.sum(
            packed_geodesic_attention(q, q, v)))(q)
        assert np.all(np.isfinite(np.asarray(g)))


class TestPackedRouting:
    def test_forced_route_through_geodesic_attention(self, rng):
        """fused='packed' drives the packed kernel from the public entry
        incl. the kv_valid plumbing and the Q3 swap rule."""
        q, k, v, kv = _case(rng, 2, 8, 11, 11, 8, True)
        out, w = geodesic_attention(q, k, v, kv_valid=kv, compat="tpu",
                                    fused="packed")
        assert w is None
        ref = ref_attention(q, k, v, kv_valid=kv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5)

    def test_forced_route_reference_compat_square_swap(self, rng):
        """compat='reference' square case: packed runs the Q3 swapped
        orientation (same program, q/k exchanged)."""
        q, k, v, _ = _case(rng, 2, 8, 16, 16, 8, False)
        out, _ = geodesic_attention(q, k, v, compat="reference",
                                    fused="packed")
        ref, _ = geodesic_attention(q, k, v, compat="reference", fused=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5)

    def test_additive_mask_rejected(self, rng):
        q, k, v, _ = _case(rng, 1, 4, 8, 8, 8, False)
        mask = jnp.zeros((1, 1, 8, 8))
        with pytest.raises(ValueError, match="key-validity"):
            geodesic_attention(q, k, v, mask=mask, compat="tpu",
                               fused="packed")

    def test_mhgsa_level_equivalence(self, rng):
        """Full mhgsa with the packed route equals the dense route (the
        integration path the model actually takes)."""
        from sttode_tpu.nn.attention import mhgsa, mhgsa_init
        E, H = 64, 8
        params = mhgsa_init(jax.random.PRNGKey(0), E)
        x = jax.random.normal(jax.random.PRNGKey(1), (3, 12, E))
        kv = jnp.ones((3, 12)).at[:, -2:].set(0.0)
        out_p, _ = mhgsa(params, x, x, x, H, compat="tpu", kv_valid=kv,
                         fused="packed")
        out_d, _ = mhgsa(params, x, x, x, H, compat="tpu", kv_valid=kv,
                         fused=False)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d),
                                   atol=3e-5)


class TestVmemPlan:
    """The chunked-compute VMEM planner: the B≥128 train step routes
    scene-axis attention at L=S=128+ through `auto`, whose packed pick
    previously compiled into a 24 MB Mosaic stack against the 16 MB scoped
    limit (compile-time OOM). The plan must (a) keep the flagship shape on
    the fully batched program, (b) shrink the chunk at fat shapes, and
    (c) make the route refuse what cannot fit even one problem at a time."""

    def test_flagship_keeps_full_batch(self):
        from sttode_tpu.kernels.packed_mhgsa import (_vmem_plan, _PACKED_G,
                                                     _FWD_TEMPS, _BWD_TEMPS)
        for temps, extra in ((_FWD_TEMPS, 0), (_BWD_TEMPS, 1)):
            c, fact, fits = _vmem_plan(_PACKED_G, 32, 32, 64, 8, temps,
                                       extra_blocks=extra)
            assert (c, fact, fits) == (_PACKED_G, False, True)

    def test_fat_shape_chunks_and_factorizes(self):
        """At L=S=96 (fat but fittable) both passes chunk below the full
        batch and factorize the segment sum; at L=S=128 the calibrated
        backward model (measured 17.02 MB at C=1 on-chip) refuses."""
        from sttode_tpu.kernels.packed_mhgsa import (_vmem_plan, _PACKED_G,
                                                     _FWD_TEMPS, _BWD_TEMPS)
        cf, factf, fitsf = _vmem_plan(_PACKED_G, 96, 96, 64, 8, _FWD_TEMPS)
        cb, factb, fitsb = _vmem_plan(_PACKED_G, 96, 96, 64, 8, _BWD_TEMPS,
                                      extra_blocks=1)
        assert fitsf and fitsb and factf and factb
        assert cf < _PACKED_G and cb <= cf
        _, _, fits128 = _vmem_plan(_PACKED_G, 128, 128, 64, 8, _BWD_TEMPS,
                                   extra_blocks=1)
        assert not fits128

    def test_route_refuses_unfittable(self, rng):
        from sttode_tpu.kernels.packed_mhgsa import packed_vmem_fit
        from sttode_tpu.nn.attention import _kernel_route
        assert packed_vmem_fit(32, 32, 8, 8)
        # L=S=128 measured a 17.02 MB backward stack even at C=1 — the
        # calibrated planner must refuse it (the B>=128 train step's
        # scene-axis shape; XLA also WINS there, dense 44.1k vs auto 37.5k
        # scenes/s at B=128)
        assert not packed_vmem_fit(128, 128, 8, 8)
        assert not packed_vmem_fit(8, 1024, 16, 8)
        q = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 8, 8))
        kv = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 1024, 8))
        route = _kernel_route(q, kv, None, None, False, False, "auto",
                              "oblique")
        assert route != "packed"

    def test_route_win_region_cap(self, rng):
        """auto routes packed only inside the measured win/parity region
        (L·S ≤ 32²); beyond it XLA fusion wins 1.2-1.6× and the route must
        not pick packed even though the kernel could run there."""
        from sttode_tpu.nn.attention import _kernel_route
        q48 = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 48, 8))
        k48 = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 48, 8))
        assert _kernel_route(q48, k48, None, None, False, False, "auto",
                             "oblique") != "packed"

    def test_chunked_fat_shape_parity(self, rng):
        """L=S=120 exercises chunked chunks + the factorized segment sum
        (H·Sp = 960 > 512) against the dense oracle, incl. grads."""
        q, k, v, kv = _case(rng, 2, 8, 120, 120, 8, True)
        out = packed_geodesic_attention(q, k, v, kv_valid=kv, interpret=True)
        ref = ref_attention(q, k, v, kv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5)
        gp = jax.grad(lambda q: jnp.sum(
            packed_geodesic_attention(q, k, v, kv_valid=kv,
                                      interpret=True)))(q)
        gr = jax.grad(lambda q: jnp.sum(ref_attention(q, k, v, kv)))(q)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), atol=3e-5)
