"""Fused selection-decode kernel vs the models.decode oracle.

Run in Pallas interpret mode on CPU; the on-chip A/B lives in
scripts/select_impl_ab.py (+ scripts/select_tile_ab.py) and BENCHMARKS.md."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sttode_tpu.kernels import select_decode as sd
from sttode_tpu.models import STTODEConfig, sttode_init
from sttode_tpu.models import sttode as m


@pytest.fixture(scope="module")
def setup():
    cfg = STTODEConfig(past_length=5, future_length=10).validate()
    params = sttode_init(jax.random.PRNGKey(0), cfg)
    M, K = 7, 20
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    # past_feature is constant across the K samples (the model repeats it);
    # the kernel reads it unrepeated, the decode oracle gets the repeat
    pf = jnp.repeat(jax.random.normal(ks[0], (M, 2 * cfg.hidden_dim)),
                    K, axis=0)
    z = jax.random.normal(ks[1], (M * K, cfg.zdim))
    past = jax.random.normal(ks[2], (M, cfg.past_length, 2))
    cur = jax.random.normal(ks[3], (M, 1, 2))
    fut = jax.random.normal(ks[4], (M, cfg.future_length, 2))
    state0 = m.decode_block0_state(params, past)
    return cfg, params, (M, K), pf, z, past, cur, fut, state0


def _kernel_call(cfg, params, pf, z, past, cur, fut, state0, K, **kw):
    """v3 layout: per-scene operands UNREPEATED, z k-major [K, M, Z];
    ``pf`` arrives in the oracle's repeated [M·K] layout."""
    M = past.shape[0]
    z_km = jnp.transpose(z.reshape(M, K, -1), (1, 0, 2))
    xt = past.reshape(M, -1)
    fut_rel = (fut - cur).reshape(M, -1)
    return sd.select_decode(params, pf[::K], z_km, state0, xt, fut_rel,
                            interpret=True, **kw)


def _oracle_dist(cfg, params, pf, z, past, cur, fut, state0, K):
    out_seq, _ = m.decode(params, cfg, pf, z, past, cur, K,
                          block0_state=state0)
    d = jnp.repeat(fut, K, axis=0) - out_seq
    return jnp.sum(jnp.square(d), axis=(-1, -2))


class TestSelectDecodeKernel:
    def test_dist_matches_decode_fp32(self, setup):
        cfg, params, (M, K), pf, z, past, cur, fut, state0 = setup
        got = _kernel_call(cfg, params, pf, z, past, cur, fut, state0, K,
                           dtype=jnp.float32)
        assert got.shape == (M, K)
        want = _oracle_dist(cfg, params, pf, z, past, cur, fut, state0, K)
        np.testing.assert_allclose(np.asarray(got).ravel(), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_dist_bf16_close_and_winners_near(self, setup):
        cfg, params, (M, K), pf, z, past, cur, fut, state0 = setup
        got = _kernel_call(cfg, params, pf, z, past, cur, fut, state0, K,
                           dtype=jnp.bfloat16)
        want = _oracle_dist(cfg, params, pf, z, past, cur, fut, state0, K)
        np.testing.assert_allclose(np.asarray(got).ravel(), np.asarray(want),
                                   rtol=0.08, atol=0.3)
        # winner agreement up to near-ties (the select_dtype contract):
        gk = np.asarray(got)
        wk = np.asarray(want).reshape(M, K)
        w_at_g = wk[np.arange(M), gk.argmin(1)]
        w_best = wk[np.arange(M), wk.argmin(1)]
        assert np.all(w_at_g <= w_best * 1.05 + 0.05)

    def test_traj_matches_decode(self, setup):
        cfg, params, (M, K), pf, z, past, cur, fut, state0 = setup
        rel = _kernel_call(cfg, params, pf, z, past, cur, fut, state0, K,
                           mode="traj", dtype=jnp.float32)
        assert rel.shape == (K, M, cfg.future_length * 2)
        got = jnp.transpose(rel, (1, 0, 2)).reshape(
            M * K, cfg.future_length, 2) + jnp.repeat(cur, K, axis=0)
        want, _ = m.decode(params, cfg, pf, z, past, cur, K,
                           block0_state=state0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_scene_padding(self, setup):
        """M=7 is far below the 512-scene tile; padded scenes must not
        disturb real ones (the tile clamps to round_up(M, 16))."""
        cfg, params, (M, K), pf, z, past, cur, fut, state0 = setup
        got = _kernel_call(cfg, params, pf, z, past, cur, fut, state0, K,
                           dtype=jnp.float32, m_tile=512)
        assert got.shape == (M, K)
        want = _oracle_dist(cfg, params, pf, z, past, cur, fut, state0, K)
        np.testing.assert_allclose(np.asarray(got).ravel(), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_k_block(self, setup):
        """k_block=4 processes 4 independent samples per grid step (latency
        interleaving); results must be identical to k_block=1."""
        cfg, params, (M, K), pf, z, past, cur, fut, state0 = setup
        g1 = _kernel_call(cfg, params, pf, z, past, cur, fut, state0, K,
                          dtype=jnp.float32, k_block=1)
        g4 = _kernel_call(cfg, params, pf, z, past, cur, fut, state0, K,
                          dtype=jnp.float32, k_block=4)
        np.testing.assert_allclose(np.asarray(g4), np.asarray(g1),
                                   rtol=1e-6, atol=1e-6)

    def test_multiple_scene_tiles(self, setup):
        """m_tile=16 < M forces several m-tiles — the k-major grid must
        recompute the scratch bases at each new tile's k=0."""
        cfg, params, (M, K), pf, z, past, cur, fut, state0 = setup
        got = _kernel_call(cfg, params, pf, z, past, cur, fut, state0, K,
                           dtype=jnp.float32, m_tile=16)
        want = _oracle_dist(cfg, params, pf, z, past, cur, fut, state0, K)
        np.testing.assert_allclose(np.asarray(got).ravel(), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_rejects_other_decompose_counts(self, setup):
        cfg, params, *_ = setup
        bad = dict(params)
        bad["decoder"] = params["decoder"][:1]
        with pytest.raises(AssertionError, match="num_decompose=2"):
            sd.prep_select_weights(bad, 128, 32, 5)

    def test_default_horizons(self):
        """past_length=8 / future_length=12 (the config defaults) — the
        conv/GRU band fold is generic in T, not pinned to the 5/10 fixture."""
        cfg = STTODEConfig().validate()
        params = sttode_init(jax.random.PRNGKey(3), cfg)
        M, K = 3, 4
        ks = jax.random.split(jax.random.PRNGKey(4), 5)
        pf = jnp.repeat(jax.random.normal(ks[0], (M, 2 * cfg.hidden_dim)),
                        K, axis=0)
        z = jax.random.normal(ks[1], (M * K, cfg.zdim))
        past = jax.random.normal(ks[2], (M, cfg.past_length, 2))
        cur = jax.random.normal(ks[3], (M, 1, 2))
        fut = jax.random.normal(ks[4], (M, cfg.future_length, 2))
        state0 = m.decode_block0_state(params, past)
        got = _kernel_call(cfg, params, pf, z, past, cur, fut, state0, K,
                           dtype=jnp.float32)
        want = _oracle_dist(cfg, params, pf, z, past, cur, fut, state0, K)
        np.testing.assert_allclose(np.asarray(got).ravel(), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_forward_fused_matches_xla(self, rng):
        """select_impl='fused' (interpret on CPU): same total loss and
        gradients as the XLA selection path when the argmin winners agree
        (fp32 — numerics differ only by matmul reassociation)."""
        from sttode_tpu.models import Batch, sttode_forward

        cfg = STTODEConfig(hidden_dim=16, zdim=8, num_heads=4, ff_dim=32,
                           past_length=8, future_length=12,
                           sample_k=5).validate()
        cfg_f = cfg._replace(select_impl="fused").validate()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        B, N = 2, 3
        M = B * N
        past = rng.standard_normal((M, 8, 2)).astype(np.float32)
        fut = rng.standard_normal((M, 12, 2)).astype(np.float32)
        past_vel = np.diff(past, axis=1, prepend=past[:, :1])
        fut_vel = np.diff(np.concatenate([past[:, -1:], fut], 1), axis=1)
        batch = Batch(past=jnp.asarray(past), past_vel=jnp.asarray(past_vel),
                      future=jnp.asarray(fut), future_vel=jnp.asarray(fut_vel),
                      valid=jnp.ones((M,), jnp.float32),
                      batch_size=B, agent_num=N)
        key = jax.random.PRNGKey(5)

        def loss(p, c):
            return sttode_forward(p, c, batch, key).total_loss

        lx, gx = jax.value_and_grad(loss)(params, cfg)
        lf, gf = jax.value_and_grad(loss)(params, cfg_f)
        np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
        deltas = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), gx, gf)
        assert max(jax.tree.leaves(deltas)) < 1e-4

        out_f = sttode_forward(params, cfg_f, batch, key)
        # trajectories never leave the kernel; the field is NaN-filled so
        # accidental consumption is loud (ForwardOutput docstring)
        assert bool(jnp.all(jnp.isnan(out_f.diverse_pred)))

    def test_fused_requires_sparse(self):
        with pytest.raises(AssertionError, match="fused"):
            STTODEConfig(select_impl="fused",
                         diverse_grad="dense").validate()

    def test_inference_fused_matches_xla(self, rng, monkeypatch):
        """select_impl='fused' routes sttode_inference through the kernel's
        traj mode; outputs must match the XLA decode (same z draws). The
        route is TPU-gated in production, so the CPU test opens the
        interpret hook — and first asserts the gate itself: WITHOUT the
        hook a fused config on this CPU host must take the XLA path."""
        from sttode_tpu.models import Batch, sttode_inference

        cfg = STTODEConfig(hidden_dim=16, zdim=8, num_heads=4, ff_dim=32,
                           past_length=8, future_length=12,
                           sample_k=5).validate()
        cfg_f = cfg._replace(select_impl="fused").validate()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        B, N = 2, 3
        M = B * N
        past = rng.standard_normal((M, 8, 2)).astype(np.float32)
        fut = rng.standard_normal((M, 12, 2)).astype(np.float32)
        past_vel = np.diff(past, axis=1, prepend=past[:, :1])
        fut_vel = np.diff(np.concatenate([past[:, -1:], fut], 1), axis=1)
        batch = Batch(past=jnp.asarray(past), past_vel=jnp.asarray(past_vel),
                      future=jnp.asarray(fut), future_vel=jnp.asarray(fut_vel),
                      valid=jnp.ones((M,), jnp.float32),
                      batch_size=B, agent_num=N)
        key = jax.random.PRNGKey(5)
        want = sttode_inference(params, cfg, batch, key)

        gated = sttode_inference(params, cfg_f, batch, key)
        np.testing.assert_array_equal(np.asarray(gated), np.asarray(want))

        monkeypatch.setattr(m, "_ALLOW_FUSED_INFERENCE_INTERPRET", True)
        got = sttode_inference(params, cfg_f, batch, key)
        assert got.shape == want.shape == (5, M, 12, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_inference_fused_under_data_parallel_mesh(self, rng, monkeypatch):
        """The traj-mode shard_map branch (sharded axis in the MIDDLE output
        dim) under a dp=8 mesh must equal the meshless kernel run."""
        from sttode_tpu.models import Batch, sttode_inference
        from sttode_tpu.parallel import make_mesh

        monkeypatch.setattr(m, "_ALLOW_FUSED_INFERENCE_INTERPRET", True)
        mesh = make_mesh(dp=8, tp=1)
        cfg = STTODEConfig(hidden_dim=16, zdim=8, num_heads=4, ff_dim=32,
                           past_length=8, future_length=12, sample_k=5,
                           select_impl="fused").validate()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        B, N = 8, 2
        M = B * N
        past = rng.standard_normal((M, 8, 2)).astype(np.float32)
        fut = rng.standard_normal((M, 12, 2)).astype(np.float32)
        past_vel = np.diff(past, axis=1, prepend=past[:, :1])
        fut_vel = np.diff(np.concatenate([past[:, -1:], fut], 1), axis=1)
        batch = Batch(past=jnp.asarray(past), past_vel=jnp.asarray(past_vel),
                      future=jnp.asarray(fut), future_vel=jnp.asarray(fut_vel),
                      valid=jnp.ones((M,), jnp.float32),
                      batch_size=B, agent_num=N)
        key = jax.random.PRNGKey(5)
        got0 = sttode_inference(params, cfg, batch, key)
        got1 = jax.jit(lambda p: sttode_inference(p, cfg, batch, key,
                                                  mesh=mesh))(params)
        np.testing.assert_allclose(np.asarray(got1), np.asarray(got0),
                                   rtol=1e-5, atol=1e-5)

    def test_fused_under_data_parallel_mesh(self, rng):
        """select_impl='fused' with a dp=8 mesh: the kernel shard_maps over
        'data' (rows are independent) and must equal the meshless run."""
        from sttode_tpu.models import Batch, sttode_forward
        from sttode_tpu.parallel import make_mesh

        mesh = make_mesh(dp=8, tp=1)
        cfg = STTODEConfig(hidden_dim=16, zdim=8, num_heads=4, ff_dim=32,
                           past_length=8, future_length=12, sample_k=5,
                           select_impl="fused").validate()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        B, N = 8, 2
        M = B * N
        past = rng.standard_normal((M, 8, 2)).astype(np.float32)
        fut = rng.standard_normal((M, 12, 2)).astype(np.float32)
        past_vel = np.diff(past, axis=1, prepend=past[:, :1])
        fut_vel = np.diff(np.concatenate([past[:, -1:], fut], 1), axis=1)
        batch = Batch(past=jnp.asarray(past), past_vel=jnp.asarray(past_vel),
                      future=jnp.asarray(fut), future_vel=jnp.asarray(fut_vel),
                      valid=jnp.ones((M,), jnp.float32),
                      batch_size=B, agent_num=N)
        key = jax.random.PRNGKey(5)

        def loss(p, mesh_):
            return sttode_forward(p, cfg, batch, key,
                                  mesh=mesh_).total_loss

        l0 = jax.jit(lambda p: loss(p, None))(params)
        l1 = jax.jit(lambda p: loss(p, mesh))(params)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)

    def test_auto_validates_and_runs(self, rng):
        """'auto' is legal even where 'fused' is not (it falls back to xla),
        and on CPU / below the row threshold it matches the xla path
        bitwise (it IS the xla path)."""
        from sttode_tpu.models import Batch, sttode_forward

        STTODEConfig(select_impl="auto", diverse_grad="dense").validate()
        cfg = STTODEConfig(hidden_dim=16, zdim=8, num_heads=4, ff_dim=32,
                           past_length=8, future_length=12,
                           sample_k=5).validate()
        cfg_a = cfg._replace(select_impl="auto").validate()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        B, N = 2, 3
        M = B * N
        past = rng.standard_normal((M, 8, 2)).astype(np.float32)
        fut = rng.standard_normal((M, 12, 2)).astype(np.float32)
        past_vel = np.diff(past, axis=1, prepend=past[:, :1])
        fut_vel = np.diff(np.concatenate([past[:, -1:], fut], 1), axis=1)
        batch = Batch(past=jnp.asarray(past), past_vel=jnp.asarray(past_vel),
                      future=jnp.asarray(fut), future_vel=jnp.asarray(fut_vel),
                      valid=jnp.ones((M,), jnp.float32),
                      batch_size=B, agent_num=N)
        key = jax.random.PRNGKey(5)
        lx = sttode_forward(params, cfg, batch, key).total_loss
        la = sttode_forward(params, cfg_a, batch, key).total_loss
        assert float(lx) == float(la)

    def test_band_conv_matrix_matches_conv1d(self, setup):
        from sttode_tpu.nn.recurrent import conv1d
        cfg, params, *_ = setup
        conv = params["decoder"][1]["conv_past"]
        wc, bc = sd._band_conv_matrix(conv.w, conv.b, 5, jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(7), (13, 5, 2))
        want = conv1d(conv, x, padding=1)
        got = (x.reshape(13, 10) @ wc + bc).reshape(13, 5, 32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
