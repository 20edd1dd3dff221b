"""Golden parity vs the ACTUAL reference code at /root/reference.

Round-1 VERDICT item 2: the mirror-based suite (test_torch_parity.py) stays as
a fast structural check, but the authority is this module — it imports the
reference's own ``Oblique`` (core/manifolds/oblique.py), pmath
(hyptorch/pmath.py), ``Hyp_mhsa`` (hyptransformerlib.py:314-454),
``TransformerEncoderLayer`` (hypertransformer.py:91-153), ``ODEG_Encoder``
(ode_demo.py:217-231) and full ``STTODENet`` (model/STTODE.py:349-623), ports
the torch weights into our param pytrees, and asserts elementwise parity.

torchdiffeq is vendored as a fixed-grid euler shim (see
tests/reference_harness.py) — exactly the semantics the reference exercises.
Stochastic draws in the full-model test are aligned by queueing fixed eps
arrays through ``torch.randn_like`` and threading the same arrays through our
functional composition.
"""

import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests import reference_harness as rh

from sttode_tpu.manifolds import oblique as j_oblique
from sttode_tpu.manifolds import pmath as j_pmath
from sttode_tpu.models.sttode import (Batch, STTODEConfig, decode, encode_past,
                                      encode_future, loss_diverse, loss_kl,
                                      loss_pred, prior, sttode_forward)
from sttode_tpu.nn.attention import mhgsa
from sttode_tpu.nn.embed import positional_encoding_table
from sttode_tpu.nn.ode_block import ode_encoder
from sttode_tpu.nn.transformer import LayerConfig, encoder_layer
from sttode_tpu.utils.distributions import DiagNormal


@pytest.fixture(scope="module")
def ref():
    return rh.load_reference()


def t(x):
    return torch.tensor(np.asarray(x))


def _allclose(jax_val, torch_val, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(jax_val),
                               torch_val.detach().numpy(),
                               atol=atol, rtol=rtol)


# --------------------------------------------------------------------------- #
# L0: oblique manifold                                                        #
# --------------------------------------------------------------------------- #

class TestObliqueVsReference:
    def test_proj(self, ref, rng):
        x = rng.standard_normal((5, 7, 16)).astype(np.float32)
        _allclose(j_oblique.proj(jnp.asarray(x)), ref.oblique.Oblique().proj(t(x)))

    def test_dist_orientation(self, ref, rng):
        """reference dist(p1, p2) = acos(p2 @ p1ᵀ) == ours dist(p2, p1)."""
        m = ref.oblique.Oblique()
        p1 = m.proj(t(rng.standard_normal((3, 6, 16)).astype(np.float32)))
        p2 = m.proj(t(rng.standard_normal((3, 4, 16)).astype(np.float32)))
        ours = j_oblique.dist(jnp.asarray(p2.numpy()), jnp.asarray(p1.numpy()))
        _allclose(ours, m.dist(p1, p2), atol=1e-4)

    def test_proj_tan_expmap_logmap(self, ref, rng):
        m = ref.oblique.Oblique()
        p = m.proj(t(rng.standard_normal((4, 16)).astype(np.float32)))
        u_raw = t(0.3 * rng.standard_normal((4, 16)).astype(np.float32))
        u = m.proj_tan(u_raw, p)
        pj, uj = jnp.asarray(p.numpy()), jnp.asarray(u.numpy())
        _allclose(j_oblique.proj_tan(jnp.asarray(u_raw.numpy()), pj),
                  m.proj_tan(u_raw, p), atol=1e-6)
        _allclose(j_oblique.expmap(uj, pj), m.expmap(u, p), atol=1e-5)
        # reference logmap is only well-defined for single-row input: its
        # `dist` returns the full pairwise matrix, so `u * dist` shape-errors
        # for batches (oblique.py:29-34 — zero live call sites). Compare on
        # the [1, D] case where the reference semantics exist.
        p1, u1 = p[:1], u[:1]
        p2 = m.expmap(u1, p1)
        _allclose(j_oblique.logmap(jnp.asarray(p2.numpy()),
                                   jnp.asarray(p1.numpy())),
                  m.logmap(p2, p1), atol=1e-3)

    def test_egrad2rgrad_ptransp(self, ref, rng):
        m = ref.oblique.Oblique()
        p = m.proj(t(rng.standard_normal((4, 16)).astype(np.float32)))
        y = m.proj(t(rng.standard_normal((4, 16)).astype(np.float32)))
        g = t(rng.standard_normal((4, 16)).astype(np.float32))
        pj, yj, gj = (jnp.asarray(a.numpy()) for a in (p, y, g))
        _allclose(j_oblique.egrad2rgrad(gj, pj), m.egrad2rgrad(p, g), atol=1e-6)
        _allclose(j_oblique.ptransp(gj, pj, yj), m.ptransp(p, y, g), atol=1e-6)


# --------------------------------------------------------------------------- #
# L0: Poincaré-ball pmath                                                     #
# --------------------------------------------------------------------------- #

def _ball_points(rng, shape, scale=0.3):
    x = rng.standard_normal(shape).astype(np.float32)
    return scale * x / np.sqrt(shape[-1])


class TestPmathVsReference:
    def test_mobius_add(self, ref, rng):
        x, y = _ball_points(rng, (8, 12)), _ball_points(rng, (8, 12))
        _allclose(j_pmath.mobius_add(jnp.asarray(x), jnp.asarray(y)),
                  ref.pmath.mobius_add(t(x), t(y)), atol=1e-6)

    def test_dist_and_dist0(self, ref, rng):
        x, y = _ball_points(rng, (8, 12)), _ball_points(rng, (8, 12))
        _allclose(j_pmath.dist(jnp.asarray(x), jnp.asarray(y)),
                  ref.pmath.dist(t(x), t(y)), atol=1e-5)
        _allclose(j_pmath.dist0(jnp.asarray(x)),
                  ref.pmath.dist0(t(x)), atol=1e-5)

    def test_exp_log_maps(self, ref, rng):
        x = _ball_points(rng, (8, 12))
        u = _ball_points(rng, (8, 12), scale=0.2)
        _allclose(j_pmath.expmap0(jnp.asarray(u)), ref.pmath.expmap0(t(u)),
                  atol=1e-6)
        _allclose(j_pmath.logmap0(jnp.asarray(x)), ref.pmath.logmap0(t(x)),
                  atol=1e-6)
        _allclose(j_pmath.expmap(jnp.asarray(x), jnp.asarray(u)),
                  ref.pmath.expmap(t(x), t(u)), atol=1e-6)
        y = _ball_points(rng, (8, 12))
        _allclose(j_pmath.logmap(jnp.asarray(x), jnp.asarray(y)),
                  ref.pmath.logmap(t(x), t(y)), atol=1e-5)

    def test_mobius_matvec(self, ref, rng):
        m = rng.standard_normal((12, 5)).astype(np.float32)
        x = _ball_points(rng, (8, 12))
        # reference mobius_matvec upcasts x to double internally — feed m as
        # double so its internal matmul dtypes agree
        _allclose(j_pmath.mobius_matvec(jnp.asarray(m.T), jnp.asarray(x)),
                  ref.pmath.mobius_matvec(t(m.T).double(), t(x)), atol=1e-5)

    def test_poincare_mean_and_dist_matrix(self, ref, rng):
        x = _ball_points(rng, (10, 12))
        y = _ball_points(rng, (7, 12))
        _allclose(j_pmath.poincare_mean(jnp.asarray(x), axis=0),
                  ref.pmath.poincare_mean(t(x), dim=0), atol=1e-5)
        _allclose(j_pmath.dist_matrix(jnp.asarray(x), jnp.asarray(y)),
                  ref.pmath.dist_matrix(t(x), t(y)), atol=1e-4)

    def test_artanh_custom_grad(self, ref, rng):
        """reference Artanh has a hand-written backward (pmath.py:16-27);
        match value and gradient at an interior point and near the clamp."""
        for val in (0.3, 0.999999):
            xt = torch.tensor([val], requires_grad=True)
            yt = ref.pmath.artanh(xt)
            yt.backward()
            xj = jnp.asarray([val], jnp.float32)
            yj, gj = jax.value_and_grad(
                lambda a: j_pmath.artanh(a).sum())(xj)
            np.testing.assert_allclose(float(yj), float(yt), rtol=1e-5)
            np.testing.assert_allclose(float(gj[0]), float(xt.grad[0]),
                                       rtol=1e-4)


# --------------------------------------------------------------------------- #
# L1/L2/L3: attention kernel, encoder layer, ODE encoder                      #
# --------------------------------------------------------------------------- #

def _make_ref_layer(ref, d_model, nhead, ff_dim):
    layer = ref.hypertransformer.TransformerEncoderLayer(
        d_model, nhead, ff_dim, 0.0)
    layer.eval()
    return layer


class TestKernelsVsReference:
    def test_hyp_mhsa_self_attention(self, ref, rng):
        """Square L=S case — quirk Q3's transposed orientation — vs the
        reference Hyp_mhsa module (hyptransformerlib.py:314-454)."""
        E, H = 32, 8
        mod = ref.hyptransformerlib.Hyp_mhsa(E, H)
        mod.eval()
        from sttode_tpu.nn.attention import MHGSAParams
        p = MHGSAParams(
            in_proj_w=rh._np(mod.in_proj_weight).T.copy(),
            in_proj_b=rh._np(mod.in_proj_bias).copy(),
            out_proj_w=rh._np(mod.out_proj.weight).T.copy(),
            out_proj_b=rh._np(mod.out_proj.bias).copy())
        x = rng.standard_normal((6, 5, E)).astype(np.float32)  # [L, B, E]
        out_ref, _ = mod(t(x), t(x), t(x))
        xj = jnp.asarray(np.transpose(x, (1, 0, 2)))           # [B, L, E]
        out_jax, _ = mhgsa(p, xj, xj, xj, num_heads=H, compat="reference")
        _allclose(jnp.transpose(out_jax, (1, 0, 2)), out_ref, atol=3e-5)

    def test_hyp_mhsa_cross_attention(self, ref, rng):
        """Rectangular L≠S case — the reference transposes back (Q3 else-branch)."""
        E, H = 32, 4
        mod = ref.hyptransformerlib.Hyp_mhsa(E, H)
        mod.eval()
        from sttode_tpu.nn.attention import MHGSAParams
        p = MHGSAParams(
            in_proj_w=rh._np(mod.in_proj_weight).T.copy(),
            in_proj_b=rh._np(mod.in_proj_bias).copy(),
            out_proj_w=rh._np(mod.out_proj.weight).T.copy(),
            out_proj_b=rh._np(mod.out_proj.bias).copy())
        q = rng.standard_normal((6, 5, E)).astype(np.float32)
        kv = rng.standard_normal((9, 5, E)).astype(np.float32)
        out_ref, _ = mod(t(q), t(kv), t(kv))
        qj = jnp.asarray(np.transpose(q, (1, 0, 2)))
        kj = jnp.asarray(np.transpose(kv, (1, 0, 2)))
        out_jax, _ = mhgsa(p, qj, kj, kj, num_heads=H, compat="reference")
        _allclose(jnp.transpose(out_jax, (1, 0, 2)), out_ref, atol=3e-5)

    def test_encoder_layer(self, ref, rng):
        """Full gated encoder layer on 4-D [L, N, S, D] tokens vs
        hypertransformer.TransformerEncoderLayer."""
        D, H, FF = 32, 8, 64
        layer = _make_ref_layer(ref, D, H, FF)
        p = rh.port_encoder_layer(layer)
        cfg = LayerConfig(d_model=D, num_heads=H, ff_dim=FF, dropout=0.0)
        x = rng.standard_normal((4, 3, 1, D)).astype(np.float32)
        out_ref = layer(t(x))
        out_jax = encoder_layer(p, jnp.asarray(x), cfg)
        _allclose(out_jax, out_ref, atol=5e-5)

    def test_odeg_encoder(self, ref, rng):
        """ODEG_Encoder (one-step euler over t=[0,12] + outer relu,
        ode_demo.py:217-231) vs our ode_encoder, through the REAL reference
        control flow (setparrament's mask-tuple quirk included)."""
        D, H, FF = 32, 8, 64
        layer = _make_ref_layer(ref, D, H, FF)
        enc = ref.ode_demo.ODEG_Encoder(layer, 1, 12)
        enc.eval()
        # port from the CLONE inside the ODE block (deepcopy ≠ original weights
        # object identity, but _get_clones copies values — port from the clone
        # to be exact)
        p = [rh.port_encoder_layer(l)
             for l in enc.odeblock.odefunc.layers]
        cfg = LayerConfig(d_model=D, num_heads=H, ff_dim=FF, dropout=0.0)
        x = rng.standard_normal((4, 3, 1, D)).astype(np.float32)
        mask = torch.zeros(12, 12)
        out_ref = enc(t(x), mask=mask, num_agent=3)
        out_jax = ode_encoder(p, jnp.asarray(x), cfg, time=12.0,
                              method="euler", steps=1)
        _allclose(out_jax, out_ref, atol=2e-4)


# --------------------------------------------------------------------------- #
# L4: full STTODENet forward — losses elementwise                             #
# --------------------------------------------------------------------------- #

def _ref_args(cfg: STTODEConfig) -> types.SimpleNamespace:
    return types.SimpleNamespace(
        hidden_dim=cfg.hidden_dim, zdim=cfg.zdim, hyper_scales=[5, 11],
        past_length=cfg.past_length, future_length=cfg.future_length,
        num_decompose=cfg.num_decompose, min_clip=cfg.min_clip,
        learn_prior=False, ztype="gaussian", sample_k=cfg.sample_k,
        max_train_agent=100, rand_rot_scene=False, discrete_rot=False,
        dataset="nba")


def _nba_style_batch(rng, B, N, T_p, T_f):
    """Build identical inputs for both models with the reference's velocity
    construction (set_data_nba, model/STTODE.py:474-481)."""
    M = B * N
    past = (rng.standard_normal((M, T_p, 2)) * 2.0).astype(np.float32)
    future = (past[:, -1:] +
              np.cumsum(rng.standard_normal((M, T_f, 2)), 1)).astype(np.float32)
    past_vel = np.concatenate([past[:, 1:2] - past[:, 0:1],
                               past[:, 1:] - past[:, :-1]], axis=1)
    future_vel = future - np.concatenate([past[:, -1:], future[:, :-1]], axis=1)
    return past, past_vel, future, future_vel


@pytest.fixture(scope="module")
def small_cfg():
    # nhead=8 / ff_dim=1024 / nlayer=1 / ode_time=12 are HARD-CODED in the
    # reference encoders (model/STTODE.py:190-195,249-254) — keep them; shrink
    # only what's configurable.
    return STTODEConfig(hidden_dim=32, zdim=8, num_heads=8, ff_dim=1024,
                        past_length=4, future_length=6, sample_k=20).validate()


class TestFullModelVsReference:
    def test_pe_table_matches(self, ref, small_cfg):
        net = ref.sttode.STTODENet(_ref_args(small_cfg), torch.device("cpu"))
        _allclose(positional_encoding_table(200, small_cfg.hidden_dim),
                  net.past_encoder.pos_encoder.pe, atol=1e-5, rtol=0)

    def test_forward_losses(self, ref, small_cfg, rng):
        """All four loss terms of STTODENet.forward (model/STTODE.py:553-568)
        match our functional composition elementwise, with aligned noise."""
        cfg = small_cfg
        B, N = 2, 3
        M = B * N
        args = _ref_args(cfg)
        net = ref.sttode.STTODENet(args, torch.device("cpu"))
        net.eval()

        params = rh.port_model(net)
        past, past_vel, future, future_vel = _nba_style_batch(
            rng, B, N, cfg.past_length, cfg.future_length)

        # --- reference forward with queued eps draws ---
        data = {"past_traj": t(past).view(B, N, cfg.past_length, 2),
                "future_traj": t(future).view(B, N, cfg.future_length, 2)}
        net.set_data_nba(data)

        eps_qz = rng.standard_normal((M, cfg.zdim)).astype(np.float32)
        eps_fu = rng.standard_normal((M, cfg.zdim)).astype(np.float32)
        eps_pz = rng.standard_normal((M * 20, cfg.zdim)).astype(np.float32)
        queue = [t(eps_qz), t(eps_fu), t(eps_pz)]
        orig_randn_like = torch.randn_like
        torch.randn_like = lambda x, **kw: queue.pop(0).to(x.dtype)
        try:
            with torch.no_grad():
                total_ref, lp_ref, lr_ref, lkl_ref, ldiv_ref = net.forward()
        finally:
            torch.randn_like = orig_randn_like
        assert not queue, "reference drew fewer eps than expected"

        # --- our functional composition with the same eps ---
        batch = Batch(past=jnp.asarray(past), past_vel=jnp.asarray(past_vel),
                      future=jnp.asarray(future),
                      future_vel=jnp.asarray(future_vel),
                      valid=jnp.ones((M,), jnp.float32),
                      batch_size=B, agent_num=N)
        key = jax.random.PRNGKey(0)  # train=False → PE dropout off, unused
        pf = encode_past(params, cfg, batch, rng=key, train=False)
        qz = encode_future(params, cfg, batch, pf, rng=key, train=False)
        qz_sample = qz.mu + jnp.asarray(eps_qz) * qz.sigma
        pred, recover = decode(params, cfg, pf, qz_sample, batch.past,
                               batch.cur_location, 1)
        l_pred = loss_pred(pred, batch.future, B)
        l_rec = loss_pred(recover, batch.past, B)
        pz = DiagNormal.standard((M, cfg.zdim))
        l_kl = loss_kl(qz, pz, B, N, cfg.min_clip)
        pf_k = jnp.repeat(pf, 20, axis=0)
        diverse, _ = decode(params, cfg, pf_k, jnp.asarray(eps_pz),
                            batch.past, batch.cur_location, 20)
        l_div = loss_diverse(
            diverse.reshape(M, 20, cfg.future_length, 2), batch.future)

        np.testing.assert_allclose(float(l_pred), lp_ref, rtol=2e-4)
        np.testing.assert_allclose(float(l_rec), lr_ref, rtol=2e-4)
        np.testing.assert_allclose(float(l_kl), lkl_ref, rtol=2e-4)
        np.testing.assert_allclose(float(l_div), ldiv_ref, rtol=2e-4)
        total_ours = float(l_pred + l_rec + l_kl + l_div)
        np.testing.assert_allclose(total_ours, float(total_ref), rtol=2e-4)

    def test_past_feature_matches(self, ref, small_cfg, rng):
        """encode_history's past_feature [M, 2D] elementwise
        (model/STTODE.py:488-496)."""
        cfg = small_cfg
        B, N = 2, 3
        net = ref.sttode.STTODENet(_ref_args(cfg), torch.device("cpu"))
        net.eval()
        params = rh.port_model(net)
        past, past_vel, future, future_vel = _nba_style_batch(
            rng, B, N, cfg.past_length, cfg.future_length)
        data = {"past_traj": t(past).view(B, N, cfg.past_length, 2),
                "future_traj": t(future).view(B, N, cfg.future_length, 2)}
        net.set_data_nba(data)
        with torch.no_grad():
            net.encode_history()
        batch = Batch(past=jnp.asarray(past), past_vel=jnp.asarray(past_vel),
                      future=jnp.asarray(future),
                      future_vel=jnp.asarray(future_vel),
                      valid=jnp.ones((B * N,), jnp.float32),
                      batch_size=B, agent_num=N)
        pf = encode_past(params, cfg, batch, rng=jax.random.PRNGKey(0),
                         train=False)
        _allclose(pf, net.past_feature, atol=2e-4)

    def test_inference_matches(self, ref, small_cfg, rng):
        """Best-of-20 prior decode (model/STTODE.py:574-623, NBA branch) vs our
        composition — same eps, elementwise trajectories."""
        cfg = small_cfg
        B, N = 2, 3
        M = B * N
        net = ref.sttode.STTODENet(_ref_args(cfg), torch.device("cpu"))
        net.eval()
        params = rh.port_model(net)
        past, past_vel, future, future_vel = _nba_style_batch(
            rng, B, N, cfg.past_length, cfg.future_length)
        data = {"past_traj": t(past).view(B, N, cfg.past_length, 2),
                "future_traj": t(future).view(B, N, cfg.future_length, 2)}
        net.set_data_nba(data)

        eps_pz = rng.standard_normal((M * 20, cfg.zdim)).astype(np.float32)
        queue = [t(eps_pz)]
        orig_randn_like = torch.randn_like
        torch.randn_like = lambda x, **kw: queue.pop(0).to(x.dtype)
        try:
            with torch.no_grad():
                traj_ref = net.inference(data)      # [20, M, T_f, 2]
        finally:
            torch.randn_like = orig_randn_like

        batch = Batch(past=jnp.asarray(past), past_vel=jnp.asarray(past_vel),
                      future=jnp.asarray(future),
                      future_vel=jnp.asarray(future_vel),
                      valid=jnp.ones((M,), jnp.float32),
                      batch_size=B, agent_num=N)
        pf = encode_past(params, cfg, batch, rng=jax.random.PRNGKey(0),
                         train=False)
        pf_k = jnp.repeat(pf, 20, axis=0)
        diverse, _ = decode(params, cfg, pf_k, jnp.asarray(eps_pz),
                            batch.past, batch.cur_location, 20)
        ours = jnp.transpose(
            diverse.reshape(M, 20, cfg.future_length, 2), (1, 0, 2, 3))
        _allclose(ours, traj_ref, atol=5e-4)


# --------------------------------------------------------------------------- #
# hyperbolic NN toolbox (hyptorch/nn.py)                                      #
# --------------------------------------------------------------------------- #

class TestHyperbolicNNVsReference:
    def test_hyperbolic_mlr(self, ref, rng):
        from sttode_tpu.nn.hyperbolic import hyperbolic_mlr

        mod = ref.hnn.HyperbolicMLR(ball_dim=12, n_classes=5, c=1.0)
        mod.double()
        params = {"a_vals": rh._np(mod.a_vals).copy(),
                  "p_vals": rh._np(mod.p_vals).copy()}
        x = _ball_points(rng, (9, 12))
        with torch.no_grad():
            logits_ref = mod(t(x).double())
        logits = hyperbolic_mlr(params, jnp.asarray(x), c=1.0)
        _allclose(logits, logits_ref, atol=1e-5)

    def test_hyp_linear(self, ref, rng):
        from sttode_tpu.nn.hyperbolic import hyp_linear

        mod = ref.hnn.HypLinear(12, 7, c=1.0)
        mod.double()
        p = {"w": rh._np(mod.weight).T.copy(), "b": rh._np(mod.bias).copy()}
        x = _ball_points(rng, (6, 12))
        with torch.no_grad():
            out_ref = mod(t(x).double())
        _allclose(hyp_linear(p, jnp.asarray(x), c=1.0), out_ref, atol=1e-5)

    def test_concat_poincare(self, ref, rng):
        from sttode_tpu.nn.hyperbolic import concat_poincare

        mod = ref.hnn.ConcatPoincareLayer(8, 6, 10, c=1.0)
        mod.double()
        p = {"l1": {"w": rh._np(mod.l1.weight).T.copy()},
             "l2": {"w": rh._np(mod.l2.weight).T.copy()}}
        x1, x2 = _ball_points(rng, (5, 8)), _ball_points(rng, (5, 6))
        with torch.no_grad():
            out_ref = mod(t(x1).double(), t(x2).double())
        _allclose(concat_poincare(p, jnp.asarray(x1), jnp.asarray(x2), c=1.0),
                  out_ref, atol=1e-5)

    def test_hyperbolic_distance_layer(self, ref, rng):
        from sttode_tpu.nn.hyperbolic import hyperbolic_distance

        mod = ref.hnn.HyperbolicDistanceLayer(c=1.0)
        x1, x2 = _ball_points(rng, (6, 12)), _ball_points(rng, (6, 12))
        with torch.no_grad():
            out_ref = mod(t(x1), t(x2))
        _allclose(hyperbolic_distance(jnp.asarray(x1), jnp.asarray(x2), c=1.0),
                  out_ref, atol=1e-5)

    def test_to_poincare_forward_and_riemannian_grad(self, ref, rng):
        """ToPoincare with feature clipping; the RiemannianGradient fix scales
        the BACKWARD by (1-c‖x‖²)²/4 (reference pmath.py:30-45) — assert
        both value and gradient."""
        from sttode_tpu.nn.hyperbolic import to_poincare

        mod = ref.hnn.ToPoincare(c=1.0, riemannian=True, clip_r=1.0)
        x = rng.standard_normal((5, 12)).astype(np.float32)
        xt = t(x).requires_grad_(True)
        out_ref = mod(xt)
        out_ref.sum().backward()
        out = to_poincare(jnp.asarray(x), c=1.0, clip_r=1.0, riemannian=True)
        _allclose(out, out_ref, atol=1e-5)
        g = jax.grad(lambda a: jnp.sum(to_poincare(a, c=1.0, clip_r=1.0,
                                                   riemannian=True)))(
            jnp.asarray(x))
        _allclose(g, xt.grad, atol=1e-4)

    def test_from_poincare(self, ref, rng):
        from sttode_tpu.nn.hyperbolic import from_poincare

        mod = ref.hnn.FromPoincare(c=1.0)
        x = _ball_points(rng, (5, 12))
        with torch.no_grad():
            out_ref = mod(t(x).double())
        _allclose(from_poincare(jnp.asarray(x), c=1.0), out_ref, atol=1e-5)


# --------------------------------------------------------------------------- #
# Euclidean dot-product attention twin (transformerlib.py)                    #
# --------------------------------------------------------------------------- #

class TestDotAttentionVsReference:
    def test_self_and_cross(self, ref, rng):
        from sttode_tpu.nn.dot_attention import dot_mhsa

        E, H = 32, 4
        mod = ref.transformerlib.MultiheadAttention(E, H)
        mod.eval()
        p = rh.port_mhsa(mod)
        x = rng.standard_normal((6, 5, E)).astype(np.float32)   # [L, B, E]
        with torch.no_grad():
            out_ref, _ = mod(t(x), t(x), t(x))
        xj = jnp.asarray(np.transpose(x, (1, 0, 2)))
        out, _ = dot_mhsa(p, xj, xj, xj, num_heads=H)
        _allclose(jnp.transpose(out, (1, 0, 2)), out_ref, atol=3e-5)

        kv = rng.standard_normal((9, 5, E)).astype(np.float32)
        with torch.no_grad():
            out_ref, _ = mod(t(x), t(kv), t(kv))
        kj = jnp.asarray(np.transpose(kv, (1, 0, 2)))
        out, _ = dot_mhsa(p, xj, kj, kj, num_heads=H)
        _allclose(jnp.transpose(out, (1, 0, 2)), out_ref, atol=3e-5)


# --------------------------------------------------------------------------- #
# decoder layer (dead in the reference model, implemented both sides)        #
# --------------------------------------------------------------------------- #

class TestDecoderLayerVsReference:
    def test_decoder_layer(self, ref, rng):
        from sttode_tpu.nn.transformer import decoder_layer

        D, H, FF = 32, 8, 64
        tl = ref.hypertransformer.TransformerDecoderLayer(D, H, FF, 0.0)
        tl.eval()
        p = rh.port_decoder_layer(tl)
        cfg = LayerConfig(d_model=D, num_heads=H, ff_dim=FF, dropout=0.0)
        tgt = rng.standard_normal((4, 3, 1, D)).astype(np.float32)
        mem = rng.standard_normal((6, 3, 1, D)).astype(np.float32)
        with torch.no_grad():
            out_ref, _, _ = tl(t(tgt), t(mem))
        out, _, _ = decoder_layer(p, jnp.asarray(tgt), jnp.asarray(mem), cfg)
        _allclose(out, out_ref, atol=5e-5)


# --------------------------------------------------------------------------- #
# δ-hyperbolicity analysis tool                                               #
# --------------------------------------------------------------------------- #

class TestDeltaVsReference:
    def test_delta_hyp(self, ref, rng):
        """Gromov delta from a distance matrix (reference delta.py:12-23)."""
        from scipy.spatial import distance_matrix

        from sttode_tpu.utils.delta import delta_hyp

        x = rng.standard_normal((40, 6)).astype(np.float64)
        dm = distance_matrix(x, x)
        np.testing.assert_allclose(delta_hyp(dm), ref.delta.delta_hyp(dm),
                                   rtol=1e-10)

    def test_batched_delta_hyp(self, ref, rng):
        """Same subsample draws → same relative-delta estimate
        (reference delta.py:26-35 draws via np.random.choice)."""
        from sttode_tpu.utils.delta import batched_delta_hyp

        x = rng.standard_normal((60, 5)).astype(np.float64)
        np.random.seed(7)
        m_ref, s_ref = ref.delta.batched_delta_hyp(x, n_tries=4, batch_size=30)

        class _SeededChoice:
            """Replays numpy's legacy global choice so subsamples align
            (the reference uses np.random.choice WITH replacement; ours
            defaults to without — pass through a replay shim)."""
            def __init__(self):
                np.random.seed(7)

            def choice(self, n, size, replace=False):
                del replace
                return np.random.choice(n, size)

        m_ours, s_ours = batched_delta_hyp(x, n_tries=4, batch_size=30,
                                           rng=_SeededChoice())
        np.testing.assert_allclose(m_ours, m_ref, rtol=1e-8)
        np.testing.assert_allclose(s_ours, s_ref, rtol=1e-8)


# --------------------------------------------------------------------------- #
# stage 2: DLow sampler + losses                                              #
# --------------------------------------------------------------------------- #

class TestSamplerVsReference:
    def test_sampler_forward_and_losses(self, ref, small_cfg, rng):
        """Reference Sampler.forward (sampler.py:32-73, mean path) driving the
        frozen net, plus compute_sampler_loss_nba (samplerloss.py:45-74), vs
        our sampler_forward/sampler_loss with ported weights."""
        import torch

        from sttode_tpu.models.sampler import (SamplerConfig, sampler_forward,
                                               sampler_loss)

        # the reference Sampler hard-codes linear(128->64) (sampler.py:26),
        # i.e. past_feature = 2*hidden = 128 -> hidden_dim must be 64
        cfg = small_cfg._replace(hidden_dim=64)
        B, N = 2, 3
        M = B * N
        args = _ref_args(cfg)
        args.nz = cfg.zdim            # sampler latent must match net zdim
        args.share_eps = True
        args.train_w_mean = True
        args.qnet_mlp = [512, 256]
        args.kld_weight = 0.1
        args.kld_min_clamp = 10.0
        net = ref.sttode.STTODENet(args, torch.device("cpu"))
        net.eval()
        sampler = ref.sampler.Sampler(args)
        sampler.eval()

        params = rh.port_model(net)
        sp = rh.port_sampler(sampler)
        scfg = SamplerConfig(nk=20, nz=cfg.zdim, train_w_mean=True,
                             div_weight=1.0, div_scale=1.0)

        past, past_vel, future, future_vel = _nba_style_batch(
            rng, B, N, cfg.past_length, cfg.future_length)
        data = {"past_traj": t(past).view(B, N, cfg.past_length, 2),
                "future_traj": t(future).view(B, N, cfg.future_length, 2)}
        net.set_data_nba(data)

        # the sampler's mean path draws no eps itself, but the net's
        # fu_encoder (2 draws) and decoder_future_0 (1 draw) still sample —
        # all three are discarded by the sampler path; queue placeholders
        eps_discard = [
            t(rng.standard_normal((M, cfg.zdim)).astype(np.float32)),
            t(rng.standard_normal((M, cfg.zdim)).astype(np.float32)),
            t(rng.standard_normal((M * 20, cfg.zdim)).astype(np.float32))]
        orig_randn_like = torch.randn_like
        torch.randn_like = lambda x, **kw: eps_discard.pop(0).to(x.dtype)
        try:
            with torch.no_grad():
                dec_ref, sdist_ref, vdist_ref, recon_ref = sampler.forward(net)
        finally:
            torch.randn_like = orig_randn_like

        batch = Batch(past=jnp.asarray(past), past_vel=jnp.asarray(past_vel),
                      future=jnp.asarray(future),
                      future_vel=jnp.asarray(future_vel),
                      valid=jnp.ones((M,), jnp.float32),
                      batch_size=B, agent_num=N)
        out = sampler_forward(sp, params, scfg, cfg, batch,
                              jax.random.PRNGKey(0), mean=True)

        _allclose(out.dec_motion, dec_ref, atol=5e-4)
        _allclose(out.recon_motion, recon_ref, atol=5e-4)
        _allclose(out.sampler_dist.mu, sdist_ref.mu, atol=1e-5)
        # log(A²+1e-8) amplifies ulp-level A differences; 5e-4 in log
        # space ≈ 2.5e-4 relative on A
        _allclose(out.sampler_dist.logvar, sdist_ref.logvar, atol=5e-4)

        # losses (NBA branch): totals and per-term values
        div_cfg = {"weight": 1.0, "scale": 1.0}
        total_ref, loss_dict, _ = ref.samplerloss.compute_sampler_loss_nba(
            args, t(future), dec_ref, B, vdist_ref, sdist_ref, div_cfg)
        total_ours, terms = sampler_loss(out, scfg, batch)
        np.testing.assert_allclose(float(total_ours), float(total_ref),
                                   rtol=2e-4)
        np.testing.assert_allclose(
            float(terms["diverse"] * scfg.div_weight),
            float(loss_dict["diverse"]), rtol=2e-4)
