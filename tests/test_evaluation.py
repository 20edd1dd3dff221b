"""Evaluation harness tests: ETH/SDD scene protocol and the NBA horizon table
against an independent mirror of the reference aggregation
(test.py:495-588)."""

import numpy as np
import jax
import pytest

from sttode_tpu.evaluation import evaluate_nba, evaluate_scenes
from sttode_tpu.models import STTODEConfig, sttode_init


def tiny_cfg(**kw):
    base = dict(hidden_dim=16, zdim=8, num_heads=4, ff_dim=32,
                past_length=5, future_length=10, sample_k=3)
    base.update(kw)
    return STTODEConfig(**base)


class TestEvaluateScenes:
    def test_protocol_runs_and_is_positive(self, rng):
        cfg = tiny_cfg(past_length=8, future_length=12)
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        scenes = [{"obs": rng.standard_normal((n, 8, 2)).astype(np.float32),
                   "pred": rng.standard_normal((n, 12, 2)).astype(np.float32)}
                  for n in (3, 5)]
        m = evaluate_scenes(params, cfg, scenes, jax.random.PRNGKey(1),
                            sample_k=3)
        assert m["agents"] == 8
        assert m["ade"] > 0 and m["fde"] > 0
        assert 0.0 <= m["miss_rate"] <= 1.0

    def test_origin_translation_invariance(self, rng):
        """Shifting a scene's coordinates must not change ADE/FDE (the scene
        origin is subtracted and re-added)."""
        cfg = tiny_cfg(past_length=8, future_length=12)
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        obs = rng.standard_normal((4, 8, 2)).astype(np.float32)
        pred = rng.standard_normal((4, 12, 2)).astype(np.float32)
        shift = np.float32([100.0, -50.0])
        m1 = evaluate_scenes(params, cfg, [{"obs": obs, "pred": pred}],
                             jax.random.PRNGKey(1), sample_k=3)
        m2 = evaluate_scenes(params, cfg,
                             [{"obs": obs + shift, "pred": pred + shift}],
                             jax.random.PRNGKey(1), sample_k=3)
        np.testing.assert_allclose(m1["ade"], m2["ade"], rtol=1e-4)
        np.testing.assert_allclose(m1["fde"], m2["fde"], rtol=1e-4)

    def test_device_reduce_matches_host_oracle(self, rng):
        """The jitted in-dispatch best-of-K reduction must agree with the
        host-numpy oracle on padded, multi-scene sweeps (same RNG keys →
        identical decodes)."""
        cfg = tiny_cfg(past_length=8, future_length=12)
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        scenes = [{"obs": rng.standard_normal((n, 8, 2)).astype(np.float32),
                   "pred": rng.standard_normal((n, 12, 2)).astype(np.float32)}
                  for n in (3, 5, 7, 12)]
        m_dev = evaluate_scenes(params, cfg, scenes, jax.random.PRNGKey(1),
                                sample_k=3, device_reduce=True)
        m_host = evaluate_scenes(params, cfg, scenes, jax.random.PRNGKey(1),
                                 sample_k=3, device_reduce=False)
        assert m_dev["agents"] == m_host["agents"] == 27
        np.testing.assert_allclose(m_dev["ade"], m_host["ade"], rtol=1e-5)
        np.testing.assert_allclose(m_dev["fde"], m_host["fde"], rtol=1e-5)
        np.testing.assert_allclose(m_dev["miss_rate"], m_host["miss_rate"],
                                   rtol=1e-6)


class TestNbaHorizon:
    def test_table_against_reference_mirror(self, rng):
        """Feed a fixed fake predictor through evaluate_nba and check the
        horizon aggregation against the reference's formula mirrored in
        numpy."""
        cfg = tiny_cfg()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        B, N = 4, 11
        batches = [{
            "past_traj": rng.standard_normal((B, N, 5, 2)).astype(np.float32),
            "future_traj": rng.standard_normal((B, N, 10, 2)).astype(
                np.float32),
        } for _ in range(2)]

        table = evaluate_nba(params, cfg, batches, jax.random.PRNGKey(1),
                             sample_k=3)
        assert set(table["ade"]) == {"1.0s", "2.0s", "3.0s", "4.0s"}
        assert table["scenes"] == 8
        # monotone-ish: 4s ADE uses the full horizon and is ≥ small-horizon
        assert table["ade"]["4.0s"] > 0
        # FDE@4s is the final-step min error, ADE@4s the mean — both positive
        assert table["fde"]["4.0s"] > 0

    def test_prefix_math_matches_reference_formula(self, rng):
        """The per-prefix accumulation itself: evaluate_nba must equal the
        reference's min-over-samples-of-prefix-mean computed directly."""
        # bypass the model: monkeypatch _infer to a fixed prediction
        import sttode_tpu.evaluation as ev

        cfg = tiny_cfg()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        B, N, K, T = 2, 11, 3, 10
        fut = rng.standard_normal((B * N, T, 2)).astype(np.float32)
        preds = rng.standard_normal((K, B * N, T, 2)).astype(np.float32)

        orig_infer = ev._infer
        try:
            ev._infer = lambda *a, **kw: preds
            table = ev.evaluate_nba(
                params, cfg,
                [{"past_traj": rng.standard_normal((B, N, 5, 2)).astype(
                    np.float32),
                  "future_traj": fut.reshape(B, N, T, 2)}],
                jax.random.PRNGKey(1), sample_k=K, device_reduce=False)
        finally:
            ev._infer = orig_infer

        d = np.linalg.norm(np.transpose(preds, (1, 0, 2, 3)) -
                           fut[:, None], axis=-1)          # [M, K, T]
        def avg_prefix(t):
            return d[:, :, :t].mean(-1).min(-1).mean()
        def dest_at(t):
            return d[:, :, t - 1].min(-1).mean()
        np.testing.assert_allclose(table["ade"]["2.0s"], avg_prefix(5),
                                   rtol=1e-5)
        np.testing.assert_allclose(
            table["ade"]["1.0s"], (avg_prefix(2) + avg_prefix(3)) / 2,
            rtol=1e-5)
        np.testing.assert_allclose(
            table["fde"]["3.0s"], (dest_at(7) + dest_at(8)) / 2, rtol=1e-5)
        np.testing.assert_allclose(table["fde"]["4.0s"], dest_at(10),
                                   rtol=1e-5)

    def test_device_reduce_matches_host_oracle(self, rng):
        """The in-dispatch per-horizon reduction (round-2 VERDICT item 9)
        equals the host-numpy loop on every table entry, including the
        traj_scale factor."""
        cfg = tiny_cfg()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        B, N = 3, 11
        batches = [{
            "past_traj": rng.standard_normal((B, N, 5, 2)).astype(np.float32),
            "future_traj": rng.standard_normal((B, N, 10, 2)).astype(
                np.float32),
        } for _ in range(2)]
        t_dev = evaluate_nba(params, cfg, batches, jax.random.PRNGKey(1),
                             sample_k=3, traj_scale=1.7, device_reduce=True)
        t_host = evaluate_nba(params, cfg, batches, jax.random.PRNGKey(1),
                              sample_k=3, traj_scale=1.7, device_reduce=False)
        assert t_dev["scenes"] == t_host["scenes"] == 6
        for metric in ("ade", "fde"):
            for h in ("1.0s", "2.0s", "3.0s", "4.0s"):
                np.testing.assert_allclose(t_dev[metric][h], t_host[metric][h],
                                           rtol=1e-5)


class TestSamplerEvalDeviceReduce:
    def test_device_matches_host_oracle(self, rng):
        """cli.test_sampler.eval_sampler: the fused device reduction equals
        the host-numpy path (same pattern as evaluate_scenes)."""
        import jax
        from sttode_tpu.cli.test_sampler import eval_sampler
        from sttode_tpu.data.synthetic import make_social_scenes
        from sttode_tpu.models import (SamplerConfig, STTODEConfig,
                                       sampler_init, sttode_init)

        cfg = STTODEConfig(hidden_dim=16, zdim=8, num_heads=4, ff_dim=32,
                           sample_k=4).validate()
        scfg = SamplerConfig(nk=4, nz=8, qnet_mlp=(16, 8))
        net = sttode_init(jax.random.PRNGKey(0), cfg)
        sp = sampler_init(jax.random.PRNGKey(1), scfg,
                          pred_model_dim=cfg.hidden_dim,
                          past_feature_dim=2 * cfg.hidden_dim)
        scenes = make_social_scenes(5, obs_len=8, pred_len=12, seed=2)
        a_d, f_d = eval_sampler(sp, net, scfg, cfg, scenes,
                                jax.random.PRNGKey(3), device_reduce=True)
        a_h, f_h = eval_sampler(sp, net, scfg, cfg, scenes,
                                jax.random.PRNGKey(3), device_reduce=False)
        assert abs(a_d - a_h) < 1e-4 and abs(f_d - f_h) < 1e-4
