"""Support-layer tests: visualization renderers, profiling tools,
distributions."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sttode_tpu.utils import visualize, profiling
from sttode_tpu.utils.distributions import DiagNormal, RelaxedOneHot


class TestVisualize:
    def test_plot_scene_saves(self, rng, tmp_path):
        obs = rng.standard_normal((3, 8, 2))
        gt = rng.standard_normal((3, 12, 2))
        pred = rng.standard_normal((3, 12, 2))
        out = str(tmp_path / "scene.png")
        visualize.plot_scene(obs, gt, pred, save_path=out, title="t")
        assert os.path.getsize(out) > 1000

    def test_plot_scene_dataset_presets(self, rng, tmp_path):
        """Per-dataset camera-frame presets (reference show.py conventions):
        eth/hotel swap axes and use the upside-down camera extents; ucy
        scenes render unswapped."""
        from sttode_tpu.utils.visualize import scene_preset

        assert scene_preset("eth")["swap_xy"] is True
        assert scene_preset("zara1") == {"swap_xy": False,
                                         "extent": (0, 15, 0, 14),
                                         "figsize": (7.20, 5.76)}
        assert scene_preset("nba") == {}
        obs = rng.standard_normal((2, 8, 2))
        bg = rng.random((10, 10, 3)).astype(np.float32)
        out = str(tmp_path / "eth.png")
        fig = visualize.plot_scene(obs, save_path=out, background=bg,
                                   dataset="eth")
        assert os.path.exists(out)

    def test_plot_best_of_k(self, rng, tmp_path):
        obs = rng.standard_normal((2, 8, 2))
        gt = rng.standard_normal((2, 12, 2))
        pred_k = rng.standard_normal((2, 5, 12, 2))
        out = str(tmp_path / "bok.png")
        visualize.plot_best_of_k(obs, gt, pred_k, save_path=out)
        assert os.path.exists(out)

    def test_plot_nba_court(self, rng, tmp_path):
        past = rng.uniform(0, 28, (11, 5, 2))
        fut = rng.uniform(0, 28, (11, 10, 2))
        out = str(tmp_path / "court.png")
        visualize.plot_nba_court(past, fut, save_path=out)
        assert os.path.exists(out)


class TestProfiling:
    def test_param_count_and_table(self):
        params = {"a": jnp.zeros((4, 8)), "b": [jnp.zeros((3,)),
                                                jnp.zeros((2, 2))]}
        assert profiling.param_count(params) == 32 + 3 + 4
        lines = []
        rows = profiling.param_table(params, print_fn=lines.append)
        assert len(rows) == 3
        assert any("TOTAL" in l for l in lines)

    def test_time_fn(self):
        f = jax.jit(lambda x: x * 2)
        r = profiling.time_fn(f, jnp.ones(128), iters=5)
        assert r["seconds_per_call"] > 0

    def test_cost_analysis(self):
        def f(x):
            return x @ x
        costs = profiling.cost_analysis(f, jnp.ones((64, 64)))
        assert costs["flops"] > 0

    def test_trace_writes(self, tmp_path):
        with profiling.trace(str(tmp_path)):
            jax.block_until_ready(jnp.ones(16) + 1)
        # xplane file somewhere under the dir
        found = any("xplane" in f or "trace" in f.lower()
                    for _, _, fs in os.walk(tmp_path) for f in fs)
        assert found


class TestDistributions:
    def test_diag_normal_kl_standard(self, rng):
        mu = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
        q = DiagNormal(mu=mu, logvar=jnp.zeros_like(mu))
        kl = q.kl()
        np.testing.assert_allclose(np.asarray(kl), 0.5 * np.asarray(mu) ** 2,
                                   atol=1e-6)
        p = DiagNormal.standard(mu.shape)
        np.testing.assert_allclose(np.asarray(q.kl(p)), np.asarray(kl),
                                   atol=1e-6)

    def test_rsample_statistics(self):
        d = DiagNormal(mu=jnp.full((20000,), 3.0),
                       logvar=jnp.full((20000,), np.log(4.0)))
        s = np.asarray(d.rsample(jax.random.PRNGKey(0)))
        assert abs(s.mean() - 3.0) < 0.1
        assert abs(s.std() - 2.0) < 0.1

    def test_relaxed_one_hot(self):
        d = RelaxedOneHot(logits=jnp.asarray([[2.0, 0.0, -2.0]]))
        s = d.rsample(jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(s.sum(-1)), 1.0, atol=1e-5)
        hard = d.sample(jax.random.PRNGKey(1))
        assert np.asarray(hard).sum() == 1.0
        assert np.all(np.asarray(d.kl()) >= 0)
        assert np.asarray(d.mode())[0, 0] == 1.0
