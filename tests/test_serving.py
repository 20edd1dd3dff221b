"""Serving Predictor: shapes, origin handling, determinism, bucketing."""

import numpy as np
import jax
import pytest

from sttode_tpu.models import STTODEConfig, sttode_init
from sttode_tpu.serving import Predictor


@pytest.fixture(scope="module")
def predictor():
    cfg = STTODEConfig(hidden_dim=16, zdim=8, num_heads=4, ff_dim=32,
                       past_length=8, future_length=12, sample_k=4)
    params = sttode_init(jax.random.PRNGKey(0), cfg)
    return Predictor(params, cfg)


class TestPredictor:
    def test_single_scene_shape(self, predictor, rng):
        obs = rng.standard_normal((3, 8, 2)).astype(np.float32)
        out = predictor.predict(obs, seed=1)
        assert out.shape == (4, 3, 12, 2)
        assert np.all(np.isfinite(out))

    def test_deterministic_per_seed(self, predictor, rng):
        obs = rng.standard_normal((3, 8, 2)).astype(np.float32)
        a = predictor.predict(obs, seed=5)
        b = predictor.predict(obs, seed=5)
        c = predictor.predict(obs, seed=6)
        np.testing.assert_array_equal(a, b)
        assert not np.allclose(a, c)

    def test_translation_equivariance(self, predictor, rng):
        """Absolute-coordinate handling: shifting the scene shifts the
        prediction (scene origin is subtracted/re-added). The sampling key is
        pinned manually — the public API folds scene content into the key, so
        a shifted scene legitimately draws different samples."""
        import jax
        obs = rng.standard_normal((2, 8, 2)).astype(np.float32)
        shift = np.float32([50.0, -20.0])
        key = jax.random.PRNGKey(3)
        out_a: list = [None]
        out_b: list = [None]
        predictor._finish_group(
            predictor._launch_group([obs], [0], 8, key), out_a)
        predictor._finish_group(
            predictor._launch_group([obs + shift], [0], 8, key), out_b)
        np.testing.assert_allclose(out_b[0], out_a[0] + shift, atol=1e-3)

    def test_many_scenes_mixed_buckets(self, predictor, rng):
        scenes = [rng.standard_normal((n, 8, 2)).astype(np.float32)
                  for n in (2, 7, 12, 3)]
        outs = predictor.predict_many(scenes, seed=0)
        for obs, out in zip(scenes, outs):
            assert out.shape == (4, len(obs), 12, 2)

    def test_pipeline_depth_invariant(self, predictor, rng):
        """Pipelined dispatch (depth>1 keeps groups in flight, fetches FIFO)
        must be value-identical to the serial depth=1 path — it only
        reorders host waits, never device programs or keys."""
        scenes = [rng.standard_normal((n, 8, 2)).astype(np.float32)
                  for n in (2, 7, 12, 3, 5, 9)]
        cfgp = predictor.cfg
        serial = Predictor(predictor.params, cfgp, pipeline_depth=1)
        # omit pipeline_depth: test the SHIPPED default (4) against serial,
        # so a default bump can never outrun this invariance check again
        deep = Predictor(predictor.params, cfgp)
        assert deep.pipeline_depth > 1, "default must actually pipeline"
        a = serial.predict_many(scenes, seed=2)
        b = deep.predict_many(scenes, seed=2)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_bad_shape_raises(self, predictor, rng):
        with pytest.raises(ValueError, match="expected"):
            predictor.predict(rng.standard_normal((3, 5, 2)))

    def test_warmup(self, predictor):
        predictor.warmup([2, 9])


def test_single_agent_2d_input_rejected(predictor):
    """[T_p, 2] input must error with the wrap hint, not broadcast into
    phantom agents (review fix)."""
    with pytest.raises(ValueError, match=r"obs\[None\]"):
        predictor.predict(np.zeros((8, 2), np.float32))


class TestSamplerServing:
    """Stage-2 serving (round-2 VERDICT item 5): the Predictor decodes via
    the DLow flow and matches sampler_forward's own numbers."""

    @pytest.fixture(scope="class")
    def two_stage(self):
        from sttode_tpu.models.sampler import SamplerConfig, sampler_init
        cfg = STTODEConfig(hidden_dim=16, zdim=8, num_heads=4, ff_dim=32,
                           past_length=8, future_length=12, sample_k=4)
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        scfg = SamplerConfig(nk=5, nz=8)
        sp = sampler_init(jax.random.PRNGKey(1), scfg,
                          pred_model_dim=cfg.hidden_dim,
                          past_feature_dim=2 * cfg.hidden_dim)
        return params, cfg, sp, scfg

    def test_sampler_k_and_shapes(self, two_stage, rng):
        params, cfg, sp, scfg = two_stage
        pred = Predictor(params, cfg, sampler_params=sp, sampler_cfg=scfg)
        obs = rng.standard_normal((3, 8, 2)).astype(np.float32)
        out = pred.predict(obs, seed=1)
        assert out.shape == (scfg.nk, 3, 12, 2)   # nk samples, not sample_k
        assert np.all(np.isfinite(out))

    def test_matches_sampler_forward(self, two_stage, rng):
        """The served samples equal a direct sampler_forward(mean=True)
        decode on the same prepared batch, plus the scene origin."""
        from sttode_tpu.data.preprocess import prepare_scene_group
        from sttode_tpu.models.sampler import sampler_forward
        import jax.numpy as jnp

        params, cfg, sp, scfg = two_stage
        pred = Predictor(params, cfg, sampler_params=sp, sampler_cfg=scfg)
        obs = rng.standard_normal((4, 8, 2)).astype(np.float32)
        out = pred.predict(obs, seed=0)

        o = np.zeros((1, 8, 8, 2), np.float32)
        valid = np.zeros((1, 8), np.float32)
        o[0, :4], valid[0, :4] = obs, 1.0
        batch, origs = prepare_scene_group(
            o, np.zeros((1, 8, 12, 2), np.float32), valid, training=False)
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        ref = sampler_forward(sp, params, scfg, cfg, batch,
                              jax.random.PRNGKey(9), mean=True).dec_motion
        ref = np.transpose(np.asarray(ref), (1, 0, 2, 3))[:, :4] + \
            origs[0][None, None, None]
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_mismatched_nz_rejected(self, two_stage):
        from sttode_tpu.models.sampler import SamplerConfig, sampler_init
        params, cfg, sp, _ = two_stage
        bad = SamplerConfig(nk=5, nz=cfg.zdim + 1)
        with pytest.raises(ValueError, match="zdim"):
            Predictor(params, cfg, sampler_params=sp, sampler_cfg=bad)

    def test_conflicting_sample_k_rejected(self, two_stage):
        params, cfg, sp, scfg = two_stage
        with pytest.raises(ValueError, match="nk"):
            Predictor(params, cfg, sampler_params=sp, sampler_cfg=scfg,
                      sample_k=scfg.nk + 1)

    def test_sampler_params_without_cfg_rejected(self, two_stage):
        params, cfg, sp, _ = two_stage
        with pytest.raises(ValueError, match="together"):
            Predictor(params, cfg, sampler_params=sp)


class TestIsolatedGrouping:
    """Round-5 VERDICT item 8: scene-axis isolation via ONE vmapped dispatch
    (lane-per-scene) instead of one dispatch per scene. Isolation is by
    construction — each vmap lane is its own batch_size=1 inference — so the
    grouped path must reproduce the serial per-scene path's values."""

    def test_grouped_matches_serial(self, predictor, rng):
        scenes = [rng.standard_normal((n, 8, 2)).astype(np.float32)
                  for n in (2, 3, 2, 5, 2, 3, 7)]
        serial = Predictor(predictor.params, predictor.cfg,
                           isolated_group_max=1)
        a = serial.predict_many(scenes, seed=4)       # 7 dispatches
        b = predictor.predict_many(scenes, seed=4)    # grouped lanes
        for x, y in zip(a, b):
            assert x.shape == y.shape
            # same per-scene keys; values may differ only by float-level
            # reassociation between the batched and unbatched programs
            np.testing.assert_allclose(x, y, atol=2e-5, rtol=1e-5)

    def test_grouped_isolation_no_cross_scene_leak(self, predictor, rng):
        """A scene's prediction must be IDENTICAL whether it shares the
        vmapped dispatch with other scenes or rides alone — the isolation
        guarantee the serialized path bought with dispatch count."""
        obs = rng.standard_normal((3, 8, 2)).astype(np.float32)
        others = [rng.standard_normal((3, 8, 2)).astype(np.float32) * 10
                  for _ in range(5)]
        alone = predictor.predict_many([obs], seed=9)[0]
        shared = predictor.predict_many([obs] + others, seed=9)[0]
        np.testing.assert_allclose(alone, shared, atol=2e-5, rtol=1e-5)

    def test_padding_lanes_dropped(self, predictor, rng):
        """Non-power-of-two group sizes pad lanes; outputs only cover the
        real scenes and stay finite."""
        scenes = [rng.standard_normal((2, 8, 2)).astype(np.float32)
                  for _ in range(3)]   # pads 3 -> 4 lanes
        outs = predictor.predict_many(scenes, seed=2)
        assert len(outs) == 3
        for o in outs:
            assert o.shape == (4, 2, 12, 2) and np.all(np.isfinite(o))

    def test_grouped_matches_serial_sampler_path(self, rng):
        """Stage-2 (DLow flow) serving under grouped isolation: vmapped
        lanes must reproduce the serial per-scene sampler decode."""
        from sttode_tpu.models.sampler import SamplerConfig, sampler_init
        cfg = STTODEConfig(hidden_dim=16, zdim=8, num_heads=4, ff_dim=32,
                           past_length=8, future_length=12, sample_k=4)
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        scfg = SamplerConfig(nk=5, nz=8)
        sp = sampler_init(jax.random.PRNGKey(1), scfg,
                          pred_model_dim=cfg.hidden_dim,
                          past_feature_dim=2 * cfg.hidden_dim)
        scenes = [rng.standard_normal((n, 8, 2)).astype(np.float32)
                  for n in (3, 2, 3)]
        serial = Predictor(params, cfg, sampler_params=sp, sampler_cfg=scfg,
                           isolated_group_max=1)
        grouped = Predictor(params, cfg, sampler_params=sp, sampler_cfg=scfg)
        a = serial.predict_many(scenes, seed=6)
        b = grouped.predict_many(scenes, seed=6)
        for x, y in zip(a, b):
            assert x.shape == y.shape == (scfg.nk, x.shape[1], 12, 2)
            np.testing.assert_allclose(x, y, atol=2e-5, rtol=1e-5)
