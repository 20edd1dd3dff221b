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
        predictor._run_group([obs], [0], 8, out_a, key)
        predictor._run_group([obs + shift], [0], 8, out_b, key)
        np.testing.assert_allclose(out_b[0], out_a[0] + shift, atol=1e-3)

    def test_many_scenes_mixed_buckets(self, predictor, rng):
        scenes = [rng.standard_normal((n, 8, 2)).astype(np.float32)
                  for n in (2, 7, 12, 3)]
        outs = predictor.predict_many(scenes, seed=0)
        for obs, out in zip(scenes, outs):
            assert out.shape == (4, len(obs), 12, 2)

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
