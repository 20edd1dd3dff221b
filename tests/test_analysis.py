"""utils.analysis — the reference core/utils.py capability zoo, tested
against torch/numpy oracles and closed forms."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sttode_tpu.utils import analysis


class TestSimilarity:
    def test_euclidean_matches_bruteforce(self, rng):
        x1 = jnp.asarray(rng.standard_normal((2, 5, 7)), jnp.float32)
        x2 = jnp.asarray(rng.standard_normal((2, 9, 7)), jnp.float32)
        sim = analysis.compute_similarity(x1, x2, metric="euclidean")
        c1 = np.asarray(x1) - np.asarray(x1).mean(1, keepdims=True)
        c2 = np.asarray(x2) - np.asarray(x2).mean(1, keepdims=True)
        d = ((c1[:, :, None, :] - c2[:, None, :, :]) ** 2).sum(-1) / 7
        np.testing.assert_allclose(np.asarray(sim), 1.0 / (d + 1e-8),
                                   rtol=1e-3)

    def test_cosine_bounds_and_v2(self, rng):
        x1 = jnp.asarray(rng.standard_normal((1, 4, 6)), jnp.float32)
        x2 = jnp.asarray(rng.standard_normal((1, 5, 6)), jnp.float32)
        cos = np.asarray(analysis.compute_similarity(x1, x2, metric="cosine"))
        v2 = np.asarray(analysis.compute_similarity(x1, x2,
                                                    metric="cosine_v2"))
        assert np.all(np.abs(cos) <= 1.0 + 1e-6)
        np.testing.assert_allclose(v2, (cos + 1) / 2, atol=1e-6)
        # self-similarity diagonal is 1
        d = np.diagonal(np.asarray(analysis.compute_similarity(
            x1, x1, metric="cosine")), axis1=1, axis2=2)
        np.testing.assert_allclose(d, 1.0, atol=1e-5)

    def test_unknown_metric_raises(self, rng):
        x = jnp.zeros((1, 2, 3))
        with pytest.raises(NotImplementedError):
            analysis.compute_similarity(x, x, metric="mahalanobis")


class TestLabelSmoothing:
    def test_smooth_one_hot_rows_sum_to_one(self):
        t = analysis.smooth_one_hot(jnp.asarray([0, 2, 1]), 4, smoothing=0.1)
        np.testing.assert_allclose(np.asarray(t).sum(1), 1.0, atol=1e-6)
        assert float(t[0, 0]) == pytest.approx(0.9)
        assert float(t[0, 1]) == pytest.approx(0.1 / 3)

    def test_zero_smoothing_is_plain_ce(self, rng):
        logits = jnp.asarray(rng.standard_normal((6, 5)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 5, size=6))
        loss, acc = analysis.label_smoothing_loss_acc(logits, labels, 5,
                                                      smoothing=0.0)
        import torch
        ref = torch.nn.functional.cross_entropy(
            torch.tensor(np.asarray(logits)), torch.tensor(np.asarray(labels)).long())
        np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)
        assert 0.0 <= float(acc) <= 1.0

    def test_cross_entropy_and_acc_against_torch(self, rng):
        logits = jnp.asarray(rng.standard_normal((8, 4)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 4, size=8))
        one_hot = jax.nn.one_hot(labels, 4)
        import torch
        ref = torch.nn.functional.cross_entropy(
            torch.tensor(np.asarray(logits)), torch.tensor(np.asarray(labels)).long())
        np.testing.assert_allclose(
            float(analysis.cross_entropy(logits, one_hot)), float(ref),
            rtol=1e-5)
        acc = analysis.compute_acc(logits, one_hot)
        manual = (np.asarray(logits).argmax(-1) == np.asarray(labels)).mean()
        assert float(acc) == pytest.approx(manual)


class TestConfidenceInterval:
    def test_matches_formula(self, rng):
        data = rng.standard_normal(50)
        m, pm = analysis.compute_confidence_interval(data)
        assert m == pytest.approx(data.mean())
        assert pm == pytest.approx(1.96 * data.std() / np.sqrt(50))


class TestGrassmann:
    def test_identical_subspaces(self, rng):
        x = jnp.asarray(rng.standard_normal((20, 8)), jnp.float32)
        d = analysis.grassmann_distance(x, x, p=4)
        # spectrum term is 0; overlap of identical bases has all singular
        # values 1 -> mean(s^2) = 1
        np.testing.assert_allclose(float(d), 1.0, atol=1e-4)

    def test_rotation_invariance_of_overlap_term(self, rng):
        """Right-multiplying by an orthogonal matrix preserves the column
        space: the overlap term stays 1 and only the spectrum term moves."""
        x = jnp.asarray(rng.standard_normal((20, 6)), jnp.float32)
        q, _ = np.linalg.qr(rng.standard_normal((6, 6)))
        y = x @ jnp.asarray(q, jnp.float32)
        d = analysis.grassmann_distance(x, y, p=3)
        spect = float(jnp.mean((jnp.linalg.svd(x, compute_uv=False) -
                                jnp.linalg.svd(y, compute_uv=False)) ** 2))
        np.testing.assert_allclose(float(d), spect + 1.0, atol=1e-3)
