"""Guards, dot-attention twin, prefetch, logging tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from sttode_tpu.data.prefetch import prefetch
from sttode_tpu.nn.attention import mhgsa, mhgsa_init
from sttode_tpu.nn.dot_attention import dot_mhsa
from sttode_tpu.train.guards import all_finite, guarded_adam, zero_nan_grads
from sttode_tpu.utils.logging import Logger, print_log


class TestDotAttention:
    def test_matches_softmax_qk(self, rng):
        p = mhgsa_init(jax.random.PRNGKey(0), 32)
        x = jnp.asarray(rng.standard_normal((2, 6, 32)), jnp.float32)
        out, w = dot_mhsa(p, x, x, x, num_heads=4, need_weights=True)
        assert out.shape == (2, 6, 32)
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)
        # differs from the geodesic scores
        g_out, _ = mhgsa(p, x, x, x, num_heads=4)
        assert not np.allclose(np.asarray(out), np.asarray(g_out))


class TestGuards:
    def test_zero_nan_grads(self):
        tx = zero_nan_grads()
        state = tx.init({"w": jnp.zeros(3)})
        bad = {"w": jnp.asarray([1.0, jnp.nan, jnp.inf])}
        fixed, _ = tx.update(bad, state)
        np.testing.assert_array_equal(np.asarray(fixed["w"]), [1.0, 0.0, 0.0])

    def test_guarded_adam_survives_nan(self):
        params = {"w": jnp.ones(4)}
        opt = guarded_adam(1e-2, max_grad_norm=1.0)
        state = opt.init(params)
        grads = {"w": jnp.asarray([jnp.nan, 1.0, -1.0, jnp.inf])}
        updates, state = opt.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        assert bool(all_finite(new))

    def test_all_finite(self):
        assert bool(all_finite({"a": jnp.ones(3)}))
        assert not bool(all_finite({"a": jnp.asarray([1.0, jnp.nan])}))


class TestPrefetch:
    def test_order_and_completion(self):
        out = list(prefetch(iter(range(10)), size=3,
                            device_put=lambda x: x * 2))
        assert out == [i * 2 for i in range(10)]

    def test_producer_exception_propagates(self):
        def gen():
            yield 1
            raise ValueError("boom")

        it = prefetch(gen(), device_put=lambda x: x)
        assert next(it) == 1
        with pytest.raises(ValueError, match="boom"):
            list(it)

    def test_device_put_default(self, rng):
        batches = [{"x": rng.standard_normal((4,)).astype(np.float32),
                    "meta": 7}]
        out = list(prefetch(iter(batches)))
        assert isinstance(out[0]["x"], jax.Array)
        assert out[0]["meta"] == 7


class TestLogging:
    def test_logger_file_and_stdout(self, tmp_path, capsys):
        path = str(tmp_path / "log" / "train.log")
        lg = Logger(path)
        lg("hello")
        print_log("eth", 1, 10, 5, 100, "loss: 1.0", log=lg)
        lg.close()
        content = open(path).read()
        assert "hello" in content and "eth | Epo: 01/10" in content
        assert "hello" in capsys.readouterr().out


class TestCliConfigPlumbing:
    def test_select_dtype_flag_reaches_config(self):
        """--select_dtype threads parser → model_config → validated
        STTODEConfig (and defaults to fp32 when absent)."""
        from sttode_tpu.cli.common import base_parser, model_config
        p = base_parser("t")
        cfg = model_config(p.parse_args(
            ["--dataset", "nba", "--select_dtype", "bfloat16"]))
        assert cfg.select_dtype == "bfloat16"
        assert cfg.past_length == 5 and cfg.future_length == 10
        cfg = model_config(p.parse_args(["--dataset", "eth"]))
        assert cfg.select_dtype == "float32"

    def test_select_impl_flag_reaches_config(self):
        """--select_impl threads parser → model_config → validated
        STTODEConfig (and defaults to xla when absent)."""
        from sttode_tpu.cli.common import base_parser, model_config
        p = base_parser("t")
        cfg = model_config(p.parse_args(
            ["--dataset", "nba", "--select_impl", "auto"]))
        assert cfg.select_impl == "auto"
        cfg = model_config(p.parse_args(
            ["--dataset", "nba", "--select_impl", "fused"]))
        assert cfg.select_impl == "fused"
        cfg = model_config(p.parse_args(["--dataset", "eth"]))
        assert cfg.select_impl == "xla"
