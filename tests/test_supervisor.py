"""Fault-tolerant supervisor: divergence detection, rollback, abort."""

import numpy as np
import jax.numpy as jnp
import optax
import pytest

from sttode_tpu.models import STTODEConfig
from sttode_tpu.train.supervisor import Supervisor


@pytest.fixture
def state():
    params = {"w": jnp.ones((4, 4))}
    opt_state = optax.adam(1e-3).init(params)
    return params, opt_state


class TestSupervisor:
    def test_healthy_progression_checkpoints(self, tmp_path, state):
        params, opt_state = state
        sup = Supervisor(str(tmp_path), STTODEConfig(), save_every=2)
        for epoch in range(4):
            p, o, e, action = sup.after_epoch(epoch, 1.0 - 0.1 * epoch,
                                              params, opt_state)
            assert action == "ok"
        assert sup._last_good is not None

    def test_nan_triggers_rollback(self, tmp_path, state):
        params, opt_state = state
        sup = Supervisor(str(tmp_path), STTODEConfig(), save_every=1)
        sup.after_epoch(0, 1.0, params, opt_state)          # good + ckpt
        mutated = {"w": params["w"] * 999}
        p, o, e, action = sup.after_epoch(1, float("nan"), mutated, opt_state)
        assert action == "rollback"
        assert e == 1  # restored checkpoint epoch
        np.testing.assert_array_equal(np.asarray(p["w"]),
                                      np.asarray(params["w"]))
        assert sup.lr_scale == 0.5

    def test_explosion_detection(self, tmp_path, state):
        params, opt_state = state
        sup = Supervisor(str(tmp_path), STTODEConfig(), save_every=1,
                         explosion_factor=10.0)
        for epoch in range(3):
            sup.after_epoch(epoch, 1.0, params, opt_state)
        assert not sup.healthy(100.0)
        assert sup.healthy(5.0)

    def test_abort_without_checkpoint(self, tmp_path, state):
        params, opt_state = state
        sup = Supervisor(str(tmp_path), STTODEConfig())
        _, _, _, action = sup.after_epoch(0, float("inf"), params, opt_state)
        assert action == "abort"

    def test_rollback_budget(self, tmp_path, state):
        params, opt_state = state
        sup = Supervisor(str(tmp_path), STTODEConfig(), save_every=1,
                         max_rollbacks=1)
        sup.after_epoch(0, 1.0, params, opt_state)
        _, _, _, a1 = sup.after_epoch(1, float("nan"), params, opt_state)
        _, _, _, a2 = sup.after_epoch(1, float("nan"), params, opt_state)
        assert a1 == "rollback" and a2 == "abort"


class TestSupervisorNegativeBaseline:
    def test_explosion_armed_for_nonpositive_losses(self, tmp_path, state):
        """A ratio test silently disables when the running median is <= 0;
        the additive-scale threshold stays armed (review fix)."""
        from sttode_tpu.models import STTODEConfig

        params, opt_state = state
        sup = Supervisor(str(tmp_path), STTODEConfig(), save_every=1,
                         explosion_factor=10.0)
        for e in range(3):
            sup.after_epoch(e, -2.0, params, opt_state)
        assert not sup.healthy(1e6)
        assert sup.healthy(-1.5)
        assert sup.healthy(4.0)   # within baseline + 9*max(|b|,1) = 16
