"""L3 solver tests: closed-form problems + torchdiffeq grid semantics
(SURVEY.md §4c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sttode_tpu.ode import odeint, odeint_adjoint


def exp_decay(t, y, k):
    return -k * y


class TestFixedGrid:
    def test_euler_one_step_quirk_q1(self):
        """ts=[0,12] + euler == exactly one step y + 12·f(0,y)
        (torchdiffeq grid-as-ts rule; reference ode_demo.py:165,186-190)."""
        y0 = jnp.array([1.0, 2.0])
        k = jnp.float32(0.1)
        ys = odeint(exp_decay, y0, jnp.array([0.0, 12.0]), k, method="euler")
        expect = y0 + 12.0 * (-k * y0)
        np.testing.assert_allclose(np.asarray(ys[1]), np.asarray(expect),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(ys[0]), np.asarray(y0))

    @pytest.mark.parametrize("method,tol", [("euler", 2e-2), ("midpoint", 1e-4),
                                            ("rk4", 1e-6)])
    def test_exp_decay_convergence(self, method, tol):
        y0 = jnp.array([1.0])
        ts = jnp.linspace(0.0, 1.0, 101)
        ys = odeint(exp_decay, y0, ts, jnp.float32(1.0), method=method)
        expect = np.exp(-np.asarray(ts))
        np.testing.assert_allclose(np.asarray(ys[:, 0]), expect, atol=tol)

    def test_pytree_state(self):
        y0 = {"a": jnp.ones((2, 3)), "b": jnp.zeros((4,))}

        def f(t, y):
            return {"a": -y["a"], "b": jnp.ones_like(y["b"])}

        ys = odeint(f, y0, jnp.linspace(0, 1, 51), method="rk4")
        np.testing.assert_allclose(np.asarray(ys["a"][-1]),
                                   np.exp(-1.0) * np.ones((2, 3)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ys["b"][-1]), np.ones(4),
                                   atol=1e-5)

    def test_jit_and_grad(self):
        ts = jnp.linspace(0.0, 1.0, 21)

        @jax.jit
        def loss(k):
            ys = odeint(exp_decay, jnp.array([1.0]), ts, k, method="rk4")
            return ys[-1, 0]

        g = jax.grad(loss)(jnp.float32(1.0))
        # d/dk exp(-k) at k=1 = -exp(-1)
        np.testing.assert_allclose(float(g), -np.exp(-1.0), atol=1e-4)

    def test_checkpoint_matches_plain(self):
        ts = jnp.linspace(0.0, 1.0, 21)

        def loss(k, ckpt):
            ys = odeint(exp_decay, jnp.array([1.0]), ts, k, method="rk4",
                        checkpoint=ckpt)
            return ys[-1, 0]

        g_plain = jax.grad(loss)(jnp.float32(1.0), False)
        g_ckpt = jax.grad(loss)(jnp.float32(1.0), True)
        np.testing.assert_allclose(float(g_plain), float(g_ckpt), atol=1e-6)


class TestDopri5:
    def test_exp_decay(self):
        y0 = jnp.array([1.0])
        ts = jnp.array([0.0, 0.5, 1.0, 2.0])
        ys = odeint(exp_decay, y0, ts, jnp.float32(1.0), method="dopri5",
                    rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(ys[:, 0]),
                                   np.exp(-np.asarray(ts)), atol=1e-5)

    def test_harmonic_oscillator(self):
        def f(t, y):
            return jnp.stack([y[1], -y[0]])

        ts = jnp.linspace(0.0, 2 * np.pi, 5)
        ys = odeint(f, jnp.array([1.0, 0.0]), ts, method="dopri5", rtol=1e-6,
                    atol=1e-8)
        np.testing.assert_allclose(np.asarray(ys[:, 0]),
                                   np.cos(np.asarray(ts)), atol=1e-4)

    def test_backward_time(self):
        y0 = jnp.array([1.0])
        ys = odeint(exp_decay, y0, jnp.array([1.0, 0.0]), jnp.float32(1.0),
                    method="dopri5", rtol=1e-6, atol=1e-8)
        # y(0) from y(1)=1 under dy=-y: y(0) = e^1
        np.testing.assert_allclose(float(ys[1, 0]), np.e, rtol=1e-4)

    def test_stiffish_matches_rk4_fine(self):
        def f(t, y):
            return -50.0 * (y - jnp.cos(t))

        ts = jnp.array([0.0, 1.0])
        y_ad = odeint(f, jnp.array([0.0]), ts, method="dopri5", rtol=1e-7,
                      atol=1e-9)
        y_rk = odeint(f, jnp.array([0.0]), jnp.linspace(0, 1, 2001),
                      method="rk4")
        np.testing.assert_allclose(float(y_ad[1, 0]), float(y_rk[-1, 0]),
                                   atol=1e-4)


class TestAdjoint:
    def test_grad_matches_analytic(self):
        ts = jnp.array([0.0, 1.0])

        def loss(k):
            ys = odeint_adjoint(exp_decay, jnp.array([1.0]), ts, k,
                                method="dopri5", rtol=1e-7, atol=1e-9)
            return ys[-1, 0]

        g = jax.grad(loss)(jnp.float32(1.0))
        np.testing.assert_allclose(float(g), -np.exp(-1.0), atol=1e-4)

    def test_grad_wrt_y0(self):
        ts = jnp.array([0.0, 1.0])

        def loss(y0):
            ys = odeint_adjoint(exp_decay, y0, ts, jnp.float32(1.0),
                                method="dopri5", rtol=1e-7, atol=1e-9)
            return ys[-1, 0]

        g = jax.grad(loss)(jnp.array([1.0]))
        # d y(1) / d y0 = exp(-1)
        np.testing.assert_allclose(float(g[0]), np.exp(-1.0), atol=1e-4)

    def test_multi_output_times(self):
        ts = jnp.array([0.0, 0.5, 1.0])

        def loss(k):
            ys = odeint_adjoint(exp_decay, jnp.array([1.0]), ts, k,
                                method="dopri5", rtol=1e-7, atol=1e-9)
            return jnp.sum(ys[1:, 0])

        g = jax.grad(loss)(jnp.float32(1.0))
        expect = -0.5 * np.exp(-0.5) - 1.0 * np.exp(-1.0)
        np.testing.assert_allclose(float(g), expect, atol=1e-4)

    def test_param_pytree_grad(self):
        ts = jnp.array([0.0, 1.0])
        params = {"w": jnp.float32(0.5), "b": jnp.float32(0.2)}

        def f(t, y, p):
            return -(p["w"] + p["b"]) * y

        def loss(p):
            ys = odeint_adjoint(f, jnp.array([1.0]), ts, p, method="dopri5",
                                rtol=1e-7, atol=1e-9)
            return ys[-1, 0]

        g = jax.grad(loss)(params)
        expect = -np.exp(-0.7)
        np.testing.assert_allclose(float(g["w"]), expect, atol=1e-4)
        np.testing.assert_allclose(float(g["b"]), expect, atol=1e-4)

    def test_adjoint_rk4_matches_direct(self):
        ts = jnp.linspace(0.0, 1.0, 41)

        def loss_adj(k):
            ys = odeint_adjoint(exp_decay, jnp.array([1.0]), ts, k,
                                method="rk4")
            return ys[-1, 0]

        def loss_dir(k):
            ys = odeint(exp_decay, jnp.array([1.0]), ts, k, method="rk4")
            return ys[-1, 0]

        g_adj = jax.grad(loss_adj)(jnp.float32(1.0))
        g_dir = jax.grad(loss_dir)(jnp.float32(1.0))
        np.testing.assert_allclose(float(g_adj), float(g_dir), atol=1e-3)


class TestSolverStats:
    """odeint(return_stats=True) — the accounting behind BENCHMARKS.md's
    dopri5 row (round-3 VERDICT item 6): jit-safe counters of attempted/
    accepted adaptive steps and RHS evaluations."""

    def test_dopri5_counts_scale_with_tolerance(self):
        f = lambda t, y: -y
        ts = jnp.array([0.0, 5.0])
        ys_t, st_t = jax.jit(lambda y: odeint(
            f, y, ts, method="dopri5", rtol=1e-7, atol=1e-9,
            return_stats=True))(jnp.ones(()))
        ys_l, st_l = jax.jit(lambda y: odeint(
            f, y, ts, method="dopri5", rtol=1e-3, atol=1e-6,
            return_stats=True))(jnp.ones(()))
        att_t, att_l = int(st_t["attempted_steps"]), int(st_l["attempted_steps"])
        assert att_t > att_l >= 1
        assert int(st_t["accepted_steps"]) <= att_t
        # 1 initial k1 + 1 starting-step probe per interval + 6 per attempt
        assert int(st_t["rhs_evals"]) == 2 + 6 * att_t
        # stats path returns the same solution as the plain path
        ys_plain = odeint(f, jnp.ones(()), ts, method="dopri5",
                          rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ys_t), np.asarray(ys_plain),
                                   rtol=1e-7)
        np.testing.assert_allclose(float(ys_t[-1]), np.exp(-5.0), atol=1e-6)

    def test_fixed_grid_counts_are_static(self):
        f = lambda t, y: -y
        _, st = odeint(f, jnp.ones(()), jnp.linspace(0.0, 5.0, 9),
                       method="rk4", return_stats=True)
        assert int(st["rhs_evals"]) == 4 * 8
        assert int(st["accepted_steps"]) == 8


class TestMatmulPrecision:
    """Adaptive solves pin RHS matmuls to fp32 by default (solvers.py module
    note): TPU's ambient bf16 truncation noise-floors the embedded-pair error
    estimate, measured to inflate the step count ~110x at torchdiffeq default
    tolerances (7,762 accepted steps / 997 ms vs 71 / 11.9 ms on v5e)."""

    @staticmethod
    def _rhs_with_matmul():
        w = jnp.eye(4) * -0.5
        return lambda t, y, p: y @ p, w

    def test_dopri5_pins_fp32_by_default(self):
        f, w = self._rhs_with_matmul()
        jx = str(jax.make_jaxpr(lambda y: odeint(
            f, y, jnp.array([0.0, 1.0]), w, method="dopri5"))(jnp.ones((2, 4))))
        # "float32" lowers to Precision.HIGHEST on every dot in the solve
        assert "Precision.HIGHEST" in jx
        assert "precision=None" not in jx

    def test_inherit_opts_out(self):
        f, w = self._rhs_with_matmul()
        jx = str(jax.make_jaxpr(lambda y: odeint(
            f, y, jnp.array([0.0, 1.0]), w, method="dopri5",
            matmul_precision="inherit"))(jnp.ones((2, 4))))
        assert "Precision.HIGHEST" not in jx

    def test_fixed_grid_inherits_by_default(self):
        f, w = self._rhs_with_matmul()
        jx = str(jax.make_jaxpr(lambda y: odeint(
            f, y, jnp.array([0.0, 1.0]), w, method="rk4"))(jnp.ones((2, 4))))
        assert "Precision.HIGHEST" not in jx
        # ...but accepts an explicit pin
        jx = str(jax.make_jaxpr(lambda y: odeint(
            f, y, jnp.array([0.0, 1.0]), w, method="rk4",
            matmul_precision="float32"))(jnp.ones((2, 4))))
        assert "Precision.HIGHEST" in jx

    def test_adjoint_backward_pins_fp32(self):
        f, w = self._rhs_with_matmul()

        def loss(y):
            ys = odeint_adjoint(f, y, jnp.array([0.0, 1.0]), w,
                                method="dopri5")
            return jnp.sum(ys[-1] ** 2)

        jx = str(jax.make_jaxpr(jax.grad(loss))(jnp.ones((2, 4))))
        assert "Precision.HIGHEST" in jx


class TestScanBudgetDopri5:
    """dopri5 with scan_budget: same PI control law as the while_loop form,
    static trip count, directly reverse-differentiable (the while form is
    not — see _dopri5_interval_scan)."""

    def test_matches_while_loop(self):
        f = lambda t, y: jnp.sin(t) * y
        y0 = jnp.arange(1.0, 4.0)
        ts = jnp.array([0.0, 3.0, 5.0])
        ys_w, st_w = odeint(f, y0, ts, method="dopri5", rtol=1e-6, atol=1e-8,
                            return_stats=True)
        ys_s, st_s = odeint(f, y0, ts, method="dopri5", rtol=1e-6, atol=1e-8,
                            scan_budget=64, return_stats=True)
        np.testing.assert_allclose(np.asarray(ys_s), np.asarray(ys_w),
                                   rtol=1e-6, atol=1e-7)
        # identical control decisions -> identical step counts
        assert int(st_s["attempted_steps"]) == int(st_w["attempted_steps"])
        assert int(st_s["accepted_steps"]) == int(st_w["accepted_steps"])
        assert not bool(st_s["budget_exhausted"])
        assert not bool(st_w["budget_exhausted"])

    def test_budget_exhaustion_is_flagged(self):
        f = lambda t, y: -y
        ys, st = odeint(f, jnp.ones(()), jnp.array([0.0, 5.0]),
                        method="dopri5", rtol=1e-7, atol=1e-9, scan_budget=3,
                        return_stats=True)
        assert bool(st["budget_exhausted"])

    def test_direct_grads_through_scan(self):
        """The while_loop form is NOT reverse-differentiable (jax forbids
        reverse-mode through while_loop; the adjoint exists for that). The
        scan form IS — direct discrete-adjoint autodiff through adaptive
        dopri5 is new capability; checked against the continuous adjoint of
        the while form and the analytic gradient d(e^{-2a})/da."""
        f = lambda t, y, a: -a * y
        a = jnp.float32(0.7)

        def loss_scan(a):
            ys = odeint(f, jnp.ones(()), jnp.array([0.0, 2.0]), a,
                        method="dopri5", rtol=1e-6, atol=1e-8, scan_budget=64)
            return ys[-1]

        def loss_adj(a):
            ys = odeint_adjoint(f, jnp.ones(()), jnp.array([0.0, 2.0]), a,
                                method="dopri5", rtol=1e-6, atol=1e-8)
            return ys[-1]

        gs = float(jax.grad(loss_scan)(a))
        ga = float(jax.grad(loss_adj)(a))
        analytic = float(-2.0 * np.exp(-2.0 * 0.7))
        np.testing.assert_allclose(gs, analytic, rtol=1e-4)
        np.testing.assert_allclose(gs, ga, rtol=1e-3)

    def test_adjoint_scan_budget(self):
        f = lambda t, y, a: -a * y
        a = jnp.float32(0.7)

        def loss(a):
            ys = odeint_adjoint(f, jnp.ones(()), jnp.array([0.0, 2.0]), a,
                                method="dopri5", rtol=1e-6, atol=1e-8,
                                scan_budget=64)
            return ys[-1]

        def loss_direct(a):
            ys = odeint(f, jnp.ones(()), jnp.array([0.0, 2.0]), a,
                        method="dopri5", rtol=1e-6, atol=1e-8, scan_budget=64)
            return ys[-1]

        np.testing.assert_allclose(float(jax.grad(loss)(a)),
                                   float(jax.grad(loss_direct)(a)), rtol=1e-3)

    def test_model_config_plumbs_budget(self, rng):
        """cfg.ode_scan_budget reaches the solver through the encoder trunk:
        a dopri5 model with a sufficient budget must match the while_loop
        form exactly."""
        from sttode_tpu.models import Batch, STTODEConfig, sttode_forward, \
            sttode_init

        base = dict(hidden_dim=16, zdim=8, num_heads=4, ff_dim=32,
                    sample_k=2, ode_method="dopri5", ode_rtol=1e-3,
                    ode_atol=1e-6)
        cfg_w = STTODEConfig(**base).validate()
        cfg_s = STTODEConfig(**base, ode_scan_budget=32).validate()
        M = 4
        past = jnp.asarray(rng.standard_normal((M, 8, 2)), jnp.float32)
        fut = jnp.asarray(rng.standard_normal((M, 12, 2)), jnp.float32)
        pv = jnp.diff(past, axis=1, prepend=past[:, :1])
        fv = jnp.diff(jnp.concatenate([past[:, -1:], fut], 1), axis=1)
        b = Batch(past=past, past_vel=pv, future=fut, future_vel=fv,
                  valid=jnp.ones((M,), jnp.float32), batch_size=2,
                  agent_num=2)
        params = sttode_init(jax.random.PRNGKey(0), cfg_w)
        key = jax.random.PRNGKey(1)
        lw = float(sttode_forward(params, cfg_w, b, key).total_loss)
        ls = float(sttode_forward(params, cfg_s, b, key).total_loss)
        np.testing.assert_allclose(ls, lw, rtol=1e-6)


class TestCallbackGating:
    """Round-5 regression: the dopri5 exhaustion warning is a host callback,
    and callback-less PJRT backends (the axon TPU tunnel) reject those at
    COMPILE time — with the warning present unconditionally, every dopri5
    program failed to compile on the target hardware (caught by the bench
    sidecar)."""

    def test_axon_detection_drops_callback_from_program(self, monkeypatch):
        import jax
        import jax.numpy as jnp

        from sttode_tpu.ode import solvers

        def lowered_has_callback(expect: bool):
            f = lambda y0: solvers.odeint(lambda t, y: -y, y0,
                                          jnp.array([0.0, 1.0]),
                                          method="dopri5")
            text = jax.jit(f).lower(jnp.ones(3)).as_text()
            has = "callback" in text or "custom_call" in text.lower()
            return has == expect

        # pretend the backend is the axon tunnel: no callback may lower
        monkeypatch.setattr(solvers, "_HOST_CALLBACKS_OK", False)
        assert lowered_has_callback(False), \
            "axon-gated program still lowers a host callback"
        # cpu backend: the warning callback IS in the program
        monkeypatch.setattr(solvers, "_HOST_CALLBACKS_OK", True)
        assert lowered_has_callback(True), \
            "warning callback missing on a callback-capable backend"

    def test_detection_reads_platform_version(self, monkeypatch):
        from sttode_tpu.ode import solvers

        monkeypatch.setattr(solvers, "_HOST_CALLBACKS_OK", None)

        class FakeBackend:
            platform_version = "PJRT C API\naxon 0.1.0; whatever"

        import jax._src.xla_bridge as xb
        monkeypatch.setattr(xb, "get_backend", lambda: FakeBackend())
        assert solvers._host_callbacks_supported() is False
        monkeypatch.setattr(solvers, "_HOST_CALLBACKS_OK", None)
        FakeBackend.platform_version = "TFRT TPU v5"
        assert solvers._host_callbacks_supported() is True
        # restore the cached probe for other tests in this process
        monkeypatch.setattr(solvers, "_HOST_CALLBACKS_OK", None)
