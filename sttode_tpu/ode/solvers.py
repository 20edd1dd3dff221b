"""XLA-native ODE solvers over pytree states.

API shape follows torchdiffeq (``func(t, y, *args) -> dy/dt``; returns solution
stacked over a leading time axis, ``ys[0] == y0``) because that is the contract
the reference's ODE transformer blocks are written against
(reference ode_demo.py:163-167,186-190). Semantics of the fixed-grid methods
reproduce torchdiffeq's "the supplied ``ts`` IS the integration grid" rule, so
``odeint(f, y0, [0., 12.], method='euler')`` takes exactly one Euler step
(reference quirk Q1, SURVEY.md §2.5).

All solvers are jit/vmap/pjit-compatible: fixed-grid methods lower to
``lax.scan``; dopri5 lowers to ``lax.while_loop`` per output interval with a
PI step controller; nothing branches on traced values in Python.

``odeint_adjoint`` provides O(1)-memory gradients via the continuous adjoint
(backward-in-time augmented system, the standard Pontryagin construction) — the
capability torchdiffeq's ``adjoint`` flag promises at ode_demo.py:7-11. For the
direct path, ``checkpoint=True`` wraps each step in ``jax.checkpoint`` to trade
recompute for memory through long scans.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

Pytree = Any

_FIXED_METHODS = ("euler", "midpoint", "rk4")
_ADAPTIVE_METHODS = ("dopri5",)

_HOST_CALLBACKS_OK: bool | None = None


def _host_callbacks_supported() -> bool:
    """Some PJRT backends — the axon TPU tunnel this framework benches on —
    reject host send/recv callbacks at COMPILE time, so a ``jax.debug.print``
    anywhere in the graph makes the whole solve un-compilable on exactly the
    target hardware (caught by the round-5 bench sidecar: every dopri5
    program failed with UNIMPLEMENTED). The platform name aliases to plain
    'tpu', so detection reads the backend's platform_version string; cached
    per process (the backend cannot change under a running process)."""
    global _HOST_CALLBACKS_OK
    if _HOST_CALLBACKS_OK is None:
        try:
            import jax._src.xla_bridge as xb
            ver = getattr(xb.get_backend(), "platform_version", "")
            _HOST_CALLBACKS_OK = "axon" not in ver
        except Exception:  # unknown bridge layout → assume supported
            _HOST_CALLBACKS_OK = True
    return _HOST_CALLBACKS_OK

# Adaptive solves pin RHS matmuls to fp32 by default. On TPU the ambient
# matmul precision truncates operands to bf16, which puts an ~2^-8-relative
# NOISE FLOOR under the embedded-pair error estimate; at tolerances below
# that floor the PI controller shrinks h against noise that does not shrink
# with h, inflating the step count ~110x. Measured on-chip (round-4, the
# flagship encoder RHS, rtol=1e-7/atol=1e-9, scripts/dopri5_accounting.py):
# ambient-bf16 7,762 accepted steps / 46,748 RHS evals / 997 ms per solve;
# fp32-pinned 71 steps / 428 evals / 11.9 ms device-side (~x81) at a
# near-identical ~21 -> 27.8 µs/RHS — the win is doing 109x fewer evals.
# Fixed-grid methods are left on the ambient precision: their step count is
# static so there is nothing for noise to inflate, and the flagship
# euler/rk4 training numerics are ledger-locked (CONVERGENCE.md).
_ADAPTIVE_DEFAULT_PRECISION = "float32"


def _precision_scope(matmul_precision, method):
    """Trace-time matmul-precision scope for a solve (see the note above)."""
    if matmul_precision is None:
        matmul_precision = (_ADAPTIVE_DEFAULT_PRECISION
                            if method in _ADAPTIVE_METHODS else "inherit")
    if matmul_precision == "inherit":
        return contextlib.nullcontext()
    return jax.default_matmul_precision(matmul_precision)


# --------------------------------------------------------------------------- #
# pytree helpers                                                              #
# --------------------------------------------------------------------------- #

def _tree_add(*trees):
    return jax.tree_util.tree_map(lambda *xs: sum(xs), *trees)


def _tree_scale(a, tree):
    return jax.tree_util.tree_map(lambda x: a * x, tree)


def _tree_axpy(a, x, y):
    """y + a*x elementwise over the tree."""
    return jax.tree_util.tree_map(lambda xi, yi: yi + a * xi, x, y)


def _error_ratio(err, y0, y1, rtol, atol):
    """RMS of err / (atol + rtol·max(|y0|,|y1|)) over every element of the tree."""
    total = jnp.float32(0.0)
    count = 0
    for e, a, b in zip(jax.tree_util.tree_leaves(err),
                       jax.tree_util.tree_leaves(y0),
                       jax.tree_util.tree_leaves(y1)):
        tol = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))
        r = (e / tol).astype(jnp.float32)
        total = total + jnp.sum(r * r)
        count += r.size
    # the 1e-30 keeps sqrt's derivative finite at err == 0 — required for
    # direct reverse-mode through the scan-budget controller (a dead
    # jnp.where branch with d sqrt(0) = inf would NaN the whole gradient)
    return jnp.sqrt(total / count + 1e-30)


# --------------------------------------------------------------------------- #
# fixed-grid steppers                                                         #
# --------------------------------------------------------------------------- #

def _euler_step(func, t0, dt, y0, args):
    return _tree_axpy(dt, func(t0, y0, *args), y0)


def _midpoint_step(func, t0, dt, y0, args):
    k1 = func(t0, y0, *args)
    y_mid = _tree_axpy(dt / 2, k1, y0)
    k2 = func(t0 + dt / 2, y_mid, *args)
    return _tree_axpy(dt, k2, y0)


def _rk4_step(func, t0, dt, y0, args):
    k1 = func(t0, y0, *args)
    k2 = func(t0 + dt / 2, _tree_axpy(dt / 2, k1, y0), *args)
    k3 = func(t0 + dt / 2, _tree_axpy(dt / 2, k2, y0), *args)
    k4 = func(t0 + dt, _tree_axpy(dt, k3, y0), *args)
    incr = _tree_add(k1, _tree_scale(2.0, k2), _tree_scale(2.0, k3), k4)
    return _tree_axpy(dt / 6, incr, y0)


_STEPPERS = {"euler": _euler_step, "midpoint": _midpoint_step, "rk4": _rk4_step}


def _fixed_odeint(func, y0, ts, args, method, checkpoint):
    stepper = _STEPPERS[method]

    def step(y, t_pair):
        t0, t1 = t_pair
        y1 = stepper(func, t0, t1 - t0, y, args)
        return y1, y1

    if checkpoint:
        step = jax.checkpoint(step)

    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=-1)
    _, ys_tail = jax.lax.scan(step, y0, t_pairs)
    y0_expanded = jax.tree_util.tree_map(lambda x: x[None], y0)
    return jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0), y0_expanded, ys_tail)


# --------------------------------------------------------------------------- #
# dopri5 (Dormand–Prince RK45, FSAL, PI controller)                           #
# --------------------------------------------------------------------------- #

_DOPRI_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DOPRI_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DOPRI_B = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DOPRI_E = (71 / 57600, 0.0, -71 / 16695, 71 / 1920, -17253 / 339200, 22 / 525,
            -1 / 40)

_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 10.0
_ORDER = 5.0


def _dopri5_single_step(func, t0, h, y0, k1, args):
    """One RK45 step. Returns (y5, err_tree, k7) where k7 is FSAL f(t0+h, y5)."""
    ks = [k1]
    for stage in range(1, 7):
        y_stage = y0
        for a_coef, k in zip(_DOPRI_A[stage], ks):
            y_stage = _tree_axpy(h * a_coef, k, y_stage)
        ks.append(func(t0 + _DOPRI_C[stage] * h, y_stage, *args))
    # 5th-order solution is the stage-7 state (A row 7 == B), so ks[6] is FSAL.
    y5 = y0
    for b_coef, k in zip(_DOPRI_B, ks):
        y5 = _tree_axpy(h * b_coef, k, y5)
    err = None
    for e_coef, k in zip(_DOPRI_E, ks):
        err = _tree_scale(h * e_coef, k) if err is None else _tree_axpy(
            h * e_coef, k, err)
    return y5, err, ks[6]


def _rms(tree, y_ref, rtol, atol):
    total = jnp.float32(0.0)
    count = 0
    for x, yr in zip(jax.tree_util.tree_leaves(tree),
                     jax.tree_util.tree_leaves(y_ref)):
        scale = atol + rtol * jnp.abs(yr)
        r = (x / scale).astype(jnp.float32)
        total = total + jnp.sum(r * r)
        count += r.size
    # the 1e-30 keeps sqrt's derivative finite at total == 0 (same guard as
    # _error_ratio): _initial_step is on the differentiated path of the
    # direct reverse-mode scan-budget solver, and a constant vector field
    # makes diff == 0 exactly — 0·inf in the dead where-branch poisons every
    # parameter gradient of the solve otherwise
    return jnp.sqrt(total / count + 1e-30)


def _initial_step(func, t0, y0, f0, direction, rtol, atol, args):
    """Hairer/Nørsett/Wanner starting-step-size algorithm (Solving ODEs I,
    §II.4): probe the local Lipschitz scale with one extra RHS evaluation
    instead of guessing a fraction of the span."""
    d0 = _rms(y0, y0, rtol, atol)
    d1 = _rms(f0, y0, rtol, atol)
    h0 = jnp.where(jnp.minimum(d0, d1) < 1e-5, 1e-6, 0.01 * d0 / (d1 + 1e-30))
    y1 = _tree_axpy(h0 * direction, f0, y0)
    f1 = func(t0 + h0 * direction, y1, *args)
    diff = jax.tree_util.tree_map(lambda a, b: a - b, f1, f0)
    d2 = _rms(diff, y0, rtol, atol) / h0
    dm = jnp.maximum(d1, d2)
    # dm enters the power on BOTH where-branches during autodiff; floor it so
    # the dead branch's 1/dm stays finite (0·inf = NaN otherwise)
    h1 = jnp.where(dm <= 1e-15,
                   jnp.maximum(1e-6, h0 * 1e-3),
                   (0.01 / jnp.maximum(dm, 1e-15)) ** (1.0 / _ORDER))
    return jnp.minimum(100.0 * h0, h1)


def _dopri5_interval(func, y0, k1_0, t0, t1, rtol, atol, args, max_steps):
    """Adaptively integrate one output interval [t0, t1]. Supports either time
    direction. Returns (y(t1), k1 at t1 for FSAL reuse, (attempted, accepted)
    step counters — the accounting behind BENCHMARKS.md's dopri5 row)."""
    direction = jnp.sign(t1 - t0)
    span = jnp.abs(t1 - t0)
    h0 = jnp.minimum(
        _initial_step(func, t0, y0, k1_0, direction, rtol, atol, args), span)

    def cond(state):
        t, _, _, h, n, _ = state
        # 1e-6 relative keeps the loop terminating under float32 time arithmetic
        return jnp.logical_and(jnp.abs(t1 - t) > 1e-6 * jnp.maximum(
            jnp.abs(t1), 1.0), n < max_steps)

    def body(state):
        t, y, k1, h, n, n_acc = state
        h_clip = jnp.minimum(h, jnp.abs(t1 - t)) * direction
        y_new, err, k7 = _dopri5_single_step(func, t, h_clip, y, k1, args)
        ratio = _error_ratio(err, y, y_new, rtol, atol)
        accept = ratio <= 1.0
        factor = jnp.clip(
            _SAFETY * jnp.power(jnp.maximum(ratio, 1e-10), -1.0 / _ORDER),
            _MIN_FACTOR, _MAX_FACTOR)
        h_next = jnp.abs(h_clip) * factor
        t_next = jnp.where(accept, t + h_clip, t)
        y_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), y, y_new)
        k1_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), k1, k7)
        return (t_next, y_next, k1_next, h_next, n + 1,
                n_acc + accept.astype(jnp.int32))

    state0 = (t0, y0, k1_0, h0, jnp.asarray(0, jnp.int32),
              jnp.asarray(0, jnp.int32))
    t_f, y_final, k1_final, _, n, n_acc = jax.lax.while_loop(cond, body,
                                                             state0)
    done = jnp.abs(t1 - t_f) <= 1e-6 * jnp.maximum(jnp.abs(t1), 1.0)
    return y_final, k1_final, (n, n_acc, done)


def _dopri5_interval_scan(func, y0, k1_0, t0, t1, rtol, atol, args, budget):
    """Fixed-trip-count variant of ``_dopri5_interval``: a ``lax.scan`` over
    exactly ``budget`` RK45 attempts with masked (no-op) updates once the
    interval is done. Identical control law — same PI factors, same
    accept/reject — so accepted trajectories match the while_loop bit-for-bit;
    only the iteration COUNT is static.

    Why it exists: (a) direct reverse-mode autodiff — ``lax.while_loop`` is
    not reverse-differentiable, so this form is the only way to backprop
    through adaptive dopri5 without the continuous adjoint; (b) a static
    trip count, which some callers need for shape-stable pipelining. It
    pays ``budget − steps_needed`` wasted attempts for that. (An earlier
    round attributed the 968 ms/solve dopri5 row to while_loop overhead
    and pointed here for speed; the on-chip accounting disproved that —
    the cost was bf16-noise step-count inflation, fixed by the fp32
    matmul-precision pin above, and the while form's per-RHS cost matches
    the scan's.) If the budget is exhausted before t1 the state simply
    stops advancing — check ``stats["budget_exhausted"]``
    (``odeint(..., return_stats=True)``)."""
    direction = jnp.sign(t1 - t0)
    span = jnp.abs(t1 - t0)
    h0 = jnp.minimum(
        _initial_step(func, t0, y0, k1_0, direction, rtol, atol, args), span)

    def body(state, _):
        t, y, k1, h, n, n_acc = state
        active = jnp.abs(t1 - t) > 1e-6 * jnp.maximum(jnp.abs(t1), 1.0)
        # double-where: once done, |t1-t| → 0 would drive h_clip → 0 and the
        # dead branch's error ratio to sqrt(0) — feed a safe nonzero h to the
        # (discarded) step instead so reverse-mode stays NaN-free
        h_clip = jnp.where(active,
                           jnp.minimum(h, jnp.abs(t1 - t)), 1.0) * direction
        y_new, err, k7 = _dopri5_single_step(func, t, h_clip, y, k1, args)
        ratio = _error_ratio(err, y, y_new, rtol, atol)
        accept = jnp.logical_and(ratio <= 1.0, active)
        factor = jnp.clip(
            _SAFETY * jnp.power(jnp.maximum(ratio, 1e-10), -1.0 / _ORDER),
            _MIN_FACTOR, _MAX_FACTOR)
        t_next = jnp.where(accept, t + h_clip, t)
        h_next = jnp.where(active, jnp.abs(h_clip) * factor, h)
        y_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), y, y_new)
        k1_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), k1, k7)
        return (t_next, y_next, k1_next, h_next,
                n + active.astype(jnp.int32),
                n_acc + accept.astype(jnp.int32)), None

    state0 = (t0, y0, k1_0, h0, jnp.asarray(0, jnp.int32),
              jnp.asarray(0, jnp.int32))
    (t_f, y_final, k1_final, _, n, n_acc), _ = jax.lax.scan(
        body, state0, None, length=budget)
    done = jnp.abs(t1 - t_f) <= 1e-6 * jnp.maximum(jnp.abs(t1), 1.0)
    return y_final, k1_final, (n, n_acc, done)


def _dopri5_odeint(func, y0, ts, args, rtol, atol, max_steps,
                   return_stats=False, scan_budget=None):
    k1_init = func(ts[0], y0, *args)

    def seg(carry, t_pair):
        y, k1 = carry
        t0, t1 = t_pair
        if scan_budget is not None:
            y1, k1_out, stats = _dopri5_interval_scan(
                func, y, k1, t0, t1, rtol, atol, args, scan_budget)
        else:
            y1, k1_out, stats = _dopri5_interval(func, y, k1, t0, t1, rtol,
                                                 atol, args, max_steps)
        return (y1, k1_out), (y1, stats)

    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=-1)
    _, (ys_tail, (n_att, n_acc, done)) = jax.lax.scan(seg, (y0, k1_init),
                                                      t_pairs)
    y0_expanded = jax.tree_util.tree_map(lambda x: x[None], y0)
    ys = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0), y0_expanded, ys_tail)
    # exhaustion is otherwise SILENT (the state just stops advancing and the
    # caller trains on a mid-interval truncation): warn loudly from inside
    # the jitted program whether or not stats are requested — for BOTH the
    # scan-budget form and the while form's max_steps cap. On backends that
    # reject host callbacks (axon tunnel) the in-graph warning is dropped —
    # debug.print would fail the COMPILE of every dopri5 program there —
    # and ``return_stats``'s budget_exhausted flag is the signal instead.
    budget = scan_budget if scan_budget is not None else max_steps
    kind = "scan_budget" if scan_budget is not None else "max_steps"
    if _host_callbacks_supported():
        jax.lax.cond(
            jnp.logical_not(jnp.all(done)),
            lambda: jax.debug.print(
                "WARNING sttode_tpu.ode: dopri5 " + kind + "={b} exhausted "
                "before reaching an interval end — the returned trajectory "
                "(and any gradients through it) is truncated mid-interval; "
                "raise " + kind + " or loosen rtol/atol", b=budget),
            lambda: None)
    if not return_stats:
        return ys
    # RHS-eval count: 1 initial k1, and per interval 1 extra probe eval in
    # _initial_step + 6 evals per attempted RK45 step (FSAL reuses k7 as the
    # next k1 only on accept, but the stage loop always evaluates stages 2-7)
    n_intervals = ts.shape[0] - 1
    att = jnp.sum(n_att)
    # under scan_budget, every attempt in the budget evaluates all 6 stages
    # whether or not the interval is already done — that waste is the price
    # of the static trip count (see _dopri5_interval_scan)
    evals = (6 * scan_budget * n_intervals if scan_budget is not None
             else 6 * att)
    stats = {"attempted_steps": att,
             "accepted_steps": jnp.sum(n_acc),
             "rhs_evals": 1 + n_intervals + evals,
             # True ⇒ some interval did not reach t1 (step budget / max_steps
             # ran out before the controller closed the interval)
             "budget_exhausted": jnp.logical_not(jnp.all(done))}
    return ys, stats


# --------------------------------------------------------------------------- #
# public API                                                                  #
# --------------------------------------------------------------------------- #

def odeint(func: Callable, y0: Pytree, ts, *args, method: str = "euler",
           rtol: float = 1e-7, atol: float = 1e-9, max_steps: int = 10_000,
           checkpoint: bool = False, return_stats: bool = False,
           scan_budget: int | None = None,
           matmul_precision: str | None = None) -> Pytree:
    """Integrate ``dy/dt = func(t, y, *args)``, reporting y at each ``ts``.

    Fixed-grid methods (euler/midpoint/rk4) use ``ts`` itself as the step grid
    (torchdiffeq semantics — reference quirk Q1). ``dopri5`` adapts within each
    output interval. Gradients flow by direct autodiff through the solver
    (discrete adjoint); see :func:`odeint_adjoint` for the continuous adjoint.

    ``return_stats=True`` returns ``(ys, stats)`` with solver-work counters
    (device int32 scalars, jit-safe): attempted/accepted adaptive steps and
    total RHS evaluations. For fixed-grid methods the counts are static.

    ``scan_budget`` (dopri5 only): run the adaptive controller as a
    ``lax.scan`` over exactly this many RK45 attempts per output interval
    (masked no-ops once done) instead of a ``lax.while_loop``. Same control
    law, static trip count; unlike the while form it is directly
    reverse-differentiable. Budget it above the tolerance's step need
    (``return_stats`` reports ``budget_exhausted``).

    ``matmul_precision``: trace-time matmul precision for the whole solve
    (RHS included). ``None`` (default) pins adaptive methods to ``"float32"``
    — on TPU the ambient bf16 truncation noise-floors the error estimator
    and inflates the step count ~110x (measured ~x81 device-side at default
    tolerances; see the module note) — and leaves fixed-grid methods on the
    ambient precision. Pass a `jax.default_matmul_precision` string
    ("bfloat16"/"float32"/"highest") to force, or ``"inherit"`` to opt out.
    """
    ts = jnp.asarray(ts)
    if method in _FIXED_METHODS:
        with _precision_scope(matmul_precision, method):
            ys = _fixed_odeint(func, y0, ts, args, method, checkpoint)
        if not return_stats:
            return ys
        n = ts.shape[0] - 1
        evals = {"euler": 1, "midpoint": 2, "rk4": 4}[method] * n
        return ys, {"attempted_steps": jnp.asarray(n, jnp.int32),
                    "accepted_steps": jnp.asarray(n, jnp.int32),
                    "rhs_evals": jnp.asarray(evals, jnp.int32)}
    if method in _ADAPTIVE_METHODS:
        with _precision_scope(matmul_precision, method):
            return _dopri5_odeint(func, y0, ts, args, rtol, atol, max_steps,
                                  return_stats=return_stats,
                                  scan_budget=scan_budget)
    raise ValueError(
        f"unknown method {method!r}; expected one of "
        f"{_FIXED_METHODS + _ADAPTIVE_METHODS}")


def odeint_adjoint(func: Callable, y0: Pytree, ts, *args,
                   method: str = "dopri5", rtol: float = 1e-7,
                   atol: float = 1e-9, max_steps: int = 10_000,
                   scan_budget: int | None = None,
                   matmul_precision: str | None = None) -> Pytree:
    """Like :func:`odeint` but with O(1)-memory continuous-adjoint gradients.

    Differentiable in ``y0`` and ``*args`` (parameter pytrees); ``ts`` is
    treated as constant. The backward pass integrates the augmented system
    ``[y, a_y, a_args]`` backwards in time interval-by-interval with the same
    solver settings (including ``scan_budget`` and ``matmul_precision`` —
    see :func:`odeint`), accumulating output cotangents at each grid time.
    """
    ts = jnp.asarray(ts)
    return _odeint_adjoint_core(func, method, rtol, atol, max_steps,
                                scan_budget, matmul_precision, y0, ts, args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def _odeint_adjoint_core(func, method, rtol, atol, max_steps, scan_budget,
                         matmul_precision, y0, ts, args):
    return odeint(func, y0, ts, *args, method=method, rtol=rtol, atol=atol,
                  max_steps=max_steps, scan_budget=scan_budget,
                  matmul_precision=matmul_precision)


def _adjoint_fwd(func, method, rtol, atol, max_steps, scan_budget,
                 matmul_precision, y0, ts, args):
    ys = _odeint_adjoint_core(func, method, rtol, atol, max_steps,
                              scan_budget, matmul_precision, y0, ts, args)
    return ys, (ys, ts, args)


def _adjoint_bwd(func, method, rtol, atol, max_steps, scan_budget,
                 matmul_precision, residuals, g):
    ys, ts, args = residuals
    num_t = ts.shape[0]

    def aug_dynamics(t, aug):
        # augmented state (y, a_y, a_args); time reversal is handled by
        # integrating over a decreasing ts, so signs here are the plain
        # adjoint ODE: dy/dt = f, da/dt = -aᵀ ∂f/∂y, da_args/dt = -aᵀ ∂f/∂args.
        y, a_y, _ = aug

        def f_closed(y_in, params):
            return func(t, y_in, *params)

        f_val, vjp_fn = jax.vjp(f_closed, y, args)
        a_dot_y, a_dot_args = vjp_fn(_tree_scale(-1.0, a_y))
        return (f_val, a_dot_y, a_dot_args)

    y_bar = jax.tree_util.tree_map(lambda x: x[num_t - 1], g)
    args_bar = jax.tree_util.tree_map(jnp.zeros_like, args)

    def scan_interval(carry, i):
        y_bar_c, args_bar_c = carry
        # integrate interval [ts[i+1], ts[i]] backwards
        t1 = ts[i + 1]
        t0 = ts[i]
        y_at_t1 = jax.tree_util.tree_map(lambda x: x[i + 1], ys)
        aug0 = (y_at_t1, y_bar_c, args_bar_c)
        aug_ts = jnp.stack([t1, t0])
        # the reversed augmented system (y, a_y, a_args) is stiffer than the
        # forward solve and its controller re-adapts from scratch, so a
        # budget that exactly covers the forward can exhaust here and
        # silently truncate gradients — give the backward twice the budget
        # (exhaustion still warns via _dopri5_odeint)
        aug_out = odeint(aug_dynamics, aug0, aug_ts, method=method, rtol=rtol,
                         atol=atol, max_steps=max_steps,
                         scan_budget=None if scan_budget is None
                         else 2 * scan_budget,
                         matmul_precision=matmul_precision)
        _, y_bar_new, args_bar_new = jax.tree_util.tree_map(
            lambda x: x[1], aug_out)
        g_i = jax.tree_util.tree_map(lambda x: x[i], g)
        y_bar_new = _tree_add(y_bar_new, g_i)
        return (y_bar_new, args_bar_new), None

    idxs = jnp.arange(num_t - 2, -1, -1)
    (y_bar, args_bar), _ = jax.lax.scan(scan_interval, (y_bar, args_bar), idxs)
    return y_bar, None, args_bar


_odeint_adjoint_core.defvjp(_adjoint_fwd, _adjoint_bwd)
