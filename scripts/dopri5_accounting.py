"""dopri5 cost accounting (round-3 VERDICT item 6).

BENCHMARKS.md's dopri5 row was ~968 ms/solve at torchdiffeq's default
tolerances (rtol=1e-7, atol=1e-9) vs 36-47 ms loosened. This script settles
WHY by counting attempted/accepted RK45 steps and RHS evaluations on the
device itself (``odeint(..., return_stats=True)``) and dividing measured
solve time by the RHS count to get µs/RHS-eval vs the rk4 row's.

ANSWER (round 4, measured on v5e): the solve was WORK-bound at a sane 21
µs/RHS — but doing 109x too much work. TPU's ambient bf16 matmul truncation
puts an ~2^-8-relative noise floor under the embedded-pair error estimate;
below that floor the PI controller shrinks h against noise that does not
shrink with h: 7,762 accepted steps / 46,748 RHS evals / 998 ms at defaults,
vs 71 steps / 428 evals / 41 ms with fp32-pinned RHS matmuls (x24). The
fp32 pin is now the solver default for adaptive methods
(``odeint(matmul_precision=...)``, solvers.py module note); the
``--ambient`` flag here re-measures the unpinned form to keep the failure
mode reproducible. (Step COUNTS are platform-dependent for exactly this
reason — the old assumption that CPU counts transfer to TPU is what hid
this for a round.)

Usage:  python scripts/dopri5_accounting.py [--ambient]  # TPU
        JAX_PLATFORMS=cpu python scripts/dopri5_accounting.py --counts-only
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sttode_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

import jax

if os.environ.get("JAX_PLATFORMS"):
    # this box's sitecustomize registers the axon TPU platform at interpreter
    # start; the env var alone does not pin the backend — the config API does
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

from sttode_tpu.nn import LayerConfig, encoder_stack_init
from sttode_tpu.nn.transformer import encoder_stack
from sttode_tpu.ode import odeint


TOLS = [(1e-7, 1e-9, "torchdiffeq default"),
        (1e-5, 1e-7, "loosened"),
        (1e-3, 1e-6, "loose")]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--counts-only", action="store_true",
                    help="skip device timing")
    ap.add_argument("--ambient", action="store_true",
                    help="also measure matmul_precision='inherit' at default "
                         "tolerances (the bf16 noise-floor failure mode)")
    args = ap.parse_args()

    cfg = LayerConfig(d_model=64, num_heads=8, ff_dim=1024)
    params = encoder_stack_init(jax.random.PRNGKey(0), cfg, 1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (32, 11, 1, 64)), jnp.float32)

    def rhs(t, y, p):
        del t
        return encoder_stack(p, y, cfg)

    ts = jnp.linspace(0.0, 12.0, 2)   # one output interval, the flagship grid

    # step needs with the fp32-pinned RHS (identical CPU and TPU): 71 at
    # defaults, 16 at 1e-5/1e-7, 7 at 1e-3/1e-6 — budgets sized above each
    budgets = {1e-7: 96, 1e-5: 24, 1e-3: 12}

    if args.ambient:
        # the failure mode the fp32 pin fixes: ambient (bf16 on TPU) RHS
        # matmuls noise-floor the error estimator at default tolerances
        fn = jax.jit(lambda x, p: odeint(
            rhs, x, ts, p, method="dopri5", rtol=1e-7, atol=1e-9,
            matmul_precision="inherit", return_stats=True))
        ys, stats = fn(x, params)
        att, acc = int(stats["attempted_steps"]), int(stats["accepted_steps"])
        evals = int(stats["rhs_evals"])
        msg = (f"dopri5[while, AMBIENT precision] rtol=1e-07 atol=1e-09: "
               f"{att} attempted / {acc} accepted steps, {evals} RHS evals")
        if not args.counts_only:
            _ = np.asarray(jax.device_get(jnp.ravel(ys[-1])[:1]))
            best = float("inf")
            for _i in range(3):
                t0 = time.perf_counter()
                ys2, _st = fn(x, params)
                _ = np.asarray(jax.device_get(jnp.ravel(ys2[-1])[:1]))
                best = min(best, time.perf_counter() - t0)
            msg += f", {best*1e3:.1f} ms/solve = {best/evals*1e6:.0f} µs/RHS"
        print(msg, flush=True)

    rows = []
    for rtol, atol, label in TOLS:
        for form in ("while", "scan"):
            budget = budgets[rtol] if form == "scan" else None
            fn = jax.jit(lambda x, p, rtol=rtol, atol=atol, budget=budget:
                         odeint(rhs, x, ts, p, method="dopri5", rtol=rtol,
                                atol=atol, scan_budget=budget,
                                return_stats=True))
            ys, stats = fn(x, params)
            att = int(stats["attempted_steps"])
            acc = int(stats["accepted_steps"])
            evals = int(stats["rhs_evals"])
            assert not bool(stats.get("budget_exhausted", False)), \
                f"budget {budget} exhausted at rtol={rtol}"
            per = None
            if not args.counts_only and form == "while":
                # one ~long solve dwarfs tunnel noise; do NOT chain while-form
                # adaptive solves (the second integrates a smoother state and
                # takes fewer steps, halving the apparent cost)
                _ = np.asarray(jax.device_get(jnp.ravel(ys[-1])[:1]))[0]
                best = float("inf")
                for _i in range(3):
                    t0 = time.perf_counter()
                    ys2, _st = fn(x, params)
                    _ = np.asarray(jax.device_get(jnp.ravel(ys2[-1])[:1]))[0]
                    best = min(best, time.perf_counter() - t0)
                per = best
            elif not args.counts_only:
                # scan form: cost is BUDGET-determined (always budget × 6
                # evals of device work, whatever the state), so chaining is
                # distortion-free and needed — a ~10 ms solve is invisible
                # under the ~35 ms tunnel constant without window differencing
                def make(n, budget=budget, rtol=rtol, atol=atol):
                    @jax.jit
                    def run(x, p):
                        def body(c, _):
                            z = odeint(rhs, c, ts, p, method="dopri5",
                                       rtol=rtol, atol=atol,
                                       scan_budget=budget)
                            return jax.tree_util.tree_map(
                                lambda a: a[-1], z), None
                        return jax.lax.scan(body, x, None, length=n)[0]

                    def thunk():
                        o = run(x, params)
                        _ = np.asarray(jax.device_get(jnp.ravel(o)[:1]))[0]
                        return o
                    return thunk

                def best_of(thunk, reps=3):
                    thunk()
                    b = float("inf")
                    for _i in range(reps):
                        t0 = time.perf_counter()
                        thunk()
                        b = min(b, time.perf_counter() - t0)
                    return b

                loop = 8
                t1_, t2_ = best_of(make(loop)), best_of(make(2 * loop))
                per = max((t2_ - t1_) / loop, 1e-9)
            msg = (f"dopri5[{form}{'' if budget is None else f'={budget}'}] "
                   f"rtol={rtol:g} atol={atol:g} ({label}): "
                   f"{att} attempted / {acc} accepted steps, "
                   f"{evals} RHS evals")
            if per is not None:
                msg += (f", {per*1e3:.1f} ms/solve = "
                        f"{per/evals*1e6:.0f} µs/RHS")
            print(msg, flush=True)
            rows.append((label, form, rtol, atol, att, acc, evals, per))

    if not args.counts_only:
        # rk4 comparison row: 8 fixed steps = 32 RHS evals, chained windows
        steps = 8
        loop = 40

        def timed(n):
            @jax.jit
            def run(x, p):
                def body(c, _):
                    z = odeint(rhs, c, jnp.linspace(0.0, 12.0, steps + 1), p,
                               method="rk4")
                    return jax.tree_util.tree_map(lambda a: a[-1], z), None
                return jax.lax.scan(body, x, None, length=n)[0]
            _ = np.asarray(jax.device_get(jnp.ravel(run(x, params))[:1]))[0]
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                o = run(x, params)
                _ = np.asarray(jax.device_get(jnp.ravel(o)[:1]))[0]
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t2 = timed(loop), timed(2 * loop)
        per_solve = max((t2 - t1) / loop, 1e-9)
        evals = 4 * steps
        print(f"rk4 steps={steps}: {evals} RHS evals, "
              f"{per_solve*1e3:.2f} ms/solve = "
              f"{per_solve/evals*1e6:.0f} µs/RHS")

    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
