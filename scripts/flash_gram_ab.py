"""Flash-kernel Gram precision A/B: HIGHEST (6 bf16 MXU passes) vs the
compensated 3-pass bf16 split (BF16x3, drops only lo·lo — rel err ~6e-6,
16x inside the 1e-4 acos clamp granularity).

The one-shot study (scripts/precision_study.py) measured flash-BF16x3 at
x1.12 forward on the 4096² cell; this script decides ADOPTION: alternating
rounds (drift-resistant), forward AND fwd+bwd, plus grad agreement between
the two precisions (the VJP's replay matmuls route through the same _dot).

Run:  python scripts/flash_gram_ab.py [--rounds 5] [--shape 8,4096,64]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sttode_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

import numpy as np

import jax
import jax.numpy as jnp

from sttode_tpu.kernels import mhgsa


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--shape", default="8,4096,64")
    ap.add_argument("--loop", type=int, default=4)
    args = ap.parse_args()
    B, L, Dh = (int(x) for x in args.shape.split(","))

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, Dh)), jnp.float32)

    # the shipped flash kernels default to the 3-pass form this script
    # adopted; pin it OFF so the _dot swap below measures each arm
    mhgsa.FLASH_GRAM_3PASS = False
    orig_dot = mhgsa._dot

    def with_prec(name):
        if name == "BF16x3":
            # the SHIPPED 3-pass split (kernels/mhgsa._dot3) — the A/B must
            # measure the exact formula being adopted, not a local re-type
            mhgsa._dot = mhgsa._dot3
            mhgsa._PRECISION = jax.lax.Precision.DEFAULT
        else:
            mhgsa._dot = orig_dot
            mhgsa._PRECISION = jax.lax.Precision.HIGHEST

    def build(name, fb):
        # caller holds with_prec(name) active through the thunk's first call
        # (trace time) — _dot binds when the jitted fn traces
        del name
        if fb:
            def one(qq):
                return jnp.sum(mhgsa.flash_geodesic_attention(qq, k, v) ** 2)

            def mk(n):
                @jax.jit
                def run(qq):
                    def body(c, _):
                        g = jax.grad(one)(c)
                        return c + g * 1e-12, None
                    return jax.lax.scan(body, qq, None, length=n)[0]
                return lambda: run(q)
        else:
            def mk(n):
                @jax.jit
                def run(qq):
                    def body(c, _):
                        o = mhgsa.flash_geodesic_attention(c, k, v)
                        return c + o * 1e-12, None
                    return jax.lax.scan(body, qq, None, length=n)[0]
                return lambda: run(q)
        return mk

    # ---- grad agreement: BF16x3 vs HIGHEST cotangents ---------------------
    def grads(name):
        with_prec(name)
        g = jax.jit(jax.grad(lambda a: jnp.sum(
            mhgsa.flash_geodesic_attention(a[0], a[1], a[2]) ** 2)))(
                (q[:1], k[:1], v[:1]))
        with_prec("HIGHEST")
        return [np.asarray(x) for x in g]

    gh, g3 = grads("HIGHEST"), grads("BF16x3")
    for nm, a, b in zip("qkv", gh, g3):
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-12)
        print(f"grad d{nm}: max rel diff vs HIGHEST = {rel:.2e}", flush=True)

    # ---- alternating timing rounds ----------------------------------------
    # thunks are built (traced + compiled) ONCE per (precision, window) under
    # the right _dot, then timed in interleaved rounds — no per-round retrace
    import time as _time

    def window_diff(thunks, loop):
        def best(thunk, reps=3):
            thunk()
            b = float("inf")
            for _ in range(reps):
                t0 = _time.perf_counter()
                o = thunk()
                np.asarray(jax.device_get(jnp.ravel(o)[:1]))
                b = min(b, _time.perf_counter() - t0)
            return b
        return max((best(thunks[2 * loop]) - best(thunks[loop])) / loop, 1e-9)

    for fb in (False, True):
        tag = "f+b" if fb else "fwd"
        names = ("HIGHEST", "BF16x3")
        thunks = {}
        for name in names:
            with_prec(name)
            mk = build(name, fb)
            for n in (args.loop, 2 * args.loop):
                t = mk(n)
                o = t()                                   # compile under prec
                np.asarray(jax.device_get(jnp.ravel(o)[:1]))
                thunks[(name, n)] = t
        with_prec("HIGHEST")

        times = {n: [] for n in names}
        for r in range(args.rounds):
            for name in names:
                dt = window_diff({k_: thunks[(name, k_)]
                                  for k_ in (args.loop, 2 * args.loop)},
                                 args.loop)
                times[name].append(dt)
            print(f"  {tag} round {r}: HIGHEST {times['HIGHEST'][-1]*1e6:,.0f}"
                  f" µs  BF16x3 {times['BF16x3'][-1]*1e6:,.0f} µs  "
                  f"ratio H/3 {times['HIGHEST'][-1]/times['BF16x3'][-1]:.3f}",
                  flush=True)
        mh = statistics.median(times["HIGHEST"])
        m3 = statistics.median(times["BF16x3"])
        print(f"{B}x{L}²x{Dh} {tag} MEDIANS: HIGHEST {mh*1e6:,.0f} µs, "
              f"BF16x3 {m3*1e6:,.0f} µs, speedup ×{mh/m3:.3f}", flush=True)

    os._exit(0)


if __name__ == "__main__":
    main()
