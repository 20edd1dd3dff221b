"""Step-level A/B: decode-GRU lax.scan unroll=1 vs full unroll (T=5).

The decode GRU recurrence is serial either way; unrolling only removes XLA's
while-loop machinery (per-step dynamic-slice/DUS, loop condition) in exchange
for code size. At training row counts the per-step body is small enough that
loop overhead could matter; at selection row counts (R ~ 1e5) the body is
HBM-bound and unroll should be a wash. Whole-train-step alternating A/B, the
same methodology as scripts/gru_hoist_step_ab.py.

Run:  python scripts/gru_unroll_ab.py [--batches 32,128,512]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sttode_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

import jax
import numpy as np
import optax

from bench_details import make_batch
from sttode_tpu.models import STTODEConfig, sttode_init
from sttode_tpu.models import sttode as sttode_mod
from sttode_tpu.train import make_train_step, stack_batches
from sttode_tpu.utils import profiling


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,128,512")
    ap.add_argument("--select_dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--scan_steps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    N = 11
    S = args.scan_steps
    for B in [int(b) for b in args.batches.split(",")]:
        cfg = STTODEConfig(past_length=5, future_length=10,
                           select_dtype=args.select_dtype).validate()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        stacked = stack_batches([make_batch(cfg, B, N, seed=i)
                                 for i in range(S)])
        key = jax.random.PRNGKey(1)

        runs = {}
        for name, unroll in (("loop", 1), ("unroll", True)):
            sttode_mod.GRU_UNROLL = unroll
            # fresh closure per setting: the trace reads the module var
            step = make_train_step(cfg, opt, donate=False, scan_steps=S)
            _, _, m = step(params, opt_state, stacked, key)
            tot = float(np.asarray(m["total"]).ravel()[-1])
            print(f"B={B} {name}: total={tot:.4f}", flush=True)
            runs[name] = step
        sttode_mod.GRU_UNROLL = 1

        times = {"loop": [], "unroll": []}
        for r in range(args.rounds):
            for name in ("loop", "unroll"):
                dt = profiling.time_fn(runs[name], params, opt_state, stacked,
                                       key, iters=args.iters)
                times[name].append(dt["seconds_per_call"] / S)
            print(f"  round {r}: loop {B/times['loop'][-1]:,.0f} sc/s  "
                  f"unroll {B/times['unroll'][-1]:,.0f} sc/s  "
                  f"ratio l/u {times['loop'][-1]/times['unroll'][-1]:.3f}",
                  flush=True)
        ml = statistics.median(times["loop"])
        mu = statistics.median(times["unroll"])
        print(f"B={B} MEDIANS ({args.select_dtype}): loop {B/ml:,.0f} sc/s, "
              f"unroll {B/mu:,.0f} sc/s, unroll speedup ×{ml/mu:.3f}",
              flush=True)

    os._exit(0)


if __name__ == "__main__":
    main()
