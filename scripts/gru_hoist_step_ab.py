"""Step-level A/B: SELECTION-decode GRU hoist vs unhoist (see
SELECT_GRU_HOIST_MAX_ROWS in models/sttode.py). Micro-bench said unhoisted
wins ×1.45-1.78 at R≈113k but disagreed with itself at R=28k bf16 — the
whole-train-step measurement is the decision-relevant one.

Run:  python scripts/gru_hoist_step_ab.py [--batches 128,512] [--select_dtype bfloat16]
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
    ap.add_argument("--batches", default="128,512")
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
        for name, thresh in (("hoist", 1 << 62), ("unhoist", 0)):
            sttode_mod.SELECT_GRU_HOIST_MAX_ROWS = thresh
            # fresh closure per threshold: the trace reads the module var
            step = make_train_step(cfg, opt, donate=False, scan_steps=S)
            _, _, m = step(params, opt_state, stacked, key)
            tot = float(np.asarray(m["total"]).ravel()[-1])
            print(f"B={B} {name}: total={tot:.4f}", flush=True)
            runs[name] = step

        times = {"hoist": [], "unhoist": []}
        for r in range(args.rounds):
            for name in ("hoist", "unhoist"):
                dt = profiling.time_fn(runs[name], params, opt_state, stacked,
                                       key, iters=args.iters)
                times[name].append(dt["seconds_per_call"] / S)
            print(f"  round {r}: hoist {B/times['hoist'][-1]:,.0f} sc/s  "
                  f"unhoist {B/times['unhoist'][-1]:,.0f} sc/s  "
                  f"ratio h/u {times['hoist'][-1]/times['unhoist'][-1]:.3f}",
                  flush=True)
        mh = statistics.median(times["hoist"])
        mu = statistics.median(times["unhoist"])
        print(f"B={B} MEDIANS ({args.select_dtype}): hoist {B/mh:,.0f} sc/s, "
              f"unhoist {B/mu:,.0f} sc/s, unhoist speedup ×{mh/mu:.3f}",
              flush=True)

    os._exit(0)


if __name__ == "__main__":
    main()
