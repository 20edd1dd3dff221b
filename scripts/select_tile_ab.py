"""Row-tile sweep for the fused selection-decode kernel (see
scripts/select_impl_ab.py for the xla-vs-fused step A/B).

Run:  python scripts/select_tile_ab.py [--batches 512] [--tiles 256,512,1024]
"""

from __future__ import annotations

import argparse
import functools
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
from sttode_tpu.kernels import select_decode as sd
from sttode_tpu.models import STTODEConfig, sttode_init
from sttode_tpu.models import sttode as m
from sttode_tpu.train import make_train_step, stack_batches
from sttode_tpu.utils import profiling


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="512")
    ap.add_argument("--tiles", default="512:1,512:2,512:4")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--scan_steps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    N = 11
    S = args.scan_steps
    tiles = [t for t in args.tiles.split(",")]
    base = STTODEConfig(past_length=5, future_length=10,
                        select_dtype="bfloat16", select_impl="fused")
    for B in [int(b) for b in args.batches.split(",")]:
        cfg = base.validate()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        stacked = stack_batches([make_batch(cfg, B, N, seed=i)
                                 for i in range(S)])
        key = jax.random.PRNGKey(1)

        runs = {}
        for t in tiles:
            mt, _, kb = t.partition(":")
            m.select_decode = functools.partial(
                sd.select_decode, m_tile=int(mt), k_block=int(kb or 1))
            step = make_train_step(cfg, opt, donate=False, scan_steps=S)
            try:
                _, _, mm = step(params, opt_state, stacked, key)
            except Exception as e:  # noqa: BLE001 — VMEM OOM at fat tiles
                print(f"B={B} tile={t}: COMPILE FAIL "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
                continue
            tot = float(np.asarray(mm["total"]).ravel()[-1])
            print(f"B={B} tile={t}: total={tot:.4f}", flush=True)
            runs[t] = step

        times = {t: [] for t in runs}
        for r in range(args.rounds):
            line = []
            for t in runs:
                dt = profiling.time_fn(runs[t], params, opt_state, stacked,
                                       key, iters=args.iters)
                times[t].append(dt["seconds_per_call"] / S)
                line.append(f"t{t} {B/times[t][-1]:,.0f}")
            print(f"  round {r}: " + "  ".join(line) + " sc/s", flush=True)
        for t in runs:
            md = statistics.median(times[t])
            print(f"B={B} tile={t} MEDIAN: {B/md:,.0f} sc/s", flush=True)

    os._exit(0)


if __name__ == "__main__":
    main()
