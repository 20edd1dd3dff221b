"""A/B the bf16-STORAGE differentiable decode (cfg.decode_dtype) on the real
chip — round-5 VERDICT item 1.

The step is HBM-bound and the diverse decode is 58-69% of it. Round 4 gave
the gradient-free selection half bf16 storage (select_dtype); this lever
gives the DIFFERENTIABLE half — posterior reconstruction + winner recompute,
forward AND backward AD residuals — bf16 storage with fp32 master weights
(models/sttode._decode_mp). Both arms here run the full production recipe
(select_dtype=bfloat16, select_impl=auto, scanned dispatch), so the ratio is
the marginal win of decode_dtype on the shipped configuration.

Methodology per tpu-box rules: scanned multi-step dispatches, alternating
windows, medians + per-round ratios (run-to-run drift on this shared chip
is ±20%).

Run:  python scripts/decode_dtype_ab.py [--batches 128,512] [--rounds 5]
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
from sttode_tpu.train import make_train_step, stack_batches
from sttode_tpu.utils import profiling


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="128,512")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--scan_steps", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    N = 11
    S = args.scan_steps
    for B in [int(b) for b in args.batches.split(",")]:
        base = STTODEConfig(past_length=5, future_length=10,
                            select_dtype="bfloat16",
                            select_impl="auto").validate()
        cfg_f = base
        cfg_b = base._replace(decode_dtype="bfloat16").validate()
        params = sttode_init(jax.random.PRNGKey(0), cfg_f)
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        stacked = stack_batches([make_batch(cfg_f, B, N, seed=i)
                                 for i in range(S)])
        key = jax.random.PRNGKey(1)

        runs = {}
        for name, cfg in (("fp32", cfg_f), ("bf16", cfg_b)):
            runs[name] = make_train_step(cfg, opt, donate=False, scan_steps=S)
            # compile + one loss print so the two arms' losses are comparable
            _, _, m = runs[name](params, opt_state, stacked, key)
            tot = float(np.asarray(m["total"]).ravel()[-1])
            div = float(np.asarray(m["diverse"]).ravel()[-1])
            print(f"B={B} decode_{name}: total={tot:.4f} diverse={div:.4f}",
                  flush=True)

        times = {"fp32": [], "bf16": []}
        ratios = []
        for r in range(args.rounds):
            for name in ("fp32", "bf16"):
                dt = profiling.time_fn(runs[name], params, opt_state, stacked,
                                       key, iters=args.iters)
                times[name].append(dt["seconds_per_call"] / S)
            ratios.append(times["fp32"][-1] / times["bf16"][-1])
            print(f"  round {r}: fp32 {times['fp32'][-1]*1e3:.2f} ms "
                  f"({B/times['fp32'][-1]:,.0f} sc/s)  "
                  f"bf16 {times['bf16'][-1]*1e3:.2f} ms "
                  f"({B/times['bf16'][-1]:,.0f} sc/s)  "
                  f"ratio fp32/bf16 {ratios[-1]:.3f}", flush=True)
        mf = statistics.median(times["fp32"])
        mb = statistics.median(times["bf16"])
        print(f"B={B} MEDIANS: fp32 {B/mf:,.0f} sc/s, bf16 {B/mb:,.0f} sc/s, "
              f"speedup ×{mf/mb:.3f} (per-round ratios "
              f"{[round(x, 3) for x in ratios]})", flush=True)

    os._exit(0)  # non-daemon PJRT grant thread hangs teardown ~5 min


if __name__ == "__main__":
    np.seterr(all="ignore")
    main()
