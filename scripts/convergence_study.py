"""Convergence study on synthetic social scenes (TPU).

Trains the flagship STTODE config on generated multi-agent data and tracks
best-of-20 min-ADE/FDE on a held-out split across epochs — the end-to-end
learning validation the unshipped reference datasets prevent. Appends results
to CONVERGENCE.md.

    python scripts/convergence_study.py --epochs 40 --train_scenes 600
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sttode_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

import numpy as np
import jax
import optax

from sttode_tpu.data.batching import scene_batches
from sttode_tpu.data.synthetic import make_social_scenes
from sttode_tpu.evaluation import evaluate_scenes
from sttode_tpu.models import STTODEConfig, sttode_init
from sttode_tpu.train import (
    adam_with_schedule, make_train_step, set_lr, step_lr, train_epoch,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--train_scenes", type=int, default=600)
    ap.add_argument("--test_scenes", type=int, default=100)
    ap.add_argument("--scenes_per_batch", type=int, default=16)
    ap.add_argument("--scan_steps", type=int, default=1,
                    help="optimizer steps per device dispatch (the "
                         "production recipe pairs --scenes_per_batch 128 "
                         "with --scan_steps 8)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--eval_every", type=int, default=5)
    ap.add_argument("--attn_axis", default="agent")
    ap.add_argument("--compat", default="tpu")
    ap.add_argument("--ode_method", default="euler",
                    choices=("euler", "midpoint", "rk4", "dopri5"))
    ap.add_argument("--ode_adjoint", action="store_true",
                    help="O(1)-memory continuous-adjoint gradients through "
                         "the ODE encoders (BASELINE.md config 2)")
    ap.add_argument("--ode_steps", type=int, default=1)
    ap.add_argument("--ode_rtol", type=float, default=1e-5)
    ap.add_argument("--ode_atol", type=float, default=1e-7)
    ap.add_argument("--attn_metric", default="oblique",
                    choices=("oblique", "poincare"))
    ap.add_argument("--curvature", type=float, default=1.0)
    ap.add_argument("--select_dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="bf16 best-of-K selection decode (winner recomputed "
                         "fp32) — the convergence A/B evidence for adopting "
                         "it lives in CONVERGENCE.md")
    ap.add_argument("--select_impl", default="xla",
                    choices=("xla", "fused", "auto"),
                    help="best-of-K selection route (fused = the Pallas "
                         "selection-decode kernel)")
    ap.add_argument("--decode_dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="bf16 STORAGE for the differentiable decode "
                         "(posterior + winner recompute; fp32 master "
                         "weights) — round-5 VERDICT item 1 convergence A/B")
    args = ap.parse_args()

    train = make_social_scenes(args.train_scenes, seed=0)
    test = make_social_scenes(args.test_scenes, seed=1)
    cfg = STTODEConfig(compat=args.compat, attn_axis=args.attn_axis,
                       ode_method=args.ode_method,
                       ode_adjoint=args.ode_adjoint,
                       ode_steps=args.ode_steps,
                       ode_rtol=args.ode_rtol, ode_atol=args.ode_atol,
                       attn_metric=args.attn_metric,
                       curvature=args.curvature,
                       attn_impl="dense" if args.attn_metric == "poincare"
                       else "auto",
                       select_dtype=args.select_dtype,
                       select_impl=args.select_impl,
                       decode_dtype=args.decode_dtype)

    key = jax.random.PRNGKey(0)
    key, k_init = jax.random.split(key)
    params = sttode_init(k_init, cfg)
    schedule = step_lr(args.lr, 10, 0.5)
    opt = adam_with_schedule(schedule)
    opt_state = opt.init(params)
    step_fn = make_train_step(cfg, opt, donate=False,
                              scan_steps=args.scan_steps)

    nprng = np.random.default_rng(0)
    history = []
    t_start = time.time()
    for epoch in range(args.epochs):
        opt_state = set_lr(opt_state, schedule(epoch))
        key, k_ep = jax.random.split(key)
        t0 = time.time()
        params, opt_state, means = train_epoch(
            step_fn, params, opt_state,
            scene_batches(train, training=True, rng=nprng,
                          scenes_per_batch=args.scenes_per_batch),
            k_ep, scan_steps=args.scan_steps)
        line = (f"epoch {epoch:03d} [{time.time() - t0:.1f}s] "
                + " ".join(f"{k}: {v:.3f}" for k, v in sorted(means.items())))
        if (epoch + 1) % args.eval_every == 0 or epoch == 0:
            m = evaluate_scenes(params, cfg, test, jax.random.PRNGKey(42),
                                sample_k=20)
            line += f" | TEST ADE {m['ade']:.4f} FDE {m['fde']:.4f}"
            history.append((epoch, m["ade"], m["fde"]))
        print(line, flush=True)

    total_min = (time.time() - t_start) / 60
    ode_desc = args.ode_method
    if args.attn_metric != "oblique":
        ode_desc = f"metric={args.attn_metric}(c={args.curvature:g}), " + ode_desc
    if args.ode_method == "dopri5":
        ode_desc += f"(rtol={args.ode_rtol:g}, atol={args.ode_atol:g})"
    elif args.ode_steps > 1:
        ode_desc += f"×{args.ode_steps}"
    if args.ode_adjoint:
        ode_desc += "+adjoint"
    with open("CONVERGENCE.md", "a") as f:
        recipe = (f"B={args.scenes_per_batch}"
                  + (f"×scan{args.scan_steps}" if args.scan_steps > 1 else "")
                  + ("+bf16sel" if args.select_dtype == "bfloat16" else "")
                  + ("+bf16dec" if args.decode_dtype == "bfloat16" else "")
                  + (f"+{args.select_impl}sel"
                     if args.select_impl != "xla" else ""))
        f.write(f"\n## Run: {args.epochs} epochs, {args.train_scenes} train "
                f"scenes, {recipe}, compat={args.compat}/{args.attn_axis}, "
                f"ode={ode_desc}, "
                f"{total_min:.1f} min on {jax.devices()[0].device_kind}\n\n")
        f.write("| epoch | test min-ADE (K=20) | test min-FDE |\n|---|---|---|\n")
        for e, a, d in history:
            f.write(f"| {e} | {a:.4f} | {d:.4f} |\n")
    print(f"done in {total_min:.1f} min; history -> CONVERGENCE.md")


if __name__ == "__main__":
    main()
