"""Step-level A/B: select_impl='fused' (Pallas selection-decode kernel) vs
'xla' at the recommended recipe (select_dtype=bfloat16) and across batch
sizes. Also smoke-checks the raw kernel on-chip first (--smoke).

Run:  python scripts/select_impl_ab.py [--batches 32,128,512] [--smoke]
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
import jax.numpy as jnp
import numpy as np
import optax

from bench_details import make_batch
from sttode_tpu.models import STTODEConfig, sttode_init
from sttode_tpu.models import sttode as m
from sttode_tpu.train import make_train_step, stack_batches
from sttode_tpu.utils import profiling


def smoke(cfg, params):
    """Direct kernel call vs the decode oracle, on the attached device."""
    from sttode_tpu.kernels import select_decode as sd
    M, K = 352, 20
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    pf = jax.random.normal(ks[0], (M, 2 * cfg.hidden_dim))
    z = jax.random.normal(ks[1], (M * K, cfg.zdim))
    past = jax.random.normal(ks[2], (M, cfg.past_length, 2))
    cur = jax.random.normal(ks[3], (M, 1, 2))
    fut = jax.random.normal(ks[4], (M, cfg.future_length, 2))
    state0 = m.decode_block0_state(params, past)
    pf_k = jnp.repeat(pf, K, axis=0)
    z_km = jnp.transpose(z.reshape(M, K, -1), (1, 0, 2))
    xt = past.reshape(M, -1)
    fut_rel = (fut - cur).reshape(M, -1)

    got = jax.jit(lambda *a: sd.select_decode(params, *a, dtype=jnp.float32))(
        pf, z_km, state0, xt, fut_rel).ravel()
    out_seq, _ = m.decode(params, cfg, pf_k, z, past, cur, K,
                          block0_state=state0)
    want = jnp.sum(jnp.square(jnp.repeat(fut, K, axis=0) - out_seq),
                   axis=(-1, -2))
    err = float(jnp.max(jnp.abs(got - want) / (1.0 + jnp.abs(want))))
    print(f"smoke fp32: max rel err {err:.2e}", flush=True)
    gotb = jax.jit(lambda *a: sd.select_decode(params, *a,
                                               dtype=jnp.bfloat16))(
        pf, z_km, state0, xt, fut_rel).ravel()
    errb = float(jnp.max(jnp.abs(gotb - want) / (1.0 + jnp.abs(want))))
    print(f"smoke bf16: max rel err {errb:.2e}", flush=True)
    assert err < 1e-3, err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,128,512")
    ap.add_argument("--select_dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--scan_steps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--row_tile", type=int, default=256)
    args = ap.parse_args()

    N = 11
    S = args.scan_steps
    base = STTODEConfig(past_length=5, future_length=10,
                        select_dtype=args.select_dtype)
    if args.smoke:
        cfg = base.validate()
        smoke(cfg, sttode_init(jax.random.PRNGKey(0), cfg))

    for B in [int(b) for b in args.batches.split(",")]:
        params = sttode_init(jax.random.PRNGKey(0), base.validate())
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        stacked = stack_batches([make_batch(base.validate(), B, N, seed=i)
                                 for i in range(S)])
        key = jax.random.PRNGKey(1)

        runs = {}
        for name in ("xla", "fused"):
            cfg = base._replace(select_impl=name).validate()
            step = make_train_step(cfg, opt, donate=False, scan_steps=S)
            _, _, mm = step(params, opt_state, stacked, key)
            tot = float(np.asarray(mm["total"]).ravel()[-1])
            print(f"B={B} {name}: total={tot:.4f}", flush=True)
            runs[name] = step

        times = {"xla": [], "fused": []}
        for r in range(args.rounds):
            for name in ("xla", "fused"):
                dt = profiling.time_fn(runs[name], params, opt_state, stacked,
                                       key, iters=args.iters)
                times[name].append(dt["seconds_per_call"] / S)
            print(f"  round {r}: xla {B/times['xla'][-1]:,.0f} sc/s  "
                  f"fused {B/times['fused'][-1]:,.0f} sc/s  "
                  f"ratio x/f {times['xla'][-1]/times['fused'][-1]:.3f}",
                  flush=True)
        mx = statistics.median(times["xla"])
        mf = statistics.median(times["fused"])
        print(f"B={B} MEDIANS ({args.select_dtype}): xla {B/mx:,.0f} sc/s, "
              f"fused {B/mf:,.0f} sc/s, fused speedup ×{mx/mf:.3f}",
              flush=True)

    os._exit(0)


if __name__ == "__main__":
    main()
