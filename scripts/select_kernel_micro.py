"""Isolated microbench: the fused selection-decode KERNEL alone vs the XLA
selection subgraph (bf16 decode + dist) alone, same inputs, chained windows.

Separates "the kernel is slow" from "the integration added overhead".
History note: the v1 flat-row kernel measured here 606 vs 691 µs (R=28,160)
and 2,842 vs 3,719 µs (R=112,640) against XLA — isolated wins that LOST at
step level until the v3 index-map layout removed the operand
materialization (BENCHMARKS.md round-3 notes). This script now drives the
shipped v3 API.

Run:  python scripts/select_kernel_micro.py [--rows 28160,112640] [--tiles 256,512]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sttode_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp

from bench_details import _timed
from sttode_tpu.kernels import select_decode as sd
from sttode_tpu.models import STTODEConfig, sttode_init
from sttode_tpu.models import sttode as m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="28160,112640")
    ap.add_argument("--tiles", default="256,512")
    ap.add_argument("--loop", type=int, default=10)
    args = ap.parse_args()

    cfg = STTODEConfig(past_length=5, future_length=10,
                       select_dtype="bfloat16").validate()
    params = sttode_init(jax.random.PRNGKey(0), cfg)
    K = 20

    for R in [int(r) for r in args.rows.split(",")]:
        M = R // K
        ks = jax.random.split(jax.random.PRNGKey(1), 6)
        pf = jax.random.normal(ks[0], (M, 2 * cfg.hidden_dim))
        z = jax.random.normal(ks[1], (M * K, cfg.zdim))
        past = jax.random.normal(ks[2], (M, cfg.past_length, 2))
        cur = jax.random.normal(ks[3], (M, 1, 2))
        fut = jax.random.normal(ks[4], (M, cfg.future_length, 2))
        state0 = m.decode_block0_state(params, past)
        z_km = jnp.transpose(z.reshape(M, K, -1), (1, 0, 2))
        xt = past.reshape(M, -1)
        fut_rel = (fut - cur).reshape(M, -1)

        # ---- kernel alone, per tile size -------------------------------- #
        for tile in [int(t) for t in args.tiles.split(",")]:
            def mk(n, tile=tile):
                def run():
                    def body(p, _):
                        d = sd.select_decode(params, p, z_km, state0, xt,
                                             fut_rel, dtype=jnp.bfloat16,
                                             m_tile=tile)
                        # feed a value-dependence back so iterations chain
                        return p + (jnp.sum(d, axis=1, keepdims=True) * 0
                                    ).astype(p.dtype), None
                    return jax.lax.scan(body, pf, None, length=n)[0]
                return jax.jit(run)
            dt = _timed(mk, args.loop)
            print(f"R={R} kernel tile={tile}: {dt*1e6:,.0f} µs/call",
                  flush=True)

        # ---- XLA bf16 subgraph alone ------------------------------------ #
        def cast(t):
            return jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, t)

        dec = {"decoder": cast(params["decoder"])}
        zb, pastb, curb, s0b = map(cast, (z, past, cur, state0))

        def mk_x(n):
            def run():
                def body(p, _):
                    pf_k = jnp.repeat(p, K, axis=0)
                    div, _ = m.decode(dec, cfg, pf_k, zb, pastb, curb, K,
                                      block0_state=s0b, gru_hoist=False)
                    div = div.astype(jnp.float32).reshape(M, K, -1, 2)
                    d = jnp.sum(jnp.square(
                        fut.reshape(M, 1, -1, 2) - div), axis=(-1, -2))
                    return p + (jnp.sum(d, axis=1, keepdims=True) * 0
                                ).astype(p.dtype), None
                return jax.lax.scan(body, cast(pf), None, length=n)[0]
            return jax.jit(run)
        dt = _timed(mk_x, args.loop)
        print(f"R={R} xla subgraph:     {dt*1e6:,.0f} µs/call", flush=True)

    os._exit(0)


if __name__ == "__main__":
    main()
