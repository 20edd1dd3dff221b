"""Isolated microbench: the fused selection-decode KERNEL alone vs the XLA
selection subgraph (bf16 decode + dist) alone, same inputs, chained windows.

Separates "the kernel is slow" from "the integration added overhead".

Run:  python scripts/select_kernel_micro.py [--rows 28160,112640] [--tiles 256,512]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sttode_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np

from sttode_tpu.kernels import select_decode as sd
from sttode_tpu.models import STTODEConfig, sttode_init
from sttode_tpu.models import sttode as m


def _timed(make_thunk, loop: int, repeats: int = 4) -> float:
    def best(thunk):
        o = thunk()
        np.asarray(jax.device_get(jnp.ravel(o)[:1]))
        b = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            o = thunk()
            np.asarray(jax.device_get(jnp.ravel(o)[:1]))
            b = min(b, time.perf_counter() - t0)
        return b

    t1, t2 = best(make_thunk(loop)), best(make_thunk(2 * loop))
    return max((t2 - t1) / loop, 1e-9)


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
        pf = jax.random.normal(ks[0], (R, 2 * cfg.hidden_dim))
        z = jax.random.normal(ks[1], (R, cfg.zdim))
        past = jax.random.normal(ks[2], (M, cfg.past_length, 2))
        cur = jax.random.normal(ks[3], (M, 1, 2))
        fut = jax.random.normal(ks[4], (M, cfg.future_length, 2))
        state0 = m.decode_block0_state(params, past)
        hidden = jnp.concatenate([pf, z], axis=-1)
        s0 = jnp.repeat(state0, K, axis=0)
        xt = jnp.repeat(past, K, axis=0).reshape(R, -1)
        fut_rel = jnp.repeat(fut - cur, K, axis=0).reshape(R, -1)

        # ---- kernel alone, per tile size -------------------------------- #
        for tile in [int(t) for t in args.tiles.split(",")]:
            def mk(n, tile=tile):
                def run():
                    def body(h, _):
                        d = sd.select_decode(params, h, s0, xt, fut_rel,
                                             dtype=jnp.bfloat16,
                                             row_tile=tile)
                        # feed a value-dependence back so iterations chain
                        return h + (d[:, None] * 0).astype(h.dtype), None
                    return jax.lax.scan(body, hidden, None, length=n)[0]
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
        pfb, zb, pastb, curb, s0b = map(cast, (pf, z, past, cur, state0))

        def mk_x(n):
            def run():
                def body(h, _):
                    div, _ = m.decode(dec, cfg, h[:, :128], h[:, 128:],
                                      pastb, curb, K, block0_state=s0b,
                                      gru_hoist=False)
                    div = div.astype(jnp.float32).reshape(M, K, -1, 2)
                    d = jnp.sum(jnp.square(
                        fut.reshape(M, 1, -1, 2) - div), axis=(-1, -2))
                    return h + (d.reshape(R)[:, None] * 0).astype(h.dtype), \
                        None
                return jax.lax.scan(body, cast(hidden), None, length=n)[0]
            return jax.jit(run)
        dt = _timed(mk_x, args.loop)
        print(f"R={R} xla subgraph:     {dt*1e6:,.0f} µs/call", flush=True)

    os._exit(0)


if __name__ == "__main__":
    main()
