"""A/B the GRU input-projection hoist at selection-decode row counts.

The hoist (one [B·T, D]×[D, 3H] matmul before the scan) was adopted at
B=32×11 where the scan is latency-bound (BENCHMARKS.md round-2 notes). At
the K=20 selection decode's row counts (R = B·11·20 = 28k-113k) the hoisted
gi_all [R, T, 3H] costs a full HBM round trip (~1 GB fp32 at R=113k) while
the per-step input matmul it replaces is MXU-trivial — the tradeoff should
invert. Measure both, fp32 and bf16, chained-scan methodology.

Run:  python scripts/gru_hoist_ab.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sttode_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bench_details import _timed
from sttode_tpu.nn.recurrent import GRUParams, gru_init


def gru_variant(params, xs, hoist: bool):
    B, T, _ = xs.shape
    H = params.w_hh.shape[0]
    h0 = jnp.zeros((B, H), xs.dtype)
    if hoist:
        gi_all = xs @ params.w_ih + params.b_ih

        def step(h, gi):
            gh = h @ params.w_hh + params.b_hh
            i_r, i_z, i_n = gi[..., :H], gi[..., H:2*H], gi[..., 2*H:]
            h_r, h_z, h_n = gh[..., :H], gh[..., H:2*H], gh[..., 2*H:]
            r = jax.nn.sigmoid(i_r + h_r)
            z = jax.nn.sigmoid(i_z + h_z)
            n = jnp.tanh(i_n + r * h_n)
            return (1.0 - z) * n + z * h, None

        h, _ = jax.lax.scan(step, h0, jnp.swapaxes(gi_all, 0, 1))
        return h

    def step(h, x_t):
        gi = x_t @ params.w_ih + params.b_ih
        gh = h @ params.w_hh + params.b_hh
        i_r, i_z, i_n = gi[..., :H], gi[..., H:2*H], gi[..., 2*H:]
        h_r, h_z, h_n = gh[..., :H], gh[..., H:2*H], gh[..., 2*H:]
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h, None

    h, _ = jax.lax.scan(step, h0, jnp.swapaxes(xs, 0, 1))
    return h


def main():
    T, D, H = 8, 32, 96
    for R in (28160, 112640):
        for dt in (jnp.float32, jnp.bfloat16):
            rng = np.random.default_rng(0)
            p = gru_init(jax.random.PRNGKey(0), D, H)
            p = GRUParams(*[a.astype(dt) for a in p])
            xs = jnp.asarray(rng.standard_normal((R, T, D)), dt)

            res = {}
            for hoist in (True, False):
                def mk(n, hoist=hoist):
                    @jax.jit
                    def run(xs):
                        def body(c, _):
                            h = gru_variant(p, xs, hoist)
                            # feed a little of h back so iterations chain
                            return xs + h[:, None, :D] * 1e-9, h
                        return jax.lax.scan(body, xs, None, length=n)[1]
                    return lambda: run(xs)

                res[hoist] = _timed(mk, 8)
            th, tu = res[True], res[False]
            print(f"R={R} {np.dtype(dt).name}: hoisted {th*1e3:.3f} ms, "
                  f"unhoisted {tu*1e3:.3f} ms, hoisted/unhoisted {th/tu:.3f}",
                  flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
