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
from sttode_tpu.nn.recurrent import GRUParams, gru, gru_init


def gru_variant(params, xs, hoist: bool):
    """The PRODUCTION gru with the hoist flag under test; the unused per-step
    outputs ys are DCE'd under jit, leaving exactly the final-state program
    the selection decode runs."""
    _, h = gru(params, xs, hoist=hoist)
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
