"""Gram-precision study for the fused MHGSA kernel.

Question: the kernel pins ``jax.lax.Precision.HIGHEST`` (6 bf16 MXU passes)
on every matmul because the acos derivative ``(1-g²)^(-1/2)`` amplifies Gram
error near ±1 (DESIGN.md precision rule; measured 3.4e-3 output error at
DEFAULT). Is ``HIGH`` (3 passes) enough? If yes, the Gram and AV matmuls
double their MXU throughput.

Method: for each shape, (a) numeric error of the kernel's full fwd output vs
a float64 numpy oracle at each precision; (b) wall time via the two-window-
difference method bench_details uses (chained dependent calls, best-of-window
difference between N and 2N cancels the dispatch constant).

Run on the TPU box: ``python scripts/precision_study.py``.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from sttode_tpu.kernels import mhgsa


def oracle_fp64(q, k, v):
    """Dense softmax(-acos(q̂·k̂ᵀ))·V in numpy float64."""
    q = np.asarray(q, np.float64)
    k = np.asarray(k, np.float64)
    v = np.asarray(v, np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    kn = k / np.maximum(np.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
    g = np.einsum("bld,bsd->bls", qn, kn)
    g = np.clip(g, -1.0 + mhgsa.EPS, 1.0 - mhgsa.EPS)
    s = -np.arccos(g)
    s = s - s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(axis=-1, keepdims=True)
    return np.einsum("bls,bsd->bld", p, v)


def time_chained(fn, args, iters):
    """Median-of-3 of (time(2N) - time(N)) / N with chained dependent calls."""
    def window(n):
        best = np.inf
        for _ in range(3):
            out = args[0]
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(out, *args[1:])
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    window(2)  # warm
    return (window(2 * iters) - window(iters)) / iters


def main():
    shapes = [(64, 512, 64), (16, 1024, 64)]
    rng = np.random.default_rng(0)
    results = []
    for B, L, Dh in shapes:
        q = jnp.asarray(rng.standard_normal((B, L, Dh)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, L, Dh)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, L, Dh)), jnp.float32)
        ref = oracle_fp64(q, k, v)
        scale = np.abs(ref).max()
        flops = 2 * B * L * L * (2 * Dh + 1)
        for prec in ("HIGHEST", "HIGH", "DEFAULT"):
            mhgsa._PRECISION = getattr(jax.lax.Precision, prec)

            @jax.jit
            def run(q, k, v):
                return mhgsa.fused_geodesic_attention(q, k, v)

            out = np.asarray(run(q, k, v))
            err = np.abs(out - ref).max() / scale
            dt = time_chained(lambda q, k, v: run(q, k, v), (q, k, v), 8)
            tfs = flops / dt / 1e12
            results.append((B, L, Dh, prec, err, dt * 1e6, tfs))
            print(f"B{B} L{L} Dh{Dh} {prec:8s}  rel_err={err:.2e}  "
                  f"{dt*1e6:8.1f} us  {tfs:6.2f} TF/s", flush=True)
    mhgsa._PRECISION = jax.lax.Precision.HIGHEST
    return results


if __name__ == "__main__":
    main()
