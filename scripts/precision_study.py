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

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
        orig_dot = mhgsa._dot

        def dot_bf16x3(a, b, dims):
            """3-pass f32-from-bf16 dot (drops the lo·lo term): the manual
            equivalent of Precision.HIGH, which Mosaic does not lower."""
            a_hi = a.astype(jnp.bfloat16)
            a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            b_hi = b.astype(jnp.bfloat16)
            b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

            def d(x, y):
                return jax.lax.dot_general(
                    x, y, (dims, ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)

            return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)

        def dot_gram3(a, b, dims):
            """bf16x3 only for the Gram (contracting dim 1 vs 1); HIGHEST for
            the AV/probability matmuls."""
            if dims == ((1,), (1,)):
                return dot_bf16x3(a, b, dims)
            return orig_dot(a, b, dims)

        for prec in ("HIGHEST", "BF16x3", "GRAM3", "DEFAULT"):
            if prec == "BF16x3":
                mhgsa._dot = dot_bf16x3
                mhgsa._PRECISION = jax.lax.Precision.DEFAULT
            elif prec == "GRAM3":
                mhgsa._dot = dot_gram3
                mhgsa._PRECISION = jax.lax.Precision.HIGHEST
            else:
                mhgsa._dot = orig_dot
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
        mhgsa._dot = orig_dot
    mhgsa._PRECISION = jax.lax.Precision.HIGHEST
    return results


if __name__ == "__main__":
    main()
