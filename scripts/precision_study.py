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


def dot_variants(orig_dot):
    """Manual split-precision Gram variants (Mosaic lowers only DEFAULT and
    HIGHEST, so HIGH-class 3-pass forms must be written by hand)."""

    def split(a):
        hi = a.astype(jnp.bfloat16)
        lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def d(x, y, dims):
        return jax.lax.dot_general(
            x, y, (dims, ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)

    # 3-pass f32-from-bf16 (drops lo·lo): the compensated form — the smallest
    # split that keeps BOTH first-order error terms. This is the SHIPPED
    # implementation (kernels/mhgsa._dot3) so the study measures exactly the
    # formula the flash kernels adopted.
    dot_bf16x3 = mhgsa._dot3

    def dot_bf16x2(a, b, dims):
        """2-pass (round-3 VERDICT item 4's literal construction): keeps only
        hi·hi + hi·lo, i.e. drops the symmetric lo·hi term — its |lo_a|·|hi_b|
        ≈ 2^-9 relative error is EXPECTED to land at DEFAULT-class 1e-3,
        outside the acos budget; measured here to close the question with a
        number rather than an argument."""
        a_hi, a_lo = split(a)
        b_hi, b_lo = split(b)
        del a_lo
        return d(a_hi, b_hi, dims) + d(a_hi, b_lo, dims)

    return {"BF16x3": dot_bf16x3, "BF16x2": dot_bf16x2}


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

        def dot_gram3(a, b, dims):
            """bf16x3 only for the Gram (contracting dim 1 vs 1); HIGHEST for
            the AV/probability matmuls. Uses the shipped mhgsa._dot3 split."""
            if dims == ((1,), (1,)):
                return mhgsa._dot3(a, b, dims)
            return orig_dot(a, b, dims)

        variants = dot_variants(orig_dot)
        for prec in ("HIGHEST", "BF16x3", "BF16x2", "GRAM3", "DEFAULT"):
            if prec in variants:
                mhgsa._dot = variants[prec]
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

    # --- 4096² flash-kernel cell (round-3 VERDICT item 4: the missing shape).
    # The shipped flash kernels now default to the compensated 3-pass form
    # (mhgsa.FLASH_GRAM_3PASS, adopted off this cell's measurement); pin it
    # OFF here so the _dot swap below still measures each variant. ---------
    mhgsa.FLASH_GRAM_3PASS = False
    B, L, Dh = 8, 4096, 64
    q = jnp.asarray(rng.standard_normal((B, L, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, Dh)), jnp.float32)
    ref2 = oracle_fp64(q[:2], k[:2], v[:2])    # fp64 oracle on a 2-row slice
    scale = np.abs(ref2).max()
    flops = 2 * B * L * L * (2 * Dh + 1)
    variants = dot_variants(orig_dot)
    for prec in ("HIGHEST", "BF16x3", "BF16x2"):
        if prec in variants:
            mhgsa._dot = variants[prec]
            mhgsa._PRECISION = jax.lax.Precision.DEFAULT
        else:
            mhgsa._dot = orig_dot
            mhgsa._PRECISION = jax.lax.Precision.HIGHEST

        @jax.jit
        def runf(q, k, v):
            return mhgsa.flash_geodesic_attention(q, k, v)

        out = np.asarray(runf(q, k, v))
        err = np.abs(out[:2] - ref2).max() / scale
        dt = time_chained(lambda q, k, v: runf(q, k, v), (q, k, v), 4)
        tfs = flops / dt / 1e12
        results.append((B, L, Dh, "flash-" + prec, err, dt * 1e6, tfs))
        print(f"B{B} L{L} Dh{Dh} flash-{prec:8s}  rel_err={err:.2e}  "
              f"{dt*1e6:8.1f} us  {tfs:6.2f} TF/s", flush=True)
    mhgsa._dot = orig_dot
    mhgsa._PRECISION = jax.lax.Precision.HIGHEST
    return results


if __name__ == "__main__":
    main()
