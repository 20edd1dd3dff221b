"""Detailed performance report (BASELINE.md targets): training/inference
throughput, ODE solver steps/sec, fused-MHGSA kernel TFLOP/s + roofline
utilization. Writes BENCHMARKS.md. The driver-facing single-line bench stays
in bench.py.

Run on the attached TPU:  python bench_details.py
"""

from __future__ import annotations

import time

import numpy as np

from sttode_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp
import optax

from sttode_tpu.models import Batch, STTODEConfig, sttode_forward, \
    sttode_inference, sttode_init
from sttode_tpu.nn import LayerConfig, encoder_stack_init
from sttode_tpu.nn.ode_block import ode_encoder
from sttode_tpu.kernels import fused_geodesic_attention
from sttode_tpu.nn.attention import geodesic_attention
from sttode_tpu.utils import profiling


def make_batch(cfg, B, N, seed=0):
    rng = np.random.default_rng(seed)
    M = B * N
    past = rng.standard_normal((M, cfg.past_length, 2)).astype(np.float32)
    fut = rng.standard_normal((M, cfg.future_length, 2)).astype(np.float32)
    pv = np.diff(past, axis=1, prepend=past[:, :1])
    fv = np.diff(np.concatenate([past[:, -1:], fut], 1), axis=1)
    return Batch(past=jnp.asarray(past), past_vel=jnp.asarray(pv),
                 future=jnp.asarray(fut), future_vel=jnp.asarray(fv),
                 valid=jnp.ones((M,), jnp.float32), batch_size=B, agent_num=N)


def bench_train_and_infer(lines):
    cfg = STTODEConfig(past_length=5, future_length=10)
    B, N = 32, 11
    batch = make_batch(cfg, B, N)
    params = sttode_init(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    from sttode_tpu.train import make_train_step, stack_batches

    key = jax.random.PRNGKey(1)
    step1 = make_train_step(cfg, opt, donate=False)
    r = profiling.time_fn(step1, params, opt_state, batch, key, iters=20)
    dt = r["seconds_per_call"]
    lines.append(f"| train step, 1 per dispatch (B=32 scenes × 11 agents, "
                 f"K=20 diverse) | {dt * 1e3:.2f} ms | {B / dt:,.0f} scenes/s |")

    S = 8
    stacked = stack_batches([make_batch(cfg, B, N, seed=i) for i in range(S)])
    stepS = make_train_step(cfg, opt, donate=False, scan_steps=S)
    r = profiling.time_fn(stepS, params, opt_state, stacked, key, iters=12)
    dt = r["seconds_per_call"] / S
    lines.append(f"| train step, scanned ×{S} per dispatch (same batch shape) "
                 f"| {dt * 1e3:.2f} ms | {B / dt:,.0f} scenes/s |")

    infer = jax.jit(lambda p, k: sttode_inference(p, cfg, batch, k))
    r = profiling.time_fn(infer, params, jax.random.PRNGKey(2), iters=30)
    dt = r["seconds_per_call"]
    lines.append(f"| inference best-of-20 (same batch) | {dt * 1e3:.2f} ms | "
                 f"{B / dt:,.0f} scenes/s |")


def bench_ode(lines):
    cfg = LayerConfig(d_model=64, num_heads=8, ff_dim=1024)
    params = encoder_stack_init(jax.random.PRNGKey(0), cfg, 1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (32, 11, 1, 64)), jnp.float32)
    for method, steps in (("euler", 1), ("rk4", 8), ("dopri5", 1)):
        loop = 1 if method == "dopri5" else 20   # sub-ms solves: chain in-jit

        def run(x, m=method, s=steps, n=loop):
            def body(c, _):
                return ode_encoder(params, c, cfg, time=12.0, method=m,
                                   steps=s), None
            return jax.lax.scan(body, x, None, length=n)[0]

        r = profiling.time_fn(jax.jit(run), x,
                              iters=2 if method == "dopri5" else 10)
        per = r["seconds_per_call"] / loop
        evals = {"euler": steps, "rk4": 4 * steps, "dopri5": "adaptive"}[method]
        lines.append(f"| ODE encoder {method} ({evals} RHS evals) | "
                     f"{per * 1e3:.2f} ms | {1 / per:,.0f} solves/s |")


def _chained(attn_fn, loop: int = 30):
    """Time-stable microbench program: `loop` dependent kernel calls inside
    ONE jit (output feeds the next call's q), so device work dominates the
    tunnel's per-dispatch noise. Per-call time = dispatch time / loop."""
    def run(q, k, v):
        def body(c, _):
            return attn_fn(c, k, v), None
        return jax.lax.scan(body, q, None, length=loop)[0]
    return jax.jit(run), loop


def _fetch_baseline(q, repeats: int = 4) -> float:
    """Best-of constant per-dispatch overhead (dispatch RPC + device→host
    value fetch, ~35 ms through the tunnel) measured on a trivial program —
    subtracted from kernel windows so per-call figures are device time, not
    tunnel latency."""
    trivial = jax.jit(lambda q: q * 1.0)
    o = trivial(q)
    np.asarray(jax.device_get(o[0, 0, :1]))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        o = trivial(q)
        np.asarray(jax.device_get(o[0, 0, :1]))
        best = min(best, time.perf_counter() - t0)
    return best


def _best_of(fn, q, k, v, loop: int, baseline: float,
             repeats: int = 4) -> float:
    """Best single-dispatch wall time, minus the constant dispatch+fetch
    baseline, divided by loop. Each window is closed by a real value fetch
    (block_until_ready lies on this backend — see profiling._hard_sync).
    Stable to ~2% across runs where slope estimates swung by multiples under
    tunnel contention."""
    o = fn(q, k, v)  # compile
    np.asarray(jax.device_get(o[0, 0, :1]))   # sync so window 1 isn't queued
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        o = fn(q, k, v)
        np.asarray(jax.device_get(o[0, 0, :1]))
        best = min(best, time.perf_counter() - t0)
    return max(best - baseline, 1e-9) / loop


def bench_kernel(lines):
    from sttode_tpu.kernels import flash_geodesic_attention
    cases = [
        ("fused", (2816, 32, 32, 8)),
        ("fused", (64, 512, 512, 64)),
        ("fused", (16, 1024, 1024, 64)),
        ("flash", (8, 4096, 4096, 64)),   # beyond the fused VMEM ceiling
    ]
    for kind, (B, L, S, Dh) in cases:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((B, L, Dh)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, S, Dh)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, S, Dh)), jnp.float32)
        pallas_fn = (lambda q, k, v: flash_geodesic_attention(q, k, v)) \
            if kind == "flash" else \
            (lambda q, k, v: fused_geodesic_attention(q, k, v,
                                                      interpret=False))
        loop = 8 if kind == "flash" else 30
        fp, n = _chained(pallas_fn, loop)
        fx, _ = _chained(lambda q, k, v: geodesic_attention(
            q, k, v, compat="tpu", fused=False)[0], loop)
        baseline = _fetch_baseline(q)
        tp = _best_of(fp, q, k, v, n, baseline)
        tx_s = _best_of(fx, q, k, v, n, baseline)
        flops = 2 * B * L * S * (2 * Dh)   # Gram + AV matmuls
        lines.append(
            f"| MHGSA B{B}·L{L}·S{S}·D{Dh} | {kind} "
            f"{tp * 1e6:.0f} µs ({flops / tp / 1e12:.2f} TF/s) | "
            f"XLA {tx_s * 1e6:.0f} µs ({flops / tx_s / 1e12:.2f} TF/s) |")


def main():
    dev = jax.devices()[0]
    lines = [
        "# BENCHMARKS — measured on " + str(dev.device_kind),
        "",
        f"jax {jax.__version__}, backend {jax.default_backend()}; fp32 "
        "params/compute, HIGHEST-precision Gram (acos numerics).",
        "",
        "| benchmark | latency | throughput |",
        "|---|---|---|",
    ]
    bench_train_and_infer(lines)
    bench_ode(lines)
    lines.append("")
    lines.append("| MHGSA shape | fused Pallas | XLA fusion |")
    lines.append("|---|---|---|")
    bench_kernel(lines)
    lines.append("")
    lines.append("Routing: `geodesic_attention(fused='auto')` uses XLA fusion below L·S = 256² where it wins decisively (tiny head dims pad 16× on the 128-lane MXU), the whole-S-in-VMEM fused kernel up to S ≈ 2k where it measures ~1.4× XLA, and the S-tiled flash kernel (online softmax + LSE-replay backward) beyond — context bounded by HBM, not VMEM, ~1.5× XLA forward at 4096² and ~1.4× fwd+bwd, while XLA materializes the 0.5-2 GB score tensor in HBM (OOMs first as context grows) and the flash kernel never does. Methodology: kernel rows chain N dependent calls in one dispatch, take best-of-4 windows closed by a real value fetch, and subtract a measured dispatch+fetch baseline (~35 ms through this tunnel) — block_until_ready is unreliable on this backend and slope estimates swung by multiples under contention.")
    report = "\n".join(lines) + "\n"
    with open("BENCHMARKS.md", "w") as f:
        f.write(report)
    print(report)


if __name__ == "__main__":
    main()
