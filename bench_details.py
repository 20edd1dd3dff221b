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


def _timed(make_thunk, loop: int, repeats: int = 4) -> float:
    """Per-iteration device time of a chained-loop program.

    ``make_thunk(n)`` must return a zero-arg callable running n chained
    iterations in ONE jit. Times best-of-``repeats`` windows at n=loop and
    n=2·loop — the difference cancels the tunnel's dispatch+fetch constant
    (~35 ms, and it DRIFTS by several ms, so subtracting a separately
    measured baseline over-corrects; two same-moment window sizes don't).
    Each window closes with a real value fetch: block_until_ready is
    unreliable on this backend (see profiling._hard_sync)."""
    def best(thunk):
        o = thunk()
        np.asarray(jax.device_get(jnp.ravel(o)[:1]))     # compile + sync
        b = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            o = thunk()
            np.asarray(jax.device_get(jnp.ravel(o)[:1]))
            b = min(b, time.perf_counter() - t0)
        return b

    t1, t2 = best(make_thunk(loop)), best(make_thunk(2 * loop))
    return max((t2 - t1) / loop, 1e-9)


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

    # inference device time: key-chained calls in one dispatch, two-window
    # difference (a lone sub-ms call is unmeasurable through the tunnel)
    def make_infer(n):
        @jax.jit
        def infer_loop(p, key):
            def body(k, _):
                k, sub = jax.random.split(k)
                return k, jnp.sum(sttode_inference(p, cfg, batch, sub))
            return jax.lax.scan(body, key, None, length=n)[1]
        return lambda: infer_loop(params, jax.random.PRNGKey(2))

    dt = _timed(make_infer, 100)
    lines.append(f"| inference best-of-20 (same batch) | {dt * 1e3:.2f} ms | "
                 f"{B / dt:,.0f} scenes/s |")


def bench_ode(lines):
    cfg = LayerConfig(d_model=64, num_heads=8, ff_dim=1024)
    params = encoder_stack_init(jax.random.PRNGKey(0), cfg, 1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (32, 11, 1, 64)), jnp.float32)
    for method, steps in (("euler", 1), ("rk4", 8), ("dopri5", 1)):
        if method == "dopri5":
            # do NOT chain adaptive solves: the second solve integrates the
            # first's (smoother) output and takes far fewer steps, halving
            # the apparent cost. One ~800 ms solve dwarfs tunnel noise, so
            # plain repetition windows are fine here.
            fn = jax.jit(lambda x: ode_encoder(params, x, cfg, time=12.0,
                                               method="dopri5", steps=1))
            per = profiling.time_fn(fn, x, iters=2)["seconds_per_call"]
        else:
            # chain enough in-jit iterations that the window DIFFERENCE
            # rises above tunnel noise (euler is ~tens of µs/solve)
            loop = {"euler": 500, "rk4": 40}[method]

            def make_ode(n, m=method, s=steps):
                @jax.jit
                def run(x):
                    def body(c, _):
                        return ode_encoder(params, c, cfg, time=12.0,
                                           method=m, steps=s), None
                    return jax.lax.scan(body, x, None, length=n)[0]
                return lambda: run(x)

            per = _timed(make_ode, loop)
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

        def make_attn(fn):
            def make(n):
                f, _ = _chained(fn, n)
                return lambda: f(q, k, v)
            return make

        tp = _timed(make_attn(pallas_fn), loop)
        tx_s = _timed(make_attn(lambda q, k, v: geodesic_attention(
            q, k, v, compat="tpu", fused=False)[0]), loop)
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
    lines.append("Routing: `geodesic_attention(fused='auto')` uses XLA fusion below L·S = 256² where it wins decisively (tiny head dims pad 16× on the 128-lane MXU), the whole-S-in-VMEM fused kernel up to S ≈ 2k where it stably measures ~1.4× XLA (365-380 µs vs ~515 at 512²-1024² across repeated runs), and the S-tiled flash kernel (online softmax + LSE-replay backward) beyond. The flash kernel's deterministic win is structural: context bounded by HBM, not VMEM — XLA fusion must materialize the [L,S] score tensor (0.5-2 GB at 4-8k context) in HBM for forward AND keep it as a backward residual, the flash kernel never does; its wall-clock at 4096² ranges parity to ~1.7× XLA across runs (the controlled alternating A/B measured 7.2 vs 8.6 ms fwd, ~1.4× fwd+bwd) under this shared chip's contention. Methodology: every row chains N dependent calls in one dispatch and reports the best-of-window DIFFERENCE between N and 2N (cancels the ~35 ms dispatch+fetch tunnel constant, which drifts too much to subtract from a separate baseline); block_until_ready is unreliable on this backend.")
    report = "\n".join(lines) + "\n"
    with open("BENCHMARKS.md", "w") as f:
        f.write(report)
    print(report)


if __name__ == "__main__":
    main()
