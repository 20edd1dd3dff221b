"""Detailed performance report (BASELINE.md targets): training/inference
throughput, ODE solver steps/sec, fused-MHGSA kernel TFLOP/s + roofline
utilization. Writes BENCHMARKS.md. The driver-facing single-line bench stays
in bench.py.

Run on the attached TPU:  python bench_details.py
"""

from __future__ import annotations

import os
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

    t_n, t_2n = make_thunk(loop), make_thunk(2 * loop)
    # a transient tunnel stall inside one window can leave t2 <= t1 (a
    # nonsensical <=0 per-iteration difference) or an outlier row; retry
    # the window pair rather than publishing a corrupted cell
    for _ in range(3):
        t1, t2 = best(t_n), best(t_2n)
        if t2 > t1 * 1.05:
            return (t2 - t1) / loop
    # still collapsed after 3 pairs: the measurement is not trustworthy —
    # return NaN so the table cell is loudly invalid instead of an absurd
    # number (a 0 µs / 4e6-TF/s cell shipped from exactly this failure once)
    import sys
    print(f"_timed: window difference collapsed 3x (t1={t1:.4f}s "
          f"t2={t2:.4f}s, loop={loop}) — emitting NaN", file=sys.stderr)
    return float("nan")


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

    # the recommended production recipe (round-4/5 notes): B=128, scanned ×16
    # (bench.py's BENCH_SCAN default — the measured knee), bf16 best-of-K
    # selection (winner recomputed fp32, GRU un-hoisted at selection rows),
    # bf16-storage differentiable decode (round-5: ×1.06-1.09)
    Bp = 128
    Sp = int(os.environ.get("BENCH_SCAN", "16"))
    cfg_p = cfg._replace(select_dtype="bfloat16",
                         decode_dtype="bfloat16").validate()
    params_p = sttode_init(jax.random.PRNGKey(0), cfg_p)
    opt_state_p = opt.init(params_p)
    stacked_p = stack_batches([make_batch(cfg_p, Bp, N, seed=i)
                               for i in range(Sp)])
    step_p = make_train_step(cfg_p, opt, donate=False, scan_steps=Sp)
    r = profiling.time_fn(step_p, params_p, opt_state_p, stacked_p, key,
                          iters=12)
    dt = r["seconds_per_call"] / Sp
    lines.append(f"| train step, production recipe (B={Bp} × {N}, scanned "
                 f"×{Sp}, bf16 selection) | {dt * 1e3:.2f} ms | "
                 f"{Bp / dt:,.0f} scenes/s |")

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
            # chaining adaptive solves on the RUNNING state distorts (the
            # second solve integrates the first's smoother output and takes
            # fewer steps), so chain solves of the SAME initial state: the
            # never-true runtime select keeps a data dependency XLA cannot
            # fold, making every chained solve identical (71 steps at the
            # fp32-pinned default tolerances — ~41 ms/solve, no longer large
            # vs the ~35 ms tunnel constant, hence window differencing)
            def make_ode(n):
                @jax.jit
                def run(x):
                    def body(c, _):
                        x_same = jnp.where(jnp.isnan(c[0, 0, 0, 0]), c, x)
                        return ode_encoder(params, x_same, cfg, time=12.0,
                                           method="dopri5", steps=1), None
                    return jax.lax.scan(body, x, None, length=n)[0]
                return lambda: run(x)

            per = _timed(make_ode, 4)
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


def _poincare_xla(qb, kb, v):
    """XLA closed-form poincare attention on ball points (the dense-path
    program the Pallas poincare kernel is measured against)."""
    from sttode_tpu.manifolds import pmath
    s = -pmath.dist_matrix_gram(qb, kb)
    return jnp.einsum("bls,bsd->bld", jax.nn.softmax(s, axis=-1), v,
                      precision=jax.lax.Precision.HIGHEST)


def bench_kernel(lines):
    from sttode_tpu.kernels import flash_geodesic_attention
    from sttode_tpu.kernels.packed_mhgsa import packed_geodesic_attention
    # the packed kernel takes an explicit head axis [B, H, L, Dh]; measured
    # at the agent-axis shape (N=11 keys) where its win is largest
    for (B, H, L, Dh) in [(352, 8, 11, 8), (352, 8, 32, 8)]:
        rng = np.random.default_rng(0)
        qh = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
        kh = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
        vh = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)

        def make(fn):
            def m(n):
                f, _ = _chained(fn, n)
                return lambda: f(qh, kh, vh)
            return m

        xla4 = lambda q, k, v: geodesic_attention(
            q, k, v, compat="tpu", fused=False, need_weights=False)[0]
        loop = max(8, 30 * 32 * 32 // (L * L))
        # fwd+bwd is the decision-relevant number (training dominates; the
        # packed win lives in the recompute backward — fwd-only XLA wins)
        rows = {}
        for nm, fn in (("packed",
                        lambda q, k, v: packed_geodesic_attention(q, k, v)),
                       ("XLA", xla4)):
            g = jax.grad(lambda q, k, v: jnp.sum(fn(q, k, v)))
            def mk(n, g=g):
                f, _ = _chained(lambda q, k, v: g(q, k, v), n)
                return lambda: f(qh, kh, vh)
            rows[nm] = (_timed(make(fn), loop),
                        _timed(mk, max(loop // 2, 8)))
        lines.append(
            f"| MHGSA B{B}·H{H}·L{L}·S{L}·D{Dh} | packed "
            f"{rows['packed'][0] * 1e6:.0f} µs fwd / "
            f"{rows['packed'][1] * 1e6:.0f} µs f+b | XLA "
            f"{rows['XLA'][0] * 1e6:.0f} µs fwd / "
            f"{rows['XLA'][1] * 1e6:.0f} µs f+b |")

    cases = [
        ("fused", (64, 512, 512, 64)),
        ("fused", (16, 1024, 1024, 64)),
        ("flash", (8, 4096, 4096, 64)),   # beyond the fused VMEM ceiling
        ("fused-poincare", (16, 1024, 1024, 64)),
    ]
    for kind, (B, L, S, Dh) in cases:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((B, L, Dh)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, S, Dh)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, S, Dh)), jnp.float32)
        if kind == "fused-poincare":
            # ball points in, so both paths measure the same score program
            from sttode_tpu.manifolds import pmath
            q = pmath.project(pmath.expmap0(q * 0.3))
            k = pmath.project(pmath.expmap0(k * 0.3))
            pallas_fn = (lambda q, k, v: fused_geodesic_attention(
                q, k, v, metric="poincare", interpret=False))
            xla_fn = (lambda q, k, v: _poincare_xla(q, k, v))
        else:
            pallas_fn = (lambda q, k, v: flash_geodesic_attention(q, k, v)) \
                if kind == "flash" else \
                (lambda q, k, v: fused_geodesic_attention(q, k, v,
                                                          interpret=False))
            xla_fn = (lambda q, k, v: geodesic_attention(
                q, k, v, compat="tpu", fused=False)[0])
        loop = 8 if kind == "flash" else 30

        def make_attn(fn):
            def make(n):
                f, _ = _chained(fn, n)
                return lambda: f(q, k, v)
            return make

        tp = _timed(make_attn(pallas_fn), loop)
        tx_s = _timed(make_attn(xla_fn), loop)
        flops = 2 * B * L * S * (2 * Dh)   # Gram + AV matmuls
        lines.append(
            f"| MHGSA B{B}·L{L}·S{S}·D{Dh} | {kind} "
            f"{tp * 1e6:.0f} µs ({flops / tp / 1e12:.2f} TF/s) | "
            f"XLA {tx_s * 1e6:.0f} µs ({flops / tx_s / 1e12:.2f} TF/s) |")


def _attainable_tflops(intensity_flops_per_byte: float, chip="v5e",
                       dtype="f32") -> tuple[float, str]:
    """Roofline attainable = min(peak FLOP/s, intensity × peak HBM BW);
    returns (TF/s, binding resource)."""
    peak_tf = profiling.PEAK_TFLOPS[chip][dtype]
    bw_tf = intensity_flops_per_byte * profiling.PEAK_HBM_GBPS[chip] / 1e3
    if bw_tf < peak_tf:
        return bw_tf, "HBM"
    return peak_tf, "MXU"


def bench_roofline(lines):
    """Achieved vs attainable (BASELINE.md '≥90% of attainable roofline'
    target row — round-1 VERDICT item 5). Attainable is the roofline bound at
    the workload's own arithmetic intensity: min(peak MXU FLOP/s,
    intensity × peak HBM GB/s), v5e public specs (394 bf16 / 98.5 fp32
    TFLOP/s, 819 GB/s)."""
    lines.append("")
    lines.append("## Roofline utilization (achieved vs attainable)")
    lines.append("")
    lines.append("| workload | intensity (FLOP/B) | bound | achieved | "
                 "attainable | % of attainable |")
    lines.append("|---|---|---|---|---|---|")

    # --- full train step: XLA's own cost model for flops+bytes ---
    cfg = STTODEConfig(past_length=5, future_length=10)
    B, N = 32, 11
    batch = make_batch(cfg, B, N)
    params = sttode_init(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)
    from sttode_tpu.train import make_train_step, stack_batches
    step = make_train_step(cfg, opt, donate=False)
    key = jax.random.PRNGKey(1)
    costs = profiling.cost_analysis(step, params, opt_state, batch, key)
    # time the SHIPPED path (scanned multi-step dispatch): a single-step
    # dispatch through the tunnel carries ~0.4 ms of launch overhead that
    # is not device time and would understate utilization ~2×
    S = 8
    stepS = make_train_step(cfg, opt, donate=False, scan_steps=S)
    stacked = stack_batches([make_batch(cfg, B, N, seed=i) for i in range(S)])
    dt = profiling.time_fn(stepS, params, opt_state, stacked, key,
                           iters=12)["seconds_per_call"] / S
    intensity = costs["flops"] / costs["bytes_accessed"]
    att_tf, bound = _attainable_tflops(intensity)
    if bound == "HBM":
        achieved = costs["bytes_accessed"] / dt / 1e9
        attainable = profiling.PEAK_HBM_GBPS["v5e"]
        unit = "GB/s"
    else:
        achieved = costs["flops"] / dt / 1e12
        attainable = profiling.PEAK_TFLOPS["v5e"]["f32"]
        unit = "TF/s"
    lines.append(
        f"| train step fwd+bwd+adam (32×11, K=20, fp32, scanned ×{S}) "
        f"| {intensity:.0f} "
        f"| {bound} | {achieved:,.0f} {unit} | {attainable:,.0f} {unit} "
        f"| **{100 * achieved / attainable:.0f}%** |")

    # --- MHGSA kernels: analytic flops/bytes (XLA's cost model cannot see
    # inside a pallas custom call) ---
    from sttode_tpu.kernels import flash_geodesic_attention
    kernel_cases = [
        ("fused", fused_geodesic_attention, (64, 512, 512, 64), 30),
        ("fused", fused_geodesic_attention, (16, 1024, 1024, 64), 30),
        ("flash", flash_geodesic_attention, (8, 4096, 4096, 64), 8),
    ]
    for kind, kfn, (Bk, L, S, Dh), loop in kernel_cases:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((Bk, L, Dh)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((Bk, S, Dh)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((Bk, S, Dh)), jnp.float32)

        def make(n, fn=kfn):
            f, _ = _chained(lambda q, k, v: fn(q, k, v), n)
            return lambda: f(q, k, v)

        dt = _timed(make, loop)
        flops = 2 * Bk * L * S * (2 * Dh)          # Gram + AV MXU matmuls
        bytes_min = 4 * 4 * (Bk * L * Dh)          # q,k,v,out fp32, S==L here
        intensity = flops / bytes_min
        att_tf, bound = _attainable_tflops(intensity)
        achieved_tf = flops / dt / 1e12
        lines.append(
            f"| MHGSA {kind} {Bk}×{L}×{S}×{Dh} (fp32 Gram) | {intensity:.0f} "
            f"| {bound} | {achieved_tf:.1f} TF/s | {att_tf:.1f} TF/s "
            f"| **{100 * achieved_tf / att_tf:.0f}%** |")

    lines.append("")
    lines.append(
        "Verdict vs BASELINE.md's '≥90% of attainable' target: the TRAIN STEP "
        "is the honest headline — its utilization is reported above against "
        "the bound its own intensity selects. Two systematic caveats on that "
        "row: (a) the byte count comes from XLA's per-op cost model, which "
        "includes intermediates that fusion never materializes to HBM, so "
        "the modeled traffic is an UPPER bound and the ratio can exceed 100% "
        "— a reading ≥100% means the step beats its own un-fused traffic "
        "model (fusion efficiency), not that the chip exceeds its bandwidth; "
        "true physical-HBM utilization needs a hardware profiler this "
        "tunneled backend does not expose. (b) run-to-run throughput drift "
        "on this shared chip is ±20-30% (the same scanned step measured "
        "0.65-0.99 ms across sessions on one day) — cross-table comparisons "
        "within one generation are valid, absolute levels carry that band. "
        "The standalone MHGSA kernel rows are compute-bound at their "
        "intensities but the acos/clip/neg epilogue and softmax run on the "
        "VPU (8 lanes/cycle) not the MXU, and the fp32 Gram is mandated by "
        "acos numerics (bf16 Gram error ~2e-3 → ~0.06 rad score noise, "
        "manifolds/oblique.py:47-62), so their MXU-peak fraction understates "
        "kernel quality; the XLA-vs-Pallas A/B in the table above is the "
        "decision-relevant comparison. Where a row misses 90%, the named "
        "bound is the reason recorded here rather than a silent pass.")


def main():
    dev = jax.devices()[0]
    lines = [
        "# BENCHMARKS — measured on " + str(dev.device_kind),
        "",
        f"jax {jax.__version__}, backend {jax.default_backend()}; fp32 "
        "params/compute. Gram precision: fused/packed kernels HIGHEST "
        "(acos numerics; 3-pass measured a wash at their VPU-bound shapes), "
        "flash kernels compensated 3-pass bf16 (round-4 adoption, ×1.2 at "
        "4096²; poincaré score-path Gram stays HIGHEST).",
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
    bench_roofline(lines)
    lines.append("")
    lines.append("Routing: `geodesic_attention(fused='auto')` is a four-way measured split — the head-packed kernel at the smallest shapes (L·S ≤ 32² with a head axis, H·Dh ≤ 128: the lane dim carries all H heads so Dh=8 stops padding 16×; measured win ×1.12 f+b at L=S=8-16, parity at 24-32), XLA fusion in the mid band 32² < L·S < 256² where it wins decisively (0.62-0.82 xla/packed at 48-128 — and the packed VMEM stack can't fit ≥128² anyway, see round-3 notes), the whole-S-in-VMEM fused kernel from 256² up to its VMEM ceiling S ≈ 2k (~1.4× XLA at 512²-1024², +11.5% on the whole B=512 train step), and the S-tiled flash kernel (maxless streaming softmax + LSE-replay backward) beyond. The flash kernel's deterministic win is structural: context bounded by HBM, not VMEM — XLA fusion must materialize the [L,S] score tensor (0.5-2 GB at 4-8k context) in HBM for forward AND keep it as a backward residual, the flash kernel never does. Methodology: every row chains N dependent calls in one dispatch and reports the best-of-window DIFFERENCE between N and 2N (cancels the ~35 ms dispatch+fetch tunnel constant, which drifts too much to subtract from a separate baseline); block_until_ready is unreliable on this backend.")
    # preserve the hand-curated notes sections (perf notes, negative
    # results) that live below the generated tables
    manual = ""
    try:
        with open("BENCHMARKS.md") as f:
            old = f.read()
        idx = old.find("## Round-2 perf notes")
        if idx != -1:
            manual = "\n" + old[idx:]
    except FileNotFoundError:
        pass
    report = "\n".join(lines) + "\n" + manual
    with open("BENCHMARKS.md", "w") as f:
        f.write(report)
    print(report)


if __name__ == "__main__":
    main()
