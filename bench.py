"""Benchmark: flagship STTODE training-step throughput on the attached device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measured config = the PRODUCTION RECIPE (BENCHMARKS.md headline table row 3,
round-3/4/5 notes): B=128 scenes x 11 agents, 16 optimizer steps per device
dispatch (lax.scan; round-4 on-chip sweep: S=8 60.5k, S=16 63.1k, S=32 63.0k
scenes/s — knee at 16), bf16 best-of-K selection decode with the winner
recomputed fp32 (select_dtype="bfloat16"), bf16-STORAGE differentiable decode
with fp32 master weights (decode_dtype="bfloat16", round-5 adoption: x1.062
at B=128 / x1.085 at B=512), selection kernel routed by the measured win
region (select_impl="auto"), GRU input projection un-hoisted at selection
row counts (automatic above SELECT_GRU_HOIST_MAX_ROWS).

Robustness (round-3 postmortem): BENCH_r03.json was rc=1 because the axon TPU
backend failed to initialize at ``jax.devices()`` time and jax CACHES backend
init failures in-process — an in-process retry can never succeed. So this
file is a thin launcher: the actual bench runs in a child process, and on
failure the launcher retries a FRESH child with backoff. The child is also
bounded by a wall-clock timeout so a hung tunnel cannot eat the driver
budget (first compile ~20-40 s; the persistent compilation cache keeps
retries cheap).

The reference publishes no numbers (BASELINE.md: README screenshots only), so
``vs_baseline`` is measured against the reference recipe's own stepping model
(one optimizer step processes one scene-batch; scenes/s is shape-portable
because the reference's per-scene cost is per-agent work, measured at
32x11 — BASELINE_MEASURED.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Reference throughput anchor: MEASURED, not estimated (BASELINE_MEASURED.json,
# scripts/measure_reference_baseline.py). The actual reference stage-1
# iteration (set_data_nba + forward + backward + Adam, fwd+bwd incl. the
# 20-sample diverse decode, train.py:72-95) on this host's CPU torch at
# 32 scenes x 11 agents, 5/10 horizons: 2.09 s/iter -> 15.3 scenes/s
# (best-of-3 windows of 12 iters). The reference's claimed RTX-3090 env is
# not available on this box; same-host CPU-vs-CPU our step is 2.36x faster
# (timing section of BASELINE_MEASURED.json), so a GPU anchor would land
# within a small factor.
REFERENCE_SCENES_PER_S = 15.3

# smoke-test overrides (BENCH_SCENES=4 BENCH_SCAN=2 BENCH_ITERS=2 lets the
# full launcher→child→JSON path run quickly on a CPU box); driver runs use
# the defaults = the production recipe
SCENES_PER_STEP = int(os.environ.get("BENCH_SCENES", "128"))
AGENTS = 11
SCAN_STEPS = int(os.environ.get("BENCH_SCAN", "16"))
# optimizer steps per device dispatch (lax.scan over
                         # stacked batches): the device step is ~2 ms but a
                         # dispatch through the tunneled chip costs ~4.5-35 ms,
                         # so single-step dispatch under-reports the hardware.
                         # This is the shipped train-loop path
                         # (train.make_train_step(scan_steps=...)).

ATTEMPTS = 3
BACKOFF_S = (15, 60)         # sleep before attempt 2, 3
# Per-attempt wall-clock bounds: attempt 1 carries the cold compile (~20-40 s
# per program through the tunnel, several programs — and the sidecar's four
# extra programs); retries hit the persistent compilation cache, so a retry
# that is slow is a HUNG tunnel, and a shorter bound stops it from eating
# the driver budget.
ATTEMPT_TIMEOUT_S = (2100, 900, 900)


def run_bench():
    """The actual benchmark — runs in the child process."""
    from sttode_tpu.utils.compilation_cache import enable as _enable_cache
    _enable_cache()
    import jax
    if os.environ.get("BENCH_PLATFORM"):
        # smoke-test hook: this box's sitecustomize imports jax at interpreter
        # start and registers the axon TPU platform, so the env var alone is
        # not enough to pin a platform — the config API is (tests/conftest.py)
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp
    import numpy as np
    import optax
    from sttode_tpu.models import Batch, STTODEConfig, sttode_init
    from sttode_tpu.train import make_train_step, stack_batches

    # production recipe (BENCHMARKS.md headline row 3): bf16 selection decode,
    # bf16-STORAGE differentiable decode (round-5 adoption: ×1.062 at B=128,
    # ×1.085 at B=512, fp32 master weights), Pallas selection kernel routed
    # by its measured win region
    cfg = STTODEConfig(past_length=5, future_length=10,
                       select_dtype="bfloat16",
                       decode_dtype="bfloat16",
                       select_impl="auto").validate()
    rng = np.random.default_rng(0)
    M = SCENES_PER_STEP * AGENTS

    def make_batch(seed):
        r = np.random.default_rng(seed)
        past = r.standard_normal((M, cfg.past_length, 2)).astype(np.float32)
        fut = r.standard_normal((M, cfg.future_length, 2)).astype(np.float32)
        past_vel = np.diff(past, axis=1, prepend=past[:, :1])
        fut_vel = np.diff(np.concatenate([past[:, -1:], fut], 1), axis=1)
        return Batch(past=jnp.asarray(past), past_vel=jnp.asarray(past_vel),
                     future=jnp.asarray(fut), future_vel=jnp.asarray(fut_vel),
                     valid=jnp.ones((M,), jnp.float32),
                     batch_size=SCENES_PER_STEP, agent_num=AGENTS)

    stacked = stack_batches([make_batch(i) for i in range(SCAN_STEPS)])

    params = sttode_init(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, scan_steps=SCAN_STEPS)

    key = jax.random.PRNGKey(1)
    # warmup / compile; the float() fetch is a HARD host sync — on the axon
    # tunnel block_until_ready returns before execution finishes (measured:
    # 8-step dispatches "completing" in 1.9 ms vs a 5.3 ms device time), so
    # every timing window must end with a real device->host value fetch.
    params, opt_state, metrics = step(params, opt_state, stacked, key)
    _ = float(np.asarray(metrics["total"]).ravel()[-1])

    # best-of-3 windows: tunneled-chip dispatch latency is noisy run-to-run;
    # windows are long (16 dispatches x 16 steps at B=128) to amortize the
    # ~35 ms tunnel fetch latency that closes each window.
    n_iters = int(os.environ.get("BENCH_ITERS", "16"))
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _i in range(n_iters):
            key, sub = jax.random.split(key)
            params, opt_state, metrics = step(params, opt_state, stacked, sub)
        assert np.isfinite(float(np.asarray(metrics["total"]).ravel()[-1]))
        best_dt = min(best_dt, time.perf_counter() - t0)

    steps_per_s = n_iters * SCAN_STEPS / best_dt
    scenes_per_s = steps_per_s * SCENES_PER_STEP
    print(json.dumps({
        "metric": "train_scenes_per_s",
        "value": round(scenes_per_s, 2),
        "unit": "scenes/s",
        "vs_baseline": round(scenes_per_s / REFERENCE_SCENES_PER_S, 3),
    }))
    sys.stdout.flush()

    # secondary-claims sidecar (round-5 VERDICT item 7): the repo's other
    # headline numbers, captured in THIS same hardened child run so the
    # driver's artifact verifies them too. Runs strictly AFTER the train
    # JSON line is printed+flushed — a sidecar failure can never cost the
    # primary metric (each section also fails soft into an "error" cell).
    if os.environ.get("BENCH_SIDECAR", "1") != "0":
        try:
            _write_sidecar(cfg, params)
        except Exception as e:  # noqa: BLE001 — sidecar must not kill bench
            print(f"sidecar failed: {e!r}", file=sys.stderr)

    sys.stderr.flush()
    # hard-exit: the TPU PJRT plugin's non-daemon grant thread otherwise
    # blocks interpreter teardown for minutes (see tests/conftest.py)
    os._exit(0)


def _write_sidecar(cfg, params):
    """BENCH_DETAILS sidecar: {inference scenes/s, dopri5 solves/s at solver
    defaults, flash 4096² fwd µs vs XLA, serving agent-axis scenes/s}.
    Methodologies mirror bench_details.py / scripts/serving_bench.py (chained
    in-jit loops + two-window differencing for sub-tunnel-latency programs);
    ledger drift bands in BENCHMARKS.md."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench_details as bd
    from sttode_tpu.models import STTODEConfig, sttode_inference, sttode_init

    out: dict = {}
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_SIDECAR_BUDGET", "600"))

    def section(name, fn):
        # own wall budget: the sidecar must finish inside the launcher's
        # per-attempt bound, or the child gets killed AFTER the primary JSON
        # line printed and the attempt is lost
        if time.perf_counter() - t_start > budget_s:
            out[name] = {"error": "sidecar budget exhausted"}
            return
        try:
            out[name] = fn()
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": repr(e)}
            print(f"sidecar section {name} failed: {e!r}", file=sys.stderr)

    # 1) inference best-of-20, B=32 x 11 agents (the ledger's config)
    def infer():
        B, N = 32, 11
        batch = bd.make_batch(cfg, B, N)

        def make_infer(n):
            @jax.jit
            def loop(p, key):
                def body(k, _):
                    k, sub = jax.random.split(k)
                    return k, jnp.sum(sttode_inference(p, cfg, batch, sub))
                return jax.lax.scan(body, key, None, length=n)[1]
            return lambda: loop(params, jax.random.PRNGKey(2))

        dt = bd._timed(make_infer, 100)
        return {"scenes_per_s": round(B / dt, 1),
                "device_ms_per_call": round(dt * 1e3, 3)}

    # 2) dopri5 at solver defaults (fp32-pinned adaptive; 71-step solve)
    def dopri():
        from sttode_tpu.nn import LayerConfig, encoder_stack_init
        from sttode_tpu.nn.ode_block import ode_encoder

        lcfg = LayerConfig(d_model=64, num_heads=8, ff_dim=1024)
        lparams = encoder_stack_init(jax.random.PRNGKey(0), lcfg, 1)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (32, 11, 1, 64)), jnp.float32)

        def make_ode(n):
            @jax.jit
            def run(x):
                def body(c, _):
                    x_same = jnp.where(jnp.isnan(c[0, 0, 0, 0]), c, x)
                    return ode_encoder(lparams, x_same, lcfg, time=12.0,
                                       method="dopri5", steps=1), None
                return jax.lax.scan(body, x, None, length=n)[0]
            return lambda: run(x)

        per = bd._timed(make_ode, 4)
        return {"solves_per_s": round(1 / per, 1),
                "ms_per_solve": round(per * 1e3, 2)}

    # 3) flash kernel vs XLA fusion at 4096² (fwd)
    def flash():
        from sttode_tpu.kernels import flash_geodesic_attention
        from sttode_tpu.nn.attention import geodesic_attention

        B, L, S, Dh = 8, 4096, 4096, 64
        r = np.random.default_rng(0)
        q = jnp.asarray(r.standard_normal((B, L, Dh)), jnp.float32)
        k = jnp.asarray(r.standard_normal((B, S, Dh)), jnp.float32)
        v = jnp.asarray(r.standard_normal((B, S, Dh)), jnp.float32)

        def make(fn):
            def m(n):
                f, _ = bd._chained(fn, n)
                return lambda: f(q, k, v)
            return m

        tp = bd._timed(make(lambda q, k, v:
                            flash_geodesic_attention(q, k, v)), 8)
        tx = bd._timed(make(lambda q, k, v: geodesic_attention(
            q, k, v, compat="tpu", fused=False)[0]), 8)
        return {"flash_us": round(tp * 1e6, 0), "xla_us": round(tx * 1e6, 0),
                "speedup_vs_xla": round(tx / tp, 2)}

    # 4) serving agent-axis sustained throughput (64 scenes/call, default
    #    pipeline depth — scripts/serving_bench.py methodology)
    def serving():
        import time as _time

        from sttode_tpu.data.synthetic import make_social_scenes
        from sttode_tpu.serving import Predictor

        scfg = STTODEConfig(compat="tpu", attn_axis="agent").validate()
        sparams = sttode_init(jax.random.PRNGKey(0), scfg)
        scenes = make_social_scenes(64, agents_range=(8, 8), seed=0)
        obs = [np.asarray(s["obs"], np.float32) for s in scenes]
        pred = Predictor(sparams, scfg, max_group=64)
        pred.predict_many(obs)          # warm/compile
        calls, lat = 20, []
        t_burst = time.perf_counter()
        for _ in range(calls):
            t0 = _time.perf_counter()
            pred.predict_many(obs)
            lat.append((_time.perf_counter() - t0) * 1e3)
        burst = time.perf_counter() - t_burst
        lat.sort()
        return {"scenes_per_s": round(len(obs) * calls / burst, 1),
                "p50_ms": round(lat[len(lat) // 2], 1)}

    section("inference_b32", infer)
    section("dopri5_defaults", dopri)
    section("flash_4096", flash)
    section("serving_agent_axis", serving)

    here = os.path.dirname(os.path.abspath(__file__))
    path = os.environ.get("BENCH_DETAILS_PATH",
                          os.path.join(here, "BENCH_DETAILS_r05.json"))
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"sidecar -> {path}: {json.dumps(out)}", file=sys.stderr)


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    last_err = ""
    for attempt in range(ATTEMPTS):
        if attempt:
            time.sleep(BACKOFF_S[min(attempt - 1, len(BACKOFF_S) - 1)])
        tmo = ATTEMPT_TIMEOUT_S[min(attempt, len(ATTEMPT_TIMEOUT_S) - 1)]
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run"],
                cwd=here, capture_output=True, text=True, timeout=tmo)
        except subprocess.TimeoutExpired:
            last_err = f"attempt {attempt + 1}: timed out after {tmo}s"
            print(last_err, file=sys.stderr)
            continue
        # accept any stdout line that parses as the bench JSON (warnings from
        # the experimental backend also land on stdout in some jax versions)
        for line in reversed(r.stdout.strip().splitlines()):
            try:
                obj = json.loads(line)
            except (json.JSONDecodeError, ValueError):
                continue
            if isinstance(obj, dict) and "metric" in obj:
                print(line)
                return 0
        last_err = (f"attempt {attempt + 1}: rc={r.returncode}\n"
                    f"{r.stderr[-2000:]}")
        print(last_err, file=sys.stderr)
    print(f"bench failed after {ATTEMPTS} attempts", file=sys.stderr)
    return 1


if __name__ == "__main__":
    if "--run" in sys.argv:
        run_bench()
    else:
        sys.exit(main())
