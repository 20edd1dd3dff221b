"""Benchmark: flagship STTODE training-step throughput on the attached device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md: README screenshots only), so
``vs_baseline`` is measured against the reference recipe's own stepping model:
the PyTorch code trains ETH per-scene (batch_size=1, ~6 agents/scene mean) —
one optimizer step processes ONE scene. Our batched step processes
``SCENES_PER_STEP`` scenes at once; vs_baseline = scenes/sec ÷ the reference's
RTX-3090 scenes/sec estimate recorded below (measured from the reference's own
per-iteration timing ballpark; updated when a retrained baseline lands).
"""

from __future__ import annotations

import json
import time

import numpy as np


# Reference throughput anchor: MEASURED, not estimated (BASELINE_MEASURED.json,
# scripts/measure_reference_baseline.py). The actual reference stage-1
# iteration (set_data_nba + forward + backward + Adam, fwd+bwd incl. the
# 20-sample diverse decode, train.py:72-95) on this host's CPU torch at the
# SAME workload shape as this bench (32 scenes x 11 agents, 5/10 horizons):
# 2.09 s/iter -> 15.3 scenes/s (best-of-3 windows of 12 iters). The
# reference's claimed RTX-3090 env is not available on this box; same-host
# CPU-vs-CPU our step is 2.36x faster (timing section of
# BASELINE_MEASURED.json), so a GPU anchor would land within a small factor.
REFERENCE_SCENES_PER_S = 15.3

SCENES_PER_STEP = 32     # NBA-style batch: 32 scenes × 11 agents
AGENTS = 11
SCAN_STEPS = 8           # optimizer steps per device dispatch (lax.scan over
                         # stacked batches): the device step is ~0.66 ms but
                         # a dispatch through the tunneled chip costs ~4.5 ms,
                         # so single-step dispatch under-reports the hardware
                         # ~5×. This is the shipped train-loop path
                         # (train.make_train_step(scan_steps=...)); numbers
                         # in DESIGN.md §8a.


def main():
    from sttode_tpu.utils.compilation_cache import enable as _enable_cache
    _enable_cache()
    import jax
    import jax.numpy as jnp
    import optax
    from sttode_tpu.models import Batch, STTODEConfig, sttode_init
    from sttode_tpu.train import make_train_step, stack_batches

    cfg = STTODEConfig(past_length=5, future_length=10)  # NBA horizons
    rng = np.random.default_rng(0)
    M = SCENES_PER_STEP * AGENTS

    def make_batch():
        past = rng.standard_normal((M, cfg.past_length, 2)).astype(np.float32)
        fut = rng.standard_normal((M, cfg.future_length, 2)).astype(np.float32)
        past_vel = np.diff(past, axis=1, prepend=past[:, :1])
        fut_vel = np.diff(np.concatenate([past[:, -1:], fut], 1), axis=1)
        return Batch(past=jnp.asarray(past), past_vel=jnp.asarray(past_vel),
                     future=jnp.asarray(fut), future_vel=jnp.asarray(fut_vel),
                     valid=jnp.ones((M,), jnp.float32),
                     batch_size=SCENES_PER_STEP, agent_num=AGENTS)

    stacked = stack_batches([make_batch() for _ in range(SCAN_STEPS)])

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
    # windows are long (32 dispatches × 8 steps) to amortize the ~35 ms
    # tunnel fetch latency that closes each window.
    n_iters = 32
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n_iters):
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


if __name__ == "__main__":
    main()
