"""Serving latency/throughput on the attached chip: `serving.Predictor`
end-to-end (pad → device → best-of-K decode → origin re-add → D2H), stage-1
prior decode and, when a sampler ckpt is given, the stage-2 DLow flow.

Latency here includes this box's tunneled-dispatch constant (~4.5-35 ms,
drifting) — a property of the test harness, not the chip; the marginal
scenes/s column is the hardware-meaningful number.

Run:  python scripts/serving_bench.py [--scenes 1,4,16] [--calls 30]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sttode_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

import jax
import numpy as np

from sttode_tpu.data.synthetic import make_social_scenes
from sttode_tpu.models import STTODEConfig, sttode_init
from sttode_tpu.serving import Predictor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="1,4,16")
    ap.add_argument("--calls", type=int, default=30)
    ap.add_argument("--agents", type=int, default=8)
    args = ap.parse_args()

    scenes = make_social_scenes(64, agents_range=(args.agents, args.agents),
                                seed=0)
    obs = [np.asarray(s["obs"], np.float32) for s in scenes]

    # three serving modes: scene-axis isolation serialized (the round-4
    # behavior: one device call per scene — isolated_group_max=1), scene-axis
    # isolation GROUPED (round-5: one vmapped dispatch, a lane per scene —
    # isolation by construction), and agent-axis micro-batching
    for label, cfg, igm in (
        ("scene-axis (isolated, serialized)", STTODEConfig().validate(), 1),
        ("scene-axis (isolated, vmapped-group)", STTODEConfig().validate(),
         64),
        ("agent-axis (micro-batched)",
         STTODEConfig(compat="tpu", attn_axis="agent").validate(), 64),
    ):
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        # pipeline A/B (round-3 VERDICT item 7): depth 1 = serial
        # dispatch→fetch per group; depth ≥2 overlaps group i's D2H fetch
        # with group i+1's dispatch. Only multi-group calls can pipeline —
        # the serialized scene-axis mode (1 scene/dispatch) is where it bites.
        for depth in (1, 2, 4):
            pred = Predictor(params, cfg, max_group=64, pipeline_depth=depth,
                             isolated_group_max=igm)
            print(f"-- {label}, pipeline_depth={depth} --", flush=True)
            for n in [int(x) for x in args.scenes.split(",")]:
                group = obs[:n]
                pred.predict_many(group)      # warm the bucket (compile)
                lat = []
                t_burst0 = time.perf_counter()
                for _ in range(args.calls):
                    t0 = time.perf_counter()
                    pred.predict_many(group)
                    lat.append((time.perf_counter() - t0) * 1e3)
                burst = time.perf_counter() - t_burst0
                p50 = statistics.median(lat)
                p95 = sorted(lat)[max(0, int(0.95 * len(lat)) - 1)]
                thr = n * args.calls / burst
                print(f"scenes/call={n:3d}  p50={p50:7.2f} ms  "
                      f"p95={p95:7.2f} ms  sustained={thr:8.1f} scenes/s  "
                      f"(K={pred.sample_k}, N={args.agents})", flush=True)

    os._exit(0)


if __name__ == "__main__":
    main()
