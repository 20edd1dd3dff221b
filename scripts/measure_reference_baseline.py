"""Measure the ACTUAL reference implementation as the performance baseline.

Round-1 VERDICT item 3: bench.py anchored ``vs_baseline`` to an RTX-3090
*estimate*. This script times the real reference recipe (torch CPU — the only
torch device on this box) and our framework on the SAME host CPU and the same
synthetic scenes, producing measured numbers with provenance:

- ``timing``       — stage-1 training-iteration throughput (fwd+bwd+Adam),
  NBA-style batched (B=32, N=11, 5/10) and ETH-style per-scene (B=1, N=6,
  8/12) — the reference's two stepping modes (train.py:55-95).
- ``convergence``  — short-train both implementations on a shared synthetic
  fixture, evaluate best-of-20 min-ADE/FDE on held-out scenes; the
  reference-vs-rebuild accuracy table for CONVERGENCE.md.

Writes results to BASELINE_MEASURED.json (merged, keyed by section).

Usage:
    python scripts/measure_reference_baseline.py timing
    python scripts/measure_reference_baseline.py convergence [--epochs 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# CPU jax for the apples-to-apples same-host comparison (must precede jax
# backend init; the sitecustomize imports jax so pin via config too).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import torch  # noqa: E402

from tests.reference_harness import load_reference  # noqa: E402

OUT_PATH = os.path.join(REPO, "BASELINE_MEASURED.json")


def _ref_args(hidden_dim=64, zdim=32, past_length=5, future_length=10):
    import types

    return types.SimpleNamespace(
        hidden_dim=hidden_dim, zdim=zdim, hyper_scales=[5, 11],
        past_length=past_length, future_length=future_length,
        num_decompose=2, min_clip=2.0, learn_prior=False, ztype="gaussian",
        sample_k=20, max_train_agent=100, rand_rot_scene=False,
        discrete_rot=False, dataset="nba")


def _scenes_to_nba_arrays(scenes, obs_len, pred_len):
    """[S, N, T, 2] arrays from fixed-N synthetic scenes."""
    past = np.stack([s["obs"] for s in scenes]).astype(np.float32)
    fut = np.stack([s["pred"] for s in scenes]).astype(np.float32)
    assert past.shape[2] == obs_len and fut.shape[2] == pred_len
    return past, fut


def _make_fixture(n_scenes, n_agents, obs_len, pred_len, seed):
    from sttode_tpu.data.synthetic import make_social_scene

    rng = np.random.default_rng(seed)
    scenes = []
    for _ in range(n_scenes):
        traj = make_social_scene(rng, n_agents=n_agents,
                                 seq_len=obs_len + pred_len)
        scenes.append({"obs": traj[:, :obs_len], "pred": traj[:, obs_len:]})
    return scenes


def _jax_batch(past, fut, B, N):
    import jax.numpy as jnp

    from sttode_tpu.models import Batch

    M = B * N
    past = past.reshape(M, past.shape[-2], 2)
    fut = fut.reshape(M, fut.shape[-2], 2)
    past_vel = np.concatenate([past[:, 1:2] - past[:, 0:1],
                               past[:, 1:] - past[:, :-1]], axis=1)
    fut_vel = fut - np.concatenate([past[:, -1:], fut[:, :-1]], axis=1)
    return Batch(past=jnp.asarray(past), past_vel=jnp.asarray(past_vel),
                 future=jnp.asarray(fut), future_vel=jnp.asarray(fut_vel),
                 valid=jnp.ones((M,), np.float32), batch_size=B, agent_num=N)


# --------------------------------------------------------------------------- #
# timing                                                                      #
# --------------------------------------------------------------------------- #

def _time_reference_step(B, N, obs_len, pred_len, iters=12):
    """Reference stage-1 iteration: set_data_nba + forward + backward + Adam
    (train.py:72-95 NBA branch)."""
    ref = load_reference()
    args = _ref_args(past_length=obs_len, future_length=pred_len)
    net = ref.sttode.STTODENet(args, torch.device("cpu"))
    net.train()
    opt = torch.optim.Adam(net.parameters(), lr=1e-4)
    rng = np.random.default_rng(0)
    scenes = _make_fixture(B, N, obs_len, pred_len, seed=1)
    past, fut = _scenes_to_nba_arrays(scenes, obs_len, pred_len)
    data = {"past_traj": torch.tensor(past), "future_traj": torch.tensor(fut)}

    def one_step():
        net.set_data_nba(data)
        total, *_ = net.forward()
        opt.zero_grad()
        total.backward()
        opt.step()

    one_step()  # warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            one_step()
        best = min(best, (time.perf_counter() - t0) / iters)
    del rng
    return best


def _time_ours_cpu_step(B, N, obs_len, pred_len, iters=12):
    """Our jitted train step on the same host CPU, same shapes."""
    import optax

    from sttode_tpu.models import STTODEConfig, sttode_init
    from sttode_tpu.train import make_train_step

    cfg = STTODEConfig(past_length=obs_len, future_length=pred_len)
    scenes = _make_fixture(B, N, obs_len, pred_len, seed=1)
    past, fut = _scenes_to_nba_arrays(scenes, obs_len, pred_len)
    batch = _jax_batch(past, fut, B, N)
    params = sttode_init(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)
    key = jax.random.PRNGKey(1)
    params, opt_state, m = step(params, opt_state, batch, key)
    _ = float(np.asarray(m["total"]))  # warmup + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            key, sub = jax.random.split(key)
            params, opt_state, m = step(params, opt_state, batch, sub)
        _ = float(np.asarray(m["total"]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def run_timing():
    results = {"host": os.uname().nodename,
               "cpu_count": os.cpu_count(),
               "torch_version": torch.__version__,
               "method": "best-of-3 windows, 12 iters each, "
                         "fwd+bwd+Adam incl. 20-sample diverse decode"}
    for name, (B, N, obs, pred) in {
            "nba_batched_b32": (32, 11, 5, 10),
            "eth_per_scene_b1": (1, 6, 8, 12)}.items():
        ref_dt = _time_reference_step(B, N, obs, pred)
        ours_dt = _time_ours_cpu_step(B, N, obs, pred)
        results[name] = {
            "reference_torch_cpu_s_per_iter": round(ref_dt, 5),
            "reference_torch_cpu_scenes_per_s": round(B / ref_dt, 2),
            "ours_jax_cpu_s_per_iter": round(ours_dt, 5),
            "ours_jax_cpu_scenes_per_s": round(B / ours_dt, 2),
            "speedup_same_host_cpu": round(ref_dt / ours_dt, 2),
        }
        print(f"{name}: ref {ref_dt*1e3:.1f} ms/iter "
              f"({B/ref_dt:.1f} scenes/s) | ours-cpu {ours_dt*1e3:.1f} ms/iter "
              f"({B/ours_dt:.1f} scenes/s) | {ref_dt/ours_dt:.2f}x")
    return {"timing": results}


# --------------------------------------------------------------------------- #
# convergence                                                                 #
# --------------------------------------------------------------------------- #

def _min_ade_fde(pred_k, target):
    """pred_k [K, M, T, 2], target [M, T, 2] → per-agent best-of-K, averaged."""
    err = np.linalg.norm(pred_k - target[None], axis=-1)     # [K, M, T]
    ade = err.mean(-1).min(0).mean()
    fde = err[..., -1].min(0).mean()
    return float(ade), float(fde)


def run_convergence(epochs=8, n_train=192, n_eval=64, n_agents=6,
                    obs_len=8, pred_len=12, batch_scenes=32,
                    result_key="convergence", fixture_seed=2, torch_seed=0,
                    jax_seed=0):
    """``fixture_seed``/``torch_seed``/``jax_seed`` parameterize the round-5
    multi-seed parity study (scripts/parity_seeds.py): vary the data draw AND
    each framework's init/train randomness so the A/B deltas come with a
    measured spread instead of a single N=1 sample. Defaults reproduce the
    round-4 single-seed rows exactly."""
    train_scenes = _make_fixture(n_train, n_agents, obs_len, pred_len,
                                 seed=fixture_seed)
    eval_scenes = _make_fixture(n_eval, n_agents, obs_len, pred_len,
                                seed=fixture_seed + 1)
    tr_past, tr_fut = _scenes_to_nba_arrays(train_scenes, obs_len, pred_len)
    ev_past, ev_fut = _scenes_to_nba_arrays(eval_scenes, obs_len, pred_len)
    n_batches = n_train // batch_scenes

    # ---- reference: torch CPU, batched NBA-style stepping ----
    ref = load_reference()
    args = _ref_args(past_length=obs_len, future_length=pred_len)
    torch.manual_seed(torch_seed)
    net = ref.sttode.STTODENet(args, torch.device("cpu"))
    opt = torch.optim.Adam(net.parameters(), lr=1e-4)
    t0 = time.perf_counter()
    net.train()
    for _ in range(epochs):
        for b in range(n_batches):
            sl = slice(b * batch_scenes, (b + 1) * batch_scenes)
            data = {"past_traj": torch.tensor(tr_past[sl]),
                    "future_traj": torch.tensor(tr_fut[sl])}
            net.set_data_nba(data)
            total, *_ = net.forward()
            opt.zero_grad()
            total.backward()
            opt.step()
    ref_train_s = time.perf_counter() - t0
    net.eval()
    with torch.no_grad():
        preds = []
        for b in range(n_eval // batch_scenes):
            sl = slice(b * batch_scenes, (b + 1) * batch_scenes)
            data = {"past_traj": torch.tensor(ev_past[sl]),
                    "future_traj": torch.tensor(ev_fut[sl])}
            net.set_data_nba(data)
            preds.append(net.inference(data).numpy())     # [20, M, T, 2]
    ref_pred = np.concatenate(preds, axis=1)
    M = n_eval * n_agents
    ref_ade, ref_fde = _min_ade_fde(ref_pred, ev_fut.reshape(M, pred_len, 2))

    # ---- ours: jitted step, same data / epochs / batch size, CPU ----
    import optax

    from sttode_tpu.models import (STTODEConfig, sttode_inference, sttode_init)
    from sttode_tpu.train import make_train_step

    cfg = STTODEConfig(past_length=obs_len, future_length=pred_len)
    params = sttode_init(jax.random.PRNGKey(jax_seed), cfg)
    optx = optax.adam(1e-4)
    opt_state = optx.init(params)
    step = make_train_step(cfg, optx)
    key = jax.random.PRNGKey(jax_seed + 1)
    batches = [
        _jax_batch(tr_past[b * batch_scenes:(b + 1) * batch_scenes],
                   tr_fut[b * batch_scenes:(b + 1) * batch_scenes],
                   batch_scenes, n_agents)
        for b in range(n_batches)]
    # compile outside the timed window (one-time cost, amortized in real
    # training; the torch side has no compile step to exclude). The step
    # donates its inputs, so re-init cleanly after the throwaway dispatch.
    _p, _o, _m = step(params, opt_state, batches[0], jax.random.PRNGKey(99))
    _ = float(np.asarray(_m["total"]))
    del _p, _o
    params = sttode_init(jax.random.PRNGKey(jax_seed), cfg)
    opt_state = optx.init(params)
    t0 = time.perf_counter()
    for _ in range(epochs):
        for batch in batches:
            key, sub = jax.random.split(key)
            params, opt_state, m = step(params, opt_state, batch, sub)
    _ = float(np.asarray(m["total"]))
    ours_train_s = time.perf_counter() - t0
    preds = []
    for b in range(n_eval // batch_scenes):
        sl = slice(b * batch_scenes, (b + 1) * batch_scenes)
        eb = _jax_batch(ev_past[sl], ev_fut[sl], batch_scenes, n_agents)
        key, sub = jax.random.split(key)
        preds.append(np.asarray(sttode_inference(params, cfg, eb, sub)))
    ours_pred = np.concatenate(preds, axis=1)
    ours_ade, ours_fde = _min_ade_fde(ours_pred, ev_fut.reshape(M, pred_len, 2))

    result = {
        "fixture": {"n_train": n_train, "n_eval": n_eval,
                    "n_agents": n_agents, "obs/pred": [obs_len, pred_len],
                    "epochs": epochs, "batch_scenes": batch_scenes,
                    "generator": "data.synthetic.make_social_scene seeds "
                                 f"{fixture_seed}/{fixture_seed + 1}"},
        "reference_torch_cpu": {"min_ade": round(ref_ade, 4),
                                "min_fde": round(ref_fde, 4),
                                "train_wall_s": round(ref_train_s, 1)},
        "ours_jax_cpu": {"min_ade": round(ours_ade, 4),
                         "min_fde": round(ours_fde, 4),
                         "train_wall_s": round(ours_train_s, 1)},
    }
    print(json.dumps(result, indent=2))
    return {result_key: result}


# --------------------------------------------------------------------------- #
# stage-2: full two-stage pipeline (train CVAE → freeze → train DLow sampler  #
# → best-of-20 eval) through BOTH frameworks on one shared fixture            #
# --------------------------------------------------------------------------- #

def run_stage2(epochs1=10, epochs2=10, n_train=192, n_eval=64, n_agents=11,
               obs_len=5, pred_len=10, batch_scenes=32, fixture_seed=2,
               torch_seed=0, jax_seed=0):
    """Round-3 VERDICT item 3a: the reference's two-stage protocol
    (trainsampler.py:124-161 NBA branch + test_sampler.py eval semantics,
    samplerloss.compute_sampler_loss_nba) and ours
    (train.make_sampler_train_step + models.sampler) on the same synthetic
    fixture — trained-accuracy parity, not just elementwise forward parity.
    The NBA batched protocol is the reference's default
    (trainsampler.py:25 dataset='nba')."""
    train_scenes = _make_fixture(n_train, n_agents, obs_len, pred_len,
                                 seed=fixture_seed)
    eval_scenes = _make_fixture(n_eval, n_agents, obs_len, pred_len,
                                seed=fixture_seed + 1)
    tr_past, tr_fut = _scenes_to_nba_arrays(train_scenes, obs_len, pred_len)
    ev_past, ev_fut = _scenes_to_nba_arrays(eval_scenes, obs_len, pred_len)
    n_batches = n_train // batch_scenes
    M_eval = n_eval * n_agents
    div_cfg = {"weight": 1.0, "scale": 1.0}   # NBA row, trainsampler.py:103-114
    K = 20

    # ---------------- reference: torch CPU, two stages ---------------- #
    ref = load_reference()
    args = _ref_args(past_length=obs_len, future_length=pred_len)
    # stage-2 arg surface (trainsampler.py:31,59-62,90-91 defaults)
    args.nz = 32
    args.qnet_mlp = [512, 256]
    args.share_eps = True
    args.train_w_mean = True
    args.kld_weight = 0.1
    args.kld_min_clamp = 10.0
    torch.manual_seed(torch_seed)
    net = ref.sttode.STTODENet(args, torch.device("cpu"))
    opt1 = torch.optim.Adam(net.parameters(), lr=1e-4)
    net.train()
    t0 = time.perf_counter()
    for _ in range(epochs1):
        for b in range(n_batches):
            sl = slice(b * batch_scenes, (b + 1) * batch_scenes)
            data = {"past_traj": torch.tensor(tr_past[sl]),
                    "future_traj": torch.tensor(tr_fut[sl])}
            net.set_data_nba(data)
            total, *_ = net.forward()
            opt1.zero_grad()
            total.backward()
            opt1.step()
    # stage 2: optimize ONLY sampler params; grads flow through the frozen
    # net's graph (trainsampler.py:281-282)
    sampler = ref.sampler.Sampler(args)
    opt2 = torch.optim.Adam(sampler.parameters(), lr=1e-4)
    sampler.train()
    for _ in range(epochs2):
        for b in range(n_batches):
            sl = slice(b * batch_scenes, (b + 1) * batch_scenes)
            data = {"past_traj": torch.tensor(tr_past[sl]),
                    "future_traj": torch.tensor(tr_fut[sl])}
            net.set_data_nba(data)
            dec_motion, sampler_dist, vae_dist, _ = sampler.forward(net)
            # trainsampler.py:141-145 reshapes, applied FAITHFULLY: the
            # sampler returns [M, K, T, 2], so the reference's
            # permute(1,0,2,3)+reshape(-1,20,T,2) regroups the K-major flat
            # order into mixed (sample, agent) groups of 20 — its NBA
            # diversity loss runs on scrambled groupings (quirk; recorded in
            # PARITY.md). Reproduced exactly for the A/B.
            dec = dec_motion.permute(1, 0, 2, 3).reshape(-1, K, pred_len, 2)
            fut = torch.tensor(
                tr_fut[sl].reshape(-1, pred_len, 2))
            total, _, _ = ref.samplerloss.compute_sampler_loss_nba(
                args, fut, dec, 1, vae_dist, sampler_dist, div_cfg)
            opt2.zero_grad()
            total.backward()
            opt2.step()
    ref_train_s = time.perf_counter() - t0
    net.eval()
    preds = []
    with torch.no_grad():
        for b in range(n_eval // batch_scenes):
            sl = slice(b * batch_scenes, (b + 1) * batch_scenes)
            data = {"past_traj": torch.tensor(ev_past[sl]),
                    "future_traj": torch.tensor(ev_fut[sl])}
            net.set_data_nba(data)
            dec_motion, *_ = sampler.forward(net)     # mean path, [M, K, T, 2]
            preds.append(dec_motion.numpy())
    ref_pred = np.concatenate(preds, axis=0)           # [M, K, T, 2]
    ref_ade, ref_fde = _min_ade_fde(
        np.moveaxis(ref_pred, 1, 0), ev_fut.reshape(M_eval, pred_len, 2))

    # ---------------- ours: jax CPU, two stages ---------------- #
    import optax

    from sttode_tpu.models import STTODEConfig, sttode_init
    from sttode_tpu.models.sampler import (SamplerConfig, sampler_forward,
                                           sampler_init)
    from sttode_tpu.train import make_sampler_train_step, make_train_step

    cfg = STTODEConfig(past_length=obs_len, future_length=pred_len)
    params = sttode_init(jax.random.PRNGKey(jax_seed), cfg)
    optx1 = optax.adam(1e-4)
    opt_state = optx1.init(params)
    step1 = make_train_step(cfg, optx1, donate=False)
    key = jax.random.PRNGKey(jax_seed + 1)
    batches = [
        _jax_batch(tr_past[b * batch_scenes:(b + 1) * batch_scenes],
                   tr_fut[b * batch_scenes:(b + 1) * batch_scenes],
                   batch_scenes, n_agents)
        for b in range(n_batches)]
    # compile both stages outside the timed window (one-time cost; the torch
    # side has no compile step to exclude)
    scfg = SamplerConfig(nk=K, div_weight=div_cfg["weight"],
                         div_scale=div_cfg["scale"])
    sp0 = sampler_init(jax.random.PRNGKey(jax_seed + 7), scfg)
    optx2 = optax.adam(1e-4)
    step2 = make_sampler_train_step(cfg, scfg, optx2)
    _p, _o, _m = step1(params, opt_state, batches[0], jax.random.PRNGKey(99))
    _sp, _so, _sm = step2(sp0, _p, optx2.init(sp0), batches[0],
                          jax.random.PRNGKey(98))
    _ = float(np.asarray(_m["total"])), float(np.asarray(_sm["total"]))
    del _p, _o, _sp, _so
    t0 = time.perf_counter()
    for _ in range(epochs1):
        for batch in batches:
            key, sub = jax.random.split(key)
            params, opt_state, m = step1(params, opt_state, batch, sub)
    sampler_params = sampler_init(jax.random.PRNGKey(jax_seed + 7), scfg)
    opt_state2 = optx2.init(sampler_params)
    for _ in range(epochs2):
        for batch in batches:
            key, sub = jax.random.split(key)
            sampler_params, opt_state2, m2 = step2(
                sampler_params, params, opt_state2, batch, sub)
    _ = float(np.asarray(m2["total"]))
    ours_train_s = time.perf_counter() - t0
    preds = []
    for b in range(n_eval // batch_scenes):
        sl = slice(b * batch_scenes, (b + 1) * batch_scenes)
        eb = _jax_batch(ev_past[sl], ev_fut[sl], batch_scenes, n_agents)
        key, sub = jax.random.split(key)
        out = sampler_forward(sampler_params, params, scfg, cfg, eb, sub)
        preds.append(np.asarray(out.dec_motion))       # [M, K, T, 2]
    ours_pred = np.concatenate(preds, axis=0)
    ours_ade, ours_fde = _min_ade_fde(
        np.moveaxis(ours_pred, 1, 0), ev_fut.reshape(M_eval, pred_len, 2))

    result = {
        "fixture": {"n_train": n_train, "n_eval": n_eval,
                    "n_agents": n_agents, "obs/pred": [obs_len, pred_len],
                    "stage1_epochs": epochs1, "stage2_epochs": epochs2,
                    "batch_scenes": batch_scenes,
                    "protocol": "NBA batched two-stage: CVAE -> freeze -> "
                                "DLow sampler (mean path) -> best-of-20",
                    "generator": "data.synthetic.make_social_scene seeds "
                                 f"{fixture_seed}/{fixture_seed + 1}"},
        "reference_torch_cpu": {"min_ade": round(ref_ade, 4),
                                "min_fde": round(ref_fde, 4),
                                "train_wall_s": round(ref_train_s, 1)},
        "ours_jax_cpu": {"min_ade": round(ours_ade, 4),
                         "min_fde": round(ours_fde, 4),
                         "train_wall_s": round(ours_train_s, 1)},
    }
    print(json.dumps(result, indent=2))
    return {"stage2": result}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["timing", "convergence",
                                     "convergence_nba", "stage2"])
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--epochs2", type=int, default=10)
    ap.add_argument("--fixture-seed", type=int, default=2)
    ap.add_argument("--torch-seed", type=int, default=0)
    ap.add_argument("--jax-seed", type=int, default=0)
    ap.add_argument("--out", default=None,
                    help="write the result to this path instead of merging "
                         "into BASELINE_MEASURED.json (used by the multi-seed "
                         "parity study so non-default seeds never clobber the "
                         "canonical single-seed entries)")
    args = ap.parse_args()
    seeds = dict(fixture_seed=args.fixture_seed, torch_seed=args.torch_seed,
                 jax_seed=args.jax_seed)
    if args.mode == "timing":
        update = run_timing()
    elif args.mode == "convergence_nba":
        # round-3 VERDICT item 3b: a true NBA-shaped fixture (11 agents,
        # 5/10 horizons) through set_data_nba semantics end-to-end
        update = run_convergence(epochs=args.epochs, n_agents=11, obs_len=5,
                                 pred_len=10, result_key="convergence_nba",
                                 **seeds)
    elif args.mode == "stage2":
        update = run_stage2(epochs1=args.epochs, epochs2=args.epochs2, **seeds)
    else:
        update = run_convergence(epochs=args.epochs, **seeds)
    out_path = args.out or OUT_PATH
    existing = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            existing = json.load(f)
    existing.update(update)
    with open(out_path, "w") as f:
        json.dump(existing, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
