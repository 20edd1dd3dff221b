"""Stage-2 sampler study: train the DLow sampler on a frozen stage-1 net
(both trained on synthetic social scenes) and compare best-of-20 ADE/FDE of
prior sampling vs the learned sampler. Appends to CONVERGENCE.md.

    python scripts/sampler_study.py --vae_epochs 30 --sampler_epochs 15
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sttode_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

import numpy as np
import jax
import jax.numpy as jnp
import optax

from sttode_tpu.data.batching import scene_batches
from sttode_tpu.data.synthetic import make_social_scenes
from sttode_tpu.evaluation import evaluate_scenes
from sttode_tpu.models import (
    SamplerConfig, STTODEConfig, sampler_forward, sampler_init, sttode_init,
)
from sttode_tpu.train import (
    adam_with_schedule, lambda_lr, make_sampler_train_step, make_train_step,
    set_lr, step_lr, train_epoch,
)
from sttode_tpu.utils.metrics import AverageMeter, compute_ade, compute_fde


def eval_sampler(sp, net, scfg, cfg, scenes, key):
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def fwd(sp, net, batch, k):
        return sampler_forward(sp, net, scfg, cfg, batch, k, mean=True).dec_motion

    ade_m, fde_m = AverageMeter(), AverageMeter()
    for batch, origs in scene_batches(scenes, training=False):
        key, sub = jax.random.split(key)
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        dec = np.asarray(fwd(sp, net, batch, sub))
        B, N = batch.batch_size, batch.agent_num
        K, T = dec.shape[1], dec.shape[2]
        dec = dec.reshape(B, N, K, T, 2) + origs[:, None, None, None, :]
        gt = np.asarray(batch.future).reshape(B, N, T, 2) + \
            origs[:, None, None, :]
        valid = np.asarray(batch.valid).reshape(B, N)
        for b in range(B):
            n_real = int(valid[b].sum())
            if n_real:
                ade_m.update(compute_ade(dec[b], gt[b], valid[b]), n=n_real)
                fde_m.update(compute_fde(dec[b], gt[b], valid[b]), n=n_real)
    return ade_m.avg, fde_m.avg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vae_epochs", type=int, default=30)
    ap.add_argument("--sampler_epochs", type=int, default=15)
    ap.add_argument("--train_scenes", type=int, default=600)
    ap.add_argument("--test_scenes", type=int, default=100)
    args = ap.parse_args()

    train = make_social_scenes(args.train_scenes, seed=0)
    test = make_social_scenes(args.test_scenes, seed=1)
    cfg = STTODEConfig(compat="tpu", attn_axis="agent")

    # ---- stage 1
    key = jax.random.PRNGKey(0)
    key, k_init = jax.random.split(key)
    params = sttode_init(k_init, cfg)
    schedule = step_lr(1e-4, 10, 0.5)
    opt = adam_with_schedule(schedule)
    opt_state = opt.init(params)
    step_fn = make_train_step(cfg, opt, donate=False)
    nprng = np.random.default_rng(0)
    t0 = time.time()
    for epoch in range(args.vae_epochs):
        opt_state = set_lr(opt_state, schedule(epoch))
        key, k_ep = jax.random.split(key)
        params, opt_state, means = train_epoch(
            step_fn, params, opt_state,
            scene_batches(train, training=True, rng=nprng,
                          scenes_per_batch=16), k_ep)
        print(f"vae epoch {epoch:03d} total {means['total']:.3f}", flush=True)
    m_prior = evaluate_scenes(params, cfg, test, jax.random.PRNGKey(42),
                              sample_k=20)
    print(f"stage-1 prior sampling: ADE {m_prior['ade']:.4f} "
          f"FDE {m_prior['fde']:.4f}", flush=True)

    # ---- stage 2
    scfg = SamplerConfig(nk=20, nz=cfg.zdim)
    key, k_s = jax.random.split(key)
    sp = sampler_init(k_s, scfg, pred_model_dim=cfg.hidden_dim,
                      past_feature_dim=2 * cfg.hidden_dim)
    s_schedule = lambda_lr(1e-4, 5, args.sampler_epochs)
    s_opt = adam_with_schedule(s_schedule)
    s_state = s_opt.init(sp)
    s_step = make_sampler_train_step(cfg, scfg, s_opt, donate=False)
    for epoch in range(args.sampler_epochs):
        s_state = set_lr(s_state, s_schedule(epoch))
        sums, count = {}, 0
        for batch, _ in scene_batches(train, training=True, rng=nprng,
                                      scenes_per_batch=16):
            key, sub = jax.random.split(key)
            batch = jax.tree_util.tree_map(jnp.asarray, batch)
            sp, s_state, metrics = s_step(sp, params, s_state, batch, sub)
            count += 1
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        print(f"sampler epoch {epoch:03d} " + " ".join(
            f"{k}: {v / count:.3f}" for k, v in sorted(sums.items())),
            flush=True)

    key, k_eval = jax.random.split(key)
    ade_s, fde_s = eval_sampler(sp, params, scfg, cfg, test, k_eval)
    print(f"stage-2 sampler: ADE {ade_s:.4f} FDE {fde_s:.4f}", flush=True)

    dt = (time.time() - t0) / 60
    with open("CONVERGENCE.md", "a") as f:
        f.write(f"\n## Two-stage study ({args.vae_epochs}+"
                f"{args.sampler_epochs} epochs, {dt:.1f} min)\n\n")
        f.write("| decoder latents | test min-ADE (K=20) | test min-FDE |\n")
        f.write("|---|---|---|\n")
        f.write(f"| stage-1 prior N(0,I) | {m_prior['ade']:.4f} | "
                f"{m_prior['fde']:.4f} |\n")
        f.write(f"| stage-2 DLow sampler | {ade_s:.4f} | {fde_s:.4f} |\n")


if __name__ == "__main__":
    main()
