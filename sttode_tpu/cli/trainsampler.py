"""Stage-2 diversity-sampler training CLI (reference trainsampler.py).

    python -m sttode_tpu.cli.trainsampler --dataset eth --vae_epoch 100

Loads a frozen stage-1 checkpoint, optimizes only the sampler params with
lambda-decay Adam (trainsampler.py:263-287), resumes from the newest sampler
checkpoint (trainsampler.py:300-308).
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from sttode_tpu.cli import common
from sttode_tpu.models import sampler_init, sttode_init
from sttode_tpu.cli.train import batch_stream
from sttode_tpu.train import (
    adam_with_schedule, lambda_lr, latest_checkpoint, load_checkpoint,
    make_sampler_train_step, save_checkpoint, set_lr,
)


def add_sampler_args(parser):
    parser.add_argument("--nz", type=int, default=32)
    parser.add_argument("--qnet_mlp", type=int, nargs="+", default=[512, 256])
    parser.add_argument("--no_share_eps", action="store_true")
    parser.add_argument("--no_train_w_mean", action="store_true")
    parser.add_argument("--kld_weight", type=float, default=0.1)
    parser.add_argument("--kld_min_clamp", type=float, default=10.0)
    parser.add_argument("--vae_epoch", type=int, default=0,
                        help="stage-1 checkpoint epoch (0 = latest)")
    parser.add_argument("--fix_epochs", type=int, default=5)
    return parser


def main(argv=None):
    parser = add_sampler_args(
        common.base_parser("STTODE stage-2 sampler training (TPU)"))
    args = parser.parse_args(argv)
    nprng = common.seed_everything(args.seed)
    cfg = common.model_config(args)
    scfg = common.sampler_config(args)

    # frozen stage-1 net
    cdir = common.ckpt_dir(args)
    if args.vae_epoch > 0:
        vae_path = os.path.join(cdir, f"model_{args.vae_epoch:04d}")
    else:
        vae_path = latest_checkpoint(cdir)
    if vae_path is None:
        raise SystemExit(f"no stage-1 checkpoint under {cdir}")
    template = sttode_init(jax.random.PRNGKey(0), cfg)
    net_params, _, _, cfg = load_checkpoint(
        vae_path, template={"params": template, "opt_state": None,
                            "epoch": np.asarray(0)})
    print(f"frozen net from {vae_path}")
    if scfg.nz != cfg.zdim:
        # fail fast with the fix named, instead of a dot_general shape error
        # deep inside the decoder: the sampler's latents drive the frozen
        # net's decoder, so their dimensions must match
        raise SystemExit(
            f"--nz {scfg.nz} must equal the frozen net's zdim {cfg.zdim} "
            f"(the sampler's A·ε+b latents feed the net's decoder); "
            f"pass --nz {cfg.zdim}")

    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    sampler_params = sampler_init(
        k_init, scfg, pred_model_dim=cfg.hidden_dim,
        past_feature_dim=2 * cfg.hidden_dim)

    schedule = lambda_lr(args.lr, args.fix_epochs, args.num_epochs)
    opt = adam_with_schedule(schedule)
    opt_state = opt.init(sampler_params)

    sdir = os.path.join(cdir, "sampler")
    start_epoch = 0
    resume = latest_checkpoint(sdir)
    if resume is not None:
        sampler_params, opt_state, start_epoch, scfg = load_checkpoint(
            resume, template={"params": sampler_params,
                              "opt_state": opt_state, "epoch": np.asarray(0)})
        print(f"resumed sampler epoch {start_epoch}")

    step_fn = make_sampler_train_step(cfg, scfg, opt, donate=True,
                                      scan_steps=args.scan_steps)
    data = common.load_scenes(args, "train")

    from sttode_tpu.train import train_epoch

    def bound_step(sp, o, batch, sub):
        # train_epoch's (params, opt_state, batch, key) contract; the frozen
        # net params are a closed-over constant
        return step_fn(sp, net_params, o, batch, sub)

    for epoch in range(start_epoch, args.num_epochs):
        opt_state = set_lr(opt_state, schedule(epoch))
        t0 = time.time()
        key, k_epoch = jax.random.split(key)
        sampler_params, opt_state, means = train_epoch(
            bound_step, sampler_params, opt_state,
            batch_stream(args, data, nprng, cfg), k_epoch,
            log_every=args.log_every, scan_steps=args.scan_steps)
        msg = " ".join(f"{k}: {v:.4f}" for k, v in sorted(means.items()))
        print(f"sampler epoch {epoch:03d} [{time.time() - t0:.1f}s] {msg}")
        if (epoch + 1) % args.model_save_epoch == 0:
            path = save_checkpoint(
                sdir, epoch + 1, sampler_params, opt_state, scfg,
                background=getattr(args, "async_ckpt", False),
                keep_last=getattr(args, "keep_last_ckpts", 0) or None)
            print(f"saved {path}")
    from sttode_tpu.train.checkpoint import flush_saves
    flush_saves()
    return sampler_params, scfg


if __name__ == "__main__":
    main()
