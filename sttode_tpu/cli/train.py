"""Stage-1 CVAE training CLI (reference train.py).

    python -m sttode_tpu.cli.train --dataset eth --data_root ./datasets

Epoch loop: host-side bucketed batch stream → compiled train step →
StepLR(decay_step, γ) per epoch → orbax checkpoint every model_save_epoch
(reference train.py:55-95,122-123,206-213); resume via --epoch_continue
(train.py:183-198).
"""

from __future__ import annotations

import os
import signal
import time

import jax
import numpy as np

from sttode_tpu.cli import common
from sttode_tpu.data import nba_batches, prepare_nba_batch, scene_batches
from sttode_tpu.models import sttode_init
from sttode_tpu.train import (
    adam_with_schedule, make_train_step, save_checkpoint, load_checkpoint,
    set_lr, step_lr, train_epoch,
)


def batch_stream(args, data, nprng, cfg):
    if args.dataset == "nba":
        bs = args.batch_size or 32
        past, fut = data
        for d in nba_batches(past, fut, bs, rng=nprng):
            yield prepare_nba_batch(d), None
    else:
        yield from scene_batches(
            data, training=True, rng=nprng,
            scenes_per_batch=args.scenes_per_batch,
            max_train_agent=common.effective_max_train_agent(args),
            rand_rot=not args.no_rand_rot, compat=cfg.compat)


def main(argv=None):
    parser = common.base_parser("STTODE stage-1 CVAE training (TPU)")
    parser.add_argument("--supervise", action="store_true",
                        help="enable divergence detection + rollback "
                             "(train.supervisor)")
    parser.add_argument("--profile_dir", default="",
                        help="capture a jax.profiler trace of epoch 0 here")
    parser.add_argument("--distributed", action="store_true",
                        help="initialize jax.distributed for multi-host SPMD "
                             "(coordinator from JAX_COORDINATOR_ADDRESS / "
                             "cloud-TPU autodetect; parallel.init_distributed)"
                        )
    args = parser.parse_args(argv)
    if args.distributed:
        # must run before first device use so every host joins the same
        # runtime; exercised by tests/test_multihost.py
        from sttode_tpu.parallel.mesh import init_distributed
        if init_distributed():
            print(f"distributed: process {jax.process_index()} of "
                  f"{jax.process_count()}, {jax.local_device_count()} local "
                  f"/ {jax.device_count()} global devices")
        else:
            # --distributed is an explicit request; a worker whose coordinator
            # env is missing must NOT quietly train standalone (it would
            # duplicate work and race the others' checkpoint directory)
            raise SystemExit(
                "--distributed was passed but no coordinator is configured: "
                "set JAX_COORDINATOR_ADDRESS (+ JAX_NUM_PROCESSES, "
                "JAX_PROCESS_ID) or run under a Cloud TPU multislice launcher "
                "(MEGASCALE_COORDINATOR_ADDRESS); drop the flag for "
                "single-process training")
    nprng = common.seed_everything(args.seed)
    cfg = common.model_config(args)

    data = common.load_scenes(args, "train")
    schedule = step_lr(args.lr, args.decay_step, args.decay_gamma)
    opt = adam_with_schedule(schedule)
    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    params = sttode_init(k_init, cfg)
    opt_state = opt.init(params)

    start_epoch = 0
    cdir = common.ckpt_dir(args)
    if args.epoch_continue > 0:
        path = os.path.join(cdir, f"model_{args.epoch_continue:04d}")
        params, opt_state, start_epoch, cfg = load_checkpoint(
            path, template={"params": params, "opt_state": opt_state,
                            "epoch": np.asarray(0)})
        print(f"resumed epoch {start_epoch} from {path}")

    # parameter table at startup (reference model_structure, train.py:205)
    from sttode_tpu.utils.profiling import param_count
    print(f"model parameters: {param_count(params):,}")

    step_fn = make_train_step(cfg, opt, donate=True,
                              scan_steps=args.scan_steps)

    supervisor = None
    if args.supervise:
        from sttode_tpu.train.supervisor import Supervisor
        supervisor = Supervisor(cdir, cfg,
                                save_every=args.model_save_epoch)

    # Preemption safety: TPU pods get SIGTERM with a grace window. Finish
    # the current epoch, checkpoint, and exit 0 so --epoch_continue resumes
    # exactly where the run stopped. (The reference loses everything since
    # its last 5th-epoch pickle.)
    preempted = {"flag": False}

    def _on_term(signum, frame):
        preempted["flag"] = True
        print(f"signal {signum}: checkpointing after this epoch", flush=True)

    prev_handler = signal.signal(signal.SIGTERM, _on_term)

    epoch = start_epoch
    saved_epoch = -1
    while epoch < args.num_epochs:
        opt_state = set_lr(opt_state, schedule(epoch) * (
            supervisor.lr_scale if supervisor else 1.0))
        t0 = time.time()
        key, k_epoch = jax.random.split(key)
        profile_ctx = None
        if args.profile_dir and epoch == start_epoch:
            from sttode_tpu.utils.profiling import trace
            profile_ctx = trace(args.profile_dir)
            profile_ctx.__enter__()
        params, opt_state, means = train_epoch(
            step_fn, params, opt_state,
            batch_stream(args, data, nprng, cfg), k_epoch,
            log_every=args.log_every, scan_steps=args.scan_steps)
        if profile_ctx is not None:
            profile_ctx.__exit__(None, None, None)
            print(f"profiler trace written to {args.profile_dir}")
        msg = " ".join(f"{k}: {v:.4f}" for k, v in sorted(means.items()))
        print(f"epoch {epoch:03d} [{time.time() - t0:.1f}s] {msg}")
        if supervisor is not None:
            params, opt_state, epoch, action = supervisor.after_epoch(
                epoch, means["total"], params, opt_state)
            if action == "abort":
                break
            if action == "rollback":
                continue
        elif (epoch + 1) % args.model_save_epoch == 0:
            path = save_checkpoint(
                cdir, epoch + 1, params, opt_state, cfg,
                background=getattr(args, "async_ckpt", False),
                keep_last=getattr(args, "keep_last_ckpts", 0) or None)
            saved_epoch = epoch + 1
            print(f"saved {path}")
        epoch += 1
        if preempted["flag"]:
            # a save-epoch preemption already has this exact epoch in flight
            # (possibly async) — writing the same path again would race the
            # orbax commit-rename; just flush the in-flight one instead
            from sttode_tpu.train.checkpoint import flush_saves
            flush_saves()
            if saved_epoch != epoch:
                path = save_checkpoint(cdir, epoch, params, opt_state, cfg)
            else:
                from sttode_tpu.train.checkpoint import CKPT_FMT
                path = os.path.join(cdir, CKPT_FMT.format(epoch))
            print(f"preempted: saved {path}; resume with "
                  f"--epoch_continue {epoch}", flush=True)
            break
    signal.signal(signal.SIGTERM, prev_handler)
    from sttode_tpu.train.checkpoint import flush_saves
    flush_saves()
    return params, cfg


if __name__ == "__main__":
    main()
