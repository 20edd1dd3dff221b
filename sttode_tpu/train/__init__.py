"""Training harness (L6): compiled steps, epoch drivers, schedulers,
orbax checkpointing."""

from sttode_tpu.train.checkpoint import (
    checkpoint_epochs,
    flush_saves,
    latest_checkpoint,
    load_checkpoint,
    prune_checkpoints,
    restore_shardings,
    save_checkpoint,
)
from sttode_tpu.train.loop import (
    make_sampler_train_step,
    make_train_step,
    stack_batches,
    train_epoch,
)
from sttode_tpu.train.schedulers import (
    ExpParamAnnealer,
    ReduceOnPlateau,
    adam_with_schedule,
    lambda_lr,
    set_lr,
    step_lr,
)

__all__ = [
    "checkpoint_epochs", "flush_saves", "latest_checkpoint",
    "load_checkpoint", "prune_checkpoints", "restore_shardings",
    "save_checkpoint", "make_sampler_train_step", "make_train_step",
    "stack_batches", "train_epoch", "ExpParamAnnealer", "ReduceOnPlateau",
    "adam_with_schedule", "lambda_lr", "set_lr", "step_lr",
]
