"""LR schedules (reference get_scheduler, utils/torchutils.py:171-185).

The reference steps its scheduler once per *epoch*; these optax schedules are
therefore functions of an epoch count the trainer passes in (``inject_epoch``
wires an epoch-indexed schedule into optax's step-indexed world by letting the
trainer update a scalar in the optimizer state).
"""

from __future__ import annotations

import optax


def step_lr(base_lr: float, decay_step: int, gamma: float = 0.5):
    """torch StepLR: lr·γ^⌊epoch/decay_step⌋ (train.py:122-123 uses
    StepLR(10, 0.5))."""
    def schedule(epoch):
        return base_lr * (gamma ** (epoch // decay_step))
    return schedule


def lambda_lr(base_lr: float, fix_epochs: int, total_epochs: int):
    """The reference sampler trainer's lambda decay (trainsampler.py:284-287 →
    torchutils.py:173-177): constant for ``fix_epochs``, then linear to ~0."""
    def schedule(epoch):
        if epoch < fix_epochs:
            return base_lr
        frac = 1.0 - (epoch - fix_epochs) / max(
            total_epochs - fix_epochs + 1, 1)
        return base_lr * max(frac, 0.0)
    return schedule


class ReduceOnPlateau:
    """Metric-driven decay (torch ReduceLROnPlateau equivalent,
    torchutils.py:179-183). Host-side state; call ``step(metric)`` per epoch
    and read ``.lr``."""

    def __init__(self, base_lr: float, factor: float = 0.5, patience: int = 10,
                 threshold: float = 1e-4, min_lr: float = 0.0):
        self.lr = base_lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr


def adam_with_schedule(schedule_fn, epoch: int = 0, **adam_kwargs):
    """Adam whose LR is ``schedule_fn(epoch)``; rebuild via
    ``optax.inject_hyperparams`` so the trainer can update the LR between
    epochs without re-initializing optimizer state."""
    opt = optax.inject_hyperparams(optax.adam)(
        learning_rate=schedule_fn(epoch), **adam_kwargs)
    return opt


def set_lr(opt_state, lr: float):
    """Update the injected learning rate inside an inject_hyperparams state."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


class ExpParamAnnealer:
    """Exponential parameter annealer (reference torchutils.py:188-204 — the
    machinery exists there but the registered list stays empty; provided for
    capability parity)."""

    def __init__(self, start: float, finish: float, rate: float):
        self.start = start
        self.finish = finish
        self.rate = rate
        self.t = 0

    def step(self):
        self.t += 1

    @property
    def val(self) -> float:
        return self.finish - (self.finish - self.start) * (self.rate ** self.t)
