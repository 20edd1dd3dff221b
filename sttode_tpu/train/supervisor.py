"""Fault-tolerant training supervisor.

The reference's failure story is manual re-launch + checkpoint resume
(SURVEY.md §5.3: train.py:183-198, trainsampler.py:300-308). This supervisor
goes further — the auxiliary subsystem the reference lacks:

- **divergence detection**: non-finite loss (or loss above a configurable
  explosion factor of its running median) trips a failure,
- **automatic rollback**: restore the last good checkpoint, optionally decay
  the LR, and continue — bounded by ``max_rollbacks``,
- **periodic + last-good checkpointing** via ``sttode_tpu.train.checkpoint``.

Works with any step metrics dict containing 'total'; epoch-granular, so the
device-side step stays a clean compiled function.
"""

from __future__ import annotations

import collections
import math
from typing import Any

import numpy as np


class Supervisor:
    def __init__(self, ckpt_dir: str, cfg, *, explosion_factor: float = 50.0,
                 window: int = 20, max_rollbacks: int = 5,
                 lr_decay_on_rollback: float = 0.5,
                 save_every: int = 5):
        self.ckpt_dir = ckpt_dir
        self.cfg = cfg
        self.explosion_factor = explosion_factor
        self.history: collections.deque = collections.deque(maxlen=window)
        self.max_rollbacks = max_rollbacks
        self.lr_decay_on_rollback = lr_decay_on_rollback
        self.save_every = save_every
        self.rollbacks = 0
        self.lr_scale = 1.0
        self._last_good: str | None = None

    def healthy(self, loss: float) -> bool:
        """Is this epoch-mean loss sane given recent history?"""
        if not math.isfinite(loss):
            return False
        if self.history:
            baseline = float(np.median(self.history))
            # threshold = baseline + (f-1)·max(|baseline|, 1): identical to
            # the plain f·baseline ratio for baselines ≥ 1, but stays armed
            # for objectives whose loss hovers near zero or negative (a
            # ratio test silently disables there)
            scale = max(abs(baseline), 1.0)
            if loss > baseline + (self.explosion_factor - 1.0) * scale:
                return False
        return True

    def after_epoch(self, epoch: int, loss: float, params: Any,
                    opt_state: Any, *, log=print):
        """Record health; checkpoint on cadence. Returns
        (params, opt_state, epoch, action) where action ∈
        {'ok', 'rollback', 'abort'} — on 'rollback' the returned state is the
        restored last-good one and ``lr_scale`` has been decayed."""
        from sttode_tpu.train.checkpoint import load_checkpoint, \
            save_checkpoint

        if self.healthy(loss):
            self.history.append(loss)
            if (epoch + 1) % self.save_every == 0:
                self._last_good = save_checkpoint(
                    self.ckpt_dir, epoch + 1, params, opt_state, self.cfg)
            return params, opt_state, epoch, "ok"

        if self._last_good is None or self.rollbacks >= self.max_rollbacks:
            log(f"supervisor: divergence at epoch {epoch} "
                f"(loss={loss}); no recovery possible — aborting")
            return params, opt_state, epoch, "abort"

        self.rollbacks += 1
        self.lr_scale *= self.lr_decay_on_rollback
        template = {"params": params, "opt_state": opt_state,
                    "epoch": np.asarray(0)}
        p, o, good_epoch, _ = load_checkpoint(self._last_good,
                                              template=template)
        log(f"supervisor: divergence at epoch {epoch} (loss={loss}); "
            f"rolled back to epoch {good_epoch}, lr×{self.lr_scale}")
        return p, o, good_epoch, "rollback"
