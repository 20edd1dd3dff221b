"""Training loops (L6): jitted/pjitted steps for stage-1 (CVAE) and stage-2
(sampler), epoch drivers (reference train.py:55-95, trainsampler.py:124-194).

One compiled ``train_step`` per (bucket-shape, config); params live on device
across steps; only the small host-prepared Batch crosses PCIe each step. With
a mesh, in/out shardings pin params replicated (or TP-sharded) and the batch
row-sharded over "data" — XLA inserts the gradient psum (SPMD DP).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

import jax
import optax

from sttode_tpu.models.sampler import (
    SamplerConfig, sampler_forward, sampler_loss,
)
from sttode_tpu.models.sttode import Batch, STTODEConfig, sttode_forward
from sttode_tpu.parallel.mesh import batch_sharding, param_sharding


def make_train_step(cfg: STTODEConfig, optimizer: optax.GradientTransformation,
                    *, mesh=None, tp: bool = False, params_like=None,
                    donate: bool = True) -> Callable:
    """Compiled stage-1 step: (params, opt_state, batch, key) →
    (params, opt_state, metrics).

    With ``mesh`` (requires ``params_like`` as a sharding template) the step is
    pjit-compiled: params replicated (or TP-sharded per parallel.mesh rules),
    batch row-sharded over "data"; gradient all-reduce is XLA's psum."""

    def step(params, opt_state, batch: Batch, key):
        def loss_fn(p):
            out = sttode_forward(p, cfg, batch, key, train=True)
            return out.total_loss, out

        (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {
            "total": out.total_loss, "pred": out.loss_pred,
            "recover": out.loss_recover, "kl": out.loss_kl,
            "diverse": out.loss_diverse,
        }
        return params, opt_state, metrics

    donate_argnums = (0, 1) if donate else ()
    if mesh is None:
        return jax.jit(step, donate_argnums=donate_argnums)

    assert params_like is not None, "mesh mode needs params_like as template"
    from jax.sharding import NamedSharding, PartitionSpec as P
    p_sh = param_sharding(params_like, mesh, tp=tp)
    b_sh = batch_sharding(mesh)
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(p_sh, None, b_sh, repl),
        out_shardings=(p_sh, None, None),
        donate_argnums=donate_argnums,
    )


def make_sampler_train_step(cfg: STTODEConfig, scfg: SamplerConfig,
                            optimizer: optax.GradientTransformation,
                            *, donate: bool = True) -> Callable:
    """Compiled stage-2 step (frozen net): (sampler_params, net_params,
    opt_state, batch, key) → (sampler_params, opt_state, metrics)."""

    def step(sampler_params, net_params, opt_state, batch: Batch, key):
        def loss_fn(sp):
            out = sampler_forward(sp, net_params, scfg, cfg, batch, key)
            total, parts = sampler_loss(out, scfg, batch)
            return total, parts

        (total, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(sampler_params)
        updates, opt_state = optimizer.update(grads, opt_state, sampler_params)
        sampler_params = optax.apply_updates(sampler_params, updates)
        metrics = {"total": total, **parts}
        return sampler_params, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 2) if donate else ())


def train_epoch(step_fn: Callable, params, opt_state,
                batches: Iterable[tuple[Batch, Any]], key, *,
                log_every: int = 0, log_fn=print,
                prefetch_depth: int = 2) -> tuple:
    """Drive one epoch over host-prepared batches. Returns
    (params, opt_state, mean-metrics). Batches flow through a background
    prefetch thread so host prep + H2D overlap device compute."""
    from sttode_tpu.data.prefetch import prefetch as _prefetch

    # metrics accumulate as device arrays — float() per step would force a
    # host sync and serialize dispatch against compute; we only materialize
    # at log boundaries and at epoch end.
    sums: dict = {}
    count = 0
    stream = _prefetch(batches, size=prefetch_depth) if prefetch_depth \
        else batches
    for i, (batch, _aux) in enumerate(stream):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step_fn(params, opt_state, batch, sub)
        count += 1
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + v
        if log_every and (i + 1) % log_every == 0:
            msg = " ".join(f"{k}: {float(sums[k]) / count:.4f}"
                           for k in sorted(sums))
            log_fn(f"iter {i + 1}: {msg}")
    means = {k: float(v) / max(count, 1) for k, v in sums.items()}
    return params, opt_state, means
