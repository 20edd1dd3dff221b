"""Checkpoint/resume (reference train.py:183-213 semantics, orbax-backed).

The reference pickles ``{model_dict, optimizer, scheduler, epoch, model_cfg}``
every ``model_save_epoch`` epochs and reconstructs the model from the pickled
config at test time (test.py:672-678). We keep that reconstruct-from-checkpoint
property: the config NamedTuple is stored alongside the param/optimizer pytrees
and ``load_checkpoint`` returns it so eval never needs the original flags.
"""

from __future__ import annotations

import json
import os
from typing import Any, NamedTuple

import numpy as np
import orbax.checkpoint as ocp

from sttode_tpu.models.sampler import SamplerConfig
from sttode_tpu.models.sttode import STTODEConfig

CKPT_FMT = "model_{:04d}"


def _config_to_json(cfg: NamedTuple) -> str:
    return json.dumps({"type": type(cfg).__name__, **cfg._asdict()})


def _config_from_json(s: str):
    d = json.loads(s)
    kind = d.pop("type")
    cls = {"STTODEConfig": STTODEConfig, "SamplerConfig": SamplerConfig}[kind]
    # json round-trips tuples as lists; unknown fields (configs written by a
    # newer version) are dropped, missing ones take the NamedTuple defaults —
    # checkpoints stay loadable across config-surface evolution in both
    # directions
    d = {k: tuple(v) if isinstance(v, list) else v
         for k, v in d.items() if k in cls._fields}
    return cls(**d)


def _restore_like(template: Any, restored: Any):
    """Rebuild NamedTuple/tuple/list structure from orbax's raw dict restore,
    walking the template. Orbax stores NamedTuple nodes as dicts keyed by
    field name and sequences as dicts keyed by index strings."""
    if hasattr(template, "_fields"):  # NamedTuple
        vals = {f: _restore_like(getattr(template, f), restored[f])
                for f in template._fields}
        return type(template)(**vals)
    if isinstance(template, dict):
        return {k: _restore_like(v, restored[k]) for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        if isinstance(restored, dict):
            items = [restored[str(i)] for i in range(len(template))]
        else:
            items = list(restored)
        out = [_restore_like(t, r) for t, r in zip(template, items)]
        return type(template)(out) if isinstance(template, list) else \
            tuple(out)
    return restored


def save_checkpoint(ckpt_dir: str, epoch: int, params: Any, opt_state: Any,
                    cfg: NamedTuple, extra: dict | None = None) -> str:
    """Write ``<ckpt_dir>/model_%04d`` with params, optimizer state, config."""
    path = os.path.join(os.path.abspath(ckpt_dir), CKPT_FMT.format(epoch))
    ckptr = ocp.PyTreeCheckpointer()
    payload = {
        "params": params,
        "opt_state": opt_state,
        "epoch": np.asarray(epoch),
    }
    ckptr.save(path, payload, force=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        f.write(_config_to_json(cfg))
    if extra:
        with open(os.path.join(path, "extra.json"), "w") as f:
            json.dump(extra, f)
    return path


def load_checkpoint(path: str, *, template: Any | None = None):
    """Restore (params, opt_state, epoch, cfg). ``template`` (a matching
    pytree of arrays) restores exact dtypes/structure; without it orbax's
    saved metadata is used."""
    # orbax/tensorstore requires absolute paths; save() absolutizes, restore
    # must too (caught by the CLI workflow run with a relative --ckpt_dir)
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    template_complete = template is not None and all(
        template.get(k) is not None for k in ("params", "opt_state"))
    if template_complete:
        restored = ckptr.restore(path, item=template)
    else:
        # partial template (e.g. eval wants params only): restore the raw
        # saved structure — orbax rejects None placeholders in item trees —
        # then rebuild container types from the provided sub-templates.
        restored = dict(ckptr.restore(path))
        if template:
            for k, sub in template.items():
                if sub is not None and k in restored:
                    restored[k] = _restore_like(sub, restored[k])
    with open(os.path.join(path, "config.json")) as f:
        cfg = _config_from_json(f.read())
    epoch = int(np.asarray(restored["epoch"]))
    return restored["params"], restored["opt_state"], epoch, cfg


def latest_checkpoint(ckpt_dir: str) -> str | None:
    """Newest ``model_%04d`` under ``ckpt_dir`` (the reference sampler trainer
    resumes by parsing the newest filename, trainsampler.py:300-308)."""
    if not os.path.isdir(ckpt_dir):
        return None
    cands = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("model_"))
    return os.path.join(ckpt_dir, cands[-1]) if cands else None


def checkpoint_epochs(ckpt_dir: str) -> list[int]:
    if not os.path.isdir(ckpt_dir):
        return []
    return sorted(int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
                  if d.startswith("model_"))
