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


_async_ckptr: ocp.AsyncCheckpointer | None = None


def _get_async_ckptr() -> ocp.AsyncCheckpointer:
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def wait_for_saves() -> None:
    """Block until every in-flight ``background=True`` save has committed.

    NOTE: this only waits for the orbax commit — it does NOT write the
    deferred config/extra sidecars, and a committed directory without its
    sidecar is unloadable and eventually swept as an orphan. At shutdown or
    before reading a just-written checkpoint, call :func:`flush_saves`
    (wait + sidecars + deferred prunes) instead; this lower-level wait
    exists for callers that only need the commit barrier mid-run."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def prune_checkpoints(ckpt_dir: str, keep_last: int) -> list[str]:
    """Delete all but the newest ``keep_last`` committed checkpoints (the
    reference keeps every 5th-epoch pickle forever; long production runs
    need bounded disk). Returns the removed paths. Only COMMITTED directories
    are considered — an in-flight async save writes to a tmp dir and renames
    on commit, so it is never a candidate. A ``model_%04d`` directory whose
    ``config.json`` sidecar never landed (crash between orbax commit and
    sidecar write) is an orphan: unloadable, never listed as committed — it
    is swept here too, unless its sidecar write is still pending IN THIS
    process, or the directory is younger than a grace window. The grace
    window covers the cross-process race the process-local
    ``_pending_sidecars`` set cannot: a second process saving async
    checkpoints into the same directory could have just committed a dir
    whose sidecar write is milliseconds away — a freshly-mtimed dir is
    therefore never treated as an orphan. A dir older than the window with
    no sidecar really is crash debris."""
    import shutil
    import time

    abs_dir = os.path.abspath(ckpt_dir)
    pending = {p for p, _, _ in _pending_sidecars}
    removed = []
    epochs = checkpoint_epochs(ckpt_dir)
    for e in epochs[:-keep_last] if keep_last > 0 else epochs:
        p = os.path.join(abs_dir, CKPT_FMT.format(e))
        shutil.rmtree(p, ignore_errors=True)
        removed.append(p)
    ORPHAN_GRACE_S = 900.0   # cross-process commit→sidecar gap is ms-scale;
                             # 15 min is orders of magnitude of margin
    now = time.time()
    if os.path.isdir(ckpt_dir):
        for d in os.listdir(ckpt_dir):
            p = os.path.join(abs_dir, d)
            if (d.startswith("model_") and d[6:].isdigit()
                    and p not in pending
                    and not os.path.exists(os.path.join(p, "config.json"))):
                try:
                    if now - os.path.getmtime(p) < ORPHAN_GRACE_S:
                        continue
                except OSError:
                    continue   # vanished mid-scan (another process owns it)
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
    return removed


def save_checkpoint(ckpt_dir: str, epoch: int, params: Any, opt_state: Any,
                    cfg: NamedTuple, extra: dict | None = None, *,
                    background: bool = False,
                    keep_last: int | None = None) -> str:
    """Write ``<ckpt_dir>/model_%04d`` with params, optimizer state, config.

    ``background=True`` returns as soon as the arrays are snapshotted and
    flushes to disk asynchronously (orbax AsyncCheckpointer) so the next
    training steps overlap the write; ``wait_for_saves()`` blocks on the
    commit (``load_checkpoint`` of a just-saved path calls it implicitly).
    ``keep_last`` prunes older committed checkpoints down to that count
    AFTER the new one commits — the disk never holds fewer than the
    checkpoints it held when save started, so a crash mid-save cannot
    leave the run with zero restore points (even at keep_last=1).
    """
    path = os.path.join(os.path.abspath(ckpt_dir), CKPT_FMT.format(epoch))
    payload = {
        "params": params,
        "opt_state": opt_state,
        "epoch": np.asarray(epoch),
    }
    # config/extra sidecars are tiny synchronous writes either way; orbax
    # renames the checkpoint dir into place on commit, so the sidecars live
    # NEXT to it until then — write them after save for the sync path, and
    # into the final path after commit for async via a tiny follow-up
    if background:
        # commit any previous in-flight save (and its sidecars) before
        # starting a new one: two concurrent orbax writers on one dir can
        # collide on the staging-dir rename
        flush_saves()
        ckptr = _get_async_ckptr()
        ckptr.save(path, payload, force=True)
        # sidecar writes must wait for the directory rename; orbax exposes
        # completion only via wait_until_finished, so defer them there —
        # and prune only after commit+sidecars (flush_saves does both)
        _pending_sidecars.append((path, _config_to_json(cfg),
                                  json.dumps(extra) if extra else None))
        if keep_last is not None:
            _pending_prunes.append((ckpt_dir, keep_last))
        return path
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    _write_sidecars(path, _config_to_json(cfg),
                    json.dumps(extra) if extra else None)
    if keep_last is not None:
        prune_checkpoints(ckpt_dir, max(keep_last, 1))
    return path


_pending_sidecars: list[tuple[str, str, str | None]] = []
_pending_prunes: list[tuple[str, int]] = []


def _write_sidecars(path: str, cfg_json: str, extra_json: str | None) -> None:
    with open(os.path.join(path, "config.json"), "w") as f:
        f.write(cfg_json)
    if extra_json is not None:
        with open(os.path.join(path, "extra.json"), "w") as f:
            f.write(extra_json)


def flush_saves() -> None:
    """``wait_for_saves`` + write the deferred config/extra sidecars of
    async checkpoints (their directories exist only after commit), then run
    deferred prunes. Entries are popped only after a successful write: if
    the sidecar write raises (disk full, permission) the entry stays queued
    so a retry can still complete the checkpoint."""
    wait_for_saves()
    while _pending_sidecars:
        path, cfg_json, extra_json = _pending_sidecars[0]
        if os.path.isdir(path):   # a pruned checkpoint needs no sidecar
            _write_sidecars(path, cfg_json, extra_json)
        _pending_sidecars.pop(0)
    while _pending_prunes:
        ckpt_dir, keep_last = _pending_prunes[0]
        prune_checkpoints(ckpt_dir, max(keep_last, 1))
        _pending_prunes.pop(0)


def restore_shardings(template: dict, mesh, *, tp: bool = False) -> dict:
    """Target-topology shardings for ``load_checkpoint(shardings=...)``:
    every floating leaf of params/opt_state gets the TP rules' spec on
    ``mesh`` (replicated under pure DP — ``parallel.mesh.param_sharding``;
    the optimizer's mu/nu subtrees carry the param names in their paths, so
    the same regex rules shard them identically to their params), the epoch
    scalar stays host-side."""
    from sttode_tpu.parallel.mesh import param_sharding
    return {k: param_sharding(v, mesh, tp=tp)
            for k, v in template.items()
            if k in ("params", "opt_state") and v is not None}


def load_checkpoint(path: str, *, template: Any | None = None,
                    shardings: dict | None = None):
    """Restore (params, opt_state, epoch, cfg). ``template`` (a matching
    pytree of arrays) restores exact dtypes/structure; without it orbax's
    saved metadata is used.

    ``shardings`` — optional ``{"params": tree, "opt_state": tree}`` of
    ``jax.sharding.Sharding`` leaves (see ``restore_shardings``) naming the
    TARGET topology explicitly. Without it orbax falls back to the sharding
    file written at save time, which (a) is the topology of the SAVING run —
    orbax itself warns this is unsafe when the restoring topology differs
    (save on a dp8 mesh, restore on one device or dp4) — and (b) emits that
    warning on every restore. With it, arrays land as jax.Arrays already
    placed for the restoring mesh and the saved topology is irrelevant.
    Requires a complete ``template``."""
    # orbax/tensorstore requires absolute paths; save() absolutizes, restore
    # must too (caught by the CLI workflow run with a relative --ckpt_dir)
    import jax

    path = os.path.abspath(path)
    flush_saves()   # a just-written background save must commit first
    ckptr = ocp.PyTreeCheckpointer()
    template_complete = template is not None and all(
        template.get(k) is not None for k in ("params", "opt_state"))
    if shardings is not None:
        if not template_complete:
            raise ValueError("shardings= needs a complete template "
                             "(params AND opt_state)")

        def _args(sub, shard_sub):
            # leaf-wise ArrayRestoreArgs carrying the target sharding;
            # jax.Array restore_type makes orbax place (and, across
            # topologies, reshard) during deserialization
            return jax.tree.map(
                lambda s: ocp.ArrayRestoreArgs(restore_type=jax.Array,
                                               sharding=s), shard_sub)

        restore_args = {
            k: (_args(template[k], shardings[k]) if k in shardings
                else jax.tree.map(lambda _: ocp.RestoreArgs(), template[k]))
            for k in template}
        restored = ckptr.restore(path, item=template,
                                 restore_args=restore_args)
    elif template_complete:
        # no target shardings named → restore to HOST numpy explicitly.
        # Orbax's default for jax.Array leaves reads the save-time sharding
        # file, which is the SAVING topology — wrong after an elastic
        # resize, and it warns ("unsafe when restoring on a different
        # topology") on every restore. Host arrays have no topology; jit /
        # device_put place them for whatever mesh the resuming run built.
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), template)
        restored = ckptr.restore(path, item=template,
                                 restore_args=restore_args)
    else:
        # partial template (e.g. eval wants params only): restore the raw
        # saved structure — orbax rejects None placeholders in item trees —
        # then rebuild container types from the provided sub-templates.
        # Same host-numpy rule as the full-template path (the saved tree
        # shape comes from the checkpoint's own metadata), so this branch
        # neither consults the save-time sharding file nor warns.
        try:
            # StepMetadata itself is one opaque leaf; the restorable tree
            # (272 ArrayMetadata leaves for the flagship model) hangs off
            # .item_metadata.tree
            meta = ckptr.metadata(path).item_metadata.tree
            rargs = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
            restored = dict(ckptr.restore(path, restore_args=rargs))
        except Exception:
            # metadata layout differs across orbax versions — fall back to
            # the default restore (topology warning and all) over failing
            restored = dict(ckptr.restore(path))
        if template:
            for k, sub in template.items():
                if sub is not None and k in restored:
                    restored[k] = _restore_like(sub, restored[k])
    with open(os.path.join(path, "config.json")) as f:
        cfg = _config_from_json(f.read())
    epoch = int(np.asarray(restored["epoch"]))
    return restored["params"], restored["opt_state"], epoch, cfg


def _committed_names(ckpt_dir: str) -> list[str]:
    """Checkpoint dir names matching model_%04d EXACTLY — an in-flight async
    save's ``model_XXXX.orbax-checkpoint-tmp-*`` staging dir must not be
    listed (it would crash int() parsing and could be resumed half-written).
    A directory missing its ``config.json`` sidecar is also excluded unless
    the sidecar write is still pending in this process: a crash between the
    orbax commit-rename and the deferred sidecar write leaves a directory
    ``load_checkpoint`` cannot load — resume must fall back to the previous
    complete checkpoint instead of bricking on it."""
    if not os.path.isdir(ckpt_dir):
        return []
    abs_dir = os.path.abspath(ckpt_dir)
    pending = {p for p, _, _ in _pending_sidecars}
    return sorted(
        d for d in os.listdir(ckpt_dir)
        if d.startswith("model_") and d[6:].isdigit()
        and (os.path.exists(os.path.join(abs_dir, d, "config.json"))
             or os.path.join(abs_dir, d) in pending))


def latest_checkpoint(ckpt_dir: str) -> str | None:
    """Newest committed ``model_%04d`` under ``ckpt_dir`` (the reference
    sampler trainer resumes by parsing the newest filename,
    trainsampler.py:300-308)."""
    cands = _committed_names(ckpt_dir)
    return os.path.join(ckpt_dir, cands[-1]) if cands else None


def checkpoint_epochs(ckpt_dir: str) -> list[int]:
    return sorted(int(d.split("_")[1]) for d in _committed_names(ckpt_dir))
