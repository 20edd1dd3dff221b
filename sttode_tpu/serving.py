"""Batched inference serving.

The reference's deployment story is the eval scripts (test.py) run offline;
this module is the production path the framework is intended for: a
``Predictor`` that compiles the best-of-K inference step once per shape
bucket, pads incoming scenes to those buckets, keeps params device-resident,
and (optionally) micro-batches concurrent requests.

Design notes (TPU serving):
- **Static shapes**: requests land in (agent-bucket, scene-count) programs;
  a cold bucket pays one compile, everything after hits the XLA fast path.
- **Zero host round-trips in the hot path**: scene-origin re-add happens on
  the padded device output once, then a single D2H transfer.
- **Determinism**: per-scene keys are folded from (seed, scene-content hash),
  so the same (seed, scene) pair returns the same samples regardless of what
  else shares the call — except under agent-axis micro-batching, where the
  contract is per (seed, group).
"""

from __future__ import annotations

import functools
import threading
import zlib
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from sttode_tpu.data.batching import DEFAULT_BUCKETS, bucket_for
from sttode_tpu.models.sttode import STTODEConfig, sttode_inference


class Predictor:
    """Compiled best-of-K trajectory predictor.

    >>> pred = Predictor(params, cfg)
    >>> samples = pred.predict(obs)        # obs [N, T_p, 2] → [K, N, T_f, 2]

    With a trained stage-2 sampler (``sampler_params``/``sampler_cfg``), the
    K samples come from the DLow diversity flow over the frozen net
    (reference test_sampler.py:117-212) instead of prior draws — the strictly
    better production path (CONVERGENCE.md two-stage studies: ADE 0.4468 vs
    0.4602). The flow is deterministic (mean=True, z=b), so per-scene RNG
    keys only affect the stage-1 fallback.
    """

    def __init__(self, params, cfg: STTODEConfig, *,
                 buckets: Sequence[int] = DEFAULT_BUCKETS,
                 sample_k: int | None = None, max_group: int = 16,
                 sampler_params=None, sampler_cfg=None,
                 pipeline_depth: int = 4,
                 isolated_group_max: int = 64):
        self.params = jax.device_put(params)
        self.cfg = cfg
        self.buckets = tuple(buckets)
        if (sampler_params is None) != (sampler_cfg is None):
            raise ValueError("pass sampler_params AND sampler_cfg together")
        self.sampler_cfg = sampler_cfg
        self.sampler_params = None
        if sampler_params is not None:
            if sampler_cfg.nz != cfg.zdim:
                # same fail-fast as cli/trainsampler: a mismatched flow
                # decodes garbage latents silently
                raise ValueError(
                    f"sampler nz {sampler_cfg.nz} must equal the net's "
                    f"zdim {cfg.zdim}")
            self.sampler_params = jax.device_put(sampler_params)
            if sample_k is not None and sample_k != sampler_cfg.nk:
                raise ValueError(
                    f"sample_k {sample_k} conflicts with the sampler's "
                    f"nk {sampler_cfg.nk} (the flow emits exactly nk samples)")
            sample_k = sampler_cfg.nk
        self.sample_k = sample_k or cfg.sample_k
        self.max_group = max_group   # cap scenes per device call (compile
                                     # churn + HBM bound for request bursts)
        # in-flight device dispatches kept un-fetched: the D2H fetch of group
        # i overlaps the dispatch of groups i+1..i+depth-1, hiding the
        # per-dispatch latency (tunnel/PCIe) behind device work. 1 = the
        # serial dispatch→fetch→dispatch behavior. Default 4 = the measured
        # knee (BENCHMARKS.md pipelined-dispatch table: throughput up AND
        # p50 down at every depth/mode, so deeper is a pure win until the
        # knee; cost is depth in-flight output buffers).
        self.pipeline_depth = max(1, int(pipeline_depth))
        # scene-axis isolation used to force ONE device dispatch per scene
        # (cross-scene attention would leak requests into each other), which
        # left the mode dispatch-rate-bound: ~0.16 ms device time under a
        # 4.5-35 ms tunnel dispatch (round-4 scene-axis p50 734 ms at 64
        # scenes/call). ``isolated_group_max`` > 1 instead vmaps up to that
        # many same-bucket scenes into ONE dispatch — each vmap lane is its
        # own batch_size=1 inference, so the attention token axis NEVER
        # crosses scenes (isolation by construction, not by serialization).
        # Per-scene keys are unchanged (digest of the single scene), so
        # samples keep the (seed, scene) determinism contract; values can
        # shift by float-level reassociation across group compositions —
        # pass isolated_group_max=1 for the exact serial behavior.
        self.isolated_group_max = max(1, int(isolated_group_max))
        self._lock = threading.Lock()
        self._fn = self._infer_fn()  # eager: no double-compile race on first use
        self._vfn = jax.vmap(self._fn, in_axes=(None, 0, 0))

    def _infer_fn(self):
        cfg, K = self.cfg, self.sample_k

        if self.sampler_params is not None:
            from sttode_tpu.models.sampler import sampler_forward
            scfg = self.sampler_cfg

            @jax.jit
            def fn(params, batch, key, sp):
                out = sampler_forward(sp, params, scfg, cfg, batch, key,
                                      mean=True)
                # dec_motion [M, K, T, 2] → the stage-1 contract [K, M, T, 2]
                return jnp.transpose(out.dec_motion, (1, 0, 2, 3))

            return lambda params, batch, key: fn(params, batch, key,
                                                 self.sampler_params)

        @functools.partial(jax.jit, static_argnames=())
        def fn(params, batch, key):
            return sttode_inference(params, cfg, batch, key, sample_k=K)

        return fn

    def predict(self, obs: np.ndarray, *, seed: int = 0) -> np.ndarray:
        """One scene: obs [N, T_p, 2] absolute coords → samples
        [K, N, T_f, 2] absolute coords."""
        return self.predict_many([obs], seed=seed)[0]

    def predict_many(self, scenes: Sequence[np.ndarray], *,
                     seed: int = 0) -> list[np.ndarray]:
        """Multiple scenes; same-bucket scenes share one device call (capped
        at ``max_group`` scenes per call)."""
        Tp, Tf = self.cfg.past_length, self.cfg.future_length
        by_bucket: dict[int, list[int]] = {}
        for i, obs in enumerate(scenes):
            if obs.ndim != 3 or obs.shape[-2:] != (Tp, 2):
                # ndim check matters: a single-agent [T_p, 2] array would
                # otherwise pass the trailing-shape test and silently
                # broadcast into T_p phantom agents downstream
                raise ValueError(
                    f"scene {i}: expected [N, {Tp}, 2], got {obs.shape}"
                    + (" — wrap a single agent as obs[None]"
                       if obs.ndim == 2 else ""))
            by_bucket.setdefault(bucket_for(len(obs), self.buckets),
                                 []).append(i)

        out: list[np.ndarray | None] = [None] * len(scenes)
        base_key = jax.random.PRNGKey(seed)
        # scene-axis attention (compat default) attends ACROSS stacked scenes
        # — stacking unrelated requests would leak one request's data into
        # another's prediction. Micro-batch only under agent-axis attention.
        isolate = self.cfg.attn_axis != "agent"
        grouped_isolation = isolate and self.isolated_group_max > 1
        cap = (self.isolated_group_max if grouped_isolation
               else 1 if isolate else self.max_group)
        with self._lock:
            # pipelined dispatch: keep up to pipeline_depth groups in flight
            # and fetch in FIFO order — the host-blocking D2H of group i
            # overlaps the device work of groups i+1.. (round-3 VERDICT
            # item 7: one-dispatch-per-group serialized on its own fetch)
            pending: list[tuple] = []
            for bucket, raw_idxs in sorted(by_bucket.items()):
                for g0 in range(0, len(raw_idxs), cap):
                    idxs = raw_idxs[g0:g0 + cap]
                    if grouped_isolation:
                        # one dispatch, one vmap lane per scene: per-scene
                        # keys exactly as the serial path computes them
                        keys = jnp.stack([
                            jax.random.fold_in(
                                base_key,
                                zlib.crc32(np.ascontiguousarray(
                                    scenes[i], np.float32).tobytes())
                                & 0x7FFFFFFF)
                            for i in idxs])
                        pending.append(self._launch_isolated_group(
                            scenes, idxs, bucket, keys))
                    else:
                        # fold the scenes' content into the key: same (seed,
                        # scene) → same samples independent of composition
                        digest = 0
                        for i in idxs:
                            arr = np.ascontiguousarray(scenes[i], np.float32)
                            # crc32, not hash(): stable across processes
                            digest ^= zlib.crc32(arr.tobytes()) & 0x7FFFFFFF
                        key = jax.random.fold_in(base_key, digest)
                        pending.append(self._launch_group(scenes, idxs,
                                                          bucket, key))
                    if len(pending) >= self.pipeline_depth:
                        self._finish_group(pending.pop(0), out)
            while pending:
                self._finish_group(pending.pop(0), out)
        return out  # type: ignore[return-value]

    def _launch_group(self, scenes, idxs, bucket, key):
        """Prepare + DISPATCH one group without fetching: returns the
        in-flight device array plus the host context ``_finish_group`` needs.
        One vectorized numpy pass prepares the whole group."""
        from sttode_tpu.data.preprocess import prepare_scene_group

        Tp, Tf = self.cfg.past_length, self.cfg.future_length
        B = len(idxs)
        obs = np.zeros((B, bucket, Tp, 2), np.float32)
        valid = np.zeros((B, bucket), np.float32)
        ns = []
        for j, i in enumerate(idxs):
            a = np.asarray(scenes[i], np.float32)
            obs[j, :len(a)] = a
            valid[j, :len(a)] = 1.0
            ns.append(len(a))
        pred_zeros = np.zeros((B, bucket, Tf, 2), np.float32)
        batch, origs = prepare_scene_group(obs, pred_zeros, valid,
                                           training=False)
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        preds_dev = self._fn(self.params, batch, key)
        try:
            # start the D2H copy now so it overlaps the next dispatch; the
            # np.asarray in _finish_group is then a completion wait
            preds_dev.copy_to_host_async()
        except AttributeError:
            pass
        return ("flat", preds_dev, idxs, bucket, ns, origs)

    def _launch_isolated_group(self, scenes, idxs, bucket, keys):
        """Dispatch up to ``isolated_group_max`` same-bucket scenes as ONE
        vmapped device call — lane g runs an independent batch_size=1
        inference on scene g (scene-axis attention tokens never cross
        lanes). The scene count pads to the next power of two (≤ the cap)
        so compile count stays log-bounded per agent bucket; padding lanes
        replicate scene 0 and are dropped on fetch."""
        from sttode_tpu.data.preprocess import prepare_scene_group

        Tp, Tf = self.cfg.past_length, self.cfg.future_length
        G = len(idxs)
        Gp = 1
        while Gp < G:
            Gp *= 2
        Gp = min(Gp, self.isolated_group_max)
        obs = np.zeros((Gp, bucket, Tp, 2), np.float32)
        valid = np.zeros((Gp, bucket), np.float32)
        ns = []
        for j, i in enumerate(idxs):
            a = np.asarray(scenes[i], np.float32)
            obs[j, :len(a)] = a
            valid[j, :len(a)] = 1.0
            ns.append(len(a))
        if Gp > G:   # padding lanes: copy lane 0 (valid data, discarded)
            obs[G:] = obs[0]
            valid[G:] = valid[0]
            keys = jnp.concatenate(
                [keys, jnp.broadcast_to(keys[:1], (Gp - G, *keys.shape[1:]))])
        pred_zeros = np.zeros((Gp, bucket, Tf, 2), np.float32)
        batch, origs = prepare_scene_group(obs, pred_zeros, valid,
                                           training=False)
        # [Gp·bucket, ...] rows → a [Gp, bucket, ...] lane axis for vmap;
        # each lane is its own Batch(batch_size=1, agent_num=bucket)
        import dataclasses as _dc

        arrays = {f.name: getattr(batch, f.name)
                  for f in _dc.fields(batch) if f.name not in
                  ("batch_size", "agent_num")}
        lane = {k: jnp.asarray(v).reshape(Gp, bucket, *v.shape[1:])
                for k, v in arrays.items()}
        vbatch = type(batch)(batch_size=1, agent_num=bucket, **lane)
        preds_dev = self._vfn(self.params, vbatch, keys)   # [Gp,K,bucket,T,2]
        try:
            preds_dev.copy_to_host_async()
        except AttributeError:
            pass
        return ("vmapped", preds_dev, idxs, bucket, ns, origs)

    def _finish_group(self, launched, out):
        """Blocking fetch + per-scene unpad/origin re-add for one in-flight
        group."""
        if launched[0] == "vmapped":
            _, preds_dev, idxs, bucket, ns, origs = launched
            preds = np.asarray(preds_dev)     # [Gp, K, bucket, Tf, 2]
            for j, i in enumerate(idxs):
                out[i] = preds[j, :, :ns[j]] + origs[j][None, None, None]
            return
        _, preds_dev, idxs, bucket, ns, origs = launched
        Tf = self.cfg.future_length
        preds = np.asarray(preds_dev)
        K = preds.shape[0]
        preds = preds.reshape(K, len(idxs), bucket, Tf, 2)
        for j, i in enumerate(idxs):
            out[i] = preds[:, j, :ns[j]] + origs[j][None, None, None]

    def warmup(self, agent_counts: Sequence[int] = (1,), *, scenes_per: int = 1):
        """Pre-compile the buckets you expect in production."""
        for n in agent_counts:
            obs = np.zeros((n, self.cfg.past_length, 2), np.float32)
            self.predict_many([obs] * scenes_per)
