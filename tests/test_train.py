"""L6 + parallel tests: compiled train steps, schedulers, checkpointing, and
multi-device DP/TP on the 8-device virtual CPU mesh (SURVEY.md §4(f))."""

import time

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from sttode_tpu.models import (
    Batch, STTODEConfig, SamplerConfig, sampler_init, sttode_init,
)
from sttode_tpu.parallel import make_mesh, param_sharding, shard_batch
from sttode_tpu.train import (
    ReduceOnPlateau, lambda_lr, load_checkpoint, latest_checkpoint,
    make_sampler_train_step, make_train_step, save_checkpoint, step_lr,
    train_epoch,
)


def tiny_cfg(**kw):
    base = dict(hidden_dim=16, zdim=8, num_heads=4, ff_dim=32,
                past_length=8, future_length=12, sample_k=4, min_clip=0.0)
    base.update(kw)
    return STTODEConfig(**base)


def make_batch(rng, B=2, N=4, Tp=8, Tf=12):
    M = B * N
    past = rng.standard_normal((M, Tp, 2)).astype(np.float32)
    fut = rng.standard_normal((M, Tf, 2)).astype(np.float32)
    past_vel = np.diff(past, axis=1, prepend=past[:, :1])
    fut_vel = np.diff(np.concatenate([past[:, -1:], fut], 1), axis=1)
    return Batch(past=jnp.asarray(past), past_vel=jnp.asarray(past_vel),
                 future=jnp.asarray(fut), future_vel=jnp.asarray(fut_vel),
                 valid=jnp.ones((M,), jnp.float32), batch_size=B, agent_num=N)


class TestTrainStep:
    def test_single_device_step(self, rng):
        cfg = tiny_cfg()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        step = make_train_step(cfg, opt, donate=False)
        batch = make_batch(rng)
        p2, o2, metrics = step(params, opt_state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["total"]))
        # params actually moved
        d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                   params, p2)
        assert max(jax.tree_util.tree_leaves(d)) > 0

    def test_scanned_step_matches_sequential(self, rng):
        """scan_steps: S optimizer steps in one dispatch must produce the same
        params/metrics as S sequential single-step dispatches (the scanned
        step splits its key into the same per-step subkeys)."""
        from sttode_tpu.train import stack_batches
        cfg = tiny_cfg()
        opt = optax.adam(1e-3)
        batches = [make_batch(rng) for _ in range(3)]
        key = jax.random.PRNGKey(5)

        params_a = sttode_init(jax.random.PRNGKey(0), cfg)
        state_a = opt.init(params_a)
        step1 = make_train_step(cfg, opt, donate=False)
        for b, k in zip(batches, jax.random.split(key, 3)):
            params_a, state_a, m_a = step1(params_a, state_a, b, k)

        params_b = sttode_init(jax.random.PRNGKey(0), cfg)
        state_b = opt.init(params_b)
        stepS = make_train_step(cfg, opt, donate=False, scan_steps=3)
        params_b, state_b, m_b = stepS(params_b, state_b,
                                       stack_batches(batches), key)
        assert np.asarray(m_b["total"]).shape == (3,)
        np.testing.assert_allclose(float(m_a["total"]),
                                   float(m_b["total"][-1]), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(params_a),
                        jax.tree_util.tree_leaves(params_b)):
            # scan-body vs unrolled compilation reassociates fp reductions;
            # tolerance is fp32-noise-level, not semantic
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-5)

    def test_train_epoch_scanned_with_tail(self, rng):
        """Epoch driver groups batches into scan chunks and flushes the
        shorter tail (5 batches, scan_steps=2 → dispatches of 2/2/1)."""
        cfg = tiny_cfg()
        opt = optax.adam(1e-3)
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        state = opt.init(params)
        step = make_train_step(cfg, opt, donate=False, scan_steps=2)
        batches = [(make_batch(rng), None) for _ in range(5)]
        params, state, means = train_epoch(step, params, state, batches,
                                           jax.random.PRNGKey(1),
                                           scan_steps=2, prefetch_depth=0)
        assert set(means) >= {"total", "pred", "kl"}
        assert all(np.isfinite(v) for v in means.values())

    def test_sampler_scanned_matches_sequential(self, rng):
        from sttode_tpu.models import SamplerConfig, sampler_init
        from sttode_tpu.train import stack_batches
        cfg = tiny_cfg()
        scfg = SamplerConfig(nk=4, nz=8, qnet_mlp=(16, 8))
        net = sttode_init(jax.random.PRNGKey(0), cfg)
        opt = optax.adam(1e-3)
        batches = [make_batch(rng) for _ in range(3)]
        key = jax.random.PRNGKey(9)

        sp_a = sampler_init(jax.random.PRNGKey(1), scfg,
                            pred_model_dim=cfg.hidden_dim,
                            past_feature_dim=2 * cfg.hidden_dim)
        st_a = opt.init(sp_a)
        step1 = make_sampler_train_step(cfg, scfg, opt, donate=False)
        for b, k in zip(batches, jax.random.split(key, 3)):
            sp_a, st_a, m_a = step1(sp_a, net, st_a, b, k)

        sp_b = sampler_init(jax.random.PRNGKey(1), scfg,
                            pred_model_dim=cfg.hidden_dim,
                            past_feature_dim=2 * cfg.hidden_dim)
        st_b = opt.init(sp_b)
        stepS = make_sampler_train_step(cfg, scfg, opt, donate=False,
                                        scan_steps=3)
        sp_b, st_b, m_b = stepS(sp_b, net, st_b, stack_batches(batches), key)
        np.testing.assert_allclose(float(m_a["total"]),
                                   float(m_b["total"][-1]), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(sp_a),
                        jax.tree_util.tree_leaves(sp_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-5)

    def test_sampler_step_on_mesh_matches_single_device(self, rng):
        """Stage-2 DP over the 8-way mesh: sampler params after one step
        match the single-device step (gradient psum correctness)."""
        from sttode_tpu.parallel import make_mesh, shard_batch

        cfg = tiny_cfg()
        scfg = SamplerConfig(nk=4, nz=cfg.zdim, train_w_mean=True)
        net = sttode_init(jax.random.PRNGKey(0), cfg)
        # SGD, not Adam: the check is gradient equality across reduction
        # orders, and Adam's m/√v normalization amplifies fp noise on
        # near-zero grads into O(1) relative update differences
        opt = optax.sgd(1e-2)
        batch = make_batch(rng)           # M = 8 rows → one per device
        key = jax.random.PRNGKey(9)
        sp0 = sampler_init(jax.random.PRNGKey(1), scfg,
                           pred_model_dim=cfg.hidden_dim,
                           past_feature_dim=2 * cfg.hidden_dim)

        step1 = make_sampler_train_step(cfg, scfg, opt, donate=False)
        sp_a, _, m_a = step1(sp0, net, opt.init(sp0), batch, key)

        mesh = make_mesh(dp=8, tp=1)
        stepM = make_sampler_train_step(cfg, scfg, opt, donate=False,
                                        mesh=mesh)
        sp_b, _, m_b = stepM(sp0, net, opt.init(sp0),
                             shard_batch(batch, mesh), key)
        np.testing.assert_allclose(float(m_a["total"]), float(m_b["total"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(sp_a),
                        jax.tree_util.tree_leaves(sp_b)):
            # tolerance covers psum-vs-single reduction-order noise
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-2, atol=1e-4)

    def test_train_epoch_scanned_interleaved_buckets(self, rng):
        """Alternating bucket shapes each fill their own chunk — every batch
        is consumed exactly once and means stay finite."""
        cfg = tiny_cfg()
        opt = optax.adam(1e-3)
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        state = opt.init(params)
        step = make_train_step(cfg, opt, donate=False, scan_steps=2)
        batches = []
        for i in range(3):   # stream A B A B A B: each bucket chunks 2+1
            batches.append((make_batch(rng, B=1, N=2), None))
            batches.append((make_batch(rng, B=2, N=4), None))
        params, state, means = train_epoch(step, params, state, batches,
                                           jax.random.PRNGKey(1),
                                           scan_steps=2, prefetch_depth=0)
        assert all(np.isfinite(v) for v in means.values())

    def test_train_epoch_driver(self, rng):
        cfg = tiny_cfg()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        step = make_train_step(cfg, opt, donate=False)
        batches = [(make_batch(rng), None) for _ in range(3)]
        params, opt_state, means = train_epoch(step, params, opt_state,
                                               batches, jax.random.PRNGKey(2))
        assert set(means) == {"total", "pred", "recover", "kl", "diverse"}


class TestMeshDP:
    def test_dp_matches_single_device(self, rng):
        """Same params/batch/key: the 8-way DP step must match the
        single-device step numerically."""
        assert jax.device_count() >= 8, "conftest forces 8 CPU devices"
        cfg = tiny_cfg()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        batch = make_batch(rng, B=2, N=4)   # M=8 rows → 1 per device

        step1 = make_train_step(cfg, opt, donate=False)
        p1, _, m1 = step1(params, opt_state, batch, jax.random.PRNGKey(1))

        mesh = make_mesh(dp=8, tp=1)
        stepm = make_train_step(cfg, opt, mesh=mesh, params_like=params,
                                donate=False)
        pm_in = jax.device_put(params, param_sharding(params, mesh))
        bm = shard_batch(batch, mesh)
        pm, _, mm = stepm(pm_in, opt_state, bm, jax.random.PRNGKey(1))

        np.testing.assert_allclose(float(m1["total"]), float(mm["total"]),
                                   rtol=1e-5)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), p1, pm)
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5

    def test_dp_scanned_matches_single_device(self, rng):
        """8-way DP with scan_steps=2: stacked batches shard rows (not the
        step axis) and the result matches the single-device scanned step."""
        from sttode_tpu.train import stack_batches
        cfg = tiny_cfg()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        stacked = stack_batches([make_batch(rng, B=2, N=4) for _ in range(2)])
        key = jax.random.PRNGKey(1)

        step1 = make_train_step(cfg, opt, donate=False, scan_steps=2)
        p1, _, m1 = step1(params, opt_state, stacked, key)

        mesh = make_mesh(dp=8, tp=1)
        stepm = make_train_step(cfg, opt, mesh=mesh, params_like=params,
                                donate=False, scan_steps=2)
        pm_in = jax.device_put(params, param_sharding(params, mesh))
        bm = shard_batch(stacked, mesh, stacked=True)
        pm, _, mm = stepm(pm_in, opt_state, bm, key)

        np.testing.assert_allclose(np.asarray(m1["total"]),
                                   np.asarray(mm["total"]), rtol=1e-5)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), p1, pm)
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5

    def test_tp_sharding_rules_applied(self):
        cfg = tiny_cfg(ff_dim=64)
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        mesh = make_mesh(dp=4, tp=2)
        sh = param_sharding(params, mesh, tp=True)
        flat = jax.tree_util.tree_leaves_with_path(sh)
        sharded = [p for p, s in flat if "model" in str(s.spec)]
        assert len(sharded) > 0, "TP rules matched nothing"

    def test_tp_step_runs_and_matches(self, rng):
        cfg = tiny_cfg(ff_dim=64)
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        batch = make_batch(rng, B=2, N=4)
        step1 = make_train_step(cfg, opt, donate=False)
        p1, _, m1 = step1(params, opt_state, batch, jax.random.PRNGKey(1))

        mesh = make_mesh(dp=4, tp=2)
        stepm = make_train_step(cfg, opt, mesh=mesh, tp=True,
                                params_like=params, donate=False)
        pm_in = jax.device_put(params, param_sharding(params, mesh, tp=True))
        bm = shard_batch(batch, mesh)
        pm, _, mm = stepm(pm_in, opt_state, bm, jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(m1["total"]), float(mm["total"]),
                                   rtol=1e-4)


class TestSamplerStep:
    def test_sampler_step(self, rng):
        cfg = tiny_cfg()
        scfg = SamplerConfig(nk=4, nz=cfg.zdim, qnet_mlp=(32, 16),
                             kld_min_clamp=0.0)
        net = sttode_init(jax.random.PRNGKey(0), cfg)
        sp = sampler_init(jax.random.PRNGKey(1), scfg,
                          pred_model_dim=cfg.hidden_dim,
                          past_feature_dim=2 * cfg.hidden_dim)
        opt = optax.adam(1e-4)
        opt_state = opt.init(sp)
        step = make_sampler_train_step(cfg, scfg, opt, donate=False)
        batch = make_batch(rng, B=1, N=3)
        sp2, o2, metrics = step(sp, net, opt_state, batch,
                                jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["total"]))
        assert "kld" in metrics and "diverse" in metrics


class TestSchedulers:
    def test_step_lr(self):
        s = step_lr(1e-4, 10, 0.5)
        assert s(0) == pytest.approx(1e-4)
        assert s(9) == pytest.approx(1e-4)
        assert s(10) == pytest.approx(5e-5)
        assert s(25) == pytest.approx(2.5e-5)

    def test_lambda_lr(self):
        s = lambda_lr(1e-3, fix_epochs=5, total_epochs=15)
        assert s(4) == pytest.approx(1e-3)
        assert s(5) < 1e-3 or s(5) == pytest.approx(1e-3)
        assert s(14) < s(6)

    def test_plateau(self):
        p = ReduceOnPlateau(1.0, factor=0.5, patience=1)
        p.step(10.0)
        p.step(10.0)  # bad 1
        lr = p.step(10.0)  # bad 2 > patience → decay
        assert lr == pytest.approx(0.5)


class TestCheckpoint:
    def test_roundtrip(self, rng, tmp_path):
        cfg = tiny_cfg()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        path = save_checkpoint(str(tmp_path), 5, params, opt_state, cfg)
        assert latest_checkpoint(str(tmp_path)) == path
        p2, o2, epoch, cfg2 = load_checkpoint(
            path, template={"params": params, "opt_state": opt_state,
                            "epoch": np.asarray(0)})
        assert epoch == 5
        assert cfg2 == cfg
        chex_equal = jax.tree_util.tree_map(
            lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), params, p2)
        assert all(jax.tree_util.tree_leaves(chex_equal))

    def test_config_json_version_skew(self):
        """Checkpoint configs stay loadable across config-surface evolution:
        missing fields take NamedTuple defaults (old checkpoint, new code),
        unknown fields are dropped (new checkpoint, old code)."""
        from sttode_tpu.train.checkpoint import (_config_from_json,
                                                 _config_to_json)
        cfg = STTODEConfig(hidden_dim=16)
        s = _config_to_json(cfg)
        import json as _json
        d = _json.loads(s)
        d.pop("diverse_grad")              # field absent in an old checkpoint
        d["future_field"] = "x"            # field from a newer version
        cfg2 = _config_from_json(_json.dumps(d))
        assert cfg2.hidden_dim == 16
        assert cfg2.diverse_grad == STTODEConfig._field_defaults["diverse_grad"]


class TestMeshHelpers:
    def test_hybrid_mesh_single_slice_fallback(self):
        from sttode_tpu.parallel.mesh import make_hybrid_mesh
        mesh = make_hybrid_mesh(ici_dp=4, tp=2, dcn_dp=1)
        assert mesh.shape == {"data": 4, "model": 2}

    def test_init_distributed_noop_single_host(self):
        from sttode_tpu.parallel.mesh import init_distributed
        assert init_distributed() is False


class TestCheckpointAsyncAndRetention:
    def test_background_save_roundtrip(self, rng, tmp_path):
        """background=True: save returns immediately, flush commits, and
        load restores the same pytrees + config (load flushes implicitly)."""
        from sttode_tpu.train import flush_saves

        cfg = tiny_cfg()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        path = save_checkpoint(str(tmp_path), 3, params, opt_state, cfg,
                               background=True)
        p2, o2, epoch, cfg2 = load_checkpoint(
            path, template={"params": params, "opt_state": opt_state,
                            "epoch": np.asarray(0)})
        assert epoch == 3 and cfg2 == cfg
        eq = jax.tree_util.tree_map(
            lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), params, p2)
        assert all(jax.tree_util.tree_leaves(eq))
        flush_saves()   # idempotent after load's implicit flush

    def test_keep_last_prunes_old_checkpoints(self, rng, tmp_path):
        from sttode_tpu.train import checkpoint_epochs

        cfg = tiny_cfg()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        for e in (1, 2, 3):
            save_checkpoint(str(tmp_path), e, params, opt_state, cfg)
        # the 4th save with keep_last=2 leaves exactly {3, 4}
        save_checkpoint(str(tmp_path), 4, params, opt_state, cfg, keep_last=2)
        assert checkpoint_epochs(str(tmp_path)) == [3, 4]

    def test_listing_ignores_staging_dirs(self, tmp_path):
        """An in-flight orbax async save's tmp dir must not be listed as a
        resumable checkpoint (it parses as garbage and is half-written),
        and neither may a committed dir whose config.json sidecar never
        landed (crash between orbax commit and the deferred sidecar write)
        — resume must fall back to the last COMPLETE checkpoint."""
        from sttode_tpu.train import checkpoint_epochs, latest_checkpoint
        import os

        os.makedirs(tmp_path / "model_0004")
        with open(tmp_path / "model_0004" / "config.json", "w") as f:
            f.write("{}")
        os.makedirs(tmp_path / "model_0005.orbax-checkpoint-tmp-12345")
        os.makedirs(tmp_path / "model_0006")   # sidecar-less: crash remains
        assert checkpoint_epochs(str(tmp_path)) == [4]
        assert latest_checkpoint(str(tmp_path)).endswith("model_0004")

    def test_prune_sweeps_sidecarless_orphans(self, rng, tmp_path):
        """A model_%04d dir with no config.json (crash between commit and
        sidecar write) is unloadable; prune removes it so it cannot leak
        disk forever — but only once it is OLDER than the cross-process
        grace window (a fresh dir could be another process's just-committed
        checkpoint whose sidecar write is in flight)."""
        from sttode_tpu.train import checkpoint_epochs
        from sttode_tpu.train.checkpoint import prune_checkpoints
        import os

        cfg = tiny_cfg()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        save_checkpoint(str(tmp_path), 1, params, opt_state, cfg)
        os.makedirs(tmp_path / "model_0002")   # orphan
        # fresh orphan: protected by the grace window (could be another
        # process's sidecar-pending commit)
        removed = prune_checkpoints(str(tmp_path), keep_last=5)
        assert not any(p.endswith("model_0002") for p in removed)
        assert os.path.isdir(tmp_path / "model_0002")
        # backdate past the window: now it is crash debris and is swept
        old = time.time() - 3600
        os.utime(tmp_path / "model_0002", (old, old))
        removed = prune_checkpoints(str(tmp_path), keep_last=5)
        assert any(p.endswith("model_0002") for p in removed)
        assert not os.path.isdir(tmp_path / "model_0002")
        assert checkpoint_epochs(str(tmp_path)) == [1]

    def test_async_keep_last_prunes_only_after_commit(self, rng, tmp_path):
        """With background=True + keep_last=1, the old checkpoint must
        survive until the NEW one has committed with its sidecars — never a
        zero-checkpoint window; after flush exactly the newest remains."""
        from sttode_tpu.train import checkpoint_epochs, flush_saves

        cfg = tiny_cfg()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        save_checkpoint(str(tmp_path), 1, params, opt_state, cfg)
        save_checkpoint(str(tmp_path), 2, params, opt_state, cfg,
                        background=True, keep_last=1)
        # before flush the previous complete checkpoint is still on disk
        assert 1 in checkpoint_epochs(str(tmp_path))
        flush_saves()
        assert checkpoint_epochs(str(tmp_path)) == [2]

    def test_keep_last_one(self, rng, tmp_path):
        """keep_last=1 retains exactly the newest checkpoint (regression:
        prune(keep_last-1=0) must remove ALL older ones, not no-op)."""
        from sttode_tpu.train import checkpoint_epochs

        cfg = tiny_cfg()
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        for e in (1, 2, 3):
            save_checkpoint(str(tmp_path), e, params, opt_state, cfg,
                            keep_last=1)
        assert checkpoint_epochs(str(tmp_path)) == [3]


class TestCrossTopologyRestore:
    """Round-5 VERDICT item 3: checkpoints written on one device topology
    must restore onto a DIFFERENT one — the preemption/elastic story
    (train/supervisor.py + cli --distributed) the same-topology roundtrip
    test never exercised. Restores pass explicit target shardings
    (train.restore_shardings) so orbax never consults the save-time sharding
    file — the thing its 'unsafe when restoring on a different topology'
    warning is about. The reference's resume (train.py:183-198) is
    single-device and never needed this."""

    @staticmethod
    def _trained_sharded_state(rng, cfg, opt, mesh, tp):
        """One real step on `mesh` so the saved state is genuinely
        mesh-placed (TP-sharded leaves when tp=True), then save."""
        params = sttode_init(jax.random.PRNGKey(0), cfg)
        sh = param_sharding(params, mesh, tp=tp)
        pm = jax.device_put(params, sh)
        om = opt.init(pm)
        step = make_train_step(cfg, opt, mesh=mesh, tp=tp, params_like=params,
                               donate=False)
        batch = make_batch(rng, B=2, N=4)
        pm, om, _ = step(pm, om, shard_batch(batch, mesh),
                         jax.random.PRNGKey(1))
        return pm, om

    def _assert_restore_continues(self, rng, tmp_path, save_mesh, save_tp,
                                  restore_mesh, restore_tp):
        import warnings as _warnings

        from sttode_tpu.train import restore_shardings

        cfg = tiny_cfg(ff_dim=64)
        opt = optax.adam(1e-4)
        pm, om = self._trained_sharded_state(rng, cfg, opt, save_mesh,
                                             save_tp)
        path = save_checkpoint(str(tmp_path), 1, pm, om, cfg)

        # oracle: the NEXT step from this state, on a single device with
        # host copies — the never-interrupted continuation
        p_host = jax.device_get(pm)
        o_host = jax.device_get(om)
        batch2 = make_batch(rng, B=2, N=4)
        step1 = make_train_step(cfg, opt, donate=False)
        _, _, m_oracle = step1(p_host, o_host, batch2, jax.random.PRNGKey(2))

        # restore on the DIFFERENT topology with explicit target shardings;
        # the orbax sharding-file warning must not fire
        template = {"params": p_host, "opt_state": o_host,
                    "epoch": np.asarray(0)}
        sh = restore_shardings(template, restore_mesh, tp=restore_tp)
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            p2, o2, epoch, cfg2 = load_checkpoint(path, template=template,
                                                  shardings=sh)
        topo_warnings = [w for w in caught
                         if "topology" in str(w.message)]
        assert not topo_warnings, topo_warnings
        assert epoch == 1 and cfg2 == cfg
        # restored leaves actually landed with the target topology
        leaf = jax.tree_util.tree_leaves(p2)[0]
        assert set(leaf.sharding.device_set) <= set(restore_mesh.devices.flat)

        # resume ONE step on the restoring topology: loss equals the oracle
        stepm = make_train_step(cfg, opt, mesh=restore_mesh, tp=restore_tp,
                                params_like=p_host, donate=False)
        _, _, m2 = stepm(p2, o2, shard_batch(batch2, restore_mesh),
                         jax.random.PRNGKey(2))
        np.testing.assert_allclose(float(m_oracle["total"]),
                                   float(m2["total"]), rtol=1e-5)

    def test_save_dp4tp2_restore_dp1(self, rng, tmp_path):
        """TP-sharded save (8 devices, model-axis splits) → one device."""
        self._assert_restore_continues(
            rng, tmp_path, save_mesh=make_mesh(dp=4, tp=2), save_tp=True,
            restore_mesh=make_mesh(dp=1), restore_tp=False)

    def test_save_dp8_restore_dp4(self, rng, tmp_path):
        """Replicated dp8 save → dp4 mesh (elastic shrink)."""
        self._assert_restore_continues(
            rng, tmp_path, save_mesh=make_mesh(dp=8), save_tp=False,
            restore_mesh=make_mesh(dp=4), restore_tp=False)

    def test_save_dp2_restore_dp4tp2_grow(self, rng, tmp_path):
        """dp2 save → dp4×tp2 restore (elastic grow + resharding)."""
        self._assert_restore_continues(
            rng, tmp_path, save_mesh=make_mesh(dp=2), save_tp=False,
            restore_mesh=make_mesh(dp=4, tp=2), restore_tp=True)

    def test_sampler_resume_from_cross_topology_stage1(self, rng, tmp_path):
        """trainsampler's resume path: a stage-1 checkpoint saved under a
        dp4×tp2 topology feeds stage-2 sampler training on ONE device — the
        frozen-net restore the two-stage workflow does in practice."""
        from sttode_tpu.train import restore_shardings

        cfg = tiny_cfg(ff_dim=64)
        opt = optax.adam(1e-4)
        mesh = make_mesh(dp=4, tp=2)
        pm, om = self._trained_sharded_state(rng, cfg, opt, mesh, True)
        path = save_checkpoint(str(tmp_path), 1, pm, om, cfg)

        p_host = jax.device_get(pm)
        template = {"params": p_host, "opt_state": jax.device_get(om),
                    "epoch": np.asarray(0)}
        p2, _, _, cfg2 = load_checkpoint(
            path, template=template,
            shardings=restore_shardings(template, make_mesh(dp=1)))

        scfg = SamplerConfig(nk=cfg.sample_k, nz=cfg.zdim, qnet_mlp=(32, 16))
        sp = sampler_init(jax.random.PRNGKey(7), scfg,
                          pred_model_dim=cfg.hidden_dim,
                          past_feature_dim=2 * cfg.hidden_dim)
        sopt = optax.adam(1e-4)
        sstep = make_sampler_train_step(cfg2, scfg, sopt, donate=False)
        batch = make_batch(rng, B=2, N=4)

        # oracle from the host copy of the same stage-1 params
        _, _, m_oracle = sstep(sp, p_host, sopt.init(sp), batch,
                               jax.random.PRNGKey(3))
        _, _, m2 = sstep(sp, p2, sopt.init(sp), batch, jax.random.PRNGKey(3))
        np.testing.assert_allclose(float(m_oracle["total"]),
                                   float(m2["total"]), rtol=1e-6)


def test_partial_template_restore_no_topology_warning(rng, tmp_path):
    """Eval-style params-only restores (cli.test / trainsampler frozen-net
    loads) must not consult the save-time sharding file either: the partial
    branch restores host numpy via checkpoint metadata, so orbax's
    'unsafe on a different topology' warning never fires (round-5 item 3
    follow-through — the suite previously carried the warning from e2e)."""
    import warnings as _warnings

    cfg = tiny_cfg()
    params = sttode_init(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-4)
    path = save_checkpoint(str(tmp_path), 2, params, opt.init(params), cfg)
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        p2, _, epoch, _ = load_checkpoint(
            path, template={"params": params, "opt_state": None,
                            "epoch": np.asarray(0)})
    assert not [w for w in caught if "topology" in str(w.message)]
    assert epoch == 2
    eq = jax.tree_util.tree_map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), params, p2)
    assert all(jax.tree_util.tree_leaves(eq))
