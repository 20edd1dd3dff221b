"""L5 data-pipeline tests on tiny synthetic csv/pkl/npy fixtures
(SURVEY.md §4(d)) + metric unit tests."""

import os
import pickle

import numpy as np
import pytest

from sttode_tpu.data import (
    bucket_for, compiled_shape_count, load_eth_ucy, load_nba, load_sdd,
    nba_batches, prepare_nba_batch, prepare_scene, rotate_2d, scene_batches,
    stack_scenes,
)
from sttode_tpu.utils.metrics import (
    AverageMeter, best_sample_indices, compute_ade, compute_fde,
    count_miss_samples,
)


def write_synthetic_csv(path, n_frames=25, peds=((1, 0), (2, 0), (3, 12))):
    """peds: (ped_id, start_frame). Each ped walks linearly while present."""
    rows = []
    for f in range(n_frames):
        for pid, start in peds:
            if start <= f:
                rows.append([f * 10, pid, 1.0 * f + pid, 2.0 * f - pid])
    np.savetxt(path, np.asarray(rows, float), delimiter=",")


class TestEthUcy:
    def test_windowing_and_coverage(self, tmp_path):
        # 25 frames, seq_len=20 → 6 windows; ped 3 appears at frame 12 so it
        # only fully covers windows starting at index ≥ ... never (needs 20
        # frames from 12 → last window starts at 5, 5+20=25 ≤ 25 ok: covers
        # [5..24] but ped 3 starts at 12 → not full coverage anywhere.
        p = tmp_path / "scene.csv"
        write_synthetic_csv(str(p))
        scenes = load_eth_ucy(str(tmp_path), obs_len=8, pred_len=12)
        assert len(scenes) == 6
        for s in scenes:
            assert s["obs"].shape == (2, 8, 2)       # only peds 1,2 kept
            assert s["pred"].shape == (2, 12, 2)
            assert set(s["ped_ids"].tolist()) == {1.0, 2.0}

    def test_min_ped_filter(self, tmp_path):
        p = tmp_path / "one_ped.csv"
        write_synthetic_csv(str(p), peds=((1, 0),))
        scenes = load_eth_ucy(str(tmp_path))
        assert scenes == []  # strictly more than min_ped=1 required

    def test_traj_scale_and_rel(self, tmp_path):
        p = tmp_path / "s.csv"
        write_synthetic_csv(str(p), n_frames=20, peds=((1, 0), (2, 0)))
        scenes = load_eth_ucy(str(tmp_path), traj_scale=2.0)
        s = scenes[0]
        # linear walk: x step 1 per frame, ÷2 scale → rel x = 0.5
        np.testing.assert_allclose(s["obs_rel"][0, 1:, 0], 0.5, atol=1e-6)
        np.testing.assert_allclose(s["obs_rel"][0, 0], 0.0)

    def test_nonlinear_flag_zero_for_linear(self, tmp_path):
        p = tmp_path / "s.csv"
        write_synthetic_csv(str(p), n_frames=20, peds=((1, 0), (2, 0)))
        scenes = load_eth_ucy(str(tmp_path))
        np.testing.assert_array_equal(scenes[0]["non_linear"], 0.0)


class TestSdd:
    def test_pickle_roundtrip_reference_layout(self, tmp_path):
        """The reference pickle is coordinate-major [N, 2, seq_len]
        (sddloader.py:59)."""
        rng = np.random.default_rng(0)
        groups = [rng.standard_normal((n, 2, 20)).astype(np.float32) * 100
                  for n in (3, 5)]
        with open(tmp_path / "sdd.pkl", "wb") as f:
            pickle.dump(groups, f)
        scenes = load_sdd(str(tmp_path))
        assert len(scenes) == 2
        expected = np.transpose(groups[0], (0, 2, 1))[:, :8] / 50.0
        np.testing.assert_allclose(scenes[0]["obs"], expected, atol=1e-5)
        assert scenes[1]["pred"].shape == (5, 12, 2)

    def test_pickle_time_major_layout_also_accepted(self, tmp_path):
        rng = np.random.default_rng(0)
        groups = [rng.standard_normal((4, 20, 2)).astype(np.float32) * 100]
        with open(tmp_path / "sdd.pkl", "wb") as f:
            pickle.dump(groups, f)
        scenes = load_sdd(str(tmp_path))
        np.testing.assert_allclose(scenes[0]["obs"],
                                   groups[0][:, :8] / 50.0, atol=1e-5)


class TestNba:
    def test_npy_load_and_batches(self, tmp_path):
        rng = np.random.default_rng(0)
        raw = rng.standard_normal((10, 15, 11, 2)).astype(np.float32) * 40
        np.save(tmp_path / "train.npy", raw)
        past, fut = load_nba(str(tmp_path), training=True)
        assert past.shape == (10, 11, 5, 2)
        assert fut.shape == (10, 11, 10, 2)
        np.testing.assert_allclose(past[0, 0, 0], raw[0, 0, 0] / (94 / 28),
                                   atol=1e-5)
        batches = list(nba_batches(past, fut, 4))
        assert len(batches) == 2  # drop_last
        b = prepare_nba_batch(batches[0])
        assert b.past.shape == (44, 5, 2)
        assert b.batch_size == 4 and b.agent_num == 11
        # velocity first step equals second diff convention
        np.testing.assert_allclose(b.past_vel[:, 0], b.past_vel[:, 1],
                                   atol=1e-6)


class TestPrepareScene:
    def scene(self, rng, n=4):
        obs = rng.standard_normal((n, 8, 2)).astype(np.float32)
        pred = rng.standard_normal((n, 12, 2)).astype(np.float32)
        return {"obs": obs, "pred": pred}

    def test_scene_orig_and_norm(self, rng):
        s = self.scene(rng)
        batch, orig = prepare_scene(s, training=False)
        np.testing.assert_allclose(orig, s["obs"][:, -1].mean(0), atol=1e-6)
        np.testing.assert_allclose(batch.past, s["obs"] - orig, atol=1e-6)

    def test_rotation_preserves_scene_geometry(self, rng):
        s = self.scene(rng)
        nprng = np.random.default_rng(3)
        b_rot, orig = prepare_scene(s, training=True, rng=nprng, rand_rot=True)
        b_raw, _ = prepare_scene(s, training=False)
        # pairwise distances between agents at each step are rotation-invariant
        def pdists(x):
            return np.linalg.norm(x[:, None] - x[None], axis=-1)
        np.testing.assert_allclose(pdists(b_rot.past[:, 0]),
                                   pdists(b_raw.past[:, 0]), atol=1e-4)
        assert not np.allclose(b_rot.past, b_raw.past)

    def test_subsample_with_replacement(self, rng):
        s = self.scene(rng, n=50)
        nprng = np.random.default_rng(0)
        batch, _ = prepare_scene(s, training=True, rng=nprng,
                                 max_train_agent=8, rand_rot=False)
        assert batch.agent_num == 8

    def test_padding_and_mask(self, rng):
        s = self.scene(rng, n=3)
        batch, _ = prepare_scene(s, training=False, pad_to=8)
        assert batch.agent_num == 8
        np.testing.assert_array_equal(batch.valid, [1, 1, 1, 0, 0, 0, 0, 0])
        np.testing.assert_array_equal(batch.past[3:], 0.0)

    def test_velocity_semantics(self, rng):
        s = self.scene(rng)
        batch, _ = prepare_scene(s, training=False)
        np.testing.assert_allclose(batch.past_vel[:, 0],
                                   s["obs"][:, 1] - s["obs"][:, 0], atol=1e-6)
        np.testing.assert_allclose(batch.future_vel[:, 0],
                                   s["pred"][:, 0] - s["obs"][:, -1], atol=1e-6)


class TestBatching:
    def test_bucket_for(self):
        assert bucket_for(3) == 8
        assert bucket_for(8) == 8
        assert bucket_for(9) == 16
        # beyond the ladder: extend by multiples of the top bucket so giant
        # eval scenes still pad instead of crashing
        assert bucket_for(500) == 512

    def test_scene_batches_static_shapes(self, rng):
        scenes = [{"obs": rng.standard_normal((n, 8, 2)).astype(np.float32),
                   "pred": rng.standard_normal((n, 12, 2)).astype(np.float32)}
                  for n in (3, 5, 7, 12, 20)]
        out = list(scene_batches(scenes, training=False))
        assert len(out) == 5
        sizes = {b.agent_num for b, _ in out}
        assert sizes == {8, 16, 32}

    def test_multi_scene_stacking(self, rng):
        scenes = [{"obs": rng.standard_normal((4, 8, 2)).astype(np.float32),
                   "pred": rng.standard_normal((4, 12, 2)).astype(np.float32)}
                  for _ in range(4)]
        out = list(scene_batches(scenes, training=False, scenes_per_batch=2))
        assert len(out) == 2
        batch, origs = out[0]
        assert batch.batch_size == 2
        assert batch.past.shape[0] == 2 * 8
        assert origs.shape == (2, 2)

    def test_compiled_shape_count(self, rng):
        scenes = [{"obs": np.zeros((n, 8, 2), np.float32)} for n in (3, 5, 30)]
        counts = compiled_shape_count(scenes)
        assert counts == {8: 2, 32: 1}

    def test_reference_compat_multiscene_guard(self, rng):
        """compat='reference' + scenes_per_batch>1 is a hard error, padded OR
        full: quirk Q2 drops masks and Q4 attends over the scene axis, so
        grouped scenes cross-attend (the reference ETH/SDD protocol is
        per-scene) and padded agents would additionally leak into the
        softmax (round-1 VERDICT weak-item 1; full-bucket case closed by a
        later review)."""
        import pytest as _pytest

        scenes = [{"obs": rng.standard_normal((n, 8, 2)).astype(np.float32),
                   "pred": rng.standard_normal((n, 12, 2)).astype(np.float32)}
                  for n in (5, 7)]   # both bucket to 8, both padded
        with _pytest.raises(ValueError, match="leak"):
            list(scene_batches(scenes, training=False, scenes_per_batch=2,
                               compat="reference"))
        # exactly-full buckets have no padding leak but STILL cross-attend:
        # also rejected
        full = [{"obs": rng.standard_normal((8, 8, 2)).astype(np.float32),
                 "pred": rng.standard_normal((8, 12, 2)).astype(np.float32)}
                for _ in range(2)]
        with _pytest.raises(ValueError, match="cross-attend"):
            list(scene_batches(full, training=False, scenes_per_batch=2,
                               compat="reference"))
        # and B=1 padded is safe under reference compat (single-token softmax,
        # masked losses)
        out = list(scene_batches(scenes, training=False, scenes_per_batch=1,
                                 compat="reference"))
        assert len(out) == 2

    def test_padding_leak_delta_documented(self, rng):
        """Documents the numeric delta the guard prevents: under reference
        compat (masks dropped), padding rows change VALID agents' interaction
        features in a multi-scene batch; under compat='tpu'+agent masks they
        don't."""
        import jax
        import jax.numpy as jnp

        from sttode_tpu.models import STTODEConfig, encode_past, sttode_init
        from sttode_tpu.models.sttode import Batch

        def make_batch(n_reals, bucket):
            # misaligned fills: scene 0 padded at slots n_reals[0]..bucket-1
            # while scene 1 keeps VALID agents there — under scene-axis
            # attention (tokens = scenes, per agent slot) those valid agents
            # share a softmax with scene 0's padding
            B = len(n_reals)
            M = B * bucket
            past = np.zeros((M, 4, 2), np.float32)
            valid = np.zeros((M,), np.float32)
            for b, n_real in enumerate(n_reals):
                r = rng.standard_normal((n_real, 4, 2)).astype(np.float32)
                past[b * bucket: b * bucket + n_real] = r
                valid[b * bucket: b * bucket + n_real] = 1.0
            vel = np.diff(past, axis=1, prepend=past[:, :1])
            fut = np.zeros((M, 6, 2), np.float32)
            return Batch(past=jnp.asarray(past), past_vel=jnp.asarray(vel),
                         future=jnp.asarray(fut),
                         future_vel=jnp.asarray(fut),
                         valid=jnp.asarray(valid), batch_size=B,
                         agent_num=bucket), valid

        def features(cfg, batch):
            params = sttode_init(jax.random.PRNGKey(0), cfg)
            return np.asarray(encode_past(params, cfg, batch,
                                          rng=jax.random.PRNGKey(1),
                                          train=False))

        base = dict(hidden_dim=32, ff_dim=64, num_heads=4, zdim=16,
                    sample_k=4, past_length=4, future_length=6)
        batch_pad, valid = make_batch(n_reals=(5, 8), bucket=8)
        # craft an identical batch whose PADDED rows differ
        past2 = np.asarray(batch_pad.past).copy()
        past2[valid == 0] += 37.0
        batch_pad2 = Batch(past=jnp.asarray(past2),
                           past_vel=batch_pad.past_vel,
                           future=batch_pad.future,
                           future_vel=batch_pad.future_vel,
                           valid=batch_pad.valid, batch_size=2, agent_num=8)

        cfg_ref = STTODEConfig(**base, compat="reference").validate()
        f1 = features(cfg_ref, batch_pad)[valid > 0]
        f2 = features(cfg_ref, batch_pad2)[valid > 0]
        delta_ref = float(np.max(np.abs(f1 - f2)))
        assert delta_ref > 1e-4, \
            "expected padding to leak under reference compat (B>1)"

        cfg_tpu = STTODEConfig(**base, compat="tpu",
                               attn_axis="agent").validate()
        f1 = features(cfg_tpu, batch_pad)[valid > 0]
        f2 = features(cfg_tpu, batch_pad2)[valid > 0]
        assert float(np.max(np.abs(f1 - f2))) < 1e-5, \
            "masked agent attention must not see padded rows"


class TestMetrics:
    def test_ade_fde_best_of_k(self, rng):
        gt = rng.standard_normal((3, 12, 2)).astype(np.float32)
        # sample 0 = gt exactly; others noise → best-of-K picks 0 → ade=fde=0
        pred = np.stack([np.stack([gt[i]] + [gt[i] + 5 for _ in range(4)])
                         for i in range(3)])
        assert compute_ade(pred, gt) == pytest.approx(0.0, abs=1e-6)
        assert compute_fde(pred, gt) == pytest.approx(0.0, abs=1e-6)
        np.testing.assert_array_equal(best_sample_indices(pred, gt), 0)
        assert count_miss_samples(pred, gt) == 0

    def test_known_values(self):
        gt = np.zeros((1, 4, 2), np.float32)
        pred = np.ones((1, 2, 4, 2), np.float32)  # L2 = √2 everywhere
        pred[0, 1] = 2.0                           # worse sample
        assert compute_ade(pred, gt) == pytest.approx(np.sqrt(2), abs=1e-6)
        assert compute_fde(pred, gt) == pytest.approx(np.sqrt(2), abs=1e-6)
        assert count_miss_samples(pred, gt, mr_threshold=1.0) == 1

    def test_valid_mask(self):
        gt = np.zeros((2, 4, 2), np.float32)
        pred = np.zeros((2, 1, 4, 2), np.float32)
        pred[1] += 100  # padded agent, excluded by mask
        valid = np.asarray([1.0, 0.0])
        assert compute_ade(pred, gt, valid) == pytest.approx(0.0)

    def test_average_meter(self):
        m = AverageMeter()
        m.update(1.0, n=2)
        m.update(4.0, n=1)
        assert m.avg == pytest.approx(2.0)


class TestSynthetic:
    def test_social_scenes_contract(self):
        from sttode_tpu.data.synthetic import make_social_scenes
        scenes = make_social_scenes(5, agents_range=(2, 4), seed=0)
        assert len(scenes) == 5
        for s in scenes:
            n = s["obs"].shape[0]
            assert 2 <= n <= 4
            assert s["obs"].shape == (n, 8, 2)
            assert s["pred"].shape == (n, 12, 2)
            # continuity at the obs/pred boundary: step sizes stay bounded
            step = np.linalg.norm(s["pred"][:, 0] - s["obs"][:, -1], axis=-1)
            assert np.all(step < 3.0)

    def test_eth_style_csv_roundtrip(self, tmp_path):
        from sttode_tpu.data.synthetic import write_eth_style_csvs
        from sttode_tpu.data import load_eth_ucy
        write_eth_style_csvs(str(tmp_path), n_files=1, frames_per_file=30,
                             agents=4)
        scenes = load_eth_ucy(str(tmp_path))
        assert len(scenes) == 30 - 20 + 1
        assert all(s["obs"].shape[0] == 4 for s in scenes)


class TestBatchingReviewFixes:
    def test_shuffle_without_rng_raises(self, rng):
        import pytest as _pytest
        scenes = [{"obs": rng.standard_normal((3, 8, 2)).astype(np.float32),
                   "pred": rng.standard_normal((3, 12, 2)).astype(np.float32)}]
        with _pytest.raises(ValueError, match="rng"):
            list(scene_batches(scenes, training=False, shuffle=True))

    def test_compiled_shape_count_eval_mode(self, rng):
        from sttode_tpu.data.batching import compiled_shape_count, bucket_for
        scenes = [{"obs": rng.standard_normal((150, 8, 2)).astype(np.float32),
                   "pred": rng.standard_normal((150, 12, 2)).astype(np.float32)}]
        train_counts = compiled_shape_count(scenes, max_train_agent=100)
        eval_counts = compiled_shape_count(scenes, max_train_agent=100,
                                           training=False)
        assert list(train_counts) == [bucket_for(100)]
        assert list(eval_counts) == [bucket_for(150)]
