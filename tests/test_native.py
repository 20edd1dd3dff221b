"""Native C++ windowing engine vs the pure-numpy reference path."""

import numpy as np
import pytest

from sttode_tpu.data.eth_ucy import _file_scenes
from sttode_tpu.native import native_available, window_file


def synthetic_rows(rng, n_frames=40, n_peds=6, dropout=0.2):
    rows = []
    starts = rng.standard_normal((n_peds, 2)) * 5
    vels = rng.standard_normal((n_peds, 2)) * 0.4
    for f in range(n_frames):
        for p in range(n_peds):
            if rng.random() < dropout and 5 < f < n_frames - 5:
                continue  # missing observation → breaks coverage
            xy = starts[p] + vels[p] * f + 0.3 * np.sin(f * 0.3 + p)
            rows.append([f * 10.0, p + 1.0, xy[0], xy[1]])
    return np.asarray(rows)


needs_native = pytest.mark.skipif(not native_available(),
                                  reason="g++ build unavailable")


@needs_native
class TestNativeWindowing:
    def test_matches_python_path(self, rng):
        rows = synthetic_rows(rng)
        native = window_file(rows, obs_len=8, pred_len=12, traj_scale=2.0)
        python = list(_file_scenes(rows, 8, 12, 1, 0.002, 1, 2.0, "f"))
        assert len(native) == len(python)
        for ns, ps in zip(native, python):
            np.testing.assert_array_equal(ns["ped_ids"], ps["ped_ids"])
            np.testing.assert_allclose(ns["obs"], ps["obs"], atol=1e-6)
            np.testing.assert_allclose(ns["pred"], ps["pred"], atol=1e-6)
            np.testing.assert_allclose(ns["obs_rel"], ps["obs_rel"],
                                       atol=1e-6)
            np.testing.assert_array_equal(ns["non_linear"], ps["non_linear"])
            assert ns["frame"] == ps["frame"]

    def test_empty_when_no_coverage(self, rng):
        rows = synthetic_rows(rng, n_frames=10)  # shorter than seq_len=20
        assert window_file(rows) == []

    def test_min_ped_strictness(self, rng):
        # one fully-covering ped → kept iff count > min_ped → empty
        rows = np.asarray([[f * 10.0, 1.0, f * 1.0, 0.0] for f in range(25)])
        assert window_file(rows, min_ped=1) == []
        out = window_file(rows, min_ped=0)
        assert out and out[0]["obs"].shape[0] == 1

    def test_speedup_over_python(self, rng):
        import time
        rows = synthetic_rows(rng, n_frames=400, n_peds=30, dropout=0.1)
        t0 = time.perf_counter()
        native = window_file(rows)
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        python = list(_file_scenes(rows, 8, 12, 1, 0.002, 1, 1.0, "f"))
        t_python = time.perf_counter() - t0
        assert len(native) == len(python)
        # the point of the native path: meaningfully faster on real volumes
        assert t_native < t_python
