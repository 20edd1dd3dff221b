"""ETH-UCY trajectory dataset (L5).

Behavioral equivalent of the reference's TrajectoryDataset
(utils/dataloader.py:32-196): per-file sliding windows over frame-grouped
rows of ``frame,ped,x,y`` CSV, keeping only pedestrians that cover the full
obs+pred window contiguously, and keeping a scene only when strictly more than
``min_ped`` pedestrians survive. Coordinates are rounded to 4 decimals and
divided by ``traj_scale`` before relative diffs — both load-bearing for parity.

Pure numpy, eager, whole-dataset-in-memory (the datasets are tiny). Scenes come
out as plain dicts; batching/padding for SPMD is `sttode_tpu.data.batching`'s
job, device placement the trainer's.

Note: the reference's window loop runs one extra out-of-range start index
(``range(0, num_sequences*skip + 1, skip)``); that window is always rejected by
the full-coverage filter, so iterating only valid starts is behaviorally
identical.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np


def poly_fit_nonlinear(traj_xy: np.ndarray, pred_len: int,
                       threshold: float) -> float:
    """1.0 if the trailing ``pred_len`` steps have quadratic-fit residual ≥
    threshold (reference utils/dataloader.py:9-24). traj_xy: [T, 2]."""
    t = np.linspace(0, pred_len - 1, pred_len)
    tail = traj_xy[-pred_len:]
    res_x = np.polyfit(t, tail[:, 0], 2, full=True)[1]
    res_y = np.polyfit(t, tail[:, 1], 2, full=True)[1]
    total = (res_x + res_y).sum() if len(res_x) and len(res_y) else 0.0
    return 1.0 if total >= threshold else 0.0


def read_trajectory_csv(path: str) -> np.ndarray:
    """Comma-delimited rows of [frame, ped_id, x, y] → [R, 4]."""
    return np.loadtxt(path, delimiter=",").reshape(-1, 4)


def _file_scenes(data: np.ndarray, obs_len: int, pred_len: int, skip: int,
                 threshold: float, min_ped: int, traj_scale: float,
                 seq_name: str) -> Iterator[dict]:
    seq_len = obs_len + pred_len
    frames = np.unique(data[:, 0])
    rows_by_frame = {f: data[data[:, 0] == f] for f in frames}
    n_windows = len(frames) - seq_len + 1
    for start in range(0, max(n_windows, 0), skip):
        window_frames = frames[start:start + seq_len]
        window_rows = np.concatenate([rows_by_frame[f] for f in window_frames])
        kept_xy, kept_ids, kept_nl = [], [], []
        for ped in np.unique(window_rows[:, 1]):
            ped_rows = np.around(window_rows[window_rows[:, 1] == ped],
                                 decimals=4)
            # full contiguous coverage: EXACTLY one row per window frame.
            # Span+count alone is not enough — a duplicated row in one frame
            # paired with a missing interior frame passes both and would
            # stack a time-misaligned trajectory (one position doubled, the
            # tail shifted a frame) into training silently.
            if len(ped_rows) != seq_len or \
                    not np.array_equal(ped_rows[:, 0], window_frames):
                continue
            xy = ped_rows[:, 2:4] / traj_scale            # [seq_len, 2]
            kept_xy.append(xy)
            kept_ids.append(ped)
            kept_nl.append(poly_fit_nonlinear(xy, pred_len, threshold))
        if len(kept_xy) > min_ped:
            traj = np.stack(kept_xy).astype(np.float32)   # [N, seq_len, 2]
            rel = np.zeros_like(traj)
            rel[:, 1:] = traj[:, 1:] - traj[:, :-1]
            yield {
                "obs": traj[:, :obs_len],
                "pred": traj[:, obs_len:],
                "obs_rel": rel[:, :obs_len],
                "pred_rel": rel[:, obs_len:],
                "non_linear": np.asarray(kept_nl, np.float32),
                "ped_ids": np.asarray(kept_ids, np.float32),
                "obs_mask": np.ones((traj.shape[0], obs_len), np.float32),
                "pred_mask": np.ones((traj.shape[0], pred_len), np.float32),
                "frame": float(window_frames[obs_len]),
                "seq_name": seq_name,
            }


def load_eth_ucy(data_dir: str, *, obs_len: int = 8, pred_len: int = 12,
                 skip: int = 1, threshold: float = 0.002, min_ped: int = 1,
                 traj_scale: float = 1.0, backend: str = "auto") -> list[dict]:
    """Load every CSV under ``data_dir`` into a list of scene dicts.

    ``backend``: 'native' uses the C++ windowing engine
    (sttode_tpu.native, the host hot-loop), 'python' the numpy path,
    'auto' prefers native with fallback."""
    use_native = backend in ("auto", "native")
    if use_native:
        from sttode_tpu.native import window_file
    scenes: list[dict] = []
    for fname in sorted(os.listdir(data_dir)):
        path = os.path.join(data_dir, fname)
        if not os.path.isfile(path):
            continue
        data = read_trajectory_csv(path)
        file_scenes = None
        if use_native:
            file_scenes = window_file(
                data, obs_len=obs_len, pred_len=pred_len, skip=skip,
                min_ped=min_ped, traj_scale=traj_scale, threshold=threshold)
            if file_scenes is not None:
                for s in file_scenes:
                    s["seq_name"] = fname
        if file_scenes is None:
            if backend == "native":
                raise RuntimeError("native windowing backend unavailable")
            file_scenes = list(_file_scenes(
                data, obs_len, pred_len, skip, threshold, min_ped,
                traj_scale, fname))
        scenes.extend(file_scenes)
    return scenes
