"""ctypes binding + on-demand build of the native windowing engine."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "windowing.cpp")
_LIB = os.path.join(_DIR, "libwindowing.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.ws_count.argtypes = [f64p, ctypes.c_int64, ctypes.c_int,
                                 ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_double, ctypes.c_double, i64p, i64p]
        lib.ws_count.restype = ctypes.c_int
        lib.ws_fill.argtypes = [f64p, ctypes.c_int64, ctypes.c_int,
                                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                ctypes.c_double, ctypes.c_double, f32p, i64p,
                                f64p, f64p, f32p]
        lib.ws_fill.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def window_file(rows: np.ndarray, *, obs_len: int = 8, pred_len: int = 12,
                skip: int = 1, min_ped: int = 1, traj_scale: float = 1.0,
                threshold: float = 0.002) -> list[dict] | None:
    """Window one file's rows [R, 4] into scene dicts via the C++ engine.
    Returns None when the native library is unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.float64)
    seq_len = obs_len + pred_len
    n_scenes = ctypes.c_int64()
    total_agents = ctypes.c_int64()
    rp = rows.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    lib.ws_count(rp, rows.shape[0], obs_len, pred_len, skip, min_ped,
                 traj_scale, threshold, ctypes.byref(n_scenes),
                 ctypes.byref(total_agents))
    S, A = n_scenes.value, total_agents.value
    if S == 0:
        return []
    traj = np.empty((A, seq_len, 2), np.float32)
    offsets = np.empty((S + 1,), np.int64)
    frames = np.empty((S,), np.float64)
    ped_ids = np.empty((A,), np.float64)
    nonlin = np.empty((A,), np.float32)
    lib.ws_fill(rp, rows.shape[0], obs_len, pred_len, skip, min_ped,
                traj_scale, threshold,
                traj.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                frames.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                ped_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                nonlin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    scenes = []
    for s in range(S):
        lo, hi = offsets[s], offsets[s + 1]
        t = traj[lo:hi]
        rel = np.zeros_like(t)
        rel[:, 1:] = t[:, 1:] - t[:, :-1]
        n = hi - lo
        scenes.append({
            "obs": t[:, :obs_len],
            "pred": t[:, obs_len:],
            "obs_rel": rel[:, :obs_len],
            "pred_rel": rel[:, obs_len:],
            "non_linear": nonlin[lo:hi].copy(),
            "ped_ids": ped_ids[lo:hi].astype(np.float32),
            "obs_mask": np.ones((n, obs_len), np.float32),
            "pred_mask": np.ones((n, pred_len), np.float32),
            "frame": float(frames[s]),
            "seq_name": "",
        })
    return scenes
