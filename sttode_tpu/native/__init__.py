"""Native (C++) runtime components with ctypes bindings.

Currently: the sliding-window trajectory preprocessor (the host-side hot loop,
SURVEY.md §3.4). The shared library is built on demand with g++ (no pybind11 in
the image — flat C ABI + ctypes); callers fall back to the pure-numpy path if
no compiler is available.
"""

from sttode_tpu.native.binding import native_available, window_file

__all__ = ["native_available", "window_file"]
