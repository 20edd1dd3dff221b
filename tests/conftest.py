"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Mirrors the multi-device test strategy from SURVEY.md §4(f): sharded-vs-single
numerics are validated on a CPU-simulated mesh, so the suite runs anywhere.
"""

import os

# Must be set before jax initializes its backends. Hard assignment, not
# setdefault: the environment pins JAX_PLATFORMS to the TPU plugin globally,
# and the unit suite must run on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # compile speed over runtime speed: the suite is compile-dominated on the
    # virtual CPU mesh (measured -40% wall clock, no numeric changes)
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The environment's sitecustomize imports jax at interpreter start (to register
# the TPU PJRT plugin), so env vars alone are too late — pin the platform via
# the config API as well, before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: repeated suite runs hit warm XLA programs.
from sttode_tpu.utils.compilation_cache import enable as _enable_cache  # noqa: E402

_enable_cache(os.path.expanduser("~/.cache/sttode_jax_tests"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


_exit_status = {"code": 0}


@pytest.hookimpl(trylast=True)
def pytest_sessionfinish(session, exitstatus):
    _exit_status["code"] = int(exitstatus)


@pytest.hookimpl(trylast=True)
def pytest_unconfigure(config):
    """Hard-exit after the suite has fully reported: the environment's TPU PJRT
    plugin registers a non-daemon grant thread at interpreter start; when the
    suite runs CPU-only that thread blocks normal interpreter teardown for
    ~5 minutes. Flush and _exit with pytest's status so CI sees the right
    code. (unconfigure runs after the terminal summary, so no output is lost.)
    """
    import os as _os
    import sys as _sys

    _sys.stdout.flush()
    _sys.stderr.flush()
    _os._exit(_exit_status["code"])
