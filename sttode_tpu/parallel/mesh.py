"""Device mesh + sharding rules (SPMD layer).

The reference has no distributed execution at all (SURVEY.md §2.6: NCCL helpers
with zero call sites, single device everywhere). Here parallelism is the
XLA-native kind: a ``jax.sharding.Mesh`` over ("data", "model") axes; arrays
carry ``NamedSharding``s and XLA inserts the collectives (psum for gradient
all-reduce over ICI, all-gathers where TP shards meet).

Strategies (SURVEY.md §2.6 TPU-native plan):
- **DP** (primary): the flattened scene·agent axis M of every Batch tensor is
  sharded over "data". Gradients psum automatically under jit.
- **TP** (demonstrator — model is ~2-6M params): attention QKV/out projections
  and the FFN hidden dim shard over "model" via the rules in
  ``param_sharding``; XLA places the matching collectives.
- **PP**: not warranted (nlayer=1); documented, none provided.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int = 1, sp: int = 1,
              devices=None) -> Mesh:
    """Mesh of shape [dp, tp] over the available devices (axes "data",
    "model").

    ``sp > 1`` adds a sequence-parallel axis between them — a 3-axis
    [dp, sp, tp] mesh ("data", "seq", "model") on which data parallelism and
    ring/ulysses sequence parallelism COMPOSE: the batch shards over "data"
    while attention token axes shard over "seq" (the SP attention paths
    auto-route their collectives onto "seq" when the axis exists). ``sp == 1``
    keeps the 2-axis layout every existing caller expects."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // (tp * sp)
    if dp < 1:
        # dp computes to 0 when tp·sp exceeds the device count; without this
        # the size check below would pass (0 <= n) and the zero-device mesh
        # would crash much later inside jit with an opaque reshape error
        raise ValueError(
            f"tp·sp = {tp * sp} exceeds the {n} available devices "
            f"(dp would be 0); shrink tp/sp or pass more devices")
    if dp * tp * sp > n:
        raise ValueError(
            f"mesh {dp}x{sp}x{tp} needs {dp * tp * sp} devices, have {n}")
    if sp > 1:
        grid = np.asarray(devices[:dp * sp * tp]).reshape(dp, sp, tp)
        return Mesh(grid, axis_names=("data", "seq", "model"))
    grid = np.asarray(devices[:dp * tp]).reshape(dp, tp)
    return Mesh(grid, axis_names=("data", "model"))


def make_hybrid_mesh(ici_dp: int, tp: int = 1, dcn_dp: int = 1) -> Mesh:
    """Multi-slice mesh: the "data" axis spans DCN × ICI so gradient psum
    rides fast ICI within a slice and crosses DCN only at the slice boundary
    (SURVEY.md §5.8 plan). Falls back to a flat mesh when the runtime exposes
    a single slice (this box)."""
    if dcn_dp > 1:
        from jax.experimental import mesh_utils
        devices = jax.devices()
        # granule = slice where the platform reports real slice indices
        # (multi-slice TPU); otherwise granule = process (multi-host CPU/GPU,
        # and the two-process smoke test tests/test_multihost.py)
        n_slices = len({getattr(d, "slice_index", 0) for d in devices})
        grid = mesh_utils.create_hybrid_device_mesh(
            (ici_dp, tp), dcn_mesh_shape=(dcn_dp, 1),
            process_is_granule=n_slices != dcn_dp)
        grid = grid.reshape(dcn_dp * ici_dp, tp)
        return Mesh(grid, axis_names=("data", "model"))
    return make_mesh(dp=ici_dp, tp=tp)


def init_distributed() -> bool:
    """Initialize ``jax.distributed`` for multi-host SPMD. Returns True when
    running distributed. Safe no-op on a single host.

    Two entry modes (must run before first device use):
    - explicit env: ``JAX_COORDINATOR_ADDRESS`` (+ ``JAX_NUM_PROCESSES``,
      ``JAX_PROCESS_ID``) — the generic launcher contract, used by the
      two-process CPU smoke test (tests/test_multihost.py) and any
      orchestrator that sets the trio per worker;
    - cloud autodetect: ``MEGASCALE_COORDINATOR_ADDRESS`` present (multi-slice
      Cloud TPU) — ``jax.distributed.initialize()`` discovers everything.
    """
    import os

    import jax as _jax

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        nproc = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        _jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc) if nproc else None,
            process_id=int(pid) if pid else None)
        return _jax.process_count() > 1
    if os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        _jax.distributed.initialize()
        return _jax.process_count() > 1
    return False


def batch_sharding(mesh: Mesh, *, stacked: bool = False) -> NamedSharding:
    """Sharding for a ``Batch``: every tensor leads with the flattened
    scene·agent axis M, so one row-sharding serves as a prefix spec for the
    whole pytree. ``stacked=True`` is the scan-step layout ([S, M, ...]):
    the step axis stays replicated, the row axis shards."""
    return NamedSharding(mesh, P(None, "data") if stacked else P("data"))


# TP rules: regex on the param path → PartitionSpec. Dense weights are stored
# [d_in, d_out]; shard the dimension whose matmul partner is already sharded
# so the pair needs only one collective.
_TP_RULES = (
    (r"in_proj_w$", P(None, "model")),        # QKV columns → heads sharded
    (r"out_proj_w$", P("model", None)),       # rows match sharded heads
    (r"ffn.*linear1.*w$", P(None, "model")),  # FFN hidden columns
    (r"ffn.*linear2.*w$", P("model", None)),  # FFN hidden rows
    (r"decoder_[xy].*layers/0.*w$", P(None, "model")),  # decompose MLP hidden
    (r"decoder_[xy].*layers/1.*w$", P("model", None)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_sharding(params: Any, mesh: Mesh, *, tp: bool = False):
    """Sharding pytree for params: replicated by default; with ``tp=True``,
    the `_TP_RULES` shard attention/FFN/decoder-MLP matrices over "model"."""
    replicated = NamedSharding(mesh, P())

    def spec_for(path, leaf):
        if tp:
            s = _path_str(path)
            for pattern, spec in _TP_RULES:
                if re.search(pattern, s):
                    # only shard when the dimension divides the axis size
                    axis_size = mesh.shape["model"]
                    dim = 1 if spec == P(None, "model") else 0
                    if leaf.ndim == 2 and leaf.shape[dim] % axis_size == 0:
                        return NamedSharding(mesh, spec)
        return replicated

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_batch(batch, mesh: Mesh, *, stacked: bool = False):
    """Place a host Batch onto the mesh with M sharded over "data".
    ``stacked=True`` for scan-step batches ([S, M, ...] array fields — see
    ``train.stack_batches``): the leading step axis stays replicated and the
    row axis shards."""
    sh = batch_sharding(mesh, stacked=stacked)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jax.numpy.asarray(x), sh), batch)
