"""Manifold math (layer L0). Pure-jnp functional API.

Reference surface: /root/reference/core/manifolds/{base,oblique,euclidean}.py and
/root/reference/hyptorch/pmath.py. Here each manifold is a lightweight namespace of
pure functions over jnp arrays (no parameters, no state), so the ops compose with
jit/vmap/grad and can be inlined into Pallas kernels.
"""

from sttode_tpu.manifolds import oblique, euclidean, pmath
from sttode_tpu.manifolds.oblique import Oblique
from sttode_tpu.manifolds.euclidean import Euclidean

__all__ = ["oblique", "euclidean", "pmath", "Oblique", "Euclidean"]
