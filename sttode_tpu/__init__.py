"""sttode_tpu — TPU-native spatial-temporal transformer ODE trajectory forecasting.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
STTODE reference (ICME 2025 pedestrian trajectory forecaster):

- ``manifolds``  — oblique (unit-sphere product) + Poincaré-ball math with
  stability-safe custom gradients (reference: core/manifolds/, hyptorch/pmath.py)
- ``nn``         — Multi-Head Geodesic Self-Attention, transformer encoder/decoder
  layers, positional-agent encodings, GRU/MLP building blocks
  (reference: hyptransformerlib.py, hypertransformer.py)
- ``kernels``    — fused Pallas TPU MHGSA kernel (normalize → Gram → acos →
  online-softmax → AV) with custom VJP
- ``ode``        — fixed-step (euler/midpoint/rk4) solvers on lax.scan and
  adaptive dopri5 on lax.while_loop with checkpointed adjoint
  (reference: ode_demo.py + torchdiffeq semantics)
- ``models``     — STTODE CVAE forecaster + DLow-style diversity sampler
  (reference: model/STTODE.py, sampler.py)
- ``data``       — ETH-UCY / SDD / NBA pipelines with bucketed padded scene
  batching for SPMD (reference: utils/dataloader.py, utils/sddloader.py,
  data/dataloader_nba.py)
- ``train``      — optax training loops, schedulers, orbax checkpointing,
  metrics (reference: train.py, trainsampler.py, utils/metrics.py)
- ``parallel``   — mesh/sharding utilities: dp over scenes, tp over
  heads/FFN, sp over the token axis
"""

__version__ = "0.1.0"

# Subpackages are imported lazily to keep `import sttode_tpu` free of jax
# backend initialization cost. The full public surface:
#   sttode_tpu.manifolds   — oblique / Poincaré / Euclidean math
#   sttode_tpu.nn          — attention, transformer layers, ODE blocks,
#                            hyperbolic layers, recurrence, embeddings
#   sttode_tpu.kernels     — fused Pallas MHGSA
#   sttode_tpu.ode         — odeint / odeint_adjoint
#   sttode_tpu.models      — STTODE CVAE + diversity sampler
#   sttode_tpu.data        — ETH-UCY/SDD/NBA pipelines, batching, prefetch
#   sttode_tpu.native      — C++ windowing engine (ctypes)
#   sttode_tpu.train       — steps, schedulers, checkpoints, guards, supervisor
#   sttode_tpu.parallel    — mesh/sharding, ring sequence-parallel attention
#   sttode_tpu.evaluation  — best-of-K + NBA horizon protocols
#   sttode_tpu.utils       — metrics, distributions, viz, profiling, delta
#   sttode_tpu.cli         — train / test / trainsampler / test_sampler
