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
