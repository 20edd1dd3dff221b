"""Pallas TPU kernels for the hot ops (L1 compute path)."""

from sttode_tpu.kernels.mhgsa import fused_geodesic_attention

__all__ = ["fused_geodesic_attention"]
