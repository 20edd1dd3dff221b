"""Pallas TPU kernels for the hot ops (L1 compute path)."""

from sttode_tpu.kernels.mhgsa import (
    flash_geodesic_attention,
    fused_geodesic_attention,
)

__all__ = ["flash_geodesic_attention", "fused_geodesic_attention"]
