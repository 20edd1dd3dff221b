"""Support utilities (L7): distributions, metrics, logging, visualization,
profiling, δ-hyperbolicity, flat-param views, compile cache."""

from sttode_tpu.utils.distributions import DiagNormal, RelaxedOneHot
from sttode_tpu.utils.logging import Logger, print_log
from sttode_tpu.utils.metrics import (
    AverageMeter,
    best_sample_indices,
    compute_ade,
    compute_fde,
    count_miss_samples,
)

__all__ = [
    "DiagNormal", "RelaxedOneHot", "Logger", "print_log", "AverageMeter",
    "best_sample_indices", "compute_ade", "compute_fde", "count_miss_samples",
]
