"""Support utilities (L7): distributions, metrics, seeding, config, logging."""

from sttode_tpu.utils.distributions import DiagNormal

__all__ = ["DiagNormal"]
