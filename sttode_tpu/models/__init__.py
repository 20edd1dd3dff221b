"""Model family (L4): STTODE CVAE forecaster + DLow diversity sampler."""

from sttode_tpu.models.sttode import (
    Batch,
    ForwardOutput,
    STTODEConfig,
    decode,
    encode_future,
    encode_past,
    prior,
    sttode_forward,
    sttode_inference,
    sttode_init,
)
from sttode_tpu.models.sampler import (
    DIVERSITY_CONFIG,
    SamplerConfig,
    SamplerOutput,
    sampler_forward,
    sampler_init,
    sampler_loss,
)

__all__ = [
    "Batch", "ForwardOutput", "STTODEConfig", "decode", "encode_future",
    "encode_past", "prior", "sttode_forward", "sttode_inference", "sttode_init",
    "DIVERSITY_CONFIG", "SamplerConfig", "SamplerOutput", "sampler_forward",
    "sampler_init", "sampler_loss",
]
