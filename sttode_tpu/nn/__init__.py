"""Neural-net layers (L1-L3): functional core, geodesic attention, transformer
layers, ODE blocks, embeddings, recurrence.

Convention: every layer is an ``*_init(key, ...) -> params`` plus a pure apply
function over the param pytree. See ``core.py`` for the design rationale.
"""

from sttode_tpu.nn import attention, core, embed, ode_block, recurrent, transformer
from sttode_tpu.nn.attention import MHGSAParams, geodesic_attention, mhgsa, mhgsa_init
from sttode_tpu.nn.ode_block import ode_decoder, ode_encoder
from sttode_tpu.nn.transformer import (
    LayerConfig,
    decoder_layer,
    decoder_layer_init,
    decoder_stack,
    decoder_stack_init,
    encoder_layer,
    encoder_layer_init,
    encoder_stack,
    encoder_stack_init,
    gated_attention,
    gated_attention_init,
)

__all__ = [
    "attention", "core", "embed", "ode_block", "recurrent", "transformer",
    "MHGSAParams", "geodesic_attention", "mhgsa", "mhgsa_init",
    "ode_decoder", "ode_encoder", "LayerConfig",
    "decoder_layer", "decoder_layer_init", "decoder_stack", "decoder_stack_init",
    "encoder_layer", "encoder_layer_init", "encoder_stack", "encoder_stack_init",
    "gated_attention", "gated_attention_init",
]
