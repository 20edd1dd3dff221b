"""Import harness for the ACTUAL reference code at /root/reference.

VERDICT.md round-1 item 2: the round-1 parity suite compared against a
builder-written torch mirror; a mirror shares its author's misreadings. This
harness imports the reference's own modules so tests assert parity against
the real thing.

Shims installed (device-placement and missing third-party modules only — no
reference COMPUTATION is altered):

- ``torchdiffeq``: fixed-grid euler odeint. The only semantics the reference
  exercises (ode_demo.py:165,186-190): integrate on the supplied grid ``t``
  with no step_size option, so `odeint(f, x, [0,12], method='euler')[1]` is
  exactly one step ``x + 12·f(0, x)`` (quirk Q1, SURVEY.md §2.5).
- ``glob2``: stdlib glob with recursive=True (utils/utils.py:12).
- ``torch.nn.modules.linear._LinearWithBias``: torch-1.8 internal removed in
  modern torch; it was literally ``class _LinearWithBias(Linear)`` with bias
  forced True, so ``nn.Linear`` is the exact replacement
  (hypertransformer.py:11).
- cuda placement → cpu: the reference hard-codes ``device='cuda'`` for its
  (never-applied, quirk Q2) temporal mask (hypertransformer.py:69) and
  ``.cuda()`` for the decoder accumulators (model/STTODE.py:333-334). On this
  CPU-torch box those are mapped to cpu; values are zeros either way.
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn

REFERENCE_ROOT = "/root/reference"

_cache: dict = {}


def _install_shims() -> None:
    if "torchdiffeq" not in sys.modules:
        td = types.ModuleType("torchdiffeq")

        def odeint(func, y0, t, method="euler", **_kw):
            assert method == "euler", \
                "shim implements the reference's only exercised mode"
            ys = [y0]
            y = y0
            for i in range(len(t) - 1):
                y = y + (t[i + 1] - t[i]) * func(t[i], y)
                ys.append(y)
            return torch.stack(ys, 0)

        td.odeint = odeint
        td.odeint_adjoint = odeint
        sys.modules["torchdiffeq"] = td

    if "glob2" not in sys.modules:
        import glob as _glob

        g2 = types.ModuleType("glob2")
        g2.glob = lambda pathname, **kw: _glob.glob(pathname, recursive=True)
        sys.modules["glob2"] = g2

    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            # only consumed by hyptorch/delta.py's get_delta VGG16 feature
            # extractor; the δ-hyperbolicity math under test never touches it
            tv = types.ModuleType("torchvision")
            tv.models = types.SimpleNamespace()
            sys.modules["torchvision"] = tv

    import torch.nn.modules.linear as _lin

    if not hasattr(_lin, "_LinearWithBias"):
        _lin._LinearWithBias = nn.Linear

    if not getattr(torch.zeros, "_cuda_to_cpu_shim", False):
        _orig_zeros = torch.zeros

        def _zeros(*args, **kw):
            dev = kw.get("device")
            if dev is not None and torch.device(dev).type == "cuda" \
                    and not torch.cuda.is_available():
                kw["device"] = "cpu"
            return _orig_zeros(*args, **kw)

        _zeros._cuda_to_cpu_shim = True
        torch.zeros = _zeros

    if not torch.cuda.is_available() and \
            not getattr(torch.Tensor.cuda, "_noop_shim", False):
        def _cuda_noop(self, *a, **kw):
            return self

        _cuda_noop._noop_shim = True
        torch.Tensor.cuda = _cuda_noop


def load_reference() -> types.SimpleNamespace:
    """Import (and cache) the reference modules; returns a namespace with
    ``oblique / pmath / hyptransformerlib / hypertransformer / ode_demo /
    sttode`` (= model.STTODE)."""
    if _cache:
        return types.SimpleNamespace(**_cache)
    _install_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    _cache["oblique"] = importlib.import_module("core.manifolds.oblique")
    _cache["pmath"] = importlib.import_module("hyptorch.pmath")
    _cache["hyptransformerlib"] = importlib.import_module("hyptransformerlib")
    _cache["hypertransformer"] = importlib.import_module("hypertransformer")
    _cache["ode_demo"] = importlib.import_module("ode_demo")
    _cache["sttode"] = importlib.import_module("model.STTODE")
    _cache["sampler"] = importlib.import_module("sampler")
    _cache["samplerloss"] = importlib.import_module("samplerloss")
    _cache["delta"] = importlib.import_module("hyptorch.delta")
    _cache["hnn"] = importlib.import_module("hyptorch.nn")
    _cache["transformerlib"] = importlib.import_module("transformerlib")
    return types.SimpleNamespace(**_cache)


# --------------------------------------------------------------------------- #
# weight porting: reference torch modules → sttode_tpu param pytrees          #
# --------------------------------------------------------------------------- #

def _np(t: torch.Tensor):
    return t.detach().cpu().numpy()


def port_linear(mod: nn.Linear) -> dict:
    """torch Linear [out,in] → our dense {"w": [in,out], "b": [out]}."""
    return {"w": _np(mod.weight).T.copy(), "b": _np(mod.bias).copy()}


def port_layer_norm(mod: nn.LayerNorm) -> dict:
    return {"scale": _np(mod.weight).copy(), "bias": _np(mod.bias).copy()}


def port_mhsa(att):
    """reference Hyp_mhsa / transformerlib.MultiheadAttention (packed
    projection layout) → MHGSAParams."""
    from sttode_tpu.nn.attention import MHGSAParams

    return MHGSAParams(
        in_proj_w=_np(att.in_proj_weight).T.copy(),
        in_proj_b=_np(att.in_proj_bias).copy(),
        out_proj_w=_np(att.out_proj.weight).T.copy(),
        out_proj_b=_np(att.out_proj.bias).copy(),
    )


def port_gated(hypatt):
    """reference Hypattention → GatedAttentionParams."""
    from sttode_tpu.nn.transformer import GatedAttentionParams

    return GatedAttentionParams(
        attn=port_mhsa(hypatt.temporal_attention_before),
        info=port_linear(hypatt.temporal_info),
        gate=port_linear(hypatt.temporal_gate),
    )


def port_encoder_layer(tl):
    """reference hypertransformer.TransformerEncoderLayer → EncoderLayerParams."""
    from sttode_tpu.nn.transformer import EncoderLayerParams, FFNParams

    return EncoderLayerParams(
        self_attn=port_gated(tl.self_attn),
        ffn=FFNParams(linear1=port_linear(tl.linear1),
                      linear2=port_linear(tl.linear2)),
        norm1=port_layer_norm(tl.norm1),
        norm2=port_layer_norm(tl.norm2),
    )


def port_decoder_layer(tl):
    """reference hypertransformer.TransformerDecoderLayer → DecoderLayerParams."""
    from sttode_tpu.nn.transformer import DecoderLayerParams, FFNParams

    return DecoderLayerParams(
        self_attn=port_gated(tl.self_attn),
        cross_attn=port_gated(tl.cross_attn),
        ffn=FFNParams(linear1=port_linear(tl.linear1),
                      linear2=port_linear(tl.linear2)),
        norm1=port_layer_norm(tl.norm1),
        norm2=port_layer_norm(tl.norm2),
        norm3=port_layer_norm(tl.norm3),
    )


def port_trunk(enc) -> dict:
    """reference PastEncoder / FutureEncoder trunk → our _trunk_init layout."""
    from sttode_tpu.nn.embed import positional_encoding_table

    d_model = enc.model_dim
    layers = enc.ODE_Encoder.odeblock.odefunc.layers
    return {
        "input_fc": port_linear(enc.input_fc),
        "pe": {"fc": port_linear(enc.pos_encoder.fc),
               "pe": positional_encoding_table(200, d_model)},
        "input_fc2": port_linear(enc.input_fc2),
        "input_fc3": port_linear(enc.input_fc3),
        "ode_layers": [port_encoder_layer(l) for l in layers],
    }


def port_decompose(db) -> dict:
    """reference DecomposeBlock → our _decompose_init layout."""
    from sttode_tpu.nn.recurrent import Conv1dParams, GRUParams

    return {
        # torch conv1d weight [C_out, C_in, K] → ours [K, C_in, C_out]
        "conv_past": Conv1dParams(
            w=_np(db.conv_past.weight).transpose(2, 1, 0).copy(),
            b=_np(db.conv_past.bias).copy()),
        "gru": GRUParams(
            w_ih=_np(db.encoder_past.weight_ih_l0).T.copy(),
            w_hh=_np(db.encoder_past.weight_hh_l0).T.copy(),
            b_ih=_np(db.encoder_past.bias_ih_l0).copy(),
            b_hh=_np(db.encoder_past.bias_hh_l0).copy()),
        "decoder_y": {"layers": [port_linear(l) for l in db.decoder_y.layers]},
        "decoder_x": {"layers": [port_linear(l) for l in db.decoder_x.layers]},
    }


def port_model(net) -> dict:
    """reference STTODENet → full sttode_tpu params pytree."""
    return {
        "past_encoder": port_trunk(net.past_encoder),
        "future_encoder": port_trunk(net.future_encoder),
        "out_mlp": {"layers": [port_linear(l)
                               for l in net.future_encoder.out_mlp.affine_layers]},
        "qz_layer": port_linear(net.future_encoder.qz_layer),
        "decoder": [port_decompose(db) for db in net.decoder.decompose],
    }


def port_sampler(sampler) -> dict:
    """reference Sampler (sampler.py:7-76) → sttode_tpu sampler params."""
    return {
        "linear": port_linear(sampler.linear),
        "q_mlp": {"layers": [port_linear(l)
                             for l in sampler.q_mlp.affine_layers]},
        "q_A": port_linear(sampler.q_A),
        "q_b": port_linear(sampler.q_b),
        "q_c": port_linear(sampler.q_c),
    }
