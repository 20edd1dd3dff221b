"""ODE-wrapped transformer blocks (L3).

The reference wraps its transformer encoder layer as the RHS of an ODE and
integrates with Euler over t=[0, time] (ode_demo.py:165,186-190,217-231), which
with torchdiffeq's grid-as-ts rule is exactly one step
``z = x + time * layer(x)`` followed by ReLU (quirk Q1). Here the same contract
is expressed functionally: the encoder stack *is* the vector field, the solver
comes from ``sttode_tpu.ode`` — so the promised-but-unused torchdiffeq
capabilities (rk4, adaptive dopri5, adjoint gradients — reference
ode_demo.py:7-11) are real options, not just flags.

State that the reference injects via module attributes (``setparrament``,
ode_demo.py:175-185) is instead closed over by the RHS — pure, jit-stable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sttode_tpu.nn.transformer import LayerConfig, decoder_stack, encoder_stack
from sttode_tpu.ode import odeint, odeint_adjoint


def ode_encoder(params: list, src: jnp.ndarray, cfg: LayerConfig, *,
                time: float = 12.0, method: str = "euler",
                mask: jnp.ndarray | None = None, rng=None,
                deterministic: bool = True, adjoint: bool = False,
                rtol: float = 1e-7, atol: float = 1e-9,
                steps: int = 1, mesh=None,
                kv_valid: jnp.ndarray | None = None,
                scan_budget: int | None = None) -> jnp.ndarray:
    """ODE-integrated encoder over [L, N, S, D] tokens, ReLU epilogue.

    ``steps`` controls the fixed-grid density: steps=1 with euler reproduces the
    reference's single scaled-residual application (ODEG_Encoder,
    ode_demo.py:217-231); larger values integrate the same field more finely —
    a capability knob the reference's solver API admits but never exercises.

    Params enter the solver through ``*args`` (not a closure) so the
    continuous adjoint can produce parameter cotangents — ``odeint_adjoint``
    differentiates only ``y0`` and ``*args``.
    """
    def rhs(t, y, p):
        del t  # autonomous field: the reference RHS ignores t (ode_demo.py:53-72)
        return encoder_stack(p, y, cfg, mask=mask, rng=rng,
                             deterministic=deterministic, mesh=mesh,
                             kv_valid=kv_valid)

    ts = jnp.linspace(0.0, time, steps + 1)
    integrate = odeint_adjoint if adjoint else odeint
    z = integrate(rhs, src, ts, params, method=method, rtol=rtol, atol=atol,
                  scan_budget=scan_budget)
    z_final = jax.tree_util.tree_map(lambda x: x[-1], z)
    return jax.nn.relu(z_final)


def ode_decoder(params: list, tgt: jnp.ndarray, memory: jnp.ndarray,
                cfg: LayerConfig, *, time: float = 12.0, method: str = "euler",
                tgt_mask=None, memory_mask=None, rng=None,
                deterministic: bool = True, steps: int = 1):
    """ODE-integrated decoder (reference ODEG, ode_demo.py:195-213 — fully
    implemented decoder-side ODE transformer the model never instantiates;
    provided for capability parity). Returns (relu(z), attn-weight dict).

    Attention weights cannot escape the solver's traced scan body; they are
    produced by one extra stack evaluation at the final state — the weights of
    the field at z(T), which is what the reference's capture-on-last-call
    attribute plumbing observes for a one-step grid."""
    def rhs(t, y, p):
        del t
        out, _, _ = decoder_stack(p, y, memory, cfg, tgt_mask=tgt_mask,
                                  memory_mask=memory_mask, rng=rng,
                                  deterministic=deterministic)
        return out

    ts = jnp.linspace(0.0, time, steps + 1)
    z = odeint(rhs, tgt, ts, params, method=method)
    z_final = jax.tree_util.tree_map(lambda x: x[-1], z)
    _, sw, cw = decoder_stack(params, z_final, memory, cfg, tgt_mask=tgt_mask,
                              memory_mask=memory_mask, rng=rng,
                              deterministic=deterministic)
    return jax.nn.relu(z_final), {"self": sw, "cross": cw}
