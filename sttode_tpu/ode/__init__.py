"""ODE integration (layer L3).

First-party, XLA-native solvers replacing the reference's torchdiffeq dependency
(reference ode_demo.py:7-11,165,186-190):

- fixed-grid euler / midpoint / rk4 on ``lax.scan`` with torchdiffeq's
  grid-as-``ts`` semantics (so ``ts=[0, T]`` with euler is exactly one step
  ``y + T·f(0, y)`` — reference quirk Q1),
- adaptive dopri5 (RK45, PI step-size control) on ``lax.while_loop``,
- continuous adjoint via ``jax.custom_vjp`` (backward-in-time augmented
  integration), the capability torchdiffeq's ``adjoint`` flag promises.
"""

from sttode_tpu.ode.solvers import odeint, odeint_adjoint

__all__ = ["odeint", "odeint_adjoint"]
