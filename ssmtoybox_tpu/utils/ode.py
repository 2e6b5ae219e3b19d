"""Single-step ODE integrators (``ssmtoybox/utils.py:505-566``).

Pure jax functions usable inside ``lax.scan`` simulation loops.
"""
from __future__ import annotations

__all__ = ["ode_euler", "ode_runge_kutta_4"]


def ode_euler(func, x, q, time, dt):
    """Forward-Euler step: ``x + dt * f(x, q, t)`` (``utils.py:505-532``)."""
    return x + dt * func(x, q, time)


def ode_runge_kutta_4(func, x, q, time, dt):
    """Classic RK4 step (``utils.py:535-566``)."""
    dt2 = 0.5 * dt
    k1 = func(x, q, time)
    k2 = func(x + dt2 * k1, q, time)
    k3 = func(x + dt2 * k2, q, time)
    k4 = func(x + dt * k3, q, time)
    return x + (dt / 6.0) * (k1 + 2.0 * (k2 + k3) + k4)
