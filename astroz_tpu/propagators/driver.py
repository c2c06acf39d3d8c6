"""Trajectory driver + the ``propagate_numerical`` API.

Rebuild of ``src/propagators/Propagator.zig`` (fixed outer steps
appending StateTime at :22-48) and the Python surface
``bindings/python/src/propagator.zig:13-193``: build a
TwoBody[+J2][+Drag] composite, integrate with DP87 (default) or RK4,
return (times, states).

Two execution styles:
* :func:`propagate_fixed` — fixed-step ``lax.scan``: one XLA program,
  batched over arbitrary leading axes (the Monte-Carlo fast path the
  reference lacks).
* :func:`Propagator.propagate` — reference-style outer loop with an
  adaptive DP87 inner integrator (per-trajectory).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .forces import Composite, Drag, J2, TwoBody
from .integrators import (DormandPrince87, Rk4, dp87_adaptive, dp87_step,
                          make_deriv, rk4_step)


def propagate_fixed(accel, state0, t0: float, duration: float, dt: float,
                    *, method: str = "rk4", substeps: int = 1):
    """Fixed-step trajectory via ``lax.scan``.

    ``state0``: (..., 6) [r km, v km/s] with arbitrary batch axes.
    Returns (times (n,), states (n, ..., 6)) including the initial
    state, n = floor(duration/dt) + 1.
    """
    if method not in ("rk4", "dp87"):
        raise ValueError(f"method must be 'rk4' or 'dp87', got "
                         f"{method!r}")
    deriv = make_deriv(accel)
    n_steps = int(np.floor(duration / dt))
    step_fn = rk4_step if method == "rk4" else \
        (lambda d, s, t, h: dp87_step(d, s, t, h)[0])
    h = dt / substeps

    def step(carry, k):
        state, t = carry
        for _ in range(substeps):
            state = step_fn(deriv, state, t, h)
            t = t + h
        return (state, t), state

    state0 = jnp.asarray(state0, jnp.result_type(1.0))
    (_, _), states = jax.lax.scan(
        step, (state0, jnp.asarray(t0, state0.dtype)),
        jnp.arange(n_steps))
    times = t0 + dt * np.arange(n_steps + 1)
    states = jnp.concatenate([state0[None], states], axis=0)
    return times, states


class Propagator:
    """Reference-style driver: fixed outer sampling steps, adaptive (or
    fixed) inner integration (Propagator.zig:22-67)."""

    def __init__(self, integrator):
        self.integrator = integrator

    def propagate(self, initial_state, t0: float, duration: float,
                  dt: float) -> Tuple[np.ndarray, np.ndarray]:
        n = int(np.floor(duration / dt)) + 1
        times = t0 + dt * np.arange(n)
        states = [np.asarray(initial_state, np.float64)]
        state = jnp.asarray(initial_state, jnp.result_type(1.0))
        for k in range(1, n):
            state = self.integrator.step(state, float(times[k - 1]), dt)
            states.append(np.asarray(state))
        return times, np.stack(states)

    def propagate_to(self, initial_state, t0: float, t1: float,
                     dt: float) -> np.ndarray:
        _, states = self.propagate(initial_state, t0, t1 - t0, dt)
        return states[-1]


def propagate_numerical(state0, t0: float, duration: float, dt: float,
                        mu: Optional[float] = None, *,
                        j2: Optional[float] = None,
                        r_eq: Optional[float] = None,
                        drag_cd: Optional[float] = None,
                        drag_area: float = 4.0, drag_mass: float = 1000.0,
                        integrator: str = "dp87", rtol: float = 1e-10,
                        atol: float = 1e-12):
    """python-surface parity with the reference's ``propagate_numerical``
    (propagator.zig:13-193): state6 + TwoBody[+J2][+Drag], DP87 or RK4,
    returns (times (n,), states (n, 6)) as numpy arrays."""
    from ..constants import EARTH

    models = [TwoBody(mu if mu is not None else EARTH.mu)]
    if j2 is not None:
        models.append(J2(mu if mu is not None else EARTH.mu, j2,
                         r_eq if r_eq is not None else EARTH.eq_radius))
    if drag_cd is not None:
        models.append(Drag(cd=drag_cd, area_m2=drag_area,
                           mass_kg=drag_mass))
    accel = Composite(models)

    if integrator == "rk4":
        times, states = propagate_fixed(accel, state0, t0, duration, dt,
                                        method="rk4")
        return np.asarray(times), np.asarray(states)
    if integrator != "dp87":
        raise ValueError(f"unknown integrator {integrator!r}")

    prop = Propagator(DormandPrince87(accel, rtol=rtol, atol=atol))
    return prop.propagate(state0, t0, duration, dt)
