"""Numerical propagation: force models, integrators, trajectory driver.

Rebuild of the reference's ``src/propagators/`` stack (vtable ForceModel
+ 8 models at ForceModel.zig:13-375; Rk4/DormandPrince87 at
Integrator.zig:8-298; Propagator driver at Propagator.zig:22-67) as
composable pure functions: a force model is ``accel(r, v, t) -> a`` and
an integrator advances ``(state, t) -> state`` — everything jit/vmap/
scan-compatible so batched Monte-Carlo propagation is one XLA program.
"""

from .forces import (Composite, Drag, ImprovedDrag, J2, J3, J4,
                     SolarRadiationPressure, ThirdBody, TwoBody,
                     earth_default_forces)
from .integrators import (DormandPrince87, Rk4, Sgp4Integrator,
                          dp87_adaptive, dp87_step, make_deriv, rk4_step)
from .driver import Propagator, propagate_fixed, propagate_numerical

__all__ = [
    "TwoBody", "J2", "J3", "J4", "Drag", "ImprovedDrag",
    "SolarRadiationPressure", "ThirdBody", "Composite",
    "earth_default_forces", "Rk4", "DormandPrince87", "Sgp4Integrator",
    "rk4_step", "dp87_step", "dp87_adaptive", "make_deriv",
    "Propagator", "propagate_fixed",
    "propagate_numerical",
]
