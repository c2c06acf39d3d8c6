"""Compute kernels: SGP4/SDP4 propagation, Kepler solvers, Pallas paths."""

from .sgp4 import (Sgp4Elements, sgp4_init, sgp4_propagate, solve_kepler,
                   kepler_and_posvel, update_secular)
from .sdp4 import (DeepElements, ResonanceCarry, fresh_carry, sdp4_init,
                   sdp4_propagate, sdp4_propagate_scan)
from .fast import propagate_fast, solve_kepler_fast
from . import fastmath

__all__ = [
    "Sgp4Elements", "sgp4_init", "sgp4_propagate", "solve_kepler",
    "kepler_and_posvel", "update_secular",
    "DeepElements", "ResonanceCarry", "fresh_carry", "sdp4_init",
    "sdp4_propagate", "sdp4_propagate_scan",
    "propagate_fast", "solve_kepler_fast", "fastmath",
]
