"""Compute kernels: SGP4/SDP4 propagation, Kepler solvers, Pallas paths."""

from .sgp4 import (Sgp4Elements, sgp4_init, sgp4_propagate, solve_kepler,
                   kepler_and_posvel, update_secular)

__all__ = [
    "Sgp4Elements", "sgp4_init", "sgp4_propagate", "solve_kepler",
    "kepler_and_posvel", "update_secular",
]
