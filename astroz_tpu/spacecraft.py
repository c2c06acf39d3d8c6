"""Spacecraft: numerical propagation with impulsive maneuvers + attitude.

Rebuild of ``src/Spacecraft.zig`` (size presets at Spacecraft.zig:42-80,
TLE seed at :173-174, TwoBody+J2+Drag propagation with impulses at
:172-258, phase-change dv at :310-323, plane change at :272-307,
abnormal-orbit guard at :218-223, TRIAD + attitude RK4 at :151-169).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from enum import Enum
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .calculations import (propagate_attitude, rotmat_to_quaternion,
                           state_to_elements, tle_to_elements,
                           elements_to_state, triad)
from .constants import EARTH
from .propagators import Composite, Drag, J2, TwoBody
from .propagators.driver import propagate_fixed
from .tle import Tle

log = logging.getLogger(__name__)

MU = EARTH.mu


class SatelliteSize(Enum):
    """Size presets: (drag coefficient Cd, cross-section m^2)
    (Spacecraft.zig:42-80)."""

    CUBE = (2.2, 0.05)
    MINI = (2.2, 1.0)
    MEDIUM = (2.2, 5.0)
    LARGE = (2.2, 20.0)

    @property
    def drag_coefficient(self) -> float:
        return self.value[0]

    @property
    def cross_section(self) -> float:
        return self.value[1]


class ImpulseKind(Enum):
    ABSOLUTE = "absolute"      # dv vector given in inertial frame
    PROGRADE = "prograde"      # scalar dv along velocity
    PHASE = "phase"            # phase-shift maneuver (two-burn)
    PLANE_CHANGE = "plane_change"  # inclination/raan change


@dataclass
class Impulse:
    """A scheduled maneuver (Spacecraft.zig Impulse)."""

    time: float  # seconds from propagation start
    kind: ImpulseKind = ImpulseKind.ABSOLUTE
    delta_v: Optional[Sequence[float]] = None  # km/s (ABSOLUTE)
    magnitude: float = 0.0  # km/s (PROGRADE)
    phase_change: float = 0.0  # radians (PHASE)
    delta_inclination: float = 0.0  # radians (PLANE_CHANGE)
    delta_raan: float = 0.0  # radians (PLANE_CHANGE)


def phase_change_dv(a_km: float, phase_rad: float,
                    mu: float = MU) -> Tuple[float, float]:
    """Two-burn phasing: dv per burn and the phasing-orbit period
    (Spacecraft.zig:310-323). The spacecraft enters a phasing orbit
    whose period differs so that after one rev the anomaly shifts by
    ``phase_rad``."""
    t_orig = 2.0 * np.pi * np.sqrt(a_km ** 3 / mu)
    t_phase = t_orig * (1.0 - phase_rad / (2.0 * np.pi))
    a_phase = (mu * (t_phase / (2.0 * np.pi)) ** 2) ** (1.0 / 3.0)
    v_orig = np.sqrt(mu / a_km)
    v_phase = np.sqrt(mu * (2.0 / a_km - 1.0 / a_phase))
    return abs(v_phase - v_orig), t_phase


def plane_change_dv(v_kms: float, delta_i: float, delta_raan: float,
                    incl: float) -> float:
    """Combined plane-change dv magnitude (Spacecraft.zig:272-307):
    theta = angle between initial and final orbit planes."""
    cos_theta = (np.cos(incl) * np.cos(incl + delta_i)
                 + np.sin(incl) * np.sin(incl + delta_i)
                 * np.cos(delta_raan))
    theta = np.arccos(np.clip(cos_theta, -1.0, 1.0))
    return 2.0 * v_kms * np.sin(theta / 2.0)


@dataclass
class Spacecraft:
    """A spacecraft with mass/size, force model, impulses, attitude."""

    name: str = "sc"
    mass_kg: float = 100.0
    size: SatelliteSize = SatelliteSize.MINI
    state: Optional[np.ndarray] = None  # [r km, v km/s]
    quaternion: np.ndarray = field(
        default_factory=lambda: np.array([1.0, 0.0, 0.0, 0.0]))
    angular_velocity: np.ndarray = field(
        default_factory=lambda: np.zeros(3))
    inertia_diag: np.ndarray = field(
        default_factory=lambda: np.array([1.0, 1.0, 1.0]))
    orbiting_object = EARTH

    @classmethod
    def from_tle(cls, tle: Tle, **kwargs) -> "Spacecraft":
        """Seed the state from TLE mean elements via direct Kepler
        conversion (Spacecraft.zig:173-174)."""
        el = tle_to_elements(tle)
        r, v = elements_to_state(el)
        return cls(state=np.concatenate([np.asarray(r), np.asarray(v)]),
                   **kwargs)

    def _forces(self):
        return Composite([
            TwoBody(self.orbiting_object.mu),
            J2(self.orbiting_object.mu, self.orbiting_object.j2,
               self.orbiting_object.eq_radius),
            Drag(cd=self.size.drag_coefficient,
                 area_m2=self.size.cross_section, mass_kg=self.mass_kg),
        ])

    def _apply_impulse(self, state: np.ndarray, imp: Impulse) -> np.ndarray:
        r, v = state[:3], state[3:]
        if imp.kind is ImpulseKind.ABSOLUTE:
            v = v + np.asarray(imp.delta_v, np.float64)
        elif imp.kind is ImpulseKind.PROGRADE:
            v = v + imp.magnitude * v / np.linalg.norm(v)
        elif imp.kind is ImpulseKind.PHASE:
            a = float(state_to_elements(jnp.asarray(r),
                                        jnp.asarray(v)).semi_major_axis)
            dv, _ = phase_change_dv(a, imp.phase_change,
                                    self.orbiting_object.mu)
            v = v + dv * v / np.linalg.norm(v)
        elif imp.kind is ImpulseKind.PLANE_CHANGE:
            el = state_to_elements(jnp.asarray(r), jnp.asarray(v))
            dv_mag = plane_change_dv(np.linalg.norm(v),
                                     imp.delta_inclination, imp.delta_raan,
                                     float(el.inclination))
            # burn normal to the orbit plane (direction of plane change)
            h = np.cross(r, v)
            n_hat = h / np.linalg.norm(h)
            sign = 1.0 if (imp.delta_inclination + imp.delta_raan) >= 0 \
                else -1.0
            v = v + sign * dv_mag * n_hat
        return np.concatenate([r, v])

    def _abnormal(self, state: np.ndarray) -> bool:
        """Energy > 0 / NaN / r > 100000 km guard
        (Spacecraft.zig:218-223)."""
        if not np.isfinite(state).all():
            return True
        r = np.linalg.norm(state[:3])
        v = np.linalg.norm(state[3:])
        energy = 0.5 * v * v - self.orbiting_object.mu / r
        return bool(energy > 0.0 or r > 100000.0)

    def propagate(self, t0: float, days: float, h: float,
                  impulses: Sequence[Impulse] = ()
                  ) -> Tuple[np.ndarray, np.ndarray]:
        """RK4 propagation with impulses applied at their scheduled
        times (Spacecraft.zig:172-258). Returns (times, states); stops
        early with a warning on abnormal orbits."""
        if self.state is None:
            raise ValueError("spacecraft has no initial state")
        forces = self._forces()
        t_end = t0 + days * 86400.0
        events = sorted([i for i in impulses if t0 <= i.time <= t_end],
                        key=lambda i: i.time)
        times_all: List[np.ndarray] = []
        states_all: List[np.ndarray] = []
        state = np.asarray(self.state, np.float64)
        t = t0
        for imp in events + [None]:
            seg_end = t_end if imp is None else imp.time
            if seg_end > t:
                # one lax.scan program per inter-impulse segment (a
                # per-step Python loop would pay one device dispatch
                # per RK4 step — minutes on a remote TPU)
                ts, ss = propagate_fixed(forces, state, t, seg_end - t, h)
                ss = np.asarray(ss)
                # per-step abnormal-orbit guard (Spacecraft.zig:218-223):
                # truncate at the first bad state and stop
                rn = np.linalg.norm(ss[:, :3], axis=-1)
                vn = np.linalg.norm(ss[:, 3:], axis=-1)
                energy = 0.5 * vn * vn - self.orbiting_object.mu / rn
                bad = (~np.isfinite(ss).all(axis=-1) | (energy > 0.0)
                       | (rn > 100000.0))
                bad[0] = False  # keep at least the initial sample
                if bad.any():
                    cut = int(np.argmax(bad))
                    log.warning("%s: abnormal orbit detected, stopping",
                                self.name)
                    times_all.append(ts[:cut])
                    states_all.append(ss[:cut])
                    state = ss[max(cut - 1, 0)]
                    break
                times_all.append(ts)
                states_all.append(ss)
                state = ss[-1]
                t = float(ts[-1])
            if imp is not None:
                state = self._apply_impulse(state, imp)
        self.state = state
        times = np.concatenate(times_all)
        states = np.concatenate(states_all)
        return times, states

    # ---- attitude (Spacecraft.zig:151-169) --------------------------------

    def update_attitude(self, v1_body, v2_body, v1_ref, v2_ref) -> None:
        """TRIAD determination -> stored quaternion."""
        m = triad(v1_body, v2_body, v1_ref, v2_ref)
        self.quaternion = np.asarray(rotmat_to_quaternion(m))

    def propagate_attitude(self, dt: float, duration: float,
                           torque=(0.0, 0.0, 0.0)) -> None:
        n = max(1, int(round(duration / dt)))
        q, w = propagate_attitude(
            jnp.asarray(self.quaternion),
            jnp.asarray(self.angular_velocity),
            jnp.asarray(self.inertia_diag), jnp.asarray(torque), dt, n)
        self.quaternion = np.asarray(q)
        self.angular_velocity = np.asarray(w)
