"""Numerical propagation with force models + a maneuver."""

import numpy as np

from astroz_tpu.constants import EARTH
from astroz_tpu.propagators import propagate_numerical
from astroz_tpu.spacecraft import Impulse, ImpulseKind, Spacecraft

r0 = EARTH.eq_radius + 500.0
vc = np.sqrt(EARTH.mu / r0)
state = np.array([r0, 0, 0, 0, vc, 0])

times, states = propagate_numerical(state, 0.0, 5400.0, 60.0,
                                    j2=EARTH.j2, drag_cd=2.2)
print(f"DP87: {len(times)} samples, final |r| = "
      f"{np.linalg.norm(states[-1, :3]):.1f} km")

sc = Spacecraft(state=state)
sc.propagate(0.0, 0.1, 30.0, impulses=[
    Impulse(time=2700.0, kind=ImpulseKind.PROGRADE, magnitude=0.05)])
print(f"after prograde burn: |r| = {np.linalg.norm(sc.state[:3]):.1f} km")
