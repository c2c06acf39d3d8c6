"""TRIAD attitude determination + torque-free propagation
(reference: Spacecraft attitude demo, calculations.zig:283-305,429-462)."""

import numpy as np

from astroz_tpu.spacecraft import Spacecraft, SatelliteSize
from astroz_tpu.constants import EARTH

r0 = EARTH.eq_radius + 550.0
vc = np.sqrt(EARTH.mu / r0)
sc = Spacecraft(state=np.array([r0, 0, 0, 0, vc, 0]),
                size=SatelliteSize.CUBE,
                inertia_diag=np.array([0.02, 0.03, 0.05]))

# two reference vectors (sun + magnetic field) seen in body frame
sun_ref = np.array([1.0, 0.0, 0.0])
mag_ref = np.array([0.0, 0.6, 0.8])
# body measurements: spacecraft rotated 30 deg about z
th = np.deg2rad(30)
rz = np.array([[np.cos(th), np.sin(th), 0],
               [-np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
sc.update_attitude(rz @ sun_ref, rz @ mag_ref, sun_ref, mag_ref)
print("determined quaternion:", np.round(sc.quaternion, 4))

sc.angular_velocity = np.array([0.0, 0.0, 0.05])
sc.propagate_attitude(dt=0.1, duration=60.0)
print("after 60 s tumble:   ", np.round(sc.quaternion, 4))
